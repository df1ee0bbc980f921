"""On-chip evaluator feature-extraction throughput.

The reference's metrics protocol runs 50k samples + 50k reference images
through InceptionV3 (evaluations/README.md:9, evaluator.py:20-24); at that
scale the extractor is a real pipeline stage, not a one-off. This measures
the JAX InceptionV3 port's (evaluations/inception_flax.py) steady-state
throughput on the chip with architecture-shaped random weights (throughput
is weight-independent; numerical parity vs the pb is pinned separately in
tests/test_inception_flax.py).

Usage: python tools/evaluator_bench.py      (ambient axon env)
Env: EVB_BATCH (64), EVB_ITERS (10), EVB_IMAGE (256).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "evaluations"))
from evaluations import inception_flax as inc


def main():
    B = int(os.environ.get("EVB_BATCH", 64))
    iters = int(os.environ.get("EVB_ITERS", 10))
    size = int(os.environ.get("EVB_IMAGE", 256))

    params = jax.device_put(inc.random_params())
    fwd = jax.jit(lambda p, x: inc.inception_features(p, x))

    rs = np.random.RandomState(0)
    x = jax.device_put(rs.uniform(0, 255, (B, size, size, 3)).astype(np.float32))

    t0 = time.time()
    pool, spatial = jax.block_until_ready(fwd(params, x))
    compile_s = time.time() - t0
    print(f"[evb] compile+first {compile_s:.0f}s, pool {pool.shape} spatial {spatial.shape}", flush=True)

    t1 = time.time()
    for _ in range(iters):
        pool, spatial = fwd(params, x)
    jax.block_until_ready((pool, spatial))
    secs = time.time() - t1
    ips = B * iters / secs
    print(json.dumps({
        "batch": B, "image": size, "iters": iters,
        "images_per_sec_per_chip": round(ips, 1),
        "sec_for_50k_pair": round(2 * 50_000 / ips, 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()

"""Per-batch chain-latency sweep: is small-batch 256px sampling actually
cheaper on-chip?

Motivated by a serve.py --batch_buckets measurement (ROUND_NOTES r5) where
bucket latencies came out NON-monotonic (n1 1.95s < n8 2.55s but n2 2.77s,
n4 4.09s — both SLOWER than the full batch). This probe times the same
ddim25 int8 chain standalone per batch size, removing the server/HTTP/queue
layer, to attribute the shape: device math vs serving overhead.

Env: BSP_BATCHES ("1,2,4,8"), BSP_IMAGE_SIZE (256), BSP_RESPACING (ddim25),
BSP_CONV_IMPL (int8), BSP_REPEATS (3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.ops.config import set_conv_impl
from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache
from guided_diffusion_clip_tpu.utils.script_util import (
    create_gaussian_diffusion,
    create_upstream_model,
)

_T0 = time.time()


def note(msg):
    print(f"[bsp +{time.time()-_T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def main():
    setup_compilation_cache()
    batches = [int(b) for b in os.environ.get("BSP_BATCHES", "1,2,4,8").split(",")]
    size = int(os.environ.get("BSP_IMAGE_SIZE", 256))
    respacing = os.environ.get("BSP_RESPACING", "ddim25")
    conv_impl = os.environ.get("BSP_CONV_IMPL", "int8")
    repeats = int(os.environ.get("BSP_REPEATS", 3))

    # serve_bench's model: ADM-256 topology, unconditional, learn_sigma
    model = create_upstream_model(
        image_size=size, num_channels=256 if size == 256 else 192,
        num_res_blocks=2, channel_mult="", learn_sigma=True, class_cond=False,
        use_checkpoint=False, attention_resolutions="32,16,8", num_heads=4,
        num_head_channels=64, num_heads_upsample=-1,
        use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
        use_fp16=True, use_new_attention_order=False,
    )
    diffusion = create_gaussian_diffusion(
        steps=1000, learn_sigma=True, noise_schedule="linear",
        timestep_respacing=respacing,
    )
    set_conv_impl(conv_impl)

    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, size, size, 3)), jnp.zeros((1,))
        )
    )["params"]
    rs = np.random.RandomState(0)
    params = jax.device_put(jax.tree_util.tree_map(
        lambda s: (rs.standard_normal(s.shape) * 0.02).astype(s.dtype), shapes
    ))

    results = {"config": f"{size}px {respacing} {conv_impl}, unconditional "
                         f"ADM-256 topology (serve_bench model)", "batches": {}}
    for B in batches:
        shape = (B, size, size, 3)

        # params as jit ARGUMENTS: closure capture would bake 2.2GB of
        # weights into EACH per-batch executable as constants (bench.py's
        # random_fill note) — slow compiles and duplicated HBM
        @jax.jit
        def chain(params, key):
            def model_fn(x, t, **kw):
                return model.apply({"params": params}, x, t)

            return diffusion.ddim_sample_loop(model_fn, shape, key)

        note(f"B={B}: compile+warm")
        t0 = time.time()
        float(jnp.sum(chain(params, jax.random.key(0))))
        compile_s = time.time() - t0
        times = []
        for r in range(repeats):
            t0 = time.time()
            float(jnp.sum(chain(params, jax.random.key(1 + r))))
            times.append(time.time() - t0)
        best = min(times)
        results["batches"][str(B)] = {
            "best_s": round(best, 3),
            "per_sample_s": round(best / B, 3),
            "compile_s": round(compile_s, 1),
            "times": [round(t, 3) for t in times],
        }
        note(f"B={B}: {best:.3f}s/chain ({best/B:.3f}s/sample)")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

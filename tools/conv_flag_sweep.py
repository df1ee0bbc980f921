"""Sweep XLA TPU knobs + int8 over the ADM-dominant 3x3 conv shapes.

Round-2 follow-up to conv_microbench.py (which showed XLA native conv beats
matmul reformulations everywhere): measures whether (a) more scoped vmem,
(b) latency-hiding scheduler aggressiveness, or (c) int8 inputs move the
conv roofline on v5e. Each XLA_FLAGS config runs in a fresh subprocess
(flags are parsed once per process).

Usage: python tools/conv_flag_sweep.py            # orchestrates subprocesses
       python tools/conv_flag_sweep.py --worker   # one config (internal)
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()  # JAX_PLATFORMS env alone cannot override the axon hook

import time

SHAPES = [
    (16, 64, 512, 512),
    (16, 32, 512, 512),
    (16, 128, 256, 256),
    (16, 16, 1024, 1024),
    (16, 256, 256, 256),  # the 256px stem level — biggest single FLOP block
]

CONFIGS = {
    "base": "",
    "vmem128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "lhs_aggr": "--xla_latency_hiding_scheduler_rerun=2",
    "no_rewrite": "--xla_tpu_enable_dot_strength_reduction=false",
}


def worker(int8: bool) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    iters = int(os.environ.get("CMB_ITERS", 30))
    rows = []
    for (B, H, C, K) in SHAPES:
        rs = np.random.RandomState(0)
        if int8:
            x = jax.device_put(
                rs.randint(-127, 127, (B, H, H, C)).astype(np.int8)
            )
            w = jax.device_put(rs.randint(-127, 127, (3, 3, C, K)).astype(np.int8))
            acc_t = jnp.int32
        else:
            x = jax.device_put(rs.randn(B, H, H, C).astype(jnp.bfloat16))
            w = jax.device_put((rs.randn(3, 3, C, K) * 0.05).astype(jnp.bfloat16))
            acc_t = jnp.float32

        def conv(xx, ww):
            return jax.lax.conv_general_dilated(
                xx, ww, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_t,
            )

        def chained(xx, ww):
            def body(carry, _):
                y = conv(carry, ww)
                return y[..., : xx.shape[-1]].astype(xx.dtype), ()

            out, _ = jax.lax.scan(body, xx, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))

        j = jax.jit(chained)
        float(j(x, w))
        best = min(
            (lambda t0: (float(j(x, w)), time.time() - t0)[1])(time.time())
            for _ in range(3)
        ) / iters
        flops = 2 * B * H * H * C * K * 9
        rows.append(
            {
                "shape": f"B{B} {H}x{H} {C}->{K}",
                "ms": round(best * 1000, 2),
                "tfs": round(flops / best / 1e12, 1),
            }
        )
    print(json.dumps(rows), flush=True)


def main() -> None:
    results = {}
    for name, flags in CONFIGS.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        p = subprocess.run(
            [sys.executable, __file__, "--worker"],
            env=env, capture_output=True, text=True, timeout=900,
        )
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "[]"
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"error": p.stderr[-400:]}
        print(name, "->", line, flush=True)

    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, __file__, "--worker", "--int8"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "[]"
    try:
        results["int8"] = json.loads(line)
    except json.JSONDecodeError:
        results["int8"] = {"error": p.stderr[-400:]}
    print("int8 ->", line, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int8="--int8" in sys.argv)
    else:
        main()

"""Benchmark ops/pallas_conv.fused_conv3x3 vs XLA conv on the attached TPU.

Amortized in-jit timing (see conv_microbench.py). Reports TF/s per strategy:
xla bf16 conv, xla s8 conv, pallas fused bf16, pallas fused int8.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()  # JAX_PLATFORMS env alone cannot override the axon hook


import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.ops.pallas_conv import fused_conv3x3, supports_shape

SHAPES = [
    (16, 256, 256, 256),
    (16, 128, 256, 256),
    (16, 64, 512, 512),
    (16, 32, 512, 512),
    (16, 16, 1024, 1024),
]
if os.environ.get("PCB_SHAPES"):  # e.g. "16x256x256x256,16x128x256x256"
    SHAPES = [
        tuple(int(v) for v in s.split("x"))
        for s in os.environ["PCB_SHAPES"].split(",")
    ]
ITERS = int(os.environ.get("CMB_ITERS", 20))


def timed(make_fn, x, w, b, n=3):
    def chained(x, w, b):
        def body(carry, _):
            y = make_fn(carry, w, b)
            return y[..., : x.shape[-1]].astype(x.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    j = jax.jit(chained)
    float(j(x, w, b))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(j(x, w, b))
        best = min(best, time.time() - t0)
    return best / ITERS


def xla_conv(dt):
    def f(x, w, b):
        if dt == jnp.int8:
            from guided_diffusion_clip_tpu.ops.quant import int8_conv

            return int8_conv(x, w) + b
        return jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b

    return f


def main():
    which = os.environ.get("PCB_ONLY", "")
    results = []
    for (B, H, C, K) in SHAPES:
        W = H
        rs = np.random.RandomState(0)
        x = jax.device_put(rs.randn(B, H, W, C).astype(np.float32))
        w = jax.device_put((rs.randn(3, 3, C, K) * 0.05).astype(np.float32))
        b = jax.device_put(rs.randn(K).astype(np.float32))
        flops = 2 * B * H * W * C * K * 9
        row = {"shape": f"B{B} {H}x{W} {C}->{K}", "supported": supports_shape(B, H, W, C, K)}
        strategies = {
            "xla_bf16": xla_conv(jnp.bfloat16),
            "xla_int8": xla_conv(jnp.int8),
            "pl_bf16": lambda x, w, b: fused_conv3x3(x, w, b, quantized=False),
            "pl_int8": lambda x, w, b: fused_conv3x3(x, w, b, quantized=True),
        }
        for name, fn in strategies.items():
            if which and which not in name:
                continue
            if name.startswith("pl_") and not row["supported"]:
                continue
            try:
                t = timed(fn, x, w, b)
                row[name] = round(flops / t / 1e12, 1)
            except Exception as e:  # noqa: BLE001
                row[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(row, flush=True)
        results.append(row)
    print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()

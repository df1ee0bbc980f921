"""Microbench one GN(+SiLU)->3x3conv pair: bf16 XLA vs fused int8 path.

Isolates where the int8 win goes missing at the model level. Amortized
in-jit timing (see conv_microbench.py).

Usage: python tools/block_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()  # JAX_PLATFORMS env alone cannot override the axon hook


import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.ops.pallas_groupnorm import group_norm
from guided_diffusion_clip_tpu.ops.quant import conv_prequant

SHAPES = [
    (16, 64, 512, 512),
    (16, 128, 256, 256),
    (16, 256, 256, 256),
    (16, 32, 512, 512),
]
ITERS = int(os.environ.get("CMB_ITERS", 20))


def timed(fn, *args, n=3):
    def chained(x, *rest):
        def body(carry, _):
            y = fn(carry, *rest)
            return y[..., : x.shape[-1]].astype(x.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    j = jax.jit(chained)
    float(j(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(j(*args))
        best = min(best, time.time() - t0)
    return best / ITERS


def main():
    gn_impl = os.environ.get("BMB_GN_IMPL", "pallas")
    for (B, H, C, K) in SHAPES:
        rs = np.random.RandomState(0)
        x = jax.device_put(rs.randn(B, H, H, C).astype(np.float32).astype(jnp.bfloat16))
        gamma = jax.device_put((rs.rand(C) + 0.5).astype(np.float32))
        beta = jax.device_put((rs.randn(C) * 0.1).astype(np.float32))
        w = jax.device_put((rs.randn(3, 3, C, K) * 0.05).astype(np.float32))
        b = jax.device_put(rs.randn(K).astype(np.float32))
        flops = 2 * B * H * H * C * K * 9

        def bf16_block(xx, gamma, beta, w, b):
            h = group_norm(xx, gamma, beta, groups=32, silu=True, impl=gn_impl)
            return jax.lax.conv_general_dilated(
                h, w.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + b

        def int8_block(xx, gamma, beta, w, b):
            q, s = group_norm(
                xx, gamma, beta, groups=32, silu=True, impl=gn_impl, quantize_out=True
            )
            return conv_prequant(q, s, w, b)

        def gn_only(xx, gamma, beta, w, b):
            h = group_norm(xx, gamma, beta, groups=32, silu=True, impl=gn_impl)
            return jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, K - C))) if K > C else h

        def gnq_only(xx, gamma, beta, w, b):
            q, s = group_norm(
                xx, gamma, beta, groups=32, silu=True, impl=gn_impl, quantize_out=True
            )
            return q

        row = {"shape": f"B{B} {H}x{H} {C}->{K}"}
        for name, fn in (
            ("bf16_block", bf16_block),
            ("int8_block", int8_block),
            ("gn_only", gn_only),
            ("gnq_only", gnq_only),
        ):
            t = timed(fn, x, gamma, beta, w, b)
            row[name + "_ms"] = round(t * 1000, 2)
        row["conv_bf16_tfs"] = round(
            flops / (row["bf16_block_ms"] - row["gn_only_ms"]) / 1e9, 1
        )
        row["conv_int8_tfs"] = round(
            flops / (row["int8_block_ms"] - row["gnq_only_ms"]) / 1e9, 1
        )
        print(row, flush=True)


if __name__ == "__main__":
    main()

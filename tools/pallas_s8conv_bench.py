"""Bench ops/pallas_conv.fused_conv3x3_s8 vs the XLA s8 conv, on-chip.

Both strategies consume identical pre-quantized s8 activations + per-image
scales (the real fast-path contract: the quantizing GroupNorm emits s8) and
run under the same scan-feedback harness, so per-iteration overhead cancels
in the comparison. Reports ms + effective TF/s per shape.

Usage: python tools/pallas_s8conv_bench.py
Env: SCB_SHAPES ("16x256x256x256,..."), CMB_ITERS (20),
     GDC_PCONV_BH / GDC_PCONV_NB / GDC_PCONV_BK tile overrides.
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

from guided_diffusion_clip_tpu.ops.pallas_conv import (
    _pick_tiles_s8,
    fused_conv3x3_s8,
    supports_shape_s8,
)

SHAPES = [
    (16, 256, 256, 256),  # ds1: the dominant ADM-256 shape (~95ms of the fwd)
    (16, 128, 256, 256),
    (16, 64, 512, 512),
]
if os.environ.get("SCB_SHAPES"):
    SHAPES = [
        tuple(int(v) for v in s.split("x")) for s in os.environ["SCB_SHAPES"].split(",")
    ]
ITERS = int(os.environ.get("CMB_ITERS", 20))


def timed(fn, q, s_img, w_q, s_w, b, n=3):
    """fn(q, s_img, w_q, s_w, b) -> f32 y; scan-chained with s8 feedback."""

    def chained(q, s_img, w_q, s_w, b):
        def body(carry, _):
            y = fn(carry, s_img, w_q, s_w, b)
            # cheap s8 feedback: wrap the f32 output back to s8 so the next
            # iteration's conv input depends on this one (defeats DCE/LICM).
            nxt = jnp.clip(y[..., : q.shape[-1]], -127, 127).astype(jnp.int8)
            return nxt, ()

        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    j = jax.jit(chained)
    float(j(q, s_img, w_q, s_w, b))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(j(q, s_img, w_q, s_w, b))
        best = min(best, time.time() - t0)
    return best / ITERS


def xla_s8(q, s_img, w_q, s_w, b):
    acc = jax.lax.conv_general_dilated(
        q, w_q, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return acc * s_w + b  # s_img folded below for harness parity

def xla_s8_full(q, s_img, w_q, s_w, b):
    acc = jax.lax.conv_general_dilated(
        q, w_q, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return acc * s_w * s_img[:, None, None, None] + b


def main():
    results = []
    for (B, H, C, K) in SHAPES:
        W = H
        rs = np.random.RandomState(0)
        q = jax.device_put(rs.randint(-127, 128, (B, H, W, C)).astype(np.int8))
        s_img = jax.device_put((rs.rand(B).astype(np.float32) + 0.5) / 127)
        w_q = jax.device_put(rs.randint(-127, 128, (3, 3, C, K)).astype(np.int8))
        s_w = jax.device_put((rs.rand(K).astype(np.float32) + 0.5) / 127)
        b = jax.device_put(rs.randn(K).astype(np.float32))
        flops = 2 * B * H * W * C * K * 9
        row = {
            "shape": f"B{B} {H}x{W} {C}->{K}",
            "tiles": _pick_tiles_s8(B, H, W, C, K),
        }
        strategies = {"xla_s8": xla_s8_full}
        if supports_shape_s8(B, H, W, C, K):
            strategies["pallas_s8direct"] = fused_conv3x3_s8
        for name, fn in strategies.items():
            try:
                sec = timed(fn, q, s_img, w_q, s_w, b)
                row[f"{name}_ms"] = round(sec * 1e3, 3)
                row[f"{name}_tfs"] = round(flops / sec / 1e12, 1)
            except Exception as e:  # noqa: BLE001 - keep sweeping
                row[f"{name}_error"] = repr(e)[:200]
            print(row, flush=True)
        results.append(row)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

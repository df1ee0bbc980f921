"""Per-level conv efficiency audit: XLA bf16 vs prequantized s8, ADM-256 shapes.

The ds1/ds2 levels (256ch at 256^2/128^2) carry ~40% of the UNet's conv
FLOPs but were never microbenched; the published 184 TF/s s8 number came
from (16, 64, 512, 512) only. This measures the steady-state path (weights
pre-quantized s8, activations already integer-valued) so the number is pure
conv-emitter efficiency, not quantization overhead.

Usage: python tools/conv_shape_audit.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np

# (B, H, C_in, C_out): the six ADM-256 levels + stride-2-ish extremes
SHAPES = [
    (16, 256, 256, 256),   # ds1 — biggest spatial, never audited
    (16, 128, 256, 256),   # ds2
    (16, 64, 512, 512),    # ds4 (the shape behind the 184 TF/s figure)
    (16, 32, 512, 512),    # ds8
    (16, 16, 1024, 1024),  # ds16
    (16, 8, 1024, 1024),   # ds32 / middle
]
ITERS = int(os.environ.get("CSA_ITERS", 10))


def timed(jfn, *args, n=3):
    float(jfn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(jfn(*args))
        best = min(best, time.time() - t0)
    return best / ITERS


def chain(conv):
    """Repeat the conv on a data-dependent carry to amortize dispatch."""

    def run(x, w):
        def body(c, _):
            y = conv(c, w)
            # keep the carry in the input dtype/range without extra passes
            return (y[..., : x.shape[-1]]).astype(x.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    return jax.jit(run)


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_s8(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.int8), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16)


def main():
    results = []
    for (B, H, C, K) in SHAPES:
        rs = np.random.RandomState(0)
        flops = 2.0 * B * H * H * C * K * 9
        # integer-valued activations in [-127, 127], as the GN handshake emits
        xi = np.round(rs.randn(B, H, H, C) * 30).clip(-127, 127)
        x_bf = jax.device_put(xi.astype(np.float32).astype(jnp.bfloat16))
        w_bf = jax.device_put((rs.randn(3, 3, C, K) * 0.05).astype(np.float32).astype(jnp.bfloat16))
        w_s8 = jax.device_put(np.round(rs.randn(3, 3, C, K) * 20).clip(-127, 127).astype(np.int8))

        row = {"shape": (B, H, C, K), "tflop": round(flops / 1e12, 3)}
        t = timed(chain(conv_bf16), x_bf, w_bf)
        row["bf16_ms"] = round(t * 1e3, 2)
        row["bf16_tfs"] = round(flops / t / 1e12, 1)
        t = timed(chain(conv_s8), x_bf, w_s8)
        row["s8_ms"] = round(t * 1e3, 2)
        row["s8_tfs"] = round(flops / t / 1e12, 1)
        row["s8_speedup"] = round(row["bf16_ms"] / row["s8_ms"], 2)
        print(row, flush=True)
        results.append(row)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()

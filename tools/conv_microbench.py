"""Microbenchmark 3x3-conv strategies on the attached TPU.

XLA's native spatial conv ran at ~62% of v5e bf16 peak in round 1 while its
plain matmuls run near 90% — this measures whether reformulating the ADM
UNet's 3x3 convs as matmuls closes the gap:

  a) lax.conv_general_dilated (the XLA conv path, current)
  b) 9 shifted matmuls: y = sum_{dy,dx} x_pad[dy:dy+H, dx:dx+W] @ W[dy,dx]
  c) im2col: one [B*H*W, 9C] @ [9C, K] matmul (9x activation traffic)

Shapes swept: the ADM-G 256px levels that dominate FLOPs.
Usage: python tools/conv_microbench.py
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

# (B, H, C_in, C_out) at stride 1 SAME; H == W
SHAPES = [
    (16, 64, 512, 512),   # 64px level of ADM-256 (mult 2)
    (16, 32, 512, 512),
    (16, 128, 256, 256),  # 128px level (mult 1)
    (16, 16, 1024, 1024),  # 16px level (mult 4)
]


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def conv_9matmul(x, w):
    B, H, W_, C = x.shape
    K = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W_, K), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W_, C))
            acc = acc + jax.lax.dot_general(
                patch, w[dy, dx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def conv_im2col(x, w):
    B, H, W_, C = x.shape
    K = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [
            jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W_, C))
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )
    return jax.lax.dot_general(
        cols, w.reshape(9 * C, K),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


ITERS = int(os.environ.get("CMB_ITERS", 30))


def timed(fn, *args, n=3):
    """Time ITERS chained applications inside ONE jitted program.

    A single dispatch through the TPU relay costs ~24ms of round-trip —
    more than any one conv at these shapes — so per-call timing only
    measures the relay. Chaining the op on its own output amortizes that
    to noise and reports true device throughput.
    """

    def chained(x, w):
        def body(carry, _):
            y = fn(carry, w)
            # keep dtype stable so the loop carry is well-typed
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
    results = []
    for (B, H, C, K) in SHAPES:
        rs = np.random.RandomState(0)
        x = jax.device_put(rs.randn(B, H, H, C).astype(jnp.bfloat16))
        w = jax.device_put((rs.randn(3, 3, C, K) * 0.05).astype(jnp.bfloat16))
        flops = 2 * B * H * H * C * K * 9
        row = {"shape": f"B{B} {H}x{H} {C}->{K}", "tflop": round(flops / 1e12, 2)}
        for name, fn in (("xla_conv", conv_xla), ("9matmul", conv_9matmul), ("im2col", conv_im2col)):
            t = timed(fn, x, w)
            row[name + "_ms"] = round(t * 1000, 2)
            row[name + "_tfs"] = round(flops / t / 1e12, 1)
        results.append(row)
        print(row, flush=True)
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()

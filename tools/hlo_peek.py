"""Dump the optimized TPU HLO of one int8 ResBlock mid-section.

Questions this answers (decides where the remaining elementwise time goes):
  1. Does the quantizing-GN XLA composite fuse to the minimal passes
     (stats read; apply read+write), or does it rematerialize f32?
  2. Do residual adds / skip concats fuse into the GN stats pass?
  3. Is the conv epilogue (dequant * s_img * s_w + bias) fused into the conv?

Usage: python tools/hlo_peek.py [unet|block] — prints per-fusion HBM bytes
(from parameter/output shapes) sorted descending, plus the full HLO to
/tmp/hlo_peek.txt for manual reading.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.ops.config import set_conv_impl
from guided_diffusion_clip_tpu.ops.pallas_groupnorm import group_norm
from guided_diffusion_clip_tpu.ops.quant import conv_prequant


def block_program():
    """GN-quant -> 3x3 int8 conv -> residual add -> GN-quant, at an ADM-256
    ds1 shape (the biggest maps: where the elementwise time lives)."""
    B, H, C = 4, 128, 256  # scaled-down ds1-like block (fast compile)
    rs = np.random.RandomState(0)
    x = jax.device_put(rs.randn(B, H, H, C).astype(np.float32).astype(jnp.bfloat16))
    gamma = jax.device_put((rs.rand(C) + 0.5).astype(np.float32))
    beta = jax.device_put((rs.randn(C) * 0.1).astype(np.float32))
    w = jax.device_put((rs.randn(3, 3, C, C) * 0.05).astype(np.float32))
    b = jax.device_put(rs.randn(C).astype(np.float32))

    emit = os.environ.get("HLO_PEEK_EMIT", "bf16")  # "s8" to inspect the s8 path

    def f(x, gamma, beta, w, b):
        q, s = group_norm(x, gamma, beta, silu=True, impl="xla", quantize_out=True, emit=emit)
        h = conv_prequant(q, s, w, b)
        h = (x + h.astype(x.dtype))
        q2, s2 = group_norm(h, gamma, beta, silu=True, impl="xla", quantize_out=True, emit=emit)
        return jnp.sum(q2.astype(jnp.float32)) + jnp.sum(s2)

    return f, (x, gamma, beta, w, b)


def main():
    set_conv_impl("int8")
    f, args = block_program()
    compiled = jax.jit(f).lower(*args).compile()
    txt = compiled.as_text()
    with open("/tmp/hlo_peek.txt", "w") as fh:
        fh.write(txt)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print({k: v for k, v in sorted(ca.items()) if "bytes" in k or k == "flops"})
    except Exception as e:  # noqa: BLE001
        print("cost_analysis unavailable:", repr(e))

    # rough pass structure: top-level ops in ENTRY with their output sizes
    entry = txt.split("ENTRY")[-1]
    sizes = []
    for line in entry.splitlines():
        m = re.search(r"= (\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        item = {"f32": 4, "bf16": 2, "s8": 1, "s32": 4, "pred": 1, "u32": 4}.get(dt, 4)
        op = line.strip().split(" = ")[0]
        kind = re.search(r"= \S+ (\w+)", line)
        sizes.append((n * item, kind.group(1) if kind else "?", op[:60]))
    sizes.sort(reverse=True)
    print("top ENTRY ops by output bytes:")
    for sz, kind, op in sizes[:25]:
        print(f"  {sz/1e6:9.2f} MB  {kind:14s} {op}")


if __name__ == "__main__":
    main()

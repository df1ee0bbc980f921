"""QKV self-attention over flattened spatial tokens.

Reference behavior: guided_diffusion/unet.py:328-393. Two head-split channel
layouts exist in released checkpoints and both must be supported bit-for-bit
(unet.py:287-292):

  - legacy (`QKVAttentionLegacy`): qkv channels laid out [head][q|k|v][d]
  - new (`QKVAttention`):          qkv channels laid out [q|k|v][head][d]

Both pre-scale q and k by 1/sqrt(sqrt(d)) before the matmul and run the
softmax in f32 (unet.py:348-352, 381-387) — the fp16/bf16 stability contract.

This is the XLA path; `guided_diffusion_clip_tpu.ops.pallas_attention`
provides the fused TPU kernel with the same signature (selected via
ops.config). Token counts here are small (<=4096 at ADM configs, SURVEY §5.7),
so a single-block VMEM-resident kernel is the right shape.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def split_qkv(qkv: jax.Array, num_heads: int, new_order: bool):
    """Split a (B, T, 3C) qkv tensor into q/k/v of shape (B, T, H, d)."""
    B, T, W = qkv.shape
    assert W % (3 * num_heads) == 0, f"qkv width {W} not divisible by 3*{num_heads}"
    d = W // (3 * num_heads)
    if new_order:
        x = qkv.reshape(B, T, 3, num_heads, d)
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    else:
        x = qkv.reshape(B, T, num_heads, 3, d)
        q, k, v = x[:, :, :, 0], x[:, :, :, 1], x[:, :, :, 2]
    return q, k, v


def merge_heads(a: jax.Array) -> jax.Array:
    """(B, T, H, d) -> (B, T, C)."""
    B, T, H, d = a.shape
    return a.reshape(B, T, H * d)


def qkv_attention(qkv: jax.Array, num_heads: int, *, new_order: bool = False) -> jax.Array:
    """(B, T, 3C) -> (B, T, C) with f32 softmax and ch^-1/4 double scaling."""
    q, k, v = split_qkv(qkv, num_heads, new_order)
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum(
        "bthd,bshd->bhts", q * scale, k * scale, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", weights, v)
    return merge_heads(out)


def attention(qkv: jax.Array, num_heads: int, *, new_order: bool = False) -> jax.Array:
    """Implementation-dispatching entry point used by the models."""
    from .config import resolve_attention_impl

    impl = resolve_attention_impl()
    B, T, W = qkv.shape
    d = W // (3 * num_heads)
    # Mosaic tiles are (8, 128); unaligned token counts (e.g. the classifier's
    # 65-token AttentionPool) go through XLA rather than a padded kernel.
    aligned = (T % 8 == 0) and (d % 8 == 0)
    # Under spatial partitioning the program is GSPMD-partitioned and a
    # pallas_call is an opaque custom call the partitioner can only replicate
    # (all-gathering the batch onto every device); the einsum path shards
    # cleanly over 'data'. SP is trace-time global, like the impl choice.
    from ..parallel import sp, tp

    if impl == "xla" or (impl == "pallas" and not aligned) or sp.active() or tp.active():
        return qkv_attention(qkv, num_heads, new_order=new_order)
    from .pallas_attention import qkv_attention_pallas

    return qkv_attention_pallas(
        qkv, num_heads, new_order=new_order, interpret=(impl == "pallas_interpret")
    )

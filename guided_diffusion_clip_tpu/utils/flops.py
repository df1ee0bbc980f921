"""FLOP accounting: analytic attention count + compiled-program cost analysis.

The reference exposes `count_flops_attn`, a thop hook adding the attention
matmul FLOPs (unet.py:308-325). The TPU-native equivalents:

  * `attention_matmul_flops` — the same closed-form count (both QK^T and
    attn@V matmuls, 2*B*S^2*C), usable without running anything;
  * `compiled_cost` — XLA's own cost model for ANY jitted function via
    jit(...).lower(...).compile().cost_analysis(), which is what MFU claims
    in BENCH reports should cite (it covers convs, norms, everything).
"""

from __future__ import annotations

import jax


def attention_matmul_flops(batch: int, num_spatial: int, channels: int) -> int:
    """FLOPs of one attention block's two big matmuls (unet.py:308-325).

    QK^T and weight@V each cost B * S^2 * C multiply-accumulates; following
    the reference's convention each MAC counts once per matmul.
    """
    return 2 * batch * (num_spatial**2) * channels


def compiled_cost(fn, *args, static_argnums=(), **kwargs) -> dict:
    """Compile `fn` for the given example args and return XLA's cost analysis.

    Returns a dict with at least `flops` and `bytes accessed` (keys as XLA
    reports them; values are floats). Compilation happens for the default
    backend — run under the TPU for TPU numbers, CPU works for tests.
    """
    lowered = jax.jit(fn, static_argnums=static_argnums).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):  # older jax: one dict per device
        analysis = analysis[0]
    return dict(analysis)


def flops_per_step(fn, *args, **kwargs) -> float:
    """Convenience: just the FLOP count of one call to `fn`."""
    return float(compiled_cost(fn, *args, **kwargs).get("flops", float("nan")))

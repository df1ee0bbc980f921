"""Kernel implementation selection.

`attention_impl`: "auto" (Pallas on TPU, XLA elsewhere), "xla", "pallas", or
"pallas_interpret" (CPU-testable). Settable via GDC_ATTENTION_IMPL or
set_attention_impl(); read at trace time, so switch before jit.
"""

from __future__ import annotations

import os

_attention_impl = os.environ.get("GDC_ATTENTION_IMPL", "auto")


def set_attention_impl(impl: str) -> None:
    global _attention_impl
    assert impl in ("auto", "xla", "pallas", "pallas_interpret"), impl
    _attention_impl = impl


def get_attention_impl() -> str:
    return _attention_impl


def resolve_attention_impl() -> str:
    import jax

    impl = _attention_impl
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


# ---------------------------------------------------------------------------
# Conv implementation: "xla" (bf16/f32, default) or "int8" (dynamic-quantized
# fast path for sampling — 2x MXU rate on v5e, see ops/quant.py). "auto"
# currently resolves to "xla": int8 changes numerics, so it stays opt-in.
# ---------------------------------------------------------------------------

_conv_impl = os.environ.get("GDC_CONV_IMPL", "auto")


# ---------------------------------------------------------------------------
# GroupNorm implementation. "auto" is path-dependent, from in-context v5e
# measurements (tools/block_microbench.py + tools/perf_breakdown.py, round
# 2): the plain bf16 UNet forward is faster with the Pallas kernel (340 vs
# 374 ms), but the QUANTIZING GN is faster as an XLA composite (full int8
# step 372 vs 434 ms) because XLA fuses the quantize chain into neighbors
# while a pallas_call is an opaque fusion barrier.
# ---------------------------------------------------------------------------

_groupnorm_impl = os.environ.get("GDC_GROUPNORM_IMPL", "auto")


def set_groupnorm_impl(impl: str) -> None:
    global _groupnorm_impl
    assert impl in ("auto", "xla", "pallas", "pallas_interpret"), impl
    _groupnorm_impl = impl


def resolve_groupnorm_impl(quantize: bool = False) -> str:
    if _groupnorm_impl == "auto":
        import jax

        if jax.default_backend() != "tpu":
            return "xla"
        return "xla" if quantize else "pallas"
    return _groupnorm_impl


def set_conv_impl(impl: str) -> None:
    global _conv_impl
    assert impl in ("auto", "xla", "int8"), impl
    _conv_impl = impl


def get_conv_impl() -> str:
    return _conv_impl


def resolve_conv_impl() -> str:
    return "xla" if _conv_impl == "auto" else _conv_impl

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

# ContextVar, not a module global: bench.py traces programs under different
# conv impls from a background AOT-compile thread — each thread sees its own
# value (a fresh thread starts from the env default, same as before).
import contextvars

_conv_impl = contextvars.ContextVar(
    "gdc_conv_impl", default=os.environ.get("GDC_CONV_IMPL", "auto")
)


# ---------------------------------------------------------------------------
# GroupNorm implementation. "auto" resolves to the XLA composite everywhere
# since the one-pass-stats rewrite (sibling sum reduces instead of
# .mean()+.var(), 2026-08-17): in-context on v5e the composite now beats the
# Pallas kernel for BOTH paths — bf16 UNet fwd 297 vs 340 ms, int8 step 256
# vs (pallas-GN) 434 ms — because XLA additionally fuses the producer add /
# consumer chain into the same passes while a pallas_call is an opaque
# fusion barrier. (Pre-rewrite history: the two-reduce composite lost to the
# Pallas kernel 374 vs 340 ms on the bf16 path; the kernel stays in-tree and
# dispatchable via GDC_GROUPNORM_IMPL=pallas.)
# ---------------------------------------------------------------------------

_groupnorm_impl = os.environ.get("GDC_GROUPNORM_IMPL", "auto")


def set_groupnorm_impl(impl: str) -> None:
    global _groupnorm_impl
    assert impl in ("auto", "xla", "pallas", "pallas_interpret"), impl
    _groupnorm_impl = impl


def resolve_groupnorm_impl(quantize: bool = False) -> str:
    if _groupnorm_impl == "auto":
        return "xla"
    return _groupnorm_impl


def set_conv_impl(impl: str) -> None:
    assert impl in ("auto", "xla", "int8"), impl
    _conv_impl.set(impl)


def get_conv_impl() -> str:
    return _conv_impl.get()


def resolve_conv_impl() -> str:
    impl = _conv_impl.get()
    return "xla" if impl == "auto" else impl


# ---------------------------------------------------------------------------
# int8 handshake emission dtype. "bf16" (default): the quantizing GroupNorm
# emits integer-VALUED bf16 — autodiff-friendly (STE custom_vjp maps the dq
# cotangent back through the exact GN math), required wherever gradients flow
# through the quantized model (the guided classifier, CLIP-through-x0).
# "s8": emit REAL int8 — halves the apply-pass write and lets XLA's s8 conv
# consume the tensor without a separate bf16->s8 convert/transpose pass
# (measured in the optimized HLO: the convert materializes an extra copy of
# every conv input). Gradients do NOT flow through an s8 emission (integer
# outputs have no tangent), so it is scoped, not global: wrap only the
# generator's apply in sampling, never the classifier's.
# ---------------------------------------------------------------------------

import contextlib

_int8_emit = "bf16"


@contextlib.contextmanager
def int8_emit(dtype: str):
    """Scope the quantizing-GN emission dtype at TRACE time ("s8"|"bf16")."""
    global _int8_emit
    assert dtype in ("bf16", "s8"), dtype
    prev = _int8_emit
    _int8_emit = dtype
    try:
        yield
    finally:
        _int8_emit = prev


def resolve_int8_emit() -> str:
    return _int8_emit

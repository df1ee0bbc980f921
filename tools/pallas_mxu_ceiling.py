"""Measure Mosaic's raw MXU matmul ceiling for s8 and bf16 dots.

Decides whether the round-3 "Pallas s8 conv beating XLA's 157.6 TF/s at the
ds1 shape" lever is alive: the fused conv kernel (ops/pallas_conv.py)
measured ~100 TF/s, but that number folds in requantize + scratch traffic.
This probe times PURE dot_generals from VMEM-resident operands — no HBM
traffic in the loop — so it upper-bounds what any Pallas conv could reach.

Method: one pallas_call whose kernel runs T accumulating (512x2048)@(2048x512)
dots in a fori_loop (a per-iteration scalar add on the LHS defeats
loop-invariant hoisting; ~7% VPU tax at this shape). Two calls with
different T are timed and the rate taken from the slope, cancelling the
~24 ms relay dispatch overhead and the prologue copies.

Usage: python tools/pallas_mxu_ceiling.py
"""

import functools
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

BM, BK, BN = 512, 2048, 512
REPS = int(os.environ.get("MXU_REPS", 3))


def _kernel(x_ref, w_ref, o_ref, *, T: int, acc_dtype):
    # The dot operands are loop-invariant; int8 elementwise VPU ops don't
    # exist on v5e (an `x + t` perturbation fails Mosaic compilation), so we
    # rely on Mosaic not hoisting/CSE-ing the loop body. The two-T slope
    # self-validates this: a hoisted dot would give equal walls for
    # T=2000/6000 and a nonsensical slope.
    def body(t, acc):
        return acc + jax.lax.dot_general(
            x_ref[...], w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    acc = jax.lax.fori_loop(
        0, T, body, jnp.zeros((BM, BN), acc_dtype), unroll=False
    )
    o_ref[...] = acc


def make(T: int, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    acc_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32
    f = pl.pallas_call(
        functools.partial(_kernel, T=T, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((BM, BN), acc_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(x, w):
        return jnp.sum(f(x, w).astype(jnp.float32))

    return run


def timed(run, x, w):
    float(run(x, w))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        float(run(x, w))
        best = min(best, time.time() - t0)
    return best


def main():
    rs = np.random.RandomState(0)
    results = {}
    for name, dtype in [("s8", jnp.int8), ("bf16", jnp.bfloat16)]:
        if dtype == jnp.int8:
            x = jax.device_put(rs.randint(-127, 127, (BM, BK)).astype(np.int8))
            w = jax.device_put(rs.randint(-127, 127, (BK, BN)).astype(np.int8))
        else:
            x = jax.device_put(rs.randn(BM, BK).astype(jnp.bfloat16))
            w = jax.device_put(rs.randn(BK, BN).astype(jnp.bfloat16))
        t_lo, t_hi = 2000, 6000
        flop_per_iter = 2 * BM * BK * BN
        try:
            s_lo = timed(make(t_lo, dtype), x, w)
            s_hi = timed(make(t_hi, dtype), x, w)
        except Exception as e:  # noqa: BLE001 - report per-dtype failure
            results[name] = {"error": repr(e)[:200]}
            continue
        tfs = (t_hi - t_lo) * flop_per_iter / (s_hi - s_lo) / 1e12
        results[name] = {
            "tf_per_sec_slope": round(tfs, 1),
            "wall_lo_ms": round(s_lo * 1e3, 2),
            "wall_hi_ms": round(s_hi * 1e3, 2),
        }
        print(f"{name}: {results[name]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

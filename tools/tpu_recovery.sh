#!/bin/bash
# Unattended TPU-recovery measurement sweep.
#
# The axon relay dies for hours at a time; recovery windows may be short.
# This script runs every chip-gated measurement back-to-back, logging each
# to /tmp/recovery_<name>.log, so a single invocation captures everything
# the round still needs:
#   1. full bench.py (driver-style: sampling int8/bf16 + train headline)
#   2. train_step_bench at the README 64px config
#   3. train_step_bench at the fork's actual 128px recipe (TSB_CONFIG=fork128)
#   4. on-chip int8 chain-level quality (tools/int8_chain_quality.py defaults)
#   5. int8 *training forward* step time (TSB_CONV_IMPL=int8), the one
#      opt-in train upgrade still unmeasured on-chip
#   6. flat-buffer optimizer step time (TSB_OPT_IMPL=flat) vs the per-leaf
#      tree default — the ~33ms opt/EMA-tail lever
#
# Usage: bash tools/tpu_recovery.sh   (from the repo root; ambient axon env)

set -u
cd "$(dirname "$0")/.."
stamp() { date +%H:%M:%S; }

run() {
  local name="$1"; shift
  local budget="$1"; shift
  echo "[$(stamp)] START $name (budget ${budget}s): $*"
  timeout "$budget" "$@" >"/tmp/recovery_${name}.log" 2>&1
  local rc=$?
  echo "[$(stamp)] DONE  $name rc=$rc; tail:"
  tail -5 "/tmp/recovery_${name}.log" | sed 's/^/    /'
  return $rc
}

# Quick liveness gate: a tiny jit must complete or nothing below will.
cat > /tmp/gdc_probe_tpu.py <<'EOF'
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a * a).sum())(jnp.ones((128, 128)))
x.block_until_ready()
print(f"jit+run {time.time()-t0:.1f}s on {jax.devices()}: {x}", flush=True)
EOF
run probe 600 python /tmp/gdc_probe_tpu.py || { echo "RELAY STILL DOWN — aborting"; exit 1; }

run bench      1300 env BENCH_WATCHDOG_SECS=1200 python bench.py
run tsb64      1200 python tools/train_step_bench.py
run tsb128     1500 env TSB_CONFIG=fork128 python tools/train_step_bench.py
run tsb64_int8 1200 env TSB_CONV_IMPL=int8 python tools/train_step_bench.py
run tsb64_flat 1200 env TSB_OPT_IMPL=flat python tools/train_step_bench.py
# (no zero1 run: on ONE chip the ZeRO-1 shard axis is size 1 — identical to flat)
run chainq     2400 python tools/int8_chain_quality.py
# DeepCache: throughput + same-seed fidelity vs the uncached guided chain
run deepcache  2400 python tools/deep_cache_bench.py

echo "[$(stamp)] sweep complete — logs in /tmp/recovery_*.log"

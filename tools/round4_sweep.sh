#!/bin/bash
# Round-4 on-chip measurement sweep (VERDICT r3 items 1, 3, 4, 9).
#
# The morning recovery sweep (tools/tpu_recovery.sh, logs in
# /tmp/recovery_*.log) already captured: bench headline (int8 16.38, bf16
# 11.38 samples/min), train_step_bench readme64/fork128/int8/flat, the 16px
# chain quality, and DeepCache int8 throughput (dc2/3/5 = +22/+32/+43%).
# This sweep captures what is still missing:
#   1. at-scale (64px ADM-style, bf16 torso) int8 chain quality, ancestral
#      250-step AND ddim25 — closes the int8 quality asterisk (VERDICT #3)
#   2. trained-model DeepCache fidelity (dc2/dc3) at 64px — the gate for
#      documenting --deep_cache as the fast bf16 config (VERDICT #4);
#      deep_cache_bench's random-init corr=1.0 is not evidence
#   3. DeepCache bf16 throughput (DCB_CONV_IMPL=xla) — does bf16+dc clear
#      the >=5x target without int8?
#   4. serve.py warm-request latency at batch 8 ddim25 (VERDICT #9)
#   5. full bench.py with the round-4 section ordering (train before bf16)
#
# Usage: bash tools/round4_sweep.sh   (repo root; ambient axon env)

set -u
cd "$(dirname "$0")/.."
stamp() { date +%H:%M:%S; }

run() {
  local name="$1"; shift
  local budget="$1"; shift
  echo "[$(stamp)] START $name (budget ${budget}s): $*"
  timeout "$budget" "$@" >"/tmp/r4_${name}.log" 2>&1
  local rc=$?
  echo "[$(stamp)] DONE  $name rc=$rc; tail:"
  tail -3 "/tmp/r4_${name}.log" | sed 's/^/    /'
  return $rc
}

# Liveness gate
cat > /tmp/gdc_probe_tpu.py <<'EOF'
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a * a).sum())(jnp.ones((128, 128)))
x.block_until_ready()
print(f"jit+run {time.time()-t0:.1f}s on {jax.devices()}: {x}", flush=True)
EOF
run probe 600 python /tmp/gdc_probe_tpu.py || { echo "RELAY DOWN — aborting"; exit 1; }

# 1. at-scale int8 chain quality: 64px ADM-style, T=1000, 250-step ancestral
run chainq64_anc 3000 env INT8Q_IMAGE=64 INT8Q_TRAIN_STEPS=600 \
  INT8Q_DIFFUSION_STEPS=1000 INT8Q_RESPACING=250 INT8Q_SAMPLES=64 \
  INT8Q_BATCH=16 python tools/int8_chain_quality.py

# ... and the fast-sampling config: ddim25
run chainq64_ddim 2400 env INT8Q_IMAGE=64 INT8Q_TRAIN_STEPS=600 \
  INT8Q_DIFFUSION_STEPS=1000 INT8Q_RESPACING=ddim25 INT8Q_SAMPLER=ddim \
  INT8Q_SAMPLES=64 INT8Q_BATCH=16 python tools/int8_chain_quality.py

# 2. trained-model DeepCache fidelity at 64px, 250-step ancestral
run dcq64_dc2 3000 env INT8Q_IMAGE=64 INT8Q_TRAIN_STEPS=600 \
  INT8Q_DIFFUSION_STEPS=1000 INT8Q_RESPACING=250 INT8Q_SAMPLES=64 \
  INT8Q_BATCH=16 INT8Q_VARIANT=dc2 python tools/int8_chain_quality.py
run dcq64_dc3 3000 env INT8Q_IMAGE=64 INT8Q_TRAIN_STEPS=600 \
  INT8Q_DIFFUSION_STEPS=1000 INT8Q_RESPACING=250 INT8Q_SAMPLES=64 \
  INT8Q_BATCH=16 INT8Q_VARIANT=dc3 python tools/int8_chain_quality.py

# 3. DeepCache bf16 throughput at the headline config
run deepcache_bf16 2400 env DCB_CONV_IMPL=xla DCB_INTERVALS=2,3 \
  python tools/deep_cache_bench.py

# 4. serve.py warm latency (the script self-measures; see tools/serve_bench.py)
run serve_bench 1800 python tools/serve_bench.py

# 5. full bench.py with round-4 ordering (also warms the driver's compile cache)
run bench_r4 1300 env BENCH_WATCHDOG_SECS=1200 python bench.py

echo "[$(stamp)] round-4 sweep complete — logs in /tmp/r4_*.log"

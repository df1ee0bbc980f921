#!/bin/bash
# Watch for the axon TPU relay to come back, then run the recovery sweep.
#
# Probes with a tiny jitted op every ~8 min (each probe bounded at 240s —
# when the relay is down the first compile hangs forever, so a timeout IS
# the down signal). On the first successful probe it runs
# tools/tpu_recovery.sh (full chip-gated measurement sweep) and exits.
# Gives up after MAX_HOURS so the driver isn't left with a zombie.

set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${MAX_HOURS:-10}"
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

cat > /tmp/gdc_relay_probe.py <<'EOF'
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a * a).sum())(jnp.ones((128, 128)))
x.block_until_ready()
print(f"ALIVE jit+run {time.time()-t0:.1f}s: {x}", flush=True)
EOF

n=0
while [ "$(date +%s)" -lt "$deadline" ]; do
  n=$((n + 1))
  echo "[$(date +%H:%M:%S)] probe #$n"
  # 420s: relay-side compiles of even tiny programs vary 2-8 min when the
  # relay is degraded — a short timeout misclassifies slow as down.
  if timeout 420 python /tmp/gdc_relay_probe.py 2>&1 | grep -q ALIVE; then
    echo "[$(date +%H:%M:%S)] RELAY IS BACK — starting recovery sweep"
    if bash tools/tpu_recovery.sh; then
      echo "[$(date +%H:%M:%S)] recovery sweep finished OK"
      exit 0
    fi
    # the relay flaps: a probe can succeed and the sweep's gate then hang.
    # Keep watching instead of giving up the whole window.
    echo "[$(date +%H:%M:%S)] sweep aborted (relay flapped?) — resuming watch"
  fi
  echo "[$(date +%H:%M:%S)] still down; sleeping 8 min"
  sleep 480
done
echo "[$(date +%H:%M:%S)] gave up after ${MAX_HOURS}h"
exit 1

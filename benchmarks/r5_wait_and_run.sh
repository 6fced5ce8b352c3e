#!/bin/bash
# Poll the axon TPU tunnel; on every successful probe, (re-)invoke the
# idempotent round-5 runner (r5_device_run.sh) — it only executes legs
# whose captures are still missing, so a flapping tunnel completes the
# leg list across windows. Exits when the runner reports all legs done.
#
# Probe cadence: a dead tunnel hangs rather than failing, so the probe
# runs under a 240s timeout (a LIVE probe incl. first compile finishes
# well under that) + 120s sleep -> worst-case ~6 min to spot a window
# (the round-3/4 waiter burned 15 min/cycle on a 600s probe timeout).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_wait_and_run.log
echo "[wait $(date +%H:%M:%S)] start" >> "$LOG"
while true; do
  out=$(timeout 240 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.arange(8.0))))" 2>&1 | tail -1)
  echo "[wait $(date +%H:%M:%S)] probe: $out" >> "$LOG"
  if [ "$out" = "28.0" ]; then
    echo "[wait $(date +%H:%M:%S)] device up — running r5_device_run.sh" >> "$LOG"
    bash benchmarks/r5_device_run.sh >> "$LOG" 2>&1
    rc=$?
    echo "[wait $(date +%H:%M:%S)] r5_device_run.sh rc=$rc" >> "$LOG"
    if [ "$rc" = 0 ]; then
      echo "[wait $(date +%H:%M:%S)] all legs captured — waiter done" >> "$LOG"
      exit 0
    fi
  fi
  sleep 120
done

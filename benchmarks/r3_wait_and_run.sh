#!/bin/bash
# Poll the axon TPU tunnel; as soon as a device computation succeeds,
# launch the round-3 measurement sequence (r3_device_run.sh).
# Safe to leave running: probes are cheap, and the run script itself
# re-checks the device before doing anything expensive.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_wait_and_run.log
echo "[wait $(date +%H:%M:%S)] start" >> "$LOG"
while true; do
  out=$(timeout 600 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.arange(8.0))))" 2>&1 | tail -1)
  echo "[wait $(date +%H:%M:%S)] probe: $out" >> "$LOG"
  if [ "$out" = "28.0" ]; then
    echo "[wait $(date +%H:%M:%S)] device up — launching r3_device_run.sh" >> "$LOG"
    bash benchmarks/r3_device_run.sh >> "$LOG" 2>&1
    echo "[wait $(date +%H:%M:%S)] r3_device_run.sh finished" >> "$LOG"
    exit 0
  fi
  sleep 300
done

#!/bin/bash
# v2 waiter: same loop as r5_wait_and_run.sh, drives r5b_device_run.sh.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_wait_and_run.log
echo "[wait $(date +%H:%M:%S)] start (v2)" >> "$LOG"
while true; do
  out=$(timeout 240 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.arange(8.0))))" 2>&1 | tail -1)
  echo "[wait $(date +%H:%M:%S)] probe: $out" >> "$LOG"
  if [ "$out" = "28.0" ]; then
    echo "[wait $(date +%H:%M:%S)] device up — running r5b_device_run.sh" >> "$LOG"
    bash benchmarks/r5b_device_run.sh >> "$LOG" 2>&1
    rc=$?
    echo "[wait $(date +%H:%M:%S)] r5b_device_run.sh rc=$rc" >> "$LOG"
    if [ "$rc" = 0 ]; then
      echo "[wait $(date +%H:%M:%S)] all legs captured — waiter done" >> "$LOG"
      exit 0
    fi
  fi
  sleep 120
done

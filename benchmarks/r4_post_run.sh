#!/bin/bash
# Round-4 post-sequence: the scale ladder (round-3 verdict item 4), then
# collection into CONFIGS_r04.json and mechanical regeneration of the
# README/PARITY results tables. Chained automatically from
# r3_device_run.sh so a late-arriving tunnel still yields the full record
# unattended; safe to run standalone too (every step re-checks nothing —
# the device check happened upstream — but runs under timeout).
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/out_r3   # same capture dir as the armed device runner
mkdir -p "$OUT"
log() { echo "[r4post $(date +%H:%M:%S)] $*"; }

# --- scale ladder ------------------------------------------------------------
log "configs 1,2 (small + headline shapes, fresh measurements)"
timeout 3600 python benchmarks/run_configs.py --configs 1,2 \
  2>&1 | tee "$OUT/config12.jsonl"
log "config 3 --full (2^29 filter->probe->group-by)"
timeout 7200 python benchmarks/run_configs.py --configs 3 --full \
  2>&1 | tee "$OUT/config3_full.jsonl"
log "config 4 --full (2^30 Zipf coprocess, new pipelined path)"
timeout 10800 python benchmarks/run_configs.py --configs 4 --full \
  2>&1 | tee "$OUT/config4_full.jsonl"
log "config 6 --full (2B-shape streaming leg)"
timeout 10800 python benchmarks/run_configs.py --configs 6 --full \
  2>&1 | tee "$OUT/config6_full.jsonl"

# --- collection + published tables -------------------------------------------
log "regenerate weak-scaling model from fresh phase times"
python benchmarks/regen_scaling_model.py "$OUT" || true
log "collect -> CONFIGS_r04.json"
python benchmarks/collect_r3.py "$OUT" CONFIGS_r04.json
log "regenerate README/PARITY results tables"
python benchmarks/gen_results_tables.py
log "DONE — review $OUT + CONFIGS_r04.json, decide sort default, commit"

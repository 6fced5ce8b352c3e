#!/bin/bash
# Round-5 post-ladder device queue: refresh artifacts that predate the
# merge-cascade fixes, then re-collect.
#
#  1. smoke.jsonl was captured BEFORE commits 1aaf8ba/a441639 fixed the
#     cascade (it shows 3 Mosaic compile failures that no longer happen);
#     re-run the gate so the checked-in artifact reflects the fixed code.
#  2. merge_validate.jsonl: the sort-decision table in DESIGN_NOTES cites
#     merge_fix_validate.py 27 (880.6 ms) with no checked-in artifact —
#     capture one (correctness + timing JSON lines).
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/out_r5
log() { echo "[post $(date +%H:%M:%S)] $*"; }

timeout 300 python -c "import jax; print(jax.devices())" || {
  log "no device"; exit 1; }

log "smoke gate (fresh, post-cascade-fix)"
timeout 1800 python benchmarks/tpu_smoke.py 2>&1 | tee "$OUT/smoke.jsonl.tmp"
grep -q '^{' "$OUT/smoke.jsonl.tmp" && mv "$OUT/smoke.jsonl.tmp" "$OUT/smoke.jsonl"

if ! grep -q '^{' "$OUT/merge_validate.jsonl" 2>/dev/null; then
  log "merge cascade decision artifact (2^24: fewer HBM levels to compile)"
  timeout 3600 python benchmarks/merge_fix_validate.py 24 2>&1 \
    | tee "$OUT/merge_validate.jsonl.tmp"
  grep -q '^{' "$OUT/merge_validate.jsonl.tmp" \
    && mv "$OUT/merge_validate.jsonl.tmp" "$OUT/merge_validate.jsonl"
fi

log "re-collect"
python benchmarks/collect_r3.py "$OUT" CONFIGS_r05.json || true
python benchmarks/gen_results_tables.py || true
log "done"

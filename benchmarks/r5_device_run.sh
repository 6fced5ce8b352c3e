#!/bin/bash
# Round-5 device measurement sequence, unattended + IDEMPOTENT.
#
# Three rounds of tunnel flap taught us the window can close mid-run, so
# every leg (a) runs under `timeout`, (b) tees its JSON lines to its own
# capture file under benchmarks/out_r5/, and (c) is SKIPPED on re-entry
# when its capture already holds a JSON line — the waiter loop re-invokes
# this script on every successful probe, and each invocation only does
# the legs still missing. Collection + table regen run after the decision
# block AND at the end, so even a one-leg window updates CONFIGS_r05.json.
#
# Leg order = decision value per tunnel-minute (round-4 verdict item 1):
# smoke gate, headline x3 sort impls (THE sort decision), exchange leg,
# Zipf headline, sort diagnostics, overlap evidence, scale ladder.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/out_r5
mkdir -p "$OUT"
log() { echo "[r5run $(date +%H:%M:%S)] $*"; }

have() { [ -f "$1" ] && grep -q '^{' "$1"; }

# run <capture-file> <timeout-s> <cmd...>: skip when captured, else run.
run() {
  local cap="$1" tmo="$2"; shift 2
  if have "$cap"; then log "skip (captured): $cap"; return 0; fi
  log "run: $* -> $cap"
  timeout "$tmo" "$@" 2>&1 | tee "$cap.tmp"
  # keep only real captures: a file with at least one JSON line
  if grep -q '^{' "$cap.tmp"; then mv "$cap.tmp" "$cap"; else
    log "leg produced no JSON (device gone?): $cap"; rm -f "$cap.tmp";
    MISSING=1; fi
}

collect() {
  python benchmarks/regen_scaling_model.py "$OUT" WEAK_SCALING_MODEL_r05.json || true
  python benchmarks/collect_r3.py "$OUT" CONFIGS_r05.json || true
  python benchmarks/gen_results_tables.py || true
}

MISSING=0
log "device check"
timeout 300 python -c "import jax; print(jax.devices())" || {
  log "no device — aborting"; exit 1; }

# --- 0. FIRST NUMBER in minutes: quick lax headline at 2^24 -----------------
# (a 10-minute window should still produce a fresh measurement; oracle
# values for s18/s24/s27 are pre-cached in data/oracle_agg_*.json)
BENCH_SCALE=24 run "$OUT/bench_quick24.jsonl" 900 python bench.py

# --- 1. the lax headline (no Pallas dependency — before the smoke gate) -----
run "$OUT/bench_lax.jsonl" 2400 python bench.py

# --- 2. smoke gate (validates every Pallas path incl. the merge cascade) ----
run "$OUT/smoke.jsonl" 1800 python benchmarks/tpu_smoke.py

# --- 3. THE decision: headline under the alternate sort impls ---------------
for impl in packed merge; do
  TPUJOIN_SORT_IMPL=$impl run "$OUT/bench_$impl.jsonl" 2400 python bench.py
done

# --- 4. exchange leg (config 5, round-2 bar: >=50% of plain join) -----------
run "$OUT/config5.jsonl" 3600 python benchmarks/run_configs.py --configs 5

# --- 5. Zipf headline (cached 2^27 z=1.05 dataset; cheap) --------------------
BENCH_SKEW=1.05 run "$OUT/bench_zipf.jsonl" 2400 python bench.py

log "decision legs done — interim collection"
collect
python benchmarks/r4_decide.py "$OUT" || true

# --- 6. sort diagnostics (explain WHY the winner wins) -----------------------
run "$OUT/sort_stages.jsonl" 2400 python benchmarks/merge_sort_bench.py stages 24
run "$OUT/sort_packed.jsonl" 1800 python benchmarks/merge_sort_bench.py packed 27
run "$OUT/sort_full.jsonl"   3600 python benchmarks/merge_sort_bench.py full 27

# --- 7. overlap evidence ------------------------------------------------------
run "$OUT/overlap_coprocess.jsonl" 2400 python benchmarks/overlap_bench.py coprocess 22
run "$OUT/overlap_streaming.jsonl" 2400 python benchmarks/overlap_bench.py

# --- 8. scale ladder ----------------------------------------------------------
run "$OUT/config12.jsonl"     3600 python benchmarks/run_configs.py --configs 1,2
run "$OUT/config3_full.jsonl" 7200 python benchmarks/run_configs.py --configs 3 --full
run "$OUT/config4_full.jsonl" 10800 python benchmarks/run_configs.py --configs 4 --full
run "$OUT/config6_full.jsonl" 10800 python benchmarks/run_configs.py --configs 6 --full

# --- collection + published tables --------------------------------------------
log "final collection"
collect

if [ "$MISSING" = 1 ]; then
  log "some legs missing — waiter will retry on the next window"
  exit 2
fi
log "ALL LEGS CAPTURED — review $OUT + CONFIGS_r05.json, decide sort default"
exit 0

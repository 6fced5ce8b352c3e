#!/bin/bash
# Round-5 device runner, v2 (post-decision-legs revision).
#
# v1 (r5_device_run.sh) captured the decision block in the first window:
# lax 299.13 / packed 196.66 / merge = Mosaic compiler crash, exchange leg
# 217 vs 270 one-shot (80%, bar was >=50%), Zipf headline 279.19 (-6.7%),
# coprocess overlap 1.0. This revision:
#   * drops the legs that are KNOWN dead on this toolchain (bench_merge,
#     sort_full: the HBM merge kernels kill tpu_compile_helper; re-running
#     them every window wasted ~3 min/cycle) — they come back via the
#     marker file benchmarks/out_r5/.merge_fixed once a fix lands;
#   * adds the Mosaic bisect (construct-level compile probes) and the
#     OOM-fixed stage-rate bench (stages2) so the cascade question gets
#     its decision data;
#   * then runs the scale ladder exactly as v1.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/out_r5
mkdir -p "$OUT"
log() { echo "[r5run $(date +%H:%M:%S)] $*"; }

have() { [ -f "$1" ] && grep -q '^{' "$1"; }

run() {
  local cap="$1" tmo="$2"; shift 2
  if have "$cap"; then log "skip (captured): $cap"; return 0; fi
  log "run: $* -> $cap"
  timeout "$tmo" "$@" 2>&1 | tee "$cap.tmp"
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

# --- decision legs (normally already captured by v1) -------------------------
BENCH_SCALE=24 run "$OUT/bench_quick24.jsonl" 900 python bench.py
run "$OUT/bench_lax.jsonl" 2400 python bench.py
run "$OUT/smoke.jsonl" 1800 python benchmarks/tpu_smoke.py
TPUJOIN_SORT_IMPL=packed run "$OUT/bench_packed.jsonl" 2400 python bench.py
run "$OUT/config5.jsonl" 3600 python benchmarks/run_configs.py --configs 5
BENCH_SKEW=1.05 run "$OUT/bench_zipf.jsonl" 2400 python bench.py

# --- cascade decision data ----------------------------------------------------
run "$OUT/bisect.jsonl" 1800 python benchmarks/mosaic_bisect.py
run "$OUT/stages2.jsonl" 1800 python benchmarks/merge_sort_bench.py stages 24
run "$OUT/sort_packed.jsonl" 1800 python benchmarks/merge_sort_bench.py packed 27

# merge legs only after a fix is marked
if [ -f "$OUT/.merge_fixed" ]; then
  TPUJOIN_SORT_IMPL=merge run "$OUT/bench_merge.jsonl" 2400 python bench.py
  run "$OUT/sort_full.jsonl" 3600 python benchmarks/merge_sort_bench.py full 27
fi

log "decision legs done — interim collection"
collect
python benchmarks/r4_decide.py "$OUT" || true

# --- overlap evidence ----------------------------------------------------------
run "$OUT/overlap_coprocess.jsonl" 2400 python benchmarks/overlap_bench.py coprocess 22
run "$OUT/overlap_streaming.jsonl" 2400 python benchmarks/overlap_bench.py

# --- scale ladder ---------------------------------------------------------------
run "$OUT/config12.jsonl"     3600 python benchmarks/run_configs.py --configs 1,2
run "$OUT/config3_full.jsonl" 7200 python benchmarks/run_configs.py --configs 3 --full
run "$OUT/config4_full.jsonl" 10800 python benchmarks/run_configs.py --configs 4 --full
run "$OUT/config6_full.jsonl" 10800 python benchmarks/run_configs.py --configs 6 --full

log "final collection"
collect

if [ "$MISSING" = 1 ]; then
  log "some legs missing — waiter will retry on the next window"
  exit 2
fi
log "ALL LEGS CAPTURED — review $OUT + CONFIGS_r05.json"
exit 0

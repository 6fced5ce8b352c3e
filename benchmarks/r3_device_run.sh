#!/bin/bash
# Device measurement sequence (round-3 runbook, re-ordered for round 4),
# unattended. Captures every JSON line under benchmarks/out_r3/. Ordered
# by decision value per tunnel-minute — the tunnel has flapped for whole
# rounds, so the DECISION legs (smoke gate, headline under each sort
# impl, exchange leg) run before the diagnostic microbenches; every step
# runs under `timeout` so one hang cannot eat the window, and a partial
# capture still answers the round's questions in order of importance.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/out_r3
mkdir -p "$OUT"
log() { echo "[r3run $(date +%H:%M:%S)] $*"; }

log "device check"
timeout 180 python -c "import jax; print(jax.devices())" || {
  log "no device — aborting"; exit 1; }

# --- 1. smoke gate (validates every Pallas path incl. the merge cascade) ----
log "tpu smoke"
timeout 1800 python benchmarks/tpu_smoke.py 2>&1 | tee "$OUT/smoke.jsonl"

# --- 2. THE decision: headline under each sort impl -------------------------
# (host-oracle gate results are pre-cached in data/oracle_agg_*.json)
for impl in lax packed merge; do
  log "bench.py impl=$impl"
  TPUJOIN_SORT_IMPL=$impl timeout 2400 python bench.py \
    2>&1 | tee "$OUT/bench_$impl.jsonl"
done

# --- 3. exchange leg (config 5, round-2 bar: >=50% of plain join) -----------
log "run_configs 5"
timeout 3600 python benchmarks/run_configs.py --configs 5 \
  2>&1 | tee "$OUT/config5.jsonl"

# --- 4. Zipf headline refresh (cached 2^27 z=1.05 dataset; cheap) -----------
log "bench.py zipf 1.05"
BENCH_SKEW=1.05 timeout 2400 python bench.py \
  2>&1 | tee "$OUT/bench_zipf.jsonl"

# --- 5. sort diagnostics (explain WHY the winner wins) -----------------------
log "merge_sort_bench stages 24"
timeout 2400 python benchmarks/merge_sort_bench.py stages 24 \
  2>&1 | tee "$OUT/sort_stages.jsonl"
log "merge_sort_bench packed 27"
timeout 1800 python benchmarks/merge_sort_bench.py packed 27 \
  2>&1 | tee "$OUT/sort_packed.jsonl"
log "merge_sort_bench full 27"
timeout 3600 python benchmarks/merge_sort_bench.py full 27 \
  2>&1 | tee "$OUT/sort_full.jsonl"

# --- 6. overlap evidence ----------------------------------------------------
log "overlap coprocess 22"
timeout 2400 python benchmarks/overlap_bench.py coprocess 22 \
  2>&1 | tee "$OUT/overlap_coprocess.jsonl"
log "overlap streaming"
timeout 2400 python benchmarks/overlap_bench.py \
  2>&1 | tee "$OUT/overlap_streaming.jsonl"

log "decision legs done — chaining into the round-4 scale ladder"

# --- 7. round-4 chain: scale ladder + collection + tables -------------------
bash benchmarks/r4_post_run.sh

log "DONE — decide sort default from $OUT/bench_*.jsonl + CONFIGS_r04.json"

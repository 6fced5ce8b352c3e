"""Round-4 decision summary from the device-run captures.

Reads benchmarks/out_r3/*.jsonl (written by r3_device_run.sh /
r4_post_run.sh) and prints the decisions the round hinges on:

  1. SORT: ranking of the headline under each sort impl (correct runs
     only) and which default to flip to.
  2. EXCHANGE: the 1-chip exchange legs vs the plain-join headline
     (round-2 bar: >= 50%).
  3. The scale-ladder and Zipf numbers in DESIGN_NOTES-ready form.

Usage: python benchmarks/r4_decide.py [outdir]
"""

import glob
import json
import os
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    root, "benchmarks", "out_r3")


def lines(path):
    out = []
    try:
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if ln.startswith("{"):
                    try:
                        out.append(json.loads(ln))
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass
    return out


print(f"== round-4 decision summary ({outdir}) ==")

# --- 1. sort decision --------------------------------------------------------
ranking = []
for impl in ("lax", "packed", "merge"):
    for rec in lines(os.path.join(outdir, f"bench_{impl}.jsonl")):
        if "value" in rec:
            ranking.append((impl, rec["value"], rec.get("correct"),
                            rec.get("vs_baseline")))
if ranking:
    ranking.sort(key=lambda t: -(t[1] if t[2] else -1))
    print("\n1. SORT (headline Mrows/s; correct runs rank, wrong runs sink):")
    for impl, v, ok, vsb in ranking:
        print(f"   {impl:7s} {v:8.2f} Mrows/s  correct={ok}  "
              f"vs_baseline={vsb}")
    best = next((r for r in ranking if r[2]), None)
    if best:
        print(f"   -> winner: {best[0]}"
              + ("" if best[0] == "lax" else
                 f" — flip EngineConfig.sort_impl default + "
                 f"TPUJOIN_SORT_IMPL fallback to '{best[0]}'"))
else:
    print("\n1. SORT: no bench_*.jsonl captures yet")

# --- 2. exchange bar ---------------------------------------------------------
# the exchange legs run under the DEFAULT sort impl (lax): compare against
# the lax headline, falling back to the best correct one
plain = next((v for i, v, ok, _ in ranking if ok and i == "lax"),
             next((v for i, v, ok, _ in ranking if ok), None))
ex = [r for r in lines(os.path.join(outdir, "config5.jsonl"))
      if isinstance(r.get("metric"), str) and "distributed" in r["metric"]]
if ex:
    print("\n2. EXCHANGE (config 5 legs; round-2 bar: >=50% of plain join):")
    for r in ex:
        frac = (f"  = {r['mrows_s'] / plain:.0%} of headline"
                if plain and r.get("mrows_s") else "")
        print(f"   {r['metric']:45s} {r.get('mrows_s')} Mrows/s "
              f"correct={r.get('correct')}{frac}")
else:
    print("\n2. EXCHANGE: no config5.jsonl captures yet")

# --- 3. everything else ------------------------------------------------------
print("\n3. other captures:")
for path in sorted(glob.glob(os.path.join(outdir, "*.jsonl"))):
    base = os.path.basename(path)
    if base.startswith("bench_") or base == "config5.jsonl":
        continue
    recs = lines(path)
    print(f"   {base}: {len(recs)} records")
    for r in recs[:6]:
        keep = {k: r[k] for k in
                ("config", "metric", "value", "mrows_s", "correct",
                 "overlap_fraction", "seconds") if k in r}
        print(f"     {json.dumps(keep)}")

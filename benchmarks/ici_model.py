"""Analytic ICI weak-scaling model for the distributed join.

The virtual-CPU-mesh curves (benchmarks/weak_scaling.py) validate shapes
and bit-exactness but carry NO performance signal (round-2 verdict). Real
ICI numbers need a pod slice this environment doesn't have, so this model
projects weak-scaling efficiency from

  * measured single-chip phase times (pass a CONFIGS/BENCH json or use the
    defaults recorded from round-2 finals on the real v5e chip), and
  * public TPU v5e interconnect parameters (jax-ml.github.io/scaling-book):
    per-link one-way ICI bandwidth ~4.5e10 B/s, 4 links/chip, 2D torus.

Model (per chip, weak scaling: n rows/side stays constant per chip):

  t(nd) = t_partition(n) + t_exchange(n, nd) + t_sort(n) + t_probe(n)

  exchange bytes/chip = 2 sides x 8 B/row x n x (nd-1)/nd   (all_to_all)
  t_exchange = bytes x hop_factor / (links x link_bw)
    hop_factor: all_to_all average hop distance — nd/4 on a 1D ring,
    ~sqrt(nd)/2 on a square 2D torus (both directions used).

  The SEGMENTED pipeline overlaps exchange with probe compute (measured
  overlap fraction ~1.0 on the streaming analog, overlap_bench), so the
  reported efficiency uses t_exchange_effective = max(0, t_exchange -
  t_probe) for the overlapped variant and the full sum for the serial one.

  eff(nd) = t(1) / t(nd)

Emits one JSON line per (nd, topology, overlap) point.
Usage: python benchmarks/ici_model.py [--n 134217728] [--json out.json]
"""

import argparse
import json
import math

# round-2 finals on the real chip (CONFIGS_r02/BENCH_r02): 2^27 rows/side
DEFAULT_PHASES_S = {
    # measured: partition+sort both sides ~2x393ms, probe ~93ms, at n=2^27
    "sort_per_side": 0.393,
    "probe": 0.093,
    "bucket_partition": 0.197,   # radix_group grouping pass (680 Mrows/s)
}

LINK_BW = 4.5e10       # B/s one-way per ICI link (v5e, scaling book)
LINKS = 4              # links/chip on the 2D torus


def exchange_seconds(n_rows, nd, topology):
    if nd == 1:
        return 0.0
    bytes_per_chip = 2 * 8.0 * n_rows * (nd - 1) / nd
    if topology == "ring":
        hop = nd / 4.0
    else:  # 2D torus, near-square
        side = math.sqrt(nd)
        hop = max(1.0, side / 2.0)
    return bytes_per_chip * hop / (LINKS * LINK_BW)


def model(n_rows, phases, nds=(1, 2, 4, 8, 16, 64, 256)):
    rows = []
    t_compute = (2 * phases["sort_per_side"] + phases["probe"]
                 + 2 * phases["bucket_partition"])
    for topology in ("torus2d", "ring"):
        for overlap in (True, False):
            t1 = t_compute
            for nd in nds:
                tx = exchange_seconds(n_rows, nd, topology)
                tx_eff = max(0.0, tx - phases["probe"]) if overlap else tx
                t = t_compute + tx_eff
                rows.append({
                    "model": "ici_weak_scaling",
                    "n_per_chip": n_rows,
                    "devices": nd,
                    "topology": topology,
                    "exchange_overlapped": overlap,
                    "t_exchange_s": round(tx, 4),
                    "t_total_s": round(t, 4),
                    "efficiency": round(t1 / t, 4),
                    "rows_s_per_chip": round(2 * n_rows / t / 1e6, 1),
                })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 27,
                    help="rows per side per chip (weak scaling)")
    ap.add_argument("--json", default=None, help="also write to this file")
    ap.add_argument("--sort-s", type=float,
                    default=DEFAULT_PHASES_S["sort_per_side"],
                    help="measured single-chip sort seconds per side")
    ap.add_argument("--probe-s", type=float,
                    default=DEFAULT_PHASES_S["probe"])
    ap.add_argument("--bucket-s", type=float,
                    default=DEFAULT_PHASES_S["bucket_partition"])
    args = ap.parse_args()
    phases = {"sort_per_side": args.sort_s, "probe": args.probe_s,
              "bucket_partition": args.bucket_s}
    rows = model(args.n, phases)
    for r in rows:
        print(json.dumps(r))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"phases_s": phases, "link_bw_Bps": LINK_BW,
                       "links": LINKS, "points": rows}, f, indent=1)


if __name__ == "__main__":
    main()

"""Benchmark driver: one JSON line with the headline metric.

Headline: join throughput (M rows/s) on the single-chip two-pass-radix
config (BASELINE.json config 2 scaled by BENCH_SCALE): uniform PK-FK join
with payload columns, generator_ETHZ-semantics datasets.

vs_baseline is the fraction of the per-chip speed-of-light for the
reference's algorithm on this chip's HBM: the radix-join pipeline moves
(2 partition passes x 16B + 8B probe) = 40 bytes per row; speed-of-light
time = 40B * (|R|+|S|) / HBM_BW, and vs_baseline = t_sol / t_measured
(1.0 == >=100% of roofline; BASELINE.json's target is >=0.9). The reference
repo publishes no absolute numbers (SURVEY.md §6), so the roofline is the
comparable baseline surface.

Env knobs: BENCH_SCALE (default 27 -> 2^27 = 134M rows/side), BENCH_SKEW
(zipf z, default 0 = uniform).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from icde2019_gpu_join_tpu.models import ClusteredJoin
    from icde2019_gpu_join_tpu.relation import Relation
    from icde2019_gpu_join_tpu.utils import datasets, oracle
    from icde2019_gpu_join_tpu.utils.timing import detect_hbm_gbps

    scale = int(os.environ.get("BENCH_SCALE", "27"))
    skew = float(os.environ.get("BENCH_SKEW", "0"))
    n_r = n_s = 1 << scale

    rk, sk = datasets.make_pk_fk(n_r, n_s, skew=skew, seed=12345)
    rp = np.ones(n_r, np.int32)
    sp = np.ones(n_s, np.int32)

    r = Relation(jnp.asarray(rk), jnp.asarray(rp))
    s = Relation(jnp.asarray(sk), jnp.asarray(sp))
    engine = ClusteredJoin()

    # Warm-up (compile), then measured run — the reference also runs each
    # phase twice (outOfGPU_Join1_payload, hash_join_clustered_probe.cu:802-994).
    res = engine.aggregate(r, s)
    t0 = time.perf_counter()
    res = engine.aggregate(r, s)
    t1 = time.perf_counter()

    # Correctness gate on a sample: oracle on the full data is feasible but
    # slow at 2^27; sample-verify with the sort-merge device oracle.
    from icde2019_gpu_join_tpu.ops.join_sorted import sort_merge_aggregate
    expect = int(sort_merge_aggregate(r.keys, r.payload, s.keys, s.payload))
    ok = res.aggregate == expect

    elapsed = t1 - t0
    mrows = (n_r + n_s) / elapsed / 1e6
    hbm = detect_hbm_gbps()
    t_sol = 40.0 * (n_r + n_s) / (hbm * 1e9)
    vs_baseline = t_sol / elapsed

    print(json.dumps({
        "metric": f"join_throughput_{n_r>>20}Mx{n_s>>20}M"
                  + (f"_zipf{skew}" if skew else ""),
        "value": round(mrows, 2),
        "unit": "Mrows/s",
        "vs_baseline": round(vs_baseline, 4),
        "correct": ok,
        "aggregate": res.aggregate,
        "elapsed_s": round(elapsed, 4),
        "phases": {p.name: round(p.seconds, 4) for p in res.timer.phases},
        "hbm_gbps": hbm,
        "device": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()

"""Device validation of the lane-transposed merge cascade (round-5 fix).

Usage: python benchmarks/merge_fix_validate.py [log2n]

Steps (each prints one JSON line):
  1. correctness: merge_sort_pairs at 2^log2n vs lax.sort on device —
     sorted keys bit-equal, per-key payload multiset equal.
  2. timing: best-of-5 scalar-pull-synced A/B vs the 2-op lax.sort at
     the same size (RTT-subtracted).

Compile cost scales with the HBM level count (one jit per run_len), so
start small (default 2^18 = 4 HBM levels) before paying for 2^24+.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icde2019_gpu_join_tpu.ops import merge_pallas as mp


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << lg
    rng = np.random.RandomState(7)
    # avoid sentinels so the cascade path (not the lax fallback) runs
    sv = rng.randint(-(2**31) + 1, 2**31 - 1, n).astype(np.int32)
    pv = rng.randint(-(2**31), 2**31, n).astype(np.int32)
    svd, pvd = jnp.asarray(sv), jnp.asarray(pv)

    t0 = time.perf_counter()
    gs, gp = mp.merge_sort_pairs(svd, pvd)
    gs.block_until_ready()
    t_first = time.perf_counter() - t0

    es, ep = jax.lax.sort((svd, pvd), num_keys=1, is_stable=False)
    gs_h, gp_h = np.asarray(gs), np.asarray(gp)
    es_h, ep_h = np.asarray(es), np.asarray(ep)
    keys_ok = bool(np.array_equal(gs_h, es_h))
    got2 = np.stack([gs_h, gp_h], 1)
    exp2 = np.stack([es_h, ep_h], 1)
    pairs_ok = bool(np.array_equal(
        got2[np.lexsort((got2[:, 1], got2[:, 0]))],
        exp2[np.lexsort((exp2[:, 1], exp2[:, 0]))]))
    print(json.dumps({"check": "merge_fix_correct", "n": n,
                      "keys_ok": keys_ok, "pairs_ok": pairs_ok,
                      "compile_plus_first_run_s": round(t_first, 1)}),
          flush=True)
    if not (keys_ok and pairs_ok):
        sys.exit(1)

    # RTT
    f = jax.jit(lambda a: a + 1)
    x = jnp.zeros((8, 128), jnp.int32)
    _sync(f(x))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(f(x))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    def best(fn, reps=5):
        _sync(fn())
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(fn())
            b = min(b, time.perf_counter() - t0)
        return max(b - rtt, 1e-9)

    t_merge = best(lambda: mp.merge_sort_pairs(svd, pvd))
    t_lax = best(lambda: jax.lax.sort((svd, pvd), num_keys=1,
                                      is_stable=False))
    print(json.dumps({
        "check": "merge_fix_speed", "n": n,
        "merge_ms": round(t_merge * 1e3, 2),
        "lax_ms": round(t_lax * 1e3, 2),
        "merge_Mrows_s": round(n / t_merge / 1e6, 1),
        "lax_Mrows_s": round(n / t_lax / 1e6, 1),
        "speedup_vs_lax": round(t_lax / t_merge, 3),
        "rtt_ms": round(rtt * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()

"""On-device smoke gate: run every Pallas path + all five BASELINE configs
at small scale ON THE REAL CHIP, with correctness asserts.

This exists because round 1 shipped a TPU-only TypeError through 65 green
CPU tests (tests/conftest.py forces JAX_PLATFORMS=cpu). Run this (`make
tpu-smoke`) before making any headline/PROGRESS claim.

Exit code 0 = all paths compiled, ran, and matched their oracles on device.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


RESULTS = []


def check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
    except Exception as e:  # one miscompiling kernel must not kill the gate
        print(f"  FAIL: {name}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        RESULTS.append({"check": name, "ok": False,
                        "error": f"{type(e).__name__}: {str(e)[:200]}"})
        return
    print(f"  ok: {name} ({time.perf_counter() - t0:.1f}s)", flush=True)
    RESULTS.append({"check": name, "ok": True,
                    "seconds": round(time.perf_counter() - t0, 1)})


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev} (platform {dev.platform})", flush=True)
    if dev.platform == "cpu":
        print("WARNING: no TPU visible — this run does NOT gate device paths",
              flush=True)
    rng = np.random.RandomState(7)

    # --- raw Pallas kernels ------------------------------------------------
    from icde2019_gpu_join_tpu.ops.band_compare_pallas import (
        banded_compare_first, banded_compare_per_s, banded_compare_sum)

    ch, wb = 8, 256
    sk = rng.randint(0, 60, (ch, 128)).astype(np.int32)
    sp = rng.randint(-9, 9, (ch, 128)).astype(np.int32)
    rk = rng.randint(0, 60, (ch, wb)).astype(np.int32)
    rp = rng.randint(-9, 9, (ch, wb)).astype(np.int32)
    eq = sk[:, :, None] == rk[:, None, :]

    def _sum():
        got = int(banded_compare_sum(jnp.asarray(sk), jnp.asarray(sp),
                                     jnp.asarray(rk), jnp.asarray(rp)))
        exp = np.sum(np.where(eq, rp[:, None, :].astype(np.int64), 0)
                     * sp[:, :, None].astype(np.int64))
        assert got == int(np.int32(np.uint32(exp & 0xFFFFFFFF))), (got, exp)

    def _per_s():
        h, t = banded_compare_per_s(jnp.asarray(sk), jnp.asarray(rk),
                                    jnp.asarray(rp))
        assert np.array_equal(np.asarray(h), eq.sum(axis=2))
        assert np.array_equal(np.asarray(t),
                              np.where(eq, rp[:, None, :], 0).sum(axis=2))

    def _first():
        gidx = rng.permutation(ch * wb).reshape(ch, wb).astype(np.int32)
        h, fm = banded_compare_first(jnp.asarray(sk), jnp.asarray(rk),
                                     jnp.asarray(gidx))
        assert np.array_equal(np.asarray(h), eq.sum(axis=2))
        assert np.array_equal(
            np.asarray(fm),
            np.where(eq, gidx[:, None, :], 0x7FFFFFFF).min(axis=2))

    check("banded_compare_sum", _sum)
    check("banded_compare_per_s", _per_s)
    check("banded_compare_first", _first)

    # --- merge cascade (the selectable hot-path sort) ----------------------
    # Interpret-green is not device-green (Mosaic lowerings differ); a
    # regression here must never silently eat the hot path when
    # TPUJOIN_SORT_IMPL=merge/packed is flipped on.
    from icde2019_gpu_join_tpu.ops.merge_pallas import (
        HBM_WINDOW, merge_level_hbm, merge_sort_pairs, packed_sort_pairs)

    def _sorted_pair_check(name, fn, n):
        # avoid INT_MIN/INT_MAX: those trip merge_sort_pairs' lax.sort
        # fallback and the cascade itself would never run
        sv = rng.randint(-(2**31) + 1, 2**31 - 1, n).astype(np.int32)
        pv = rng.randint(-(2**31), 2**31, n).astype(np.int32)
        gs, gp = fn(jnp.asarray(sv), jnp.asarray(pv))
        es, ep = jax.lax.sort((jnp.asarray(sv), jnp.asarray(pv)),
                              num_keys=1, is_stable=False)
        assert np.array_equal(np.asarray(gs), np.asarray(es)), name
        # payload multiset must agree per key (unstable sorts may permute
        # payloads within equal-key runs): compare (key, payload)-sorted
        got2 = np.stack([np.asarray(gs), np.asarray(gp)], 1)
        exp2 = np.stack([np.asarray(es), np.asarray(ep)], 1)
        assert np.array_equal(
            got2[np.lexsort((got2[:, 1], got2[:, 0]))],
            exp2[np.lexsort((exp2[:, 1], exp2[:, 0]))]), name

    check("merge_sort_pairs (full cascade)",
          lambda: _sorted_pair_check("merge", merge_sort_pairs, 1 << 18))
    check("packed_sort_pairs (uint64 pack)",
          lambda: _sorted_pair_check("packed", packed_sort_pairs, 1 << 18))

    def _hbm_level(db):
        n, run = 1 << 18, 1 << 17
        sv = rng.randint(-(2**31) + 1, 2**31 - 1, n).astype(np.int32)
        pv = rng.randint(-(2**31), 2**31, n).astype(np.int32)
        # cascade run encoding: odd run stored complemented (sorted asc by
        # the stored value == actual keys descending in position)
        inv = sv[run:] ^ -1
        o0 = np.argsort(sv[:run], kind="stable")
        o1 = np.argsort(inv, kind="stable")
        sv2 = np.concatenate([sv[:run][o0], inv[o1]])
        pv2 = np.concatenate([pv[:run][o0], pv[run:][o1]])
        gs, gp = merge_level_hbm(jnp.asarray(sv2), jnp.asarray(pv2), run,
                                 interpret=(dev.platform == "cpu"),
                                 double_buffer=db)
        assert np.array_equal(np.asarray(gs), np.sort(sv)), f"db={db}"
        got2 = np.stack([np.asarray(gs), np.asarray(gp)], 1)
        exp2 = np.stack([sv, pv], 1)
        assert np.array_equal(
            got2[np.lexsort((got2[:, 1], got2[:, 0]))],
            exp2[np.lexsort((exp2[:, 1], exp2[:, 0]))]), f"db={db}"

    check("merge_level_hbm", lambda: _hbm_level(False))
    check("merge_level_hbm (double_buffer)", lambda: _hbm_level(True))

    # --- probe_aggregate_ranges (scalar-prefetch DMA kernel) --------------
    def _probe_ranges():
        from icde2019_gpu_join_tpu.ops.probe_pallas import (
            pad_for_probe, plan_ranges, probe_aggregate_ranges)

        n_r, n_s, parts = 4096, 8192, 8
        rkn = np.sort(rng.randint(0, parts, n_r)).astype(np.int32)
        skn = np.sort(rng.randint(0, parts, n_s)).astype(np.int32)
        rpn = rng.randint(-5, 5, n_r).astype(np.int32)
        spn = rng.randint(-5, 5, n_s).astype(np.int32)
        off_r = np.searchsorted(rkn, np.arange(parts + 1)).astype(np.int32)
        off_s = np.searchsorted(skn, np.arange(parts + 1)).astype(np.int32)
        rkd, rpd = pad_for_probe(jnp.asarray(rkn), jnp.asarray(rpn), 1024)
        skd, spd = pad_for_probe(jnp.asarray(skn), jnp.asarray(spn), 2048)
        s_start, s_nch = plan_ranges(off_r, off_s, n_r, 1024, 2048)
        got = int(probe_aggregate_ranges(
            rkd, rpd, skd, spd, jnp.asarray(s_start), jnp.asarray(s_nch)))
        exp = 0
        for p in range(parts):
            exp += int(rpn[off_r[p]:off_r[p + 1]].astype(np.int64).sum()
                       * spn[off_s[p]:off_s[p + 1]].astype(np.int64).sum())
        assert got == int(np.int32(np.uint32(exp & 0xFFFFFFFF))), (got, exp)

    check("probe_aggregate_ranges", _probe_ranges)

    # --- banded engine end to end (per_s + descriptors + materialize) -----
    from icde2019_gpu_join_tpu.ops.band_join import (
        banded_join_aggregate, banded_join_late_aggregate,
        banded_materialize)
    from icde2019_gpu_join_tpu.utils import oracle

    n_r, n_s = 20_000, 30_000
    rkn = rng.randint(0, 5000, n_r).astype(np.int32)
    skn = rng.randint(0, 5000, n_s).astype(np.int32)
    rpn = rng.randint(-100, 100, n_r).astype(np.int32)
    spn = rng.randint(-100, 100, n_s).astype(np.int32)

    def _agg():
        got = int(banded_join_aggregate(
            jnp.asarray(rkn), jnp.asarray(rpn),
            jnp.asarray(skn), jnp.asarray(spn)))
        assert got == oracle.join_aggregate(rkn, rpn, skn, spn)

    def _late():
        got = int(banded_join_late_aggregate(
            jnp.asarray(rkn), jnp.asarray(rpn),
            jnp.asarray(skn), jnp.asarray(spn)))
        # oracle: SUM over matches of (Rcolsum + Scolsum), int32 wraparound
        order = np.argsort(rkn, kind="stable")
        rs = rkn[order]
        lo = np.searchsorted(rs, skn, side="left")
        hi = np.searchsorted(rs, skn, side="right")
        cnt = hi - lo
        rp_cum = np.concatenate([[0], np.cumsum(
            rpn[order].astype(np.int64))])
        exp = int(np.sum(rp_cum[hi] - rp_cum[lo])
                  + np.sum(spn.astype(np.int64) * cnt.astype(np.int64)))
        assert got == int(np.int32(np.uint32(exp & 0xFFFFFFFF))), got

    def _mat():
        expect = oracle.join_materialize(rkn[:2000], rpn[:2000],
                                         skn[:3000], spn[:3000])
        cap = expect.shape[0] + 64
        out_r, out_s, total = banded_materialize(
            jnp.asarray(rkn[:2000]), jnp.asarray(rpn[:2000]),
            jnp.asarray(skn[:3000]), jnp.asarray(spn[:3000]), capacity=cap)
        assert int(total) == expect.shape[0]
        pairs = np.stack([np.asarray(out_r), np.asarray(out_s)], axis=1)
        pairs = pairs[(pairs[:, 0] != 0) | (pairs[:, 1] != 0)]
        got = pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
        exp = expect[(expect[:, 0] != 0) | (expect[:, 1] != 0)]
        assert np.array_equal(got, exp)

    check("banded_join_aggregate", _agg)
    check("banded_join_late_aggregate", _late)
    check("banded_materialize (descriptor path)", _mat)

    # --- the five BASELINE configs at small scale -------------------------
    from icde2019_gpu_join_tpu.models import ClusteredJoin
    from icde2019_gpu_join_tpu.models.pipelines import filter_probe_groupby
    from icde2019_gpu_join_tpu.relation import Relation
    from icde2019_gpu_join_tpu.utils import datasets

    def _config(n_r, n_s, skew, name):
        rk_, sk_ = datasets.make_pk_fk(n_r, n_s, skew=skew, seed=99)
        r = Relation(jnp.asarray(rk_), jnp.ones(n_r, jnp.int32))
        s = Relation(jnp.asarray(sk_), jnp.ones(n_s, jnp.int32))
        res = ClusteredJoin().aggregate(r, s)
        assert res.aggregate == oracle.join_count(rk_, sk_), name

    check("config1 small (uniform PK-FK)",
          lambda: _config(1 << 14, 1 << 16, 0.0, "c1"))
    check("config2 small (payload join)",
          lambda: _config(1 << 16, 1 << 16, 0.0, "c2"))

    def _config3():
        n_r2, n_s2, groups = 1 << 14, 1 << 16, 64
        g = np.random.default_rng(42)
        rk2 = g.permutation(n_r2).astype(np.int32)
        rp2 = g.integers(1, 100, n_r2).astype(np.int32)
        sk2 = rk2[g.integers(0, n_r2, n_s2)].astype(np.int32)
        s_f = g.integers(0, 1000, n_s2).astype(np.int32)
        s_g = g.integers(0, groups, n_s2).astype(np.int32)
        cnt, sums = filter_probe_groupby(
            jnp.asarray(rk2), jnp.asarray(rp2), jnp.asarray(sk2),
            jnp.asarray(s_f), jnp.asarray(s_g),
            jnp.int32(100), jnp.int32(600), num_groups=groups)
        ec, es = oracle.filter_probe_groupby(rk2, rp2, sk2, s_f, s_g,
                                             100, 600, groups)
        assert np.array_equal(np.asarray(cnt), ec)
        assert np.array_equal(np.asarray(sums), es)

    check("config3 small (filter->probe->groupby)", _config3)
    check("config4 small (Zipf z=1.05)",
          lambda: _config(1 << 16, 1 << 16, 1.05, "c4"))

    def _config5():
        from icde2019_gpu_join_tpu.config import EngineConfig
        from icde2019_gpu_join_tpu.models.streaming import (
            streaming_join_aggregate)
        rk_, sk_ = datasets.make_pk_fk(1 << 14, 1 << 17, skew=0.0, seed=5)
        res = streaming_join_aggregate(
            Relation(np.asarray(rk_), np.ones(1 << 14, np.int32)),
            Relation(np.asarray(sk_), np.ones(1 << 17, np.int32)),
            EngineConfig(segment_rows=1 << 15))
        assert int(res.aggregate) == oracle.join_count(rk_, sk_)

    check("config5 small (streaming segments)", _config5)

    def _global_ht():
        from icde2019_gpu_join_tpu.ops.perfect_hash import (
            global_ht_join_aggregate)
        g = np.random.default_rng(11)
        rk_ = g.permutation(1 << 14).astype(np.int32)
        sk_ = rk_[g.integers(0, 1 << 14, 1 << 16)].astype(np.int32)
        rp_ = g.integers(-50, 50, rk_.size).astype(np.int32)
        sp_ = g.integers(-50, 50, sk_.size).astype(np.int32)
        got = int(global_ht_join_aggregate(
            jnp.asarray(rk_), jnp.asarray(rp_), jnp.asarray(sk_),
            jnp.asarray(sp_)))
        assert got == oracle.join_aggregate(rk_, rp_, sk_, sp_)

    check("global chained-HT baseline (gather probe)", _global_ht)

    import json
    n_fail = sum(1 for r in RESULTS if not r["ok"])
    print(json.dumps({"smoke": "green" if n_fail == 0 else "red",
                      "checks": len(RESULTS), "failed": n_fail,
                      "results": RESULTS}), flush=True)
    if n_fail == 0:
        print("TPU SMOKE: ALL GREEN", flush=True)
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()

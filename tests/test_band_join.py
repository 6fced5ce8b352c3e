"""Banded sort-merge probe (ops/band_join.py) vs the numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from icde2019_gpu_join_tpu.ops.band_join import (
    banded_join_aggregate,
    banded_join_count,
    block_windows,
    sort_by_key,
)
from icde2019_gpu_join_tpu.utils import oracle
from tests.conftest import make_tables


def _agg(rk, rp, sk, sp, w=4):
    return int(banded_join_aggregate(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        window_blocks=w,
    ))


@pytest.mark.parametrize("w", [1, 2, 4])
def test_banded_aggregate_pkfk(rng, w):
    rk, rp, sk, sp = make_tables(rng)
    assert _agg(rk, rp, sk, sp, w) == oracle.join_aggregate(rk, rp, sk, sp)


def test_banded_aggregate_duplicates(rng):
    rk = rng.randint(0, 500, 4000).astype(np.int32)
    sk = rng.randint(0, 500, 6000).astype(np.int32)
    rp = rng.randint(-100, 100, rk.size).astype(np.int32)
    sp = rng.randint(-100, 100, sk.size).astype(np.int32)
    assert _agg(rk, rp, sk, sp) == oracle.join_aggregate(rk, rp, sk, sp)


def test_banded_aggregate_heavy_skew(rng):
    # one key holds ~half of S: windows widen -> multi-round path
    rk = rng.permutation(2000).astype(np.int32)
    sk = np.concatenate([
        np.full(5000, 7, np.int32),
        rng.randint(0, 2000, 5000).astype(np.int32),
    ])
    rng.shuffle(sk)
    rp = rng.randint(-10, 10, rk.size).astype(np.int32)
    sp = rng.randint(-10, 10, sk.size).astype(np.int32)
    assert _agg(rk, rp, sk, sp, w=2) == oracle.join_aggregate(rk, rp, sk, sp)


def test_banded_aggregate_no_matches(rng):
    rk = np.arange(1000, dtype=np.int32)
    sk = np.arange(5000, 9000, dtype=np.int32)
    rp = np.ones_like(rk)
    sp = np.ones_like(sk)
    assert _agg(rk, rp, sk, sp) == 0


def test_banded_aggregate_wraparound(rng):
    rk = np.zeros(100, np.int32)
    sk = np.zeros(100, np.int32)
    rp = np.full(100, 2**20, np.int32)
    sp = np.full(100, 2**20, np.int32)
    # 10^4 matches of 2^40 each: wraps int32
    assert _agg(rk, rp, sk, sp) == oracle.join_aggregate(rk, rp, sk, sp)


def test_banded_count(rng):
    rk, _, sk, _ = make_tables(rng, dup_build=True)
    got = int(banded_join_count(jnp.asarray(rk), jnp.asarray(sk)))
    assert got == oracle.join_count(rk, sk)


def test_block_windows_cover_all_matches(rng):
    rk = rng.randint(0, 300, 2000).astype(np.int32)
    sk = rng.randint(0, 300, 3000).astype(np.int32)
    r_sv, _ = sort_by_key(jnp.asarray(rk), jnp.zeros_like(jnp.asarray(rk)))
    s_sv, _ = sort_by_key(jnp.asarray(sk), jnp.zeros_like(jnp.asarray(sk)))
    lo, hi = block_windows(r_sv, s_sv)
    lo, hi = np.asarray(lo), np.asarray(hi)
    rs, ss = np.asarray(r_sv), np.asarray(s_sv)
    nrb = rs.size // 128
    for b in range(ss.size // 128):
        blk = ss[b * 128:(b + 1) * 128]
        for j in range(nrb):
            rblk = rs[j * 128:(j + 1) * 128]
            if np.intersect1d(blk, rblk).size:
                assert lo[b] <= j < hi[b], (b, j, lo[b], hi[b])


def test_pallas_compare_matches_xla(rng):
    """The Pallas banded-compare kernel (interpret mode on CPU) agrees with
    the XLA formulation."""
    from icde2019_gpu_join_tpu.ops.band_compare_pallas import banded_compare_sum

    ch, wb = 16, 256
    sk = rng.randint(0, 50, (ch, 128)).astype(np.int32)
    sp = rng.randint(-5, 5, (ch, 128)).astype(np.int32)
    rk = rng.randint(0, 50, (ch, wb)).astype(np.int32)
    rp = rng.randint(-5, 5, (ch, wb)).astype(np.int32)
    got = int(banded_compare_sum(jnp.asarray(sk), jnp.asarray(sp),
                                 jnp.asarray(rk), jnp.asarray(rp),
                                 interpret=True))
    eq = sk[:, :, None] == rk[:, None, :]
    expect = np.sum(np.where(eq, rp[:, None, :].astype(np.uint32), 0)
                    * sp[:, :, None].astype(np.uint32), dtype=np.uint64)
    assert got == int(np.uint32(expect))


def test_banded_materialize(rng):
    from icde2019_gpu_join_tpu.ops.band_join import banded_materialize

    rk = rng.randint(0, 400, 2000).astype(np.int32)
    sk = rng.randint(0, 400, 3000).astype(np.int32)
    rp = rng.randint(1, 1000, rk.size).astype(np.int32)
    sp = rng.randint(1, 1000, sk.size).astype(np.int32)
    expect = oracle.join_materialize(rk, rp, sk, sp)
    cap = expect.shape[0] + 64
    out_r, out_s, total = banded_materialize(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        capacity=cap)
    assert int(total) == expect.shape[0]
    pairs = np.stack([np.asarray(out_r), np.asarray(out_s)], axis=1)
    pairs = pairs[(pairs[:, 0] != 0) | (pairs[:, 1] != 0)]
    got = pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
    assert np.array_equal(got, expect)


def test_banded_materialize_sparse_wide_fm_guard(rng):
    """Regression (round-2 advisor, high): the fast-path R-span check used
    blockmax_fmh[s_nxt_blk] alone — vacuously 0 when the clipped anchor
    block holds no matched rows — while a wide-fm match inside the anchor
    block itself escaped the span check and was silently dropped by
    _extract_blocked's static R window. Scenario: unique-key R, a selective
    S whose last matched row has fm far beyond the window, plus trailing
    unmatched rows so s_nxt_blk clips to an all-unmatched block."""
    from icde2019_gpu_join_tpu.ops.band_join import banded_materialize

    rk = np.arange(20000, dtype=np.int32)
    rp = (rk + 1).astype(np.int32)
    # two matches: fm=0 and fm=19999; then ~300 trailing non-matching keys
    # that sort after all R keys
    sk = np.concatenate([np.asarray([0, 19999], np.int32),
                         np.arange(30000, 30300, dtype=np.int32)])
    sp = np.full(sk.size, 7, np.int32)
    expect = oracle.join_materialize(rk, rp, sk, sp)
    assert expect.shape[0] == 2
    out_r, out_s, total = banded_materialize(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        capacity=128)
    assert int(total) == 2
    pairs = np.stack([np.asarray(out_r), np.asarray(out_s)], axis=1)
    pairs = pairs[(pairs[:, 0] != 0) | (pairs[:, 1] != 0)]
    got = pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
    assert np.array_equal(got, expect), (
        "wide-fm matched row dropped by materialize fast path")


def test_banded_match_descriptors(rng):
    from icde2019_gpu_join_tpu.ops.band_join import (
        banded_match_descriptors, sort_by_key)

    rk = rng.randint(0, 100, 600).astype(np.int32)
    sk = rng.randint(0, 100, 900).astype(np.int32)
    r_sv, _ = sort_by_key(jnp.asarray(rk), jnp.zeros(600, jnp.int32))
    s_sv, _ = sort_by_key(jnp.asarray(sk), jnp.zeros(900, jnp.int32))
    h, fm = banded_match_descriptors(r_sv, s_sv)
    h, fm = np.asarray(h)[:900], np.asarray(fm)[:900]
    rs = np.asarray(r_sv).astype(np.int64)
    ss = np.asarray(s_sv).astype(np.int64)
    for i in range(900):
        hits = np.nonzero(rs == ss[i])[0]
        assert h[i] == hits.size
        if hits.size:
            assert fm[i] == hits[0]


@pytest.mark.parametrize("n_r,n_s", [(0, 5), (5, 0), (0, 0), (1, 1), (127, 129)])
def test_banded_edge_shapes(n_r, n_s):
    rk = jnp.asarray(np.arange(n_r, dtype=np.int32))
    sk = jnp.asarray(np.zeros(n_s, dtype=np.int32))
    v = int(banded_join_aggregate(rk, jnp.ones(n_r, jnp.int32),
                                  sk, jnp.ones(n_s, jnp.int32)))
    assert v == (n_s if n_r > 0 and n_s > 0 else 0)


def test_banded_fuzz_vs_oracle(rng):
    """Randomized shapes/distributions vs the oracle (CPU)."""
    for _ in range(12):
        n_r = int(rng.randint(1, 3000))
        n_s = int(rng.randint(1, 5000))
        kmax = int(rng.choice([10, 300, 1 << 16, 1 << 30]))
        rk = rng.randint(0, kmax, n_r).astype(np.int32)
        sk = rng.randint(0, kmax, n_s).astype(np.int32)
        rp = rng.randint(-1000, 1000, n_r).astype(np.int32)
        sp = rng.randint(-1000, 1000, n_s).astype(np.int32)
        w = int(rng.choice([1, 2, 4]))
        got = _agg(rk, rp, sk, sp, w)
        assert got == oracle.join_aggregate(rk, rp, sk, sp), (n_r, n_s, kmax, w)


def test_pallas_compare_per_s_matches_numpy(rng):
    """Interpret-mode check for banded_compare_per_s (the kernel that broke
    in round 1 because only banded_compare_sum was tested)."""
    from icde2019_gpu_join_tpu.ops.band_compare_pallas import (
        banded_compare_per_s)

    ch, wb = 8, 256
    sk = rng.randint(0, 60, (ch, 128)).astype(np.int32)
    rk = rng.randint(0, 60, (ch, wb)).astype(np.int32)
    rp = rng.randint(-9, 9, (ch, wb)).astype(np.int32)
    h, t = banded_compare_per_s(jnp.asarray(sk), jnp.asarray(rk),
                                jnp.asarray(rp), interpret=True)
    eq = sk[:, :, None] == rk[:, None, :]
    np.testing.assert_array_equal(np.asarray(h), eq.sum(axis=2))
    np.testing.assert_array_equal(
        np.asarray(t), np.where(eq, rp[:, None, :], 0).sum(axis=2))


def test_pallas_compare_first_matches_numpy(rng):
    """Interpret-mode check for banded_compare_first."""
    from icde2019_gpu_join_tpu.ops.band_compare_pallas import (
        banded_compare_first)

    ch, wb = 8, 256
    sk = rng.randint(0, 60, (ch, 128)).astype(np.int32)
    rk = rng.randint(0, 60, (ch, wb)).astype(np.int32)
    gidx = rng.permutation(ch * wb).reshape(ch, wb).astype(np.int32)
    h, fm = banded_compare_first(jnp.asarray(sk), jnp.asarray(rk),
                                 jnp.asarray(gidx), interpret=True)
    eq = sk[:, :, None] == rk[:, None, :]
    np.testing.assert_array_equal(np.asarray(h), eq.sum(axis=2))
    expect_fm = np.where(eq, gidx[:, None, :], 0x7FFFFFFF).min(axis=2)
    np.testing.assert_array_equal(np.asarray(fm), expect_fm)


def test_banded_materialize_wrap_ring(rng):
    """FOLD-ring semantics: capacity < total matches, match m lands in slot
    m mod capacity with later matches overwriting earlier (the engine's
    match order is S-sorted; the reference ring is
    src/join-primitives.cu:1371-1373)."""
    from icde2019_gpu_join_tpu.ops.band_join import (
        banded_match_descriptors, banded_materialize, sort_by_key)

    rk = rng.randint(0, 50, 700).astype(np.int32)
    sk = rng.randint(0, 50, 1100).astype(np.int32)
    rp = rng.randint(1, 1000, rk.size).astype(np.int32)
    sp = rng.randint(1, 1000, sk.size).astype(np.int32)

    # oracle expansion in the engine's S-sorted match order
    r_sv, r_p = sort_by_key(jnp.asarray(rk), jnp.asarray(rp))
    s_sv, s_p = sort_by_key(jnp.asarray(sk), jnp.asarray(sp))
    h, fm = banded_match_descriptors(r_sv, s_sv)
    h = np.asarray(h)[:sk.size]
    fm = np.asarray(fm)[:sk.size]
    rpn, spn = np.asarray(r_p), np.asarray(s_p)[:sk.size]
    stream_r, stream_s = [], []
    for i in range(sk.size):
        for k in range(h[i]):
            stream_r.append(rpn[fm[i] + k])
            stream_s.append(spn[i])
    total = len(stream_r)
    cap = total // 3 + 1   # forces >2 laps around the ring
    assert cap < total
    exp_r, exp_s = np.zeros(cap, np.int32), np.zeros(cap, np.int32)
    for m in range(total):
        exp_r[m % cap] = stream_r[m]
        exp_s[m % cap] = stream_s[m]

    out_r, out_s, tot = banded_materialize(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        capacity=cap, wrap=True)
    assert int(tot) == total
    np.testing.assert_array_equal(np.asarray(out_r), exp_r)
    np.testing.assert_array_equal(np.asarray(out_s), exp_s)


def test_interval_select_interpret(rng):
    from icde2019_gpu_join_tpu.ops.band_compare_pallas import (
        banded_interval_select)

    ch, wb = 4, 256
    # disjoint intervals per row
    widths = rng.randint(0, 5, (ch, wb)).astype(np.int32)
    lo = np.cumsum(widths, axis=1) - widths
    hi = lo + widths
    p1 = rng.randint(1, 100, (ch, wb)).astype(np.int32)
    p2 = rng.randint(1, 100, (ch, wb)).astype(np.int32)
    p3 = np.ones((ch, wb), np.int32)
    pos = rng.randint(0, int(hi.max()) + 3, (ch, 128)).astype(np.int32)
    o1, o2, o3 = banded_interval_select(
        jnp.asarray(pos), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(p3), interpret=True)
    inb = (lo[:, None, :] <= pos[:, :, None]) & (pos[:, :, None] < hi[:, None, :])
    np.testing.assert_array_equal(np.asarray(o1),
                                  np.where(inb, p1[:, None, :], 0).sum(2))
    np.testing.assert_array_equal(np.asarray(o2),
                                  np.where(inb, p2[:, None, :], 0).sum(2))
    np.testing.assert_array_equal(np.asarray(o3),
                                  np.where(inb, p3[:, None, :], 0).sum(2))


def test_materialize_fast_path_engaged_and_exact(rng):
    """The block-windowed fast path must engage on matched-dense inputs and
    agree with the oracle; sparse/filtered inputs fall back, also exact."""
    from icde2019_gpu_join_tpu.ops.band_join import banded_materialize

    cases = [
        # dense PK-FK-ish: fast path territory
        (rng.permutation(4000).astype(np.int32),
         rng.randint(0, 4000, 6000).astype(np.int32)),
        # only ~1/50 of S matches: owner spans blow up -> fallback
        (rng.permutation(100).astype(np.int32),
         rng.randint(0, 5000, 6000).astype(np.int32)),
        # heavy duplicates both sides
        (rng.randint(0, 30, 2000).astype(np.int32),
         rng.randint(0, 30, 1000).astype(np.int32)),
    ]
    for rk, sk in cases:
        rp = rng.randint(1, 1000, rk.size).astype(np.int32)
        sp = rng.randint(1, 1000, sk.size).astype(np.int32)
        expect = oracle.join_materialize(rk, rp, sk, sp)
        cap = expect.shape[0] + 200
        out_r, out_s, total = banded_materialize(
            jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk),
            jnp.asarray(sp), capacity=cap)
        assert int(total) == expect.shape[0]
        pairs = np.stack([np.asarray(out_r), np.asarray(out_s)], axis=1)
        pairs = pairs[(pairs[:, 0] != 0) | (pairs[:, 1] != 0)]
        got = pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
        exp = expect[(expect[:, 0] != 0) | (expect[:, 1] != 0)]
        np.testing.assert_array_equal(got, exp)


def test_materialize_fast_path_forced(rng):
    """Force the block-windowed path alone on a dense case: exactness here
    (not just via the cond) proves the fast branch itself."""
    from icde2019_gpu_join_tpu.ops.band_join import banded_materialize

    rk = rng.permutation(4000).astype(np.int32)
    sk = rng.randint(0, 4000, 6000).astype(np.int32)
    rp = rng.randint(1, 1000, rk.size).astype(np.int32)
    sp = rng.randint(1, 1000, sk.size).astype(np.int32)
    expect = oracle.join_materialize(rk, rp, sk, sp)
    cap = expect.shape[0] + 200
    out_r, out_s, total = banded_materialize(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        capacity=cap, debug_force="fast")
    assert int(total) == expect.shape[0]
    pairs = np.stack([np.asarray(out_r), np.asarray(out_s)], axis=1)
    pairs = pairs[(pairs[:, 0] != 0) | (pairs[:, 1] != 0)]
    got = pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
    exp = expect[(expect[:, 0] != 0) | (expect[:, 1] != 0)]
    np.testing.assert_array_equal(got, exp)

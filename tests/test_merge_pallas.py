"""Interpret-mode correctness of the Pallas merge-tree sort
(ops/merge_pallas.py) against lax.sort / numpy on CPU.

Run encoding (module invariant, round-5 `rev`-free design): run r of the
cascade is stored sorted ASCENDING by `stored = actual ^ -(r & 1)` — odd
runs hold complemented keys, which makes their actual keys descending in
position without any data reversal. The helpers below build/decode that
layout in numpy for the level-granular tests; the public entry
`merge_sort_pairs` is encoding-free (unsorted in, ascending out)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icde2019_gpu_join_tpu.ops import merge_pallas as mp


def ref_sort(sv, pv):
    o = np.argsort(sv, kind="stable")
    return sv[o], pv[o]


def check_pairs(sv_out, pv_out, sv_in, pv_in):
    """Keys exactly sorted; (key, payload) multiset preserved (the engine's
    contract: unstable sort, per-key payload multiset kept)."""
    ks, _ = ref_sort(sv_in, pv_in)
    np.testing.assert_array_equal(np.asarray(sv_out), ks)
    got = np.stack([np.asarray(sv_out), np.asarray(pv_out)], 1)
    want = np.stack([sv_in, pv_in], 1)
    got = got[np.lexsort((got[:, 1], got[:, 0]))]
    want = want[np.lexsort((want[:, 1], want[:, 0]))]
    np.testing.assert_array_equal(got, want)


def make(n, rng, lo=-(2**31), hi=2**31):
    sv = rng.randint(lo, hi, size=n).astype(np.int64).astype(np.int32)
    pv = rng.randint(-(2**31), 2**31, size=n).astype(np.int64).astype(np.int32)
    return sv, pv


def encode_runs(sv, pv, run):
    """Build the cascade's stored-domain layout: run r sorted ascending by
    stored = actual ^ -(r & 1)."""
    s2 = sv.reshape(-1, run).copy()
    s2[1::2] ^= -1
    o = np.argsort(s2, axis=1, kind="stable")
    return (np.take_along_axis(s2, o, 1).reshape(-1),
            np.take_along_axis(pv.reshape(-1, run), o, 1).reshape(-1))


def decode_runs(sv, pv, run):
    """Invert the encoding: per run, actual keys ascending + payloads."""
    s2 = np.asarray(sv).reshape(-1, run).copy()
    p2 = np.asarray(pv).reshape(-1, run).copy()
    s2[1::2] ^= -1
    s2[1::2] = s2[1::2][:, ::-1]
    p2[1::2] = p2[1::2][:, ::-1]
    return s2.reshape(-1), p2.reshape(-1)


def test_encode_decode_roundtrip(rng):
    sv, pv = make(2048, rng, lo=0, hi=100)
    es, ep = encode_runs(sv, pv, 256)
    ds, dp = decode_runs(es, ep, 256)
    for i in range(8):
        check_pairs(ds[i*256:(i+1)*256], dp[i*256:(i+1)*256],
                    sv[i*256:(i+1)*256], pv[i*256:(i+1)*256])


@pytest.mark.parametrize("lane_transpose", [False, True])
def test_vmem_levels(rng, lane_transpose):
    n, run, levels = 4096, 256, 3
    sv, pv = make(n, rng, lo=0, hi=500)  # duplicates likely
    es, ep = encode_runs(sv, pv, run)
    so, po = mp.merge_levels_vmem(
        jnp.asarray(es), jnp.asarray(ep), run, levels,
        tile_elems=2048, interpret=True, lane_transpose=lane_transpose)
    # output runs of run<<levels carry the same encoding
    m = run << levels
    so, po = decode_runs(so, po, m)
    for i in range(n // m):
        check_pairs(so[i*m:(i+1)*m], po[i*m:(i+1)*m],
                    sv[i*m:(i+1)*m], pv[i*m:(i+1)*m])


def test_vmem_levels_multi_tile_parity(rng):
    """Tiles after the first start at odd global run indices — the kernel's
    program_id-based parity must decode/encode them correctly."""
    n, run, levels = 8192, 256, 2
    sv, pv = make(n, rng, lo=-50, hi=50)
    es, ep = encode_runs(sv, pv, run)
    so, po = mp.merge_levels_vmem(
        jnp.asarray(es), jnp.asarray(ep), run, levels,
        tile_elems=1024, interpret=True)
    m = run << levels
    so, po = decode_runs(so, po, m)
    for i in range(n // m):
        check_pairs(so[i*m:(i+1)*m], po[i*m:(i+1)*m],
                    sv[i*m:(i+1)*m], pv[i*m:(i+1)*m])


@pytest.mark.parametrize("seed,lo,hi,window,db,lt", [
    (0, -(2**31), 2**31, mp.HBM_WINDOW, False, False),
    (1, 0, 64, mp.HBM_WINDOW, False, False),
    (2, -(2**31), 2**31, 2 * mp.HBM_WINDOW, False, False),
    (3, -(2**31), 2**31, mp.HBM_WINDOW, True, False),
    (4, 0, 64, mp.HBM_WINDOW, True, False),
    # lane_transpose: the ONLY formulation that compiles on device (the
    # d<128 reshape kills Mosaic — benchmarks/mosaic_bisect.py, round 5)
    (5, -(2**31), 2**31, mp.HBM_WINDOW, False, True),
    (6, -(2**31), 2**31, mp.HBM_WINDOW, True, True),
])
def test_hbm_level(seed, lo, hi, window, db, lt):
    rng = np.random.RandomState(seed)
    run = 2 * mp.HBM_WINDOW  # legal for both window sizes
    n = 4 * run              # two pairs: even (asc out) AND odd (encoded out)
    sv, pv = make(n, rng, lo=lo, hi=hi)
    es, ep = encode_runs(sv, pv, run)
    so, po = mp.merge_level_hbm(
        jnp.asarray(es), jnp.asarray(ep), run, interpret=True,
        window=window, double_buffer=db, lane_transpose=lt)
    m = 2 * run
    so, po = decode_runs(so, po, m)
    for i in range(n // m):
        check_pairs(so[i*m:(i+1)*m], po[i*m:(i+1)*m],
                    sv[i*m:(i+1)*m], pv[i*m:(i+1)*m])


def test_full_cascade_small(rng):
    # exercises segsort base + vmem cascade (n <= VMEM tile)
    n = 4 * mp.BASE_RUN
    sv, pv = make(n, rng)
    so, po = mp.merge_sort_pairs(jnp.asarray(sv), jnp.asarray(pv),
                                 interpret=True)
    check_pairs(np.asarray(so), np.asarray(po), sv, pv)


def test_full_cascade_hbm_level(rng):
    # n big enough to force HBM merge-path levels with a small vmem tile
    n = 8 * mp.HBM_WINDOW
    sv, pv = make(n, rng, lo=0, hi=1000)  # heavy duplicates
    so, po = mp._merge_sort_cascade(
        jnp.asarray(sv), jnp.asarray(pv), interpret=True,
        vmem_tile=2 * mp.HBM_WINDOW)
    check_pairs(np.asarray(so), np.asarray(po), sv, pv)


def test_sentinel_fallback(rng):
    n = 4 * mp.BASE_RUN
    sv, pv = make(n, rng)
    sv[123] = mp.INT_MIN
    sv[456] = mp.INT_MAX
    so, po = mp.merge_sort_pairs(jnp.asarray(sv), jnp.asarray(pv),
                                 interpret=True)
    check_pairs(np.asarray(so), np.asarray(po), sv, pv)


def test_join_with_merge_sort_impl(rng):
    """End-to-end: the banded join under sort_impl='merge' (pow2 sizes so
    the cascade actually runs) matches the oracle and the lax impl."""
    from icde2019_gpu_join_tpu.ops import band_join as bj
    from icde2019_gpu_join_tpu.utils import oracle

    n_r, n_s = 8192, 16384
    rk = rng.permutation(4 * n_r)[:n_r].astype(np.int32)
    sk = rk[rng.randint(0, n_r, n_s)].astype(np.int32)
    rp = rng.randint(-100, 100, n_r).astype(np.int32)
    sp = rng.randint(-100, 100, n_s).astype(np.int32)
    want = oracle.join_aggregate(rk, rp, sk, sp)
    bj.set_sort_impl("merge")
    try:
        jax.clear_caches()  # callers' traces captured the lax impl
        got = bj.banded_join_aggregate(
            jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk),
            jnp.asarray(sp))
    finally:
        bj.set_sort_impl("lax")
        jax.clear_caches()
    assert int(np.int32(np.asarray(got))) == want


def test_non_pow2_fallback(rng):
    n = 3 * mp.BASE_RUN
    sv, pv = make(n, rng)
    so, po = mp.merge_sort_pairs(jnp.asarray(sv), jnp.asarray(pv),
                                 interpret=True)
    check_pairs(np.asarray(so), np.asarray(po), sv, pv)

"""Pallas clustered-probe kernel logic, via interpreter mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from icde2019_gpu_join_tpu.ops import probe_pallas as pp
from icde2019_gpu_join_tpu.ops.partition import radix_partition
from icde2019_gpu_join_tpu.utils import oracle
from tests.conftest import make_tables


def run_pallas(rk, rp, sk, sp, bits, TR=1024, TS=1024):
    pr = radix_partition(jnp.asarray(rk), jnp.asarray(rp), bits, 0)
    ps = radix_partition(jnp.asarray(sk), jnp.asarray(sp), bits, 0)
    rk_p, rp_p = pp.pad_for_probe(pr.keys, pr.payload, TR)
    sk_p, sp_p = pp.pad_for_probe(ps.keys, ps.payload, TS)
    s_start, s_nch = pp.plan_ranges(
        np.asarray(pr.offsets), np.asarray(ps.offsets), rk.shape[0], TR, TS)
    return int(pp.probe_aggregate_ranges(
        rk_p, rp_p, sk_p, sp_p, jnp.asarray(s_start), jnp.asarray(s_nch),
        tile_r=TR, tile_s=TS, interpret=True))


def test_pallas_probe_aggregate(rng):
    rk, rp, sk, sp = make_tables(rng, n_r=3000, n_s=9000, dup_build=True)
    assert run_pallas(rk, rp, sk, sp, 6) == oracle.join_aggregate(rk, rp, sk, sp)


def test_pallas_probe_count_semantics(rng):
    # count == aggregate with payloads forced to 1 (padding stays 0)
    n_r, n_s = 2000, 8000
    rk = rng.permutation(4000)[:n_r].astype(np.int32)
    sk = rk[rng.randint(0, n_r, n_s)].astype(np.int32)
    ones_r = np.ones(n_r, np.int32)
    ones_s = np.ones(n_s, np.int32)
    assert run_pallas(rk, ones_r, sk, ones_s, 5) == n_s


def test_pallas_probe_skew(rng):
    rk = rng.permutation(3000)[:1000].astype(np.int32)
    sk = rk[np.minimum(rng.zipf(1.3, 6000) - 1, 999)].astype(np.int32)
    rp = rng.randint(-100, 100, 1000).astype(np.int32)
    sp = rng.randint(-100, 100, 6000).astype(np.int32)
    assert run_pallas(rk, rp, sk, sp, 4) == oracle.join_aggregate(rk, rp, sk, sp)


def test_plan_ranges_cover_and_align(rng):
    rk, rp, sk, sp = make_tables(rng, n_r=5000, n_s=20000, dup_build=True)
    pr = radix_partition(jnp.asarray(rk), jnp.asarray(rp), 7, 0)
    ps = radix_partition(jnp.asarray(sk), jnp.asarray(sp), 7, 0)
    TR, TS = 1024, 1024
    s_start, s_nch = pp.plan_ranges(
        np.asarray(pr.offsets), np.asarray(ps.offsets), 5000, TR, TS)
    assert s_start.shape[0] == -(-5000 // TR)
    assert np.all(s_start % TS == 0)
    # every R tile's partitions' S rows inside its range
    offs_r = np.asarray(pr.offsets)
    offs_s = np.asarray(ps.offsets)
    for t in range(s_start.shape[0]):
        lo_row, hi_row = t * TR, min((t + 1) * TR, 5000) - 1
        p_lo = np.searchsorted(offs_r, lo_row, side="right") - 1
        p_hi = np.searchsorted(offs_r, hi_row, side="right") - 1
        assert s_start[t] <= offs_s[p_lo]
        assert s_start[t] + s_nch[t] * TS >= offs_s[p_hi + 1]

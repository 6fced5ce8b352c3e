"""sort_impl threading: per-engine static argument, not a process global.

Round-4 verdict item 7: `set_sort_impl` used to flip a module global and
`jax.clear_caches()`; two engines with different `EngineConfig.sort_impl`
in one process silently fought (the last-constructed engine's impl won for
BOTH). Now the impl is resolved per call and threaded as a jit static
argument, so each impl owns its own compile-cache entries.
"""

import numpy as np
import pytest

from icde2019_gpu_join_tpu.config import EngineConfig
from icde2019_gpu_join_tpu.models import ClusteredJoin
from icde2019_gpu_join_tpu.relation import Relation

import icde2019_gpu_join_tpu.ops.band_join as bj
import icde2019_gpu_join_tpu.ops.merge_pallas as mp


def _data(rng, n_r=1664, n_s=3328):
    """Unique-ish shapes so each impl provably re-traces in this test."""
    rk = rng.permutation(n_r).astype(np.int32)
    rp = rng.integers(1, 100, n_r).astype(np.int32)
    sk = rng.integers(0, n_r, n_s).astype(np.int32)
    sp = rng.integers(1, 100, n_s).astype(np.int32)
    table = np.zeros(n_r, np.int64)
    table[rk] = rp
    expect = np.int32(np.sum(table[sk] * sp.astype(np.int64)) & 0xFFFFFFFF)
    return rk, rp, sk, sp, int(expect)


def test_engines_with_different_sort_impls_coexist(monkeypatch):
    rng = np.random.default_rng(7)
    rk, rp, sk, sp, expect = _data(rng)
    r = Relation(rk, rp)
    s = Relation(sk, sp)

    packed_traces = []
    orig_packed = mp.packed_sort_pairs

    def counting_packed(sv, pv):
        packed_traces.append(1)
        return orig_packed(sv, pv)

    monkeypatch.setattr(mp, "packed_sort_pairs", counting_packed)

    default_before = bj.get_sort_impl()
    e_lax = ClusteredJoin(EngineConfig(sort_impl="lax"))
    e_packed = ClusteredJoin(EngineConfig(sort_impl="packed"))
    # constructing an engine must NOT touch the process default anymore
    assert bj.get_sort_impl() == default_before

    a1 = e_lax.aggregate(r, s).aggregate
    assert len(packed_traces) == 0          # lax engine never hits packed
    a2 = e_packed.aggregate(r, s).aggregate
    assert len(packed_traces) > 0           # packed engine traces packed
    n_after_packed = len(packed_traces)
    a3 = e_lax.aggregate(r, s).aggregate    # interleaved: still lax
    assert len(packed_traces) == n_after_packed
    assert a1 == a2 == a3 == expect


def test_set_sort_impl_is_default_only(monkeypatch):
    """Flipping the process default must not invalidate other impls'
    compiled entries (no clear_caches) and per-call overrides win."""
    rng = np.random.default_rng(11)
    rk, rp, sk, sp, expect = _data(rng, n_r=1408, n_s=2816)

    before = bj.get_sort_impl()
    try:
        bj.set_sort_impl("packed")
        # explicit per-call override beats the default
        agg = bj.banded_join_aggregate(rk, rp, sk, sp, sort_impl="lax")
        assert int(agg) == expect
        # default applies when no override given
        agg2 = bj.banded_join_aggregate(rk, rp, sk, sp)
        assert int(agg2) == expect
    finally:
        bj.set_sort_impl(before)


def test_resolve_sort_impl_validates():
    with pytest.raises(AssertionError):
        bj.resolve_sort_impl("bogus")
    assert bj.resolve_sort_impl(None) == bj.get_sort_impl()

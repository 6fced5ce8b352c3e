"""Multi-chip distributed join on a virtual 8-device CPU mesh
(SURVEY.md §4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icde2019_gpu_join_tpu.parallel import (
    distributed_join_aggregate,
    distributed_join_aggregate_2level,
    make_mesh,
)
from icde2019_gpu_join_tpu.parallel.mesh import make_mesh_2d
from icde2019_gpu_join_tpu.utils import oracle
from tests.conftest import make_tables


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
def test_distributed_aggregate_matches_oracle(rng):
    rk, rp, sk, sp = make_tables(rng, n_r=4096, n_s=16384, dup_build=True)
    mesh = make_mesh(8)
    agg, overflow = distributed_join_aggregate(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        mesh, slack=3.0,
    )
    assert int(overflow) == 0
    assert int(agg) == oracle.join_aggregate(rk, rp, sk, sp)


@needs_8
def test_distributed_pkfk_count(rng):
    n_r, n_s = 2048, 8192
    rk = rng.permutation(n_r).astype(np.int32)
    sk = rk[rng.randint(0, n_r, size=n_s)].astype(np.int32)
    mesh = make_mesh(8)
    agg, overflow = distributed_join_aggregate(
        jnp.asarray(rk), jnp.ones(n_r, jnp.int32),
        jnp.asarray(sk), jnp.ones(n_s, jnp.int32),
        mesh, slack=3.0,
    )
    assert int(overflow) == 0
    assert int(agg) == n_s


@needs_8
def test_two_level_exchange(rng):
    rk, rp, sk, sp = make_tables(rng, n_r=4096, n_s=8192, dup_build=True)
    mesh = make_mesh_2d(2, 4)
    agg, overflow = distributed_join_aggregate_2level(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        mesh, slack=3.0,
    )
    assert int(overflow) == 0
    assert int(agg) == oracle.join_aggregate(rk, rp, sk, sp)


@needs_8
def test_overflow_detected(rng):
    # every S key identical -> one destination bucket must overflow with
    # slack ~1
    n = 4096
    rk = rng.permutation(n).astype(np.int32)
    sk = np.full(n, 7, dtype=np.int32)
    mesh = make_mesh(8)
    _, overflow = distributed_join_aggregate(
        jnp.asarray(rk), jnp.ones(n, jnp.int32),
        jnp.asarray(sk), jnp.ones(n, jnp.int32),
        mesh, slack=1.0,
    )
    assert int(overflow) > 0


def test_segmented_distributed_join(rng):
    """Streamed-probe distributed join (exchange/probe pipeline) matches
    the oracle and the one-shot distributed join."""
    from icde2019_gpu_join_tpu.parallel.dist_join import distributed_join_segmented
    from icde2019_gpu_join_tpu.parallel.mesh import make_mesh

    nd = len(jax.devices())
    n_r, n_s = 64 * nd, 512 * nd
    rk = rng.permutation(4 * n_r)[:n_r].astype(np.int32)
    sk = rk[rng.randint(0, n_r, n_s)].astype(np.int32)
    rp = rng.randint(1, 50, n_r).astype(np.int32)
    sp = rng.randint(1, 50, n_s).astype(np.int32)
    agg, ov = distributed_join_segmented(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        mesh=make_mesh(nd), num_segments=4, slack=4.0)
    assert int(ov) == 0
    assert int(agg) == oracle.join_aggregate(rk, rp, sk, sp)

"""Fused relational pipelines.

BASELINE.json config 3: filter -> hash join probe -> group-by aggregate
(count/sum), fused. The reference's analog capability is the
late-materialization probe summing extra columns inside the probe kernel
(join_partitioned_varpayload, src/join-primitives.cu:1420-1557).

Semantics of `filter_probe_groupby`:
    SELECT s.group_id, COUNT(*), SUM(r.payload)
    FROM S JOIN R ON S.key = R.key
    WHERE lo <= S.filter_col < hi
    GROUP BY s.group_id
with group ids in [0, num_groups). R may contain duplicate keys (COUNT and
SUM are over all matching pairs). Requires keys >= 0 (engine sentinel
contract).

Execution is fully fused on the banded engine: filtered-out S rows are
masked to a never-matching sentinel key (-2) BEFORE the sort, the group id
rides as the sort payload, the per-S-element banded probe kernel produces
(match_count h, matched-R-payload sum t), and the group-by reduces (h, t)
by group id with an exact chunked one-hot matmul (f32 partials are exact
for <= 2^24-bounded chunk sums; 16-bit split keeps int32-wraparound
exactness for sums).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from icde2019_gpu_join_tpu.ops.band_join import (
    banded_probe_per_s,
    sort_by_key,
)
from icde2019_gpu_join_tpu.ops.filter import filter_by_mask


def _groupby_sums_exact(gids: jnp.ndarray, vals: jnp.ndarray,
                        num_groups: int) -> jnp.ndarray:
    """SUM(vals) per group, int32 wraparound, via chunked one-hot matmuls.

    Scatter-add runs at ~120 Mrows/s on TPU; the MXU one-hot route measured
    2.7 Grows/s. f32 accumulators are exact below 2^24, so values are split
    into 16-bit halves and chunks bounded to 256 rows (256 * 65535 < 2^24).
    """
    n = gids.shape[0]
    C = 256
    slab = C * 4096  # 1M rows per scan step keeps partials small
    pad = (-n) % slab
    if pad:
        gids = jnp.concatenate([gids, jnp.full((pad,), num_groups, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), jnp.int32)])
    G = num_groups + 1
    garr = jnp.arange(G, dtype=jnp.int32)

    g3 = gids.reshape(-1, slab // C, C)
    v3 = vals.reshape(-1, slab // C, C)

    def step(acc, gv):
        g, v = gv
        onehot = (g[:, :, None] == garr[None, None, :]).astype(jnp.float32)
        u = v.astype(jnp.uint32)
        v_lo = (u & jnp.uint32(0xFFFF)).astype(jnp.float32)
        v_hi = ((u >> jnp.uint32(16)) & jnp.uint32(0xFFFF)).astype(jnp.float32)
        lo_part = jnp.einsum("ncg,nc->ng", onehot, v_lo)   # exact in f32
        hi_part = jnp.einsum("ncg,nc->ng", onehot, v_hi)
        lo_i = jnp.sum(lo_part.astype(jnp.uint32), axis=0)
        hi_i = jnp.sum(hi_part.astype(jnp.uint32), axis=0)
        return acc + lo_i + (hi_i << jnp.uint32(16)), None

    total, _ = jax.lax.scan(step, jnp.zeros((G,), jnp.uint32), (g3, v3))
    return total[:num_groups].astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_groups", "window_blocks"))
def filter_probe_groupby(
    r_keys: jnp.ndarray,
    r_pay: jnp.ndarray,
    s_keys: jnp.ndarray,
    s_filter_col: jnp.ndarray,
    s_group_id: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    num_groups: int,
    window_blocks: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (per-group match COUNT int32, per-group SUM(r_pay) int32
    wraparound). Non-matching / filtered-out rows contribute nothing."""
    keep = (s_filter_col >= lo) & (s_filter_col < hi)
    # Dead rows -> sentinel key -2 (sv 0x7FFFFFFE: sorts to the end, matches
    # nothing — R-side pads use -1). Group id rides as the sort payload.
    sk_masked = jnp.where(keep, s_keys, jnp.int32(-2))
    n_s = s_keys.shape[0]
    s_sv, s_gid = sort_by_key(sk_masked, s_group_id)
    r_sv, r_p = sort_by_key(r_keys, r_pay)
    h, t = banded_probe_per_s(r_sv, r_p, s_sv, window_blocks=window_blocks)
    # S sentinel padding rows sit at the very end of the sorted order and may
    # carry garbage h (pad-vs-pad key equality); drop them statically.
    h = h[:n_s]
    t = t[:n_s]
    gid = s_gid[:n_s]
    counts = _groupby_sums_exact(gid, h, num_groups)
    sums = _groupby_sums_exact(gid, t, num_groups)
    return counts, sums


@partial(jax.jit, static_argnames=("num_groups",))
def filter_groupby(
    keys: jnp.ndarray,
    vals: jnp.ndarray,
    group_id: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    num_groups: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Filter on key range then group-by count/sum (no join)."""
    keep = (keys >= lo) & (keys < hi)
    gids = jnp.where(keep, group_id, num_groups)
    vals = jnp.where(keep, vals, 0)
    counts = _groupby_sums_exact(gids, keep.astype(jnp.int32), num_groups)
    sums = _groupby_sums_exact(gids, vals, num_groups)
    return counts, sums


def filter_then_join_aggregate(r, s, s_filter_col, lo, hi, config=None):
    """Filter S, then full clustered-probe join aggregate — the composed
    (non-fused) strategy for comparison with the fused path."""
    from icde2019_gpu_join_tpu.models.joins import ClusteredJoin
    from icde2019_gpu_join_tpu.relation import Relation

    keep = (s_filter_col >= lo) & (s_filter_col < hi)
    keys_c, pays_c, count = filter_by_mask(s.keys, s.payload, keep)
    # static-shape: keep the padded arrays, zero payloads beyond count
    valid = jnp.arange(keys_c.shape[0]) < count
    pays_c = jnp.where(valid, pays_c, 0)
    engine = ClusteredJoin(config) if config else ClusteredJoin()
    return engine.aggregate(Relation(r.keys, r.payload), Relation(keys_c, pays_c))

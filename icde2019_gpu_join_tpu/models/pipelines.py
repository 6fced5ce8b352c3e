"""Fused relational pipelines.

BASELINE.json config 3: filter -> hash join probe -> group-by aggregate
(count/sum), fused. The reference's analog capability is the
late-materialization probe summing extra columns inside the probe kernel
(join_partitioned_varpayload, src/join-primitives.cu:1420-1557); here the
pipeline is composed functionally and jit-fused by XLA: the filter's
compaction feeds partitioning directly, and the group-by runs on the
(payload-carried) group ids of matched rows.

Semantics of `filter_probe_groupby`:
    SELECT s.group_id, COUNT(*), SUM(r.payload)
    FROM S JOIN R ON S.key = R.key
    WHERE lo <= S.filter_col < hi
    GROUP BY s.group_id
with R a unique-key (PK) build side and group ids in [0, num_groups).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from icde2019_gpu_join_tpu.ops.filter import filter_by_mask
from icde2019_gpu_join_tpu.ops.groupby import groupby_count_sum
from icde2019_gpu_join_tpu.ops.join_sorted import sort_merge_lookup


@partial(jax.jit, static_argnames=("num_groups",))
def filter_probe_groupby(
    r_keys: jnp.ndarray,
    r_pay: jnp.ndarray,
    s_keys: jnp.ndarray,
    s_filter_col: jnp.ndarray,
    s_group_id: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    num_groups: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (per-group match COUNT int32, per-group SUM(r_pay) int32
    wraparound). Non-matching / filtered-out rows contribute nothing."""
    keep = (s_filter_col >= lo) & (s_filter_col < hi)
    # Probe (PK build): matched build row per S row + hit mask.
    r_idx, hit = sort_merge_lookup(r_keys, s_keys)
    live = keep & hit
    gids = jnp.where(live, s_group_id, num_groups)  # dead rows -> overflow group
    vals = jnp.where(live, r_pay[r_idx], 0)
    counts, sums = groupby_count_sum(gids, vals, num_groups + 1)
    return counts[:num_groups], sums[:num_groups]


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
    counts, sums = groupby_count_sum(gids, vals, num_groups + 1)
    return counts[:num_groups], sums[:num_groups]


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

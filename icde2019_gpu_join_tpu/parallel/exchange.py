"""Distributed radix shuffle: per-chip partition by destination + all_to_all.

The TPU-native replacement for the reference's only "interconnect" — PCIe
cudaMemcpyAsync streams (SURVEY.md §2 P8, src/hash_join_clustered_probe.cu:
1312-1330). Each chip radix-partitions its local shard by destination chip
(the low bits of the radix field), pads each destination bucket to a static
capacity, and a single jax.lax.all_to_all over the mesh axis delivers every
row to the chip that owns its key range. Padding rows carry payload 0, which
contributes exactly nothing to SUM(Pr*Ps) — so the aggregate stays exact
without dynamic shapes.

Overflowed rows (a destination bucket exceeding its capacity under extreme
skew) are *counted* and reported so callers can retry with a bigger slack;
they are never silently dropped without the overflow signal.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from icde2019_gpu_join_tpu.ops.bits import partition_ids


def partition_to_buckets(
    keys: jnp.ndarray,
    pays: jnp.ndarray,
    num_buckets: int,
    cap: int,
    first_bit: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Local radix partition into [num_buckets, cap] padded buckets.

    Returns (bucket_keys, bucket_pays, overflow_count). Padding rows have
    payload 0 (exact no-op for SUM(Pr*Ps)). Deterministic: ONE 2-operand
    unstable sort of (rotated key, payload) — the rotation packs the
    destination bits into the top of the word, so sorting the rotated key
    groups by destination and orders by full key within. Deterministic as a
    MULTISET: bucket contents, counts, and commutative aggregates are fully
    determined; within-bucket row order among duplicate keys is unspecified
    under the unstable sort (the previous stable 3-operand (pid, key, pay)
    sort fixed that order too, but ran 2-3x slower — measured
    operand/stability costs, benchmarks/sortgeom_bench.py).
    """
    from icde2019_gpu_join_tpu.ops.bits import rotate_keys, unrotate_keys

    bits = (num_buckets - 1).bit_length()
    rot = rotate_keys(keys, bits, first_bit)
    rot_s, pays_s = jax.lax.sort((rot, pays), num_keys=1, is_stable=False)
    keys_s = unrotate_keys(rot_s, bits, first_bit)
    p_sorted = partition_ids(keys_s, bits, first_bit)
    probes = jnp.arange(num_buckets + 1, dtype=p_sorted.dtype)
    offsets = jnp.searchsorted(p_sorted, probes, side="left").astype(jnp.int32)
    counts = jnp.diff(offsets)

    j = jnp.arange(cap, dtype=jnp.int32)
    idx = offsets[:-1, None] + j[None, :]                 # [buckets, cap]
    valid = j[None, :] < counts[:, None]
    idx_c = jnp.clip(idx, 0, keys.shape[0] - 1)
    # Padding keys are spread over the whole key space (Knuth multiplicative
    # hash of the slot index) so a *later* exchange level re-bucketing this
    # output doesn't funnel all padding into partition 0; padding payloads
    # are 0, so any accidental key match contributes nothing.
    pad_keys = (idx.astype(jnp.uint32) * jnp.uint32(2654435761)).astype(jnp.int32)
    bk = jnp.where(valid, keys_s[idx_c], pad_keys)
    bp = jnp.where(valid, pays_s[idx_c], jnp.int32(0))
    overflow = jnp.sum(jnp.maximum(counts - cap, 0))
    return bk, bp, overflow


def all_to_all_exchange(
    bucket_keys: jnp.ndarray, bucket_pays: jnp.ndarray, axis: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shuffle padded buckets over the mesh axis: row block d of my buckets
    goes to chip d; I receive one block from every chip. Must run inside
    shard_map over `axis`."""
    k = jax.lax.all_to_all(bucket_keys, axis, split_axis=0, concat_axis=0, tiled=True)
    p = jax.lax.all_to_all(bucket_pays, axis, split_axis=0, concat_axis=0, tiled=True)
    return k, p

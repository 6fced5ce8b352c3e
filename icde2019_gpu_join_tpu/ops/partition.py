"""Radix partitioning into a dense CSR layout.

TPU-native replacement for the reference's two-pass bucket-chain partitioner
(partition_pass_one / partition_pass_two, src/join-primitives.cu:58-535, and
their metadata init/repack, :294-312, :577-618). CUDA builds the layout with
atomicAdd histograms and lock-free bucket allocation; TPUs have no device
atomics and poor random scatter, so we partition *deterministically*:

    partition id -> stable variadic sort -> CSR offsets via searchsorted.

The stable sort groups rows by partition while preserving row order inside a
partition (same visible semantics as the reference's ordered bucket chains);
counts/offsets replace `out_cnts` and `chains`. XLA's TPU sort is the v1
permutation engine; the Pallas multi-pass router (ops/partition_pallas.py)
replaces it on the hot path.

Because the probe is a blocked compare rather than a shared-memory hash
table, total_bits is typically chosen deeper than the reference's 13 bits
(see config.default_bits_for): smaller partitions make probe cost linear.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from icde2019_gpu_join_tpu.ops.bits import partition_ids
from icde2019_gpu_join_tpu.relation import PartitionedRelation


def histogram(keys: jnp.ndarray, total_bits: int, first_bit: int = 0) -> jnp.ndarray:
    """Per-partition row counts (the reference's out_cnts). Standalone op;
    the fused path derives counts from the sorted layout instead."""
    p = partition_ids(keys, total_bits, first_bit)
    return jnp.bincount(p, length=1 << total_bits).astype(jnp.int32)


def _csr_from_sorted(p_sorted: jnp.ndarray, parts: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """counts/offsets from the sorted partition-id column via vectorized
    binary search (cheap: (parts+1) * log n gathers)."""
    probes = jnp.arange(parts + 1, dtype=p_sorted.dtype)
    offsets = jnp.searchsorted(p_sorted, probes, side="left").astype(jnp.int32)
    counts = jnp.diff(offsets)
    return counts, offsets


def radix_partition(
    keys: jnp.ndarray,
    payload: jnp.ndarray,
    total_bits: int,
    first_bit: int = 0,
) -> PartitionedRelation:
    """Partition (keys, payload) into 2^total_bits partitions, CSR layout.

    One stable variadic sort on the partition id carries both columns; this
    subsumes the reference's two passes (any radix depth in one shot).
    """
    parts = 1 << total_bits
    p = partition_ids(keys, total_bits, first_bit)
    p_sorted, keys_s, pays_s = jax.lax.sort(
        (p, keys, payload), num_keys=1, is_stable=True
    )
    counts, offsets = _csr_from_sorted(p_sorted, parts)
    return PartitionedRelation(keys_s, pays_s, counts, offsets, total_bits, first_bit)


def radix_partition_multipass(
    keys: jnp.ndarray,
    payload: jnp.ndarray,
    total_bits: int,
    first_bit: int = 0,
    bits_per_pass: int = 8,
) -> PartitionedRelation:
    """MSB-first multi-pass variant mirroring the reference's pass structure
    (prepare_Relation_payload, src/join-primitives.cu:1582-1613: bits
    [first_bit+log_parts2, +log_parts1) then [first_bit, +log_parts2)).

    Note the composition rule: the reference's pass 2 runs *within* pass-1
    buckets (one CUDA block per bucket), so its MSB-first order is really a
    recursion. Flat whole-array stable passes compose LSB-first instead, and
    both yield the same final CSR layout (grouped by full radix field, stable
    within). Exists to exercise the pass plan the Pallas kernels use and as
    their correctness oracle.
    """
    from icde2019_gpu_join_tpu.config import RadixConfig

    plan = RadixConfig(total_bits, first_bit, bits_per_pass).pass_plan()
    k, v = keys, payload
    for shift, bits in reversed(plan):
        pid = partition_ids(k, bits, shift)
        _, k, v = jax.lax.sort((pid, k, v), num_keys=1, is_stable=True)
    p_final = partition_ids(k, total_bits, first_bit)
    counts, offsets = _csr_from_sorted(p_final, 1 << total_bits)
    return PartitionedRelation(k, v, counts, offsets, total_bits, first_bit)

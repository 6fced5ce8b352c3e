"""Perfect-hash (dense-key) join: the fast path when build keys are dense.

Analog of the reference's non-partitioned baseline build_perfect_array /
probe_perfect_array (src/join-primitives.cu:628-668): when build keys are
unique and bounded by a known domain size, the "hash table" is a dense
payload array indexed by key. On TPU: one scatter to build, gathers to probe
— gathers are fast XLA primitives, and this is the speed-of-light path for
the 1M⋈16M dense PK-FK benchmark config.
"""

from __future__ import annotations

import jax.numpy as jnp

# Domain slot for "no build row": payload 0 contributes nothing to SUM(Pr*Ps).
_EMPTY = jnp.int32(0)


def perfect_hash_build(
    r_keys: jnp.ndarray, r_pay: jnp.ndarray, domain: int
) -> jnp.ndarray:
    """Dense table t[key] = payload (keys assumed unique, in [0, domain))."""
    table = jnp.zeros((domain,), dtype=jnp.int32)
    return table.at[r_keys].set(r_pay, mode="drop")


def perfect_hash_probe_aggregate(
    table: jnp.ndarray, s_keys: jnp.ndarray, s_pay: jnp.ndarray
) -> jnp.ndarray:
    """SUM(Pr*Ps) with int32 wraparound via gather + fused multiply-reduce."""
    pr = table[jnp.clip(s_keys, 0, table.shape[0] - 1)]
    in_domain = (s_keys >= 0) & (s_keys < table.shape[0])
    pr = jnp.where(in_domain, pr, _EMPTY)
    total = jnp.sum(pr.astype(jnp.uint32) * s_pay.astype(jnp.uint32), dtype=jnp.uint32)
    return total.astype(jnp.int32)


def perfect_hash_probe_materialize(
    table_pay: jnp.ndarray,
    table_occupied: jnp.ndarray,
    s_keys: jnp.ndarray,
    s_pay: jnp.ndarray,
):
    """Per-S-row matched build payload + mask (PK build side: <=1 match)."""
    idx = jnp.clip(s_keys, 0, table_pay.shape[0] - 1)
    in_domain = (s_keys >= 0) & (s_keys < table_pay.shape[0])
    hit = in_domain & table_occupied[idx]
    return jnp.where(hit, table_pay[idx], _EMPTY), hit


def perfect_hash_build_occupancy(r_keys: jnp.ndarray, domain: int) -> jnp.ndarray:
    occ = jnp.zeros((domain,), dtype=jnp.bool_)
    return occ.at[r_keys].set(True, mode="drop")


def global_ht_join_aggregate(r_keys, r_pay, s_keys, s_pay,
                             log_buckets: int = 13):
    """Global chained-hash-table join baseline (build_ht_chains /
    chains_probing analog, src/join-primitives.cu:681-742).

    The reference builds ONE global bucket-chain table over hasht(key)'s
    low bits and walks per-bucket chains at probe time. With the identity
    hash, "bucket = low key bits" IS a 1-pass radix partition, and the
    chain walk is a per-bucket scan — so the TPU-idiomatic equivalent is
    the engine's CSR partition (ops/partition.radix_partition) + blocked
    per-bucket compare (ops/probe.blocked_probe_aggregate). This wrapper
    exists to name that correspondence as the C14 baseline API.

    Returns int32 SUM(Pr*Ps) with uint32 wraparound.
    """
    import numpy as np

    from icde2019_gpu_join_tpu.ops import probe as probe_ops
    from icde2019_gpu_join_tpu.ops.partition import radix_partition

    pr = radix_partition(r_keys, r_pay, log_buckets, 0)
    ps = radix_partition(s_keys, s_pay, log_buckets, 0)
    plan = probe_ops.plan_probe(
        np.asarray(pr.counts), np.asarray(pr.offsets[:-1]),
        np.asarray(ps.counts), np.asarray(ps.offsets[:-1]),
        1024, 1024,
    )
    return probe_ops.blocked_probe_aggregate(
        pr.keys, pr.payload, ps.keys, ps.payload, *plan.as_device(),
        tile_r=plan.tile_r, tile_s=plan.tile_s,
    )

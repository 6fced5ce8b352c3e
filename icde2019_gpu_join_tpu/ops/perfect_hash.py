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

"""Filter (selection) with compaction.

XLA needs static shapes, so the compacted output keeps the input length and
returns the selected-row count: rows [0, count) are the (order-preserving)
survivors, the tail is padding. Compaction is done with one stable sort on
the inverted mask — the same deterministic-permutation machinery as
partitioning (a filter *is* a 1-bit radix partition).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def filter_compact(
    keys: jnp.ndarray, vals: jnp.ndarray, lo: int, hi: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select rows with lo <= key < hi. Returns (keys', vals', count)."""
    keep = (keys >= lo) & (keys < hi)
    return filter_by_mask(keys, vals, keep)


def filter_by_mask(
    keys: jnp.ndarray, vals: jnp.ndarray, keep: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Order-preserving compaction of rows where keep is True."""
    drop = (~keep).astype(jnp.int32)
    _, keys_c, vals_c = jax.lax.sort((drop, keys, vals), num_keys=1, is_stable=True)
    count = jnp.sum(keep.astype(jnp.int32))
    return keys_c, vals_c, count

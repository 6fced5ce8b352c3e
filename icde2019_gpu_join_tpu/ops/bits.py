"""Radix partition-id computation.

The reference computes `partition = (hasht(key) >> first_bit) & parts_mask`
with hasht = identity (src/common.h:45-47, src/join-primitives.cu:131). Keys
are int32 but hashed as uint32, so the shift is logical, not arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

from icde2019_gpu_join_tpu.config import hasht


def partition_ids(keys: jnp.ndarray, total_bits: int, first_bit: int = 0) -> jnp.ndarray:
    """int32 partition id in [0, 2^total_bits) for each key."""
    u = hasht(keys.astype(jnp.uint32))
    mask = jnp.uint32((1 << total_bits) - 1)
    return ((u >> jnp.uint32(first_bit)) & mask).astype(jnp.int32)

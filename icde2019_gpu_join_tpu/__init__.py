"""tpu-join: a TPU-native vectorized query-execution engine.

Brand-new JAX/XLA/Pallas implementation of the capability set of the ICDE 2019
"Hardware-conscious Hash-Joins on GPUs" artifact (psiul/ICDE2019-GPU-Join):
multi-pass radix partitioning, hash build + clustered probe, join
materialization (incl. late materialization), filter, hash aggregates, radix
sort, skew-aware heavy-hitter splitting, streaming out-of-memory execution,
and multi-chip scaling via an ICI all-to-all radix shuffle.

This is a ground-up TPU design, not a CUDA port: the reference's atomic
scatter + lock-free bucket chains (reference src/join-primitives.cu:58-618)
are replaced by deterministic histogram -> exclusive-scan -> stable-permute
partitioning into a dense CSR layout, and the shared-memory hash-table probe
(reference src/join-primitives.cu:885-1416) by a VMEM blocked-compare
"clustered probe" over small radix partitions.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: the Pallas kernels (bitonic networks) take
# 20-120s to compile via the remote TPU compiler; cache across processes.
_cache_dir = _os.environ.get(
    "TPUJOIN_COMPILE_CACHE", _os.path.expanduser("~/.cache/tpujoin-xla")
)
if _cache_dir and _cache_dir != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knob: non-fatal
        pass

from icde2019_gpu_join_tpu.config import RadixConfig, EngineConfig
from icde2019_gpu_join_tpu.relation import Relation, PartitionedRelation

__version__ = "0.1.0"

__all__ = [
    "RadixConfig",
    "EngineConfig",
    "Relation",
    "PartitionedRelation",
]

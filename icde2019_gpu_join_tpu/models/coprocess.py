"""Host+TPU co-processing join: build side exceeds device memory.

Analog of outOfGPU_Join2_payload (reference
src/hash_join_clustered_probe.cu:1000-1680): the host CPU pre-partitions both
relations into 2^OUTER_BITS coarse partitions (reference LOG_PARTS_OUTER=4 ->
16, src/partition-primitives.cuh:38-42) with the native OpenMP partitioner,
a knapsack scheduler groups build partitions into device-resident batches
(groupOptimal2, src/partition-primitives.cu:381-469), and each (R_p, S_p)
pair is refined + joined on device with the radix field shifted past the
outer bits. Partial aggregates sum with int32 wraparound, so batching order
is irrelevant.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from icde2019_gpu_join_tpu import datagen
from icde2019_gpu_join_tpu.config import EngineConfig
from icde2019_gpu_join_tpu.models.joins import JoinResult
from icde2019_gpu_join_tpu.relation import Relation
from icde2019_gpu_join_tpu.utils.timing import PhaseTimer

OUTER_BITS = 4          # LOG_PARTS_OUTER analog
PARTS_RESIDENT = 5      # device-resident build slots (partition-primitives.cuh:42)


def coprocess_join_aggregate(
    r: Relation, s: Relation, config: Optional[EngineConfig] = None
) -> JoinResult:
    """SUM(Pr*Ps); r/s hold host numpy arrays (the oversized case)."""
    config = config or EngineConfig()
    timer = PhaseTimer()
    fb = config.radix.first_bit
    parts_host = 1 << OUTER_BITS

    rk = np.asarray(r.keys, dtype=np.int32)
    rp = np.asarray(r.payload, dtype=np.int32)
    sk = np.asarray(s.keys, dtype=np.int32)
    sp = np.asarray(s.payload, dtype=np.int32)

    with timer.phase("host_partition", bytes_moved=16 * (rk.size + sk.size),
                     rows=rk.size + sk.size):
        rk_p, rp_p, cnt_r, off_r = datagen.host_partition(rk, rp, OUTER_BITS, fb)
        sk_p, sp_p, cnt_s, off_s = datagen.host_partition(sk, sp, OUTER_BITS, fb)

    # Knapsack batches over build-partition gains (fraction of resident
    # capacity each consumes), as in groupOptimal2.
    avg = max(1, rk.size // parts_host)
    gains = cnt_r.astype(np.float64) / avg  # ~1.0 per uniform partition
    batch_of = datagen.knapsack_batches(gains, PARTS_RESIDENT)
    num_batches = int(batch_of.max()) + 1 if batch_of.size else 0

    def quantize(arr_k, arr_p, lo, hi):
        """Pad a partition slice to the next power of two with engine
        sentinels (key -1, payload 0 — contribute nothing), so every pair
        hits one of a handful of jit shapes instead of recompiling per
        partition (remote compiles cost 30-300s each)."""
        n = hi - lo
        cap = 1 << max(10, (n - 1).bit_length())
        k = np.full(cap, -1, np.int32)
        v = np.zeros(cap, np.int32)
        k[:n] = arr_k[lo:hi]
        v[:n] = arr_p[lo:hi]
        return jnp.asarray(k), jnp.asarray(v)

    # Per-pair aggregates stay ON DEVICE and accumulate there (int32
    # wraparound add is associative); ONE host pull at the very end. Pulling
    # per pair would serialize the pipeline on a full device round-trip per
    # partition pair (~26ms each through the axon tunnel).
    from icde2019_gpu_join_tpu.ops.band_join import banded_join_aggregate

    total_dev = jnp.int32(0)
    n_pairs = 0
    with timer.phase("pairs", rows=rk.size + sk.size,
                     bytes_moved=8 * (rk.size + sk.size)) as out:
        for b in range(num_batches):
            for p in np.nonzero(batch_of == b)[0]:
                r_lo, r_hi = int(off_r[p]), int(off_r[p + 1])
                s_lo, s_hi = int(off_s[p]), int(off_s[p + 1])
                if r_hi == r_lo or s_hi == s_lo:
                    continue
                rr = Relation(*quantize(rk_p, rp_p, r_lo, r_hi))
                ss = Relation(*quantize(sk_p, sp_p, s_lo, s_hi))
                total_dev = total_dev + banded_join_aggregate(
                    rr.keys, rr.payload, ss.keys, ss.payload,
                    window_blocks=config.band_window_blocks)
                n_pairs += 1
        total = int(np.asarray(total_dev))   # the single sync point
        out["result"] = total
    return JoinResult(aggregate=int(np.int32(np.uint32(total & 0xFFFFFFFF))),
                      timer=timer)

"""Streaming-probe join: build side resident, probe side streamed from host.

Analog of outOfGPU_Join3_payload (reference
src/hash_join_clustered_probe.cu:1684-1984): R is partitioned once and stays
device-resident; S lives in host memory and is cut into segments
(S_segment_size = min(CHUNK_SIZE, n/4), :1697) that flow through a
double-buffered H2D -> partition -> probe pipeline. The reference builds the
overlap with 3 CUDA streams + events; here JAX's async dispatch provides it:
the next segment's device_put is issued before the current segment's probe
is consumed, so transfer (k+1) overlaps compute (k).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from icde2019_gpu_join_tpu.config import EngineConfig, default_bits_for
from icde2019_gpu_join_tpu.models.joins import JoinResult, _partition_pair
from icde2019_gpu_join_tpu.ops import probe as probe_ops
from icde2019_gpu_join_tpu.ops.partition import radix_partition
from icde2019_gpu_join_tpu.relation import Relation
from icde2019_gpu_join_tpu.utils.timing import PhaseTimer

from functools import partial


@partial(jax.jit, static_argnames=("total_bits", "first_bit"))
def _partition_one(keys, pay, total_bits, first_bit):
    return radix_partition(keys, pay, total_bits, first_bit)


def streaming_join_aggregate(
    r: Relation, s: Relation, config: Optional[EngineConfig] = None
) -> JoinResult:
    """SUM(Pr*Ps) with S streamed in segments. `s` may hold host numpy
    arrays (the oversized case) or device arrays."""
    config = config or EngineConfig()
    timer = PhaseTimer()
    n_s = s.num_rows
    seg = config.segment_rows or max(1, min(1 << 27, -(-n_s // 4)))
    bits = default_bits_for(max(r.num_rows, seg), config.probe_tile_r)
    fb = config.radix.first_bit

    with timer.phase("partition_build", bytes_moved=16 * r.num_rows,
                     rows=r.num_rows) as out:
        pr = _partition_one(jnp.asarray(r.keys), jnp.asarray(r.payload), bits, fb)
        out["result"] = pr.keys
    counts_r = np.asarray(pr.counts)
    offs_r = np.asarray(pr.offsets[:-1])

    s_keys_host = s.keys
    s_pay_host = s.payload

    def put(lo, hi):
        return (
            jax.device_put(s_keys_host[lo:hi]),
            jax.device_put(s_pay_host[lo:hi]),
        )

    total = jnp.uint32(0)
    starts = list(range(0, n_s, seg))
    # Prefetch first segment, then keep one segment in flight (the analog of
    # the double-buffered S slots, reference :1559-1609).
    next_buf = put(0, min(seg, n_s))
    for i, lo in enumerate(starts):
        hi = min(lo + seg, n_s)
        sk, sp = next_buf
        if i + 1 < len(starts):
            nlo = starts[i + 1]
            next_buf = put(nlo, min(nlo + seg, n_s))
        with timer.phase("segment", bytes_moved=16 * (hi - lo), rows=hi - lo) as out:
            ps = _partition_one(sk, sp, bits, fb)
            counts_s = np.asarray(ps.counts)
            offs_s = np.asarray(ps.offsets[:-1])
            plan = probe_ops.plan_probe(
                counts_r, offs_r, counts_s, offs_s,
                config.probe_tile_r, config.probe_tile_s,
            )
            agg = probe_ops.blocked_probe_aggregate(
                pr.keys, pr.payload, ps.keys, ps.payload, *plan.as_device(),
                tile_r=plan.tile_r, tile_s=plan.tile_s,
            )
            total = total + agg.astype(jnp.uint32)
            out["result"] = agg
    return JoinResult(aggregate=int(jnp.asarray(total).astype(jnp.int32)), timer=timer)

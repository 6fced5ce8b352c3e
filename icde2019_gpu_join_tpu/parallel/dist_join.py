"""Multi-chip distributed join via shard_map.

The scaling design mandated by BASELINE.json's north star (the reference is
single-GPU; its co-processing pipeline outOfGPU_Join2 is the structural
template — host partitions <-> chip shards, PCIe streams <-> ICI collectives):

  1. each chip holds a shard of R and S (data-parallel, PartitionSpec("x"));
  2. local radix partition by destination chip = low log2(n) bits of the
     radix field (the global level of a two-level radix scheme);
  3. ICI all-to-all delivers (key, payload) buckets — the distributed radix
     shuffle;
  4. each chip joins its received sub-relations locally (remaining radix
     bits), payload-0 padding rows contribute nothing;
  5. psum produces the global aggregate (int32 wraparound is associative &
     commutative, so sharding does not change the result).

The local join inside shard_map is the banded sort-merge engine
(ops/band_join.py) — fully jittable, skew-robust, no host planning. Overflow counts from the padded exchange are psum'd and
returned so callers can assert slack sufficiency outside jit.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icde2019_gpu_join_tpu.ops.band_join import banded_join_aggregate
from icde2019_gpu_join_tpu.parallel.exchange import (
    all_to_all_exchange,
    partition_to_buckets,
)


def _local_join_after_exchange(rk, rp, sk, sp, axis: str, first_bit: int, cap_r: int, cap_s: int):
    nd = jax.lax.axis_size(axis)
    bk_r, bp_r, ov_r = partition_to_buckets(rk, rp, nd, cap_r, first_bit)
    bk_s, bp_s, ov_s = partition_to_buckets(sk, sp, nd, cap_s, first_bit)
    gk_r, gp_r = all_to_all_exchange(bk_r, bp_r, axis)
    gk_s, gp_s = all_to_all_exchange(bk_s, bp_s, axis)
    agg = banded_join_aggregate(
        gk_r.reshape(-1), gp_r.reshape(-1), gk_s.reshape(-1), gp_s.reshape(-1)
    )
    agg = jax.lax.psum(agg.astype(jnp.uint32), axis).astype(jnp.int32)
    overflow = jax.lax.psum(ov_r + ov_s, axis)
    return agg, overflow


def distributed_join_aggregate(
    r_keys: jnp.ndarray,
    r_pay: jnp.ndarray,
    s_keys: jnp.ndarray,
    s_pay: jnp.ndarray,
    mesh: Mesh,
    axis: str = "x",
    first_bit: int = 0,
    slack: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global SUM(Pr*Ps) over a 1D mesh. Inputs are global arrays (sharded or
    shardable over `axis`; lengths must divide the mesh size). Returns
    (aggregate int32, overflow row count — must be 0 for an exact result)."""
    nd = mesh.shape[axis]
    n_r, n_s = r_keys.shape[0], s_keys.shape[0]
    cap_r = max(8, int(slack * (n_r // nd) / nd) + 1)
    cap_s = max(8, int(slack * (n_s // nd) / nd) + 1)
    fn = _aggregate_fn(mesh, axis, first_bit, cap_r, cap_s)
    return fn(r_keys, r_pay, s_keys, s_pay)


@functools.lru_cache(maxsize=64)
def _aggregate_fn(mesh: Mesh, axis: str, first_bit: int, cap_r: int,
                  cap_s: int):
    """Cached jitted shard_map — building jit(shard_map(partial(...)))
    per call defeats jax's jit cache (fresh callable identity every time)
    and re-traces/recompiles on every invocation (measured: a warm 16M
    1-chip exchange join took 943s instead of ~1s)."""
    return jax.jit(
        jax.shard_map(
            partial(
                _local_join_after_exchange,
                axis=axis, first_bit=first_bit, cap_r=cap_r, cap_s=cap_s,
            ),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            # Pallas out_shapes carry no vma annotation; the TPU backend's
            # check_vma rejects them inside shard_map (CPU paths skip
            # Pallas, so virtual-mesh tests never see this)
            check_vma=False,
        )
    )


def _local_segmented(rk, rp, sk, sp, axis, first_bit, cap_r, cap_s, num_segments):
    """Build side exchanged + sorted once (resident); probe side flows in
    segments through bucket -> all_to_all -> sort -> banded probe. The
    per-segment structure is what lets the runtime overlap segment k+1's
    ICI exchange with segment k's probe compute (the TPU analog of the
    reference's 3-stream double-buffered pipeline,
    src/hash_join_clustered_probe.cu:1400-1622)."""
    from icde2019_gpu_join_tpu.ops.band_join import banded_probe, sort_by_key

    nd = jax.lax.axis_size(axis)
    bk_r, bp_r, ov_r = partition_to_buckets(rk, rp, nd, cap_r, first_bit)
    gk_r, gp_r = all_to_all_exchange(bk_r, bp_r, axis)
    r_sv, r_p = sort_by_key(gk_r.reshape(-1), gp_r.reshape(-1))

    sk_seg = sk.reshape(num_segments, -1)
    sp_seg = sp.reshape(num_segments, -1)

    def seg_step(carry, seg):
        acc, ov = carry
        k, p = seg
        bk, bp, ov_s = partition_to_buckets(k, p, nd, cap_s, first_bit)
        gk, gp = all_to_all_exchange(bk, bp, axis)
        s_sv, s_p = sort_by_key(gk.reshape(-1), gp.reshape(-1))
        agg = banded_probe(r_sv, r_p, s_sv, s_p, 2, "mul")
        return (acc + agg.astype(jnp.uint32), ov + ov_s), None

    (acc, ov_s), _ = jax.lax.scan(
        seg_step,
        (jnp.uint32(0) + (rk[0] * 0).astype(jnp.uint32), ov_r * 0),
        (sk_seg, sp_seg),
    )
    agg = jax.lax.psum(acc, axis).astype(jnp.int32)
    overflow = jax.lax.psum(ov_r + ov_s, axis)
    return agg, overflow


def distributed_join_segmented(
    r_keys, r_pay, s_keys, s_pay,
    mesh: Mesh,
    axis: str = "x",
    num_segments: int = 4,
    first_bit: int = 0,
    slack: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed join with the probe side streamed in segments so the ICI
    all-to-all of segment k+1 can overlap the banded probe of segment k
    (S_segment_size analog: min(CHUNK_SIZE, n/4),
    src/hash_join_clustered_probe.cu:1017). Returns (aggregate, overflow)."""
    nd = mesh.shape[axis]
    n_r, n_s = r_keys.shape[0], s_keys.shape[0]
    cap_r = max(8, int(slack * (n_r // nd) / nd) + 1)
    cap_s = max(8, int(slack * (n_s // nd) / (nd * num_segments)) + 1)
    fn = _segmented_fn(mesh, axis, first_bit, cap_r, cap_s, num_segments)
    return fn(r_keys, r_pay, s_keys, s_pay)


@functools.lru_cache(maxsize=64)
def _segmented_fn(mesh: Mesh, axis: str, first_bit: int, cap_r: int,
                  cap_s: int, num_segments: int):
    """Cached jitted shard_map (see _aggregate_fn)."""
    return jax.jit(
        jax.shard_map(
            partial(
                _local_segmented,
                axis=axis, first_bit=first_bit, cap_r=cap_r, cap_s=cap_s,
                num_segments=num_segments,
            ),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def _two_level_local(rk, rp, sk, sp, host_axis, chip_axis, first_bit, caps):
    """Two-level exchange: hosts exchange over DCN first (outer radix bits),
    then chips within a host over ICI (next bits). This keeps the heavy
    all-to-all fan-in hierarchical, matching the pod's physical topology."""
    (cap_r_h, cap_s_h, cap_r_c, cap_s_c) = caps
    nh = jax.lax.axis_size(host_axis)
    nc = jax.lax.axis_size(chip_axis)
    hbits = max((nh - 1).bit_length(), 0)

    # Level 1: exchange across hosts on bits [first_bit, first_bit+hbits).
    bk_r, bp_r, ov1r = partition_to_buckets(rk, rp, nh, cap_r_h, first_bit)
    bk_s, bp_s, ov1s = partition_to_buckets(sk, sp, nh, cap_s_h, first_bit)
    gk_r, gp_r = all_to_all_exchange(bk_r, bp_r, host_axis)
    gk_s, gp_s = all_to_all_exchange(bk_s, bp_s, host_axis)

    # Level 2: exchange across chips within the host on the next bits.
    bk_r, bp_r, ov2r = partition_to_buckets(
        gk_r.reshape(-1), gp_r.reshape(-1), nc, cap_r_c, first_bit + hbits)
    bk_s, bp_s, ov2s = partition_to_buckets(
        gk_s.reshape(-1), gp_s.reshape(-1), nc, cap_s_c, first_bit + hbits)
    gk_r, gp_r = all_to_all_exchange(bk_r, bp_r, chip_axis)
    gk_s, gp_s = all_to_all_exchange(bk_s, bp_s, chip_axis)

    agg = banded_join_aggregate(
        gk_r.reshape(-1), gp_r.reshape(-1), gk_s.reshape(-1), gp_s.reshape(-1))
    agg = jax.lax.psum(
        jax.lax.psum(agg.astype(jnp.uint32), chip_axis), host_axis
    ).astype(jnp.int32)
    overflow = jax.lax.psum(
        jax.lax.psum(ov1r + ov1s + ov2r + ov2s, chip_axis), host_axis)
    return agg, overflow


def distributed_join_aggregate_2level(
    r_keys, r_pay, s_keys, s_pay,
    mesh: Mesh,
    host_axis: str = "host",
    chip_axis: str = "chip",
    first_bit: int = 0,
    slack: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-level (DCN x ICI) distributed join over a 2D mesh."""
    nh, nc = mesh.shape[host_axis], mesh.shape[chip_axis]
    n_r, n_s = r_keys.shape[0], s_keys.shape[0]
    shard_r = n_r // (nh * nc)
    shard_s = n_s // (nh * nc)
    cap_r_h = max(8, int(slack * shard_r / nh) + 1)
    cap_s_h = max(8, int(slack * shard_s / nh) + 1)
    cap_r_c = max(8, int(slack * (cap_r_h * nh) / nc) + 1)
    cap_s_c = max(8, int(slack * (cap_s_h * nh) / nc) + 1)
    fn = _two_level_fn(mesh, host_axis, chip_axis, first_bit,
                       (cap_r_h, cap_s_h, cap_r_c, cap_s_c))
    return fn(r_keys, r_pay, s_keys, s_pay)


@functools.lru_cache(maxsize=64)
def _two_level_fn(mesh: Mesh, host_axis: str, chip_axis: str,
                  first_bit: int, caps):
    """Cached jitted shard_map (see _aggregate_fn)."""
    return jax.jit(
        jax.shard_map(
            partial(
                _two_level_local,
                host_axis=host_axis, chip_axis=chip_axis, first_bit=first_bit,
                caps=caps,
            ),
            mesh=mesh,
            in_specs=(P((host_axis, chip_axis)),) * 4,
            out_specs=(P(), P()),
            check_vma=False,
        )
    )

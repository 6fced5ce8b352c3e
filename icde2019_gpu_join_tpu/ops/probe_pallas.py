"""Pallas TPU clustered-probe kernel.

The hot probe path (replaces ops/probe.py's XLA formulation, which is
gather-bound on TPU). TPU-native design, exploiting the deterministic CSR
partitioned layout:

  * Both relations are CSR-partitioned on the same radix field, so the join
    is a *merge of two partition-sorted streams*: R is streamed through VMEM
    in fixed TR-row tiles by the Pallas pipeline; for each R tile, the S rows
    of the partitions it spans form one contiguous range, DMA'd in
    double-buffered TS-row chunks at dynamic (tile-aligned) offsets.
  * Within a (R tile x S chunk) block: eq = (rk[:,None] == sk[None,:]) and
    contrib = sum(rp * (eq ? sp : 0)) — the masked-equality block replacing
    the reference's shared-memory hash-table walk
    (join_partitioned_aggregate, src/join-primitives.cu:1052-1087). The
    compare is structured as 8 fully-2D [128, TS] broadcasts (one per R
    sublane row, via a single [8,128] transpose per R tile) — Mosaic
    vectorizes 2D broadcasts but scalarizes 3D ones.
  * NO masks anywhere: keys in different partitions can never be equal (the
    partition id is a function of the key), so over-reading an S range into
    neighboring partitions is harmless, and padding rows carry payload 0,
    which contributes 0 to SUM(Pr*Ps). COUNT is the same kernel with
    payloads forced to 1 (padding stays 0).
  * The grid runs sequentially on the TensorCore, so a single VMEM
    accumulator cell replaces the reference's atomicAdd(results)
    (src/join-primitives.cu:1092); skew needs no load balancing on a
    sequential grid — heavy partitions just take more inner-loop chunks
    (dynamic fori_loop trip count), which is the decompose_chains analog.

Work-range planning (plan_ranges) is vectorized numpy over the histogram:
O(num_tiles) instead of a per-(R-tile x S-tile) item table.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def plan_ranges(
    offsets_r: np.ndarray,
    offsets_s: np.ndarray,
    n_r: int,
    tile_r: int,
    tile_s: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-R-tile S ranges: (s_start[t], s_nchunks[t]) as int32 numpy.

    R tile t covers rows [t*TR, (t+1)*TR); its S range spans the partitions
    of those rows: [offsets_s[p_first], offsets_s[p_last+1])."""
    offsets_r = np.asarray(offsets_r, dtype=np.int64)
    offsets_s = np.asarray(offsets_s, dtype=np.int64)
    num_tiles = -(-n_r // tile_r)
    t = np.arange(num_tiles, dtype=np.int64)
    row_lo = t * tile_r
    row_hi = np.minimum((t + 1) * tile_r, n_r) - 1
    p_first = np.searchsorted(offsets_r, row_lo, side="right") - 1
    p_last = np.searchsorted(offsets_r, row_hi, side="right") - 1
    s_lo = offsets_s[p_first]
    s_hi = offsets_s[p_last + 1]
    # Align range starts down to a tile_s boundary: Mosaic requires dynamic
    # HBM slices to be tile-aligned, and over-reading neighboring partitions
    # is harmless (their keys cannot match this tile's partitions).
    s_lo = (s_lo // tile_s) * tile_s
    nch = -(-(s_hi - s_lo) // tile_s)
    return s_lo.astype(np.int32), nch.astype(np.int32)


def _probe_agg_kernel(
    s_start_ref, s_nch_ref,          # scalar prefetch
    rk_ref, rp_ref,                  # R tile blocks in VMEM [TR//128, 128]
    sk_hbm, sp_hbm,                  # S columns [1, ns], in HBM
    out_ref,                         # [1, 1] int32 accumulator block
    sk_buf, sp_buf, sems,            # scratch: [2, 1, TS] x2, sems [2, 2]
    *, tile_s: int,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros((1, 1), jnp.int32)

    start = pl.multiple_of(s_start_ref[t], tile_s)
    # Defensive clamp: a malformed plan must not DMA out of bounds.
    n_s_total = sk_hbm.shape[1]
    nch = jnp.minimum(s_nch_ref[t], (n_s_total - start) // tile_s)

    def s_dma(slot, k, hbm, buf, sem_idx):
        return pltpu.make_async_copy(
            hbm.at[:, pl.ds(start + k * tile_s, tile_s)],
            buf.at[slot],
            sems.at[slot, sem_idx],
        )

    @pl.when(nch > 0)
    def _():
        s_dma(0, 0, sk_hbm, sk_buf, 0).start()
        s_dma(0, 0, sp_hbm, sp_buf, 1).start()

    r_rows = rk_ref.shape[0]
    rk_t = rk_ref[...].T    # [128, TR//128]
    rp_t = rp_ref[...].T

    def body(k, acc):
        slot = k % 2

        @pl.when(k + 1 < nch)
        def _():
            s_dma((k + 1) % 2, k + 1, sk_hbm, sk_buf, 0).start()
            s_dma((k + 1) % 2, k + 1, sp_hbm, sp_buf, 1).start()

        s_dma(slot, k, sk_hbm, sk_buf, 0).wait()
        s_dma(slot, k, sp_hbm, sp_buf, 1).wait()

        sk = sk_buf[slot]     # [1, TS]
        sp = sp_buf[slot]
        step = jnp.int32(0)
        for j in range(r_rows):
            rk_col = rk_t[:, j:j + 1]                  # [128, 1]
            eq = rk_col == sk                          # [128, TS] 2D bcast
            per = jnp.sum(jnp.where(eq, sp, 0), axis=1, keepdims=True)
            step = step + jnp.sum(rp_t[:, j:j + 1] * per)
        return acc + step

    acc = jax.lax.fori_loop(0, nch, body, jnp.int32(0))
    out_ref[...] += acc.reshape(1, 1)


@functools.partial(
    jax.jit, static_argnames=("tile_r", "tile_s", "interpret")
)
def probe_aggregate_ranges(
    r_keys, r_pay, s_keys, s_pay, s_start, s_nch,
    tile_r: int = 1024, tile_s: int = 2048, interpret: bool = False,
):
    """SUM(Pr*Ps) over matches (int32 wraparound) given CSR-partitioned
    inputs and per-R-tile S ranges.

    Caller contract: r_* padded to a multiple of tile_r and s_* padded to a
    multiple of tile_s (so every chunk DMA is in bounds); padding rows must
    have payload 0 (key value irrelevant)."""
    n_r = r_keys.shape[0]
    n_s = s_keys.shape[0]
    assert n_r % tile_r == 0, "pad R to a tile_r multiple (payload 0)"
    assert n_s % tile_s == 0, "pad S to a tile_s multiple (payload 0)"
    # Blocks are [tile_r//128, 128]; the sublane dim must be a multiple of 8.
    assert tile_r % 1024 == 0 and tile_s % 128 == 0
    num_tiles = n_r // tile_r
    r2 = (tile_r // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(r2, lambda t, *_: (t, 0)),
            pl.BlockSpec(r2, lambda t, *_: (t, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda t, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, tile_s), jnp.int32),
            pltpu.VMEM((2, 1, tile_s), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_probe_agg_kernel, tile_s=tile_s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
    )(
        s_start, s_nch,
        r_keys.reshape(-1, 128), r_pay.reshape(-1, 128),
        s_keys.reshape(1, -1), s_pay.reshape(1, -1),
    )
    return out[0, 0]


def pad_for_probe(keys, pays, tile: int, extra: int = 0):
    """Pad (keys, pays) to a multiple of `tile` (+ extra rows) with
    payload-0 rows."""
    n = keys.shape[0]
    target = -(-n // tile) * tile + extra
    pad = target - n
    if pad == 0:
        return keys, pays
    return (
        jnp.pad(keys, (0, pad)),
        jnp.pad(pays, (0, pad)),
    )

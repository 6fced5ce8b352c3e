"""Pallas TPU full-tile bitonic sort of (sortval, payload) pairs.

STATUS: EXPERIMENTAL / not on the hot path. Measured 450 Melem/s at 64K
tiles and 132 Melem/s at 1M tiles — it loses to XLA's flat unstable sort
(359-691 Mrows/s measured, benchmarks/sortgeom_bench.py) once payloads are
carried, and by a wide margin to XLA's batched segmented sorts (1.7-4.9
Grows/s at [many x 1-4K]). Kept as kernel infrastructure + documentation of
the bitonic-on-VPU cost floor; the partition engine that was expected to
need it became ops/partition_radix.py (chunk-sort + block-gather, no Pallas
sort required) — see docs/DESIGN_NOTES.md "Radix vs sort: closed".

Design notes: this kernel sorts one VMEM-resident
tile with the classic bitonic network; every compare-exchange at distance d
is two `pltpu.roll`s + selects over the whole [S, 128] tile (XOR partners
never cross a lane-row for d < 128, never leave the tile otherwise), so all
data movement is dense vector ops — no gather/scatter anywhere.

Orientation: the flat element order is row-major over [S, 128] (flat = s*128
+ lane). Compare directions come from bits of the flat index (standard
bitonic: ascending block iff bit k of the index is 0), evaluated as iota
masks. The stage loop is a fori_loop with dynamic roll shifts — a statically
unrolled network compiles 10-100x slower on the Mosaic remote compiler with
no measured runtime win.

Replaces the role of the reference's partition_pass_one/_two block shuffle
(src/join-primitives.cu:202-278, 427-533) as the "move rows to their
partition" engine; the radix grouping falls out of sorting by the rotated
key (ops/bits.rotate_keys).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bitonic_tile(sv, pay, total_log2: int, unroll: bool = False):
    """Sort (sv, pay) by sv ascending over flat row-major [S, 128] order.

    sv, pay: [S, 128] int32 values (pay may be a tuple of arrays to carry).
    Must run inside a Pallas TPU kernel (uses pltpu.roll).
    """
    S = sv.shape[0]
    pays = pay if isinstance(pay, tuple) else (pay,)
    iota_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    )

    def stage_dyn(k, j, sv, pays):
        d = jnp.int32(1) << j
        bit = (iota_flat >> j) & 1
        fwd = bit == 0

        def lane_roll(x):
            dd = d
            return jnp.where(fwd, pltpu.roll(x, 128 - dd, 1), pltpu.roll(x, dd, 1))

        def sub_roll(x):
            dr = d >> 7
            return jnp.where(fwd, pltpu.roll(x, S - dr, 0), pltpu.roll(x, dr, 0))

        def partner(x):
            return jax.lax.cond(j < 7, lane_roll, sub_roll, x)

        psv = partner(sv)
        dirbit = (iota_flat >> k) & 1
        keep_small = bit == dirbit
        take = (psv < sv) == keep_small
        new_sv = jnp.where(take, psv, sv)
        new_pays = tuple(jnp.where(take, partner(p), p) for p in pays)
        return new_sv, new_pays

    if unroll:
        for k in range(1, total_log2 + 1):
            for j in reversed(range(k)):
                sv, pays = stage_dyn(jnp.int32(k), jnp.int32(j), sv, pays)
    else:
        nstages = total_log2 * (total_log2 + 1) // 2

        def body(_, carry):
            k, j, sv, pays = carry
            sv, pays = stage_dyn(k, j, sv, pays)
            nk = jnp.where(j == 0, k + 1, k)
            nj = jnp.where(j == 0, k, j - 1)
            return nk, nj, sv, pays

        _, _, sv, pays = jax.lax.fori_loop(
            0, nstages, body, (jnp.int32(1), jnp.int32(0), sv, pays)
        )
    if isinstance(pay, tuple):
        return sv, pays
    return sv, pays[0]


def _sort_kernel(sv_ref, pay_ref, osv_ref, opay_ref, *, total_log2, unroll):
    sv, pay = bitonic_tile(sv_ref[:], pay_ref[:], total_log2, unroll=unroll)
    osv_ref[:] = sv
    opay_ref[:] = pay


@functools.partial(jax.jit, static_argnames=("tile_elems", "interpret", "unroll"))
def sort_tiles(sv, pay, tile_elems: int = 1 << 20, interpret: bool = False,
               unroll: bool = False):
    """Independently sort each tile_elems-sized tile of (sv, pay) by sv
    ascending (int32 signed compare). n must be a multiple of tile_elems;
    tile_elems a power of two >= 1024."""
    n = sv.shape[0]
    assert n % tile_elems == 0 and tile_elems & (tile_elems - 1) == 0
    total_log2 = tile_elems.bit_length() - 1
    S = tile_elems // 128
    num_tiles = n // tile_elems
    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    out = pl.pallas_call(
        functools.partial(_sort_kernel, total_log2=total_log2, unroll=unroll),
        grid=(num_tiles,),
        in_specs=[blk, blk],
        out_specs=(blk, blk),
        out_shape=(
            jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        ),
        # v5e has 128MB VMEM; the default 16MB scoped limit rejects big tiles.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(sv.reshape(-1, 128), pay.reshape(-1, 128))
    return out[0].reshape(-1), out[1].reshape(-1)

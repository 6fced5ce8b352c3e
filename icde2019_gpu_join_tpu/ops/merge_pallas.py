"""Pallas TPU merge-tree sort of (sortval, payload) pairs.

The round-2 verdict's one identified route past the `lax.sort` ceiling
(~355 Mrows/s at 2^27, 86% of single-chip pipeline time): sort small runs
with XLA's fast segmented sort, then MERGE — a bitonic *merge* of two
sorted runs costs log2(2L) compare-exchange stages instead of the full
network's log^2, so the cascade's total stage count is ~330 vs the flat
sort's ~378, and every stage here is a uniform-direction min/max over
dense reshaped views (no pltpu.roll, which lowers ~50x slow — see
docs/DESIGN_NOTES.md "Mosaic gotchas").

Structure (analog of the reference's hot partition/ordering kernels,
src/join-primitives.cu:58-283 — re-thought for a scatterless VPU):

  1. base runs:   XLA segmented sort, runs of BASE_RUN (measured 1.9-5x
                  faster per element than the flat sort at [many x 4K]).
  2. VMEM levels: `merge_levels_vmem` — each grid tile loads a span of
                  runs and merges `levels` levels entirely in VMEM.
  3. HBM levels:  `merge_level_hbm` — runs too big for VMEM merge via
                  merge-path planning: XLA computes exact diagonal splits
                  per output tile (vectorized binary search, ~16K tiny
                  gathers), the kernel DMAs the two 128-aligned windows,
                  masks the off-diagonal junk to +/-inf sentinels, runs
                  one 14-stage bitonic merge in VMEM, and writes the
                  valid rows back at a dynamic (row-aligned) offset.

Sentinel caveat: window masking uses INT32_MIN/INT32_MAX as -inf/+inf.
A *real* key equal to a sentinel could tie with junk inside a window and
swap payloads with it (bitonic networks are not stable). The public entry
`merge_sort_pairs` therefore guards: if any sortval equals either
sentinel it falls back to `lax.sort` via `lax.cond` (both branches
compiled once; the count costs ~2 vector ops). Rotated keys can hit the
sentinels only when the pre-rotation key is an exact power of two, but
they can — the guard keeps this exact, not probabilistic.

Compare order is SIGNED int32 ascending — identical to `lax.sort` on
int32, so this is a drop-in for ops/partition.radix_partition's sort.

STATUS: correctness is interpret-tested (tests/test_merge_pallas.py);
device performance is measured by benchmarks/merge_sort_bench.py. Wired
into the hot path only if it beats lax.sort there (config
`sort_impl="merge"`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MIN = -0x80000000
INT_MAX = 0x7FFFFFFF

BASE_RUN = 4096          # XLA segsort base run length
VMEM_TILE = 1 << 20      # elements per VMEM merge tile (4 MB/array)
HBM_WINDOW = 8192        # per-side window of the HBM merge-path kernel
HBM_TILE_OUT = HBM_WINDOW - 128   # valid output per HBM tile (63 rows)


# ---------------------------------------------------------------------------
# stage primitives (operate on flat row-major [S, 128] int32 value pairs)
# ---------------------------------------------------------------------------

def _cx(sv, pv, d: int):
    """One uniform-direction compare-exchange stage at distance d: for every
    2d-aligned group, min lands in the low half, max in the high half.
    d is a static power of two. Pure reshape/min/max — no roll, no gather."""
    S = sv.shape[0]
    if d >= 128:
        dr = d // 128
        a = sv.reshape(S // (2 * dr), 2, dr, 128)
        p = pv.reshape(S // (2 * dr), 2, dr, 128)
        lo, hi = a[:, 0], a[:, 1]
        swap = hi < lo
        nsv = jnp.stack(
            [jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)], axis=1)
        plo, phi = p[:, 0], p[:, 1]
        npv = jnp.stack(
            [jnp.where(swap, phi, plo), jnp.where(swap, plo, phi)], axis=1)
        return nsv.reshape(S, 128), npv.reshape(S, 128)
    a = sv.reshape(S, 128 // (2 * d), 2, d)
    p = pv.reshape(S, 128 // (2 * d), 2, d)
    lo, hi = a[..., 0, :], a[..., 1, :]
    swap = hi < lo
    nsv = jnp.stack(
        [jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)], axis=-2)
    plo, phi = p[..., 0, :], p[..., 1, :]
    npv = jnp.stack(
        [jnp.where(swap, phi, plo), jnp.where(swap, plo, phi)], axis=-2)
    return nsv.reshape(S, 128), npv.reshape(S, 128)


def _flip_run(x, rows: int):
    """Reverse each length-(rows*128) run of flat row-major x ([S,128]):
    reverse the run's rows and every lane within them."""
    S = x.shape[0]
    v = x.reshape(S // rows, rows, 128)
    return v[:, ::-1, ::-1].reshape(S, 128)


def _mirror(sv, pv, run_rows: int):
    """Mirror stage of the bitonic merge of ADJACENT ASCENDING runs: compare
    element i of run A with element (L-1-i) of run B for every adjacent
    (A, B) pair; after it both halves are bitonic-clean: every element of
    the low half <= every element of the high half, and each half sorts with
    the remaining power-of-two _cx stages. run_rows = L/128 (L >= 128)."""
    S = sv.shape[0]
    g = S // (2 * run_rows)
    a = sv.reshape(g, 2, run_rows, 128)
    p = pv.reshape(g, 2, run_rows, 128)
    A, B = a[:, 0], a[:, 1]
    PA, PB = p[:, 0], p[:, 1]
    Bf = B[:, ::-1, ::-1]
    PBf = PB[:, ::-1, ::-1]
    swap = Bf < A
    nA = jnp.where(swap, Bf, A)
    nBf = jnp.where(swap, A, Bf)
    nPA = jnp.where(swap, PBf, PA)
    nPBf = jnp.where(swap, PA, PBf)
    nsv = jnp.stack([nA, nBf[:, ::-1, ::-1]], axis=1)
    npv = jnp.stack([nPA, nPBf[:, ::-1, ::-1]], axis=1)
    return nsv.reshape(S, 128), npv.reshape(S, 128)


def _cx_rows(sv, pv, dr: int):
    """Row-distance compare-exchange for arbitrary [rows, cols] tiles
    (the d >= 128 branch of _cx, generalized for transposed layouts)."""
    rows, cols = sv.shape
    a = sv.reshape(rows // (2 * dr), 2, dr, cols)
    p = pv.reshape(rows // (2 * dr), 2, dr, cols)
    lo, hi = a[:, 0], a[:, 1]
    swap = hi < lo
    nsv = jnp.stack(
        [jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)], axis=1)
    plo, phi = p[:, 0], p[:, 1]
    npv = jnp.stack(
        [jnp.where(swap, phi, plo), jnp.where(swap, plo, phi)], axis=1)
    return nsv.reshape(rows, cols), npv.reshape(rows, cols)


def _merge_adjacent_runs(sv, pv, run_len: int, lane_transpose: bool = False):
    """Merge every adjacent pair of ascending run_len-runs of the flat tile
    into ascending 2*run_len runs: mirror + log2(run_len) cx stages.

    lane_transpose: run the 7 lane-level stages (d < 128) on a transposed
    tile where they become sublane-row exchanges — one transpose each way
    per array vs 7 lane-dim reshuffles. Which wins is measured on device
    (benchmarks/merge_sort_bench.py stages); both are bit-identical."""
    sv, pv = _mirror(sv, pv, run_len // 128)
    d = run_len // 2
    while d >= 128:
        sv, pv = _cx(sv, pv, d)
        d //= 2
    if d == 0:
        return sv, pv
    if not lane_transpose:
        while d >= 1:
            sv, pv = _cx(sv, pv, d)
            d //= 2
        return sv, pv
    svT, pvT = sv.T, pv.T              # lane-distance pairs -> row pairs
    while d >= 1:
        svT, pvT = _cx_rows(svT, pvT, d)
        d //= 2
    return svT.T, pvT.T


# ---------------------------------------------------------------------------
# VMEM cascade: merge `levels` levels inside one grid tile
# ---------------------------------------------------------------------------

def _vmem_kernel(sv_ref, pv_ref, osv_ref, opv_ref, *, run_len, levels,
                 lane_transpose):
    sv, pv = sv_ref[:], pv_ref[:]
    l = run_len
    for _ in range(levels):
        sv, pv = _merge_adjacent_runs(sv, pv, l, lane_transpose)
        l *= 2
    osv_ref[:] = sv
    opv_ref[:] = pv


@functools.partial(
    jax.jit, static_argnames=("run_len", "levels", "tile_elems", "interpret",
                              "lane_transpose"))
def merge_levels_vmem(sv, pv, run_len: int, levels: int,
                      tile_elems: int = VMEM_TILE, interpret: bool = False,
                      lane_transpose: bool = False):
    """Merge ascending runs of run_len into runs of run_len << levels, all
    levels fused in VMEM per grid tile. n % tile == 0, tile >= run<<levels,
    run_len >= 128; all powers of two."""
    n = sv.shape[0]
    tile = min(tile_elems, n)
    assert tile >= (run_len << levels) and n % tile == 0
    S = tile // 128
    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    out = pl.pallas_call(
        functools.partial(_vmem_kernel, run_len=run_len, levels=levels,
                          lane_transpose=lane_transpose),
        grid=(n // tile,),
        in_specs=[blk, blk],
        out_specs=(blk, blk),
        out_shape=(
            jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(sv.reshape(-1, 128), pv.reshape(-1, 128))
    return out[0].reshape(-1), out[1].reshape(-1)


# ---------------------------------------------------------------------------
# HBM level: merge-path planned, masked-window bitonic merge per output tile
# ---------------------------------------------------------------------------

def _merge_path_splits(sv, run_len: int, tile_out: int):
    """For every output tile boundary, the exact diagonal split (a, b) with
    a + b = o, max(A[<a], B[<b]) <= min(A[>=a], B[>=b]) — vectorized binary
    search, ~log2(run_len) gather rounds over all tiles at once.

    Returns int32 arrays [ntiles]: a_lo, b_lo (split at the tile's start,
    LOCAL to the run pair) plus the pair index of each tile."""
    n = sv.shape[0]
    pair = 2 * run_len
    npairs = n // pair
    tiles_per_pair = -(-pair // tile_out)
    t = jnp.arange(npairs * tiles_per_pair, dtype=jnp.int32)
    p = t // tiles_per_pair
    j = t % tiles_per_pair
    # ragged tail: the last tile of each pair re-covers rows so every tile
    # writes exactly tile_out rows (identical values — deterministic merge)
    o = jnp.minimum(j * tile_out, pair - tile_out)
    base = p * pair
    lo = jnp.maximum(o - run_len, 0)
    hi = jnp.minimum(o, run_len)
    # invariant: correct a in [lo, hi]; A[a-1] <= B[o-a] and B[o-a-1] <= A[a]
    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi + 1) >> 1  # upper-bound search: largest a with f(a)
        a_prev = jnp.where(
            mid >= 1, sv[jnp.clip(base + mid - 1, 0, n - 1)], INT_MIN)
        b_at = jnp.where(
            o - mid < run_len,
            sv[jnp.clip(base + run_len + o - mid, 0, n - 1)], INT_MAX)
        ok = a_prev <= b_at  # A[mid-1] <= B[o-mid]: a can be >= mid
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
        return lo, hi
    iters = max(1, int(np.ceil(np.log2(run_len + 1))) + 1)
    a = jax.lax.fori_loop(0, iters, body, (lo, hi))[0]
    # binary search converges to the largest a with A[a-1] <= B[o-a]; that
    # split satisfies both dominance conditions for the signed-<= order
    return a.astype(jnp.int32), (o - a).astype(jnp.int32), p, o


def _hbm_kernel(meta_ref, sv_hbm, pv_hbm, osv_hbm, opv_hbm,
                asv, apv, bsv, bpv, msv, mpv, sems, *, window):
    """One output tile: DMA the two 128-aligned windows, mask off-diagonal
    junk to sentinels, bitonic-merge 2*window in VMEM, write the valid
    window-128 rows at the planned output row. meta rows (SMEM, per tile):
    [a_row0, b_row0, a_lo_off, a_hi_off, b_lo_off, b_hi_off, out_row]."""
    t = pl.program_id(0)
    wrow = window // 128
    a_row0 = meta_ref[t, 0]
    b_row0 = meta_ref[t, 1]
    cpA = pltpu.make_async_copy(
        sv_hbm.at[pl.ds(a_row0, wrow)], asv, sems.at[0])
    cpB = pltpu.make_async_copy(
        sv_hbm.at[pl.ds(b_row0, wrow)], bsv, sems.at[1])
    cpPA = pltpu.make_async_copy(
        pv_hbm.at[pl.ds(a_row0, wrow)], apv, sems.at[2])
    cpPB = pltpu.make_async_copy(
        pv_hbm.at[pl.ds(b_row0, wrow)], bpv, sems.at[3])
    cpA.start(); cpB.start(); cpPA.start(); cpPB.start()
    idx = (jax.lax.broadcasted_iota(jnp.int32, (wrow, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (wrow, 128), 1))
    cpA.wait(); cpB.wait(); cpPA.wait(); cpPB.wait()

    def masked(win, lo, hi):
        w = jnp.where(idx < lo, INT_MIN, win)
        return jnp.where(idx >= hi, INT_MAX, w)

    a = masked(asv[:], meta_ref[t, 2], meta_ref[t, 3])
    b = masked(bsv[:], meta_ref[t, 4], meta_ref[t, 5])
    sv = jnp.concatenate([a, b], axis=0)
    pv = jnp.concatenate([apv[:], bpv[:]], axis=0)
    sv, pv = _merge_adjacent_runs(sv, pv, window)
    msv[:] = sv
    mpv[:] = pv
    # valid rows start after the merged junk front: front counts are
    # 128-aligned by construction of the planner (a_lo + b_lo ≡ 0 mod 128)
    f = (meta_ref[t, 2] + meta_ref[t, 4]) // 128
    orow = meta_ref[t, 6]
    vrow = (window - 128) // 128
    ow = pltpu.make_async_copy(
        msv.at[pl.ds(f, vrow)], osv_hbm.at[pl.ds(orow, vrow)], sems.at[0])
    op = pltpu.make_async_copy(
        mpv.at[pl.ds(f, vrow)], opv_hbm.at[pl.ds(orow, vrow)], sems.at[1])
    ow.start(); op.start()
    ow.wait(); op.wait()


def _hbm_kernel_db(meta_ref, sv_hbm, pv_hbm, osv_hbm, opv_hbm,
                   asv, apv, bsv, bpv, msv, mpv, isems, osems, *, window):
    """Double-buffered variant: tile t+1's four window DMAs are started
    before tile t's merge runs, and the two output staging slots let the
    write-back DMA ride behind the next tile's compute."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    wrow = window // 128
    slot = t % 2
    nslot = (t + 1) % 2

    def in_copies(tt, sl):
        a0 = meta_ref[tt, 0]
        b0 = meta_ref[tt, 1]
        return (
            pltpu.make_async_copy(
                sv_hbm.at[pl.ds(a0, wrow)], asv.at[sl], isems.at[sl, 0]),
            pltpu.make_async_copy(
                pv_hbm.at[pl.ds(a0, wrow)], apv.at[sl], isems.at[sl, 1]),
            pltpu.make_async_copy(
                sv_hbm.at[pl.ds(b0, wrow)], bsv.at[sl], isems.at[sl, 2]),
            pltpu.make_async_copy(
                pv_hbm.at[pl.ds(b0, wrow)], bpv.at[sl], isems.at[sl, 3]),
        )

    @pl.when(t == 0)
    def _():
        for c in in_copies(0, 0):
            c.start()

    @pl.when(t + 1 < nt)
    def _():
        for c in in_copies(t + 1, nslot):
            c.start()

    for c in in_copies(t, slot):
        c.wait()

    idx = (jax.lax.broadcasted_iota(jnp.int32, (wrow, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (wrow, 128), 1))

    def masked(win, lo, hi):
        w = jnp.where(idx < lo, INT_MIN, win)
        return jnp.where(idx >= hi, INT_MAX, w)

    a = masked(asv[slot], meta_ref[t, 2], meta_ref[t, 3])
    b = masked(bsv[slot], meta_ref[t, 4], meta_ref[t, 5])
    svv = jnp.concatenate([a, b], axis=0)
    pvv = jnp.concatenate([apv[slot], bpv[slot]], axis=0)
    svv, pvv = _merge_adjacent_runs(svv, pvv, window)

    vrow = (window - 128) // 128
    f = (meta_ref[t, 2] + meta_ref[t, 4]) // 128
    orow = meta_ref[t, 6]

    def out_copies(tt, sl, ff, orw):
        return (
            pltpu.make_async_copy(
                msv.at[sl].at[pl.ds(ff, vrow)],
                osv_hbm.at[pl.ds(orw, vrow)], osems.at[sl, 0]),
            pltpu.make_async_copy(
                mpv.at[sl].at[pl.ds(ff, vrow)],
                opv_hbm.at[pl.ds(orw, vrow)], osems.at[sl, 1]),
        )

    # Wait tile t-1's write-back only now — it rode behind this tile's
    # input-DMA wait and merge compute. Waiting BEFORE starting out(t) also
    # orders overlapping writes: each pair's LAST tile re-covers rows its
    # predecessor wrote as +inf junk (tile_out doesn't divide the pair), and
    # two in-flight DMAs to the same rows have no completion order. Each out
    # DMA is waited exactly once (here, or below for the final tile).
    @pl.when(t >= 1)
    def _():
        pf = (meta_ref[t - 1, 2] + meta_ref[t - 1, 4]) // 128
        po = meta_ref[t - 1, 6]
        for c in out_copies(t - 1, nslot, pf, po):
            c.wait()

    msv[slot] = svv
    mpv[slot] = pvv
    for c in out_copies(t, slot, f, orow):
        c.start()

    @pl.when(t == nt - 1)
    def _():
        for c in out_copies(t, slot, f, orow):
            c.wait()


@functools.partial(
    jax.jit, static_argnames=("run_len", "interpret", "window",
                              "double_buffer"))
def merge_level_hbm(sv, pv, run_len: int, interpret: bool = False,
                    window: int = HBM_WINDOW, double_buffer: bool = False):
    """One cascade level for runs too large to merge in VMEM: ascending runs
    of run_len -> 2*run_len. run_len >= window, n % (2*run_len) == 0.
    `window` (pow2 >= 8192) trades per-tile DMA/grid overhead (~1/window)
    against stage work (log2(2*window) stages per window-128 output rows) —
    A/B'd on device by benchmarks/merge_sort_bench.py."""
    n = sv.shape[0]
    tile_out = window - 128
    assert run_len >= window and n % (2 * run_len) == 0
    a, b, p, o = _merge_path_splits(sv, run_len, tile_out)
    pair = 2 * run_len
    # 128-align window starts; clamp so windows stay inside the run pair
    a0 = jnp.minimum(a & ~127, run_len - window)
    b0 = jnp.minimum(b & ~127, run_len - window)
    base = p * pair
    meta = jnp.stack([
        (base + a0) // 128,                     # a window start row
        (base + run_len + b0) // 128,           # b window start row
        a - a0,                                 # valid lo within A window
        jnp.minimum(a + tile_out, run_len) - a0,  # loose hi; exact below
        b - b0,
        jnp.minimum(b + tile_out, run_len) - b0,
        (base + o) // 128,                      # output row
    ], axis=1)
    # exact his: splits of the NEXT tile boundary within the same pair give
    # the true contribution ends; the last tile of a pair ends at run ends
    ntiles_pp = meta.shape[0] // (n // pair)
    a2 = a.reshape(-1, ntiles_pp)
    b2 = b.reshape(-1, ntiles_pp)
    a_hi = jnp.concatenate(
        [a2[:, 1:], jnp.full((a2.shape[0], 1), run_len, jnp.int32)], axis=1)
    b_hi = jnp.concatenate(
        [b2[:, 1:], jnp.full((b2.shape[0], 1), run_len, jnp.int32)], axis=1)
    meta = meta.at[:, 3].set(a_hi.reshape(-1) - a0)
    meta = meta.at[:, 5].set(b_hi.reshape(-1) - b0)

    wrow = window // 128
    if double_buffer:
        scratch = [
            pltpu.VMEM((2, wrow, 128), jnp.int32),      # asv slots
            pltpu.VMEM((2, wrow, 128), jnp.int32),      # apv
            pltpu.VMEM((2, wrow, 128), jnp.int32),      # bsv
            pltpu.VMEM((2, wrow, 128), jnp.int32),      # bpv
            pltpu.VMEM((2, 2 * wrow, 128), jnp.int32),  # merged sv slots
            pltpu.VMEM((2, 2 * wrow, 128), jnp.int32),  # merged pv
            pltpu.SemaphoreType.DMA((2, 4)),            # input sems
            pltpu.SemaphoreType.DMA((2, 2)),            # output sems
        ]
        kern = functools.partial(_hbm_kernel_db, window=window)
    else:
        scratch = [
            pltpu.VMEM((wrow, 128), jnp.int32),
            pltpu.VMEM((wrow, 128), jnp.int32),
            pltpu.VMEM((wrow, 128), jnp.int32),
            pltpu.VMEM((wrow, 128), jnp.int32),
            pltpu.VMEM((2 * wrow, 128), jnp.int32),
            pltpu.VMEM((2 * wrow, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ]
        kern = functools.partial(_hbm_kernel, window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(meta.shape[0],),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(meta, sv.reshape(-1, 128), pv.reshape(-1, 128))
    return out[0].reshape(-1), out[1].reshape(-1)


# ---------------------------------------------------------------------------
# full cascade + guarded public entry
# ---------------------------------------------------------------------------

def _merge_sort_cascade(sv, pv, interpret: bool = False,
                        vmem_tile: int = VMEM_TILE,
                        vmem_levels_per_call: int = 3,
                        hbm_window: int = HBM_WINDOW,
                        lane_transpose: bool = False,
                        hbm_double_buffer: bool = True):
    """Segsort base runs, then VMEM cascade calls, then HBM merge-path
    levels. n must be a power of two >= BASE_RUN."""
    n = sv.shape[0]
    sv2 = sv.reshape(-1, BASE_RUN)
    pv2 = pv.reshape(-1, BASE_RUN)
    sv2, pv2 = jax.lax.sort((sv2, pv2), dimension=1, num_keys=1,
                            is_stable=False)
    sv, pv = sv2.reshape(-1), pv2.reshape(-1)
    run = BASE_RUN
    tile = min(vmem_tile, n)
    while run < min(tile, n):
        levels = min(vmem_levels_per_call,
                     int(np.log2(tile)) - int(np.log2(run)))
        sv, pv = merge_levels_vmem(sv, pv, run, levels, tile_elems=tile,
                                   interpret=interpret,
                                   lane_transpose=lane_transpose)
        run <<= levels
    while run < n:
        sv, pv = merge_level_hbm(sv, pv, run, interpret=interpret,
                                 window=hbm_window,
                                 double_buffer=hbm_double_buffer)
        run <<= 1
    return sv, pv


def packed_sort_pairs(sv, pv):
    """1-operand alternative: sort (biased sortval << 32 | payload) packed
    uint64 (order-preserving for signed-int32 sortvals), then unpack.
    Operand count dominated sort cost in round 1 (3-op -> 2-op = 1.8x);
    whether the TPU's 64-bit compare emulation beats the second operand's
    data movement is measured by benchmarks/merge_sort_bench.py `packed`.
    Duplicate-key payload order becomes ascending-uint32 — within the
    engine's contract (per-key payload multiset, order unspecified)."""
    with jax.enable_x64(True):
        ku = (sv.astype(jnp.uint32) ^ jnp.uint32(0x80000000)).astype(
            jnp.uint64)
        pu = pv.astype(jnp.uint32).astype(jnp.uint64)
        w = jnp.sort((ku << jnp.uint64(32)) | pu)
        ko = ((w >> jnp.uint64(32)).astype(jnp.uint32)
              ^ jnp.uint32(0x80000000)).astype(jnp.int32)
        vo = w.astype(jnp.uint32).astype(jnp.int32)
    return ko, vo


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_sort_pairs(sv, pv, interpret: bool = False):
    """Sort (sv, pv) by sv ascending (signed int32), drop-in for the 2-op
    lax.sort. Falls back to lax.sort when any sortval equals a masking
    sentinel (see module docstring) or when n isn't a power-of-two multiple
    of BASE_RUN (engine shapes always are)."""
    if jax.default_backend() == "cpu":
        interpret = True  # Pallas TPU kernels only interpret on CPU
    n = sv.shape[0]
    if n < 2 * BASE_RUN or (n & (n - 1)) != 0:
        return jax.lax.sort((sv, pv), num_keys=1, is_stable=False)
    has_edge = jnp.any(sv == INT_MIN) | jnp.any(sv == INT_MAX)
    return jax.lax.cond(
        has_edge,
        lambda s, p: jax.lax.sort((s, p), num_keys=1, is_stable=False),
        lambda s, p: _merge_sort_cascade(s, p, interpret=interpret),
        sv, pv)

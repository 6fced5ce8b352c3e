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

  1. base runs:   XLA segmented sort, runs of BASE_RUN.
  2. VMEM levels: `merge_levels_vmem` — each grid tile loads a span of
                  runs and merges `levels` levels entirely in VMEM.
  3. HBM levels:  `merge_level_hbm` — runs too big for VMEM merge via
                  merge-path planning: XLA computes exact diagonal splits
                  per output tile (vectorized binary search), the kernel
                  DMAs the two 128-aligned windows, masks the off-diagonal
                  junk to +/-inf sentinels, runs one bitonic merge in
                  VMEM, and writes the valid rows back.

DIRECTION ENCODING (the round-5 fix for Mosaic's missing `rev` lowering):
a bitonic merge needs its second input run in DESCENDING order, but
reversing an array inside a Pallas TPU kernel is impossible (`rev` has no
Mosaic lowering) and rolling is ~50x slow. Instead of moving data we
complement it: the cascade maintains the invariant that a run with ODD
global index is stored as the bitwise complement `~k` of its keys, sorted
ASCENDING by the stored value — which makes the *actual* keys descending
in position, exactly what the merge needs, at the cost of an elementwise
XOR (fused, free on the VPU). Every kernel then runs only uniform-
direction compare-exchange stages:

  - base runs: odd runs' keys are complemented BEFORE the segmented sort
    (the sort itself produces the descending layout — zero extra passes);
  - VMEM levels: tiles decode to actual keys on load (per-row XOR mask),
    merge with per-output-run direction-masked comparators (one XOR per
    compare), and re-encode on store;
  - HBM levels: the merge-path planner reads the descending side through
    `~` and swaps which physical run is the ascending side per pair
    parity; the kernel complements the B window on load and never needs
    a direction flag at all (the algebra collapses — see
    `_merge_path_splits`). The final level's single pair has even index,
    so the cascade's output is plain ascending keys.

Sentinel caveat: window masking uses INT32_MIN/INT32_MAX as -inf/+inf.
A *real* key equal to a sentinel could tie with junk inside a window and
swap payloads with it (bitonic networks are not stable). The public entry
`merge_sort_pairs` therefore guards: if any sortval equals either
sentinel it falls back to `lax.sort` via `lax.cond` (both branches
compiled once; the count costs ~2 vector ops). This also covers the
complement domain, since ~INT_MIN == INT_MAX.

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
DEVICE_VMEM_TILE = 1 << 14  # compile-safe tile: S=128 rows (see cascade doc)
HBM_WINDOW = 8192        # per-side window of the HBM merge-path kernel
HBM_TILE_OUT = HBM_WINDOW - 128   # valid output per HBM tile (63 rows)
CASCADE_MAX_N = 1 << 27  # SMEM meta budget bound (see merge_sort_pairs)


# ---------------------------------------------------------------------------
# stage primitives (operate on flat row-major [S, 128] int32 value pairs)
# ---------------------------------------------------------------------------

def _cx(sv, pv, d: int, dm=None):
    """One compare-exchange stage at distance d: for every 2d-aligned group,
    min lands in the low half, max in the high half (direction flipped
    where the [S,1] mask dm is 1 — dm must be constant across each pair,
    which holds because directions are constant per output run and every
    compared pair lies inside one output run). d is a static power of two.
    Pure reshape/min/max/xor — no roll, no gather, no rev."""
    S = sv.shape[0]
    if d >= 128:
        dr = d // 128
        g = S // (2 * dr)
        a = sv.reshape(g, 2, dr, 128)
        p = pv.reshape(g, 2, dr, 128)
        lo, hi = a[:, 0], a[:, 1]
        swap = hi < lo
        if dm is not None:
            swap = swap ^ (dm.reshape(g, 2, dr, 1)[:, 0] != 0)
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
    if dm is not None:
        swap = swap ^ (dm.reshape(S, 1, 1) != 0)
    nsv = jnp.stack(
        [jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)], axis=-2)
    plo, phi = p[..., 0, :], p[..., 1, :]
    npv = jnp.stack(
        [jnp.where(swap, phi, plo), jnp.where(swap, plo, phi)], axis=-2)
    return nsv.reshape(S, 128), npv.reshape(S, 128)


def _cx_rows(sv, pv, dr: int, dmT=None):
    """Row-distance compare-exchange for arbitrary [rows, cols] tiles
    (the d >= 128 branch of _cx, generalized for transposed layouts;
    dmT is the direction mask transposed to [1, cols])."""
    rows, cols = sv.shape
    a = sv.reshape(rows // (2 * dr), 2, dr, cols)
    p = pv.reshape(rows // (2 * dr), 2, dr, cols)
    lo, hi = a[:, 0], a[:, 1]
    swap = hi < lo
    if dmT is not None:
        swap = swap ^ (dmT.reshape(1, 1, cols) != 0)
    nsv = jnp.stack(
        [jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)], axis=1)
    plo, phi = p[:, 0], p[:, 1]
    npv = jnp.stack(
        [jnp.where(swap, phi, plo), jnp.where(swap, plo, phi)], axis=1)
    return nsv.reshape(rows, cols), npv.reshape(rows, cols)


def _bitonic_merge_pairs(sv, pv, run_len: int, dm=None,
                         lane_transpose: bool = False):
    """Merge every adjacent (ascending, descending) pair of run_len-runs of
    the flat [S, 128] tile into sorted 2*run_len runs: the concatenation of
    an ascending and a descending run is bitonic, so the merge is the
    uniform compare-exchange cascade at distances run_len .. 1 — no mirror
    stage, no reversal. dm ([S,1], 0/1) flips direction per output run.

    lane_transpose: run the 7 lane-level stages (d < 128) on a transposed
    tile where they become sublane-row exchanges — one transpose each way
    per array vs 7 lane-dim reshuffles. Which wins is measured on device
    (benchmarks/merge_sort_bench.py stages); both are bit-identical."""
    d = run_len
    while d >= 128:
        sv, pv = _cx(sv, pv, d, dm)
        d //= 2
    if d == 0:
        return sv, pv
    if not lane_transpose:
        while d >= 1:
            sv, pv = _cx(sv, pv, d, dm)
            d //= 2
        return sv, pv
    svT, pvT = sv.T, pv.T              # lane-distance pairs -> row pairs
    dmT = None if dm is None else dm.reshape(1, -1)
    while d >= 1:
        svT, pvT = _cx_rows(svT, pvT, d, dmT)
        d //= 2
    return svT.T, pvT.T


# ---------------------------------------------------------------------------
# VMEM cascade: merge `levels` levels inside one grid tile
# ---------------------------------------------------------------------------

def _vmem_kernel(sv_ref, pv_ref, osv_ref, opv_ref, *, run_len, levels,
                 tile, lane_transpose):
    t = pl.program_id(0)
    S = tile // 128
    sv, pv = sv_ref[:], pv_ref[:]
    grow = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + t * S
    # stored -> actual keys: odd input runs are complement-encoded
    in_par = (grow // (run_len // 128)) & 1
    sv = sv ^ (0 - in_par)
    l = run_len
    for _ in range(levels):
        dm = (grow // ((2 * l) // 128)) & 1   # output-run parity = direction
        sv, pv = _bitonic_merge_pairs(sv, pv, l, dm=dm,
                                      lane_transpose=lane_transpose)
        l *= 2
    # actual -> stored: re-encode odd OUTPUT runs
    out_par = (grow // (l // 128)) & 1
    osv_ref[:] = sv ^ (0 - out_par)
    opv_ref[:] = pv


@functools.partial(
    jax.jit, static_argnames=("run_len", "levels", "tile_elems", "interpret",
                              "lane_transpose"))
def merge_levels_vmem(sv, pv, run_len: int, levels: int,
                      tile_elems: int = VMEM_TILE, interpret: bool = False,
                      lane_transpose: bool = False):
    """Merge complement-encoded alternating runs of run_len into runs of
    run_len << levels (same encoding), all levels fused in VMEM per grid
    tile. n % tile == 0, tile >= run<<levels, run_len >= 128; all powers
    of two. Input/output runs follow the module invariant: run r is sorted
    ascending by stored value, stored = actual keys XOR -(r & 1)."""
    n = sv.shape[0]
    tile = min(tile_elems, n)
    assert tile >= (run_len << levels) and n % tile == 0
    S = tile // 128
    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    out = pl.pallas_call(
        functools.partial(_vmem_kernel, run_len=run_len, levels=levels,
                          tile=tile, lane_transpose=lane_transpose),
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
    a + b = o over the WORKING domain of each pair — vectorized binary
    search, ~log2(run_len) gather rounds over all tiles at once.

    Encoding algebra: pair p merges runs 2p and 2p+1. Define the working
    domain w = actual ^ -(p & 1). In it, exactly one physical run ascends
    positionally (the 'A' side: run 2p for even p, run 2p+1 for odd p) and
    its STORED values equal its working values; the other run ('B')
    descends positionally and its stored values are the complement of its
    working values — for BOTH parities. The output run (index p at the
    next level) must be stored as working values directly (actual ^
    -(p & 1) twice cancels). So the planner reads A as sv[.], B as ~sv[.],
    swaps the physical bases by parity, and the kernel is parity-free.

    Returns int32 arrays [ntiles]: a, b (split at the tile's start, LOCAL
    to the run pair, in ascending-view coordinates), the pair index, the
    output offset o, and the physical A/B base offsets."""
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
    par = p & 1
    abase = p * pair + par * run_len        # working-ascending physical run
    bbase = p * pair + (1 - par) * run_len  # working-descending physical run
    lo = jnp.maximum(o - run_len, 0)
    hi = jnp.minimum(o, run_len)
    # invariant: correct a in [lo, hi]; A[a-1] <= Bv[o-a] in ascending-view
    # coords, where A[i] = sv[abase+i] and the ascending view of B is
    # Bv[i] = ~sv[bbase + run_len-1-i] (B descends physically).
    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi + 1) >> 1  # upper-bound search: largest a with f(a)
        a_prev = jnp.where(
            mid >= 1, sv[jnp.clip(abase + mid - 1, 0, n - 1)], INT_MIN)
        bj = o - mid
        b_at = jnp.where(
            bj < run_len,
            ~sv[jnp.clip(bbase + run_len - 1 - bj, 0, n - 1)], INT_MAX)
        ok = a_prev <= b_at  # A[mid-1] <= Bv[o-mid]: a can be >= mid
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
        return lo, hi
    iters = max(1, int(np.ceil(np.log2(run_len + 1))) + 1)
    a = jax.lax.fori_loop(0, iters, body, (lo, hi))[0]
    # binary search converges to the largest a with A[a-1] <= Bv[o-a]; that
    # split satisfies both dominance conditions for the signed-<= order
    return (a.astype(jnp.int32), (o - a).astype(jnp.int32), p, o,
            abase.astype(jnp.int32), bbase.astype(jnp.int32))


def _mask_windows(asv_raw, bsv_raw, meta_ref, t, window):
    """Decode + sentinel-mask the two windows: A ascends (stored==working);
    B is complement-encoded and descends positionally in working values —
    junk BEFORE its valid region is larger (mask +inf), junk after smaller
    (mask -inf), which keeps [A | B] bitonic."""
    wrow = window // 128
    idx = (jax.lax.broadcasted_iota(jnp.int32, (wrow, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (wrow, 128), 1))
    a = jnp.where(idx < meta_ref[2, t], INT_MIN, asv_raw)
    a = jnp.where(idx >= meta_ref[3, t], INT_MAX, a)
    bw = bsv_raw ^ -1                      # stored -> working
    b = jnp.where(idx < meta_ref[4, t], INT_MAX, bw)
    b = jnp.where(idx >= meta_ref[5, t], INT_MIN, b)
    return a, b


def _hbm_kernel(meta_ref, sv_hbm, pv_hbm, osv_hbm, opv_hbm,
                asv, apv, bsv, bpv, msv, mpv, sems, *, window,
                lane_transpose=False):
    """One output tile: DMA the two 128-aligned windows, decode + mask
    off-diagonal junk to sentinels, bitonic-merge 2*window in VMEM, write
    the valid window-128 rows at the planned output row. meta rows (SMEM,
    per tile): [a_row0, b_row0, a_lo, a_hi, b_wlo, b_whi, out_row]."""
    t = pl.program_id(0)
    wrow = window // 128
    a_row0 = meta_ref[0, t]
    b_row0 = meta_ref[1, t]
    cpA = pltpu.make_async_copy(
        sv_hbm.at[pl.ds(a_row0, wrow)], asv, sems.at[0])
    cpB = pltpu.make_async_copy(
        sv_hbm.at[pl.ds(b_row0, wrow)], bsv, sems.at[1])
    cpPA = pltpu.make_async_copy(
        pv_hbm.at[pl.ds(a_row0, wrow)], apv, sems.at[2])
    cpPB = pltpu.make_async_copy(
        pv_hbm.at[pl.ds(b_row0, wrow)], bpv, sems.at[3])
    cpA.start(); cpB.start(); cpPA.start(); cpPB.start()
    cpA.wait(); cpB.wait(); cpPA.wait(); cpPB.wait()

    a, b = _mask_windows(asv[:], bsv[:], meta_ref, t, window)
    sv = jnp.concatenate([a, b], axis=0)
    pv = jnp.concatenate([apv[:], bpv[:]], axis=0)
    sv, pv = _bitonic_merge_pairs(sv, pv, window,
                                  lane_transpose=lane_transpose)
    msv[:] = sv
    mpv[:] = pv
    # valid rows start after the merged junk front: front counts are
    # 128-aligned by construction of the planner (a_lo + (window - b_whi)
    # = (a - a0) + (b - b0) ≡ 0 mod 128)
    f = (meta_ref[2, t] + window - meta_ref[5, t]) // 128
    orow = meta_ref[6, t]
    vrow = (window - 128) // 128
    ow = pltpu.make_async_copy(
        msv.at[pl.ds(f, vrow)], osv_hbm.at[pl.ds(orow, vrow)], sems.at[0])
    op = pltpu.make_async_copy(
        mpv.at[pl.ds(f, vrow)], opv_hbm.at[pl.ds(orow, vrow)], sems.at[1])
    ow.start(); op.start()
    ow.wait(); op.wait()


def _hbm_kernel_db(meta_ref, sv_hbm, pv_hbm, osv_hbm, opv_hbm,
                   asv, apv, bsv, bpv, msv, mpv, isems, osems, *, window,
                   lane_transpose=False):
    """Double-buffered variant: tile t+1's four window DMAs are started
    before tile t's merge runs, and the two output staging slots let the
    write-back DMA ride behind the next tile's compute."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    wrow = window // 128
    slot = t % 2
    nslot = (t + 1) % 2

    def in_copies(tt, sl):
        a0 = meta_ref[0, tt]
        b0 = meta_ref[1, tt]
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

    a, b = _mask_windows(asv[slot], bsv[slot], meta_ref, t, window)
    svv = jnp.concatenate([a, b], axis=0)
    pvv = jnp.concatenate([apv[slot], bpv[slot]], axis=0)
    svv, pvv = _bitonic_merge_pairs(svv, pvv, window,
                                    lane_transpose=lane_transpose)

    vrow = (window - 128) // 128
    f = (meta_ref[2, t] + window - meta_ref[5, t]) // 128
    orow = meta_ref[6, t]

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
        pf = (meta_ref[2, t - 1] + window - meta_ref[5, t - 1]) // 128
        po = meta_ref[6, t - 1]
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
                              "double_buffer", "lane_transpose"))
def merge_level_hbm(sv, pv, run_len: int, interpret: bool = False,
                    window: int = HBM_WINDOW, double_buffer: bool = False,
                    lane_transpose: bool = True):
    """One cascade level for runs too large to merge in VMEM: complement-
    encoded alternating runs of run_len -> runs of 2*run_len (same
    encoding; output run index = pair index). run_len >= window,
    n % (2*run_len) == 0. `window` (pow2 >= 8192) trades per-tile DMA/grid
    overhead (~1/window) against stage work (log2(2*window) stages per
    window-128 output rows) — A/B'd on device by
    benchmarks/merge_sort_bench.py. lane_transpose defaults True: the
    untransposed lane-stage reshape crashes the Mosaic compiler on device
    (see _merge_sort_cascade's DEVICE GEOMETRY note); False is only for
    compiler bisects and interpret-mode A/Bs."""
    n = sv.shape[0]
    tile_out = window - 128
    assert run_len >= window and n % (2 * run_len) == 0
    a, b, p, o, abase, bbase = _merge_path_splits(sv, run_len, tile_out)
    pair = 2 * run_len
    # 128-align window starts; clamp so windows stay inside the runs.
    # The B window is addressed in ascending-view coords [b0, b0+window)
    # which is the PHYSICAL row span [run_len-b0-window, run_len-b0) of the
    # descending side — contiguous, so a single DMA covers it.
    a0 = jnp.minimum(a & ~127, run_len - window)
    b0 = jnp.minimum(b & ~127, run_len - window)
    # meta layout is [7, ntiles], NOT [ntiles, 7]: SMEM pads the LAST dim
    # to 128 lanes, so a [ntiles, 7] prefetch operand would blow up 18x
    # (measured on device at 2^27: 10 MB request vs the 1 MB SMEM budget);
    # row-per-field keeps it at 28 B/tile.
    meta = jnp.stack([
        (abase + a0) // 128,                      # 0: A window start row
        (bbase + run_len - b0 - window) // 128,   # 1: B window start (phys)
        a - a0,                                   # 2: valid lo within A win
        jnp.minimum(a + tile_out, run_len) - a0,  # 3: loose hi; exact below
        jnp.zeros_like(a),                        # 4: b_wlo placeholder
        window - (b - b0),                        # 5: b_whi (desc coords)
        (p * pair + o) // 128,                    # 6: output row
    ], axis=0)
    # exact his: splits of the NEXT tile boundary within the same pair give
    # the true contribution ends; the last tile of a pair ends at run ends
    ntiles_pp = meta.shape[1] // (n // pair)
    a2 = a.reshape(-1, ntiles_pp)
    b2 = b.reshape(-1, ntiles_pp)
    a_hi = jnp.concatenate(
        [a2[:, 1:], jnp.full((a2.shape[0], 1), run_len, jnp.int32)], axis=1)
    b_hi = jnp.concatenate(
        [b2[:, 1:], jnp.full((b2.shape[0], 1), run_len, jnp.int32)], axis=1)
    meta = meta.at[3, :].set(a_hi.reshape(-1) - a0)
    meta = meta.at[4, :].set(window - (b_hi.reshape(-1) - b0))

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
        kern = functools.partial(_hbm_kernel_db, window=window,
                                 lane_transpose=lane_transpose)
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
        kern = functools.partial(_hbm_kernel, window=window,
                                 lane_transpose=lane_transpose)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(meta.shape[1],),
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

def encode_base_runs(sv, pv):
    """XLA side: sort BASE_RUN segments into the complement-encoded
    alternating layout — odd runs' keys are complemented BEFORE the sort,
    so the sort itself produces the descending-by-actual-key layout with
    zero extra memory passes."""
    rows = sv.shape[0] // BASE_RUN
    par = (jnp.arange(rows, dtype=jnp.int32) & 1)[:, None]
    sv2 = sv.reshape(rows, BASE_RUN) ^ (0 - par)
    pv2 = pv.reshape(rows, BASE_RUN)
    sv2, pv2 = jax.lax.sort((sv2, pv2), dimension=1, num_keys=1,
                            is_stable=False)
    return sv2.reshape(-1), pv2.reshape(-1)


def _merge_sort_cascade(sv, pv, interpret: bool = False,
                        vmem_tile: int = DEVICE_VMEM_TILE,
                        vmem_levels_per_call: int = 2,
                        hbm_window: int = HBM_WINDOW,
                        lane_transpose: bool = True,
                        hbm_double_buffer: bool = True):
    """Segsort base runs (complement-encoded), then VMEM cascade calls,
    then HBM merge-path levels. n must be a power of two >= 2*BASE_RUN.
    The final level's single output run has even index, so the result is
    plain ascending keys.

    DEVICE GEOMETRY (round-5 Mosaic bisect, benchmarks/mosaic_bisect.py):
    the lane-distance (d < 128) compare-exchange reshape kills the Mosaic
    compiler outright (tpu_compile_helper exit 1 at every d in {1,16,64}),
    so on device the lane stages MUST run in the transposed formulation
    (lane_transpose=True — compiles clean). Transposed-stage compile time
    then explodes with tile height: S=128 tiles (tile 2^14) compile in
    ~47 s, S=512 (tile 2^16) times out >5 min. Hence the defaults: 2^14
    VMEM tiles (one 2-level call from the 4096 base runs) and everything
    above 2^14 via the HBM merge-path kernel, whose in-VMEM merge is
    2*window = 2^14 elements = the same compile-safe S=128 shape."""
    n = sv.shape[0]
    sv, pv = encode_base_runs(sv, pv)
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
                                 double_buffer=hbm_double_buffer,
                                 lane_transpose=lane_transpose)
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
    sentinel (see module docstring), when n isn't a power-of-two multiple
    of BASE_RUN (engine shapes always are), or when n > CASCADE_MAX_N
    (the HBM planner's per-level [7, ntiles] scalar-prefetch meta must fit
    the 1 MB SMEM budget; at the first HBM level ntiles ~ 5*n/2^15, which
    crosses ~900 KB just above 2^27)."""
    if jax.default_backend() == "cpu":
        interpret = True  # Pallas TPU kernels only interpret on CPU
    n = sv.shape[0]
    if (n < 2 * BASE_RUN or (n & (n - 1)) != 0
            or (n > CASCADE_MAX_N and not interpret)):
        return jax.lax.sort((sv, pv), num_keys=1, is_stable=False)
    has_edge = jnp.any(sv == INT_MIN) | jnp.any(sv == INT_MAX)
    return jax.lax.cond(
        has_edge,
        lambda s, p: jax.lax.sort((s, p), num_keys=1, is_stable=False),
        lambda s, p: _merge_sort_cascade(s, p, interpret=interpret),
        sv, pv)

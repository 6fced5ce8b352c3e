"""Pallas TPU kernels for the banded-probe inner compare.

Computes, over one gathered chunk,

    acc = SUM_{i,l,j} [sk[i,l] == rk[i,j]] * sp[i,l] * rp[i,j]   (mod 2^32)

i.e. the fused compare x multiply x reduce at the heart of the banded
sort-merge probe (ops/band_join.py). The XLA formulation of this broadcast
compare runs ~13x below VPU speed (it fuses the [CH, 128, W*128] equality
tensor poorly); these kernels loop over the 128 S lanes with fully-2D
compares — Mosaic vectorizes 2D broadcasts completely.

Layout: inputs arrive in natural [CH, *] layout and are TRANSPOSED IN VMEM
(Mosaic lowers transposes natively; doing it in-kernel saves four XLA
transpose round-trips through HBM per chunk) — the chunk dimension CH rides
the 128-lane axis and the S-lane / window axes ride sublanes. Extracting "S
column l" is then a dynamic SUBLANE slice (cheap vector op); the [WB, CH]
compare broadcasts a [1, CH] row across sublanes. Three designs that do NOT
work on the remote Mosaic compiler: python-unrolled lane loops (~10 min
compiles), dynamic lane indexing (not lowerable), dynamic pltpu.roll column
extraction (lowered painfully slowly).

All arithmetic is int32: Mosaic has no unsigned reductions, and int32
two's-complement wraparound is bit-identical to uint32 mod 2^32 (the
reference's aggregate semantics, src/join-primitives.cu:1052-1092).

Replaces the reference's shared-memory hash-table walk as the per-pair
match engine (join_partitioned_aggregate, src/join-primitives.cu:1052-1087).

Caller contract: invalid R rows (beyond a window) must carry rp == 0 and a
sentinel key that matches nothing real.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compare_sum_kernel(sk_ref, sp_ref, rk_ref, rp_ref, out_ref,
                        skt_s, spt_s, *, lanes):
    # transpose in VMEM (Mosaic lowers this natively) — keeping the HBM-side
    # arrays untransposed saves XLA transpose round-trips per chunk. The
    # transposed S arrays land in scratch refs because dynamic sublane
    # slicing is only lowerable on refs, not values.
    skt_s[:] = sk_ref[:].T        # [lanes, CH]
    spt_s[:] = sp_ref[:].T
    rkt = rk_ref[:].T             # [WB, CH]
    rpt = rp_ref[:].T

    def body(l, acc):
        skc = skt_s[pl.ds(l, 1), :]               # [1, CH] dyn sublane slice
        spc = spt_s[pl.ds(l, 1), :]
        eq = skc == rkt                           # [WB, CH] 2D broadcast
        t = jnp.sum(jnp.where(eq, rpt, 0), axis=0, keepdims=True)  # [1, CH]
        return acc + t * spc

    acc = jax.lax.fori_loop(
        0, lanes, body, jnp.zeros((1, rkt.shape[1]), jnp.int32)
    )
    out_ref[:] = jnp.sum(acc).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_compare_sum(sk, sp, rk, rp, interpret: bool = False):
    """SUM over (i, l, j) of [sk==rk]*sp*rp for one chunk.

    sk/sp: [CH, 128] int32; rk/rp: [CH, WB] int32 (WB = window_blocks*128).
    Returns an int32 scalar (wraparound; bit-identical to uint32 mod 2^32).
    """
    ch, lanes = sk.shape
    out = pl.pallas_call(
        functools.partial(_compare_sum_kernel, lanes=lanes),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((lanes, ch), jnp.int32),
            pltpu.VMEM((lanes, ch), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(sk, sp, rk, rp)
    return out[0, 0]


def _compare_per_s_kernel(sk_ref, rk_ref, rp_ref, ht_ref, tt_ref, skt_s,
                          *, lanes):
    """Per-S-element match count h and matched-R-payload sum t (computed in
    transposed layout; outputs written row-by-row with dynamic sublane
    stores and transposed back by the caller)."""
    skt_s[:] = sk_ref[:].T
    rkt = rk_ref[:].T
    rpt = rp_ref[:].T

    def body(l, _):
        skc = skt_s[pl.ds(l, 1), :]
        eq = skc == rkt
        ht_ref[pl.ds(l, 1), :] = jnp.sum(
            eq.astype(jnp.int32), axis=0, keepdims=True)
        tt_ref[pl.ds(l, 1), :] = jnp.sum(
            jnp.where(eq, rpt, 0), axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, lanes, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_compare_per_s(sk, rk, rp, interpret: bool = False):
    """Per-S-element (match_count, matched_rp_sum), both [CH, 128] int32.

    Invalid R rows must carry rp == 0 AND keys that cannot match (the caller
    masks keys to the R-pad sentinel) so h stays exact."""
    ch, lanes = sk.shape
    ht, tt = pl.pallas_call(
        functools.partial(_compare_per_s_kernel, lanes=lanes),
        out_shape=(
            jax.ShapeDtypeStruct((lanes, ch), jnp.int32),
            jax.ShapeDtypeStruct((lanes, ch), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=[pltpu.VMEM((lanes, ch), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(sk, rk, rp)
    return ht.T, tt.T


def _compare_first_kernel(sk_ref, rk_ref, gx_ref, ht_ref, ft_ref, skt_s,
                          *, lanes):
    """Per-S-element match count h and FIRST matching global R index fm
    (INT32_MAX when no match). Matches of one S element are contiguous in
    the sorted R order, so (fm, h) fully describes its match set — the
    foundation of banded materialization."""
    skt_s[:] = sk_ref[:].T
    rkt = rk_ref[:].T
    gxt = gx_ref[:].T
    big = jnp.int32(0x7FFFFFFF)

    def body(l, _):
        skc = skt_s[pl.ds(l, 1), :]
        eq = skc == rkt
        ht_ref[pl.ds(l, 1), :] = jnp.sum(
            eq.astype(jnp.int32), axis=0, keepdims=True)
        ft_ref[pl.ds(l, 1), :] = jnp.min(
            jnp.where(eq, gxt, big), axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, lanes, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_compare_first(sk, rk, gidx, interpret: bool = False):
    """Per-S-element (match_count, first_global_R_index), [CH, 128] int32.

    gidx carries the global sorted-R row index of every window column;
    invalid window rows must carry keys that cannot match."""
    ch, lanes = sk.shape
    ht, ft = pl.pallas_call(
        functools.partial(_compare_first_kernel, lanes=lanes),
        out_shape=(
            jax.ShapeDtypeStruct((lanes, ch), jnp.int32),
            jax.ShapeDtypeStruct((lanes, ch), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=[pltpu.VMEM((lanes, ch), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(sk, rk, gidx)
    return ht.T, ft.T


def _interval_select_kernel(pos_ref, lo_ref, hi_ref, p1_ref, p2_ref, p3_ref,
                            o1_ref, o2_ref, o3_ref, post_s, *, lanes):
    """Per-slot interval ownership select: for each slot value pos[i,l],
    find the window column j with lo[i,j] <= pos < hi[i,j] (intervals are
    disjoint by construction) and emit that column's three payloads.
    Same transposed-layout structure as _compare_per_s_kernel."""
    post_s[:] = pos_ref[:].T          # [lanes, CH]
    lot = lo_ref[:].T                 # [WB, CH]
    hit = hi_ref[:].T
    p1t = p1_ref[:].T
    p2t = p2_ref[:].T
    p3t = p3_ref[:].T

    def body(l, _):
        pc = post_s[pl.ds(l, 1), :]               # [1, CH]
        inb = (lot <= pc) & (pc < hit)            # [WB, CH]
        o1_ref[pl.ds(l, 1), :] = jnp.sum(
            jnp.where(inb, p1t, 0), axis=0, keepdims=True)
        o2_ref[pl.ds(l, 1), :] = jnp.sum(
            jnp.where(inb, p2t, 0), axis=0, keepdims=True)
        o3_ref[pl.ds(l, 1), :] = jnp.sum(
            jnp.where(inb, p3t, 0), axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, lanes, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_interval_select(pos, lo, hi, pay1, pay2, pay3,
                           interpret: bool = False):
    """For each slot (i, l): the payload triple of the window column whose
    [lo, hi) interval contains pos[i, l] (0s when none). All [CH, 128] /
    [CH, WB] int32. Intervals within a row must be disjoint."""
    ch, lanes = pos.shape
    outs = pl.pallas_call(
        functools.partial(_interval_select_kernel, lanes=lanes),
        out_shape=(jax.ShapeDtypeStruct((lanes, ch), jnp.int32),) * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        scratch_shapes=[pltpu.VMEM((lanes, ch), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(pos, lo, hi, pay1, pay2, pay3)
    return outs[0].T, outs[1].T, outs[2].T

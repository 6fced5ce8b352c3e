"""Bisect the Mosaic compiler crash in the merge-cascade kernels.

Round-5 smoke gate: merge_sort_pairs (full cascade) and merge_level_hbm
(both buffering variants) die with `MosaicError: INTERNAL ... HTTP 500:
tpu_compile_helper subprocess exit code 1` — a compiler-subprocess crash
with no diagnostic. Meanwhile the plain compare-exchange stage kernel
(merge_sort_bench.stage_reps) compiled AND ran at 7273 Gelem-stage/s,
so the VPU stage formulation itself is fine.

This script compiles (never runs) a ladder of minimal kernels, from the
known-good stage kernel up to the full HBM merge kernel, each adding ONE
construct, and prints one JSON line per probe. The first failing probe
names the construct that kills the compiler.

Usage: python benchmarks/mosaic_bisect.py [probe ...]
(no args = all probes in order)
"""

import functools
import json
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icde2019_gpu_join_tpu.ops import merge_pallas as mp


def probe(name, fn):
    try:
        fn()
        print(json.dumps({"probe": name, "ok": True}))
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = " ".join(str(e).split())[:220]
        print(json.dumps({"probe": name, "ok": False, "error": msg}))
        return False


def _compile(jitted, *args):
    jitted.lower(*args).compile()


# ---------------------------------------------------------------------------
# probes, simplest first
# ---------------------------------------------------------------------------

N = 1 << 16
SV = jnp.zeros(N, jnp.int32)
PV = jnp.zeros(N, jnp.int32)


def p_vmem():
    f = functools.partial(mp.merge_levels_vmem, run_len=4096, levels=2,
                          tile_elems=N)
    _compile(jax.jit(lambda a, b: f(a, b)), SV, PV)


def p_vmem_lt():
    f = functools.partial(mp.merge_levels_vmem, run_len=4096, levels=2,
                          tile_elems=N, lane_transpose=True)
    _compile(jax.jit(lambda a, b: f(a, b)), SV, PV)


def p_hbm():
    sv = jnp.zeros(1 << 14, jnp.int32)
    f = functools.partial(mp.merge_level_hbm, run_len=8192)
    _compile(jax.jit(lambda a, b: f(a, b)), sv, sv)


def p_hbm_db():
    sv = jnp.zeros(1 << 14, jnp.int32)
    f = functools.partial(mp.merge_level_hbm, run_len=8192,
                          double_buffer=True)
    _compile(jax.jit(lambda a, b: f(a, b)), sv, sv)


# -- minimal construct probes -----------------------------------------------

WROW = 64  # window rows


def _mk_pallas(kern, nscalar, nrows, scratch):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nscalar,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def p_min_dma():
    """PrefetchScalarGridSpec + meta-indexed dynamic-slice DMA in and out,
    single DMA semaphore array — the _hbm_kernel skeleton, no compute."""
    nrows = 4 * WROW

    def kern(meta_ref, x_hbm, o_hbm, buf, sems):
        t = pl.program_id(0)
        r0 = meta_ref[t, 0]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, WROW)], buf, sems.at[0])
        cp.start()
        cp.wait()
        ow = pltpu.make_async_copy(
            buf, o_hbm.at[pl.ds(r0, WROW)], sems.at[1])
        ow.start()
        ow.wait()

    meta = jnp.zeros((2, 2), jnp.int32)
    x = jnp.zeros((nrows, 128), jnp.int32)
    call = _mk_pallas(kern, 1, nrows,
                      [pltpu.VMEM((WROW, 128), jnp.int32),
                       pltpu.SemaphoreType.DMA((2,))])
    _compile(jax.jit(lambda m, a: call(m, a)), meta, x)


def p_min_dma_compute():
    """p_min_dma + the real masking + bitonic merge between DMAs."""
    nrows = 4 * WROW
    window = WROW * 128

    def kern(meta_ref, x_hbm, o_hbm, abuf, bbuf, mbuf, sems):
        t = pl.program_id(0)
        r0 = meta_ref[t, 0]
        cpa = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, WROW)], abuf, sems.at[0])
        cpb = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0 + WROW, WROW)], bbuf, sems.at[1])
        cpa.start(); cpb.start(); cpa.wait(); cpb.wait()
        a, b = mp._mask_windows(abuf[:], bbuf[:], meta_ref, t, window)
        sv = jnp.concatenate([a, b], axis=0)
        pv = jnp.concatenate([abuf[:], bbuf[:]], axis=0)
        sv, pv = mp._bitonic_merge_pairs(sv, pv, window)
        mbuf[:] = sv + pv
        ow = pltpu.make_async_copy(
            mbuf.at[pl.ds(0, WROW)], o_hbm.at[pl.ds(r0, WROW)], sems.at[0])
        ow.start(); ow.wait()

    meta = jnp.zeros((2, 7), jnp.int32)
    x = jnp.zeros((nrows, 128), jnp.int32)
    call = _mk_pallas(kern, 1, nrows,
                      [pltpu.VMEM((WROW, 128), jnp.int32),
                       pltpu.VMEM((WROW, 128), jnp.int32),
                       pltpu.VMEM((2 * WROW, 128), jnp.int32),
                       pltpu.SemaphoreType.DMA((2,))])
    _compile(jax.jit(lambda m, a: call(m, a)), meta, x)


def p_concat_merge():
    """Pure-VMEM kernel: concatenate two blocks + full bitonic merge —
    the compute body alone, standard BlockSpec pipeline, no manual DMA."""
    S = 2 * WROW

    def kern(a_ref, b_ref, o_ref):
        sv = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)
        pv = jnp.concatenate([b_ref[:], a_ref[:]], axis=0)
        sv, pv = mp._bitonic_merge_pairs(sv, pv, S * 128 // 2)
        o_ref[:] = sv + pv

    blk = pl.BlockSpec((WROW, 128), lambda t: (t, 0))
    x = jnp.zeros((2 * WROW, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(2,), in_specs=[blk, blk],
        out_specs=pl.BlockSpec((2 * WROW, 128), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((4 * WROW, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a, b: call(a, b)), x, x)


def p_vmem_one_level():
    """merge_levels_vmem with a single level (isolates the direction-mask
    iota arithmetic from level stacking)."""
    f = functools.partial(mp.merge_levels_vmem, run_len=4096, levels=1,
                          tile_elems=1 << 13)
    sv = jnp.zeros(1 << 14, jnp.int32)
    _compile(jax.jit(lambda a, b: f(a, b)), sv, sv)


def _stage_probe(d):
    """One _cx stage at distance d, standard BlockSpec, no concat/mask."""
    S = 2 * WROW

    def kern(a_ref, b_ref, o_ref):
        sv, pv = mp._cx(a_ref[:], b_ref[:], d)
        o_ref[:] = sv + pv

    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    x = jnp.zeros((S, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(1,), in_specs=[blk, blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a, b: call(a, b)), x, x)


def p_concat_only():
    """jnp.concatenate of two VMEM blocks, nothing else."""
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)

    blk = pl.BlockSpec((WROW, 128), lambda t: (t, 0))
    x = jnp.zeros((WROW, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(1,), in_specs=[blk, blk],
        out_specs=pl.BlockSpec((2 * WROW, 128), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((2 * WROW, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a, b: call(a, b)), x, x)


def p_sublane_ladder():
    """Merge ladder restricted to sublane distances (d >= 128), no concat."""
    S = 2 * WROW

    def kern(a_ref, b_ref, o_ref):
        sv, pv = a_ref[:], b_ref[:]
        d = S * 128 // 2
        while d >= 128:
            sv, pv = mp._cx(sv, pv, d)
            d //= 2
        o_ref[:] = sv + pv

    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    x = jnp.zeros((S, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(1,), in_specs=[blk, blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a, b: call(a, b)), x, x)


def p_dirmask_stage():
    """One direction-masked sublane stage (iota-derived dm), d >= 128."""
    S = 2 * WROW

    def kern(a_ref, b_ref, o_ref):
        grow = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        dm = grow & 1
        sv, pv = mp._cx(a_ref[:], b_ref[:], 128, dm)
        o_ref[:] = sv + pv

    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    x = jnp.zeros((S, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(1,), in_specs=[blk, blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a, b: call(a, b)), x, x)


def p_transpose_only():
    """Plain [S,128] -> [128,S] transpose round-trip in VMEM."""
    S = 2 * WROW

    def kern(a_ref, o_ref):
        o_ref[:] = a_ref[:].T.T + 1

    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    x = jnp.zeros((S, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(1,), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a: call(a)), x)


def p_lane_ladder_T():
    """The 7 lane stages as row stages on a transposed tile (_cx_rows)."""
    S = 2 * WROW

    def kern(a_ref, b_ref, o_ref):
        svT, pvT = a_ref[:].T, b_ref[:].T
        d = 64
        while d >= 1:
            svT, pvT = mp._cx_rows(svT, pvT, d)
            d //= 2
        o_ref[:] = svT.T + pvT.T

    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    x = jnp.zeros((S, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(1,), in_specs=[blk, blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a, b: call(a, b)), x, x)


def p_full_merge_T():
    """Full bitonic merge with lane stages transposed (the fix candidate)."""
    S = 2 * WROW

    def kern(a_ref, b_ref, o_ref):
        sv = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)
        pv = jnp.concatenate([b_ref[:], a_ref[:]], axis=0)
        sv, pv = mp._bitonic_merge_pairs(sv, pv, S * 128,
                                         lane_transpose=True)
        o_ref[:] = sv[:S] + pv[S:]

    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    x = jnp.zeros((S, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(1,), in_specs=[blk, blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a, b: call(a, b)), x, x)


def p_merge_T_dm():
    """full_merge_T + a direction mask (the dmT comparator XOR)."""
    S = 2 * WROW

    def kern(a_ref, b_ref, o_ref):
        grow = jax.lax.broadcasted_iota(jnp.int32, (2 * S, 1), 0)
        dm = grow & 1
        sv = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)
        pv = jnp.concatenate([b_ref[:], a_ref[:]], axis=0)
        sv, pv = mp._bitonic_merge_pairs(sv, pv, S * 128, dm=dm,
                                         lane_transpose=True)
        o_ref[:] = sv[:S] + pv[S:]

    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    x = jnp.zeros((S, 128), jnp.int32)
    call = pl.pallas_call(
        kern, grid=(1,), in_specs=[blk, blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
    )
    _compile(jax.jit(lambda a, b: call(a, b)), x, x)


def p_vmem_lt_1():
    """merge_levels_vmem lane_transpose, ONE level, small tile."""
    f = functools.partial(mp.merge_levels_vmem, run_len=4096, levels=1,
                          tile_elems=1 << 13, lane_transpose=True)
    sv = jnp.zeros(1 << 14, jnp.int32)
    _compile(jax.jit(lambda a, b: f(a, b)), sv, sv)


def p_vmem_lt_param():
    """merge_levels_vmem lane_transpose with geometry from env (compile-time
    scaling probe): BISECT_RUN, BISECT_LEVELS, BISECT_TILE (log2)."""
    import time
    run = 1 << int(os.environ.get("BISECT_RUN", "12"))
    levels = int(os.environ.get("BISECT_LEVELS", "1"))
    tile = 1 << int(os.environ.get("BISECT_TILE", "14"))
    n = max(tile, run << levels)
    f = functools.partial(mp.merge_levels_vmem, run_len=run, levels=levels,
                          tile_elems=tile, lane_transpose=True)
    sv = jnp.zeros(n, jnp.int32)
    t0 = time.perf_counter()
    _compile(jax.jit(lambda a, b: f(a, b)), sv, sv)
    print(json.dumps({"compile_s": round(time.perf_counter() - t0, 1),
                      "run": run, "levels": levels, "tile": tile}))


PROBES = [
    ("transpose_only", p_transpose_only),
    ("merge_T_dm", p_merge_T_dm),
    ("vmem_lt_1", p_vmem_lt_1),
    ("vmem_lt_param", p_vmem_lt_param),
    ("lane_ladder_T", p_lane_ladder_T),
    ("full_merge_T", p_full_merge_T),
    ("concat_only", p_concat_only),
    ("lane_64", lambda: _stage_probe(64)),
    ("lane_16", lambda: _stage_probe(16)),
    ("lane_1", lambda: _stage_probe(1)),
    ("sublane_ladder", p_sublane_ladder),
    ("dirmask_stage", p_dirmask_stage),
    ("concat_merge", p_concat_merge),
    ("vmem_one_level", p_vmem_one_level),
    ("vmem", p_vmem),
    # vmem_lt (levels=2, tile 2^16) hangs the compiler >10 min — run it
    # explicitly by name if ever needed; see vmem_lt_param for the
    # compile-time scaling data (S=128 ok at ~47 s, S=512 times out).
    ("min_dma", p_min_dma),
    ("min_dma_compute", p_min_dma_compute),
    ("hbm", p_hbm),
    ("hbm_db", p_hbm_db),
]


def main():
    want = set(sys.argv[1:])
    for name, fn in PROBES:
        if want and name not in want:
            continue
        probe(name, fn)


if __name__ == "__main__":
    main()

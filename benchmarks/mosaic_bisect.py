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


PROBES = [
    ("concat_merge", p_concat_merge),
    ("vmem_one_level", p_vmem_one_level),
    ("vmem", p_vmem),
    ("vmem_lt", p_vmem_lt),
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

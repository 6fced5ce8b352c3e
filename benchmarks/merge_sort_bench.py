"""Device measurements for the merge-tree sort question (round-3 task 1).

Three measurements, cheapest-decisive first:

  stages : per-stage throughput (Gelem-stage/s) of the reshape-formulated
           compare-exchange at sublane and lane distances. The whole
           cascade-vs-lax.sort question reduces to this one number: the
           cascade runs ~330 effective stages vs the flat sort's ~378, so
           it wins iff our Pallas stage rate beats XLA's sort codegen
           (~134 Gelem-stage/s measured at 2^27: 378 stages / 378 ms).
  packed : 1-operand lax.sort of (key<<32 | payload) packed int64 vs the
           engine's 2-operand int32 sort (operand count dominates sort
           cost: 3-op -> 2-op measured 1.8x in round 1).
  full   : merge_sort_pairs end-to-end vs lax.sort at the same size.

Usage: python benchmarks/merge_sort_bench.py [stages|packed|full|all] [log2n]
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icde2019_gpu_join_tpu.ops import merge_pallas as mp

REPS = 24


def _sync(r):
    """Force execution on the remote axon backend: block_until_ready is NOT
    a reliable sync there (round-5 capture: 0.06 ms for a 134 MB kernel —
    physically impossible); pulling one scalar to the host is. See
    sortgeom_bench.py's methodology notes."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.asarray(leaf).ravel()[0])


_RTT = None


def _rtt():
    """Tunnel round-trip of one scalar pull (subtracted from measurements)."""
    global _RTT
    if _RTT is None:
        x = jnp.zeros((8, 128), jnp.int32)
        f = jax.jit(lambda a: a + 1)
        _sync(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(f(x))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def timeit(fn, *args, reps=5):
    _sync(fn(*args))  # compile + warm
    rtt = _rtt()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9)


def _stage_kernel(sv_ref, pv_ref, osv_ref, opv_ref, *, d, reps):
    sv, pv = sv_ref[:], pv_ref[:]
    for _ in range(reps):
        sv, pv = mp._cx(sv, pv, d)
    osv_ref[:] = sv
    opv_ref[:] = pv


@functools.partial(jax.jit, static_argnames=("d", "reps", "tile"))
def stage_reps(sv, pv, d: int, reps: int, tile: int):
    n = sv.shape[0]
    S = tile // 128
    blk = pl.BlockSpec((S, 128), lambda t: (t, 0))
    return pl.pallas_call(
        functools.partial(_stage_kernel, d=d, reps=reps),
        grid=(n // tile,),
        in_specs=[blk, blk],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )(sv.reshape(-1, 128), pv.reshape(-1, 128))


def bench_stages(lg):
    n = 1 << lg
    rng = np.random.RandomState(0)
    sv = jnp.asarray(rng.randint(-2**31, 2**31, n).astype(np.int64), jnp.int32)
    pv = jnp.asarray(rng.randint(-2**31, 2**31, n).astype(np.int64), jnp.int32)
    out = {"bench": "stages", "n": n, "reps": REPS}
    for name, d in [("sublane_big", 1 << 17), ("sublane_128", 128),
                    ("lane_16", 16), ("lane_1", 1)]:
        if 2 * d > n:
            continue
        # tile capped at 2^18 elems = 1 MB/buffer: the lane-distance stages'
        # odd reshapes need scratch and OOMed VMEM at 2^19 (round-5 capture)
        tile = min(max(1 << 18, 2 * d), n)
        try:
            t = timeit(stage_reps, sv, pv, d, REPS, tile)
        except Exception as e:  # noqa: BLE001 — capture, keep measuring
            print(json.dumps({"stage": name, "d": d,
                              "error": " ".join(str(e).split())[:160]}))
            continue
        rate = n * REPS / t / 1e9
        out[f"{name}_Gelem_stage_s"] = round(rate, 1)
        print(json.dumps({"stage": name, "d": d, "ms": round(t * 1e3, 2),
                          "Gelem_stage_s": round(rate, 1)}))
    # one full VMEM merge level at run=tile/2, both lane-stage formulations
    tile = min(1 << 18, n)
    for lt in (False, True):
        try:
            t = timeit(lambda a, b: mp.merge_levels_vmem(
                a, b, tile // 2, 1, tile_elems=tile, lane_transpose=lt),
                sv, pv)
        except Exception as e:  # noqa: BLE001
            out[f"vmem_level_lt{int(lt)}_error"] = (
                " ".join(str(e).split())[:160])
            continue
        out[f"vmem_level_ms_lt{int(lt)}"] = round(t * 1e3, 2)
    print(json.dumps(out))
    return out


def bench_packed(lg):
    n = 1 << lg
    rng = np.random.RandomState(0)
    k = rng.randint(-2**31, 2**31, n).astype(np.int64).astype(np.int32)
    v = rng.randint(-2**31, 2**31, n).astype(np.int64).astype(np.int32)
    kd, vd = jnp.asarray(k), jnp.asarray(v)

    @jax.jit
    def two_op(kd, vd):
        return jax.lax.sort((kd, vd), num_keys=1, is_stable=False)

    @jax.jit
    def packed(kd, vd):
        # order-preserving pack: biased key in the high 32, payload low 32
        ku = (kd.astype(jnp.uint32) ^ jnp.uint32(0x80000000)).astype(jnp.uint64)
        pu = vd.astype(jnp.uint32).astype(jnp.uint64)
        w = jnp.sort((ku << jnp.uint64(32)) | pu)
        ko = ((w >> jnp.uint64(32)).astype(jnp.uint32)
              ^ jnp.uint32(0x80000000)).astype(jnp.int32)
        return ko, w.astype(jnp.uint32).astype(jnp.int32)

    t2 = timeit(two_op, kd, vd)
    res = {"bench": "packed", "n": n,
           "two_op_ms": round(t2 * 1e3, 1),
           "two_op_Mrows_s": round(n / t2 / 1e6, 1)}
    try:
        with jax.enable_x64(True):
            tp = timeit(packed, kd, vd)
            ko, vo = packed(kd, vd)
            ks, _ = two_op(kd, vd)
            ok = bool(jnp.array_equal(ko, ks))
            res.update({"packed_ms": round(tp * 1e3, 1),
                        "packed_Mrows_s": round(n / tp / 1e6, 1),
                        "packed_correct": ok,
                        "speedup": round(t2 / tp, 2)})
    except Exception as e:  # x64 disabled or unsupported sort
        res["packed_error"] = repr(e)[:200]
    print(json.dumps(res))
    return res


def bench_full(lg):
    n = 1 << lg
    rng = np.random.RandomState(0)
    k = rng.randint(-2**30, 2**30, n).astype(np.int64).astype(np.int32)
    v = rng.randint(-2**31, 2**31, n).astype(np.int64).astype(np.int32)
    kd, vd = jnp.asarray(k), jnp.asarray(v)

    @jax.jit
    def two_op(kd, vd):
        return jax.lax.sort((kd, vd), num_keys=1, is_stable=False)

    t2 = timeit(two_op, kd, vd)
    res = {"bench": "full", "n": n, "lax_ms": round(t2 * 1e3, 1),
           "lax_Mrows_s": round(n / t2 / 1e6, 1)}
    ks, _ = two_op(kd, vd)
    variants = [
        ("merge", jax.jit(mp._merge_sort_cascade)),
        ("merge_w32k", jax.jit(functools.partial(
            mp._merge_sort_cascade, hbm_window=32768))),
        ("merge_nodb", jax.jit(functools.partial(
            mp._merge_sort_cascade, hbm_double_buffer=False))),
        ("merge_lt", jax.jit(functools.partial(
            mp._merge_sort_cascade, lane_transpose=True))),
    ]
    for name, fn in variants:
        tm = timeit(fn, kd, vd)
        ko, po = fn(kd, vd)
        ok = bool(jnp.array_equal(ko, ks))
        res.update({f"{name}_ms": round(tm * 1e3, 1),
                    f"{name}_Mrows_s": round(n / tm / 1e6, 1),
                    f"{name}_speedup": round(t2 / tm, 2),
                    f"{name}_keys_exact": ok})
    print(json.dumps(res))
    return res


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    if which in ("stages", "all"):
        bench_stages(min(lg, 24))
    if which in ("packed", "all"):
        bench_packed(lg)
    if which in ("full", "all"):
        bench_full(lg)


if __name__ == "__main__":
    if jax.devices()[0].platform == "cpu":  # smoke-validation path
        with pltpu.force_tpu_interpret_mode():
            main()
    else:
        main()

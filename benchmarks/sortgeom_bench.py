"""Measure segmented-sort geometry + redistribution primitives on the real
chip — the decision data for the round-2 partition-engine design.

Methodology (docs/DESIGN_NOTES.md gotchas): loop the op inside ONE jit with
data dependence, pull ONE fused scalar, subtract the ~26ms tunnel RTT by
differencing two loop lengths.

Usage: python benchmarks/sortgeom_bench.py [log2_n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def rate(fn_loop, reps_a=2, reps_b=6):
    """fn_loop(reps) -> jitted callable returning a scalar; returns sec/op."""
    fa = fn_loop(reps_a)
    fb = fn_loop(reps_b)
    float(fa())  # compile
    float(fb())
    t0 = time.perf_counter(); float(fa()); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fb()); tb = time.perf_counter() - t0
    return (tb - ta) / (reps_b - reps_a)


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << lg
    rng = np.random.RandomState(0)
    keys0 = jnp.asarray(rng.randint(0, 1 << 30, n, dtype=np.int32))
    pay0 = jnp.asarray(np.arange(n, dtype=np.int32))

    print(f"n = 2^{lg} = {n}", flush=True)

    # flat 2-op sort (unstable), the current engine's workhorse
    def flat_loop(reps):
        @jax.jit
        def f():
            def body(i, kv):
                k, v = kv
                k2, v2 = jax.lax.sort((k ^ i, v), num_keys=1,
                                      is_stable=False)
                return (k2, v2)
            k, v = jax.lax.fori_loop(0, reps, body, (keys0, pay0))
            return jnp.sum(k) + jnp.sum(v)
        return f
    t = rate(flat_loop)
    print(f"flat sort2 unstable: {t*1e3:8.1f} ms  {n/t/1e6:8.0f} Mrows/s",
          flush=True)

    # segmented 2-op sorts across geometries
    for lgL in [10, 11, 12, 13, 14, 16, 18, 20, 22]:
        if lgL >= lg:
            break
        L = 1 << lgL
        C = n // L
        k2d = keys0.reshape(C, L)
        v2d = pay0.reshape(C, L)

        def seg_loop(reps, k2d=k2d, v2d=v2d):
            @jax.jit
            def f():
                def body(i, kv):
                    k, v = kv
                    k2, v2 = jax.lax.sort((k ^ i, v), num_keys=1,
                                          dimension=1, is_stable=False)
                    return (k2, v2)
                k, v = jax.lax.fori_loop(0, reps, body, (k2d, v2d))
                return jnp.sum(k) + jnp.sum(v)
            return f
        t = rate(seg_loop)
        print(f"seg sort2 [{C}x{L}]: {t*1e3:8.1f} ms  "
              f"{n/t/1e6:8.0f} Mrows/s", flush=True)

    # 128-row block gather, 2 columns (the redistribution mover)
    nb = n // 128
    bidx = jnp.asarray(rng.permutation(nb).astype(np.int32))
    kb = keys0.reshape(nb, 128)
    vb = pay0.reshape(nb, 128)

    def gather_loop(reps):
        @jax.jit
        def f():
            def body(i, kv):
                k, v = kv
                idx = bidx ^ (i & 0)  # keep dep without changing perm
                k2 = jnp.take(k, idx, axis=0)
                v2 = jnp.take(v, idx, axis=0)
                return (k2, v2)
            k, v = jax.lax.fori_loop(0, reps, body, (kb, vb))
            return jnp.sum(k) + jnp.sum(v)
        return f
    t = rate(gather_loop)
    print(f"block gather 2col [{nb}x128]: {t*1e3:8.1f} ms  "
          f"{n*8/t/1e9:6.0f} GB/s moved", flush=True)

    # one-hot matmul histogram, P=32, over 1024-row chunks
    P = 32
    pid = (keys0 & (P - 1)).reshape(-1, 1024)

    def hist_loop(reps):
        @jax.jit
        def f():
            def body(i, acc):
                oh = (pid[..., None] == jnp.arange(P)[None, None, :])
                h = jnp.sum(oh.astype(jnp.int32), axis=1)  # [C, P]
                return acc + jnp.sum(h) + i
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return f
    t = rate(hist_loop)
    print(f"onehot hist P={P} [.x1024]: {t*1e3:8.1f} ms  "
          f"{n/t/1e6:8.0f} Mrows/s", flush=True)


if __name__ == "__main__":
    main()

"""Measure segmented-sort geometry + redistribution primitives on the real
chip — the decision data for the round-2 partition-engine design.

Methodology notes (hard-won, see docs/DESIGN_NOTES.md):
  * ops must be ARGUMENTS of the jit — closed-over device arrays become XLA
    constants and the whole benchmark constant-folds at compile time
    (observed: "0.0 ms" sorts after 10-minute compiles);
  * the sync reduction must be order-DEPENDENT — plain sums are
    permutation-invariant and XLA deletes the sort;
  * sync by pulling one scalar; subtract the measured tunnel RTT.

Usage: python benchmarks/sortgeom_bench.py <mode> [log2_n]
  modes: flat | seg | gather | hist | all
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def measure(f, *args, reps=6):
    float(f(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def order_dep(k, v):
    kf = k.reshape(-1)
    vf = v.reshape(-1)
    stride = max(1, kf.shape[0] // 4096)
    return jnp.sum(kf[::stride] * jnp.int32(31) ^ vf[::stride],
                   dtype=jnp.int32)


@partial(jax.jit, static_argnames=("dim",))
def sort2(k, v, dim):
    k, v = jax.lax.sort((k, v), num_keys=1, dimension=dim, is_stable=False)
    return order_dep(k, v)


@partial(jax.jit, static_argnames=("dim",))
def sort3(k, i, v, dim):
    k, i, v = jax.lax.sort((k, i, v), num_keys=1, dimension=dim,
                           is_stable=False)
    return order_dep(k, v) ^ order_dep(k, i)


@jax.jit
def gather2(kb, vb, bidx):
    k = jnp.take(kb, bidx, axis=0)
    v = jnp.take(vb, bidx, axis=0)
    return order_dep(k, v)


@jax.jit
def hist32(pid):
    P = 32
    oh = (pid[..., None] == jnp.arange(P, dtype=jnp.int32)[None, None, :])
    hh = jnp.sum(oh.astype(jnp.int32), axis=1)
    w = jnp.arange(P, dtype=jnp.int32)[None, :] + 1
    return jnp.sum(hh * w, dtype=jnp.int32)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    n = 1 << lg
    rng = np.random.RandomState(0)
    keys0 = jnp.asarray(rng.randint(0, 1 << 30, n, dtype=np.int32))
    pay0 = jnp.asarray(np.arange(n, dtype=np.int32))

    tiny = jnp.zeros((8, 128), jnp.int32)
    rtt = measure(jax.jit(lambda x: jnp.sum(x)), tiny)
    print(f"n = 2^{lg}   rtt = {rtt*1e3:.1f} ms", flush=True)

    def report(name, t, denom=None):
        t = max(t - rtt, 1e-6)
        print(f"{name}: {t*1e3:8.1f} ms  {(denom or n)/t/1e6:8.0f} Mrows/s",
              flush=True)

    if mode in ("flat", "all"):
        report("flat sort2 unstable", measure(sort2, keys0, pay0, 0))

    if mode in ("seg", "all"):
        for lgL in [10, 12, 14, 16, 18, 20, 22]:
            if lgL >= lg:
                break
            L = 1 << lgL
            C = n // L
            t = measure(sort2, keys0.reshape(C, L), pay0.reshape(C, L), 1)
            report(f"seg sort2 [{C}x{L}]", t)

    if mode in ("seg3", "all"):
        for lgL in [10, 12]:
            if lgL >= lg:
                break
            L = 1 << lgL
            C = n // L
            idx = jnp.asarray(rng.randint(0, 1 << 30, n, dtype=np.int32))
            t = measure(sort3, keys0.reshape(C, L), idx.reshape(C, L),
                        pay0.reshape(C, L), 1)
            report(f"seg sort3 [{C}x{L}]", t)

    if mode in ("gather", "all"):
        nb = n // 128
        bidx = jnp.asarray(rng.permutation(nb).astype(np.int32))
        t = max(measure(gather2, keys0.reshape(nb, 128),
                        pay0.reshape(nb, 128), bidx) - rtt, 1e-6)
        print(f"block gather 2col [{nb}x128]: {t*1e3:8.1f} ms  "
              f"{n*8/t/1e9:6.1f} GB/s moved", flush=True)

    if mode in ("hist", "all"):
        pid = (keys0 & 31).reshape(-1, 1024)
        report("onehot hist P=32 [.x1024]", measure(hist32, pid))


if __name__ == "__main__":
    main()

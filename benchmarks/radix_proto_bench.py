"""Measure the radix-partition prototype (ops/partition_radix.py) against
jax.lax.sort on device — the decision evidence for DESIGN_NOTES 'Radix vs
sort: closed'.

Usage: python benchmarks/radix_proto_bench.py [log2_n]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icde2019_gpu_join_tpu.ops.partition_radix import (  # noqa: E402
    radix_group, radix_sort_via_grouping)


def measure(f, *args, reps=5):
    out = f(*args)
    float(jnp.sum(out[0].reshape(-1)[:: max(1, out[0].size // 1024)]
                  .astype(jnp.int32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(out[0].reshape(-1)[:: max(1, out[0].size // 1024)]
                      .astype(jnp.int32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) - 0.025  # subtract tunnel RTT


@jax.jit
def flat_sort(k, v):
    return jax.lax.sort((k, v), num_keys=1, is_stable=False)


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << lg
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randint(0, 1 << 31, n, dtype=np.int32))
    v = jnp.asarray(np.arange(n, dtype=np.int32))

    t = measure(flat_sort, k, v)
    print(f"n=2^{lg} flat lax.sort 2-op:        {t*1e3:7.1f} ms "
          f"{n/t/1e6:7.0f} Mrows/s", flush=True)

    for bits, chunk in [(3, 4096), (5, 16384)]:
        f = partial(radix_group, bits=bits, chunk=chunk)
        t = measure(jax.jit(lambda a, b, f=f: f(a, b)), k, v)
        print(f"n=2^{lg} radix_group b={bits} ch={chunk}: {t*1e3:7.1f} ms "
              f"{n/t/1e6:7.0f} Mrows/s", flush=True)

    for bits, chunk in [(5, 4096), (5, 16384)]:
        f = partial(radix_sort_via_grouping, bits=bits, chunk=chunk)
        t = measure(jax.jit(lambda a, b, f=f: f(a, b)), k, v)
        print(f"n=2^{lg} radix_SORT b={bits} ch={chunk}:  {t*1e3:7.1f} ms "
              f"{n/t/1e6:7.0f} Mrows/s", flush=True)


if __name__ == "__main__":
    main()

"""Config-5 weak-scaling curves on a virtual CPU device mesh.

Fixed work PER DEVICE (rows_per_dev each side), device counts 1/2/4/8;
reports per-leg wall time, Mrows/s, overflow (must be 0), efficiency
vs the 1-device leg, plus a 2-level (host x chip) mesh leg.

Caveat printed with the results: the 8 "devices" share one physical CPU
core here, so wall-clock "efficiency" mostly measures the software
overhead of the exchange path, not ICI. On a real pod slice the same code
paths run unmodified over ICI; this harness is the shape-and-correctness
gate plus the bookkeeping for the weak-scaling report.

Run: python benchmarks/weak_scaling.py [log2_rows_per_dev] [--segmented]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    segmented = "--segmented" in sys.argv
    per_dev = 1 << lg

    from icde2019_gpu_join_tpu.parallel.dist_join import (
        distributed_join_aggregate, distributed_join_aggregate_2level,
        distributed_join_segmented)
    from icde2019_gpu_join_tpu.parallel.mesh import make_mesh, make_mesh_2d
    from icde2019_gpu_join_tpu.utils import datasets

    results = []
    for nd in (1, 2, 4, 8):
        n = per_dev * nd
        rk, sk = datasets.make_pk_fk(n, n, seed=777)
        rkd = jnp.asarray(rk)
        skd = jnp.asarray(sk)
        rp = jnp.ones(n, jnp.int32)
        sp = jnp.ones(n, jnp.int32)
        mesh = make_mesh(nd)
        if segmented:
            run = lambda: distributed_join_segmented(
                rkd, rp, skd, sp, mesh=mesh, num_segments=4)
        else:
            run = lambda: distributed_join_aggregate(rkd, rp, skd, sp,
                                                     mesh=mesh)
        agg, ov = run()   # compile + warm
        t0 = time.perf_counter()
        agg, ov = run()
        agg = int(agg); ov = int(ov)
        dt = time.perf_counter() - t0
        # host oracle (uint32 wraparound count)
        rs = np.sort(rk)
        cnt = np.searchsorted(rs, sk, "right") - np.searchsorted(rs, sk, "left")
        expect = int(np.int32(np.uint32(np.sum(cnt, dtype=np.uint64)
                                        & 0xFFFFFFFF)))
        # NOTE (round-2 VERDICT): no efficiency column on the virtual mesh —
        # 8 "devices" timeshare one CPU, so a wall-clock ratio carries no
        # ICI signal and invites misreading. Correctness + overflow are the
        # deliverables here; wall seconds are recorded for reference only.
        leg = {
            "devices": nd, "rows_per_dev": per_dev,
            "wall_seconds_virtual_mesh": round(dt, 3),
            "overflow": ov, "correct": agg == expect,
        }
        results.append(leg)
        print(json.dumps(leg), flush=True)

    # 2-level host x chip mesh (DCN x ICI shape)
    nd = 8
    n = per_dev * nd
    rk, sk = datasets.make_pk_fk(n, n, seed=777)
    mesh2 = make_mesh_2d(2, 4)
    t0 = time.perf_counter()
    agg, ov = distributed_join_aggregate_2level(
        jnp.asarray(rk), jnp.ones(n, jnp.int32),
        jnp.asarray(sk), jnp.ones(n, jnp.int32), mesh=mesh2)
    agg, ov = int(agg), int(ov)
    dt = time.perf_counter() - t0
    rs = np.sort(rk)
    cnt = np.searchsorted(rs, sk, "right") - np.searchsorted(rs, sk, "left")
    expect = int(np.int32(np.uint32(np.sum(cnt, dtype=np.uint64)
                                    & 0xFFFFFFFF)))
    print(json.dumps({
        "devices": "2x4 (host x chip)", "rows_per_dev": per_dev,
        "seconds_incl_compile": round(dt, 3),
        "overflow": ov, "correct": agg == expect,
        "note": "virtual CPU mesh: shapes+correctness gate; "
                "efficiency numbers need real ICI",
    }), flush=True)


if __name__ == "__main__":
    main()

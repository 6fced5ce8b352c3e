"""Phase timing & throughput metrics (reference C21 analog).

The reference reports per-phase MB/s computed as 2*(|R|+|S|)*4B / t
(src/hash_join_clustered_probe.cu:937-940) via manual cpuSeconds() stamps
(src/common-host.cpp:26-30) and a RAII time_block (src/common-host.h:67-80).
Here: a PhaseTimer that block_until_ready()s JAX values, plus structured
JSON-line reports with rows/s, GB/s and HBM-roofline fraction.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


# Per-chip HBM bandwidth (GB/s) used for roofline fractions. v5e ("v5 lite")
# has ~819 GB/s; override via EngineMetrics(hbm_gbps=...).
DEFAULT_HBM_GBPS = {
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,
    "cpu": 50.0,
}


def detect_hbm_gbps() -> float:
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return 50.0
    for name, bw in DEFAULT_HBM_GBPS.items():
        if name.lower() in kind.lower():
            return bw
    return 819.0


@dataclass
class Phase:
    name: str
    seconds: float
    bytes_moved: int = 0
    rows: int = 0


@dataclass
class PhaseTimer:
    """Collects named phases; `measure` blocks on device results."""

    hbm_gbps: float = field(default_factory=detect_hbm_gbps)
    phases: List[Phase] = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str, bytes_moved: int = 0, rows: int = 0):
        t0 = time.perf_counter()
        out = {}
        try:
            # named span in jax.profiler device traces (utils/profiling.py)
            with jax.profiler.TraceAnnotation(f"tpujoin.{name}"):
                yield out
        finally:
            if "result" in out:
                jax.block_until_ready(out["result"])
            t1 = time.perf_counter()
            self.phases.append(Phase(name, t1 - t0, bytes_moved, rows))

    def seconds(self, name: str) -> float:
        return sum(p.seconds for p in self.phases if p.name == name)

    def total_seconds(self) -> float:
        return sum(p.seconds for p in self.phases)

    def report(self, extra: Optional[Dict] = None) -> Dict:
        out = {"phases": {}, "hbm_gbps": self.hbm_gbps}
        for p in self.phases:
            d = out["phases"].setdefault(
                p.name, {"seconds": 0.0, "bytes": 0, "rows": 0}
            )
            d["seconds"] += p.seconds
            d["bytes"] += p.bytes_moved
            d["rows"] += p.rows
        for name, d in out["phases"].items():
            if d["seconds"] > 0:
                d["gbps"] = d["bytes"] / d["seconds"] / 1e9
                d["mrows_per_s"] = d["rows"] / d["seconds"] / 1e6
                d["roofline_frac"] = d["gbps"] / self.hbm_gbps
        if extra:
            out.update(extra)
        return out

    def print_report(self, extra: Optional[Dict] = None):
        print(json.dumps(self.report(extra)))


def ref_throughput_mbps(n_r: int, n_s: int, seconds: float) -> float:
    """The reference's headline metric: 2*(|R|+|S|)*4 bytes / t in MB/s
    (src/hash_join_clustered_probe.cu:938-940)."""
    if seconds <= 0:
        return float("inf")
    return 2.0 * (n_r + n_s) * 4.0 / seconds / 1e6

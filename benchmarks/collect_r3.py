"""Collect round-3 device-run outputs into CONFIGS_r03.json.

Reads every benchmarks/out_r3/*.jsonl captured by r3_device_run.sh (and
any scale-run captures added later), keeps the JSON lines, and writes
them to CONFIGS_r03.json at the repo root keyed by source file.

Usage: python benchmarks/collect_r3.py [outdir] [dest_name]
(dest_name defaults to CONFIGS_r03.json; round-4 runs pass CONFIGS_r04.json)
"""

import glob
import json
import os
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    root, "benchmarks", "out_r3")
dest_name = sys.argv[2] if len(sys.argv) > 2 else "CONFIGS_r03.json"

collected = {}
for path in sorted(glob.glob(os.path.join(outdir, "*.jsonl"))):
    lines = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                lines.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    if lines:
        collected[os.path.basename(path)] = lines

dest = os.path.join(root, dest_name)
with open(dest, "w") as f:
    json.dump(collected, f, indent=1)
print(f"wrote {dest}: {sum(len(v) for v in collected.values())} records "
      f"from {len(collected)} files")

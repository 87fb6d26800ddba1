"""Spark-free memory-bandwidth occupancy control.

The ingest attribution run (bench/ingest_attrib_r4.json) showed total
task CPU inflating +42% from 2-way to 8-way concurrency with >96%
slot utilization at both levels — i.e. per-core throughput degrades
as more cores run the same byte-heavy work, on a box where all 32
cores share one L3 and one memory controller. This probe measures
that degradation WITHOUT Spark: K concurrent copies of the pinned
boxprobe kernel (random int64 gather + minimum.reduceat — DRAM-bound
by construction), each taskset to its own core. If per-copy wall
inflates with K, the box's aggregate bandwidth is the binding
resource and a fixed-bandwidth two-level run UNDERSTATES the scaling
a real 4N-executor cluster (4x memory systems) would show.

Usage: python bench/membw_probe.py [--occupancies 1,2,8]
Prints one JSON line; appends a row to BENCH/BASELINE.md with
--record.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

_CHILD = """
import json
from quiver_spark.boxprobe import box_control
print(json.dumps(box_control(repeats=3)))
"""


def run_occupancy(k: int) -> dict:
    procs = []
    for i in range(k):
        env = dict(os.environ, PYTHONPATH=_ROOT)
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", _CHILD],
            stdout=subprocess.PIPE, text=True, env=env,
        ))
    walls = []
    for i, p in enumerate(procs):
        out, _ = p.communicate()
        lines = (out or "").strip().splitlines()
        if p.returncode != 0 or not lines:
            raise RuntimeError(
                f"occupancy-{k} copy {i} (core {i}) failed "
                f"(rc={p.returncode}); stdout: {out[-500:] if out else '<empty>'}"
            )
        walls.append(json.loads(lines[-1])["box_control_sec"])
    return {
        "occupancy": k,
        "per_copy_sec": walls,
        "mean_sec": round(sum(walls) / len(walls), 3),
        "max_sec": round(max(walls), 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--occupancies", default="1,2,8")
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()
    ks = [int(x) for x in args.occupancies.split(",")]
    if 1 not in ks:
        # the headline column is "vs solo"; without a solo row the
        # ratio would silently bake contention into its own baseline
        ks = [1] + ks
    rows = [run_occupancy(k) for k in ks]
    base = next(r["mean_sec"] for r in rows if r["occupancy"] == 1)
    for r in rows:
        r["per_core_throughput_vs_solo"] = round(base / r["mean_sec"], 3)
    result = {
        "metric": "membw_occupancy_control",
        "kernel": "boxprobe gather+reduceat (DRAM-bound), 1 copy per pinned core",
        "rows": rows,
    }
    print(json.dumps(result))
    if args.record:
        with open(os.path.join(_ROOT, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                "\n## memory-bandwidth occupancy control (Spark-free, "
                "bench/membw_probe.py)\n\n"
                "| concurrent pinned copies | mean per-copy wall (s) | "
                "per-core throughput vs solo |\n|---|---|---|\n"
            )
            for r in rows:
                f.write(f"| {r['occupancy']} | {r['mean_sec']} | "
                        f"{r['per_core_throughput_vs_solo']} |\n")
            f.write(
                "\nSame fixed kernel, no Spark, no shuffle, no Python "
                "workers — pure DRAM-bound numpy, one copy pinned per "
                "core. Per-copy inflation with occupancy is the box's "
                "shared memory system, the same ceiling the ingest "
                "attribution measured inside Spark. A real N->4N "
                "executor scale-out multiplies memory systems along "
                "with cores; this box cannot.\n"
            )


if __name__ == "__main__":
    main()

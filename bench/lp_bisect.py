"""Bisect harness for the `label_propagation_5` bench reading.

Round-4 verdict "What's wrong #1": the lp smj-tier sf0.1 suite reading
trended 9.0 s (r3 judge quiet-box) -> ~10.6-12.0 s (r4). The suspect
list: (a) the round-4 labelprop code changes (eqNullSafe change
detection -- the two-level aggregate restructure touched bhj/csr only),
(b) suite-context effects (the rewritten ingest changes the persisted
graph's lineage/layout and the executor-storage state lp starts from),
(c) box noise.

This script isolates (a): fresh JVM, the EXACT graph build bench.py
uses (synthesize sf0.1 -> ingest -> persist -> counts -> release
source caches), then ONLY `label_propagation_5`, timed, with the
in-band box control. Code variants are selected by checking out
labelprop.py versions externally; `--label` tags the JSON row.

Usage:
    python bench/lp_bisect.py [--label head] [--runs 3]

Each run is a separate child JVM (fresh code cache / GC state, the
same discipline as bench/scaling.py). Prints one JSON line per run
plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(root)r)
from quiver_spark import ingest as ing
from quiver_spark.algorithms import label_propagation
from quiver_spark.boxprobe import box_control
from quiver_spark.session import get_spark

sf = 0.1
spark = get_spark("lp-bisect", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
n_files = max(1000, int(sf * 500_000))
repos = ing.synthesize_repo_table(spark, n_files=n_files, n_repos=max(20, n_files // 1000), seed=42)
g = ing.ingest(repos)
g.persist()
g.count_nodes(); g.count_edges()
ing.release_source_caches(g)
t0 = time.monotonic()
label_propagation(g, label_col="lang", num_iters=5).state.count()
wall = time.monotonic() - t0
# second call in the SAME JVM: if this is materially faster, the
# first-call reading is dominated by JIT/GC warm-up, not plan cost
t0 = time.monotonic()
label_propagation(g, label_col="lang", num_iters=5).state.count()
warm = time.monotonic() - t0
ctl = box_control()
print("LPBISECT " + json.dumps({"lp_wall_sec": round(wall, 3), "lp_wall_warm_sec": round(warm, 3), **ctl}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default="head")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    walls, warms, ctls = [], [], []
    for i in range(args.runs):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD % {"root": ROOT}],
            capture_output=True, text=True, cwd=ROOT, check=True,
        )
        row = next(
            json.loads(line[len("LPBISECT "):])
            for line in out.stdout.splitlines()
            if line.startswith("LPBISECT ")
        )
        row.update({"variant": args.label, "run": i})
        walls.append(row["lp_wall_sec"])
        warms.append(row["lp_wall_warm_sec"])
        ctls.append(row["box_control_ratio"])
        print(json.dumps(row), flush=True)
    summary = {
        "variant": args.label,
        "runs": args.runs,
        "lp_wall_min": min(walls),
        "lp_wall_med": sorted(walls)[len(walls) // 2],
        "lp_wall_all": walls,
        "lp_wall_warm_all": warms,
        "lp_wall_warm_min": min(warms),
        "box_control_ratios": ctls,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()

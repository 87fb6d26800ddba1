"""Stage-level attribution of ingest's core-count-independent cost.

The 8M-row memory-faithful scaling run (BENCH/BASELINE.md) fit
T = S + P/cores with S ≈ 54 s of serial wall that no core count
touches. This harness re-runs the same protocol (pinned levels,
3 g/core, run-twice-report-run-2) WITH Spark event logging enabled,
then attributes run 2's wall per stage at both levels:

- per-stage wall = completion - submission (from the event log);
- stage "speedup" = wall@lo / wall@hi — a serial stage reads ~1.0,
  a perfectly parallel one reads hi/lo;
- the gap between consecutive stages (and outside any stage) is
  driver time: planning, parquet listing, py4j round-trips.

Usage: python bench/ingest_attrib.py [--rows 8000000] [--levels 2,8]
       [--mem-per-core 3]

Prints one JSON line per level plus a merged attribution table, and
writes the full artifact (summary + merged + raw per-stage rows) to
bench/ingest_attrib_r4.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from collections import defaultdict

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

_EVDIR = "/tmp/spark-events-attrib"

_CHILD = """
import json, os, sys, time
from quiver_spark.session import get_spark
from quiver_spark import ingest as ing

cores = int(sys.argv[1]); n_rows = int(sys.argv[2]); evdir = sys.argv[3]
NB = int(os.environ.get("SCALING_BLOCKS", "64"))
os.makedirs(evdir, exist_ok=True)
spark = get_spark(
    f"attrib-{cores}", master=f"local[{cores}]", shuffle_partitions=NB,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file:{evdir}",
    },
)
spark.sparkContext.setLogLevel("ERROR")
corpus = os.path.join(os.environ.get("SCALING_TMP", "/tmp"), f"scaling_corpus_{n_rows}.parquet")
if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
    ing.synthesize_repo_table(
        spark, n_files=n_rows, n_repos=max(50, n_rows // 1000), seed=42, num_partitions=NB,
    ).write.mode("overwrite").parquet(corpus)
repos = spark.read.parquet(corpus)

walls = []
window = None
for i in range(2):
    t0m = time.monotonic(); t0 = time.time()
    g = ing.ingest(repos)
    out = {"nodes": g.count_nodes(), "edges": g.count_edges()}
    walls.append(time.monotonic() - t0m)
    if i == 1:
        window = (t0 * 1000.0, time.time() * 1000.0)
    spark.catalog.clearCache()
print("RESULT " + json.dumps({
    "cores": cores, "app_id": spark.sparkContext.applicationId,
    "steady_wall_sec": round(walls[-1], 3), "walls": [round(w, 3) for w in walls],
    "run2_window_ms": window, "out": out,
}))
spark.stop()
"""


def run_level(cores: int, rows: int, mem_per_core: int) -> dict:
    env = dict(os.environ, PYTHONPATH=_ROOT, SPARK_DRIVER_MEM=f"{mem_per_core * cores}g")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", _CHILD,
         str(cores), str(rows), _EVDIR],
        capture_output=True, text=True, env=env, check=False,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child local[{cores}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def parse_stages(app_id: str, window: tuple[float, float]) -> list[dict]:
    """Per-stage rows for stages submitted inside the run-2 window."""
    lo, hi = window
    stages = []
    # Spark 4 rolling layout: eventlog_v2_<app>/events_*_<app>[.zstd];
    # legacy layout: a single file named <app>
    import glob

    import pyarrow as pa

    cand = sorted(glob.glob(os.path.join(_EVDIR, f"eventlog_v2_{app_id}", "events_*")))
    if not cand:
        cand = [os.path.join(_EVDIR, app_id)]
    lines = []
    for p in cand:
        comp = "zstd" if p.endswith(".zstd") else None
        with pa.input_stream(p, compression=comp) as f:
            lines.extend(f.read().decode("utf-8", "replace").splitlines())
    task_run = defaultdict(float)   # stage id -> sum of executor run time (ms)
    task_max = defaultdict(float)   # stage id -> slowest task (ms)
    for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                m = ev.get("Task Metrics") or {}
                sid = ev["Stage ID"]
                rt = float(m.get("Executor Run Time", 0))
                task_run[sid] += rt
                task_max[sid] = max(task_max[sid], rt)
                continue
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub is None or comp is None or not (lo <= sub <= hi):
                continue
            stages.append({
                "stage": si["Stage ID"],
                "name": si["Stage Name"].split(" at ")[0],
                "detail": si["Stage Name"],
                "tasks": si["Number of Tasks"],
                "submit_ms": sub,
                "wall_ms": comp - sub,
            })
    for s in stages:
        s["task_run_ms"] = round(task_run.get(s["stage"], 0.0), 1)
        s["task_max_ms"] = round(task_max.get(s["stage"], 0.0), 1)
    stages.sort(key=lambda s: s["submit_ms"])
    return stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--mem-per-core", type=int, default=3)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    from quiver_spark.boxprobe import box_control  # fail fast, in-band control

    results = {}
    for cores in (lo, hi):
        r = run_level(cores, args.rows, args.mem_per_core)
        print("LEVEL " + json.dumps({k: r[k] for k in ("cores", "steady_wall_sec", "walls", "out")}), flush=True)
        r["stages"] = parse_stages(r["app_id"], tuple(r["run2_window_ms"]))
        results[cores] = r

    # merge by (name, order-of-occurrence) — both levels run the same
    # plan, so the k-th occurrence of a stage name matches across levels
    def keyed(stages):
        seen = defaultdict(int)
        out = {}
        for s in stages:
            k = (s["name"], seen[s["name"]])
            seen[s["name"]] += 1
            out[k] = s
        return out

    klo, khi = keyed(results[lo]["stages"]), keyed(results[hi]["stages"])
    rows = []
    for k in klo:
        if k not in khi:
            continue
        a, b = klo[k], khi[k]
        rows.append({
            "stage": f"{k[0]}#{k[1]}",
            "tasks": a["tasks"],
            f"wall_s@{lo}": round(a["wall_ms"] / 1000, 2),
            f"wall_s@{hi}": round(b["wall_ms"] / 1000, 2),
            "speedup": round(a["wall_ms"] / max(b["wall_ms"], 1), 2),
            "serial_s": round((b["wall_ms"] - a["wall_ms"] / (hi / lo)) / 1000, 2),
            # slot utilization: task-time / (wall * cores). Low at hi
            # but fine at lo -> not enough parallel work; low at BOTH
            # -> per-stage fixed overhead (scheduling, python workers)
            f"util@{lo}": round(a["task_run_ms"] / max(a["wall_ms"] * lo, 1), 2),
            f"util@{hi}": round(b["task_run_ms"] / max(b["wall_ms"] * hi, 1), 2),
            f"maxtask_s@{hi}": round(b["task_max_ms"] / 1000, 2),
        })
    rows.sort(key=lambda r: -r["serial_s"])

    in_stage_lo = sum(s["wall_ms"] for s in results[lo]["stages"]) / 1000
    in_stage_hi = sum(s["wall_ms"] for s in results[hi]["stages"]) / 1000
    summary = {
        "metric": "ingest_stage_attribution",
        "rows": args.rows,
        "box_control": box_control(),
        "steady_wall": {str(lo): results[lo]["steady_wall_sec"], str(hi): results[hi]["steady_wall_sec"]},
        "in_stage_wall": {str(lo): round(in_stage_lo, 1), str(hi): round(in_stage_hi, 1)},
        "driver_gap_wall": {
            str(lo): round(results[lo]["steady_wall_sec"] - in_stage_lo, 1),
            str(hi): round(results[hi]["steady_wall_sec"] - in_stage_hi, 1),
        },
        "n_stages": {str(lo): len(results[lo]["stages"]), str(hi): len(results[hi]["stages"])},
    }
    print(json.dumps(summary))
    for r in rows:
        print(json.dumps(r))
    with open(os.path.join(_ROOT, "bench", "ingest_attrib_r4.json"), "w") as f:
        json.dump({"summary": summary, "stages": rows,
                   "raw": {str(c): results[c]["stages"] for c in (lo, hi)}}, f, indent=1)
    print("wrote bench/ingest_attrib_r4.json")


if __name__ == "__main__":
    main()

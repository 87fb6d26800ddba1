"""Scaling-efficiency evidence: same PageRank job at two parallelism
levels (local[8] vs local[32]) on the same seeded power-law edge
table — the sandbox proxy for the north rule's "N vs 4N executors,
efficiency ≥ 0.8" criterion (BASELINE.md; no real cluster exists
here, see SURVEY.md §6).

Each level runs in its own subprocess (fresh JVM) so executor-thread
pools don't bleed between measurements. Writes/updates
BENCH/BASELINE.md with throughput at both levels and the computed
efficiency, and prints one JSON line.

Usage: python bench/scaling.py [--edges 20000000] [--vertices 2000000]
       [--iters 10] [--levels 8,32] [--strategy bhj]
       [--algo pagerank|cc|cc_star|lp|kcore|scc|anf|msf|louvain|triangles|ingest|neardup]

One-shot modes (triangles / ingest / neardup) run the job
SCALING_ONESHOT_RUNS times per level (env, default 2) and report the
MIN of the post-warmup runs as steady state (least-contended
observation under external load waves); for the doc-corpus modes
(ingest, neardup) --edges is the ROW count and the input is the
synthetic repo table written to parquet once (generation excluded
from the measured wall).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

# a by-path launch puts bench/ (not the repo root) on sys.path; the
# late box_control import once crashed the parent AFTER both measured
# levels completed, losing ~40 min of evidence — pin the root here
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

_CHILD = """
import json, os, sys, time
from quiver_spark.session import get_spark
from quiver_spark import ingest as ing
from quiver_spark.graph import Graph
from quiver_spark.algorithms import pagerank, connected_components, label_propagation

cores = int(sys.argv[1]); n_v = int(sys.argv[2]); n_e = int(sys.argv[3]); iters = int(sys.argv[4]); strat = sys.argv[5]; algo = sys.argv[6]
# fixed layout across levels: same block count / shuffle partitions /
# task graph at both parallelism levels — only the core count varies,
# exactly as a fixed dataset behaves on a bigger cluster
NB = int(os.environ.get("SCALING_BLOCKS", "64"))
spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=NB)
spark.sparkContext.setLogLevel("ERROR")


def oneshot(job, n_units, strategy_label, clear_cache=False):
    # one-shot job, not a superstep loop: run it N times (default 2,
    # env SCALING_ONESHOT_RUNS) and report the MIN of the post-warmup
    # runs as steady state (run 1 pays python-worker spin-up /
    # codegen, exactly like the WARM supersteps below; min-of-laters
    # is the least-contended observation on a box with external load
    # waves, the same estimator boxprobe uses).
    # clear_cache: jobs that persist-and-LEAVE internal frames (e.g.
    # ingest's slim scan) would hand later runs a cached suffix of the
    # pipeline — clear between runs so every run re-executes the
    # whole pipeline warm. Jobs that unpersist their own internals
    # (triangle_count) keep their input cache instead.
    n_runs = max(2, int(os.environ.get("SCALING_ONESHOT_RUNS", "2")))
    walls = []
    out = None
    for i in range(n_runs):
        t0 = time.monotonic()
        out = job()
        walls.append(time.monotonic() - t0)
        if clear_cache and i < n_runs - 1:
            spark.catalog.clearCache()
    steady = min(walls[1:])
    print("RESULT " + json.dumps({
        "cores": cores, "strategy": strategy_label, "algo": algo,
        "wall_sec": round(sum(walls), 3), "supersteps": n_runs, "warmup_supersteps": 1,
        "steady_wall_sec": round(steady, 3),
        "supersteps_per_sec": round(1 / steady, 4),
        "edges_per_sec": round(n_units / steady, 1),
        "wall_per_superstep_ms": [round(w * 1000, 1) for w in walls],
        "job_output": out,
    }))
    spark.stop()
    raise SystemExit(0)


if algo in ("ingest", "neardup", "dedup_keep"):
    # doc-corpus one-shots. --edges is repurposed as the row count
    # (n_e files/docs); the corpus is the deterministic synthetic repo
    # table, written to parquet ONCE so the measured job starts from
    # storage exactly like a 100 TB run (generation excluded).
    corpus = os.path.join(os.environ.get("SCALING_TMP", "/tmp"), f"scaling_corpus_{n_e}.parquet")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        ing.synthesize_repo_table(
            spark, n_files=n_e, n_repos=max(50, n_e // 1000), seed=42, num_partitions=NB,
        ).write.mode("overwrite").parquet(corpus)
    repos = spark.read.parquet(corpus)
    if algo == "ingest":
        # ingest() persists-and-leaves the slim scan -> clear_cache so
        # run 2 re-executes the content scan too. rows/s = files/s.
        def job():
            g2 = ing.ingest(repos)
            return {"nodes": g2.count_nodes(), "edges": g2.count_edges()}
        oneshot(job, n_e, "one-content-scan", clear_cache=True)
    elif algo == "neardup":
        from quiver_spark import dedup
        docs = repos.selectExpr(
            "concat(repo, '/', path, '@', commit) as doc_id", "content as text"
        )
        # ~15% of rows are 2nd commits of the previous file (2 of ~8
        # lines differ -> true near-dups); minhash->LSH->verify at
        # threshold 0.5 finds them without an all-pairs join.
        oneshot(
            lambda: {"pairs": dedup.near_duplicate_pairs(docs, threshold=0.5).count()},
            n_e, "minhash-lsh", clear_cache=True,
        )
    else:
        # dedup_keep: the clustering + keep-table stage of the dedup
        # deliverable, isolated — verified pairs are precomputed to
        # parquet ONCE (the neardup row above measures that stage), so
        # the measured job is pairs -> distributed CC -> doc-sized
        # keep/drop left join. Long doc ids (xxhash64) so the pair
        # graph runs the same typed path the documents table does.
        from quiver_spark import dedup
        docs = repos.selectExpr("xxhash64(repo, path, commit) as doc_id", "content as text")
        pairs_path = corpus + ".pairs_t05"
        if not os.path.exists(os.path.join(pairs_path, "_SUCCESS")):
            dedup.near_duplicate_pairs(docs, threshold=0.5).write.mode("overwrite").parquet(pairs_path)
        pairs = spark.read.parquet(pairs_path)
        from pyspark.sql import functions as F
        oneshot(
            lambda: {"dropped": dedup.canonical_keep_table(docs, pairs).filter(~F.col("keep")).count()},
            n_e, "pairs-cc-keep", clear_cache=True,
        )

edges = ing.synthesize_powerlaw_edges(spark, n_vertices=n_v, n_edges=n_e, seed=42)
g = Graph.from_edges(edges)
if algo == "lp":
    from pyspark.sql import functions as F
    g = Graph(g.vertices.withColumn("lang", (F.col("id") % 64).cast("string")), g.edges)
g.persist(); g.count_nodes(); g.count_edges()

if algo == "scc":
    # one-shot: outer FW-BW rounds have shrinking inner fixpoints, so
    # per-outer-round walls are not comparable supersteps — measure the
    # whole job. The power-law graph has a giant SCC (~2/3 of vertices
    # at avg degree 3), so the coloring/backward fixpoints do real
    # message work. Graph cache stays warm; scc unpersists its own
    # internals every run.
    from quiver_spark.algorithms.scc import strongly_connected_components
    oneshot(
        lambda: {"n_scc": strongly_connected_components(g, strategy="smj", max_iters=60)
                 .state.select("scc").distinct().count()},
        n_e, "fwbw-coloring",
    )
if algo == "msf":
    # one-shot: Boruvka rounds shrink geometrically (components at
    # least halve), so per-round walls are not comparable supersteps —
    # measure the whole contraction. Deterministic integer weights
    # synthesized on the cached edge table; msf unpersists its own
    # canonical-edge cache every run.
    from quiver_spark.algorithms.msf import minimum_spanning_forest
    from pyspark.sql import functions as F
    gw = Graph(
        g.vertices,
        g.edges.withColumn("weight", (F.col("src") * 31 + F.col("dst") * 17) % 97 + 1),
    )
    oneshot(
        lambda: {"n_forest": minimum_spanning_forest(gw, max_iters=40).count()},
        n_e, "boruvka-contraction",
    )
if algo == "louvain":
    # one-shot: rounds per level shrink with the candidate set and
    # levels contract geometrically, so per-round walls are not
    # comparable supersteps — measure the whole job. The power-law
    # graph exercises the hub regime (budgeted admission); louvain
    # releases its own level caches every run, the input graph cache
    # stays warm.
    # tail_tol=1e-6: the standard Louvain gain floor — the exact
    # fixpoint spends ~250 rounds on dQ≈2.5e-6 crumbs at this scale
    # (louvain.py docstring); the gate is applied identically at both
    # levels, so the deterministic round count is the same and the
    # efficiency compares identical work.
    from quiver_spark.algorithms.louvain import louvain
    oneshot(
        lambda: {"n_comm": louvain(g, strategy="smj", tail_tol=1e-6).assignment
                 .select("comm").distinct().count()},
        n_e, "budgeted-rounds",
    )
if algo == "triangles":
    # input graph cache stays warm across both runs (triangle_count
    # unpersists its own internals, so run 2 re-executes the full
    # wedge pipeline). edges_per_sec = input edges / steady wall.
    from quiver_spark.algorithms import triangle_count
    oneshot(lambda: triangle_count(g), n_e, "degree-oriented")
t0 = time.monotonic()
if algo == "pagerank":
    res = pagerank(g, num_iters=iters, strategy=strat, n_blocks=NB)
elif algo == "cc":
    res = connected_components(g, num_iters=iters, strategy=strat, n_blocks=NB)
elif algo == "cc_star":
    # the deep-graph escalation tier: alternating large/small-star +
    # pointer doubling, fixpoint mode (round count is diameter-free)
    res = connected_components(g, algorithm="two_phase", max_iters=iters)
elif algo == "lp":
    res = label_propagation(g, num_iters=iters, strategy=strat, n_blocks=NB)
elif algo == "kcore":
    # fixed h-index rounds (integer state, convergence-independent
    # cost); the only strategy with distributed rounds is smj
    from quiver_spark.algorithms.kcore import kcore as _kcore
    res = _kcore(g, num_iters=iters, strategy="smj")
elif algo == "anf":
    # fixed OR-propagation rounds, k=8 FM masks: per superstep one
    # shuffle of (E+V) x 9 longs with map-side bit_or combine
    from quiver_spark.algorithms.anf import anf as _anf
    res = _anf(g, radius=iters, k=8, bits=24, direction="out")
else:
    raise SystemExit(f"unknown algo {algo}")
res.state.count()
wall = time.monotonic() - t0
iters = res.supersteps  # cc runs to its fixpoint; use the real count
# steady-state throughput: drop the first WARM supersteps (cache
# population, python-worker spin-up, JIT/codegen) — scaling efficiency
# must compare the repeated per-superstep work, not one-time setup.
# cc_star runs to its fixpoint in ~O(log n) heavy rounds (often < 8
# total), so a 4-round warmup would eat most of the sample; its
# steady-state starts after round 2
WARM = min(2 if algo == "cc_star" else 4, iters - 1)
steady = [m["wall_ms"] for m in res.metrics][WARM:]
steady_wall = sum(steady) / 1000.0
k = len(steady)
print("RESULT " + json.dumps({
    "cores": cores, "strategy": strat, "algo": algo, "wall_sec": round(wall, 3), "supersteps": iters,
    "warmup_supersteps": WARM,
    "steady_wall_sec": round(steady_wall, 3),
    "supersteps_per_sec": round(k / steady_wall, 4),
    "edges_per_sec": round(k * n_e / steady_wall, 1),
    "wall_per_superstep_ms": [round(m["wall_ms"], 1) for m in res.metrics],
}))
spark.stop()
"""


def run_level(cores: int, n_v: int, n_e: int, iters: int, strategy: str = "smj", algo: str = "pagerank", pin: bool = False, mem_per_core_gb: int = 0) -> dict:
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # the box has 128 GiB; a GC-bound heap would corrupt the scaling
    # measurement (memory pressure, not cores, would set the wall)
    env.setdefault("SPARK_DRIVER_MEM", "24g")
    # mem_per_core_gb > 0: heap scales WITH the level (N cores -> N*gb
    # heap), matching how a real cluster grows — 4N executors bring 4x
    # aggregate memory, each with a FIXED per-core spec. The default
    # constant-heap mode instead models "same machine, more threads",
    # which shrinks execution memory per concurrent task as cores grow
    # and penalizes sort/aggregate-heavy one-shot jobs at the high
    # level (measured: ingest 8M rows, per-row steady cost +11% @2
    # cores vs +24% @8 cores when doubling the corpus).
    if mem_per_core_gb:
        env["SPARK_DRIVER_MEM"] = f"{mem_per_core_gb * cores}g"
    # pin=True runs the level under `taskset -c 0-(N-1)`: local[N]
    # bounds TASK slots but not JVM GC/shuffle-IO threads or the
    # python workers that run concurrently with the JVM side of an
    # Arrow exchange — a measured local[2] ingest burned 300-350% CPU,
    # deflating the 2->8 ratio. Affinity makes "N cores" mean N cores,
    # exactly like a cgroup-limited executor on a real cluster.
    prefix = ["taskset", "-c", f"0-{cores - 1}"] if pin else []
    out = subprocess.run(
        prefix + [sys.executable, "-c", _CHILD, str(cores), str(n_v), str(n_e), str(iters), strategy, algo],
        capture_output=True,
        text=True,
        env=env,
        check=False,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child (local[{cores}]) failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--vertices", type=int, default=2_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--strategy", default="csr_bcast")
    ap.add_argument("--pin", action="store_true", help="taskset each level to exactly N cores (cgroup-executor emulation)")
    ap.add_argument("--mem-per-core", type=int, default=0, metavar="GB",
                    help="scale the child heap with the level (N cores -> N*GB); 0 = constant 24g at every level")
    ap.add_argument(
        "--algo", default="pagerank",
        choices=["pagerank", "cc", "cc_star", "lp", "kcore", "scc", "anf", "msf", "louvain", "triangles", "ingest", "neardup", "dedup_keep"],
    )
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))
    # one-shot modes have a single physical plan; --strategy is
    # superstep-tier only. For doc modes --edges is the row count.
    _ONESHOT_LABEL = {"triangles": "degree-oriented", "ingest": "one-content-scan", "neardup": "minhash-lsh", "dedup_keep": "pairs-cc-keep", "scc": "fwbw-coloring", "msf": "boruvka-contraction", "louvain": "budgeted-rounds"}
    if args.algo in _ONESHOT_LABEL:
        args.strategy = _ONESHOT_LABEL[args.algo]
    elif args.algo == "kcore":
        args.strategy = "smj"  # the one distributed tier (kcore.py)
    from quiver_spark.boxprobe import box_control as _box_control

    # echo each level's raw measurement the moment it lands: a crash
    # anywhere downstream must never lose a completed ~20-min run.
    # A box-control probe runs immediately BEFORE each level: one
    # end-of-run control cannot say WHICH level a busy box poisoned
    # (an 8M ingest run recorded 0.542 because the high level ran on
    # a box that the trailing control then measured at ratio 1.361 —
    # with its steady run slower than its own warmup).
    pre_lo = _box_control()
    r_lo = run_level(lo, args.vertices, args.edges, args.iters, args.strategy, args.algo, pin=args.pin, mem_per_core_gb=args.mem_per_core)
    r_lo["box_control_pre"] = pre_lo
    print("LEVEL " + json.dumps(r_lo), flush=True)
    pre_hi = _box_control()
    r_hi = run_level(hi, args.vertices, args.edges, args.iters, args.strategy, args.algo, pin=args.pin, mem_per_core_gb=args.mem_per_core)
    r_hi["box_control_pre"] = pre_hi
    print("LEVEL " + json.dumps(r_hi), flush=True)
    factor = hi / lo
    eff = (r_hi["edges_per_sec"] / r_lo["edges_per_sec"]) / factor
    # median-of-steady is robust to one-off GC/page-cache spikes that
    # can swing the mean-of-steady by 2x on a shared box
    import statistics

    def med(r):
        return statistics.median(r["wall_per_superstep_ms"][r["warmup_supersteps"]:])

    median_eff = (med(r_lo) / med(r_hi)) / factor
    result = {
        "metric": f"{args.algo}_scaling_efficiency",
        "strategy": args.strategy,
        "box_control": _box_control(),
        "value": round(eff, 3),
        "median_eff": round(median_eff, 3),
        "unit": f"throughput ratio / {factor:g}x cores",
        "low": r_lo,
        "high": r_hi,
        "n_vertices": args.vertices,
        "n_edges": args.edges,
        "pinned": args.pin,
        "mem_per_core_gb": args.mem_per_core,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## {args.algo} scaling run ({args.edges:,} "
            f"{'rows' if args.algo in ('ingest', 'neardup', 'dedup_keep') else 'edges'}, "
            + ("" if args.algo in ("ingest", "neardup", "dedup_keep") else f"{args.vertices:,} vertices, ")
            + f"{r_lo['supersteps']} supersteps, strategy={args.strategy}"
            + (", CPU-pinned levels" if args.pin else "")
            + (f", {args.mem_per_core}g-heap/core" if args.mem_per_core else "") + ")\n\n"
            f"| parallelism | wall (s) | supersteps/sec | "
            f"{'rows' if args.algo in ('ingest', 'neardup', 'dedup_keep') else 'edges'}/sec |\n|---|---|---|---|\n"
            f"| local[{lo}] | {r_lo['wall_sec']} | {r_lo['supersteps_per_sec']} | {r_lo['edges_per_sec']:,} |\n"
            f"| local[{hi}] | {r_hi['wall_sec']} | {r_hi['supersteps_per_sec']} | {r_hi['edges_per_sec']:,} |\n\n"
            f"scaling efficiency (throughput@{hi} / throughput@{lo}) / {factor:g} = **{eff:.3f}** "
            f"(median-of-steady: **{median_eff:.3f}**) "
            f"(target ≥ 0.8 → {'PASS' if eff >= 0.8 else 'FAIL'})\n\n"
            f"box control: {result['box_control']['box_control_sec']} s "
            f"(ref {result['box_control']['box_control_ref_sec']} s, "
            f"ratio {result['box_control']['box_control_ratio']}); "
            f"pre-level controls: {pre_lo['box_control_ratio']} @local[{lo}], "
            f"{pre_hi['box_control_ratio']} @local[{hi}]\n"
        )


if __name__ == "__main__":
    main()

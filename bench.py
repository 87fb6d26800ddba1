"""Benchmark harness — prints ONE JSON line for the driver.

Headline suite at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

- flagship: PageRank to 1e-6 convergence on the synthetic power-law
  repo link graph (BASELINE.json:2's metric — supersteps/sec and
  edges-processed/sec are reported alongside wall seconds),
- connected components (HashMin fixpoint) on the same graph,
- exact triangle count (degree-oriented wedge join),
- label propagation (5 synchronous rounds),
- hierarchy PageRank on the driver's TPC-H-ish tables (the
  oracle-checked query, timed at bench scale).

Scaling-efficiency evidence (N vs 4N cores, fixed data layout) is produced by
``bench/scaling.py`` (separate JVMs per parallelism level) and
recorded in BENCH/BASELINE.md; set BENCH_SCALING=1 to run it from
here too.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    sf = _sf_of(sf_dir)

    from pyspark.sql import functions as F

    from quiver_spark import ingest as ing
    from quiver_spark.algorithms import connected_components, label_propagation, pagerank, triangle_count
    from quiver_spark.queries import q_pagerank_hierarchy
    from quiver_spark.session import get_spark

    spark = get_spark("quiver-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict[str, object] = {}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # --- build the repo link graph once (generation timed separately) ---
    n_files = max(1000, int(sf * 500_000))
    repos = ing.synthesize_repo_table(spark, n_files=n_files, n_repos=max(20, n_files // 1000), seed=42)

    def build():
        g = ing.ingest(repos)
        g.persist()
        counts = g.count_nodes(), g.count_edges()
        # the graph is materialized: drop ingest's internal caches so
        # they don't occupy executor storage through the whole suite
        ing.release_source_caches(g)
        return g, *counts

    g, n_nodes, n_edges = timed("ingest_repo_graph", build)

    # --- flagship: PageRank to 1e-6 ---
    res = timed("pagerank_1e6", lambda: pagerank(g, tol=1e-6, max_iters=60, strategy="auto"))
    supersteps = res.supersteps
    pr_wall = timings["pagerank_1e6"]
    extra["pagerank"] = {
        "supersteps": supersteps,
        "converged": res.converged,
        "n_vertices": n_nodes,
        "n_edges": n_edges,
        "supersteps_per_sec": round(supersteps / pr_wall, 3),
        "edges_per_sec": round(supersteps * n_edges / pr_wall, 1),
    }

    # --- throughput probe: power-law graph big enough that per-superstep
    # kernel work, not fixed scheduling cost, sets the rate (the repo
    # graph above is ~200k edges at sf0.1 — too small to measure e/s)
    n_pl_e, n_pl_v, pl_iters = int(sf * 50_000_000), int(sf * 5_000_000), 8
    pl = ing.synthesize_powerlaw_edges(spark, n_vertices=n_pl_v, n_edges=n_pl_e, seed=42)
    from quiver_spark.graph import Graph

    gpl = Graph.from_edges(pl)
    gpl.persist()
    gpl.count_edges()
    res_pl = timed(
        "pagerank_powerlaw_fixed8",
        lambda: pagerank(gpl, num_iters=pl_iters, strategy="csr_packed"),
    )
    steady = [m["wall_ms"] for m in res_pl.metrics][2:]
    extra["pagerank_powerlaw"] = {
        "n_edges": n_pl_e,
        "n_vertices": n_pl_v,
        "supersteps": pl_iters,
        "steady_supersteps_per_sec": round(len(steady) / (sum(steady) / 1000.0), 3),
        "steady_edges_per_sec": round(len(steady) * n_pl_e / (sum(steady) / 1000.0), 1),
    }
    gpl.unpersist()

    timed("connected_components", lambda: connected_components(g, max_iters=50).state.count())
    timed("triangle_count", lambda: triangle_count(g))
    # strategy="auto" like cc/pagerank above: the headline rows time the
    # dispatcher's choice (at sf0.1's 196k edges that is the guarded
    # driver-local tier — see algorithms/local_tier.py; the distributed
    # throughput row is pagerank_powerlaw_fixed8 below, 5M+ edges)
    timed(
        "label_propagation_5",
        lambda: label_propagation(g, label_col="lang", num_iters=5, strategy="auto").state.count(),
    )
    # Louvain over the repo graph, auto-routed like the rows above
    # (local tier at sf0.1; the distributed scaling evidence is the
    # bench/scaling.py --algo louvain 2→8 row)
    from quiver_spark.algorithms.louvain import louvain

    def louvain_row():
        r = louvain(g, strategy="auto")
        return {
            "n_comm": r.assignment.select("comm").distinct().count(),
            "levels": r.n_levels,
            "q": round(r.q, 4),
        }

    extra["louvain"] = timed("louvain_communities", louvain_row)
    timed("pagerank_hierarchy_oracle_q", lambda: q_pagerank_hierarchy(spark, sf_dir).count())

    # --- training-data pipeline layer at bench scale ---
    from quiver_spark import dedup, simsearch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.near_duplicate_pairs(docs, threshold=0.5).persist()
    extra["near_dup_pairs"] = timed("doc_near_dup_pipeline", lambda: pairs.count())
    # the 100 TB dedup deliverable's missing measured stage (round-5
    # verdict item 6): verified pairs → distributed CC → canonical
    # keep/drop table. Timed over precomputed pairs so the row isolates
    # the clustering + doc-sized left join, not a re-run of minhash.
    extra["dedup_dropped"] = timed(
        "dedup_keep_table",
        lambda: dedup.canonical_keep_table(docs, pairs).filter(~F.col("keep")).count(),
    )
    pairs.unpersist()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def knn():
        q = emb.limit(64).select(F.col("vec_id").alias("qid"), "embedding")
        return simsearch.knn_join(emb, q, k=10).count()

    extra["knn_rows"] = timed("knn_join_64q", knn)

    def ivf_knn():
        # the distributed path (both sides stay distributed): index
        # build + 512 queries fanned to their nprobe cells
        cent = simsearch.ivf_centroids(emb, k=64)
        assigned = simsearch.ivf_assign(emb, cent)
        q = emb.limit(512).select(F.col("vec_id").alias("qid"), "embedding")
        return simsearch.ivf_knn_join(assigned, q, cent, k=10, nprobe=8).count()

    extra["ivf_knn_rows"] = timed("ivf_knn_join_512q", ivf_knn)

    # in-band box control (round-3 verdict item 2): a pinned numpy
    # kernel whose work never changes — suite walls are read RELATIVE
    # to it, so a busy driver box stops looking like a 2x regression
    from quiver_spark.boxprobe import box_control

    ctl = box_control()

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "graph_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "box_control": ctl,
        "value_normalized_to_ref_box": round(total / max(ctl["box_control_ratio"], 0.1), 1),
        **extra,
    }
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

"""spark-submit entrypoint for the quiver_spark engine.

The north rule (BASELINE.json:14) requires the engine to ship as
``spark-submit --py-files`` jobs. Package the library with
``python tools/package.py`` (writes ``dist/quiver_spark.zip``), then:

    spark-submit --py-files dist/quiver_spark.zip jobs/run.py \
        pagerank --input /data/repos_parquet --output /out/ranks \
        --run-dir /ckpt/pr_run1 --strategy auto --tol 1e-6

Subcommands: ``ingest``, ``pagerank``, ``components``, ``labelprop``,
``triangles``, ``scc``, ``kcore``, ``msf``, ``walks``, ``louvain``,
``synthesize``,
``near-dups``, ``dedup-keep``, ``ann-index``, ``stream-ingest``.
Every runner-based iterative job (pagerank / components / labelprop /
scc / kcore) takes ``--run-dir`` for durable checkpoints +
per-partition lineage + metrics, and is resumable: re-submitting the
same command with the same --run-dir continues from the newest
completed superstep (SuperstepRunner.run resume=True). ``msf``, ``walks``
and ``louvain`` are one-shot jobs and REFUSE --run-dir (msf/louvain
have no durable mid-contraction checkpoint; walks is deterministic — a
re-run reproduces the corpus bit-for-bit). ``stream-ingest`` is incrementally
resumable the streaming way: its --run-dir is the stream's
checkpointLocation, so a re-submit processes only repo-table files
that arrived since the last run.

On a cluster, --input/--output are any Spark-readable URIs (Iceberg
tables via ``--format iceberg`` where the catalog is configured; plain
Parquet here — SURVEY.md §7 Iceberg caveat).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def _spark(args) -> SparkSession:
    # under spark-submit the master/conf come from the submit command;
    # builder here only fills local-run defaults
    b = SparkSession.builder.appName(f"quiver-{args.cmd}")
    if args.master:
        b = b.master(args.master)
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    return b.getOrCreate()


def _read(spark: SparkSession, uri: str, fmt: str):
    return spark.read.format(fmt).load(uri) if fmt != "table" else spark.table(uri)


def _load_graph(spark: SparkSession, args):
    from quiver_spark import ingest as ing
    from quiver_spark.graph import Graph

    if args.edges_input:
        g = Graph.from_edges(_read(spark, args.edges_input, args.format))
    else:
        repos = (
            ing.synthesize_repo_table(spark, n_files=args.n_files, seed=args.seed)
            if args.synthesize
            else _read(spark, args.input, args.format)
        )
        g = ing.ingest(repos)
    g.persist()
    return g


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="quiver-spark")
    ap.add_argument(
        "cmd",
        choices=[
            "ingest", "pagerank", "components", "labelprop", "triangles",
            "scc", "kcore", "msf", "walks", "louvain",
            "synthesize", "near-dups", "dedup-keep", "ann-index",
            "stream-ingest",
        ],
    )
    ap.add_argument("--input", help="repo table URI (repo,path,commit,lang,content)")
    ap.add_argument("--edges-input", help="pre-built edge table URI (src,dst,...) instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet", help="parquet | iceberg | table")
    ap.add_argument("--run-dir", help="durable checkpoint/lineage/metrics dir (resumable)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--synthesize", action="store_true", help="generate the repo table instead of reading it")
    ap.add_argument("--n-files", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--num-iters", type=int, default=None, help="fixed superstep count (oracle mode)")
    ap.add_argument("--strategy", default="auto", help="physical strategy for pagerank/components/labelprop (auto/local/smj/bhj/csr/...; with --run-dir, auto never picks the driver-local tier — durable resume is a distributed-runner contract)")
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument(
        "--init-ranks",
        help="(pagerank) warm-start (id, rank) table URI — e.g. the previous run's "
        "--output after a stream-ingest delta; converges to the same fixpoint in "
        "far fewer supersteps when the graph changed little",
    )
    ap.add_argument(
        "--reset",
        help="(pagerank) personalized-teleport (id, weight) table URI — teleport "
        "and dangling mass land on this distribution (normalized) instead of "
        "uniformly; incompatible with --init-ranks",
    )
    ap.add_argument("--label-col", default="lang")
    ap.add_argument("--lp-iters", type=int, default=10)
    ap.add_argument("--jaccard", type=float, default=0.7, help="near-dups verify threshold")
    ap.add_argument(
        "--weight-col", default=None,
        help="(msf) integral edge-weight column; omitted = unit weights "
        "(any spanning forest — still unique under the (w, src, dst) order)",
    )
    ap.add_argument("--tail-tol", type=float, default=0.0,
                    help="(louvain) per-round relative gain floor: end a level "
                         "once a round's realized dQ <= tail_tol (0 = exact "
                         "local-moving fixpoint)")
    ap.add_argument("--walks-per-vertex", type=int, default=1, help="(walks) corpus width")
    ap.add_argument("--walk-len", type=int, default=10, help="(walks) steps per walk")
    ap.add_argument("--direction", default="out", help="(walks) out | in | both")
    ap.add_argument("--ivf-cells", type=int, default=64, help="ann-index coarse centroid count")
    ap.add_argument(
        "--max-files-per-trigger", type=int, default=0,
        help="(stream-ingest) bound files per micro-batch (0 = all available)",
    )
    args = ap.parse_args(argv)

    if args.init_ranks and args.num_iters:
        # --num-iters exists for bit-comparable oracle runs (exactly K
        # supersteps from the uniform start); a warm start makes the
        # K-step output depend on the init table, silently defeating
        # that purpose (ADVICE r4). Warm starts converge-to-tolerance.
        ap.error("--init-ranks (warm start) cannot be combined with "
                 "--num-iters (fixed-iteration oracle mode); use --tol")
    if args.reset and args.init_ranks:
        # mirrors pagerank(reset=..., init_ranks=...) raising: the warm
        # start's renormalization assumes the uniform-teleport fixpoint
        ap.error("--reset (personalized teleport) cannot be combined with "
                 "--init-ranks (warm start)")
    if args.run_dir and args.cmd in ("msf", "walks", "louvain"):
        # one-shot jobs: msf/louvain have no durable mid-contraction
        # checkpoint, walks is deterministic (a re-run reproduces the
        # corpus bit-for-bit) — refuse instead of silently voiding the
        # resume contract the flag advertises
        ap.error(f"{args.cmd} does not support --run-dir (one-shot job; "
                 "resume has nothing durable to continue from)")

    spark = _spark(args)
    from quiver_spark.superstep import SuperstepRunner
    from quiver_spark.table_io import TableIO

    # output writes route through the format seam: parquet here,
    # Iceberg writeTo when --format iceberg and a catalog is configured
    io = TableIO(spark, "iceberg" if args.format == "iceberg" else "parquet")

    runner = (
        SuperstepRunner(spark, run_dir=args.run_dir, checkpoint_every=args.checkpoint_every)
        if args.run_dir
        else None
    )

    if args.cmd == "synthesize":
        from quiver_spark import ingest as ing

        io.write(ing.synthesize_repo_table(spark, n_files=args.n_files, seed=args.seed), args.output)
        print(json.dumps({"job": "synthesize", "n_files": args.n_files, "output": args.output}))
        return 0

    if args.cmd == "ann-index":
        # IVF index build: assign every vector to its coarse cell and
        # write partitioned BY CELL — at scale an ANN query then reads
        # only its nprobe cells (partition pruning IS the index probe)
        from quiver_spark import simsearch

        emb = _read(spark, args.input, args.format)
        cent = simsearch.ivf_centroids(emb, k=args.ivf_cells)
        assigned = simsearch.ivf_assign(emb, cent)
        # both writes route through the format seam (parquet here,
        # Iceberg writeTo on a cluster): the cell-partitioned vector
        # table AND the centroid table — a centroids.npy on the driver's
        # local filesystem would be unreadable from a cluster job
        io.write(assigned, args.output, partition_by=["cell"])
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
            "cell int, centroid array<double>",
        )
        io.write(cent_df, args.output + "_centroids")
        print(json.dumps({
            "job": "ann-index", "cells": int(args.ivf_cells),
            "vectors": io.read(args.output).count(), "output": args.output,
        }))
        return 0

    if args.cmd == "near-dups":
        # documents near-duplicate pairs: minhash → LSH bands → jaccard
        from quiver_spark import dedup

        docs = _read(spark, args.input, args.format)
        pairs = dedup.near_duplicate_pairs(docs, threshold=args.jaccard)
        io.write(pairs, args.output)
        print(json.dumps({"job": "near-dups", "pairs": io.read(args.output).count()}))
        return 0

    if args.cmd == "dedup-keep":
        # the 100 TB dedup deliverable: near-dup pairs → distributed CC
        # → one canonical doc per cluster; output is the per-doc
        # (doc_id, component, keep) table (filter(keep) = deduped corpus)
        from quiver_spark import dedup

        docs = _read(spark, args.input, args.format)
        pairs = dedup.near_duplicate_pairs(docs, threshold=args.jaccard)
        keep = dedup.canonical_keep_table(docs, pairs)
        io.write(keep, args.output)
        written = io.read(args.output)
        print(json.dumps({
            "job": "dedup-keep",
            "docs": written.count(),
            "kept": written.filter("keep").count(),
        }))
        return 0

    if args.cmd == "stream-ingest":
        # incremental link-graph maintenance over a repo-table feed:
        # processes files that arrived under --input since the last
        # submit with this --run-dir (streaming checkpoint), lands
        # per-batch graph increments under --output, then reports the
        # assembled graph (== ingest over everything seen so far)
        if not args.run_dir:
            raise SystemExit("stream-ingest requires --run-dir (the stream checkpoint)")
        from quiver_spark import streaming

        opts = (
            {"maxFilesPerTrigger": str(args.max_files_per_trigger)}
            if args.max_files_per_trigger
            else {}
        )
        stream = streaming.read_stream_like(spark, args.input, **opts)
        q = streaming.incremental_ingest(stream, args.output, args.run_dir)
        q.awaitTermination()
        g = streaming.load_incremental_graph(spark, args.output)
        print(json.dumps({
            "job": "stream-ingest",
            "vertices": g.count_nodes(),
            "edges": g.count_edges(),
        }))
        return 0

    g = _load_graph(spark, args)

    if args.cmd == "ingest":
        io.write(g.vertices, args.output + "/vertices")
        io.write(g.edges, args.output + "/edges")
        out = {"job": "ingest", "vertices": g.count_nodes(), "edges": g.count_edges()}
    elif args.cmd == "pagerank":
        from quiver_spark.algorithms import pagerank

        res = pagerank(
            g,
            tol=None if args.num_iters else args.tol,
            num_iters=args.num_iters,
            max_iters=args.max_iters,
            strategy=args.strategy,
            runner=runner,
            init_ranks=_read(spark, args.init_ranks, args.format) if args.init_ranks else None,
            reset=_read(spark, args.reset, args.format) if args.reset else None,
        )
        io.write(res.state, args.output)
        out = {
            "job": "pagerank",
            "supersteps": res.supersteps,
            "converged": res.converged,
            "resumed_from": res.resumed_from,
        }
    elif args.cmd == "components":
        from quiver_spark.algorithms import connected_components

        res = connected_components(
            g, max_iters=args.max_iters, strategy=args.strategy, runner=runner
        )
        io.write(res.state, args.output)
        out = {"job": "components", "supersteps": res.supersteps, "resumed_from": res.resumed_from}
    elif args.cmd == "labelprop":
        from quiver_spark.algorithms import label_propagation

        res = label_propagation(
            g, label_col=args.label_col, num_iters=args.lp_iters,
            strategy=args.strategy, runner=runner,
        )
        io.write(res.state, args.output)
        out = {"job": "labelprop", "supersteps": res.supersteps, "resumed_from": res.resumed_from}
    elif args.cmd == "scc":
        from quiver_spark.algorithms import strongly_connected_components

        res = strongly_connected_components(
            g, max_iters=args.max_iters, strategy=args.strategy, runner=runner
        )
        io.write(res.state, args.output)
        out = {"job": "scc", "outer_rounds": res.supersteps, "resumed_from": res.resumed_from}
    elif args.cmd == "kcore":
        from quiver_spark.algorithms import kcore

        res = kcore(
            g, num_iters=args.num_iters, max_iters=args.max_iters,
            strategy=args.strategy, runner=runner,
        )
        io.write(res.state, args.output)
        out = {"job": "kcore", "supersteps": res.supersteps, "resumed_from": res.resumed_from}
    elif args.cmd == "triangles":
        from quiver_spark.algorithms import triangle_count

        n_tri = triangle_count(g)
        io.write(spark.createDataFrame([(int(n_tri),)], "triangles long"), args.output)
        out = {"job": "triangles", "triangles": int(n_tri)}
    elif args.cmd == "msf":
        from pyspark.sql import functions as F

        from quiver_spark.algorithms.msf import minimum_spanning_forest
        from quiver_spark.graph import Graph

        gw = g if args.weight_col else Graph(
            g.vertices, g.edges.withColumn("_unit_w", F.lit(1))
        )
        forest = minimum_spanning_forest(
            gw, weight_col=args.weight_col or "_unit_w", max_iters=args.max_iters
        )
        io.write(forest, args.output)
        out = {"job": "msf", "forest_edges": io.read(args.output).count()}
    elif args.cmd == "louvain":
        from quiver_spark.algorithms.louvain import louvain

        # louvain itself validates the strategy (auto/local/smj)
        res = louvain(
            g, weight_col=args.weight_col or None, strategy=args.strategy,
            tail_tol=args.tail_tol,
        )
        io.write(res.assignment, args.output)
        out = {
            "job": "louvain", "levels": res.n_levels,
            "rounds_per_level": res.rounds_per_level,
            "q": res.q, "s_total": res.s_total,
        }
    elif args.cmd == "walks":
        from quiver_spark.algorithms.walks import random_walks

        corpus = random_walks(
            g, walks_per_vertex=args.walks_per_vertex, length=args.walk_len,
            direction=args.direction, seed=args.seed,
        )
        io.write(corpus, args.output)
        out = {"job": "walks", "rows": io.read(args.output).count()}
    else:  # pragma: no cover
        raise SystemExit(2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Landmark (multi-source, per-seed) BFS distances and the centrality
estimators built on them: harmonic centrality and seed eccentricity.

Beyond the SURVEY §2 inventory; closeness/harmonic centrality is the
standard "how reachable is this page" score a link-graph user computes
next after PageRank, and exact all-pairs BFS is Θ(V·E) — nobody runs
that at 10^12 files. The production shape is LANDMARK estimation
(Eppstein & Wang, "Fast approximation of centrality", SODA 2001;
Potamias et al., "Fast shortest path distance estimation in large
networks", CIKM 2009): run per-seed BFS from K deterministic seeds and
estimate per-vertex centrality from the K exact distances. K controls
cost — frontier state is at most K·V rows, each round is one edge
join + one (seed,id) anti-join + one min-aggregate, the same per-round
shape as traverse.bfs with a composite key.

Harmonic centrality is reported as the EXACT integer
``hsum_e9 = Σ_seeds floor(1e9 / dist)`` (dist ≥ 1; the seed itself
contributes nothing): integer per term, so the sum is bit-exact under
any aggregation order and the DuckDB twin (queries.py
``harmonic_parts`` / ``ecc_parts``) needs no fp escape hatch. The
float estimator ĉ_H(v) = (n−1)/(K·1e9) · hsum_e9 is the caller's one
multiplication.

100 TB notes: seeds are a driver-side list (K ≪ V — that is the
point of the method); the frontier gets the same capped-broadcast
hint as traverse.bfs; visited grows to K·V rows keyed (seed, id) and
is checkpoint-truncated on the shared cadence. Eccentricity from K
landmarks is a LOWER bound on the true diameter (standard; reported
per seed so the caller sees the spread)."""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph, _ids_df
from quiver_spark.superstep import truncated_checkpoint
from quiver_spark.traverse import BROADCAST_FRONTIER_MAX, _edges_for

H_SCALE = 1_000_000_000  # 1e9: exact integer harmonic terms


def landmark_distances(
    graph: Graph,
    seeds: Iterable[int] | DataFrame,
    direction: str = "both",
    max_depth: int | None = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Exact BFS distance from every seed to every vertex it reaches:
    ``(seed, id, dist)``, dist 0 for the seed itself. Per-seed state is
    kept separate (unlike traverse.bfs, whose forest merges frontiers),
    so overlapping seed neighborhoods each carry their own distance."""
    spark = graph.spark
    edges = _edges_for(graph, direction)
    edges.persist()
    try:
        frontier = _ids_df(spark, seeds).select(
            F.col("id").alias("seed"), "id", F.lit(0).alias("dist")
        )
        visited = frontier = truncated_checkpoint(frontier)
        frontier_n = frontier.count()
        dist = 0
        while frontier_n > 0 and (max_depth is None or dist < max_depth):
            dist += 1
            f_hint = F.broadcast(frontier) if frontier_n <= BROADCAST_FRONTIER_MAX else frontier
            nxt = (
                edges.join(f_hint, edges["u"] == frontier["id"])
                .select("seed", F.col("v").alias("id"), F.lit(dist).alias("dist"))
                .dropDuplicates(["seed", "id"])
                .join(visited.select("seed", "id"), ["seed", "id"], "left_anti")
            )
            nxt = truncated_checkpoint(nxt)
            frontier_n = nxt.count()
            if frontier_n:
                visited = visited.unionByName(nxt)
                if dist % checkpoint_every == 0:
                    visited = truncated_checkpoint(visited)
            frontier = nxt
        return visited
    finally:
        edges.unpersist()


def harmonic_centrality(
    graph: Graph,
    seeds: Iterable[int] | DataFrame,
    direction: str = "both",
    max_depth: int | None = None,
) -> DataFrame:
    """Landmark harmonic-centrality terms per vertex:
    ``(id, reach, hsum_e9)`` where reach counts seeds at dist ≥ 1 and
    ``hsum_e9 = Σ floor(1e9/dist)`` — exact integers; scale by
    (n−1)/(K·1e9) for the ĉ_H estimate. Vertices no seed reaches are
    absent (their estimate is 0)."""
    d = landmark_distances(graph, seeds, direction=direction, max_depth=max_depth)
    return (
        d.where(F.col("dist") >= 1)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("reach"),
            F.sum(F.floor(F.lit(H_SCALE) / F.col("dist")).cast("long"))
            .cast("long")
            .alias("hsum_e9"),
        )
    )


def closeness_centrality(
    graph: Graph,
    seeds: Iterable[int] | DataFrame,
    direction: str = "both",
    max_depth: int | None = None,
) -> DataFrame:
    """Landmark closeness-centrality terms per vertex: ``(id, reach,
    dsum)`` where reach counts seeds at dist ≥ 1 and ``dsum = Σ dist``
    — exact integers (closeness is a ratio of counts and distance
    sums, so unlike harmonic no scaling constant is needed). The
    Wasserman–Faust estimate ĉ_C(v) = reach² / ((n−1)·dsum) is the
    caller's one division; vertices no seed reaches are absent (their
    estimate is 0). Same landmark premise/cost as harmonic_centrality
    (Eppstein & Wang, SODA 2001): K·V state, one BFS round per level."""
    d = landmark_distances(graph, seeds, direction=direction, max_depth=max_depth)
    return (
        d.where(F.col("dist") >= 1)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("reach"),
            F.sum("dist").cast("long").alias("dsum"),
        )
    )


def sp_counts(
    graph: Graph,
    seeds: Iterable[int] | DataFrame,
    direction: str = "out",
    max_depth: int | None = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Per-seed BFS distance AND exact shortest-path count:
    ``(seed, id, dist, sigma)`` — the forward half of Brandes'
    betweenness (Brandes, "A faster algorithm for betweenness
    centrality", J. Math. Sociol. 2001). σ is the EXACT int64 number
    of distinct shortest paths (level-synchronous: every shortest
    path to a level-d+1 vertex extends a level-d frontier vertex, so
    one sum-aggregate per round accumulates it; parallel edges
    collapse — path counts are over the simple pair set, matching the
    traversal surface). int64 overflows only past ~9e18 paths; grids
    get there, link graphs don't (documented, not guarded)."""
    spark = graph.spark
    edges = _edges_for(graph, direction)
    edges.persist()
    try:
        frontier = _ids_df(spark, seeds).select(
            F.col("id").alias("seed"), "id", F.lit(0).alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        )
        visited = frontier = truncated_checkpoint(frontier)
        frontier_n = frontier.count()
        dist = 0
        while frontier_n > 0 and (max_depth is None or dist < max_depth):
            dist += 1
            f_hint = F.broadcast(frontier) if frontier_n <= BROADCAST_FRONTIER_MAX else frontier
            nxt = (
                edges.join(f_hint, edges["u"] == frontier["id"])
                .groupBy("seed", F.col("v").alias("id"))
                .agg(F.sum("sigma").cast("long").alias("sigma"))
                .join(visited.select("seed", "id"), ["seed", "id"], "left_anti")
                .select("seed", "id", F.lit(dist).alias("dist"), "sigma")
            )
            nxt = truncated_checkpoint(nxt)
            frontier_n = nxt.count()
            if frontier_n:
                visited = visited.unionByName(nxt)
                if dist % checkpoint_every == 0:
                    visited = truncated_checkpoint(visited)
            frontier = nxt
        return visited
    finally:
        edges.unpersist()


def betweenness(
    graph: Graph,
    seeds: Iterable[int] | DataFrame,
    direction: str = "out",
    max_depth: int | None = None,
) -> DataFrame:
    """Sampled betweenness centrality (Brandes' dependency
    accumulation over K source samples — the standard estimator for
    graphs where exact O(V·E) Brandes is unrunnable): ``(id,
    delta_sum)`` with delta_sum = Σ_seeds δ_seed(id) over id ≠ seed.
    The unbiased estimate of bc(v) is (n/K)·delta_sum.

    Backward pass: one round per BFS level, descending — the
    shortest-path DAG is materialized ONCE (edges ⋈ dist ⋈ dist,
    dv = du+1), each round is a filter on that persisted frame + one
    join against the δ rows written by the PREVIOUS round + one
    aggregate. Every (seed, u) receives its δ in exactly one round
    (the one processing level d(u)+1), so accumulation is a blind
    union — no read-modify-write state join. δ is float64 (ratios of
    σ); the exact-integer forward half is what the DuckDB twin
    value-checks (queries.py ``spcount_parts``), the float half is
    pinned against brute Brandes in pytest."""
    sp = truncated_checkpoint(sp_counts(graph, seeds, direction=direction, max_depth=max_depth))
    e = _edges_for(graph, direction).select(
        F.col("u").alias("eu"), F.col("v").alias("ev")
    )
    dag = (
        e.join(
            sp.select("seed", F.col("id").alias("eu"), F.col("dist").alias("du"),
                      F.col("sigma").alias("sigu")),
            "eu",
        )
        .join(
            sp.select("seed", F.col("id").alias("ev"), F.col("dist").alias("dv"),
                      F.col("sigma").alias("sigv")),
            ["seed", "ev"],
        )
        .where(F.col("dv") == F.col("du") + 1)
        .select("seed", F.col("eu").alias("u"), F.col("ev").alias("w"), "dv", "sigu", "sigv")
        .persist()
    )
    dag.count()
    try:
        maxd = sp.agg(F.max("dist")).first()[0] or 0
        spark = graph.spark
        schema = "seed long, id long, delta double"
        delta = spark.createDataFrame([], schema)
        lvl_delta = spark.createDataFrame([], schema)  # δ rows of level t
        for t in range(maxd, 0, -1):
            contrib = (
                dag.where(F.col("dv") == t)
                .join(
                    lvl_delta.select("seed", F.col("id").alias("w"), F.col("delta").alias("dw")),
                    ["seed", "w"],
                    "left",
                )
                .groupBy("seed", F.col("u").alias("id"))
                .agg(
                    F.sum(
                        (F.col("sigu").cast("double") / F.col("sigv"))
                        * (F.lit(1.0) + F.coalesce(F.col("dw"), F.lit(0.0)))
                    ).alias("delta")
                )
            )
            lvl_delta = truncated_checkpoint(contrib)
            delta = delta.unionByName(lvl_delta)
            if (maxd - t) % 8 == 7:
                delta = truncated_checkpoint(delta)
        return (
            delta.where(F.col("id") != F.col("seed"))
            .groupBy("id")
            .agg(F.sum("delta").alias("delta_sum"))
        )
    finally:
        dag.unpersist()


def eccentricity(
    graph: Graph,
    seeds: Iterable[int] | DataFrame,
    direction: str = "both",
    max_depth: int | None = None,
) -> DataFrame:
    """Per-seed eccentricity over its reachable set: ``(seed, ecc,
    reached)``. max(ecc) is the standard landmark LOWER bound on the
    graph's true diameter."""
    d = landmark_distances(graph, seeds, direction=direction, max_depth=max_depth)
    return d.groupBy("seed").agg(
        F.max("dist").cast("long").alias("ecc"),
        F.count(F.lit(1)).cast("long").alias("reached"),
    )

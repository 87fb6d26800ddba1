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

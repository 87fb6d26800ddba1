"""Modularity of a vertex partition over the simple undirected graph.

Beyond the SURVEY §2 inventory; modularity (Newman & Girvan, "Finding
and evaluating community structure in networks", Phys. Rev. E 69,
2004) is THE standard objective a link-graph user scores a community
assignment against — the natural consumer of the engine's own
partition producers (connected components, label propagation, SCC).
quiver exposes the building blocks [pub: Verizon/quiver
core/src/main/scala/quiver/Graph.scala#degree]; this operator is the
composition a migrating user writes next.

For partition C over the simple undirected graph with m canonical
edges:

    Q = Σ_c ( internal_c / m  −  (dtot_c / 2m)² )

where internal_c counts edges with BOTH endpoints in c and dtot_c is
the sum of member degrees. All moments are exact integers — the only
fp is the caller's final two divisions — so the DuckDB twin
(queries.py ``modularity_parts``) is bit-comparable with no rounding
escape hatch, like assortativity's moment table.

Plan shape & 100 TB notes:

- One canonical-edge dedup, one degree aggregate, then TWO
  edge ⋈ assignment joins (attach each endpoint's community) and one
  groupBy(comm) with map-side combine — the same shuffle shape as any
  edge/state join in the iterative flagships; no all-pairs term
  anywhere.
- The assignment is vertex-sized: at mirror scale Catalyst broadcasts
  it (AQE); beyond, the joins shuffle on id like every superstep.
- Skew: a giant community concentrates its AGGREGATE rows on one key,
  but the aggregate is algebraic (sum/count) so map-side combine
  bounds the hot partition at one row per upstream task — no salting
  needed (same argument as degree counting).
- Self-loops and edge multiplicity are dropped (simple-graph notion,
  like kcore); unassigned vertices raise — a silent inner-join drop
  would misreport Q for a partial assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph


def modularity_moments(graph: Graph, assignment: DataFrame) -> DataFrame:
    """Per-community exact-integer modularity moments of ``graph``'s
    simple undirected view under ``assignment`` (columns ``id``,
    ``comm``): returns ``(comm, n_nodes, internal, dtot)``.

    Q = Σ_c (internal_c/m − (dtot_c/2m)²) with m = the canonical edge
    count (``modularity`` computes it); Σ_c dtot_c = 2m when the
    assignment covers every vertex (law-tested).

    Raises if any graph vertex is missing from the assignment —
    modularity over a silent subset is a wrong answer, not a default.
    """
    asg = assignment.select("id", "comm")
    missing = graph.vertices.select("id").join(asg, "id", "left_anti")
    n_missing = missing.count()
    if n_missing:
        raise ValueError(
            f"assignment misses {n_missing} graph vertices — modularity "
            "needs full coverage (assign singletons explicitly)"
        )
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    eb = canon.select(F.col("a").alias("id")).unionByName(
        canon.select(F.col("b").alias("id"))
    )
    deg = eb.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("d"))
    # per-community node count + degree total (isolated members: d=0)
    members = (
        graph.vertices.select("id")
        .join(asg, "id")
        .join(deg, "id", "left")
        .groupBy("comm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.coalesce(F.col("d"), F.lit(0))).cast("long").alias("dtot"),
        )
    )
    # internal edges: both endpoints in the same community
    internal = (
        canon.join(asg.select(F.col("id").alias("a"), F.col("comm").alias("ca")), "a")
        .join(asg.select(F.col("id").alias("b"), F.col("comm").alias("cb")), "b")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("comm"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal"))
    )
    return members.join(internal, "comm", "left").select(
        "comm",
        "n_nodes",
        F.coalesce(F.col("internal"), F.lit(0)).cast("long").alias("internal"),
        "dtot",
    )


def modularity(graph: Graph, assignment: DataFrame) -> float:
    """Newman–Girvan Q of ``assignment`` over ``graph``'s simple
    undirected view — the one-row fold of ``modularity_moments``; the
    exact integer sums leave the driver-side floats as the only fp."""
    mom = modularity_moments(graph, assignment)
    row = mom.agg(
        F.sum("internal").alias("si"),
        F.sum(F.col("dtot") * F.col("dtot")).alias("sdd"),
        (F.sum("dtot") / F.lit(2)).cast("long").alias("m"),
    ).first()
    if not row.m:
        return 0.0
    return row.si / row.m - row.sdd / (4.0 * row.m * row.m)

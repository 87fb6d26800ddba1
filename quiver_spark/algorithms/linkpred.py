"""Link prediction over the simple undirected graph: common-neighbor
counts and the resource-allocation index.

Beyond the SURVEY §2 inventory; predicting missing links is the
canonical *use* of a link-graph engine's adjacency surface (quiver
exposes the neighborhood primitives [pub: Verizon/quiver
core/src/main/scala/quiver/Graph.scala#neighbors]; this operator is
what a migrating user composes them into). Scores follow Zhou, Lü &
Zhang, "Predicting missing links via local information" (Eur. Phys.
J. B 71, 2009): for a non-adjacent pair (a, b),

    common(a,b) = |N(a) ∩ N(b)|                    (common neighbors)
    ra(a,b)     = Σ_{z ∈ N(a) ∩ N(b)}  1 / deg(z)  (resource allocation)

RA is reported as the EXACT integer ``ra_e12 = Σ floor(1e12/deg(z))``:
the per-wedge weight is an integer function of an integer degree, so
the sum is bit-exact under ANY aggregation order — the DuckDB twin
(queries.py ``linkpred_parts``) matches without fp-rounding hazards.
(Adamic-Adar's 1/ln(deg) weights would hang the oracle on libm's last
ulp; RA is the published index with the same hub-discounting shape
and an exact integer form.)

Plan shape & 100 TB notes:

- One canonical-edge dedup, one degree aggregate, then a single
  self-join of the directed-both-ways edge list on the CENTER vertex
  ``z`` — the per-pair weight is attached to the z-side BEFORE the
  join, so the aggregate is a plain sum/count groupBy on (a, b) with
  map-side combine.
- The z-join's fan-out is Σ_z deg(z)² — quadratic in hub degree, and
  that is inherent to the metric's definition, not the plan. The
  standard production mitigation is ``max_hub_degree``: wedges through
  centers above the cap are dropped. A hub's per-pair contribution is
  ≤ 1/cap (RA discounts hubs by construction), so the score error is
  bounded and the skew is bounded with it; the cap is OPT-IN so the
  default stays exact for the oracle.
- ``top_k`` ranks candidates per left vertex with a deterministic
  (score desc, common desc, b asc) tie-break via a single window —
  the usual shape actually shipped to a recommender.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quiver_spark.graph import Graph

RA_SCALE = 1_000_000_000_000  # 1e12: exact integer RA weights


def link_prediction(
    graph: Graph,
    min_common: int = 1,
    max_hub_degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Score non-adjacent vertex pairs of the simple undirected view
    of ``graph`` by common-neighbor count and resource-allocation
    index. Returns ``(a, b, common, ra_e12)`` with ``a < b``;
    ``ra_e12`` is the exact integer Σ floor(1e12 / deg(z)).

    ``max_hub_degree`` (opt-in) drops wedges whose CENTER vertex has
    degree above the cap — the documented skew guard for power-law
    graphs; scores lose only hub terms, each worth ≤ 1e12/cap.
    ``top_k`` keeps the k best candidates per ``a`` (score desc,
    common desc, b asc).
    """
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    eb = canon.select(F.col("a").alias("z"), F.col("b").alias("v")).unionByName(
        canon.select(F.col("b").alias("z"), F.col("a").alias("v"))
    )
    deg = eb.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("d"))
    if max_hub_degree is not None:
        deg = deg.where(F.col("d") <= F.lit(int(max_hub_degree)))
    # attach the integer wedge weight to the center ONCE, pre-join
    # floor(double-div), NOT cast-truncate: DuckDB's double→BIGINT cast
    # rounds while Spark's truncates — explicit floor on both sides is
    # the only spelling that is bit-identical cross-engine
    ctr = eb.join(deg, "z").select(
        "z", "v", F.floor(F.lit(RA_SCALE) / F.col("d")).cast("long").alias("w")
    )
    lhs = ctr.select("z", F.col("v").alias("a"), "w")
    rhs = ctr.select("z", F.col("v").alias("b"))
    scored = (
        lhs.join(rhs, "z")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum("w").cast("long").alias("ra_e12"),
        )
        .where(F.col("common") >= F.lit(int(min_common)))
        # predictions only: drop pairs that are already edges
        .join(canon, ["a", "b"], "left_anti")
    )
    if top_k is not None:
        w = Window.partitionBy("a").orderBy(
            F.col("ra_e12").desc(), F.col("common").desc(), F.col("b").asc()
        )
        scored = (
            scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= F.lit(int(top_k)))
            .drop("rk")
        )
    return scored

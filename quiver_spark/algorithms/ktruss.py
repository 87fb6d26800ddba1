"""k-truss decomposition (edge peeling by triangle support).

Beyond the SURVEY §2 inventory; the k-truss (Cohen, "Trusses:
cohesive subgraphs for social network analysis", NSA tech report
2008; distributed formulation in Chen et al., "Distributed k-truss
decomposition", IEEE BigData 2014) is the standard edge-level
community core — denser than k-core, cheaper than cliques — and the
natural next step after the engine's triangle surface
(algorithms/triangles.py, same degree-orientation kernel).

Definition: the k-truss is the maximal subgraph of the simple
undirected graph in which every edge is supported by ≥ k−2 triangles
WITHIN the subgraph. Computed by peeling: per round, count each
edge's triangle support over the REMAINING edges, drop edges below
k−2, repeat to fixpoint.

Plan shape & 100 TB notes:

- Per round, support comes from the SAME degree-oriented wedge join
  as triangle_count — orientation by (degree, id) bounds per-vertex
  oriented out-degree at O(√m) under any skew, so the wedge join
  never explodes on hubs; each triangle is enumerated ONCE and
  exploded to its three canonical edges, then one groupBy(a, b)
  count with map-side combine.
- Orientation and degrees are recomputed per round (they change as
  edges peel) — the standard distributed trade; production systems
  add incremental support maintenance, documented not built.
- Rounds are monotone (the edge set only shrinks), so fixpoint is
  well-defined; worst case O(m) rounds on adversarial peels, small
  on real link graphs (2 rounds on the sf0.01 bowtie at k=4).
  Fixpoint mode RAISES at ``max_iters`` (kcore/scc contract);
  ``num_iters`` pins rounds for the bit-exact oracle — the DuckDB
  twin (queries.py ``ktruss_parts``) recounts support per round via
  the UNORIENTED common-neighbor join, a different enumeration of
  the same integer, so parity is cross-family evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import truncated_checkpoint


def _canon_simple(graph: Graph) -> DataFrame:
    return (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def _support(canon: DataFrame) -> DataFrame:
    """Per-edge triangle support over the canonical edge set:
    ``(a, b, support)`` for EVERY input edge (0 when none). Oriented
    wedge join → one row per triangle → explode its three canonical
    edges → count."""
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = canon.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a").join(
        deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b"
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).persist()
    o.count()
    try:
        e1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
        e2 = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
        wedges = e1.join(e2, "y")
        closing = o.select(F.col("u").alias("x"), F.col("v").alias("z"))
        tri = wedges.join(closing, ["x", "z"], "left_semi")
        tri_edges = tri.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
                    ),
                    F.struct(
                        F.least("y", "z").alias("a"), F.greatest("y", "z").alias("b")
                    ),
                    F.struct(
                        F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")
                    ),
                )
            ).alias("e")
        ).select("e.a", "e.b")
        sup = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("support"))
        out = canon.join(sup, ["a", "b"], "left").select(
            "a", "b", F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support")
        )
        return truncated_checkpoint(out)
    finally:
        o.unpersist()


def ktruss(
    graph: Graph,
    k: int,
    num_iters: int | None = None,
    max_iters: int = 50,
) -> DataFrame:
    """Edges of the k-truss of ``graph``'s simple undirected view:
    ``(a, b, support)`` with a < b and support = the edge's triangle
    count WITHIN the returned subgraph (≥ k−2 at fixpoint).

    ``num_iters`` pins the peel-round count (oracle mode: the output
    is whatever survives T rounds, supports recounted over that set);
    default fixpoint mode peels until stable and RAISES at
    ``max_iters`` (no silent partial truss)."""
    if k < 2:
        raise ValueError("k >= 2 required (k=2 is the whole simple graph)")
    rem = truncated_checkpoint(_canon_simple(graph))
    n = rem.count()
    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    t = 0
    while t < total:
        sup = _support(rem)
        kept = sup.where(F.col("support") >= F.lit(k - 2)).select("a", "b")
        kept = truncated_checkpoint(kept)
        n_kept = kept.count()
        t += 1
        if n_kept == n and not fixed:
            return sup  # fixpoint: supports already reflect this set
        rem, n = kept, n_kept
        if n == 0:
            break
    if not fixed and t >= max_iters:
        raise RuntimeError(
            f"ktruss(k={k}) did not reach its fixpoint in max_iters={max_iters} "
            "rounds — raise max_iters (no silent partial truss)"
        )
    return _support(rem)

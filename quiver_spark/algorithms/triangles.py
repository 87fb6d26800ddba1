"""Exact triangle counting with degree-based edge orientation.

North-rule flagship (BASELINE.json:14); not a quiver symbol — in
quiver a triangle is three mutual ``Context`` memberships
[pub: Verizon/quiver core/src/main/scala/quiver/package.scala#Context].

Semantics: triangles of the *underlying simple undirected graph* —
edge direction and parallel labeled edges collapse first (standard
graph-mining convention; multiplicities would double-count the same
topological triangle).

Scale design — the classic compact-forward / degree-orientation
trick: orient every undirected edge from the endpoint with smaller
(degree, id) to the larger. The oriented graph is a DAG where every
vertex's out-degree is O(sqrt(m)) on any graph, so the wedge join
``E ⋈ E`` is bounded even under power-law skew — THE defense against
a hub vertex generating deg² wedges. Count = wedges that close with
an oriented edge (left-semi join, no row explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph


def _oriented_edges(graph: Graph) -> DataFrame:
    """Undirected simple edges oriented by (degree, id) order.

    The deduped pair table feeds the degree aggregate (twice, via the
    endpoint union) AND the orientation join — persisted so the
    union+dropDuplicates shuffle over the full edge set runs once, not
    once per consumer. Orientation is a single conditional projection
    over the degree-joined frame (not two filter passes + a union), so
    ``e`` — itself two joins — is scanned once."""
    und = (
        graph.edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .filter(F.col("a") != F.col("b"))  # self-loops never close triangles
        .unionByName(graph.edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .dropDuplicates()
        .filter(F.col("a") < F.col("b"))  # canonical undirected pair
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    e = und.join(da, "a").join(db, "b")
    # orient low (deg, id) → high (deg, id); ties break on id, so the
    # two when-branches are exhaustive (a == b was filtered above)
    fwd = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    oriented._qs_und = und  # noqa: SLF001 — released once oriented materializes
    return oriented


def _triangle_triples(graph: Graph) -> DataFrame:
    """One row per triangle: (x, y, z) vertex ids, each triangle once."""
    o = _oriented_edges(graph)
    und = o._qs_und  # noqa: SLF001
    o = o.persist()
    o.count()  # materialize the oriented cache: the pair-table cache
    und.unpersist()  # is then done — wedge/closing scans read `o` only
    e1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedges = e1.join(e2, "y")
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("z"))
    out = wedges.join(closing, ["x", "z"], "left_semi").select("x", "y", "z")
    out._qs_oriented = o  # noqa: SLF001 — callers may unpersist after materializing
    return out


def triangle_count(graph: Graph, strategy: str = "auto") -> int:
    """Exact global triangle count.

    ``strategy``: ``auto`` routes graphs at or under
    ``spark.quiver.auto.localMaxEdges`` to the guarded driver-numpy
    compact-forward kernel (algorithms/local_tier.py — one-shot op,
    so there is no runner/resume concern); ``local`` / ``dist``
    force a tier. Both count the identical simple-undirected-graph
    triangles (equality-tested)."""
    if strategy == "auto":
        from quiver_spark import tiering

        strategy = (
            "local"
            if graph.edges.count() <= tiering.local_max_edges(graph.spark)
            else "dist"
        )
    if strategy == "local":
        from quiver_spark.algorithms import local_tier

        return local_tier.triangle_count_local(graph)
    t = _triangle_triples(graph)
    n = t.count()
    t._qs_oriented.unpersist()  # noqa: SLF001 — release the oriented-edge cache
    return n


def triangles_per_vertex(graph: Graph) -> DataFrame:
    """(id, triangles) for every vertex (0 for none).

    The returned frame reads the persisted oriented-edge cache; it is
    re-exposed as ``result._qs_oriented`` so callers can unpersist it
    once the result is materialized (otherwise every call strands one
    cached edge table for the session lifetime)."""
    t = _triangle_triples(graph)
    per = (
        t.select(F.col("x").alias("id"))
        .unionByName(t.select(F.col("y").alias("id")))
        .unionByName(t.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = graph.vertices.select("id").join(per, "id", "left").fillna(0, ["triangles"])
    out._qs_oriented = t._qs_oriented  # noqa: SLF001 — caller releases after materializing
    return out


def local_clustering_coefficient(graph: Graph) -> DataFrame:
    """(id, triangles, degree, lcc_e9) per vertex — the local
    clustering coefficient lcc(v) = 2·T(v) / (d(v)·(d(v)−1)) of the
    underlying simple undirected graph (same collapse as
    :func:`triangle_count`; ``degree`` is the distinct-neighbor
    count, NOT the labeled-multi-edge degree), 0 when d(v) < 2.

    ``lcc_e9`` = floor(lcc·1e9 + 0.5): the ratio of exact integers is
    one IEEE division on both engines, so the DuckDB twin matches
    bit-for-bit with no sum-order tolerance needed. The returned
    frame re-exposes the oriented-edge cache as ``_qs_oriented``
    (release discipline of :func:`triangles_per_vertex`).

    Scale shape: both aggregates (triangles from the triple table,
    degree from the oriented pair table) are map-side-combinable
    groupBys on frames the triangle pipeline already materializes;
    no new shuffle of edge-sized data beyond triangle counting
    itself.
    """
    t = _triangle_triples(graph)
    o = t._qs_oriented  # noqa: SLF001
    tri = (
        t.select(F.col("x").alias("id"))
        .unionByName(t.select(F.col("y").alias("id")))
        .unionByName(t.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        o.select(F.col("u").alias("id"))
        .unionByName(o.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    out = (
        graph.vertices.select("id")
        .join(tri, "id", "left")
        .join(deg, "id", "left")
        .fillna(0, ["triangles", "degree"])
    )
    lcc = F.when(
        F.col("degree") >= 2,
        (F.lit(2.0) * F.col("triangles")) / (F.col("degree") * (F.col("degree") - F.lit(1))),
    ).otherwise(F.lit(0.0))
    res = out.select(
        "id",
        F.col("triangles").cast("long").alias("triangles"),
        F.col("degree").cast("long").alias("degree"),
        F.floor(lcc * F.lit(1e9) + F.lit(0.5)).cast("long").alias("lcc_e9"),
    )
    res._qs_oriented = o  # noqa: SLF001 — caller releases after materializing
    return res

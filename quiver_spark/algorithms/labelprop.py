"""Synchronous label propagation with deterministic tie-breaks.

North-rule flagship (BASELINE.json:14). Semantics: every round, each
vertex adopts the most frequent label among its (undirected)
neighbors; ties break to the lexicographically smallest label;
isolated vertices keep their seed label. Synchronous rounds + the
deterministic tie-break make assignments exactly reproducible and
DuckDB-oracle-matchable (BASELINE.md exactness row).

One round = one ``GDecomp.extend`` superstep [pub: Verizon/quiver
core/src/main/scala/quiver/Decomp.scala#extend]: neighbor-label
histogram via groupBy(dst, label).count → argmax. The histogram
aggregation partial-combines map-side; the argmax is a max over a
(count, label) struct — no window, no shuffle beyond the groupBy
(SURVEY.md §2.8 row 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepRunner, SuperstepResult


def label_propagation(
    graph: Graph,
    label_col: str = "lang",
    num_iters: int | None = None,
    max_iters: int = 20,
    direction: str = "both",
    runner: SuperstepRunner | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id, label)``.

    ``num_iters`` pins the round count (oracle mode); otherwise stops
    when no vertex changes label (delta = #changed).
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    if direction == "both":
        msgs_edges = (
            graph.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .unionByName(graph.edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
            .dropDuplicates()
        )
    elif direction == "out":
        msgs_edges = graph.edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).dropDuplicates()
    else:
        msgs_edges = graph.edges.select(F.col("dst").alias("u"), F.col("src").alias("v")).dropDuplicates()
    msgs_edges = msgs_edges.persist()
    msgs_edges.count()

    state0 = graph.vertices.select("id", F.col(label_col).cast("string").alias("label"))
    fixed = num_iters is not None
    total = num_iters if fixed else max_iters

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        hist = (
            msgs_edges.join(state.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax with min-label tie-break: keep rows at the per-id max
        # count, then take the smallest label among them
        maxc = hist.groupBy("id").agg(F.max("cnt").alias("maxc"))
        best = (
            hist.join(maxc, "id")
            .filter(F.col("cnt") == F.col("maxc"))
            .groupBy("id")
            .agg(F.min("label").alias("new_label"))
        )
        new_state = (
            state.join(best, "id", "left")
            .select("id", F.coalesce(F.col("new_label"), F.col("label")).alias("label"))
        )
        if fixed:
            return new_state, None
        new_state = new_state.localCheckpoint()
        changed = (
            new_state.join(state.select("id", F.col("label").alias("_old")), "id")
            .filter(F.col("label") != F.col("_old"))
            .count()
        )
        return new_state, float(changed)

    try:
        return runner.run(state0, step, tol=None if fixed else 0.0, max_iters=total)
    finally:
        msgs_edges.unpersist()

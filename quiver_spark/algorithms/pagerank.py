"""Distributed PageRank over the (vertices, edges) pair.

The north-rule flagship (BASELINE.json:2): supersteps/sec and
edges-processed/sec to 1e-6 convergence are THE engine metric. Not a
quiver symbol — quiver has no ranking at all — but it is exactly one
``GDecomp.extend`` comonadic superstep iterated [pub: Verizon/quiver
core/src/main/scala/quiver/Decomp.scala#extend]: each vertex's new
label (rank) is a function of the graph focused at that vertex
(in-neighbors' ranks).

Scale design (SURVEY.md §2.8, §4.3):

- The edge table is projected once to ``(src, dst)`` (multiplicities
  kept — a parallel labeled edge is a second link, consistent with
  quiver's Set[B] identity), joined once with out-degrees to a
  reusable ``(src, dst, w=1/outdeg)`` frame, persisted across all
  supersteps. Only the small rank table moves each round.
- The per-superstep shuffle is the ``groupBy(dst)`` of contributions.
  Spark's hash aggregate already partial-combines map-side; for
  power-law in-degree skew the optional two-phase **salted**
  aggregation (`salt = pmod(xxhash64(src), n)` → partial sum on
  (dst, salt) → final sum on dst) bounds any single reducer key.
- Dangling mass (sinks — source-repo DAGs are full of them) is
  collected with one scalar agg per superstep and redistributed
  uniformly, so ranks always sum to 1 (conservation is a test).
- Fixed-iteration mode (``num_iters``) pins the superstep count for
  bit-comparable DuckDB oracles; tolerance mode (``tol``) runs to the
  1e-6 fixpoint with max-|delta| as the convergence metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepRunner, SuperstepResult


def _salted_sum(df: DataFrame, key: str, value: str, out: str, n_salts: int, salt_src: str) -> DataFrame:
    """Two-phase aggregation: partial sum on (key, salt) then final on
    key. Explicit skew defense for hot keys (BASELINE.json:6)."""
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_psum"))
    )
    return partial.groupBy(key).agg(F.sum("_psum").alias(out))


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    num_iters: int | None = None,
    max_iters: int = 100,
    n_salts: int | None = None,
    use_csr: bool = False,
    n_blocks: int | None = None,
    runner: SuperstepRunner | None = None,
) -> SuperstepResult:
    """Returns a SuperstepResult whose state is ``(id, rank)``.

    ``num_iters`` set → exactly that many supersteps, no convergence
    action (oracle mode). Otherwise iterate until max |Δrank| ≤ tol.

    ``use_csr=True`` runs each superstep's rank×edge combine through
    partition-local CSR blocks (quiver_spark.csr) — the north-rule
    scale path: the edge table is hash-blocked once, persisted, and
    each superstep shuffles only the small rank state plus
    pre-combined per-block (dst, partial) messages.
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)

    ids = graph.vertices.select("id").persist()
    n = ids.count()
    if n == 0:
        return SuperstepResult(state=spark.createDataFrame([], "id long, rank double"), supersteps=0)

    out_deg = graph.edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("od"))
    # reusable weighted edge frame: each edge instance carries 1/outdeg(src)
    edges_w = (
        graph.edges.select("src", "dst")
        .join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("w"))
        .persist()
    )
    edges_w.count()  # materialize before the loop
    dangling_ids = ids.join(out_deg.select("id"), "id", "left_anti").persist()

    blocked = None
    if use_csr:
        from quiver_spark import csr

        n_blocks = n_blocks or max(spark.sparkContext.defaultParallelism, 8)
        blocked = csr.blocked_edges(edges_w, n_blocks)
        blocked.count()

    base = (1.0 - damping) / n
    state0 = ids.select("id", F.lit(1.0 / n).alias("rank"))
    fixed = num_iters is not None
    total_iters = num_iters if fixed else max_iters

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        dangling_sum = (
            state.join(dangling_ids, "id", "left_semi").agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        if blocked is not None:
            from quiver_spark import csr

            summed = csr.csr_contributions(blocked, state, n_blocks)
        else:
            contribs = edges_w.join(state.withColumnRenamed("id", "src"), "src").select(
                "src", "dst", (F.col("rank") * F.col("w")).alias("c")
            )
            if n_salts and n_salts > 1:
                # salt by src: rows of one hot dst spread across n_salts
                # partial groups, so no single reducer key sees the full
                # in-degree of a super-node
                summed = _salted_sum(contribs, "dst", "c", "msum", n_salts, salt_src="src")
            else:
                summed = contribs.groupBy("dst").agg(F.sum("c").alias("msum"))
        new_state = (
            ids.join(summed.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * (F.coalesce(F.col("msum"), F.lit(0.0)) + F.lit(dangling_sum / n))
                ).alias("rank"),
            )
        )
        if fixed:
            return new_state, None
        prev = state.select("id", F.col("rank").alias("_prev"))
        # localCheckpoint here so the delta agg and the runner's own
        # checkpoint don't recompute the join twice
        new_state = new_state.localCheckpoint()
        delta = (
            new_state.join(prev, "id").agg(F.max(F.abs(F.col("rank") - F.col("_prev")))).collect()[0][0]
        )
        return new_state, float(delta)

    try:
        result = runner.run(state0, step, tol=None if fixed else tol, max_iters=total_iters)
    finally:
        edges_w.unpersist()
        ids.unpersist()
        dangling_ids.unpersist()
        if blocked is not None:
            blocked.unpersist()
    return result

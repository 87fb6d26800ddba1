"""k-core decomposition (coreness) via distributed h-index propagation.

Beyond the SURVEY §2 inventory; coreness is the standard link-graph
density/influence measure (bowtie-core extraction, spam-farm and
community-core detection) and the natural companion to the degree
surface the engine already ships [pub: Verizon/quiver
core/src/main/scala/quiver/Graph.scala#degree].

Algorithm (Montresor, De Pellegrini & Miorandi, "Distributed k-Core
Decomposition", IEEE TPDS 2013; the h-operator convergence is Lü et
al., Nature Comm. 2016): on the SIMPLE undirected graph (self-loops
and edge multiplicity dropped — coreness is a simple-graph notion),

    c_0(v)   = degree(v)
    c_{t+1}(v) = H({ c_t(u) : u ~ v })

where ``H`` is the h-index (the largest k such that v has ≥ k
neighbors with value ≥ k). Given the degree init the sequence is
pointwise monotone non-increasing and its fixpoint is exactly the
coreness — equality-tested against an independent min-heap peeling
(Batagelj–Zaveršnik) in tests/test_kcore.py.

Superstep plan (smj tier): the h-index is NOT a plain algebraic
aggregate, but it IS one window + one aggregate over the SAME key —
``row_number() over (partition by dst order by c desc)`` then
``max(least(rn, c))`` — so each round is exactly one shuffle of the
message table (Catalyst reuses the window's hash partitioning for the
groupBy; plan-asserted in the tests). Ties need no tie-break: the
multiset of sorted values determines the h-index regardless of the
order equal values land in, which also makes the unrolled DuckDB twin
(queries.py ``kcore_parts``) bit-comparable — the state is integral,
so fixed-round parity is EXACT, no rounding.

Rounds to fixpoint are bounded by the graph's "coreness depth" —
small on real link graphs (8 on the sf0.01 bowtie fixture), O(n) on
pathological chains; like cheapestPath/scc, hitting ``max_iters`` in
fixpoint mode raises instead of returning a silently-partial result.

Tiers: ``local`` (guarded driver-numpy lexsort/reduceat twin,
algorithms/local_tier.py) and ``smj``; ``auto`` routes via the shared
conf-driven thresholds. No mirror/CSR tier: the round is one
window-aggregate over a message table that never exceeds 2|E| rows —
the known escalation is the same packed-CSR kernel shape as the other
flagships, not built until a profile demands it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepResult, SuperstepRunner, truncated_checkpoint


def kcore(
    graph: Graph,
    num_iters: int | None = None,
    max_iters: int = 100,
    strategy: str = "auto",
    runner: SuperstepRunner | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id, core)`` — the
    coreness of every vertex (isolated vertices: 0).

    ``num_iters`` pins the round count and skips the per-round
    changed-count job (oracle mode — the integer state makes fixed
    rounds bit-comparable); default is fixpoint mode, which RAISES on
    ``max_iters`` (no silent partial coreness).
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    if strategy == "auto":
        from quiver_spark import tiering

        n_edges = graph.edges.count()
        if runner.run_dir is None and n_edges <= tiering.local_max_edges(spark):
            strategy = "local"
        else:
            strategy = "smj"
    if strategy == "local":
        from quiver_spark.algorithms import local_tier

        if runner.run_dir is not None:
            raise ValueError(
                "strategy='local' keeps state in the driver; durable "
                "checkpoint/resume (run_dir) needs a distributed strategy"
            )
        return local_tier.kcore_local(graph, num_iters=num_iters, max_iters=max_iters)
    if strategy != "smj":
        raise ValueError(f"unknown kcore strategy {strategy!r} (local/smj/auto)")

    # simple undirected message edges: canonicalize, dedup, both
    # orientations; one static frame persisted for every round
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    eb = (
        canon.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(canon.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    eb.count()

    deg = eb.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("core"))
    state0 = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce(F.col("core"), F.lit(0)).cast("long").alias("core"))
    )

    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    w = Window.partitionBy("id").orderBy(F.desc("c"))

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        msgs = eb.join(
            state.select(F.col("id").alias("src"), F.col("core").alias("c")), "src"
        ).select(F.col("dst").alias("id"), "c")
        h = (
            msgs.withColumn("rn", F.row_number().over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("c"))).alias("h"))
        )
        new_state = state.join(h, "id", "left").select(
            "id",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("core"),
            (F.coalesce(F.col("h"), F.lit(0)) != F.col("core")).alias("_changed"),
        )
        if fixed:
            return new_state.drop("_changed"), None
        new_state = truncated_checkpoint(new_state)
        changed = new_state.where("_changed").count()
        out = new_state.drop("_changed")
        out._qs_checkpointed = True  # noqa: SLF001 — runner contract
        return out, float(changed)

    try:
        res = runner.run(
            state0,
            step,
            tol=None if fixed else 0.0,
            max_iters=total,
            job_key=f"kcore:strategy={strategy}",
        )
    finally:
        eb.unpersist()
    if not fixed and not res.converged:
        raise RuntimeError(
            f"kcore did not reach its fixpoint in max_iters={max_iters} rounds — "
            f"raise max_iters (no silent partial coreness)"
        )
    return res

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
algorithms/local_tier.py), ``smj`` (one message shuffle per round),
and ``bhj`` (the mirror tier: edges pre-partitioned by the
window/aggregate key + per-round state broadcast → ZERO exchanges per
round, only a per-partition sort; the h-output covers every
non-isolated vertex, so no state join-back exists — static
isolated-vertex rows are unioned instead). ``auto`` routes via the
shared conf-driven thresholds; past the mirror vertex budget it falls
back to smj (correct at any size) — no CSR tier until a profile
demands one.
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

        strategy = tiering.auto_strategy(
            spark,
            graph.edges.count(),
            lambda: graph.vertices.count(),
            mirror_allowed=("bhj",),
            allow_local=runner.run_dir is None,
        )
        if strategy == "csr":
            # no beyond-broadcast tier exists for kcore: bhj's only
            # broadcast is the vertex-sized state, so past the mirror
            # budget fall back to smj — correct at any size, one
            # message shuffle per round instead of zero
            strategy = "smj"
    if strategy == "local":
        from quiver_spark.algorithms import local_tier

        if runner.run_dir is not None:
            raise ValueError(
                "strategy='local' keeps state in the driver; durable "
                "checkpoint/resume (run_dir) needs a distributed strategy"
            )
        return local_tier.kcore_local(graph, num_iters=num_iters, max_iters=max_iters)
    if strategy not in ("smj", "bhj"):
        raise ValueError(f"unknown kcore strategy {strategy!r} (local/smj/bhj/auto)")

    # simple undirected message edges: canonicalize, dedup, both
    # orientations; one static frame persisted for every round. The
    # bhj mirror tier pre-partitions it by the window/aggregate key so
    # the per-round plan is ZERO-exchange: broadcast state join (keeps
    # the streamed side's partitioning) → window partitionBy(dst) over
    # the resident layout (per-partition sort only — the values change
    # every round, the clustering never does) → same-key aggregate →
    # broadcast old-state join for in-frame change detection. The
    # h-output is dst-complete (every non-isolated vertex receives
    # messages every round), so unlike PageRank's bhj no join-back
    # onto the state is needed — the static isolated-vertex rows are
    # unioned in instead.
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    eb = canon.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        canon.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    if strategy == "bhj":
        n_blocks = max(spark.sparkContext.defaultParallelism, 8)
        eb = eb.repartition(n_blocks, "dst")
    eb = eb.persist()
    eb.count()

    deg = eb.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("core"))
    state0 = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce(F.col("core"), F.lit(0)).cast("long").alias("core"))
    )
    iso = None
    if strategy == "bhj":
        iso = (
            graph.vertices.select("id")
            .join(eb.select(F.col("dst").alias("id")), "id", "left_anti")
            .select("id", F.lit(0).cast("long").alias("core"), F.lit(False).alias("_changed"))
            .persist()
        )
        iso.count()

    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    w = Window.partitionBy("id").orderBy(F.desc("c"))
    wd = Window.partitionBy("dst").orderBy(F.desc("c"))

    def step_smj(state: DataFrame) -> DataFrame:
        msgs = eb.join(
            state.select(F.col("id").alias("src"), F.col("core").alias("c")), "src"
        ).select(F.col("dst").alias("id"), "c")
        h = (
            msgs.withColumn("rn", F.row_number().over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("c"))).alias("h"))
        )
        return state.join(h, "id", "left").select(
            "id",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("core"),
            (F.coalesce(F.col("h"), F.lit(0)) != F.col("core")).alias("_changed"),
        )

    def step_bhj(state: DataFrame) -> DataFrame:
        msgs = eb.join(
            F.broadcast(state.select(F.col("id").alias("src"), F.col("core").alias("c"))),
            "src",
        ).select("dst", "c")
        h = (
            msgs.withColumn("rn", F.row_number().over(wd))
            .groupBy("dst")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("c"))).alias("h"))
        )
        upd = h.join(
            F.broadcast(state.select(F.col("id").alias("dst"), F.col("core").alias("_old"))),
            "dst",
        ).select(
            F.col("dst").alias("id"),
            F.col("h").cast("long").alias("core"),
            (F.col("h") != F.col("_old")).alias("_changed"),
        )
        return upd.unionByName(iso)

    body = step_bhj if strategy == "bhj" else step_smj

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        new_state = body(state)
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
        if iso is not None:
            iso.unpersist()
    if not fixed and not res.converged:
        raise RuntimeError(
            f"kcore did not reach its fixpoint in max_iters={max_iters} rounds — "
            f"raise max_iters (no silent partial coreness)"
        )
    return res

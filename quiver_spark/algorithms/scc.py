"""Strongly connected components: trimmed forward-backward coloring.

Beyond the SURVEY §2 inventory (the reference's public surface stops
at undirected ``reachable``-induced components); SCC is the canonical
DIRECTED companion a link-graph workload needs — web/bowtie analysis,
condensation before PageRank, cycle detection in import graphs. It is
the composition of two quiver primitives the engine already has —
forward reachability and reverse reachability [pub: Verizon/quiver
core/src/main/scala/quiver/Graph.scala#reachable over #grev] — run to
mutual fixpoint.

Algorithm: the standard distributed FW-BW-Trim / coloring scheme
(Orzan's coloring; Slota et al., "BFS and Coloring-based Parallel
Algorithms for Strongly Connected Components", IPDPS'14), expressed
as DataFrame supersteps:

Each OUTER round, on the still-unassigned subgraph:

1. **Trim** (bounded rounds): vertices with in-degree 0 or
   out-degree 0 in the remaining subgraph are singleton SCCs —
   removed immediately. Pure optimization; correctness never depends
   on it.
2. **Forward coloring** (HashMax fixpoint): ``color(v) = max id over
   v and its surviving ancestors`` — max propagates along edge
   direction until no change, exactly the CC HashMin shape with max.
3. **Backward reach within color**: from each color root ``r``
   (``color(r) == r``), reach backwards along edges whose endpoints
   share the color. Every vertex on a mutual path with ``r`` shares
   r's ancestor set, hence r's color, so the color restriction loses
   nothing (classic FW-BW argument) — the reached set IS ``SCC(r)``.
4. **Assign** ``scc = min member id`` (canonical, algorithm-path
   independent — the same convention as connected_components) and
   drop the assigned vertices.

Every outer round assigns at least every color root's SCC, so the
outer loop terminates in ≤ #SCCs rounds; real link graphs finish in a
handful (the giant SCC falls out of round 1). Like ``cheapestPath``,
hitting ``max_iters`` RAISES instead of returning silently-partial
assignments.

Scale shape: the outer round maps 1:1 onto a ``SuperstepRunner`` step,
so durable checkpoint/resume (per-partition lineage, job fingerprint,
SIGKILL recovery) come from the shared runtime at outer-round
granularity. The inner fixpoints are co-partitioned join+aggregate
rounds over the persisted remaining-edge table with frontier-bound
messaging (only last-round-changed vertices send — monotone updates
make this bit-identical per round; see ``_fixpoint``) — otherwise the
same smj plan shape as connected_components' HashMin, with the same
known mirror/CSR escalations if a profile ever demands them (not
built: coloring touches a shrinking subgraph, and the giant-SCC first
round IS the cc-shaped workload already measured). Tiers: ``local``
(guarded driver-numpy, algorithms/local_tier.py) and ``smj``; ``auto``
routes through the shared conf-driven tiering.

Oracle: ``scc_parts`` (queries.py) — per-vertex assignments on a
deterministic bowtie graph over TPC-H parts vs a DuckDB recursive
mutual-reachability closure. Equality vs an independent iterative
Tarjan on seeded random multigraphs in tests/test_scc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepResult, SuperstepRunner, truncated_checkpoint


def _ckpt(df: DataFrame) -> DataFrame:
    """Inner-round lineage truncation (the runner only truncates at
    outer-round boundaries; each inner fixpoint round must cut its own
    plan or the coloring loop rebuilds an O(2^k)-stats DAG)."""
    return truncated_checkpoint(df)


def strongly_connected_components(
    graph: Graph,
    max_iters: int = 30,
    max_inner: int = 500,
    trim_rounds: int = 3,
    strategy: str = "auto",
    runner: SuperstepRunner | None = None,
) -> SuperstepResult:
    """Per-vertex strongly-connected-component ids.

    Returns ``SuperstepResult`` with state ``(id, scc)``, ``scc`` =
    min vertex id in the component. Self-loops and parallel edges are
    irrelevant to strong connectivity and dropped up front; isolated
    vertices are singleton SCCs.

    ``max_iters`` caps OUTER FW-BW rounds (each assigns ≥1 SCC per
    surviving color class; raises on hit — no silent partial result).
    ``max_inner`` caps each inner fixpoint (coloring / backward reach;
    bounded by the remaining subgraph's diameter — raises on hit).
    ``trim_rounds`` bounds the per-outer-round trim peeling (an
    optimization knob, not a correctness one).
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    if strategy == "auto":
        from quiver_spark import tiering

        n_edges = graph.edges.count()
        # no mirror/csr tier exists (docstring): everything above the
        # local guard runs smj, so the smj threshold is irrelevant here
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
        return local_tier.scc_local(graph, max_iters=max_iters)
    if strategy != "smj":
        raise ValueError(f"unknown scc strategy {strategy!r} (local/smj/auto)")

    # strong connectivity ignores self-loops and edge multiplicity
    pairs = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates()
        .persist()
    )
    pairs.count()

    state0 = graph.vertices.select("id", F.lit(None).cast("long").alias("scc"))

    def _fixpoint(state: DataFrame, round_fn, what: str) -> DataFrame:
        """Drive ``round_fn(state) -> state'`` until no row changes.

        ``state`` carries a ``_changed`` frontier column (seeded True
        by the caller for round 0's senders); ``round_fn`` reads
        ``state.where("_changed")`` as the message senders. Both inner
        updates are monotone (color only grows, reached only flips
        False→True), so a vertex whose state did not change last round
        has nothing new to say — its messages were absorbed when it
        last changed — and frontier-bound messaging is bit-identical
        per round to all-senders messaging while the tail rounds
        shuffle O(frontier) instead of O(E) rows (measured: the
        all-senders form paid a ~16 s size-invariant floor at 8 cores,
        BENCH/BASELINE.md "scc 2→8 across three sizes")."""
        for _ in range(max_inner):
            new = _ckpt(round_fn(state))
            changed = new.where("_changed").count()
            if changed == 0:
                return new.drop("_changed")
            state = new
        raise RuntimeError(
            f"scc: {what} fixpoint did not converge in max_inner={max_inner} "
            f"rounds — remaining-subgraph diameter exceeds the cap; raise "
            f"max_inner (no silent partial result)"
        )

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        caches = []
        try:
            un = state.where(F.col("scc").isNull()).select("id").persist()
            caches.append(un)
            n_un = un.count()
            if n_un == 0:
                return state, 0.0

            # remaining subgraph — recomputed from the persisted pair
            # table each outer round so the runner's checkpointed
            # (id, scc) state alone is sufficient to resume
            cur_v = un
            cur_e = (
                pairs.join(un.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(un.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .persist()
            )
            caches.append(cur_e)
            cur_e.count()

            # ---- 1. trim: peel in-degree-0 / out-degree-0 singletons
            trimmed: DataFrame | None = None
            for _ in range(trim_rounds):
                alive = (
                    cur_v.join(cur_e.select(F.col("src").alias("id")), "id", "left_semi")
                    .join(cur_e.select(F.col("dst").alias("id")), "id", "left_semi")
                )
                alive = _ckpt(alive)
                dead = _ckpt(cur_v.join(alive, "id", "left_anti"))
                if dead.count() == 0:
                    cur_v = alive
                    break
                t = dead.select("id", F.col("id").alias("scc"))
                trimmed = t if trimmed is None else _ckpt(trimmed.unionByName(t))
                cur_v = alive
                cur_e = _ckpt(
                    cur_e.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
                    .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
                )

            # ---- 2. forward HashMax coloring on the surviving core
            color0 = cur_v.select(
                "id", F.col("id").alias("color"), F.lit(True).alias("_changed")
            )

            def color_round(c: DataFrame) -> DataFrame:
                msgs = cur_e.join(
                    c.where("_changed").select(F.col("id").alias("src"), "color"),
                    "src",
                ).select(F.col("dst").alias("id"), "color")
                agg = msgs.groupBy("id").agg(F.max("color").alias("_m"))
                return c.join(agg, "id", "left").select(
                    "id",
                    F.greatest(F.col("color"), F.coalesce(F.col("_m"), F.col("color"))).alias("color"),
                    (F.coalesce(F.col("_m"), F.col("color")) > F.col("color")).alias("_changed"),
                )

            color = _fixpoint(_ckpt(color0), color_round, "coloring")

            # ---- 3. backward reach from color roots, within color
            r0 = color.select(
                "id",
                "color",
                (F.col("id") == F.col("color")).alias("reached"),
                (F.col("id") == F.col("color")).alias("_changed"),
            )

            def reach_round(r: DataFrame) -> DataFrame:
                hits = (
                    cur_e.join(
                        r.where("_changed").select(F.col("id").alias("dst"), F.col("color").alias("_rc")),
                        "dst",
                    )
                    .select(F.col("src").alias("id"), F.col("_rc").alias("color"))
                    .dropDuplicates()
                    .withColumn("_hit", F.lit(True))
                )
                return r.join(hits, ["id", "color"], "left").select(
                    "id",
                    "color",
                    (F.col("reached") | F.coalesce(F.col("_hit"), F.lit(False))).alias("reached"),
                    (~F.col("reached") & F.coalesce(F.col("_hit"), F.lit(False))).alias("_changed"),
                )

            r = _fixpoint(_ckpt(r0), reach_round, "backward reach")

            # ---- 4. assign: scc = min id within each reached color group
            members = r.where("reached")
            labels = members.groupBy("color").agg(F.min("id").alias("scc"))
            assigned = members.join(labels, "color").select("id", "scc")
            if trimmed is not None:
                assigned = assigned.unionByName(trimmed)

            new_state = (
                state.join(assigned.withColumnRenamed("scc", "_new"), "id", "left")
                .select("id", F.coalesce(F.col("scc"), F.col("_new")).alias("scc"))
            )
            new_state = _ckpt(new_state)
            remaining = new_state.where(F.col("scc").isNull()).count()
            # mark so the runner skips its own (redundant) truncation
            new_state._qs_checkpointed = True  # noqa: SLF001
            return new_state, float(remaining)
        finally:
            for c in caches:
                c.unpersist()

    try:
        res = runner.run(
            state0,
            step,
            tol=0.0,
            max_iters=max_iters,
            job_key=f"scc:fwbw:trim_rounds={trim_rounds}",
        )
    finally:
        pairs.unpersist()
    if not res.converged:
        raise RuntimeError(
            f"scc did not assign every vertex in max_iters={max_iters} outer "
            f"rounds ({res.metrics[-1]['delta'] if res.metrics else '?'} vertices "
            f"unassigned) — raise max_iters; checkpoints (if a run_dir was "
            f"given) hold the partial state for resume"
        )
    return res


def condensation(graph: Graph, scc_state: DataFrame | None = None, **scc_kwargs) -> Graph:
    """The condensation DAG: one vertex per SCC (id = the component's
    canonical min-member id, label ``size`` = member count), one edge
    per ordered pair of DISTINCT components connected by ≥1 original
    edge. The classic second step after SCC (cycle-free import order,
    bowtie analysis) and quiver's ``gmap``-style quotient expressed as
    two joins + a distinct [pub: Verizon/quiver
    core/src/main/scala/quiver/Graph.scala#gmap].

    ``scc_state``: reuse an existing ``(id, scc)`` assignment (e.g.
    from a checkpointed run) instead of recomputing; extra kwargs go
    to :func:`strongly_connected_components` otherwise. Plan shape:
    the edge projection is two state joins + one distinct — the state
    is vertex-sized, so both joins broadcast whenever the vertex table
    fits and degrade to shuffles beyond, with no step that ever holds
    a component in one place.
    """
    if scc_state is None:
        scc_state = strongly_connected_components(graph, **scc_kwargs).state
    v = scc_state.groupBy(F.col("scc").alias("id")).agg(F.count(F.lit(1)).alias("size"))
    s = scc_state
    e = (
        graph.edges.select("src", "dst")
        .join(s.select(F.col("id").alias("src"), F.col("scc").alias("_cs")), "src")
        .join(s.select(F.col("id").alias("dst"), F.col("scc").alias("_cd")), "dst")
        .where(F.col("_cs") != F.col("_cd"))
        .select(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
        .dropDuplicates()
    )
    return Graph(v, e)

"""Connected components: HashMin label propagation with a
large-star/small-star fallback for deep graphs.

Composition of quiver primitives: components = the partition induced
by undirected reachability [pub: Verizon/quiver core/src/main/scala/
quiver/Graph.scala#reachable over #undir]; re-expressed as the
classic distributed HashMin fixpoint — each vertex repeatedly adopts
the minimum component id among itself and its neighbors. Exact
deterministic output: component id = min vertex id in the component
(BASELINE.md exactness row).

Rounds needed = graph diameter; power-law link graphs have tiny
diameters so HashMin is the right default. For pathological chains
(diameter ≫ 50) ``algorithm="two_phase"`` runs alternating
large-star/small-star pointer-doubling (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — converges in
O(log^2 n) rounds regardless of diameter).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepRunner, SuperstepResult, truncated_checkpoint


def _cc_csr_kernel(p_pdf: pd.DataFrame, s_pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-block HashMin over a packed CSR block (csr_blocks layout):
    out[dst] = min over in-edges of comp[src], via a gather through
    the pre-resolved ``src_pos`` index and one ``minimum.reduceat`` —
    no per-round sort, no per-row Arrow. Because ``vids`` partitions
    the vertex set, the kernel also emits one row per block vertex
    carrying its OWN component (pmin: makes the downstream min total,
    the vertex always hears itself; pold: the old component for
    fallback + in-frame change detection — no extra join anywhere)."""
    from quiver_spark import csr_blocks

    empty = pd.DataFrame(
        {"dst": pd.Series(dtype="int64"), "pmin": pd.Series(dtype="int64"),
         "pold": pd.Series(dtype="int64")}
    )
    if p_pdf.empty or s_pdf.empty:
        return empty
    sid = s_pdf["id"].to_numpy(np.int64)
    scomp = s_pdf["component"].to_numpy(np.int64)
    out = []
    for _, row in p_pdf.iterrows():
        vids, src_pos, dst_starts, udst = csr_blocks.unpack(row)
        comp = csr_blocks.align_state(vids, sid, scomp, np.iinfo(np.int64).max)
        out.append(pd.DataFrame({"dst": vids, "pmin": comp, "pold": comp}))
        if len(src_pos):
            pmin = np.minimum.reduceat(comp[src_pos], dst_starts)
            out.append(pd.DataFrame({
                "dst": udst, "pmin": pmin,
                "pold": np.full(len(udst), np.iinfo(np.int64).min),
            }))
    return pd.concat(out, ignore_index=True) if out else empty


def _undirected_pairs(graph: Graph) -> DataFrame:
    return (
        graph.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(graph.edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .dropDuplicates()
    )


def _star_double(und: DataFrame, state: DataFrame, large: bool) -> DataFrame:
    """One alternating large/small-star hook + pointer-doubling round
    (Kiveris et al., SoCC'14) over a parent forest ``(id, parent)``.
    Parents only decrease and stay within the component, so the round
    is safe from ANY valid warm start — including a partially-converged
    HashMin state (the escalation path). Returns
    ``(id, parent, _changed)`` with change detection in-frame."""
    p = state.select(F.col("id").alias("u"), F.col("parent").alias("pu"))
    q = state.select(F.col("id").alias("v"), F.col("parent").alias("pv"))
    e = und.join(p, "u").join(q, "v")
    if large:
        cand = e.select(F.col("u").alias("id"), F.least("pu", "pv").alias("cand")).filter(
            F.col("cand").isNotNull()
        )
    else:
        cand = e.select(F.col("pu").alias("id"), F.least("pu", "pv").alias("cand"))
    hooks = cand.groupBy("id").agg(F.min("cand").alias("hook"))
    s = state.join(hooks, "id", "left").select(
        "id",
        F.least(F.col("parent"), F.coalesce(F.col("hook"), F.col("parent"))).alias("parent"),
        F.col("parent").alias("_old"),
    )
    # pointer doubling: parent ← parent's parent — the O(log n) lever
    gp = s.select(F.col("id").alias("parent"), F.col("parent").alias("gparent"))
    return (
        s.join(gp, "parent", "left")
        .select(
            "id",
            F.coalesce(F.col("gparent"), F.col("parent")).alias("parent"),
            (F.coalesce(F.col("gparent"), F.col("parent")) != F.col("_old")).alias("_changed"),
        )
    )


def connected_components(
    graph: Graph,
    max_iters: int = 50,
    algorithm: str = "hashmin",
    strategy: str = "auto",
    n_blocks: int | None = None,
    num_iters: int | None = None,
    runner: SuperstepRunner | None = None,
    escalate_after: int | None = 20,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id, component)``.

    ``num_iters`` pins the round count and skips the per-round
    changed-count job (bench mode: HashMin's per-round cost is
    convergence-independent, so fixed rounds measure steady-state
    throughput; correctness callers use the default fixpoint mode).

    ``escalate_after`` (fixpoint mode only): HashMin needs
    diameter-many rounds, so after this many unconverged rounds the
    step function switches IN-PLACE to alternating large/small-star +
    pointer doubling (O(log n) rounds regardless of diameter, Kiveris
    SoCC'14), warm-started from the current HashMin state — the
    component ids reached so far are a valid parent forest, and star
    hooks are monotone, so the fixpoint is identical. Real link graphs
    have tiny diameters and never escalate; a pathological chain stops
    being a 1000-round trap. ``None`` disables. The switch is a pure
    function of the round number, so checkpoint/resume replays it
    deterministically.

    ``strategy`` (hashmin only): ``smj`` shuffles the pair table
    through a sort-merge join every round; ``bhj`` is the
    zero-exchange mirror — the pair table (with self-loops) persisted
    hash-blocked by destination, the small state broadcast, and the
    per-round min combined by ``groupBy(block, v)`` which Catalyst
    runs partition-complete. The self-loop carries each vertex's own
    component, so no second state join is needed anywhere in the hot
    DAG (the lesson from PageRank's bhj: a second broadcast of the
    state made late-round walls grow ~2x/step). ``csr`` is the
    beyond-broadcast tier — the pair table resolved ONCE into packed
    per-block CSR buffers keyed by hash(src) (csr_blocks), the state
    shuffled to the same blocking, and a cogrouped Arrow kernel doing
    the per-dst min through the pre-resolved index (~4 B/edge memcpy
    per superstep; the kernel emits each block vertex's own/old
    component off the packed vid list, so fallback + change detection
    need no extra join). ``auto`` tiers tiny → local (guarded
    driver-numpy HashMin, algorithms/local_tier.py; smj when a durable
    run_dir needs distributed lineage), mirror-sized → bhj, beyond →
    csr.
    """
    if algorithm == "two_phase":
        return _two_phase_cc(graph, max_iters=max_iters, runner=runner)
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    state0 = graph.vertices.select("id", F.col("id").alias("component"))
    if strategy == "auto":
        # shared conf-driven tiering (quiver_spark.tiering): tiny →
        # smj, mirror-sized → spark.quiver.auto.mirrorStrategy (bhj
        # default), beyond-broadcast → cogrouped CSR. The vertex count
        # is passed lazily — the tiny tier decides on edges alone.
        from quiver_spark import tiering

        strategy = tiering.auto_strategy(
            spark,
            graph.edges.count(),
            lambda: graph.vertices.count(),
            allow_local=runner.run_dir is None,
        )
    if strategy == "local":
        # driver-local numpy HashMin (algorithms/local_tier.py):
        # guarded Arrow collect; fixed mode is exactly num_iters
        # HashMin rounds (oracle-comparable), fixpoint mode pointer-
        # jumps (same fixpoint as star escalation, so escalate_after
        # is moot — depth converges in O(log n) rounds regardless)
        from quiver_spark.algorithms import local_tier

        if runner.run_dir is not None:
            raise ValueError(
                "strategy='local' keeps state in the driver; durable "
                "checkpoint/resume (run_dir) needs a distributed strategy"
            )
        return local_tier.cc_local(graph, max_iters=max_iters, num_iters=num_iters)

    n_blocks = n_blocks or max(spark.sparkContext.defaultParallelism, 8)
    if strategy == "bhj":
        und = (
            _undirected_pairs(graph)
            .unionByName(graph.vertices.select(F.col("id").alias("u"), F.col("id").alias("v")))
            .dropDuplicates()
            .withColumn("block", F.pmod(F.xxhash64("v"), F.lit(n_blocks)).cast("int"))
            .repartition(n_blocks, "block")
            .sortWithinPartitions("block", "v")
            .persist()
        )
    elif strategy == "csr":
        # beyond-broadcast tier: the pair table resolved ONCE into
        # packed per-block CSR buffers (csr_blocks module docstring:
        # the row-oriented cogroup spent its superstep on Arrow row
        # assembly and capped scaling at 0.627). No self-loop
        # injection — the kernel emits every block vertex's own/old
        # component from the packed vid list instead.
        from quiver_spark import csr_blocks

        und = csr_blocks.build_packed_blocks(
            _undirected_pairs(graph).select(F.col("u").alias("src"), F.col("v").alias("dst")),
            graph.vertices.select("id"),
            n_blocks,
        )
    else:
        und = _undirected_pairs(graph).persist()
    und.count()

    esc: dict = {"pairs": None}

    def _esc_pairs() -> DataFrame:
        if esc["pairs"] is None:
            if strategy == "smj":
                # the smj tier's cached frame IS the plain undirected
                # pair table — reuse it instead of shuffling a second
                # byte-identical copy at the escalation switch
                esc["pairs"] = und
            else:
                # bhj carries injected self-loops / block columns and
                # csr is a packed binary layout — rebuild plain pairs
                pairs = _undirected_pairs(graph).persist()
                pairs.count()
                esc["pairs"] = pairs
                und.unpersist()  # the hashmin-tier frame is done voting
        return esc["pairs"]

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        if not fixed and escalate_after is not None and k >= escalate_after:
            # HashMin failed to converge in escalate_after rounds —
            # the graph is deep; switch to star rounds (docstring)
            new_state = _star_double(
                _esc_pairs(),
                state.withColumnRenamed("component", "parent"),
                large=((k - escalate_after) % 2 == 0),
            ).withColumnRenamed("parent", "component")
        elif strategy == "bhj":
            # self-loops make the min over incoming messages total:
            # every vertex hears its own component — one broadcast,
            # zero exchanges, done. The self-loop row (u == v) also
            # carries the vertex's OLD component, so change detection
            # folds into the same aggregate (no per-round join job).
            new_state = (
                und.join(F.broadcast(state.withColumnRenamed("id", "u")), "u")
                .groupBy("block", F.col("v").alias("id"))
                .agg(
                    F.min("component").alias("component"),
                    F.min(F.when(F.col("u") == F.col("v"), F.col("component"))).alias("_old"),
                )
                .select("id", "component", (F.col("component") != F.col("_old")).alias("_changed"))
            )
        elif strategy == "csr":
            state_b = state.withColumn(
                "block", F.pmod(F.xxhash64("id"), F.lit(n_blocks)).cast("int")
            )
            partials = (
                und.groupBy("block")
                .cogroup(state_b.groupBy("block"))
                .applyInPandas(lambda e, s: _cc_csr_kernel(e, s), "dst long, pmin long, pold long")
            )
            new_state = partials.groupBy(F.col("dst").alias("id")).agg(
                F.min("pmin").alias("component"), F.max("pold").alias("_old")
            ).select("id", "component", (F.col("component") != F.col("_old")).alias("_changed"))
        else:
            nbr_min = (
                und.join(state.withColumnRenamed("id", "u"), "u")
                .groupBy(F.col("v").alias("id"))
                .agg(F.min("component").alias("nbr_comp"))
            )
            new_comp = F.least(F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component")))
            new_state = state.join(nbr_min, "id", "left").select(
                "id",
                new_comp.alias("component"),
                (new_comp != F.col("component")).alias("_changed"),
            )
        if fixed:
            return new_state.select("id", "component"), None
        new_state = truncated_checkpoint(new_state)
        new_state._qs_checkpointed = True  # noqa: SLF001 — runner contract
        changed = new_state.agg(F.sum(F.col("_changed").cast("int"))).collect()[0][0] or 0
        out = new_state.drop("_changed")
        # the projection inherits the checkpoint (tiny lineage over the
        # materialized frame) — without the flag the runner would pay a
        # SECOND localCheckpoint materialization per fixpoint round
        out._qs_checkpointed = True  # noqa: SLF001
        return out, float(changed)

    try:
        # delta = #vertices that changed component; fixpoint at 0
        return runner.run(
            state0,
            step,
            tol=None if fixed else 0.0,
            max_iters=total,
            job_key=f"cc:hashmin:strategy={strategy}:escalate_after={escalate_after}",
        )
    finally:
        und.unpersist()
        if esc["pairs"] is not None:
            esc["pairs"].unpersist()


def _two_phase_cc(graph: Graph, max_iters: int, runner: SuperstepRunner | None) -> SuperstepResult:
    """Alternating large-star / small-star (Kiveris SoCC'14).

    State is the parent-pointer forest as an edge list ``(u, p)``;
    large-star hooks every neighbor larger than the minimum onto the
    minimum, small-star hooks the small side. Converges when the
    pointer table stops changing; final components read off the
    star roots.
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    # initial parent table: each vertex points at min(self, neighbors)
    und = _undirected_pairs(graph)
    pairs = und.unionByName(graph.vertices.select(F.col("id").alias("u"), F.col("id").alias("v"))).dropDuplicates()
    state0 = pairs.groupBy(F.col("u").alias("id")).agg(F.least(F.min("v"), F.first("u")).alias("parent"))

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        s = _star_double(und, state, large=(k % 2 == 0))
        s = truncated_checkpoint(s)
        s._qs_checkpointed = True  # noqa: SLF001 — runner contract
        changed = s.agg(F.sum(F.col("_changed").cast("int"))).collect()[0][0] or 0
        out = s.drop("_changed")
        out._qs_checkpointed = True  # noqa: SLF001 — projection over the checkpoint
        return out, float(changed)

    res = runner.run(state0, step, tol=0.0, max_iters=max_iters, job_key="cc:star")
    res.state = res.state.withColumnRenamed("parent", "component")
    return res

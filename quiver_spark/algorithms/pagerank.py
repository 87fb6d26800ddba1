"""Distributed PageRank over the (vertices, edges) pair.

The north-rule flagship (BASELINE.json:2): supersteps/sec and
edges-processed/sec to 1e-6 convergence are THE engine metric. Not a
quiver symbol — quiver has no ranking at all — but it is exactly one
``GDecomp.extend`` comonadic superstep iterated [pub: Verizon/quiver
core/src/main/scala/quiver/Decomp.scala#extend]: each vertex's new
label (rank) is a function of the graph focused at that vertex
(in-neighbors' ranks).

Scale design (SURVEY.md §2.8, §4.3). The edge table is projected once
to a reusable weighted frame ``(src, dst, w=1/outdeg)`` and persisted;
only the small rank state moves each superstep. Four physical
strategies share identical semantics (tests assert equality):

- ``smj``   — sort-merge join of edges⋈state on src, then salted /
  plain ``groupBy(dst)``. The fully general path: no broadcast, no
  assumption that the vertex state fits anywhere. Two shuffles per
  superstep.
- ``bhj``   — edges persisted hash-blocked **by dst**; state broadcast
  (JVM) into the join; contributions combined by ``groupBy(block,
  dst)``, which Catalyst runs as a partition-complete aggregate
  because ``hashpartitioning(block)`` satisfies the clustering — and
  the final join back to the (co-partitioned, co-sorted) vertex frame
  also needs no exchange. **Zero exchanges per superstep**; the only
  data motion is the state broadcast (vertex mirroring, as GraphX's
  replicated vertex view).
- ``csr``   — edges hash-blocked by src into PACKED per-block CSR
  buffers (csr_blocks: int32 src positions + float64 weights, built
  once); state shuffled to the same blocking; a cogrouped Arrow
  kernel does a partition-local SpMV and emits pre-combined ``(dst,
  partial)`` messages. The beyond-broadcast-scale path: state never
  needs to fit in one place.
- ``csr_bcast`` — edges hash-blocked by dst as CSR blocks; the state
  is mirrored to every kernel as a **numpy broadcast** (sorted id +
  rank arrays); each superstep is one cogrouped Arrow kernel doing a
  vectorized SpMV with **no shuffle at all** — in-block combine is
  total because all edges of one dst share a block. Driver round-trip
  per superstep = one Arrow collect of the state + one ~16B/vertex
  broadcast.

Strategy choice at 100 TB: state fits executor memory (≲ tens of
millions of vertices) → a mirror strategy (``bhj``/``csr_bcast``);
larger → ``csr``/``smj``. ``auto`` applies that rule from the vertex
count.

Dangling mass (sinks — source-repo DAGs are full of them) is folded
into the same superstep DAG as a broadcast 1-row aggregate (no
driver collect), so each superstep is ONE job: the localCheckpoint
materialization. Ranks always sum to 1 (conservation is a test).
Fixed-iteration mode (``num_iters``) pins the superstep count for
bit-comparable DuckDB oracles; tolerance mode (``tol``) runs to the
1e-6 fixpoint with max-|delta| carried as an in-frame column (the
convergence agg is a scan of the checkpointed state, never a
recompute).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepRunner, SuperstepResult, truncated_checkpoint


def _salted_sum(df: DataFrame, key: str, value: str, out: str, n_salts: int, salt_src: str) -> DataFrame:
    """Two-phase aggregation: partial sum on (key, salt) then final on
    key. Explicit skew defense for hot keys (BASELINE.json:6).

    ``salt_src`` must be a column *independent of* ``key`` (e.g. the
    join's other side): hashing the group key itself would give every
    row of one hot key the same salt, silently disabling the spread.
    """
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_psum"))
    )
    return partial.groupBy(key).agg(F.sum("_psum").alias(out))


def _block(col: str, n_blocks: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_blocks)).cast("int")


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    num_iters: int | None = None,
    max_iters: int = 100,
    n_salts: int | str | None = None,
    salt_rows_per_salt: int = 100_000,
    use_csr: bool = False,
    n_blocks: int | None = None,
    strategy: str | None = None,
    runner: SuperstepRunner | None = None,
    init_ranks: DataFrame | None = None,
    reset: DataFrame | None = None,
    weight_col: str | None = None,
) -> SuperstepResult:
    """Returns a SuperstepResult whose state is ``(id, rank)``.

    ``weight_col`` — optional edge-column name turning this into
    WEIGHTED PageRank: rank flows out of ``src`` proportionally to
    the edge's weight instead of uniformly
    (``w_e = weight_e / Σ weight(src)``); weights must be > 0 (one
    validating aggregate, raises otherwise). Implemented on every
    tier the normalized edge frame flows through — ``smj``, the
    ``bhj`` mirror, ``csr`` and ``csr_bcast`` (round 5). The
    driver-local numpy tier and ``csr_packed`` re-derive the uniform
    1/outdeg themselves: ``auto`` re-routes them to the nearest
    weighted tier, an EXPLICIT request raises. A constant-1.0 weight
    column is
    bit-identical to the unweighted path (Σ over k edges of 1.0 is
    exactly k in fp; law-tested). Composes with ``reset`` (weights
    shape the walk, reset shapes the teleport) and ``init_ranks``.

    ``reset`` — optional ``(id, weight)`` frame turning this into
    PERSONALIZED PageRank: the teleport (and dangling) mass lands on
    the reset distribution (weights normalized over the graph's
    vertex set; rows for absent vertices are ignored; the covered
    total must be > 0) instead of uniformly:
    ``rank(v) = (1-d)·rst(v) + d·(Σ msgs + dsum·rst(v))``, init =
    rst. Supported on the ``local``, ``smj``, ``bhj`` and ``csr``
    tiers (round 5: rst folds into the static vertex frame exactly
    like the dangling flag — the bhj mirror bakes it into the
    block-partitioned ids table, so the personalized superstep stays
    zero-exchange). Only the two numpy-mirror variants
    (``csr_bcast``/``csr_packed``) still bake the uniform-teleport
    scalar into their kernels; ``auto`` re-routes them to ``bhj``
    (same mirror size class), an EXPLICIT request raises. Combining
    with ``init_ranks`` raises.

    ``num_iters`` set → exactly that many supersteps, no convergence
    action (oracle mode). Otherwise iterate until max |Δrank| ≤ tol.

    ``init_ranks`` — optional ``(id, rank)`` warm start (e.g. the last
    run's output after an incremental-ingest delta): converges to the
    SAME fixpoint as the uniform start (damped power iteration has a
    unique stationary vector) in far fewer supersteps when the graph
    changed little. New vertices default to 1/n.

    ``strategy`` ∈ {"auto", "local", "smj", "bhj", "csr", "csr_bcast",
    "csr_packed"} — see module docstring; ``local`` is the guarded
    driver-numpy tiny tier (algorithms/local_tier.py), which ``auto``
    picks for graphs at or under ``spark.quiver.auto.localMaxEdges``
    when no durable run_dir is in play. ``use_csr=True`` is the legacy
    spelling of ``strategy="csr"``.
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    if strategy is None:
        strategy = "csr" if use_csr else "smj"
    was_auto = strategy == "auto"
    if reset is not None and init_ranks is not None:
        raise NotImplementedError(
            "reset (personalized PageRank) cannot be combined with "
            "init_ranks (warm start) — the warm-start renormalization "
            "assumes the uniform-teleport fixpoint"
        )

    if strategy == "auto":
        # conf-driven three-regime tiering, shared with components /
        # labelprop — thresholds, their measured local[32] defaults,
        # and the spark.quiver.auto.* override knobs live in
        # quiver_spark.tiering (round-5: one source of truth instead
        # of three hardcoded copies). Resolved BEFORE the dangling-flag
        # frame is built: the local tier recomputes out-degrees from
        # the collected arrays, so building `ids` first would pay a
        # distributed anti-join+union for nothing on the tiny tier.
        from quiver_spark import tiering

        strategy = tiering.auto_strategy(
            spark,
            graph.edges.count(),
            lambda: graph.vertices.count(),
            mirror_allowed=("bhj", "csr_bcast", "csr_packed", "csr"),
            allow_local=runner.run_dir is None,
        )
        if strategy == "smj" and n_salts is None:
            # default degree-proportional salting on the auto-smj
            # tier: the sketch is one map-side-combined groupBy on
            # the static edge frame, and with no key above the
            # frequency floor it is empty — salted_sum then runs
            # every key at modulus 1, so a uniform graph pays ~0
            # while a power-law dst fans across reducer cells
            n_salts = "auto"

    if weight_col is not None and strategy not in ("smj", "bhj", "csr", "csr_bcast"):
        # edges_w carries the normalized per-edge outflow share for
        # every edge-frame tier, so weighted PageRank runs wherever the
        # w column flows (round 5: smj + bhj mirror + csr + csr_bcast).
        # The two tiers that re-derive 1/outdeg themselves — the
        # driver-local numpy tier and csr_packed (folds inv_outdeg into
        # the packed payload) — stay unsupported: auto re-routes them
        # to the nearest weighted tier, an explicit request raises.
        if not was_auto:
            raise ValueError(
                f"weight_col is not implemented for the {strategy!r} tier — "
                "use strategy='smj'/'bhj'/'csr'/'csr_bcast'/'auto'"
            )
        if strategy == "local":
            strategy = "smj"
            if n_salts is None:
                n_salts = "auto"
        else:  # auto picked the csr_packed numpy mirror
            strategy = "bhj"

    if strategy == "local":
        # driver-local numpy tier (algorithms/local_tier.py): guarded
        # Arrow collect, no per-superstep distributed scheduling. auto
        # only routes here for in-memory runners; an explicit request
        # under a durable runner is a contract error, not a fallback.
        from quiver_spark.algorithms import local_tier

        if runner.run_dir is not None:
            raise ValueError(
                "strategy='local' keeps state in the driver; durable "
                "checkpoint/resume (run_dir) needs a distributed strategy"
            )
        return local_tier.pagerank_local(
            graph, damping=damping, tol=tol, num_iters=num_iters,
            max_iters=max_iters, init_ranks=init_ranks, reset=reset,
        )

    if reset is not None and strategy not in ("smj", "bhj", "csr"):
        # rst folds into the static vertex frame like the dang flag, so
        # the distributed tiers all support it (round 5: smj + the bhj
        # mirror + the csr beyond-broadcast tier). Only the two
        # numpy-mirror variants still bake the uniform-teleport scalar
        # into their kernels; auto re-routes them to bhj (the same
        # mirror size class), an explicit request is an error.
        if not was_auto:
            raise ValueError(
                f"reset (personalized PageRank) is not implemented for the "
                f"{strategy!r} tier — use strategy='smj'/'bhj'/'csr'/'local'/'auto'"
            )
        strategy = "bhj"

    if weight_col is None:
        out_deg = graph.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("od")
        )
    else:
        wmin = graph.edges.agg(F.min(F.col(weight_col).cast("double"))).first()[0]
        if wmin is not None and wmin <= 0:
            raise ValueError(
                f"weight_col={weight_col!r} must be strictly positive "
                f"(min {wmin}) — zero/negative outflow has no PageRank meaning"
            )
        out_deg = graph.edges.groupBy(F.col("src").alias("id")).agg(
            F.sum(F.col(weight_col).cast("double")).alias("od")
        )
    # vertex frame with the dangling flag baked in: (id, dang)
    ids = (
        graph.vertices.select("id")
        .join(out_deg.select("id"), "id", "left_anti")
        .select("id", F.lit(True).alias("dang"))
        .unionByName(out_deg.select("id", F.lit(False).alias("dang")))
        .persist()
    )
    n = ids.count()
    if n == 0:
        ids.unpersist()
        return SuperstepResult(state=spark.createDataFrame([], "id long, rank double"), supersteps=0)

    # reusable weighted edge frame: each edge instance carries its
    # outflow share — uniform 1/outdeg(src), or weight/Σweight(src)
    if weight_col is None:
        edges_w = (
            graph.edges.select("src", "dst")
            .join(out_deg.withColumnRenamed("id", "src"), "src")
            .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("w"))
        )
    else:
        edges_w = (
            graph.edges.select("src", "dst", F.col(weight_col).cast("double").alias("_ew"))
            .join(out_deg.withColumnRenamed("id", "src"), "src")
            .select("src", "dst", (F.col("_ew") / F.col("od")).alias("w"))
        )

    sc = spark.sparkContext
    n_blocks = n_blocks or max(sc.defaultParallelism, 8)
    base = (1.0 - damping) / n
    fixed = num_iters is not None
    total_iters = num_iters if fixed else max_iters

    persisted: list[DataFrame] = [ids]

    def keep(df: DataFrame) -> DataFrame:
        df = df.persist()
        persisted.append(df)
        return df

    # personalized teleport distribution: (id, dang, rst) with rst
    # normalized over the graph's vertices — one one-time agg, then a
    # static column the vertex frame carries (exactly like the dang
    # flag). Built BEFORE the strategy frames so the bhj mirror bakes
    # rst into its block-partitioned ids_b (zero per-superstep cost).
    ids_rst = None
    if reset is not None:
        wcol = [c for c in reset.columns if c != "id"][0]
        rw = reset.select("id", F.col(wcol).cast("double").alias("_w")).dropDuplicates(["id"])
        idw = keep(
            ids.join(rw, "id", "left").select(
                "id", "dang", F.coalesce(F.col("_w"), F.lit(0.0)).alias("_w")
            )
        )
        tot_row = idw.agg(F.sum("_w").alias("t"), F.min("_w").alias("m")).collect()[0]
        if tot_row["m"] is not None and tot_row["m"] < 0:
            raise ValueError("reset weights must be nonnegative")
        if not tot_row["t"] or tot_row["t"] <= 0:
            raise ValueError(
                "reset weights must sum > 0 over the graph's vertex set "
                "(rows for absent vertices are ignored)"
            )
        ids_rst = keep(
            idw.select("id", "dang", (F.col("_w") / F.lit(float(tot_row["t"]))).alias("rst"))
        )

    # ------------------------------------------------------------------
    # strategy-specific prepared frames
    # ------------------------------------------------------------------
    hot_dst = None
    if strategy == "smj":
        edges_w = keep(edges_w.repartition(n_blocks, "src").sortWithinPartitions("src"))
        edges_w.count()
        if n_salts == "auto":
            from quiver_spark import skew

            # degree sketch of the static edge frame, once — salt count
            # per hot dst ∝ its in-degree (SURVEY.md §4.3)
            hot_dst = keep(skew.degree_sketch(edges_w, "dst", min_freq=salt_rows_per_salt))
            if hot_dst.count() == 0:
                # no key above the floor: salted_sum would still pay a
                # per-superstep broadcast lookup + two-phase aggregate
                # (measured ~+20% on the uniform 200k-edge repo graph)
                # for nothing — drop to the plain aggregate. The sketch
                # is static, so this is a one-time decision.
                n_salts = None
    elif strategy == "bhj":
        edges_w = keep(
            edges_w.withColumn("block", _block("dst", n_blocks))
            .repartition(n_blocks, "block")
            .sortWithinPartitions("block", "dst")
        )
        edges_w.count()
        ids_b = keep(
            (ids_rst if ids_rst is not None else ids)
            .withColumn("block", _block("id", n_blocks))
            .repartition(n_blocks, "block")
            .sortWithinPartitions("block", "id")
        )
        ids_b.count()
    elif strategy == "csr":
        from quiver_spark import csr

        # build_packed_blocks persists + materializes internally
        blocked = csr.blocked_edges(edges_w, ids.select("id"), n_blocks)
        persisted.append(blocked)
    elif strategy == "csr_packed":
        from quiver_spark import csr_packed

        # CSR built once into per-block packed buffers; 1/outdeg folded
        # into the per-superstep broadcast (static out-degrees)
        packed, gids, inv_outdeg = csr_packed.build_packed_blocks(
            graph.edges.select("src", "dst"), ids, n_blocks
        )
        persisted.append(packed)
    elif strategy == "csr_bcast":
        # persist pre-sorted by the cogroup key (and dst for the kernel's
        # reduceat fast-path) so the per-superstep Sort node is elided
        edges_b = keep(
            edges_w.withColumn("block", _block("dst", n_blocks))
            .repartition(n_blocks, "block")
            .sortWithinPartitions("block", "dst")
        )
        edges_b.count()
        ids_b = keep(
            ids.withColumn("block", _block("id", n_blocks))
            .repartition(n_blocks, "block")
            .sortWithinPartitions("block", "id")
        )
        ids_b.count()
    else:
        raise ValueError(f"unknown pagerank strategy: {strategy!r}")

    # internal state schema: (id, rank, dang, delta) — plus the static
    # rst column in personalized mode; stripped on return.
    # init_ranks (warm start): the damped power iteration has a unique
    # fixpoint, so ANY start vector converges to the same ranks — a
    # near-fixpoint start (last run's output after a small graph delta)
    # just gets there in far fewer supersteps. Vertices the init table
    # doesn't cover (newly ingested) start at 1/n; vertices it covers
    # that no longer exist are dropped by the inner semantics of the
    # left join (ids is the authority on the vertex set).
    if init_ranks is not None:
        # dropDuplicates: a non-unique init table would fan the state
        # out through the left join (one state-sized shuffle, once).
        # Deduped ONCE into a persisted frame: the mass total below and
        # the state0 join both consume it, and dropDuplicates on a
        # duplicate-id table with differing ranks is free to pick a
        # different survivor per evaluation — two independent
        # evaluations could disagree, leaving state0's total ≠ the
        # measured _tot and breaking the renormalize-to-1 invariant
        # (ADVICE r4). Persisting pins one survivor set for both.
        init0 = (
            init_ranks.select("id", F.col("rank").alias("_r0"))
            .dropDuplicates(["id"])
            .persist()
        )
        persisted.append(init0)
        warm = ids.join(init0, "id", "left").select(
            "id", F.coalesce(F.col("_r0"), F.lit(1.0 / n)).alias("rank"), "dang"
        )
        # renormalize to total mass 1 (the fixpoint's invariant): a
        # graph delta leaves the carried-over ranks summing to ≠ 1, and
        # that mass error would otherwise decay only at the damping
        # rate — one one-time agg removes the whole error mode. A
        # degenerate init (total ≤ 0: all-zero or negative ranks) falls
        # back to the uniform start instead of dividing by zero.
        total = F.broadcast(warm.agg(F.sum("rank").alias("_tot")))
        state0 = warm.crossJoin(total).select(
            "id",
            F.when(F.col("_tot") > 0, F.col("rank") / F.col("_tot"))
            .otherwise(F.lit(1.0 / n))
            .alias("rank"),
            "dang",
            F.lit(0.0).alias("delta"),
        )
    elif reset is not None:
        # personalized init = the reset distribution itself (any init
        # reaches the same fixpoint; this one is the oracle-mode pin)
        state0 = ids_rst.select(
            "id", F.col("rst").alias("rank"), "dang", "rst", F.lit(0.0).alias("delta")
        )
    else:
        state0 = ids.select("id", F.lit(1.0 / n).alias("rank"), "dang", F.lit(0.0).alias("delta"))

    # dangling mass as a broadcast 1-row frame — stays inside the DAG
    def dang_row(state: DataFrame) -> DataFrame:
        return state.where(F.col("dang")).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dsum"))

    def finish(joined: DataFrame, msum_col: str, dsum_col) -> DataFrame:
        """base + d*(msgs + dangling/n), new delta vs carried prev rank.
        Personalized mode: (1-d)*rst + d*(msgs + dangling*rst) — the
        teleport and dangling mass land on the carried rst column."""
        if reset is not None:
            new_rank = F.lit(1.0 - damping) * F.col("rst") + F.lit(damping) * (
                F.coalesce(F.col(msum_col), F.lit(0.0)) + dsum_col * F.col("rst")
            )
            return joined.select(
                "id",
                new_rank.alias("rank"),
                "dang",
                "rst",
                F.abs(new_rank - F.col("_prev")).alias("delta"),
            )
        new_rank = F.lit(base) + F.lit(damping) * (
            F.coalesce(F.col(msum_col), F.lit(0.0)) + dsum_col / F.lit(float(n))
        )
        return joined.select(
            "id",
            new_rank.alias("rank"),
            "dang",
            F.abs(new_rank - F.col("_prev")).alias("delta"),
        )

    # ------------------------------------------------------------------
    # per-strategy superstep bodies: state -> new state (one lazy DAG)
    # ------------------------------------------------------------------
    def step_smj(state: DataFrame) -> DataFrame:
        contribs = edges_w.join(
            state.select(F.col("id").alias("src"), "rank"), "src"
        ).select("src", "dst", (F.col("rank") * F.col("w")).alias("c"))
        if n_salts == "auto":
            from quiver_spark import skew

            summed = skew.salted_sum(
                contribs, "dst", "c", "msum",
                hot=hot_dst, rows_per_salt=salt_rows_per_salt,
                salt_entropy=F.xxhash64(F.col("src")),
            )
        elif n_salts and n_salts > 1:
            summed = _salted_sum(contribs, "dst", "c", "msum", n_salts, salt_src="src")
        else:
            summed = contribs.groupBy("dst").agg(F.sum("c").alias("msum"))
        carry = ["id", F.col("rank").alias("_prev"), "dang"] + (
            ["rst"] if reset is not None else []
        )
        joined = (
            state.select(*carry)
            .join(summed.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(dang_row(state)))
        )
        return finish(joined, "msum", F.col("_dsum"))

    def step_bhj(state: DataFrame) -> DataFrame:
        contribs = edges_w.join(
            F.broadcast(state.select(F.col("id").alias("src"), "rank")), "src"
        ).select("block", "dst", (F.col("rank") * F.col("w")).alias("c"))
        # hashpartitioning(block) satisfies ClusteredDistribution(block, dst)
        # → partition-complete aggregate, no exchange
        summed = contribs.groupBy("block", "dst").agg(F.sum("c").alias("msum"))
        # NOTE: no prev-rank tracking inside this DAG — embedding a
        # second broadcast of the state here made per-superstep wall
        # grow ~2x/step late in tolerance runs (AQE re-planning of the
        # extra broadcast join); the convergence delta is instead
        # computed by step() as a separate small join of the two
        # checkpointed state frames, keeping this plan identical to the
        # (measured-flat) fixed-iteration plan.
        joined = ids_b.join(summed.withColumnRenamed("dst", "id"), ["block", "id"], "left").withColumn(
            "_prev", F.lit(0.0)
        )
        return finish(joined.crossJoin(F.broadcast(dang_row(state))), "msum", F.col("_dsum"))

    def step_csr(state: DataFrame) -> DataFrame:
        from quiver_spark import csr

        summed = csr.csr_contributions(blocked, state.select("id", "rank"), n_blocks)
        carry = ["id", F.col("rank").alias("_prev"), "dang"] + (
            ["rst"] if reset is not None else []
        )
        joined = (
            state.select(*carry)
            .join(summed.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(dang_row(state)))
        )
        return finish(joined, "msum", F.col("_dsum"))

    # --- csr_bcast: numpy vertex mirror, zero-shuffle superstep ---
    bcast_box: list = [None]

    def step_csr_bcast(state: DataFrame) -> DataFrame:
        pdf = state.select("id", "rank", "dang").toPandas()
        order = np.argsort(pdf["id"].to_numpy(np.int64), kind="stable")
        bids = pdf["id"].to_numpy(np.int64)[order]
        branks = pdf["rank"].to_numpy(np.float64)[order]
        dsum = float(pdf["rank"].to_numpy(np.float64)[pdf["dang"].to_numpy(bool)].sum())
        old = bcast_box[0]
        bcast_box[0] = sc.broadcast((bids, branks))
        if old is not None:
            old.unpersist(blocking=False)
        b = bcast_box[0]
        dmass = dsum / float(n)
        d = damping
        bb = base

        def kernel(e_pdf: pd.DataFrame, v_pdf: pd.DataFrame) -> pd.DataFrame:
            if v_pdf.empty:
                return pd.DataFrame(
                    {"id": pd.Series(dtype="int64"), "rank": pd.Series(dtype="float64"),
                     "dang": pd.Series(dtype=bool), "delta": pd.Series(dtype="float64")}
                )
            g_ids, g_ranks = b.value
            vid = v_pdf["id"].to_numpy(np.int64)
            if e_pdf.empty:
                msum = np.zeros(len(vid))
            else:
                src = e_pdf["src"].to_numpy(np.int64)
                dst = e_pdf["dst"].to_numpy(np.int64)
                w = e_pdf["w"].to_numpy(np.float64)
                pos = np.searchsorted(g_ids, src)
                pos = np.clip(pos, 0, len(g_ids) - 1)
                contrib = np.where(g_ids[pos] == src, g_ranks[pos], 0.0) * w
                if np.all(dst[1:] >= dst[:-1]):
                    # cached blocks arrive sorted by dst → segment-reduce
                    # without the argsort inside np.unique
                    starts = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
                    udst = dst[starts]
                    sums = np.add.reduceat(contrib, starts)
                else:
                    udst, inv = np.unique(dst, return_inverse=True)
                    sums = np.bincount(inv, weights=contrib, minlength=len(udst))
                vpos = np.searchsorted(udst, vid)
                vpos = np.clip(vpos, 0, max(len(udst) - 1, 0))
                msum = np.where(udst[vpos] == vid, sums[vpos], 0.0)
            new_rank = bb + d * (msum + dmass)
            ppos = np.searchsorted(g_ids, vid)
            ppos = np.clip(ppos, 0, len(g_ids) - 1)
            prev = np.where(g_ids[ppos] == vid, g_ranks[ppos], 0.0)
            return pd.DataFrame(
                {"id": vid, "rank": new_rank, "dang": v_pdf["dang"].to_numpy(bool),
                 "delta": np.abs(new_rank - prev)}
            )

        return (
            edges_b.groupBy("block")
            .cogroup(ids_b.groupBy("block"))
            .applyInPandas(kernel, "id long, rank double, dang boolean, delta double")
        )

    def step_csr_packed(state: DataFrame) -> DataFrame:
        from quiver_spark import csr_packed

        pdf = state.select("id", "rank", "dang").toPandas()
        ids_np = pdf["id"].to_numpy(np.int64)
        rk = pdf["rank"].to_numpy(np.float64)
        dsum = float(rk[pdf["dang"].to_numpy(bool)].sum())
        order = np.argsort(ids_np, kind="stable")
        out = csr_packed.superstep(
            packed, rk[order], inv_outdeg, base, damping, dsum / float(n)
        )
        old = bcast_box[0]
        bcast_box[0] = out._qs_broadcast  # noqa: SLF001
        if old is not None:
            old.unpersist(blocking=False)
        return out

    bodies = {
        "smj": step_smj,
        "bhj": step_bhj,
        "csr": step_csr,
        "csr_bcast": step_csr_bcast,
        "csr_packed": step_csr_packed,
    }
    body = bodies[strategy]

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        new_state = body(state)
        # materialize ONCE here; tell the runner not to re-checkpoint
        new_state = truncated_checkpoint(new_state)
        new_state._qs_checkpointed = True  # noqa: SLF001 — runner contract
        if fixed:
            return new_state, None
        if strategy == "bhj":
            # delta as a separate small query over the two checkpointed
            # state frames (see step_bhj note)
            delta = (
                new_state.join(state.select("id", F.col("rank").alias("_p")), "id")
                .agg(F.max(F.abs(F.col("rank") - F.col("_p"))))
                .collect()[0][0]
            )
        else:
            delta = new_state.agg(F.max("delta")).collect()[0][0]
        return new_state, float(delta if delta is not None else 0.0)

    try:
        result = runner.run(
            state0,
            step,
            tol=None if fixed else tol,
            max_iters=total_iters,
            job_key=(
                f"pagerank:damping={damping}:strategy={strategy}"
                + (":personalized" if reset is not None else "")
            ),
        )
    finally:
        for df in persisted:
            df.unpersist()
        if bcast_box[0] is not None:
            bcast_box[0].unpersist(blocking=False)
    result.state = result.state.select("id", "rank")
    return result

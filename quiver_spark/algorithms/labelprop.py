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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepRunner, SuperstepResult


def _lp_csr_kernel(p_pdf: pd.DataFrame, s_pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-block label histogram over a packed CSR block (csr_blocks
    layout): (dst, label, pcnt, is_old) partials.

    Sort-free: the pre-resolved dst runs + per-block label codes give
    a compact ``run_index * K + code`` key for one bincount. Because
    ``vids`` partitions the vertex set, the kernel emits exactly one
    ``is_old`` row per block vertex carrying its OLD label — the
    keep-current fallback + in-frame change detection, with no
    injected self-loop rows and no extra vertex-sized join (the
    ``pold`` pattern from
    :func:`~quiver_spark.algorithms.components._cc_csr_kernel`).
    Real self-loop edges stay in the packed arrays and still vote.
    """
    from quiver_spark import csr_blocks

    empty = pd.DataFrame(
        {"dst": pd.Series(dtype="int64"), "label": pd.Series(dtype="object"),
         "pcnt": pd.Series(dtype="int64"), "is_old": pd.Series(dtype=bool)}
    )
    if p_pdf.empty or s_pdf.empty:
        return empty
    codes, uniques = pd.factorize(s_pdf["label"], sort=True)
    sid = s_pdf["id"].to_numpy(np.int64)
    out = []
    for _, row in p_pdf.iterrows():
        vids, src_pos, dst_starts, udst = csr_blocks.unpack(row)
        vcode = csr_blocks.align_state(vids, sid, codes, -1)
        ok = vcode >= 0
        out.append(pd.DataFrame({
            "dst": vids[ok],
            "label": uniques.take(vcode[ok]).astype(object),
            "pcnt": np.zeros(int(ok.sum()), dtype=np.int64),
            "is_old": np.ones(int(ok.sum()), dtype=bool),
        }))
        if len(src_pos):
            code = vcode[src_pos]
            run_len = np.diff(np.append(dst_starts, len(src_pos)))
            run_idx = np.repeat(np.arange(len(dst_starts)), run_len)
            K = len(uniques)
            keep = code >= 0
            if keep.any():
                # dense run×K bincount would zero a (runs * K)-cell
                # array per call — unbounded in K; the key stream is
                # already near-sorted (dst runs), so np.unique's sort
                # is cheap and the footprint is O(n_edges)
                key = run_idx[keep] * np.int64(K) + code[keep]
                uk, cnt = np.unique(key, return_counts=True)
                out.append(pd.DataFrame({
                    "dst": udst[uk // K],
                    "label": uniques.take((uk % K).astype(np.int64)).astype(object),
                    "pcnt": cnt,
                    "is_old": np.zeros(len(uk), dtype=bool),
                }))
    return pd.concat(out, ignore_index=True) if out else empty


def label_propagation(
    graph: Graph,
    label_col: str = "lang",
    num_iters: int | None = None,
    max_iters: int = 20,
    direction: str = "both",
    strategy: str = "smj",
    n_blocks: int | None = None,
    runner: SuperstepRunner | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id, label)``.

    ``num_iters`` pins the round count (oracle mode); otherwise stops
    when no vertex changes label (delta = #changed).

    ``strategy="bhj"`` is the zero-exchange mirror round: messages
    persisted hash-blocked by destination (plus one injected,
    ``inj``-tagged self-loop per vertex), state broadcast, histogram +
    argmax + fallback all partition-complete. The injected self-loop
    picks up the vertex's OLD label from the same broadcast — it never
    votes in the histogram, but provides both the keep-current-label
    fallback for message-less vertices and the in-frame ``_changed``
    flag, so fixpoint mode pays no per-round state join (the pattern
    CC uses, components.py ``_cc_csr_kernel``). ``csr`` does the same
    through the cogrouped Arrow kernel's ``is_old`` rows.
    ``auto`` mirrors while the state is broadcast-sized.
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    if strategy == "auto":
        # tiny graphs: mirror fixed costs dominate → smj (measured
        # 12.2s vs 16.3s on the 200k-edge repo graph); mirror-sized →
        # bhj; beyond-broadcast → cogrouped-CSR histogram kernel
        if graph.edges.count() < 2_000_000:
            strategy = "smj"
        else:
            strategy = "bhj" if graph.vertices.count() <= 50_000_000 else "csr"
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
    state0 = graph.vertices.select("id", F.col(label_col).cast("string").alias("label"))
    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    persisted = []

    # tagged self-loop injection (bhj/csr): one (v, v, inj=True) row
    # per vertex rides the static blocked frame, carrying each
    # vertex's OLD label into the round — fallback for message-less
    # vertices AND in-frame change detection, with no per-round
    # vertex-sized state join. Real self-loop edges keep inj=False and
    # still vote in the histogram; injected rows never do.
    self_loops = graph.vertices.select(
        F.col("id").alias("u"), F.col("id").alias("v"), F.lit(True).alias("inj")
    )

    nb = n_blocks or max(spark.sparkContext.defaultParallelism, 8)
    if strategy == "bhj":
        msgs_edges = (
            msgs_edges.withColumn("inj", F.lit(False))
            .unionByName(self_loops)
            .withColumn("block", F.pmod(F.xxhash64("v"), F.lit(nb)).cast("int"))
            .repartition(nb, "block")
            .sortWithinPartitions("block", "v")
            .persist()
        )
    elif strategy == "csr":
        # beyond-broadcast: message edges resolved ONCE into packed
        # per-block CSR buffers keyed by hash(src) (csr_blocks module
        # docstring — per-superstep Arrow row assembly was the scaling
        # cap); state shuffles to the same blocking each round. No
        # injected self-loops: the kernel emits each block vertex's
        # old label off the packed vid list instead.
        from quiver_spark import csr_blocks

        msgs_edges = csr_blocks.build_packed_blocks(
            msgs_edges.select(F.col("u").alias("src"), F.col("v").alias("dst")),
            graph.vertices.select("id"),
            nb,
        )
    else:
        msgs_edges = msgs_edges.persist()
    msgs_edges.count()
    persisted.append(msgs_edges)

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        if strategy == "bhj":
            joined = msgs_edges.join(F.broadcast(state.withColumnRenamed("id", "u")), "u")
            hist = (
                joined.filter(~F.col("inj"))
                .groupBy("block", "v", "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            # the injected self-loop row picked up v's OWN label from
            # the same broadcast — the old label, in-frame, for free
            olds = joined.filter(F.col("inj")).select(
                "block", F.col("v").alias("id"), F.col("label").alias("_old")
            )
            # hashpartitioning(block) satisfies every clustering below —
            # the whole round is partition-complete after one broadcast
            maxc = hist.groupBy("block", "v").agg(F.max("cnt").alias("maxc"))
            best = (
                hist.join(maxc, ["block", "v"])
                .filter(F.col("cnt") == F.col("maxc"))
                .groupBy("block", F.col("v").alias("id"))
                .agg(F.min("label").alias("new_label"))
            )
            new_label = F.coalesce(F.col("new_label"), F.col("_old"))
            new_state = olds.join(best, ["block", "id"], "left").select(
                "id", new_label.alias("label"), (new_label != F.col("_old")).alias("_changed")
            )
        elif strategy == "csr":
            state_b = state.withColumn("block", F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int"))
            partials = (
                msgs_edges.groupBy("block")
                .cogroup(state_b.groupBy("block"))
                .applyInPandas(
                    lambda e, s: _lp_csr_kernel(e, s),
                    "dst long, label string, pcnt long, is_old boolean",
                )
            )
            hist = (
                partials.filter(~F.col("is_old"))
                .groupBy(F.col("dst").alias("id"), "label")
                .agg(F.sum("pcnt").alias("cnt"))
            )
            # exactly one is_old row per vertex (from block hash(v))
            olds = partials.filter(F.col("is_old")).select(
                F.col("dst").alias("id"), F.col("label").alias("_old")
            )
            maxc = hist.groupBy("id").agg(F.max("cnt").alias("maxc"))
            best = (
                hist.join(maxc, "id")
                .filter(F.col("cnt") == F.col("maxc"))
                .groupBy("id")
                .agg(F.min("label").alias("new_label"))
            )
            # fallback + change detection off the kernel-emitted old
            # label — the same vertex-sized SMJ the seed fallback cost,
            # but no separate changed-count join per round anymore
            new_label = F.coalesce(F.col("new_label"), F.col("_old"))
            new_state = olds.join(best, "id", "left").select(
                "id", new_label.alias("label"), (new_label != F.col("_old")).alias("_changed")
            )
        else:
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
            # old label is in-frame here, so change detection folds
            # into the same plan (no separate join job per round)
            new_state = state.join(best, "id", "left").select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                (F.coalesce(F.col("new_label"), F.col("label")) != F.col("label")).alias("_changed"),
            )
        if fixed:
            return new_state.select("id", "label"), None
        # every tier now carries _changed in-frame (smj: old label in
        # the join; bhj/csr: injected self-loops), so the fixpoint
        # check is one cached-scan aggregate — no per-round join job
        new_state = new_state.localCheckpoint()
        new_state._qs_checkpointed = True  # noqa: SLF001 — runner contract
        changed = new_state.agg(F.sum(F.col("_changed").cast("int"))).collect()[0][0] or 0
        return new_state.drop("_changed"), float(changed)

    try:
        return runner.run(state0, step, tol=None if fixed else 0.0, max_iters=total)
    finally:
        for df in persisted:
            df.unpersist()

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


def _lp_csr_kernel(e_pdf: pd.DataFrame, s_pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-block label histogram: (dst, label, pcnt) partial counts.

    Sort-free on the persisted (block, dst)-sorted layout: dst runs +
    per-block label codes give a compact ``run_index * K + code`` key
    for one bincount — no per-round numpy sort of the edge arrays.
    """
    empty = pd.DataFrame(
        {"dst": pd.Series(dtype="int64"), "label": pd.Series(dtype="object"),
         "pcnt": pd.Series(dtype="int64")}
    )
    if e_pdf.empty or s_pdf.empty:
        return empty
    src = e_pdf["src"].to_numpy(np.int64)
    dst = e_pdf["dst"].to_numpy(np.int64)
    if not np.all(dst[1:] >= dst[:-1]):  # fallback: unsorted input
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
    codes, uniques = pd.factorize(s_pdf["label"], sort=True)
    sid = s_pdf["id"].to_numpy(np.int64)
    so = np.argsort(sid, kind="stable")
    sid_s, codes_s = sid[so], codes[so]
    pos = np.clip(np.searchsorted(sid_s, src), 0, len(sid_s) - 1)
    found = sid_s[pos] == src
    code = np.where(found, codes_s[pos], -1)
    # dst runs → run index per edge; compact (run, code) key → bincount
    starts = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
    run_len = np.diff(np.append(starts, len(dst)))
    run_idx = np.repeat(np.arange(len(starts)), run_len)
    K = len(uniques)
    keep = code >= 0
    if not keep.any():
        return empty
    key = run_idx[keep] * K + code[keep]
    cnt = np.bincount(key, minlength=len(starts) * K)
    nz = np.flatnonzero(cnt)
    return pd.DataFrame(
        {
            "dst": dst[starts][nz // K],
            "label": uniques.take(nz % K).astype(object),
            "pcnt": cnt[nz],
        }
    )


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
    persisted hash-blocked by destination, state broadcast, histogram
    + argmax + seed-fallback all partition-complete (a vertex that
    never receives a message provably keeps its SEED label — labels
    only change via messages — so the static blocked vertex frame can
    carry the fallback and no second state join is needed).
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

    nb = n_blocks or max(spark.sparkContext.defaultParallelism, 8)
    if strategy == "bhj":
        msgs_edges = (
            msgs_edges.withColumn("block", F.pmod(F.xxhash64("v"), F.lit(nb)).cast("int"))
            .repartition(nb, "block")
            .sortWithinPartitions("block", "v")
            .persist()
        )
        ids_b = (
            state0.withColumnRenamed("label", "_seed")
            .withColumn("block", F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int"))
            .repartition(nb, "block")
            .sortWithinPartitions("block", "id")
            .persist()
        )
        ids_b.count()
        persisted.append(ids_b)
    elif strategy == "csr":
        # beyond-broadcast: (block, dst)-sorted CSR blocks keyed by
        # hash(src); state shuffles to the same blocking each round
        msgs_edges = (
            msgs_edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
            .withColumn("block", F.pmod(F.xxhash64("src"), F.lit(nb)).cast("int"))
            .repartition(nb, "block")
            .sortWithinPartitions("block", "dst")
            .persist()
        )
        seeds = state0.withColumnRenamed("label", "_seed").persist()
        seeds.count()
        persisted.append(seeds)
    else:
        msgs_edges = msgs_edges.persist()
    msgs_edges.count()
    persisted.append(msgs_edges)

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        if strategy == "bhj":
            hist = (
                msgs_edges.join(F.broadcast(state.withColumnRenamed("id", "u")), "u")
                .groupBy("block", "v", "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
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
            new_state = (
                ids_b.join(best, ["block", "id"], "left")
                .select("id", F.coalesce(F.col("new_label"), F.col("_seed")).alias("label"))
            )
        elif strategy == "csr":
            state_b = state.withColumn("block", F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int"))
            hist = (
                msgs_edges.groupBy("block")
                .cogroup(state_b.groupBy("block"))
                .applyInPandas(lambda e, s: _lp_csr_kernel(e, s), "dst long, label string, pcnt long")
                .groupBy(F.col("dst").alias("id"), "label")
                .agg(F.sum("pcnt").alias("cnt"))
            )
            maxc = hist.groupBy("id").agg(F.max("cnt").alias("maxc"))
            best = (
                hist.join(maxc, "id")
                .filter(F.col("cnt") == F.col("maxc"))
                .groupBy("id")
                .agg(F.min("label").alias("new_label"))
            )
            # seed fallback for message-less vertices: vertex-sized SMJ
            # (the broadcast trick is exactly what this tier can't use)
            new_state = seeds.join(best, "id", "left").select(
                "id", F.coalesce(F.col("new_label"), F.col("_seed")).alias("label")
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
        new_state = new_state.localCheckpoint()
        new_state._qs_checkpointed = True  # noqa: SLF001 — runner contract
        if strategy in ("bhj", "csr"):
            # these rounds have no old-label column in-frame (bhj's
            # ids_b / csr's seeds carry only the seed); a second state
            # broadcast inside the hot DAG is the measured AQE trap, so
            # the fixpoint check stays a separate join over the two
            # checkpointed states
            changed = (
                new_state.join(state.select("id", F.col("label").alias("_old")), "id")
                .filter(F.col("label") != F.col("_old"))
                .count()
            )
            return new_state, float(changed)
        changed = new_state.agg(F.sum(F.col("_changed").cast("int"))).collect()[0][0] or 0
        return new_state.drop("_changed"), float(changed)

    try:
        return runner.run(state0, step, tol=None if fixed else 0.0, max_iters=total)
    finally:
        for df in persisted:
            df.unpersist()

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
    """Per-block label histogram: (dst, label, pcnt, is_old) partials.

    Sort-free on the persisted (block, dst)-sorted layout: dst runs +
    per-block label codes give a compact ``run_index * K + code`` key
    for one bincount — no per-round numpy sort of the edge arrays.

    Rows with ``inj=True`` are the injected self-loops (one per
    vertex, blocked with the vertex's own state): they are EXCLUDED
    from the histogram (a vertex's own label must not vote — real
    self-loop edges still do) and instead emit the vertex's OLD label
    as an ``is_old`` row, so the round's fallback + change detection
    need no extra vertex-sized join (the ``pold`` pattern from
    :func:`~quiver_spark.algorithms.components._cc_csr_kernel`).
    """
    empty = pd.DataFrame(
        {"dst": pd.Series(dtype="int64"), "label": pd.Series(dtype="object"),
         "pcnt": pd.Series(dtype="int64"), "is_old": pd.Series(dtype=bool)}
    )
    if e_pdf.empty or s_pdf.empty:
        return empty
    src = e_pdf["src"].to_numpy(np.int64)
    dst = e_pdf["dst"].to_numpy(np.int64)
    inj = e_pdf["inj"].to_numpy(bool)
    if not np.all(dst[1:] >= dst[:-1]):  # fallback: unsorted input
        order = np.argsort(dst, kind="stable")
        src, dst, inj = src[order], dst[order], inj[order]
    codes, uniques = pd.factorize(s_pdf["label"], sort=True)
    sid = s_pdf["id"].to_numpy(np.int64)
    so = np.argsort(sid, kind="stable")
    sid_s, codes_s = sid[so], codes[so]

    def lookup(ids: np.ndarray) -> np.ndarray:
        pos = np.clip(np.searchsorted(sid_s, ids), 0, len(sid_s) - 1)
        return np.where(sid_s[pos] == ids, codes_s[pos], -1)

    out = []
    # injected self-loops → old-label rows (src == dst == the vertex,
    # which lives in this block by construction: block = hash(src))
    if inj.any():
        oid = dst[inj]
        ocode = lookup(src[inj])
        ok = ocode >= 0
        out.append(pd.DataFrame({
            "dst": oid[ok],
            "label": uniques.take(ocode[ok]).astype(object),
            "pcnt": np.zeros(int(ok.sum()), dtype=np.int64),
            "is_old": np.ones(int(ok.sum()), dtype=bool),
        }))
    src, dst = src[~inj], dst[~inj]  # masked subset stays dst-sorted
    if len(dst):
        code = lookup(src)
        # dst runs → run index per edge; compact (run, code) key → bincount
        starts = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
        run_len = np.diff(np.append(starts, len(dst)))
        run_idx = np.repeat(np.arange(len(starts)), run_len)
        K = len(uniques)
        keep = code >= 0
        if keep.any():
            key = run_idx[keep] * K + code[keep]
            cnt = np.bincount(key, minlength=len(starts) * K)
            nz = np.flatnonzero(cnt)
            out.append(pd.DataFrame({
                "dst": dst[starts][nz // K],
                "label": uniques.take(nz % K).astype(object),
                "pcnt": cnt[nz],
                "is_old": np.zeros(len(nz), dtype=bool),
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
        # beyond-broadcast: (block, dst)-sorted CSR blocks keyed by
        # hash(src); state shuffles to the same blocking each round.
        # Injected self-loops land in block hash(v) — the same block
        # that holds v's state row, so the kernel can read its label.
        msgs_edges = (
            msgs_edges.withColumn("inj", F.lit(False))
            .unionByName(self_loops)
            .select(F.col("u").alias("src"), F.col("v").alias("dst"), "inj")
            .withColumn("block", F.pmod(F.xxhash64("src"), F.lit(nb)).cast("int"))
            .repartition(nb, "block")
            .sortWithinPartitions("block", "dst")
            .persist()
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

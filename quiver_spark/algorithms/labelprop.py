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
from quiver_spark.superstep import SuperstepRunner, SuperstepResult, truncated_checkpoint


def _lp_csr_kernel(p_pdf: pd.DataFrame, s_pdf: pd.DataFrame, n_codes: int) -> pd.DataFrame:
    """Per-block label histogram over a packed CSR block (csr_blocks
    layout): (dst, code, pcnt, is_old) partials — labels travel as
    GLOBAL integer codes (lex-ordered dictionary built once at setup),
    so the per-superstep message path is pure int64: no per-round
    factorize, no string Arrow/shuffle volume, and the downstream
    ``min(code)`` tie-break equals the lexicographic-min label.

    Sort-free: the pre-resolved dst runs + codes give a compact
    ``run_index * K + code`` key; ``np.unique`` on that key (the dense
    bincount would zero a runs×K-cell array — unbounded in label
    cardinality; the key stream is near-sorted by dst runs, so the
    sort is cheap and memory stays O(n_edges)). Because ``vids``
    partitions the vertex set, the kernel emits exactly one ``is_old``
    row per block vertex carrying its OLD code — keep-current fallback
    + in-frame change detection, no injected self-loop rows (the
    ``pold`` pattern from
    :func:`~quiver_spark.algorithms.components._cc_csr_kernel`).
    Real self-loop edges stay in the packed arrays and still vote.
    Null labels carry code -1: they never vote, but their vertices
    keep their (null) label through the fallback.
    """
    from quiver_spark import csr_blocks

    empty = pd.DataFrame(
        {"dst": pd.Series(dtype="int64"), "code": pd.Series(dtype="int64"),
         "pcnt": pd.Series(dtype="int64"), "is_old": pd.Series(dtype=bool)}
    )
    if p_pdf.empty or s_pdf.empty:
        return empty
    sid = s_pdf["id"].to_numpy(np.int64)
    scode = s_pdf["code"].to_numpy(np.int64)
    out = []
    for _, row in p_pdf.iterrows():
        vids, src_pos, dst_starts, udst = csr_blocks.unpack(row)
        vcode = csr_blocks.align_state(vids, sid, scode, -1)
        out.append(pd.DataFrame({
            "dst": vids, "code": vcode,
            "pcnt": np.zeros(len(vids), dtype=np.int64),
            "is_old": np.ones(len(vids), dtype=bool),
        }))
        if len(src_pos):
            code = vcode[src_pos]
            run_idx = np.repeat(
                np.arange(len(dst_starts)),
                np.diff(np.append(dst_starts, len(src_pos))),
            )
            keep = code >= 0
            if keep.any():
                K = np.int64(max(n_codes, 1))
                uk, cnt = np.unique(run_idx[keep] * K + code[keep], return_counts=True)
                out.append(pd.DataFrame({
                    "dst": udst[uk // K],
                    "code": uk % K,
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
    ``auto`` runs tiny graphs on the guarded driver-numpy tier
    (``local``, algorithms/local_tier.py) and mirrors while the
    state is broadcast-sized.
    """
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    if strategy == "auto":
        # shared conf-driven tiering (quiver_spark.tiering): tiny →
        # smj, mirror-sized → spark.quiver.auto.mirrorStrategy (bhj
        # default), beyond-broadcast → cogrouped-CSR histogram kernel
        from quiver_spark import tiering

        strategy = tiering.auto_strategy(
            spark,
            graph.edges.count(),
            lambda: graph.vertices.count(),
            allow_local=runner.run_dir is None,
        )
    if strategy == "local":
        # driver-local numpy votes (algorithms/local_tier.py): guarded
        # Arrow collect; identical argmax/(count desc, label asc)
        # semantics via lex-ordered codes — equality-tested vs smj
        from quiver_spark.algorithms import local_tier

        if runner.run_dir is not None:
            raise ValueError(
                "strategy='local' keeps state in the driver; durable "
                "checkpoint/resume (run_dir) needs a distributed strategy"
            )
        return local_tier.lp_local(
            graph, label_col=label_col, num_iters=num_iters,
            max_iters=max_iters, direction=direction,
        )
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

    # tagged self-loop injection (bhj only — the csr kernel emits old
    # labels off its packed vid list instead): one (v, v, inj=True)
    # row per vertex rides the static blocked frame, carrying each
    # vertex's OLD label into the round — fallback for message-less
    # vertices AND in-frame change detection, with no per-round
    # vertex-sized state join. Real self-loop edges keep inj=False and
    # still vote in the histogram; injected rows never do.
    self_loops = graph.vertices.select(
        F.col("id").alias("u"), F.col("id").alias("v"), F.lit(True).alias("inj")
    )

    nb = n_blocks or max(spark.sparkContext.defaultParallelism, 8)
    label_dict = None
    n_codes = 0
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
        from pyspark.sql.window import Window

        from quiver_spark import csr_blocks

        msgs_edges = csr_blocks.build_packed_blocks(
            msgs_edges.select(F.col("u").alias("src"), F.col("v").alias("dst")),
            graph.vertices.select("id"),
            nb,
        )
        # global label dictionary, lex-ordered so min(code) == min
        # (label): LP only ever ADOPTS existing labels, so the seed
        # dictionary covers every label any round can produce. The
        # single-partition window is dictionary-sized (label
        # cardinality, same bound as the broadcast below) — never
        # edge- or vertex-sized. Codes are deterministic, so a resumed
        # run rebuilds the identical dictionary from the static seed
        # labels. Supersteps then run pure-int end to end; the result
        # is decoded back to strings once, after the fixpoint.
        label_dict = (
            state0.select("label").where(F.col("label").isNotNull()).distinct()
            .withColumn("code", F.row_number().over(Window.orderBy("label")) - F.lit(1))
            .persist()
        )
        n_codes = label_dict.count()
        persisted.append(label_dict)
        state0 = state0.join(F.broadcast(label_dict), "label", "left").select(
            "id", F.coalesce(F.col("code"), F.lit(-1)).alias("code")
        )
    else:
        msgs_edges = msgs_edges.persist()
    msgs_edges.count()
    persisted.append(msgs_edges)

    # argmax-with-lex-tie-break in ONE aggregate: min(struct(-cnt,
    # label)) picks max count, then the lexicographically smallest
    # label. Round 3 removed the previous maxc + hist⋈maxc join +
    # re-aggregate dance — a (vertices × labels)-sized JOIN per round
    # collapses into a second map-side-combinable aggregate. Null
    # labels never vote in any tier (filtered before the histogram).
    def _argmax(hist: DataFrame, keys: list[str], label_col_: str, out: str) -> DataFrame:
        m = F.min(F.struct((-F.col("cnt")).alias("nc"), F.col(label_col_).alias("lb")))
        return hist.groupBy(*keys).agg(m.alias("_m")).select(*keys, F.col("_m.lb").alias(out))

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        if strategy == "bhj":
            joined = msgs_edges.join(F.broadcast(state.withColumnRenamed("id", "u")), "u")
            # ONE pass over the broadcast-join output (round-3 ADVICE:
            # the hist branch + the olds filter each re-scanned
            # ``joined``): level 1 merges the vote counts and the
            # injected-self-loop old-label marker per (block, v, label);
            # level 2 folds argmax + fallback + change detection into a
            # single aggregate. hashpartitioning(block) satisfies both
            # clusterings — the round stays partition-complete after
            # one broadcast, and the old best⟕olds join is gone.
            lvl1 = joined.groupBy("block", "v", "label").agg(
                F.count(
                    F.when(~F.col("inj") & F.col("label").isNotNull(), F.lit(1))
                ).alias("cnt"),
                F.max("inj").alias("has_inj"),
            )
            lvl2 = lvl1.groupBy("block", "v").agg(
                F.min(
                    F.when(
                        F.col("cnt") > 0,
                        F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("lb")),
                    )
                ).alias("_m"),
                F.max(F.when(F.col("has_inj"), F.col("label"))).alias("_old"),
            )
            new_label = F.coalesce(F.col("_m.lb"), F.col("_old"))
            # eqNullSafe: a NULL-seeded vertex adopting its first label
            # IS a change (plain != yields NULL and the changed-count
            # sum would skip it — round-3 ADVICE null-safety finding)
            new_state = lvl2.select(
                F.col("v").alias("id"),
                new_label.alias("label"),
                (~new_label.eqNullSafe(F.col("_old"))).alias("_changed"),
            )
        elif strategy == "csr":
            # pure-int round: codes through the kernel, the partial
            # shuffle, and the argmax — min(code) IS the lex tie-break
            # because the dictionary is lex-ordered
            state_b = state.withColumn("block", F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int"))
            partials = (
                msgs_edges.groupBy("block")
                .cogroup(state_b.groupBy("block"))
                .applyInPandas(
                    lambda e, s: _lp_csr_kernel(e, s, n_codes),
                    "dst long, code long, pcnt long, is_old boolean",
                )
            )
            # ONE pass over the kernel output (round-3 ADVICE: the hist
            # branch and the is_old filter each re-ran the cogroup +
            # Arrow kernel — twice the packed-layout cost per round):
            # level 1 merges vote-count partials and the is_old marker
            # per (id, code); level 2 is argmax + fallback + change
            # detection in one aggregate, replacing the olds⟕best SMJ.
            lvl1 = partials.groupBy(F.col("dst").alias("id"), "code").agg(
                F.sum(F.when(~F.col("is_old"), F.col("pcnt"))).alias("cnt"),
                F.max("is_old").alias("has_old"),
            )
            lvl2 = lvl1.groupBy("id").agg(
                F.min(
                    F.when(
                        F.col("cnt") > 0,
                        F.struct((-F.col("cnt")).alias("nc"), F.col("code").alias("lb")),
                    )
                ).alias("_m"),
                F.max(F.when(F.col("has_old"), F.col("code"))).alias("_old"),
            )
            # codes are never null (-1 encodes a null label), so plain
            # != is null-safe here by construction
            new_code = F.coalesce(F.col("_m.lb"), F.col("_old"))
            new_state = lvl2.select(
                "id", new_code.alias("code"), (new_code != F.col("_old")).alias("_changed")
            )
        else:
            hist = (
                msgs_edges.join(state.withColumnRenamed("id", "u"), "u")
                .filter(F.col("label").isNotNull())
                .groupBy(F.col("v").alias("id"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            best = _argmax(hist, ["id"], "label", "new_label")
            # old label is in-frame here, so change detection folds
            # into the same plan (no separate join job per round).
            # eqNullSafe: NULL seed → first adopted label must count as
            # a change (ADVICE round-3 null-safety finding)
            new_label = F.coalesce(F.col("new_label"), F.col("label"))
            new_state = state.join(best, "id", "left").select(
                "id",
                new_label.alias("label"),
                (~new_label.eqNullSafe(F.col("label"))).alias("_changed"),
            )
        if fixed:
            return new_state.select("id", "code" if strategy == "csr" else "label"), None
        # every tier carries _changed in-frame (smj: old label in the
        # join; bhj: injected self-loops; csr: kernel is_old rows), so
        # the fixpoint check is one cached-scan aggregate — no
        # per-round join job
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
        res = runner.run(
            state0,
            step,
            tol=None if fixed else 0.0,
            max_iters=total,
            job_key=f"labelprop:label_col={label_col}:direction={direction}:strategy={strategy}",
        )
        if strategy == "csr":
            # decode once, after the fixpoint (code -1 → null label)
            res.state = res.state.join(F.broadcast(label_dict), "code", "left").select(
                "id", "label"
            )
        return res
    finally:
        for df in persisted:
            df.unpersist()

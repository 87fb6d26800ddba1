"""Partition-local CSR blocks: the scale path for superstep SpMV.

The north rule (BASELINE.json:6) stores edges as **partition-local CSR
blocks** so each superstep's rank×edge combine runs as a vectorized
per-partition kernel instead of a row-level join — the per-superstep
shuffle then moves only *pre-combined* (dst, partial) messages (at most
one row per distinct dst per block) rather than one row per edge.

Layout: edges are hashed into ``n_blocks`` buckets by ``src``
(``block = pmod(xxhash64(src), n_blocks)``); the rank state is hashed
by the same function of ``id``, so block *b* of the state holds exactly
the ranks of every ``src`` in edge-block *b*. A cogrouped
``applyInPandas`` kernel receives both sides of one block, builds a
CSR structure (sorted src → ``indptr``/``indices`` arrays) in numpy,
performs the local SpMV, and emits per-dst partial sums — all
Arrow-batched, no per-row Python (BASELINE.json:15).

Spark physical plan: the blocked edge frame is persisted already
hash-partitioned on ``block``, so the cogroup's exchange on the edge
side is elided by Catalyst (outputPartitioning satisfied); only the
small state frame shuffles each superstep, plus the pre-combined
message shuffle for the final ``groupBy(dst)``.

This is quiver's ``GDecomp.extend`` [pub: Verizon/quiver
core/src/main/scala/quiver/Decomp.scala#extend] with the per-vertex
function evaluated block-at-a-time instead of vertex-at-a-time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_col(col: str, n_blocks: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_blocks)).cast("int")


def blocked_edges(edges_w: DataFrame, n_blocks: int) -> DataFrame:
    """(block, src, dst, w) hash-partitioned by block, pre-sorted by
    (block, dst), persisted.

    ``edges_w`` must carry (src, dst, w). Repartitioning by ``block``
    up front means every superstep's cogroup reuses this layout — the
    big table never moves again. The ``sortWithinPartitions`` matters
    as much as the partitioning: the cogroup requires rows sorted by
    the grouping key, and a cached (block, dst)-sorted layout lets
    Catalyst elide that SortExec — without it every superstep re-sorts
    the FULL edge table (measured: the dominant per-superstep cost and
    the source of the strategy's poor 4→16 scaling). Sorting by dst
    within the block also hands the kernel ready-made dst segments, so
    the per-superstep numpy work is sort-free.
    """
    return (
        edges_w.withColumn("block", _block_col("src", n_blocks))
        .repartition(n_blocks, "block")
        .sortWithinPartitions("block", "dst")
        .persist()
    )


def _spmv_kernel(edges_pdf: pd.DataFrame, ranks_pdf: pd.DataFrame) -> pd.DataFrame:
    """Local SpMV over one CSR block: out[dst] += rank[src] * w.

    Expects edge rows (dst-sorted from the persisted layout — verified
    cheaply, re-sorted only as a fallback): per-superstep work is one
    vectorized searchsorted rank gather (per edge), a multiply, and a
    reduceat over the dst segment boundaries. No numpy sort on the
    (big) edge arrays in the steady state; the (small) per-block state
    is sorted per call. Pure numpy — one Arrow batch in, one out.
    """
    if edges_pdf.empty or ranks_pdf.empty:
        return pd.DataFrame({"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="float64")})
    src = edges_pdf["src"].to_numpy(np.int64)
    dst = edges_pdf["dst"].to_numpy(np.int64)
    w = edges_pdf["w"].to_numpy(np.float64)
    if not np.all(dst[1:] >= dst[:-1]):  # fallback: unsorted input
        order = np.argsort(dst, kind="stable")
        src, dst, w = src[order], dst[order], w[order]
    # per-edge rank gather from the (small) sorted state block
    rid = ranks_pdf["id"].to_numpy(np.int64)
    rv = ranks_pdf["rank"].to_numpy(np.float64)
    rorder = np.argsort(rid, kind="stable")
    rid_s, rv_s = rid[rorder], rv[rorder]
    pos = np.searchsorted(rid_s, src)
    pos = np.clip(pos, 0, len(rid_s) - 1)
    contrib = np.where(rid_s[pos] == src, rv_s[pos], 0.0) * w
    # in-block combine: segment-reduce over the pre-sorted dst runs
    starts = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
    udst = dst[starts]
    partial = np.add.reduceat(contrib, starts)
    return pd.DataFrame({"dst": udst, "partial": partial})


def csr_contributions(edges_blocked: DataFrame, state: DataFrame, n_blocks: int) -> DataFrame:
    """One superstep's message table ``(dst, msum)`` via CSR blocks.

    ``state`` is (id, rank). Shuffles: state → block hash (small),
    pre-combined partials → dst (≤ one row per distinct dst per
    block). The edge side reuses its persisted partitioning.
    """
    ranks_b = state.withColumn("block", _block_col("id", n_blocks))
    partials = (
        edges_blocked.groupBy("block")
        .cogroup(ranks_b.groupBy("block"))
        .applyInPandas(
            lambda e, r: _spmv_kernel(e, r),
            "dst long, partial double",
        )
    )
    return partials.groupBy("dst").agg(F.sum("partial").alias("msum"))

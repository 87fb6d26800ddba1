"""PageRank's beyond-broadcast CSR tier over packed blocks.

The north rule (BASELINE.json:6) stores edges as **partition-local CSR
blocks** so each superstep's rank×edge combine runs as a vectorized
per-partition kernel instead of a row-level join — the per-superstep
shuffle then moves only *pre-combined* (dst, partial) messages (at
most one row per distinct dst per block) rather than one row per edge.

Round 3 moved the layout from row-oriented cached frames to
:mod:`quiver_spark.csr_blocks` packed binary buffers: the measured
superstep cost of the row-oriented path was dominated by assembling
the edge rows through Arrow into pandas frames (NOTES_r3.md — ~0.6
scaling on one box, the cc-csr 0.627 root cause), while the packed
frame crosses the boundary as a memcpy of ~12 B/edge (int32 src
position + float64 weight). The state still arrives through the
cogroup's hash shuffle — one block of (id, rank) rows per kernel
call — so the rank vector never has to fit in one place: this is the
big-state tier, distinct from the ``csr_bcast``/``csr_packed`` mirror
strategies that broadcast the whole vector.

Spark physical plan: the packed frame is persisted hash-partitioned
and ordered on ``block``, so the cogroup's exchange AND sort on the
big side are elided (test_plans pins this); only the small state
frame shuffles each superstep, plus the pre-combined message shuffle
for the final ``groupBy(dst)``.

This is quiver's ``GDecomp.extend`` [pub: Verizon/quiver
core/src/main/scala/quiver/Decomp.scala#extend] with the per-vertex
function evaluated block-at-a-time instead of vertex-at-a-time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark import csr_blocks


def blocked_edges(edges_w: DataFrame, vertices: DataFrame, n_blocks: int) -> DataFrame:
    """Packed CSR blocks for the weighted edge frame ``(src, dst, w)``
    — built once, persisted; every superstep's cogroup reuses the
    layout so the big table never moves (or re-sorts) again."""
    return csr_blocks.build_packed_blocks(edges_w, vertices, n_blocks, value_col="w")


def _spmv_kernel(p_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
    """Local SpMV over one packed block: out[dst] += rank[src] * w.

    Per-superstep work: align the block's shuffled rank rows to the
    packed vid order (argsort of n_v rows), one gather through the
    pre-resolved ``src_pos``, a multiply, and a ``reduceat`` over the
    pre-computed dst segment starts. No sort or searchsorted over the
    (big) edge arrays at superstep time."""
    empty = pd.DataFrame(
        {"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="float64")}
    )
    if p_pdf.empty or r_pdf.empty:
        return empty
    rid = r_pdf["id"].to_numpy(np.int64)
    rv = r_pdf["rank"].to_numpy(np.float64)
    out = []
    for _, row in p_pdf.iterrows():
        vids, src_pos, dst_starts, udst = csr_blocks.unpack(row)
        if not len(src_pos):
            continue
        w = csr_blocks.unpack_evals(row)
        ranks = csr_blocks.align_state(vids, rid, rv, 0.0)
        partial = np.add.reduceat(ranks[src_pos] * w, dst_starts)
        out.append(pd.DataFrame({"dst": udst, "partial": partial}))
    return pd.concat(out, ignore_index=True) if out else empty


def csr_contributions(packed: DataFrame, state: DataFrame, n_blocks: int) -> DataFrame:
    """One superstep's message table ``(dst, msum)`` via packed blocks.

    ``state`` is (id, rank). Shuffles: state → block hash (small),
    pre-combined partials → dst (≤ one row per distinct dst per
    block). The packed edge side reuses its persisted partitioning."""
    ranks_b = state.select("id", "rank").withColumn(
        "block", csr_blocks.block_col("id", n_blocks)
    )
    partials = (
        packed.groupBy("block")
        .cogroup(ranks_b.groupBy("block"))
        .applyInPandas(lambda p, r: _spmv_kernel(p, r), "dst long, partial double")
    )
    return partials.groupBy("dst").agg(F.sum("partial").alias("msum"))

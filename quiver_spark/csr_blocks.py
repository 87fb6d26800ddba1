"""Packed per-block CSR: the beyond-broadcast (``csr``) tier shared by
PageRank, connected components, and label propagation.

Round-3 measurement (NOTES_r3.md): the row-oriented cogroup CSR tier
spent most of each superstep assembling 160M Arrow rows into pandas
frames on the Python side — ~11 s at 4 cores and ~5 s at 16 for a
no-op kernel — and that assembly path scaled at ~0.6, capping cc-csr
at 0.627 overall. Per-block row-count skew was measured at max/mean =
1.19 (salting would buy < 5%), so the fix is the north rule's own
prescription (BASELINE.json:6 "edges stored as partition-local CSR
blocks"): resolve each block's CSR arrays ONCE into binary buffer
columns, so the per-superstep JVM→Python transfer is a memcpy of
~4 B/edge (plus 8 B/edge of weights where the algorithm has them)
instead of a 20+ B/edge row assembly.

Unlike :mod:`quiver_spark.csr_packed` (PageRank's *mirror* tier,
which broadcasts the whole rank vector), the state here arrives
through the cogroup's hash shuffle — one block's worth of (id, state)
rows per kernel call — so the vertex state never has to fit in any
single place. That is the property that makes this the big-state
tier.

Layout, one row per ``block = pmod(xxhash64(src), n_blocks)``:

    block      int     the hash bucket
    n_v        long    #vertices whose hash is this block
    n_e        long    #message edges whose src hashes to this block
    vids       binary  int64[n_v]   block's vertex ids, sorted
    src_pos    binary  int32[n_e]   per edge (dst-sorted): position of
                                    src in ``vids``
    dst_starts binary  int32[n_u]   start offsets of each distinct-dst
                                    run in ``src_pos``
    udst       binary  int64[n_u]   the distinct dsts, sorted
    evals      binary  float64[n_e] per-edge values aligned to the
                                    dst-sorted order (empty when the
                                    build has no ``value_col``)

The per-superstep kernel aligns the shuffled state rows to ``vids``
(same hash ⇒ same id set; an argsort of n_v rows), gathers through
``src_pos`` and segment-reduces over ``dst_starts`` — no per-round
sort, no per-row Arrow. Because ``vids`` partitions the vertex set
across blocks, kernels also emit exactly one per-vertex row carrying
the vertex's OWN old state, which downstream aggregates use for the
keep-current fallback and in-frame change detection — replacing the
injected-self-loop trick the row-oriented tier needed.

This is quiver's ``GDecomp.extend`` [pub: Verizon/quiver
core/src/main/scala/quiver/Decomp.scala#extend] with the per-vertex
function evaluated block-at-a-time over a pre-resolved index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "block int, n_v long, n_e long, vids binary, src_pos binary, "
    "dst_starts binary, udst binary, evals binary"
)

_EMPTY_PACK = pd.DataFrame(
    {
        "block": pd.Series(dtype="int32"),
        "n_v": pd.Series(dtype="int64"),
        "n_e": pd.Series(dtype="int64"),
        "vids": pd.Series(dtype=object),
        "src_pos": pd.Series(dtype=object),
        "dst_starts": pd.Series(dtype=object),
        "udst": pd.Series(dtype=object),
        "evals": pd.Series(dtype=object),
    }
)


def _pack(e_pdf: pd.DataFrame, v_pdf: pd.DataFrame, value_col: str | None) -> pd.DataFrame:
    """One-time build kernel for a single block (see module layout)."""
    if v_pdf.empty:
        # srcs hash to the block ⇒ they are vertices ⇒ the vertex side
        # is non-empty whenever the edge side is; both empty ⇒ no row
        return _EMPTY_PACK
    blk = int(v_pdf["block"].iloc[0])
    vids = np.sort(v_pdf["id"].to_numpy(np.int64), kind="stable")
    evals = np.empty(0, np.float64)
    if e_pdf.empty:
        src_pos = np.empty(0, np.int32)
        dst_starts = np.empty(0, np.int32)
        udst = np.empty(0, np.int64)
    else:
        src = e_pdf["src"].to_numpy(np.int64)
        dst = e_pdf["dst"].to_numpy(np.int64)
        if len(src) >= np.iinfo(np.int32).max:
            raise ValueError(
                f"block {blk} holds {len(src)} edges — raise n_blocks so "
                "per-block CSR offsets fit int32"
            )
        order = np.argsort(dst, kind="stable")
        src_s, dst_s = src[order], dst[order]
        # clip before indexing: searchsorted returns len(vids) for a
        # src greater than every block vertex (e.g. a dangling src
        # missing from the vertex table) — the clip keeps the equality
        # check below the thing that raises, not an IndexError
        src_pos = np.minimum(
            np.searchsorted(vids, src_s), len(vids) - 1
        ).astype(np.int32)
        if not np.array_equal(vids[src_pos], src_s):  # hash-consistency
            raise ValueError(f"block {blk}: edge src outside the block's vertex set")
        starts = np.flatnonzero(np.concatenate(([True], dst_s[1:] != dst_s[:-1])))
        dst_starts = starts.astype(np.int32)
        udst = dst_s[starts]
        if value_col is not None:
            evals = e_pdf[value_col].to_numpy(np.float64)[order]
    return pd.DataFrame(
        {
            "block": [blk],
            "n_v": [len(vids)],
            "n_e": [len(src_pos)],
            "vids": [vids.tobytes()],
            "src_pos": [src_pos.tobytes()],
            "dst_starts": [dst_starts.tobytes()],
            "udst": [udst.tobytes()],
            "evals": [evals.tobytes()],
        }
    )


def block_col(col: str, n_blocks: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_blocks)).cast("int")


def build_packed_blocks(
    pairs: DataFrame,
    vertices: DataFrame,
    n_blocks: int,
    value_col: str | None = None,
) -> DataFrame:
    """Build + persist the packed frame. ``pairs`` = (src, dst
    [, value_col]) message edges (already direction-expanded and
    deduped by the caller); ``vertices`` = (id). One cogrouped pass;
    the result is persisted hash-partitioned AND ordered on ``block``
    so per-superstep cogroups reuse the layout without an exchange or
    sort on the big side."""
    cols = ["src", "dst"] + ([value_col] if value_col else [])
    e_b = pairs.select(*cols).withColumn("block", block_col("src", n_blocks))
    v_b = vertices.select("id").withColumn("block", block_col("id", n_blocks))
    packed = (
        e_b.groupBy("block")
        .cogroup(v_b.groupBy("block"))
        .applyInPandas(lambda e, v: _pack(e, v, value_col), PACK_SCHEMA)
        .repartition(n_blocks, "block")
        # ordered-by-block cache: the per-superstep cogroup's sort on
        # the packed side is elided
        .sortWithinPartitions("block")
        .persist()
    )
    packed.count()
    return packed


def unpack(row: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(vids, src_pos, dst_starts, udst) numpy views over one packed row."""
    return (
        np.frombuffer(row["vids"], np.int64),
        np.frombuffer(row["src_pos"], np.int32),
        np.frombuffer(row["dst_starts"], np.int32),
        np.frombuffer(row["udst"], np.int64),
    )


def unpack_evals(row: pd.Series) -> np.ndarray:
    """float64 per-edge values aligned to the dst-sorted edge order."""
    return np.frombuffer(row["evals"], np.float64)


def align_state(
    vids: np.ndarray, sid: np.ndarray, svals: np.ndarray, missing
) -> np.ndarray:
    """State values aligned to the ``vids`` order.

    Same hash ⇒ the state rows of a block are exactly ``vids`` — the
    fast path is a bare argsort. The searchsorted fallback (subset /
    superset state) keeps the kernel total rather than wrong if a
    caller ever feeds a filtered state."""
    so = np.argsort(sid, kind="stable")
    sid_s, svals_s = sid[so], svals[so]
    if len(sid_s) == len(vids) and np.array_equal(sid_s, vids):
        return svals_s
    pos = np.clip(np.searchsorted(sid_s, vids), 0, max(len(sid_s) - 1, 0))
    return np.where(sid_s[pos] == vids, svals_s[pos], missing)

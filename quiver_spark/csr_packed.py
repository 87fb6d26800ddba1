"""Packed CSR blocks: the high-throughput Arrow path for PageRank.

The plain cogroup CSR path (quiver_spark.csr) re-ships the edge table
through Arrow row-by-row every superstep (~28 B/edge) and rebuilds the
CSR arrays in the kernel. This module builds the CSR **once** and
stores each dst-hash block as ONE ROW of packed numpy buffers
(binary columns):

    block      int      hash(dst) % n_blocks
    vids       binary   int64[n_v]  block's vertex ids, sorted
    vdang      binary   bool[n_v]   dangling flag per vertex
    vid_gpos   binary   int32[n_v]  position of each vid in the GLOBAL
                                    sorted vertex order
    src_pos    binary   int32[n_e]  per edge (sorted by dst): position
                                    of src in the global order
    dst_starts binary   int64[n_u]  CSR indptr starts of each distinct
                                    dst run in src_pos
    udst_vpos  binary   int32[n_u]  position of each distinct dst in
                                    vids

Per superstep the ONLY data crossing the JVM↔Python boundary is
4 B/edge of pre-resolved positions (a memcpy of whole buffers — no
per-row Arrow assembly) plus an ~8 B/vertex broadcast of
out-degree-weighted ranks; the kernel is a gather + segment-reduce:

    contrib = brw[src_pos]                  # brw = rank/outdeg, global order
    sums    = np.add.reduceat(contrib, dst_starts)
    msum[udst_vpos] = sums

Zero shuffle, zero join, zero sort at superstep time. This is the
literal reading of the north rule's "edges stored as partition-local
CSR blocks ... vectorized pandas/Arrow UDFs" (BASELINE.json:6).
The weight 1/outdeg(src) is folded into the broadcast instead of an
8 B/edge column — out-degrees are static, so the driver multiplies
once per superstep.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = (
    "block int, n_v long, n_e long, vids binary, vdang binary, vid_gpos binary, "
    "src_pos binary, dst_starts binary, udst_vpos binary"
)


def build_packed_blocks(
    edges: DataFrame,
    ids: DataFrame,
    n_blocks: int,
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """One-time build. ``edges`` = (src, dst) with multiplicity,
    ``ids`` = (id, dang). Returns (packed_df persisted, gids sorted
    global id vector, inv_outdeg aligned to gids).
    """
    spark = edges.sparkSession
    sc = spark.sparkContext

    # global vertex order + out-degree vector (driver numpy, one-time)
    ipdf = ids.select("id", "dang").toPandas()
    order = np.argsort(ipdf["id"].to_numpy(np.int64), kind="stable")
    gids = ipdf["id"].to_numpy(np.int64)[order]
    od_pdf = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("od")).toPandas()
    od = np.zeros(len(gids), np.float64)
    pos = np.searchsorted(gids, od_pdf["id"].to_numpy(np.int64))
    od[pos] = od_pdf["od"].to_numpy(np.float64)
    inv_outdeg = np.where(od > 0, 1.0 / np.maximum(od, 1.0), 0.0)

    bgids = sc.broadcast(gids)

    def pack(e_pdf: pd.DataFrame, v_pdf: pd.DataFrame) -> pd.DataFrame:
        if v_pdf.empty:
            return pd.DataFrame(
                columns=["block", "n_v", "n_e", "vids", "vdang", "vid_gpos", "src_pos", "dst_starts", "udst_vpos"]
            )
        g = bgids.value
        blk = int(v_pdf["block"].iloc[0])
        vids = np.sort(v_pdf["id"].to_numpy(np.int64), kind="stable")
        vorder = np.argsort(v_pdf["id"].to_numpy(np.int64), kind="stable")
        vdang = v_pdf["dang"].to_numpy(bool)[vorder]
        vid_gpos = np.searchsorted(g, vids).astype(np.int32)
        if e_pdf.empty:
            src_pos = np.empty(0, np.int32)
            dst_starts = np.empty(0, np.int64)
            udst_vpos = np.empty(0, np.int32)
        else:
            dst = e_pdf["dst"].to_numpy(np.int64)
            src = e_pdf["src"].to_numpy(np.int64)
            eorder = np.argsort(dst, kind="stable")
            dst_s, src_s = dst[eorder], src[eorder]
            src_pos = np.searchsorted(g, src_s).astype(np.int32)
            starts = np.flatnonzero(np.concatenate(([True], dst_s[1:] != dst_s[:-1])))
            dst_starts = starts.astype(np.int64)
            udst_vpos = np.searchsorted(vids, dst_s[starts]).astype(np.int32)
        return pd.DataFrame(
            {
                "block": [blk],
                "n_v": [len(vids)],
                "n_e": [len(src_pos)],
                "vids": [vids.tobytes()],
                "vdang": [vdang.tobytes()],
                "vid_gpos": [vid_gpos.tobytes()],
                "src_pos": [src_pos.tobytes()],
                "dst_starts": [dst_starts.tobytes()],
                "udst_vpos": [udst_vpos.tobytes()],
            }
        )

    blk = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(n_blocks)).cast("int")  # noqa: E731
    e_b = edges.select("src", "dst").withColumn("block", blk("dst"))
    v_b = ids.select("id", "dang").withColumn("block", blk("id"))
    packed = (
        e_b.groupBy("block")
        .cogroup(v_b.groupBy("block"))
        .applyInPandas(pack, PACKED_SCHEMA)
        .repartition(n_blocks, "block")
        .persist()
    )
    packed.count()
    return packed, gids, inv_outdeg


def superstep(
    packed: DataFrame,
    ranks_global: np.ndarray,
    inv_outdeg: np.ndarray,
    base: float,
    damping: float,
    dangling_mass_per_n: float,
) -> DataFrame:
    """One PageRank superstep over packed blocks → (id, rank, dang,
    delta) rows. ``ranks_global`` is aligned to the gids order."""
    sc = packed.sparkSession.sparkContext
    brw = sc.broadcast((ranks_global, ranks_global * inv_outdeg))
    d = damping
    bb = base
    dm = dangling_mass_per_n

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks, weighted = brw.value
        for pdf in batches:
            for _, row in pdf.iterrows():
                n_v = int(row["n_v"])
                vids = np.frombuffer(row["vids"], np.int64)
                vdang = np.frombuffer(row["vdang"], bool)
                vid_gpos = np.frombuffer(row["vid_gpos"], np.int32)
                src_pos = np.frombuffer(row["src_pos"], np.int32)
                dst_starts = np.frombuffer(row["dst_starts"], np.int64)
                udst_vpos = np.frombuffer(row["udst_vpos"], np.int32)
                msum = np.zeros(n_v, np.float64)
                if len(src_pos):
                    contrib = weighted[src_pos]
                    sums = np.add.reduceat(contrib, dst_starts)
                    msum[udst_vpos] = sums
                new_rank = bb + d * (msum + dm)
                prev = ranks[vid_gpos]
                yield pd.DataFrame(
                    {
                        "id": vids,
                        "rank": new_rank,
                        "dang": vdang,
                        "delta": np.abs(new_rank - prev),
                    }
                )

    out = packed.mapInPandas(run, "id long, rank double, dang boolean, delta double")
    # the broadcast handle must outlive the lazy evaluation; caller's
    # localCheckpoint materializes before the next superstep replaces it
    out._qs_broadcast = brw  # noqa: SLF001
    return out

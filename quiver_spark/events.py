"""Event-stream operators: globally-ordered consecutive pairs without a
global sort.

The time-sliced transition graph (SURVEY.md §2.11; the quiver surface
is the inductive-graph view of an event log [pub: Verizon/quiver
docs/graphs.md#dynamic-graphs]) needs the lag over the TOTAL event
order ``(ts, tiebreak_id)``. ``Window.orderBy`` without a partition
spec compiles to ``Exchange SinglePartition`` + one-task sort — fine
as an oracle shape, fatal at 100 TB. :func:`sequential_pairs` computes
the same pair stream scalably:

1. bucket every event into a contiguous time range (uniform width over
   ``[min(ts), max(ts)]`` — one cheap agg; at 100 TB the event time
   span is known and the agg can be replaced by constants),
2. lag WITHIN each bucket (``Window.partitionBy(bucket)`` — a parallel
   per-partition sort, no single task),
3. stitch bucket boundaries through a per-bucket first/last summary
   (``min_by``/``max_by`` — one map-side-combinable aggregate whose
   output is ≤ ``n_buckets`` rows; the lag over THAT frame is the only
   single-partition window and it is bounded by ``n_buckets``, never
   by the data).

Empty buckets are absent from the summary, so the boundary lag
naturally chains across gaps. A bucket with a single event contributes
no intra pair and participates in both boundary sides — the stitched
stream is exactly the global-order pair stream (equality-tested
against the global-window oracle, and hash-gated against the DuckDB
twin through ``events_user_transitions``).

Time skew: a hot bucket becomes one large in-partition sort. At scale
pick ``n_buckets`` ≫ cores (buckets are cheap — the summary stays
tiny) or bucket on a monotone event-id range instead of wall time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sequential_pairs", "transition_edges"]


def sequential_pairs(
    ev: DataFrame,
    value_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_buckets: int = 64,
) -> DataFrame:
    """``(src, dst)`` for every consecutive pair of events in the
    global ``(ts_col, id_col)`` order — ``src`` is the previous event's
    ``value_col``, ``dst`` the current one's. No global sort: bucketed
    lag + boundary stitching (module doc). The first event yields no
    row. ``(ts_col, id_col)`` must be a total order (``id_col``
    unique)."""
    # timestamps can't cast to double under ANSI — go through epoch
    # micros; any numeric ts casts straight to double
    ts_dtype = dict(ev.dtypes)[ts_col]
    ts_num = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        if ts_dtype.startswith("timestamp") or ts_dtype == "date"
        else F.col(ts_col).cast("double")
    )
    bounds = ev.agg(F.min(ts_num).alias("mn"), F.max(ts_num).alias("mx")).collect()[0]
    if bounds["mn"] is None:
        return ev.sparkSession.createDataFrame([], "src long, dst long")
    mn, mx = float(bounds["mn"]), float(bounds["mx"])
    width = max((mx - mn) / n_buckets, 1e-9)
    bucket = F.least(
        F.floor((ts_num - F.lit(mn)) / F.lit(width)), F.lit(n_buckets - 1)
    ).cast("int")
    b = ev.select(
        bucket.alias("_bucket"), F.col(ts_col).alias("_ts"), F.col(id_col).alias("_id"),
        F.col(value_col).alias("_val"),
    )

    # (2) parallel per-bucket lag — hashpartitioning(_bucket), no
    # single-task sort over the event stream
    w_in = Window.partitionBy("_bucket").orderBy("_ts", "_id")
    intra = (
        b.select(F.lag("_val").over(w_in).alias("src"), F.col("_val").alias("dst"))
        .filter(F.col("src").isNotNull())
    )

    # (3) boundary stitching over the ≤ n_buckets-row summary: the
    # previous NON-EMPTY bucket's last value → this bucket's first
    order = F.struct(F.col("_ts"), F.col("_id"))
    summary = b.groupBy("_bucket").agg(
        F.min_by("_val", order).alias("first_val"), F.max_by("_val", order).alias("last_val")
    )
    w_b = Window.orderBy("_bucket")  # SinglePartition over ≤ n_buckets rows — bounded
    boundary = (
        summary.select(
            F.lag("last_val").over(w_b).alias("src"), F.col("first_val").alias("dst")
        )
        .filter(F.col("src").isNotNull())
    )
    return intra.unionByName(boundary)


def transition_edges(
    ev: DataFrame,
    value_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_buckets: int = 64,
    drop_self: bool = True,
) -> DataFrame:
    """The transition multigraph's weighted edge table: one row per
    distinct ``src → dst`` consecutive-value pair with its occurrence
    count. ``drop_self`` removes same-value transitions (the
    SURVEY §2.11 demo semantics)."""
    pairs = sequential_pairs(ev, value_col, ts_col, id_col, n_buckets)
    if drop_self:
        pairs = pairs.filter(F.col("src") != F.col("dst"))
    return pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_transitions"))

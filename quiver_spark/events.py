"""Event-stream operators: globally-ordered consecutive pairs without a
global sort.

The time-sliced transition graph (SURVEY.md §2.11; the quiver surface
is the inductive-graph view of an event log [pub: Verizon/quiver
docs/graphs.md#dynamic-graphs]) needs the lag over the TOTAL event
order ``(ts, tiebreak_id)``. ``Window.orderBy`` without a partition
spec compiles to ``Exchange SinglePartition`` + one-task sort — fine
as an oracle shape, fatal at 100 TB. :func:`sequential_pairs` computes
the same pair stream scalably:

1. bucket every event into a contiguous time range (``ntile``-style:
   approx-quantile cutpoints of ts from ONE cheap agg, so a
   time-skewed stream — a flash-crowd hour in a year of data — still
   splits into near-equal buckets instead of one hot uniform slice;
   at 100 TB the cutpoints can come from a sampled sketch or be
   pinned as constants),
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

Correctness does not depend on WHERE the cutpoints fall — any
monotone-in-ts bucketing yields the identical pair stream (the
equality suite runs uniform-degenerate and planted-skew fixtures) —
so the approx sketch's error bound only shifts load, never results.
Ties: events sharing one exact ts land in one bucket (a bucketing
must be monotone, so equal keys can't split); if a single timestamp
value dominates the stream, bucket on a monotone event-id range
instead of wall time.
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
    # ONE agg: emptiness probe + ntile-style quantile cutpoints (round-3
    # verdict: uniform-width buckets make a time-skewed stream one big
    # in-partition sort; quantile cuts track the mass, and ANY
    # monotone-in-ts bucketing yields the identical pair stream)
    qs = [float(i + 1) / n_buckets for i in range(n_buckets - 1)]
    bounds = ev.agg(
        F.min(ts_num).alias("mn"),
        (F.percentile_approx(ts_num, qs, 10_000) if qs else F.array()).alias("cuts"),
    ).collect()[0]
    if bounds["mn"] is None:
        # empty-input schema derives from value_col's actual type so an
        # empty frame unions/writes identically to a non-empty one
        from pyspark.sql.types import StructField, StructType

        vt = ev.schema[value_col].dataType
        return ev.sparkSession.createDataFrame(
            [], StructType([StructField("src", vt), StructField("dst", vt)])
        )
    cuts = sorted(float(c) for c in (bounds["cuts"] or []))
    # bucket = #cutpoints ≤ ts — monotone in ts, O(n_buckets) JVM array
    # scan per row (n_buckets is small by construction; the stitch
    # summary must stay driver-bounded anyway)
    if cuts:
        cuts_arr = F.array(*[F.lit(c) for c in cuts])
        bucket = F.size(F.filter(cuts_arr, lambda c: c <= ts_num)).cast("int")
    else:
        bucket = F.lit(0).cast("int")
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

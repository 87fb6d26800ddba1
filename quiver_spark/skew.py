"""Explicit skew handling for power-law keys (BASELINE.json:6
"explicit salting and range-partitioning to tame power-law degree
skew"; SURVEY.md §4.3).

AQE's skew-join splitting handles oversized shuffle *partitions* but
cannot split a single hot *key group* inside a hash aggregate. These
helpers do, with the salt count proportional to each key's measured
frequency (a one-pass degree sketch), so a uniform key pays nothing
and a 10M-in-degree super-node fans across ~10M/target reducer cells:

1. ``degree_sketch`` — exact counts of every key above a frequency
   floor (one groupBy; at 100 TB you would sample or use a
   count-min sketch — the floor keeps the result broadcast-small
   either way).
2. ``salted_sum`` — two-phase aggregation where the salt modulus per
   row is looked up from the broadcast sketch: hot keys get
   ``ceil(freq / rows_per_salt)`` salts, everything else modulus 1
   (one group, no overhead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def degree_sketch(
    df: DataFrame,
    key: str,
    min_freq: int = 100_000,
) -> DataFrame:
    """(key, freq) for keys with freq ≥ min_freq — the broadcast-small
    hot-key table. One shuffle, map-side combined."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    hot: DataFrame | None = None,
    rows_per_salt: int = 100_000,
    salt_entropy: Column | None = None,
) -> DataFrame:
    """Generic two-phase ``groupBy(key).agg(...)`` with
    degree-proportional salting — the shared scaffold under
    :func:`salted_sum` and the Bellman-Ford relax min
    (traverse.cheapest_path_costs). Exact only when the (partial,
    final) pair forms an algebraic aggregate: partials run per
    ``(key, _salt)`` cell, finals fold the partials per key (sum/sum,
    min/min, max/max, count/sum...).

    ``hot`` is a (key, freq) frame (from :func:`degree_sketch`);
    ``None`` computes it from ``df`` with ``min_freq=rows_per_salt``.
    ``salt_entropy`` is the column hashed to pick a salt within a hot
    key's fan — pass the other join side's key for deterministic
    spreading.

    Physical shape: broadcast the sketch, derive ``n_salts`` per row
    (1 for cold keys), partial agg on (key, salt), final agg on key.
    The second aggregate sees at most ``ceil(freq/rows_per_salt)``
    rows per hot key instead of ``freq``.
    """
    if hot is None:
        hot = degree_sketch(df, key, min_freq=rows_per_salt)
    hot_b = F.broadcast(
        hot.select(F.col(key), F.ceil(F.col("freq") / F.lit(rows_per_salt)).cast("int").alias("_nsalt"))
    )
    ent = salt_entropy if salt_entropy is not None else F.xxhash64(F.rand(seed=0))
    salted = (
        df.join(hot_b, key, "left")
        .withColumn("_nsalt", F.coalesce(F.col("_nsalt"), F.lit(1)))
        .withColumn("_salt", F.pmod(ent, F.col("_nsalt").cast("long")))
    )
    return salted.groupBy(key, "_salt").agg(*partial_aggs).groupBy(key).agg(*final_aggs)


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    out: str,
    hot: DataFrame | None = None,
    rows_per_salt: int = 100_000,
    salt_entropy: Column | None = None,
) -> DataFrame:
    """groupBy(key).sum(value) with degree-proportional salting —
    :func:`salted_agg` specialized to the sum/sum pair."""
    ent = salt_entropy if salt_entropy is not None else F.xxhash64(F.col(value))
    return salted_agg(
        df,
        key,
        [F.sum(value).alias("_psum")],
        [F.sum("_psum").alias(out)],
        hot=hot,
        rows_per_salt=rows_per_salt,
        salt_entropy=ent,
    )

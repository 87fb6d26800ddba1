"""quiver_spark.events: the bucketed sequential-pair stream must equal
the global-window oracle for every bucketing, including degenerate
ones (one bucket, more buckets than events, single-event buckets)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from quiver_spark import events as evops


def _global_pairs(ev):
    w = Window.orderBy("ts", "event_id")
    return (
        ev.select(F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst"))
        .filter(F.col("src").isNotNull())
    )


@pytest.fixture(scope="module")
def ev(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.persist().count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("n_buckets", [1, 3, 64, 5000])
def test_sequential_pairs_equal_global_order(spark, ev, n_buckets):
    got = sorted(
        map(tuple, evops.sequential_pairs(ev, n_buckets=n_buckets).collect())
    )
    want = sorted(map(tuple, _global_pairs(ev).collect()))
    assert got == want


def test_sequential_pairs_partitioning_invariant(spark, ev):
    a = sorted(map(tuple, evops.sequential_pairs(ev, n_buckets=16).collect()))
    b = sorted(map(tuple, evops.sequential_pairs(ev.repartition(13), n_buckets=16).collect()))
    assert a == b


def test_sequential_pairs_tiny_inputs(spark):
    empty = spark.createDataFrame([], "event_id long, ts double, user_id long")
    assert evops.sequential_pairs(empty).count() == 0
    one = spark.createDataFrame([(1, 5.0, 7)], "event_id long, ts double, user_id long")
    assert evops.sequential_pairs(one).count() == 0
    two = spark.createDataFrame(
        [(1, 5.0, 7), (2, 5.0, 9)], "event_id long, ts double, user_id long"
    )
    # equal ts → event_id breaks the tie
    assert [tuple(r) for r in evops.sequential_pairs(two).collect()] == [(7, 9)]


def test_transition_edges_matches_pair_counts(spark, ev):
    pairs = _global_pairs(ev).filter(F.col("src") != F.col("dst"))
    want = {
        (r["src"], r["dst"]): r["cnt"]
        for r in pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    got = {
        (r["src"], r["dst"]): r["n_transitions"]
        for r in evops.transition_edges(ev).collect()
    }
    assert got == want

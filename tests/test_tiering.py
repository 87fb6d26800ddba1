"""quiver_spark.tiering — the shared conf-driven auto-strategy
decision (round-5 verdict item 3: one source of truth, override knobs,
constants documented as the measured local[32] defaults)."""

from __future__ import annotations

import pytest

from quiver_spark import tiering


@pytest.fixture()
def clean_conf(spark):
    """Unset every spark.quiver.auto.* key after the test — the
    SparkSession is session-scoped and a leaked override would warp
    every later auto-strategy test."""
    yield spark
    for key in (
        tiering.SMJ_MAX_EDGES_KEY,
        tiering.MIRROR_MAX_VERTICES_KEY,
        tiering.MIRROR_STRATEGY_KEY,
    ):
        spark.conf.unset(key)


def test_parse_mem_spark_jvm_syntax():
    assert tiering._parse_mem("8g") == 8 << 30
    assert tiering._parse_mem("512M") == 512 << 20
    assert tiering._parse_mem("1048576") == 1 << 20
    assert tiering._parse_mem("2t") == 2 << 40
    assert tiering._parse_mem("1.5g") == int(1.5 * (1 << 30))
    assert tiering._parse_mem("") is None
    assert tiering._parse_mem("lots") is None


def test_defaults_match_measured_local32_constants(spark):
    # the test session runs with the 8g driver default → the heap
    # derivation gives 8GiB*0.10/16 ≈ 53.7M, the measured-50M regime
    assert tiering.smj_max_edges(spark) == tiering.DEFAULT_SMJ_MAX_EDGES
    mmv = tiering.mirror_max_vertices(spark)
    assert 40_000_000 <= mmv <= 70_000_000
    # tiny graph → smj; the vertex-count thunk must not even run
    assert (
        tiering.auto_strategy(spark, 10_000, lambda: pytest.fail("counted vertices on the tiny tier"))
        == "smj"
    )
    # mirror-sized → bhj; beyond → csr
    assert tiering.auto_strategy(spark, 10_000_000, 1_000_000) == "bhj"
    assert tiering.auto_strategy(spark, 10_000_000, mmv + 1) == "csr"


def test_conf_overrides(clean_conf):
    spark = clean_conf
    spark.conf.set(tiering.SMJ_MAX_EDGES_KEY, "5")
    spark.conf.set(tiering.MIRROR_MAX_VERTICES_KEY, "100")
    assert tiering.auto_strategy(spark, 4, 10**9) == "smj"
    assert tiering.auto_strategy(spark, 6, 100) == "bhj"
    assert tiering.auto_strategy(spark, 6, 101) == "csr"
    # mirror-strategy knob (verdict item 7): flips the bhj default
    spark.conf.set(tiering.MIRROR_STRATEGY_KEY, "csr_packed")
    assert (
        tiering.auto_strategy(spark, 6, 100, mirror_allowed=("bhj", "csr_packed"))
        == "csr_packed"
    )


def test_mirror_strategy_validated_against_algorithm(clean_conf):
    spark = clean_conf
    # csr_packed exists only in pagerank; components/labelprop must
    # raise loudly instead of silently running something else
    spark.conf.set(tiering.MIRROR_STRATEGY_KEY, "csr_packed")
    with pytest.raises(ValueError, match="mirrorStrategy"):
        tiering.auto_strategy(spark, 10**7, 10**6)


def test_pagerank_auto_honors_tiering_conf(clean_conf, two_cliques_bridge):
    """End-to-end: force the tiny fixture graph through the mirror tier
    via conf and flip the mirror strategy — results must equal the smj
    tier bit-for-bit (same fixpoint, tier-equality law)."""
    from pyspark.sql import functions as F

    from quiver_spark.algorithms import pagerank

    spark = clean_conf
    base = {
        r["id"]: r["rank"]
        for r in pagerank(two_cliques_bridge, num_iters=8, strategy="smj").state.collect()
    }
    spark.conf.set(tiering.SMJ_MAX_EDGES_KEY, "1")
    spark.conf.set(tiering.MIRROR_STRATEGY_KEY, "csr_packed")
    res = pagerank(two_cliques_bridge, num_iters=8, strategy="auto")
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    assert got.keys() == base.keys()
    assert all(abs(got[k] - base[k]) < 1e-12 for k in base)

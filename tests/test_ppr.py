"""Personalized PageRank (pagerank(reset=...)): laws tying it to the
standard operator, tier equality, and the validation contract."""

from __future__ import annotations

import numpy as np
import pytest

from quiver_spark import tiering
from quiver_spark.algorithms import pagerank
from quiver_spark.graph import Graph


def _graph(spark):
    # two hubs + a dangling leaf + an isolated vertex
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 4), (4, 1), (2, 5)], "src long, dst long"
    )
    v = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    return Graph(v, e)


def _ranks(res):
    return {r["id"]: r["rank"] for r in res.state.collect()}


def test_ppr_uniform_reset_equals_standard_pagerank(spark):
    """Law: a uniform reset distribution IS standard PageRank — the
    personalized update degenerates to the uniform-teleport one (up to
    the one extra fp multiply), on both tiers."""
    g = _graph(spark)
    uni = spark.createDataFrame([(i, 1.0) for i in range(1, 7)], "id long, weight double")
    for strat in ("local", "smj"):
        std = _ranks(pagerank(g, num_iters=12, strategy=strat))
        per = _ranks(pagerank(g, num_iters=12, strategy=strat, reset=uni))
        assert std.keys() == per.keys()
        assert all(abs(std[k] - per[k]) < 1e-14 for k in std)


def test_ppr_local_equals_smj(spark):
    g = _graph(spark)
    seed = spark.createDataFrame([(1, 2.0), (5, 1.0)], "id long, weight double")
    lo = _ranks(pagerank(g, num_iters=15, strategy="local", reset=seed))
    sm = _ranks(pagerank(g, num_iters=15, strategy="smj", reset=seed))
    assert lo.keys() == sm.keys()
    assert all(abs(lo[k] - sm[k]) < 1e-13 for k in lo)
    # round 5: the bhj mirror and csr beyond-broadcast tiers carry the
    # rst column in their static vertex frames — same fixpoint path
    for strat in ("bhj", "csr"):
        tier = _ranks(pagerank(g, num_iters=15, strategy=strat, reset=seed))
        assert tier.keys() == sm.keys()
        assert all(abs(tier[k] - sm[k]) < 1e-13 for k in sm)
    # tolerance mode reaches the fixpoint a long fixed run converges to
    # (15 iters is NOT converged — 0.85^15 ≈ 0.09 — so compare against
    # a 300-iteration run, not the snapshot above)
    lo_t = _ranks(pagerank(g, tol=1e-12, max_iters=500, strategy="local", reset=seed))
    lo_fix = _ranks(pagerank(g, num_iters=300, strategy="local", reset=seed))
    assert all(abs(lo_fix[k] - lo_t[k]) < 1e-10 for k in lo_fix)


def test_ppr_mass_conserved_and_unreachable_zero(spark):
    """Total mass stays 1 every superstep (teleport + dangling both
    return to the seeds) and vertices unreachable from the seed set
    score exactly 0.0 — the defining PPR properties."""
    g = _graph(spark)
    seed = spark.createDataFrame([(1, 1.0)], "id long, weight double")
    for strat in ("local", "smj"):
        r = _ranks(pagerank(g, num_iters=10, strategy=strat, reset=seed))
        assert abs(sum(r.values()) - 1.0) < 1e-12
        assert r[6] == 0.0  # isolated vertex: unreachable from the seed
        assert r[1] > r[5] > 0.0  # seed dominates; reachable leaf gets mass


def test_ppr_reset_validation(spark):
    g = _graph(spark)
    for strat in ("local", "smj"):
        neg = spark.createDataFrame([(1, -1.0)], "id long, weight double")
        with pytest.raises(ValueError, match="nonnegative"):
            pagerank(g, num_iters=2, strategy=strat, reset=neg)
        zero = spark.createDataFrame([(1, 0.0)], "id long, weight double")
        with pytest.raises(ValueError, match="sum > 0"):
            pagerank(g, num_iters=2, strategy=strat, reset=zero)
        # weight only on a vertex absent from the graph == zero cover
        absent = spark.createDataFrame([(99, 1.0)], "id long, weight double")
        with pytest.raises(ValueError, match="sum > 0"):
            pagerank(g, num_iters=2, strategy=strat, reset=absent)


def test_ppr_explicit_numpy_mirror_raises_auto_reroutes_to_bhj(spark):
    g = _graph(spark)
    seed = spark.createDataFrame([(1, 1.0)], "id long, weight double")
    # the two numpy-mirror kernels bake the uniform-teleport scalar:
    # explicit request raises (bhj/csr are supported since round 5)
    with pytest.raises(ValueError, match="not implemented"):
        pagerank(g, num_iters=2, strategy="csr_bcast", reset=seed)
    with pytest.raises(ValueError, match="not implemented"):
        pagerank(g, num_iters=2, strategy="csr_packed", reset=seed)
    # auto in the mirror regime with mirrorStrategy=csr_packed must
    # re-route to bhj (same size class) instead of raising: force the
    # mirror regime by zeroing both the local and smj thresholds
    spark.conf.set(tiering.LOCAL_MAX_EDGES_KEY, "0")
    spark.conf.set(tiering.SMJ_MAX_EDGES_KEY, "0")
    spark.conf.set(tiering.MIRROR_STRATEGY_KEY, "csr_packed")
    try:
        per = _ranks(pagerank(g, num_iters=12, strategy="auto", reset=seed))
    finally:
        spark.conf.unset(tiering.LOCAL_MAX_EDGES_KEY)
        spark.conf.unset(tiering.SMJ_MAX_EDGES_KEY)
        spark.conf.unset(tiering.MIRROR_STRATEGY_KEY)
    ref = _ranks(pagerank(g, num_iters=12, strategy="smj", reset=seed))
    assert all(abs(per[k] - ref[k]) < 1e-13 for k in ref)


def test_ppr_rejects_init_ranks_combination(spark):
    g = _graph(spark)
    seed = spark.createDataFrame([(1, 1.0)], "id long, weight double")
    init = spark.createDataFrame([(1, 0.5)], "id long, rank double")
    for strat in ("local", "smj"):
        with pytest.raises(NotImplementedError, match="init_ranks"):
            pagerank(g, num_iters=2, strategy=strat, reset=seed, init_ranks=init)


def test_ppr_duplicate_seed_rows_deduped(spark):
    """A duplicate-id reset table must not double-count the weight —
    both tiers dedup by id before normalizing."""
    g = _graph(spark)
    dup = spark.createDataFrame([(1, 1.0), (1, 1.0), (5, 1.0)], "id long, weight double")
    one = spark.createDataFrame([(1, 1.0), (5, 1.0)], "id long, weight double")
    for strat in ("local", "smj"):
        a = _ranks(pagerank(g, num_iters=8, strategy=strat, reset=dup))
        b = _ranks(pagerank(g, num_iters=8, strategy=strat, reset=one))
        assert all(abs(a[k] - b[k]) < 1e-15 for k in b)


def test_ppr_closed_form_single_seed_chain(spark):
    """Closed form: seed s → chain s→a→b (b dangling). With damping d
    the stationary masses are geometric in d up to the dangling
    return: solvable by hand as r_s = (1-d) + d·r_b, r_a = d·r_s,
    r_b = d·r_a (dangling mass = r_b lands back on the seed)."""
    v = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    g = Graph(v, e)
    seed = spark.createDataFrame([(1, 1.0)], "id long, weight double")
    d = 0.85
    # solve the 3x3 fixpoint exactly
    rs = (1 - d) / (1 - d**3)
    ra, rb = d * rs, d * d * rs
    for strat in ("local", "smj"):
        r = _ranks(pagerank(g, damping=d, tol=1e-14, max_iters=500, strategy=strat, reset=seed))
        assert abs(r[1] - rs) < 1e-10 and abs(r[2] - ra) < 1e-10 and abs(r[3] - rb) < 1e-10

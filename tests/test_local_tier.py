"""Driver-local numpy tier (algorithms/local_tier.py): equality laws
vs the distributed smj tier, auto routing, and the collect guard.

The tier's contract is "identical semantics, zero per-superstep
distributed scheduling" — so every law here is an equality against
smj on graphs that exercise the awkward shapes: dangling vertices,
isolated vertices, parallel multi-edges, self-loops, null labels,
vote ties, deep chains."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quiver_spark import tiering
from quiver_spark.algorithms import connected_components, label_propagation, pagerank
from quiver_spark.graph import Graph


@pytest.fixture()
def local_conf(spark):
    yield spark
    for key in (
        tiering.SMJ_MAX_EDGES_KEY,
        tiering.LOCAL_MAX_EDGES_KEY,
        tiering.MIRROR_MAX_VERTICES_KEY,
        tiering.MIRROR_STRATEGY_KEY,
    ):
        spark.conf.unset(key)


@pytest.fixture(scope="module")
def gnarly(spark) -> Graph:
    """Two components, a dangling sink, an isolated vertex, parallel
    edges (distinct labels — the multigraph shape mk_graph keeps), a
    self-loop, null + tied labels."""
    vs = [
        (0, "py"), (1, "py"), (2, None), (3, "go"), (4, "go"),
        (10, "rs"), (11, None), (20, "iso"),
    ]
    es = [
        (0, 1, "a"), (0, 1, "b"),  # parallel multi-edge
        (1, 2, "a"), (2, 0, "a"),  # cycle
        (3, 2, "a"),               # tie-maker at 2
        (0, 4, "a"),               # 4 is dangling (no out-edges)
        (10, 11, "a"), (11, 11, "a"),  # second component + self-loop
    ]
    V = spark.createDataFrame(vs, "id long, lang string")
    E = spark.createDataFrame(es, "src long, dst long, etype string")
    return Graph.mk_graph(V, E)


def _ranks(res):
    return {r["id"]: r["rank"] for r in res.state.collect()}


def test_pagerank_local_equals_smj_fixed_and_tol(gnarly):
    for kw in ({"num_iters": 7}, {"tol": 1e-10, "max_iters": 80}):
        base = _ranks(pagerank(gnarly, strategy="smj", **kw))
        got = _ranks(pagerank(gnarly, strategy="local", **kw))
        assert got.keys() == base.keys()
        assert all(abs(got[k] - base[k]) < 1e-12 for k in base)
        assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation


def test_pagerank_local_warm_start_same_fixpoint(gnarly, spark):
    # 0.85^k ≤ 1e-8 needs ~113 supersteps — max_iters must clear it
    cold = pagerank(gnarly, strategy="local", tol=1e-8, max_iters=150)
    assert cold.converged
    init = cold.state.withColumn("rank", F.col("rank") * 3.0)  # un-normalized
    warm = pagerank(gnarly, strategy="local", tol=1e-8, max_iters=150, init_ranks=init)
    c, w = _ranks(cold), _ranks(warm)
    assert all(abs(c[k] - w[k]) < 1e-7 for k in c)
    assert warm.supersteps < cold.supersteps  # renormalized init IS the fixpoint


def test_cc_local_equals_smj(gnarly):
    base = {r["id"]: r["component"] for r in connected_components(gnarly, strategy="smj").state.collect()}
    got = {r["id"]: r["component"] for r in connected_components(gnarly, strategy="local").state.collect()}
    assert got == base


def test_cc_local_fixed_rounds_match_partial_hashmin(spark):
    # chain 0→1→…→6: after exactly 2 HashMin rounds vertex k holds
    # min over its ≤2-hop in-neighborhood — local fixed mode must
    # reproduce the PARTIAL state bit-for-bit (oracle mode contract)
    vs = [(i, "x") for i in range(7)]
    es = [(i, i + 1, "e") for i in range(6)]
    g = Graph.mk_graph(
        spark.createDataFrame(vs, "id long, lang string"),
        spark.createDataFrame(es, "src long, dst long, etype string"),
    )
    base = {r["id"]: r["component"] for r in connected_components(g, strategy="smj", num_iters=2).state.collect()}
    got = {r["id"]: r["component"] for r in connected_components(g, strategy="local", num_iters=2).state.collect()}
    assert got == base == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4}


def test_cc_local_deep_chain_converges_fast(spark):
    # 600-vertex chain: HashMin alone needs 600 rounds; the local
    # tier's pointer-jumping (the star-escalation analog) must reach
    # the fixpoint well inside max_iters=50
    n = 600
    vs = [(i, "x") for i in range(n)]
    es = [(i, i + 1, "e") for i in range(n - 1)]
    g = Graph.mk_graph(
        spark.createDataFrame(vs, "id long, lang string"),
        spark.createDataFrame(es, "src long, dst long, etype string"),
    )
    res = connected_components(g, strategy="local", max_iters=50)
    assert res.converged
    comps = {r["component"] for r in res.state.collect()}
    assert comps == {0}


@pytest.mark.parametrize("direction", ["both", "out", "in"])
def test_lp_local_equals_smj(gnarly, direction):
    for kw in ({"num_iters": 4}, {"max_iters": 15}):
        base = {
            r["id"]: r["label"]
            for r in label_propagation(gnarly, label_col="lang", direction=direction, strategy="smj", **kw).state.collect()
        }
        got = {
            r["id"]: r["label"]
            for r in label_propagation(gnarly, label_col="lang", direction=direction, strategy="local", **kw).state.collect()
        }
        assert got == base


def test_auto_routes_local_only_without_run_dir(gnarly, local_conf, tmp_path):
    from quiver_spark.superstep import SuperstepRunner

    spark = local_conf
    assert tiering.auto_strategy(spark, 10, 8, allow_local=True) == "local"
    assert tiering.auto_strategy(spark, 10, 8, allow_local=False) == "smj"
    # localMaxEdges=0 disables the tier even when allowed
    spark.conf.set(tiering.LOCAL_MAX_EDGES_KEY, "0")
    assert tiering.auto_strategy(spark, 10, 8, allow_local=True) == "smj"
    spark.conf.unset(tiering.LOCAL_MAX_EDGES_KEY)
    # a durable runner keeps auto on the distributed tiers end-to-end
    runner = SuperstepRunner(spark, run_dir=str(tmp_path / "run"))
    res = pagerank(gnarly, num_iters=5, strategy="auto", runner=runner)
    assert res.supersteps == 5
    assert runner.last_completed() >= 0  # durable checkpoints were written
    # explicit local + durable runner is a contract error, not a fallback
    with pytest.raises(ValueError, match="run_dir"):
        pagerank(gnarly, num_iters=3, strategy="local", runner=SuperstepRunner(spark, run_dir=str(tmp_path / "r2")))


def test_local_guard_raises_over_threshold(gnarly, local_conf):
    spark = local_conf
    spark.conf.set(tiering.LOCAL_MAX_EDGES_KEY, "3")
    with pytest.raises(ValueError, match="localMaxEdges"):
        pagerank(gnarly, num_iters=2, strategy="local")


def test_pagerank_auto_picks_local_and_matches_smj(gnarly, local_conf):
    base = _ranks(pagerank(gnarly, strategy="smj", num_iters=6))
    res = pagerank(gnarly, strategy="auto", num_iters=6)
    got = _ranks(res)
    assert all(abs(got[k] - base[k]) < 1e-12 for k in base)


def test_triangle_count_local_equals_dist(spark, gnarly):
    from quiver_spark.algorithms import triangle_count

    # a seeded graph dense enough to have many triangles, plus the
    # gnarly fixture (self-loop, parallel edges, two components)
    import random

    rng = random.Random(7)
    n = 60
    es = list({(rng.randrange(n), rng.randrange(n)) for _ in range(420)})
    vs = [(i, "x") for i in range(n)]
    g = Graph.mk_graph(
        spark.createDataFrame(vs, "id long, lang string"),
        spark.createDataFrame([(s, d, "e") for s, d in es], "src long, dst long, etype string"),
    )
    for graph in (g, gnarly):
        assert triangle_count(graph, strategy="local") == triangle_count(graph, strategy="dist")
    # tiny wedge budget forces many chunks — count must be invariant
    from quiver_spark.algorithms import local_tier

    assert local_tier.triangle_count_local(g, wedge_budget=7) == triangle_count(g, strategy="dist")


def test_local_equals_smj_on_random_multigraphs(spark):
    """Generator-driven equality law over seeded random labeled
    multigraphs (the test_properties generator: parallel edges,
    self-loops, ~10% edgeless, isolated vertices). 8 seeds — the
    bound is the smj side's wall, not the law's strength; the
    shape-targeted fixtures above cover the adversarial cases."""
    from test_properties import random_multigraph  # tests/ is on sys.path under pytest rootdir

    for seed in range(8):
        g = random_multigraph(spark, seed)
        pl = {r["id"]: r["rank"] for r in pagerank(g, num_iters=6, strategy="local").state.collect()}
        ps = {r["id"]: r["rank"] for r in pagerank(g, num_iters=6, strategy="smj").state.collect()}
        assert pl.keys() == ps.keys() and all(abs(pl[k] - ps[k]) < 1e-12 for k in pl), f"pagerank seed={seed}"
        cl = {r["id"]: r["component"] for r in connected_components(g, strategy="local").state.collect()}
        cs = {r["id"]: r["component"] for r in connected_components(g, strategy="smj").state.collect()}
        assert cl == cs, f"cc seed={seed}"
        ll = {r["id"]: r["label"] for r in label_propagation(g, label_col="name", num_iters=3, strategy="local").state.collect()}
        ls = {r["id"]: r["label"] for r in label_propagation(g, label_col="name", num_iters=3, strategy="smj").state.collect()}
        assert ll == ls, f"lp seed={seed}"


def test_local_rejects_dangling_edges(spark):
    # a raw Graph (constructor trusts inputs) with an edge to a vertex
    # absent from the vertex table must raise, not mis-index
    V = spark.createDataFrame([(0, "x")], "id long, lang string")
    E = spark.createDataFrame([(0, 99, "e")], "src long, dst long, etype string")
    with pytest.raises(ValueError, match="absent"):
        pagerank(Graph(V, E), num_iters=2, strategy="local")

"""Flagship algorithm exactness oracles (FIXTURES.md §C, SURVEY.md §5):
PageRank closed forms + conservation, CC planted components, LP
planted labels, triangle counts on known graphs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quiver_spark.algorithms import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
    triangles_per_vertex,
)
from tests.conftest import build_graph


# ---------------------------------------------------------------- PageRank
def test_pagerank_uniform_on_symmetric(k3):
    """Symmetric complete graph → uniform ranks = 1/n exactly."""
    res = pagerank(k3, tol=1e-9, max_iters=50)
    ranks = {r["id"]: r["rank"] for r in res.state.collect()}
    for v in ranks.values():
        assert math.isclose(v, 1 / 3, rel_tol=1e-6)
    assert res.converged


def test_pagerank_conservation_with_dangling(dangling_dag):
    """Dangling mass redistributed → ranks sum to 1."""
    res = pagerank(dangling_dag, tol=1e-8, max_iters=100)
    total = res.state.agg(F.sum("rank")).collect()[0][0]
    assert math.isclose(total, 1.0, rel_tol=1e-6)


def test_pagerank_chain_ordering(chain5):
    """On a chain, rank grows monotonically toward the sink."""
    res = pagerank(chain5, tol=1e-8, max_iters=100)
    ranks = {r["id"]: r["rank"] for r in res.state.collect()}
    assert ranks[0] < ranks[1] < ranks[2] < ranks[3]
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-6)


def test_pagerank_closed_form_star(star10):
    """Hub→leaves star: leaf = (1-d)/n + d*(hub/10 + dangling_mass/n);
    solve the 2-unknown linear system exactly and compare."""
    d, n = 0.85, 11
    # hub h gets only base + dangling share; leaves l get base + d*h/10 + share
    # dangling mass = 10*l (all leaves are sinks)
    # h = (1-d)/n + d*(10*l)/n ; l = (1-d)/n + d*h/10 + d*(10*l)/n
    # fixed-point by hand (200 rounds, plain python)
    h = l = 1 / n
    for _ in range(200):
        dm = 10 * l
        h_new = (1 - d) / n + d * dm / n
        l_new = (1 - d) / n + d * (h / 10) + d * dm / n
        h, l = h_new, l_new
    res = pagerank(star10, tol=1e-10, max_iters=200)
    ranks = {r["id"]: r["rank"] for r in res.state.collect()}
    assert math.isclose(ranks[0], h, rel_tol=1e-6)
    for i in range(1, 11):
        assert math.isclose(ranks[i], l, rel_tol=1e-6)


def test_pagerank_fixed_iters_matches_tol_run(two_cliques_bridge):
    """num_iters mode reproduces the same trajectory as tol mode."""
    r1 = pagerank(two_cliques_bridge, num_iters=15)
    r2 = pagerank(two_cliques_bridge, tol=None, max_iters=15)
    a = {r["id"]: r["rank"] for r in r1.state.collect()}
    b = {r["id"]: r["rank"] for r in r2.state.collect()}
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-12)


def test_pagerank_salted_equals_unsalted(two_cliques_bridge):
    """Skew-salting is a physical rewrite only — results identical."""
    plain = pagerank(two_cliques_bridge, num_iters=10)
    salted = pagerank(two_cliques_bridge, num_iters=10, n_salts=8)
    a = {r["id"]: r["rank"] for r in plain.state.collect()}
    b = {r["id"]: r["rank"] for r in salted.state.collect()}
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-9)


def test_pagerank_csr_blocks_equal_dataframe_path(two_cliques_bridge):
    """The CSR-block mapInPandas scale path (quiver_spark.csr) is a
    physical rewrite of the same superstep algebra — ranks match the
    pure-DataFrame path to float tolerance."""
    plain = pagerank(two_cliques_bridge, num_iters=10)
    csr = pagerank(two_cliques_bridge, num_iters=10, use_csr=True, n_blocks=4)
    a = {r["id"]: r["rank"] for r in plain.state.collect()}
    b = {r["id"]: r["rank"] for r in csr.state.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-9)


def test_pagerank_csr_converges_with_dangling(dangling_dag):
    """CSR path under tolerance mode: converges, conserves mass."""
    res = pagerank(dangling_dag, tol=1e-8, max_iters=100, use_csr=True, n_blocks=4)
    total = res.state.agg(F.sum("rank")).collect()[0][0]
    assert res.converged
    assert math.isclose(total, 1.0, rel_tol=1e-6)


def test_pagerank_multigraph_weighting(spark):
    """Parallel labeled edges count as separate links: 0→1 twice and
    0→2 once ⇒ vertex 1 gets 2/3 of 0's contribution."""
    g = build_graph(
        spark,
        [(0, "a"), (1, "b"), (2, "c")],
        [(0, 1, "x"), (0, 1, "y"), (0, 2, "x")],
    )
    res = pagerank(g, num_iters=1)
    ranks = {r["id"]: r["rank"] for r in res.state.collect()}
    d, n = 0.85, 3
    dm = 2 / 3  # vertices 1,2 are dangling with rank 1/3 each
    base = (1 - d) / n + d * dm / n
    assert math.isclose(ranks[1], base + d * (1 / 3) * (2 / 3), rel_tol=1e-9)
    assert math.isclose(ranks[2], base + d * (1 / 3) * (1 / 3), rel_tol=1e-9)


# ------------------------------------------------- Connected components
@pytest.mark.parametrize("algorithm", ["hashmin", "two_phase"])
def test_cc_planted(planted_cc, algorithm):
    res = connected_components(planted_cc, algorithm=algorithm)
    comp = {r["id"]: r["component"] for r in res.state.collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 100: 100, 101: 100, 102: 100, 200: 200, 201: 200}


def test_cc_bridge_cut(two_cliques_bridge):
    whole = connected_components(two_cliques_bridge)
    assert {r["component"] for r in whole.state.collect()} == {0}
    cut = connected_components(two_cliques_bridge.efilter(F.col("etype") != "bridge"))
    assert {r["component"] for r in cut.state.collect()} == {0, 10}


def test_cc_directed_edges_treated_undirected(chain5):
    res = connected_components(chain5)
    assert {r["component"] for r in res.state.collect()} == {0}


def test_cc_isolated_vertex(spark):
    g = build_graph(spark, [(7, "iso"), (1, "a"), (2, "b")], [(1, 2, "e")])
    comp = {r["id"]: r["component"] for r in connected_components(g).state.collect()}
    assert comp == {7: 7, 1: 1, 2: 1}


# ------------------------------------------------- Label propagation
def test_lp_planted_labels(planted_labels):
    res = label_propagation(planted_labels, label_col="lang", max_iters=10)
    labels = {r["id"]: r["label"] for r in res.state.collect()}
    assert all(labels[i] == "py" for i in range(5))
    assert all(labels[i] == "go" for i in range(10, 15))


def test_lp_tiebreak_deterministic(spark):
    """Vertex 2 sees one 'a' and one 'b' neighbor → tie breaks to 'a'."""
    V = spark.createDataFrame([(0, "a"), (1, "b"), (2, "z")], "id long, lang string")
    E = spark.createDataFrame([(0, 2, "e"), (1, 2, "e")], "src long, dst long, etype string")
    from quiver_spark.graph import Graph

    g = Graph.mk_graph(V, E)
    res = label_propagation(g, num_iters=1)
    labels = {r["id"]: r["label"] for r in res.state.collect()}
    assert labels[2] == "a"


def test_lp_isolated_keeps_seed(spark):
    V = spark.createDataFrame([(0, "solo"), (1, "x"), (2, "x")], "id long, lang string")
    E = spark.createDataFrame([(1, 2, "e")], "src long, dst long, etype string")
    from quiver_spark.graph import Graph

    res = label_propagation(Graph.mk_graph(V, E), num_iters=3)
    assert {r["id"]: r["label"] for r in res.state.collect()}[0] == "solo"


# ------------------------------------------------- Triangles
def test_triangles_known_counts(k3, k4, star10, chain5):
    assert triangle_count(k3) == 1
    assert triangle_count(k4) == 4
    assert triangle_count(star10) == 0
    assert triangle_count(chain5) == 0


def test_triangles_per_vertex(k4, two_cliques_bridge):
    per = {r["id"]: r["triangles"] for r in triangles_per_vertex(k4).collect()}
    assert per == {0: 3, 1: 3, 2: 3, 3: 3}  # each K4 vertex in C(3,2)=3 triangles
    per2 = {r["id"]: r["triangles"] for r in triangles_per_vertex(two_cliques_bridge).collect()}
    assert all(per2[i] == 3 for i in per2)  # bridge adds no triangles


def test_triangles_multigraph_and_selfloop_collapse(spark):
    """Parallel edges / direction / self-loops don't inflate counts."""
    g = build_graph(
        spark,
        [(0, "a"), (1, "b"), (2, "c")],
        [(0, 1, "x"), (0, 1, "y"), (1, 0, "z"), (1, 2, "x"), (2, 0, "x"), (0, 0, "loop")],
    )
    assert triangle_count(g) == 1


@pytest.mark.parametrize("strat", ["bhj", "csr", "csr_bcast", "csr_packed"])
def test_pagerank_strategies_equal_smj(two_cliques_bridge, strat):
    """Every physical strategy (mirror-broadcast JVM, cogrouped CSR,
    numpy-mirror CSR) is a rewrite of the same superstep algebra —
    fixed-iteration ranks match the smj reference path per vertex."""
    ref = pagerank(two_cliques_bridge, num_iters=10, strategy="smj")
    alt = pagerank(two_cliques_bridge, num_iters=10, strategy=strat, n_blocks=4)
    a = {r["id"]: r["rank"] for r in ref.state.collect()}
    b = {r["id"]: r["rank"] for r in alt.state.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-9)


@pytest.mark.parametrize("strat", ["bhj", "csr_bcast", "csr_packed"])
def test_pagerank_strategies_tolerance_mode(dangling_dag, strat):
    """Tolerance mode under the mirror strategies: converges to the
    1e-8 fixpoint and conserves unit mass with dangling sinks."""
    res = pagerank(dangling_dag, tol=1e-8, max_iters=100, strategy=strat, n_blocks=4)
    total = res.state.agg(F.sum("rank")).collect()[0][0]
    assert res.converged
    assert math.isclose(total, 1.0, rel_tol=1e-6)


def test_cc_bhj_equals_smj(spark, two_cliques_bridge):
    a = {r["id"]: r["component"] for r in connected_components(two_cliques_bridge, strategy="smj").state.collect()}
    b = {r["id"]: r["component"] for r in connected_components(two_cliques_bridge, strategy="bhj").state.collect()}
    assert a == b


def test_lp_bhj_equals_smj(spark, two_cliques_bridge):
    g = two_cliques_bridge
    # seed labels: vertex id parity as string
    from quiver_spark.graph import Graph

    v = g.vertices.select("id", (F.col("id") % 2).cast("string").alias("lab"))
    g2 = Graph(v, g.edges)
    a = {r["id"]: r["label"] for r in label_propagation(g2, label_col="lab", num_iters=3, strategy="smj").state.collect()}
    b = {r["id"]: r["label"] for r in label_propagation(g2, label_col="lab", num_iters=3, strategy="bhj", n_blocks=4).state.collect()}
    assert a == b


def test_lp_bhj_isolated_keeps_seed(spark):
    from quiver_spark.graph import Graph

    v = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "id long, lab string")
    e = spark.createDataFrame([(1, 2, "x")], "src long, dst long, etype string")
    g = Graph(v, e)
    res = label_propagation(g, label_col="lab", num_iters=4, strategy="bhj", n_blocks=2)
    out = {r["id"]: r["label"] for r in res.state.collect()}
    assert out[99] == "z"


def test_pagerank_adaptive_salting_equals_plain(spark):
    """Degree-proportional salting (quiver_spark.skew) is a physical
    rewrite: on a hub-heavy star graph with the salt floor forced to 2
    rows/salt (so the hub really fans out), ranks match the unsalted
    path exactly."""
    from quiver_spark.graph import Graph

    edges = [(i, 0, "e") for i in range(1, 30)] + [(0, 1, "e"), (5, 6, "e")]
    e = spark.createDataFrame(edges, "src long, dst long, etype string")
    g = Graph.from_edges(e)
    plain = pagerank(g, num_iters=10)
    salted = pagerank(g, num_iters=10, n_salts="auto", salt_rows_per_salt=2)
    a = {r["id"]: r["rank"] for r in plain.state.collect()}
    b = {r["id"]: r["rank"] for r in salted.state.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-9)


def test_cc_csr_strategy_equals_smj(spark, two_cliques_bridge):
    from quiver_spark.algorithms import connected_components

    a = {r["id"]: r["component"] for r in connected_components(two_cliques_bridge, strategy="smj").state.collect()}
    b = {r["id"]: r["component"] for r in connected_components(two_cliques_bridge, strategy="csr").state.collect()}
    assert a == b


def test_cc_csr_on_powerlaw_sample(spark):
    from quiver_spark import ingest as ing
    from quiver_spark.algorithms import connected_components
    from quiver_spark.graph import Graph

    edges = ing.synthesize_powerlaw_edges(spark, n_vertices=3000, n_edges=9000, seed=5)
    g = Graph.from_edges(edges)
    a = {r["id"]: r["component"] for r in connected_components(g, strategy="bhj").state.collect()}
    b = {r["id"]: r["component"] for r in connected_components(g, strategy="csr").state.collect()}
    assert a == b


def test_lp_csr_strategy_equals_smj(spark):
    from quiver_spark import ingest as ing
    from quiver_spark.algorithms import label_propagation
    from quiver_spark.graph import Graph
    from pyspark.sql import functions as F

    edges = ing.synthesize_powerlaw_edges(spark, n_vertices=2000, n_edges=6000, seed=7)
    g0 = Graph.from_edges(edges)
    g = Graph(g0.vertices.withColumn("lang", (F.col("id") % 7).cast("string")), g0.edges)
    a = {r["id"]: r["label"] for r in label_propagation(g, num_iters=3, strategy="smj").state.collect()}
    b = {r["id"]: r["label"] for r in label_propagation(g, num_iters=3, strategy="csr").state.collect()}
    assert a == b
    # fixpoint mode too (exercises the csr changed-count path)
    c = {r["id"]: r["label"] for r in label_propagation(g, max_iters=6, strategy="csr").state.collect()}
    d = {r["id"]: r["label"] for r in label_propagation(g, max_iters=6, strategy="smj").state.collect()}
    assert c == d


def test_lp_real_self_loop_votes_in_all_strategies(spark):
    """A REAL self-loop edge lets a vertex vote for its own label; the
    injected inj-tagged self-loops (bhj/csr fallback + change
    detection) must NOT — all three tiers must agree on a graph that
    contains a genuine self-loop."""
    from quiver_spark.graph import Graph

    v = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, "c")], "id long, lab string"
    )
    # vertex 1 has a self-loop plus one 'b' neighbor: the self-vote ties
    # 'a' with 'b' and the min-label tie-break keeps 'a'; without the
    # self-vote 'b' would win outright — distinguishes the semantics
    e = spark.createDataFrame(
        [(1, 1, "x"), (2, 1, "x"), (2, 3, "x"), (4, 2, "x")],
        "src long, dst long, etype string",
    )
    g = Graph(v, e)
    outs = {}
    for strat in ("smj", "bhj", "csr"):
        res = label_propagation(g, label_col="lab", num_iters=1, strategy=strat, n_blocks=2)
        outs[strat] = {r["id"]: r["label"] for r in res.state.collect()}
    assert outs["smj"] == outs["bhj"] == outs["csr"]
    assert outs["smj"][1] == "a"  # self-vote tied, min-label break


def test_lp_fixpoint_no_extra_join_job_per_round(spark):
    """Round-2 finding: bhj/csr fixpoint mode paid a separate
    vertex-sized changed-count join per round; the injected-self-loop
    rewrite folds change detection in-frame for every tier. Evidence:
    the MARGINAL job cost per extra fixpoint round in bhj/csr is no
    higher than the (always in-frame) smj tier's on the same graph.
    Marginal (iters=5 minus iters=3) rather than absolute counts —
    setup jobs (broadcast materialization, persist counts) vary with
    session state, but the per-round delta is the thing the rewrite
    changed: the old code paid one extra join job per round."""
    from quiver_spark.graph import Graph

    # directed 30-cycle with all-distinct labels, direction="out":
    # each vertex takes its single predecessor's label every round, so
    # labels rotate forever and fixpoint mode runs all max_iters rounds
    v = spark.createDataFrame([(i, str(i)) for i in range(30)], "id long, lab string")
    e = spark.createDataFrame(
        [(i, (i + 1) % 30, "x") for i in range(30)], "src long, dst long, etype string"
    )
    g = Graph(v, e)
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(strat: str, iters: int) -> int:
        n0 = len(tracker.getJobIdsForGroup(None))
        res = label_propagation(
            g, label_col="lab", max_iters=iters, strategy=strat, n_blocks=4, direction="out"
        )
        assert res.supersteps == iters
        return len(tracker.getJobIdsForGroup(None)) - n0

    def marginal(strat: str) -> list[int]:
        # two measurements: session state (AQE re-use, listener-driven
        # cleanup jobs) can add a stray job to any single run when the
        # full suite shares the JVM, which flipped this assert once in
        # round 5. The property is about the steady-state plan shape,
        # so compare best-case bhj/csr against worst-case smj.
        return [jobs_for(strat, 5) - jobs_for(strat, 3) for _ in range(2)]

    smj_marg = max(marginal("smj"))
    assert min(marginal("bhj")) <= smj_marg
    assert min(marginal("csr")) <= smj_marg


def test_pagerank_auto_smj_salts_by_default(spark):
    """The auto tier's smj branch must default to degree-proportional
    salting (n_salts='auto') and still match an explicitly-unsalted
    run exactly — on a hub graph whose sketch floor is guaranteed hit
    when rows_per_salt is tiny, and on a uniform graph where the
    sketch is empty and salting is a no-op."""
    from quiver_spark.graph import Graph

    # hub: every vertex points at 0 (in-degree 49) plus a chain
    edges = [(i, 0, "x") for i in range(1, 50)] + [(i, i + 1, "x") for i in range(1, 49)]
    e = spark.createDataFrame(edges, "src long, dst long, etype string")
    g = Graph.from_edges(e)
    # disable the driver-local tiny tier: this law is specifically
    # about the auto→smj branch's salting default
    from quiver_spark import tiering

    spark.conf.set(tiering.LOCAL_MAX_EDGES_KEY, "0")
    try:
        auto = pagerank(g, num_iters=8, strategy="auto", salt_rows_per_salt=4)
    finally:
        spark.conf.unset(tiering.LOCAL_MAX_EDGES_KEY)
    plain = pagerank(g, num_iters=8, strategy="smj", n_salts=None)
    a = {r["id"]: r["rank"] for r in auto.state.collect()}
    b = {r["id"]: r["rank"] for r in plain.state.collect()}
    assert set(a) == set(b)
    for i in a:
        assert abs(a[i] - b[i]) < 1e-12


def test_lp_null_seed_fixpoint_tier_parity(spark):
    """ADVICE r3 (medium): with NULL seed labels, a vertex adopting its
    first label must COUNT as a change in every tier — plain != yields
    NULL and undercounts, terminating the fixpoint early. All three
    tiers must agree on final labels AND superstep count."""
    from quiver_spark.graph import Graph

    # chain a(lab=x) → b(null) → c(null) → d(null): labels need 3
    # rounds to reach d; an early-terminating tier stops at 1-2
    v = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None), (4, None)], "id long, lab string"
    )
    e = spark.createDataFrame(
        [(1, 2, "t"), (2, 3, "t"), (3, 4, "t")], "src long, dst long, etype string"
    )
    g = Graph(v, e)
    outs, steps = {}, {}
    for strat in ("smj", "bhj", "csr"):
        res = label_propagation(
            g, label_col="lab", max_iters=10, strategy=strat, n_blocks=2, direction="out"
        )
        outs[strat] = {r["id"]: r["label"] for r in res.state.collect()}
        steps[strat] = res.supersteps
    assert outs["smj"] == outs["bhj"] == outs["csr"]
    assert steps["smj"] == steps["bhj"] == steps["csr"]
    # the label actually propagated to the chain tail
    assert outs["smj"][4] == "x"


def test_pack_dangling_src_raises_diagnostic(spark):
    """ADVICE r3: an edge src missing from the vertex table (and larger
    than every block vertex) must raise the diagnostic ValueError, not
    IndexError from an unclipped searchsorted."""
    import pytest as _pytest

    from quiver_spark import csr_blocks

    pairs = spark.createDataFrame([(999, 1), (1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,)], "id long")
    with _pytest.raises(Exception) as ei:
        csr_blocks.build_packed_blocks(pairs, verts, n_blocks=1)
    assert "outside the block's vertex set" in str(ei.value)
    assert "IndexError" not in str(ei.value)


def test_cc_escalates_on_deep_path_in_log_rounds(spark):
    """Verdict r3 item 4: a diameter-1000 path would need 1000 HashMin
    rounds; with escalation the default call converges EXACTLY in
    escalate_after + O(log n) star rounds, with the min-id labels."""
    from quiver_spark.graph import Graph

    n = 1001
    v = spark.createDataFrame([(i, "p") for i in range(n)], "id long, name string")
    e = spark.createDataFrame(
        [(i, i + 1, "x") for i in range(n - 1)], "src long, dst long, etype string"
    )
    g = Graph(v, e)
    # strategy pinned: auto would route this tiny graph to the
    # driver-local tier, which reaches the fixpoint without ever
    # exercising the escalation switch under test
    res = connected_components(g, max_iters=50, escalate_after=8, strategy="smj")
    assert res.converged, "escalated run must converge inside max_iters"
    assert res.supersteps <= 8 + 2 * 12 + 2  # 8 hashmin + ~2*log2(1000) star
    comp = {r["component"] for r in res.state.collect()}
    assert comp == {0}
    # warm-started escalation == cold two_phase == tiny-diameter hashmin
    cold = connected_components(g, max_iters=60, algorithm="two_phase")
    assert {r["component"] for r in cold.state.collect()} == {0}


def test_cc_escalation_preserves_planted_labels(spark, planted_cc):
    """Forcing escalation on an already-easy graph must not change the
    exact min-id component labels."""
    res = connected_components(planted_cc, escalate_after=1, strategy="smj")
    comp = {r["id"]: r["component"] for r in res.state.collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 100: 100, 101: 100, 102: 100, 200: 200, 201: 200}


def test_pagerank_warm_start_same_fixpoint_fewer_supersteps(spark):
    """Warm start (init_ranks) after a SMALL graph delta: converges to
    the SAME ranks as a cold start on the modified graph (the damped
    power iteration's fixpoint is unique, independent of the start
    vector) in strictly fewer supersteps — the stream-ingest →
    pagerank --init-ranks maintenance composition. The delta must be
    small RELATIVE to the graph for warm start to win (on a 9-vertex
    graph a 1-vertex delta moves the fixpoint so far that uniform init
    is closer), hence the 2k-vertex base here."""
    from quiver_spark import ingest as ing
    from quiver_spark.graph import Graph

    edges = ing.synthesize_powerlaw_edges(spark, n_vertices=2_000, n_edges=20_000, seed=3)
    g = Graph.from_edges(edges)
    g.persist()
    base = pagerank(g, tol=1e-8, max_iters=300)

    # delta: one new vertex and three new edges (~0.015% of the graph)
    g2 = Graph(
        g.vertices.unionByName(spark.createDataFrame([(5000,)], "id long")),
        g.edges.unionByName(
            spark.createDataFrame(
                [(5000, 7, "link"), (3, 5000, "link"), (11, 42, "link")],
                "src long, dst long, etype string",
            )
        ),
    )
    cold = pagerank(g2, tol=1e-8, max_iters=300)
    warm = pagerank(g2, tol=1e-8, max_iters=300, init_ranks=base.state)

    cold_ranks = {r["id"]: r["rank"] for r in cold.state.collect()}
    warm_ranks = {r["id"]: r["rank"] for r in warm.state.collect()}
    assert set(warm_ranks) == set(cold_ranks)  # vertex 5000 present (1/n default)
    for v, rank in cold_ranks.items():
        assert math.isclose(rank, warm_ranks[v], rel_tol=0, abs_tol=1e-7), v
    assert warm.converged and cold.converged
    assert warm.supersteps < cold.supersteps
    g.unpersist()


def test_pagerank_warm_start_at_fixpoint_is_one_superstep(two_cliques_bridge):
    """Re-running with init_ranks = the converged output and an
    unchanged graph terminates after a single superstep (the first
    delta measurement already reads ≤ tol)."""
    base = pagerank(two_cliques_bridge, tol=1e-9, max_iters=200)
    again = pagerank(two_cliques_bridge, tol=1e-9, max_iters=200, init_ranks=base.state)
    assert again.converged
    assert again.supersteps == 1


def test_pagerank_warm_start_degenerate_init_falls_back_to_uniform(spark, two_cliques_bridge):
    """A duplicate-id or all-zero init table must not corrupt the run:
    duplicates are dropped before the state join, and a total-mass ≤ 0
    init falls back to the uniform start (no division by zero)."""
    zeros = two_cliques_bridge.vertices.select("id", F.lit(0.0).alias("rank"))
    dup_zeros = zeros.unionByName(zeros)  # duplicates AND degenerate mass
    warm = pagerank(two_cliques_bridge, tol=1e-9, max_iters=200, init_ranks=dup_zeros)
    cold = pagerank(two_cliques_bridge, tol=1e-9, max_iters=200)
    cold_ranks = {r["id"]: r["rank"] for r in cold.state.collect()}
    warm_ranks = {r["id"]: r["rank"] for r in warm.state.collect()}
    assert warm.converged
    assert set(warm_ranks) == set(cold_ranks)  # no fan-out from duplicate ids
    for v, rank in cold_ranks.items():
        assert math.isclose(rank, warm_ranks[v], rel_tol=0, abs_tol=1e-8), v


# ------------------------------------------------- Weighted PageRank
def _wgraph(spark):
    """0 → {1 (w=3), 2 (w=1)}: vertex 1 receives 3/4 of 0's outflow."""
    V = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "id long, name string")
    E = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    from quiver_spark.graph import Graph

    return Graph.mk_graph(V, E)


def test_pagerank_weighted_closed_form_one_iter(spark):
    """One superstep from uniform: vertex 1 gets d·(1/3)·(3/4),
    vertex 2 gets d·(1/3)·(1/4), both plus base + dangling share
    (1 and 2 are sinks holding 2/3 of the mass)."""
    res = pagerank(_wgraph(spark), num_iters=1, weight_col="weight")
    ranks = {r["id"]: r["rank"] for r in res.state.collect()}
    d, n, dm = 0.85, 3, 2 / 3
    base = (1 - d) / n + d * dm / n
    assert math.isclose(ranks[1], base + d * (1 / 3) * (3 / 4), rel_tol=1e-12)
    assert math.isclose(ranks[2], base + d * (1 / 3) * (1 / 4), rel_tol=1e-12)
    assert math.isclose(ranks[0], base, rel_tol=1e-12)


def test_pagerank_weighted_constant_weight_is_unweighted(two_cliques_bridge):
    """Law: a constant-1.0 weight column is BIT-IDENTICAL to the
    uniform path — Σ over k edges of 1.0 is exactly k in fp, so
    w/Σw == 1/outdeg to the last ulp."""
    g = two_cliques_bridge
    from quiver_spark.graph import Graph

    gw = Graph(g.vertices, g.edges.withColumn("weight", F.lit(1.0)))
    uni = pagerank(g, num_iters=6)
    wei = pagerank(gw, num_iters=6, weight_col="weight")
    u = {r["id"]: r["rank"] for r in uni.state.collect()}
    w = {r["id"]: r["rank"] for r in wei.state.collect()}
    assert u == w  # bit-identical, not just close


def test_pagerank_weighted_conservation_and_reset_compose(spark):
    """Mass conservation holds under weights; composing with a reset
    distribution keeps teleport+dangling mass on the reset support."""
    g = _wgraph(spark)
    res = pagerank(g, tol=1e-10, max_iters=100, weight_col="weight")
    assert math.isclose(res.state.agg(F.sum("rank")).collect()[0][0], 1.0, rel_tol=1e-9)
    seed = spark.createDataFrame([(0, 1.0)], "id long, weight double")
    per = pagerank(g, tol=1e-10, max_iters=100, weight_col="weight", reset=seed)
    assert math.isclose(per.state.agg(F.sum("rank")).collect()[0][0], 1.0, rel_tol=1e-9)
    pranks = {r["id"]: r["rank"] for r in per.state.collect()}
    assert pranks[1] > pranks[2] > 0  # walk mass still follows the 3:1 weights


def test_pagerank_weighted_validation(spark):
    """Non-positive weights raise; the two tiers that re-derive
    1/outdeg themselves (local numpy, csr_packed) raise on an explicit
    request (auto re-routes them instead)."""
    V = spark.createDataFrame([(0, "a"), (1, "b")], "id long, name string")
    E = spark.createDataFrame([(0, 1, 0.0)], "src long, dst long, weight double")
    from quiver_spark.graph import Graph

    bad = Graph.mk_graph(V, E)
    with pytest.raises(ValueError, match="strictly positive"):
        pagerank(bad, num_iters=1, weight_col="weight")
    with pytest.raises(ValueError, match="not implemented for the 'local'"):
        pagerank(_wgraph(spark), num_iters=1, weight_col="weight", strategy="local")
    with pytest.raises(ValueError, match="not implemented for the 'csr_packed'"):
        pagerank(_wgraph(spark), num_iters=1, weight_col="weight", strategy="csr_packed")


def test_pagerank_weighted_tier_equality(spark):
    """Round 5: the normalized edge frame flows through smj, the bhj
    mirror, csr and csr_bcast — same weighted fixpoint path on all
    four (and composed with reset on the three DataFrame tiers)."""
    g = _wgraph(spark)
    ref = {r["id"]: r["rank"] for r in
           pagerank(g, num_iters=8, weight_col="weight", strategy="smj").state.collect()}
    for strat in ("bhj", "csr", "csr_bcast"):
        got = {r["id"]: r["rank"] for r in
               pagerank(g, num_iters=8, weight_col="weight", strategy=strat).state.collect()}
        assert got.keys() == ref.keys()
        assert all(abs(got[k] - ref[k]) < 1e-13 for k in ref), strat
    seed = spark.createDataFrame([(0, 1.0)], "id long, weight double")
    pref = {r["id"]: r["rank"] for r in
            pagerank(g, num_iters=8, weight_col="weight", reset=seed, strategy="smj").state.collect()}
    for strat in ("bhj", "csr"):
        got = {r["id"]: r["rank"] for r in
               pagerank(g, num_iters=8, weight_col="weight", reset=seed, strategy=strat).state.collect()}
        assert all(abs(got[k] - pref[k]) < 1e-13 for k in pref), strat

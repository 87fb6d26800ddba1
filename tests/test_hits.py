"""HITS + local clustering coefficient (round-5 link-analysis
additions): hand-computed oracles on known shapes, local≡smj
equality on the gnarly fixture, norm invariants, and the
local-tier/durable-runner contract."""

from __future__ import annotations

import math

import pytest

from quiver_spark.algorithms import local_clustering_coefficient, pagerank  # noqa: F401
from quiver_spark.algorithms.hits import hits
from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepRunner


def _build(spark, vs, es):
    V = spark.createDataFrame(vs, "id long, lang string")
    E = spark.createDataFrame(es, "src long, dst long, etype string")
    return Graph.mk_graph(V, E)


@pytest.fixture(scope="module")
def gnarly(spark) -> Graph:
    """Same awkward shape as tests/test_local_tier.py: two components,
    dangling sink, isolated vertex, parallel multi-edge, self-loop."""
    vs = [
        (0, "py"), (1, "py"), (2, None), (3, "go"), (4, "go"),
        (10, "rs"), (11, None), (20, "iso"),
    ]
    es = [
        (0, 1, "a"), (0, 1, "b"),
        (1, 2, "a"), (2, 0, "a"),
        (3, 2, "a"),
        (0, 4, "a"),
        (10, 11, "a"), (11, 11, "a"),
    ]
    return _build(spark, vs, es)


def _state(res):
    return {r["id"]: (r["auth"], r["hub"]) for r in res.state.collect()}


def test_hits_star_hand_computed(spark):
    # a->c, b->c: c is the sole authority (auth=1), a and b are equal
    # hubs (1/sqrt(2)); fixpoint from iteration 1, any tier
    g = _build(spark, [(1, "a"), (2, "b"), (3, "c")], [(1, 3, "e"), (2, 3, "e")])
    for strategy in ("local", "smj"):
        st = _state(hits(g, num_iters=3, strategy=strategy))
        assert abs(st[3][0] - 1.0) < 1e-12 and abs(st[3][1]) < 1e-12
        r = 1.0 / math.sqrt(2.0)
        for v in (1, 2):
            assert abs(st[v][1] - r) < 1e-12 and abs(st[v][0]) < 1e-12


def test_hits_local_equals_smj_gnarly(gnarly):
    for kw in ({"num_iters": 6}, {"tol": 1e-10, "num_iters": None, "max_iters": 60}):
        base = _state(hits(gnarly, strategy="smj", **kw))
        got = _state(hits(gnarly, strategy="local", **kw))
        assert got.keys() == base.keys()
        for k in base:
            assert abs(got[k][0] - base[k][0]) < 1e-12, k
            assert abs(got[k][1] - base[k][1]) < 1e-12, k


def test_hits_l2_norms_are_one(gnarly):
    st = _state(hits(gnarly, num_iters=4, strategy="local"))
    a2 = sum(a * a for a, _ in st.values())
    h2 = sum(h * h for _, h in st.values())
    assert abs(a2 - 1.0) < 1e-9 and abs(h2 - 1.0) < 1e-9


def test_hits_edgeless_graph_stays_zero(spark):
    g = _build(spark, [(1, "a"), (2, "b")], [])
    st = _state(hits(g, num_iters=3, strategy="local"))
    assert all(a == 0.0 and h == 0.0 for a, h in st.values())
    st = _state(hits(g, num_iters=3, strategy="smj"))
    assert all(a == 0.0 and h == 0.0 for a, h in st.values())


def test_hits_parallel_edges_count_individually(spark):
    # two parallel a->b edges vs one: the raw sums differ pre-norm,
    # and with a second target the normalized shares must shift
    vs = [(1, "a"), (2, "b"), (3, "c")]
    g1 = _build(spark, vs, [(1, 2, "x"), (1, 3, "x")])
    g2 = _build(spark, vs, [(1, 2, "x"), (1, 2, "y"), (1, 3, "x")])
    s1 = _state(hits(g1, num_iters=2, strategy="local"))
    s2 = _state(hits(g2, num_iters=2, strategy="local"))
    assert abs(s1[2][0] - s1[3][0]) < 1e-12  # equal single edges
    assert s2[2][0] > s2[3][0]  # doubled edge pulls authority


def test_hits_local_rejects_durable_runner(gnarly, tmp_path):
    runner = SuperstepRunner(gnarly.spark, run_dir=str(tmp_path / "hits_run"))
    with pytest.raises(ValueError, match="durable"):
        hits(gnarly, num_iters=3, strategy="local", runner=runner)
    # auto under a durable runner must route distributed and succeed
    res = hits(gnarly, num_iters=2, strategy="auto", runner=runner)
    assert res.supersteps == 2


def test_hits_exactly_one_mode_required(gnarly):
    with pytest.raises(ValueError, match="exactly one"):
        hits(gnarly, num_iters=3, tol=1e-6)
    with pytest.raises(ValueError, match="exactly one"):
        hits(gnarly, num_iters=None, tol=None)


# ---------------------------------------------------------------------------
# local clustering coefficient
# ---------------------------------------------------------------------------
def _lcc(g):
    out = local_clustering_coefficient(g)
    rows = {r["id"]: (r["triangles"], r["degree"], r["lcc_e9"]) for r in out.collect()}
    out._qs_oriented.unpersist()
    return rows


def test_lcc_triangle_is_one(spark):
    g = _build(spark, [(1, "a"), (2, "b"), (3, "c")], [(1, 2, "e"), (2, 3, "e"), (3, 1, "e")])
    rows = _lcc(g)
    assert all(rows[v] == (1, 2, 10**9) for v in (1, 2, 3))


def test_lcc_path_is_zero_and_degree_correct(spark):
    g = _build(spark, [(1, "a"), (2, "b"), (3, "c")], [(1, 2, "e"), (2, 3, "e")])
    rows = _lcc(g)
    assert rows[1] == (0, 1, 0)
    assert rows[2] == (0, 2, 0)  # degree 2, no triangle
    assert rows[3] == (0, 1, 0)


def test_lcc_paw_graph(spark):
    # triangle {1,2,3} plus pendant 4 attached to 1: lcc(1) = 2*1/(3*2)
    vs = [(i, "v") for i in (1, 2, 3, 4)]
    es = [(1, 2, "e"), (2, 3, "e"), (3, 1, "e"), (1, 4, "e")]
    g = _build(spark, vs, es)
    rows = _lcc(g)
    assert rows[1] == (1, 3, math.floor((2.0 * 1 / (3 * 2)) * 1e9 + 0.5))
    assert rows[2] == (1, 2, 10**9)
    assert rows[4] == (0, 1, 0)


def test_lcc_collapses_direction_and_multiplicity(spark):
    # both directions + parallel labels of the same undirected edge
    # must not change degree or triangles (simple-graph semantics)
    vs = [(i, "v") for i in (1, 2, 3)]
    es = [
        (1, 2, "a"), (2, 1, "b"), (1, 2, "c"),
        (2, 3, "a"), (3, 1, "a"), (1, 1, "self"),
    ]
    g = _build(spark, vs, es)
    rows = _lcc(g)
    assert all(rows[v] == (1, 2, 10**9) for v in (1, 2, 3))

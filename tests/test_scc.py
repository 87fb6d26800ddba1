"""Strongly connected components (algorithms/scc.py + the local-tier
twin) against an INDEPENDENT reference: an iterative Tarjan over plain
Python dicts — a different algorithm family (single DFS, lowlinks)
from the engine's trimmed FW-BW coloring, so agreement is evidence,
not tautology. Canonical labels (scc = min member id) make the
comparison algorithm-path independent."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from quiver_spark import tiering
from quiver_spark.algorithms.scc import strongly_connected_components
from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepRunner


def tarjan_scc(vertices: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; returns {vertex: min id in its SCC}."""
    adj: dict[int, list[int]] = {v: [] for v in vertices}
    for s, d in edges:
        adj[s].append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    onstk: set[int] = set()
    stk: list[int] = []
    out: dict[int, int] = {}
    ctr = 0
    for v0 in vertices:
        if v0 in index:
            continue
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = ctr
                ctr += 1
                stk.append(v)
                onstk.add(v)
            advanced = False
            ns = adj[v]
            for i in range(pi, len(ns)):
                w = ns[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in onstk:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                low[work[-1][0]] = min(low[work[-1][0]], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
    return out


def _mk(spark, vertices, edges):
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    return Graph(v, e)


def _run(graph, **kw):
    res = strongly_connected_components(graph, **kw)
    return {r["id"]: r["scc"] for r in res.state.collect()}


def _random_case(seed: int, n: int, m: int):
    rng = random.Random(seed)
    vertices = list(range(0, 3 * n, 3))  # non-contiguous ids
    edges = [
        (rng.choice(vertices), rng.choice(vertices))  # incl. self-loops
        for _ in range(m)
    ]
    edges += edges[: m // 10]  # parallel duplicates
    return vertices, edges


@pytest.mark.parametrize(
    "seed,n,m",
    [(1, 30, 20), (2, 30, 45), (3, 30, 90), (4, 50, 50), (5, 8, 0)],
)
def test_scc_local_matches_tarjan(spark, seed, n, m):
    vertices, edges = _random_case(seed, n, m)
    g = _mk(spark, vertices, edges)
    expect = tarjan_scc(vertices, edges)
    assert _run(g, strategy="local", max_iters=200) == expect


@pytest.mark.parametrize("seed,n,m", [(2, 30, 45), (3, 30, 90)])
def test_scc_smj_matches_tarjan(spark, seed, n, m):
    vertices, edges = _random_case(seed, n, m)
    g = _mk(spark, vertices, edges)
    expect = tarjan_scc(vertices, edges)
    assert _run(g, strategy="smj", max_iters=200) == expect


def test_scc_dag_is_all_singletons(spark):
    """A DAG dies entirely in the trim phase — every vertex its own
    SCC — in ONE outer round for both tiers."""
    vertices = list(range(10))
    edges = [(i, j) for i in range(10) for j in range(i + 1, 10) if (i + j) % 3 == 0]
    g = _mk(spark, vertices, edges)
    expect = {v: v for v in vertices}
    for strat in ("local", "smj"):
        res = strongly_connected_components(g, strategy=strat)
        assert {r["id"]: r["scc"] for r in res.state.collect()} == expect
        assert res.supersteps == 1


def test_scc_two_cycle_chain_needs_multiple_outer_rounds(spark):
    """C1 → C2 → C3 (2-cycles bridged forward) with ids DECREASING
    along the chain: every vertex colors to C1's max id, so each outer
    round peels exactly one cycle — exercises the outer loop and the
    raise-on-max_iters contract on both tiers."""
    # cycles {10,11} -> {6,7} -> {2,3}, bridges 10->6, 6->2
    edges = [(10, 11), (11, 10), (6, 7), (7, 6), (2, 3), (3, 2), (10, 6), (6, 2)]
    vertices = [2, 3, 6, 7, 10, 11]
    g = _mk(spark, vertices, edges)
    expect = tarjan_scc(vertices, edges)
    assert expect == {10: 10, 11: 10, 6: 6, 7: 6, 2: 2, 3: 2}
    for strat in ("local", "smj"):
        res = strongly_connected_components(g, strategy=strat, max_iters=10)
        assert {r["id"]: r["scc"] for r in res.state.collect()} == expect
        assert res.supersteps == 3
        with pytest.raises(RuntimeError, match="max_iters"):
            strongly_connected_components(g, strategy=strat, max_iters=2)


def test_scc_isolated_vertices_are_singletons(spark):
    g = _mk(spark, [1, 2, 3, 4], [(1, 2), (2, 1)])
    assert _run(g, strategy="local") == {1: 1, 2: 1, 3: 3, 4: 4}
    assert _run(g, strategy="smj") == {1: 1, 2: 1, 3: 3, 4: 4}


def test_scc_auto_routes_local_then_smj(spark):
    g = _mk(spark, [1, 2], [(1, 2), (2, 1)])
    expect = {1: 1, 2: 1}
    assert _run(g, strategy="auto") == expect  # tiny → local
    spark.conf.set(tiering.LOCAL_MAX_EDGES_KEY, "0")
    try:
        assert _run(g, strategy="auto") == expect  # local disabled → smj
    finally:
        spark.conf.unset(tiering.LOCAL_MAX_EDGES_KEY)


def test_scc_local_refuses_durable_runner(spark, tmp_path):
    g = _mk(spark, [1, 2], [(1, 2), (2, 1)])
    runner = SuperstepRunner(spark, run_dir=str(tmp_path / "rd"))
    with pytest.raises(ValueError, match="durable"):
        strongly_connected_components(g, strategy="local", runner=runner)


def test_scc_resumes_from_outer_round_checkpoint(spark, tmp_path):
    """The outer FW-BW round maps 1:1 onto a runner superstep, so the
    shared checkpoint/resume machinery applies at that granularity: a
    run killed by the max_iters raise leaves durable state a second
    runner continues from (resumed_from >= 0), reaching the same
    canonical assignment as an unbroken run."""
    edges = [(10, 11), (11, 10), (6, 7), (7, 6), (2, 3), (3, 2), (10, 6), (6, 2)]
    vertices = [2, 3, 6, 7, 10, 11]
    g = _mk(spark, vertices, edges)
    rd = str(tmp_path / "scc_run")
    r1 = SuperstepRunner(spark, run_dir=rd, checkpoint_every=1)
    with pytest.raises(RuntimeError, match="max_iters"):
        strongly_connected_components(g, strategy="smj", max_iters=2, runner=r1)
    r2 = SuperstepRunner(spark, run_dir=rd, checkpoint_every=1)
    res = strongly_connected_components(g, strategy="smj", max_iters=10, runner=r2)
    assert res.resumed_from >= 0
    assert {r["id"]: r["scc"] for r in res.state.collect()} == tarjan_scc(vertices, edges)


def test_scc_parts_query_matches_tarjan(spark):
    """The oracle query's graph construction (sparsified consecutive-
    lineitem part pairs) against Tarjan at sf0.001 — the same check
    the DuckDB twin makes at sf0.01, on the third independent
    implementation."""
    from quiver_spark.queries import q_scc_parts, _scc_parts_edges

    sf_dir = "/root/testdata/sf0.001"
    e = _scc_parts_edges(spark, sf_dir)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    vertices = sorted({x for p in pairs for x in p})
    expect = tarjan_scc(vertices, pairs)
    got = {r["id"]: r["scc"] for r in q_scc_parts(spark, sf_dir).collect()}
    assert got == expect


def test_condensation_quotient_laws(spark):
    """Condensation of the two-cycle chain: 3 component vertices with
    size 2 each, 2 quotient edges, acyclic (its own SCCs are
    singletons — the defining property of a condensation)."""
    from quiver_spark.algorithms.scc import condensation, strongly_connected_components

    edges = [(10, 11), (11, 10), (6, 7), (7, 6), (2, 3), (3, 2), (10, 6), (6, 2)]
    g = _mk(spark, [2, 3, 6, 7, 10, 11], edges)
    dag = condensation(g)
    v = {r["id"]: r["size"] for r in dag.vertices.collect()}
    e = sorted((r["src"], r["dst"]) for r in dag.edges.collect())
    assert v == {10: 2, 6: 2, 2: 2}
    assert e == [(6, 2), (10, 6)]
    # acyclicity: the condensation's own SCCs are all singletons
    sccs = {r["scc"] for r in strongly_connected_components(dag).state.collect()}
    assert len(sccs) == len(v)
    # reusing a precomputed assignment skips the recompute and agrees
    state = strongly_connected_components(g).state
    dag2 = condensation(g, scc_state=state)
    assert sorted((r["src"], r["dst"]) for r in dag2.edges.collect()) == e


def test_condensation_parallel_and_internal_edges_collapse(spark):
    """Multiple original edges between the same two components become
    ONE quotient edge; intra-component edges vanish."""
    from quiver_spark.algorithms.scc import condensation

    edges = [(1, 2), (2, 1), (3, 4), (4, 3), (1, 3), (2, 4), (1, 4)]
    g = _mk(spark, [1, 2, 3, 4], edges)
    dag = condensation(g)
    assert {r["id"]: r["size"] for r in dag.vertices.collect()} == {1: 2, 3: 2}
    assert [(r["src"], r["dst"]) for r in dag.edges.collect()] == [(1, 3)]


def test_assortativity_moments_closed_form(spark):
    """Star K_{1,3}: 6 directed edge-ends; hub degree 3, leaves 1 —
    n=6, Σx=2·(3+1+1+1)=12, Σxy=6·3=18, Σx²=3·9+3·1=30 (and the
    derived Pearson r = (6·18−12²)/(6·30−12²) = −1, the exact
    anti-assortative extreme)."""
    from pyspark.sql import functions as F

    eb0 = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    canon = eb0.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")).dropDuplicates()
    eb = canon.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        canon.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = eb.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).cast("long").alias("d"))
    pairs = (
        eb.join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "dx"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dy"), "dst")
    )
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"), F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
    ).collect()[0]
    assert (row["n"], row["sx"], row["sxy"], row["sxx"]) == (6, 12, 18, 30)
    r = (row["n"] * row["sxy"] - row["sx"] ** 2) / (row["n"] * row["sxx"] - row["sx"] ** 2)
    assert r == -1.0

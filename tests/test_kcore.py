"""k-core decomposition (algorithms/kcore.py + local-tier twin)
against an INDEPENDENT reference: min-heap peeling
(Batagelj–Zaveršnik) over plain Python dicts — a different algorithm
family from the engine's h-index propagation, so agreement is
evidence, not tautology."""

from __future__ import annotations

import heapq
import random

import pytest

from quiver_spark import tiering
from quiver_spark.algorithms.kcore import kcore
from quiver_spark.graph import Graph


def peel_coreness(vertices: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Classic peeling: repeatedly remove the min-degree vertex; its
    coreness is the running max of removal degrees."""
    adj: dict[int, set[int]] = {v: set() for v in vertices}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(dv, v) for v, dv in deg.items()]
    heapq.heapify(heap)
    seen: set[int] = set()
    core: dict[int, int] = {}
    cur = 0
    while heap:
        dv, v = heapq.heappop(heap)
        if v in seen or dv != deg[v]:
            continue
        seen.add(v)
        cur = max(cur, dv)
        core[v] = cur
        for u in adj[v]:
            if u not in seen:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return core


def _mk(spark, vertices, edges):
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    return Graph(v, e)


def _run(graph, **kw):
    res = kcore(graph, **kw)
    return {r["id"]: r["core"] for r in res.state.collect()}


def _random_case(seed: int, n: int, m: int):
    rng = random.Random(seed)
    vertices = list(range(0, 2 * n, 2))
    edges = [(rng.choice(vertices), rng.choice(vertices)) for _ in range(m)]
    edges += edges[: m // 10]  # parallel duplicates must not inflate degree
    return vertices, edges


@pytest.mark.parametrize("seed,n,m", [(1, 25, 30), (2, 25, 60), (3, 25, 120), (4, 40, 0)])
def test_kcore_local_matches_peeling(spark, seed, n, m):
    vertices, edges = _random_case(seed, n, m)
    g = _mk(spark, vertices, edges)
    assert _run(g, strategy="local", max_iters=300) == peel_coreness(vertices, edges)


@pytest.mark.parametrize("seed,n,m", [(2, 25, 60)])
def test_kcore_smj_matches_peeling(spark, seed, n, m):
    vertices, edges = _random_case(seed, n, m)
    g = _mk(spark, vertices, edges)
    assert _run(g, strategy="smj", max_iters=300) == peel_coreness(vertices, edges)


def test_kcore_closed_forms(spark):
    """K4 is everywhere 3-core; a star is hub-and-leaves 1-core; a
    triangle with a pendant vertex splits 2/2/2/1; self-loops and
    direction are ignored (coreness is a simple-graph notion)."""
    k4_edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _run(_mk(spark, list(range(4)), k4_edges), strategy="local") == {i: 3 for i in range(4)}
    star = [(0, i) for i in range(1, 6)]
    assert _run(_mk(spark, list(range(6)), star), strategy="local") == {i: 1 for i in range(6)}
    tri_pendant = [(1, 2), (2, 3), (3, 1), (3, 3), (4, 3)]  # incl. self-loop
    expect = {1: 2, 2: 2, 3: 2, 4: 1}
    for strat in ("local", "smj"):
        assert _run(_mk(spark, [1, 2, 3, 4], tri_pendant), strategy=strat) == expect


def test_kcore_isolated_vertices_zero(spark):
    g = _mk(spark, [1, 2, 3], [(1, 2)])
    for strat in ("local", "smj"):
        assert _run(g, strategy=strat) == {1: 1, 2: 1, 3: 0}


def test_kcore_fixed_rounds_match_across_tiers(spark):
    """Oracle mode: exactly k h-index rounds, bit-comparable (integer
    state) between the local and smj tiers even BEFORE the fixpoint."""
    vertices, edges = _random_case(7, 30, 70)
    g = _mk(spark, vertices, edges)
    for k in (1, 2, 4):
        assert _run(g, strategy="local", num_iters=k) == _run(g, strategy="smj", num_iters=k)


def test_kcore_raises_on_max_iters(spark):
    """A long path needs ~n/2 rounds (the 1-coreness creeps inward
    from the ends); an insufficient max_iters must raise, not return
    partial coreness — on both tiers."""
    n = 30
    vertices = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    g = _mk(spark, vertices, edges)
    with pytest.raises(RuntimeError, match="max_iters"):
        kcore(g, strategy="local", max_iters=3)
    with pytest.raises(RuntimeError, match="max_iters"):
        kcore(g, strategy="smj", max_iters=3)
    assert _run(g, strategy="local", max_iters=100) == {v: 1 for v in vertices}


def test_kcore_auto_routes_local_then_smj(spark):
    g = _mk(spark, [1, 2, 3], [(1, 2), (2, 3), (3, 1)])
    expect = {1: 2, 2: 2, 3: 2}
    assert _run(g, strategy="auto") == expect
    spark.conf.set(tiering.LOCAL_MAX_EDGES_KEY, "0")
    try:
        assert _run(g, strategy="auto") == expect
    finally:
        spark.conf.unset(tiering.LOCAL_MAX_EDGES_KEY)


def test_kcore_bhj_matches_peeling_and_other_tiers(spark):
    vertices, edges = _random_case(5, 25, 60)
    g = _mk(spark, vertices, edges)
    expect = peel_coreness(vertices, edges)
    assert _run(g, strategy="bhj", max_iters=300) == expect
    for k in (1, 3):
        assert _run(g, strategy="bhj", num_iters=k) == _run(g, strategy="local", num_iters=k)


def test_kcore_bhj_isolated_vertices_zero(spark):
    g = _mk(spark, [1, 2, 3], [(1, 2)])
    assert _run(g, strategy="bhj") == {1: 1, 2: 1, 3: 0}


def test_kcore_auto_mirror_regime_picks_bhj(spark):
    """Force the mirror regime (local + smj thresholds zeroed): auto
    must route kcore to bhj and still produce the right coreness."""
    g = _mk(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 1), (3, 4)])
    expect = {1: 2, 2: 2, 3: 2, 4: 1}
    spark.conf.set(tiering.LOCAL_MAX_EDGES_KEY, "0")
    spark.conf.set(tiering.SMJ_MAX_EDGES_KEY, "0")
    try:
        assert _run(g, strategy="auto") == expect
    finally:
        spark.conf.unset(tiering.LOCAL_MAX_EDGES_KEY)
        spark.conf.unset(tiering.SMJ_MAX_EDGES_KEY)

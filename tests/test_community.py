"""Modularity moments (algorithms/community.py) against an
INDEPENDENT reference: brute Python dict accounting over the simple
undirected view, plus the Newman-Girvan laws."""

from __future__ import annotations

import random

import pytest

from quiver_spark.algorithms.community import modularity, modularity_moments
from quiver_spark.graph import Graph


def _mk(spark, edges):
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))


def _rand_edges(seed, n=30, m=110):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def brute_moments(edges, comm_of):
    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg: dict[int, int] = {}
    verts = set()
    for a, b in edges:
        verts.update((a, b))
    for a, b in simple:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out: dict[int, list[int]] = {}
    for v in verts:
        c = comm_of(v)
        row = out.setdefault(c, [0, 0, 0])  # n_nodes, internal, dtot
        row[0] += 1
        row[2] += deg.get(v, 0)
    for a, b in simple:
        if comm_of(a) == comm_of(b):
            out[comm_of(a)][1] += 1
    return {c: tuple(r) for c, r in out.items()}, len(simple)


def test_moments_match_brute(spark):
    edges = _rand_edges(7)
    g = _mk(spark, edges)
    comm_of = lambda v: v % 4  # noqa: E731
    asg = spark.createDataFrame(
        [(v, comm_of(v)) for v in {x for e in edges for x in e}], "id long, comm long"
    )
    want, m = brute_moments(edges, comm_of)
    rows = modularity_moments(g, asg).collect()
    got = {r.comm: (r.n_nodes, r.internal, r.dtot) for r in rows}
    assert got == want
    # coverage law: sum of degree totals is exactly 2m
    assert sum(r.dtot for r in rows) == 2 * m


def test_modularity_q_matches_brute(spark):
    edges = _rand_edges(19)
    g = _mk(spark, edges)
    comm_of = lambda v: v % 3  # noqa: E731
    asg = spark.createDataFrame(
        [(v, comm_of(v)) for v in {x for e in edges for x in e}], "id long, comm long"
    )
    want, m = brute_moments(edges, comm_of)
    q_want = sum(i / m - (d / (2 * m)) ** 2 for _, i, d in want.values())
    assert modularity(g, asg) == pytest.approx(q_want, rel=1e-12)


def test_perfect_partition_beats_mixed(spark):
    # two disjoint triangles: their own components give the max-Q
    # 2-community split; a split cutting both triangles scores lower
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    g = _mk(spark, edges)
    ids = [0, 1, 2, 10, 11, 12]
    good = spark.createDataFrame([(v, v // 10) for v in ids], "id long, comm long")
    bad = spark.createDataFrame([(v, v % 2) for v in ids], "id long, comm long")
    assert modularity(g, good) == pytest.approx(0.5)
    assert modularity(g, bad) < modularity(g, good)


def test_partial_assignment_raises(spark):
    g = _mk(spark, [(0, 1), (1, 2)])
    asg = spark.createDataFrame([(0, 0), (1, 0)], "id long, comm long")
    with pytest.raises(ValueError, match="misses 1"):
        modularity_moments(g, asg)


def test_isolated_vertices_count_with_zero_degree(spark):
    g = Graph.from_edges(spark.createDataFrame([(0, 1)], "src long, dst long"))
    g = g.add_nodes(g.spark.createDataFrame([(9,)], "id long"))
    asg = spark.createDataFrame([(0, 0), (1, 0), (9, 7)], "id long, comm long")
    got = {r.comm: (r.n_nodes, r.internal, r.dtot) for r in modularity_moments(g, asg).collect()}
    assert got == {0: (2, 1, 2), 7: (1, 0, 0)}

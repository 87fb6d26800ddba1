"""Link prediction (algorithms/linkpred.py) against an INDEPENDENT
reference: brute-force neighborhood intersection over Python sets — a
different computation shape from the engine's center-join, so
agreement is evidence, not tautology."""

from __future__ import annotations

import random

from quiver_spark.algorithms.linkpred import RA_SCALE, link_prediction
from quiver_spark.graph import Graph


def brute_scores(edges: list[tuple[int, int]]) -> dict[tuple[int, int], tuple[int, int]]:
    """(a,b) -> (common, ra_e12) for non-adjacent pairs, simple
    undirected view, exact integer RA weights."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out: dict[tuple[int, int], tuple[int, int]] = {}
    vs = sorted(adj)
    for i, a in enumerate(vs):
        for b in vs[i + 1 :]:
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            ra = sum(int(RA_SCALE / len(adj[z])) for z in common)
            out[(a, b)] = (len(common), ra)
    return out


def _mk(spark, edges):
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))


def test_linkpred_hand_fixture(spark):
    # path 0-1-2-3 plus a triangle 2-3-4 and a parallel/self-loop mess:
    # multiplicity and direction must not change the simple-graph scores
    edges = [(0, 1), (1, 2), (2, 3), (3, 2), (2, 4), (3, 4), (4, 4), (1, 2)]
    got = {
        (r.a, r.b): (r.common, r.ra_e12)
        for r in link_prediction(_mk(spark, edges)).collect()
    }
    assert got == brute_scores(edges)
    # spot-check one value by hand: (0,2) share only vertex 1, deg(1)=2
    assert got[(0, 2)] == (1, RA_SCALE // 2)


def test_linkpred_random_graph_matches_brute(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    got = {
        (r.a, r.b): (r.common, r.ra_e12)
        for r in link_prediction(_mk(spark, edges)).collect()
    }
    assert got == brute_scores(edges)


def test_linkpred_pairs_are_nonadjacent_and_min_common(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(90)})
    simple = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    rows = link_prediction(_mk(spark, edges), min_common=2).collect()
    assert rows, "fixture produced no >=2-common pairs; densify it"
    for r in rows:
        assert r.a < r.b
        assert (r.a, r.b) not in simple
        assert r.common >= 2


def test_linkpred_top_k_deterministic(spark):
    rng = random.Random(13)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(80)})
    full = link_prediction(_mk(spark, edges)).collect()
    top2 = link_prediction(_mk(spark, edges), top_k=2).collect()
    by_a: dict[int, list] = {}
    for r in full:
        by_a.setdefault(r.a, []).append(r)
    expect = {}
    for a, rs in by_a.items():
        rs.sort(key=lambda r: (-r.ra_e12, -r.common, r.b))
        for r in rs[:2]:
            expect[(r.a, r.b)] = (r.common, r.ra_e12)
    assert {(r.a, r.b): (r.common, r.ra_e12) for r in top2} == expect


def test_linkpred_hub_cap_drops_only_hub_wedges(spark):
    # star center 0 with 6 leaves (deg 6) + a 3-path 1-7-2 (deg(7)=2):
    # capping at 5 drops every wedge THROUGH 0; wedges through the
    # deg-2 centers 1, 2 and 7 survive
    edges = [(0, i) for i in range(1, 7)] + [(1, 7), (7, 2)]
    g = _mk(spark, edges)
    capped = {
        (r.a, r.b): (r.common, r.ra_e12)
        for r in link_prediction(g, max_hub_degree=5).collect()
    }
    assert capped == {
        (1, 2): (1, RA_SCALE // 2),  # through 7 (deg 2)
        (0, 7): (2, 2 * (RA_SCALE // 2)),  # through 1 and 2 (deg 2 each)
    }
    full = {(r.a, r.b) for r in link_prediction(g).collect()}
    assert (3, 4) in full  # the uncapped run does see star-leaf pairs

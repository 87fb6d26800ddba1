"""k-truss (algorithms/ktruss.py) against an INDEPENDENT reference:
plain-Python support recount + peel loop over adjacency sets."""

from __future__ import annotations

import random

import pytest

from quiver_spark.algorithms.ktruss import ktruss
from quiver_spark.graph import Graph


def _mk(spark, edges):
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))


def _rand_edges(seed, n=22, m=90):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def brute_ktruss(edges, k, rounds=None):
    rem = {(min(a, b), max(a, b)) for a, b in edges if a != b}

    def supports(es):
        adj: dict[int, set[int]] = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in es}

    t = 0
    while True:
        sup = supports(rem)
        kept = {e for e, s in sup.items() if s >= k - 2}
        t += 1
        if rounds is None and kept == rem:
            return sup
        rem = kept
        if rounds is not None and t >= rounds:
            return supports(rem)


def test_ktruss_matches_brute_fixpoint(spark):
    for seed, k in ((3, 3), (7, 4), (11, 5)):
        edges = _rand_edges(seed)
        got = {(r.a, r.b): r.support for r in ktruss(_mk(spark, edges), k).collect()}
        assert got == brute_ktruss(edges, k)


def test_ktruss_fixed_rounds_match_brute(spark):
    edges = _rand_edges(19)
    got = {(r.a, r.b): r.support for r in ktruss(_mk(spark, edges), 4, num_iters=1).collect()}
    assert got == brute_ktruss(edges, 4, rounds=1)


def test_k4_on_k4_clique_keeps_everything(spark):
    # K4: every edge sits in exactly 2 triangles -> the whole clique
    # is its own 4-truss; adding a pendant edge peels just the pendant
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {(r.a, r.b): r.support for r in ktruss(_mk(spark, k4 + [(3, 9)]), 4).collect()}
    assert got == {e: 2 for e in k4}


def test_cascade_peel_two_triangles_sharing_edge(spark):
    # bowtie of two triangles sharing edge (1,2): at k=4 the shared
    # edge has support 2 but its neighbors have 1 -> everything peels
    # (cascades: after round 1 only (1,2) remains with support 0)
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    assert ktruss(_mk(spark, edges), 4).count() == 0


def test_k_lt_2_raises(spark):
    with pytest.raises(ValueError, match="k >= 2"):
        ktruss(_mk(spark, [(0, 1)]), 1)

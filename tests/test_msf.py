"""Borůvka minimum spanning forest (algorithms/msf.py) against an
INDEPENDENT reference: driver-side Kruskal with union-find under the
same (w, a, b) total order, plus the structural forest laws that hold
regardless of weights (acyclicity via the edge-count identity,
spanning via component equality with algorithms.components)."""

from __future__ import annotations

import random

import pytest

from quiver_spark.algorithms.components import connected_components
from quiver_spark.algorithms.msf import minimum_spanning_forest, msf_components
from quiver_spark.graph import Graph


def _mk(spark, edges):
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long, weight long")
    )


def _rand_edges(seed, n=40, m=120, wmax=12):
    # small wmax forces duplicate weights -> the (w, a, b) tie-break
    # carries the uniqueness, exactly the regime the twin checks
    rng = random.Random(seed)
    return [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, wmax))
        for _ in range(m)
    ]


def brute_kruskal(edges):
    """Unique MSF under the (w, a, b) total order on canonical simple
    edges (parallel edges collapsed to their minimum, self-loops
    dropped) — union-find, a third algorithm family vs Borůvka and
    the cycle-property SQL twin."""
    canon: dict[tuple[int, int], int] = {}
    verts: set[int] = set()
    for s, d, w in edges:
        verts.update((s, d))
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        canon[(a, b)] = min(canon.get((a, b), w), w)
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.append((a, b, w))
    return sorted(forest)


@pytest.mark.parametrize("seed", [1, 7])
def test_msf_matches_brute_kruskal(spark, seed):
    edges = _rand_edges(seed)
    got = sorted(
        tuple(r) for r in minimum_spanning_forest(_mk(spark, edges)).collect()
    )
    assert got == brute_kruskal(edges)


def test_forest_laws_and_components(spark):
    edges = _rand_edges(3, n=60, m=90)  # sparse -> several components
    g = _mk(spark, edges)
    forest = minimum_spanning_forest(g).collect()
    comp = {r.id: r.comp for r in msf_components(g).collect()}
    cc = {
        r.id: r.component for r in connected_components(g).state.collect()
    }
    # spanning: the forest's partition == the graph's true components
    assert {v: cc[comp_root] for v, comp_root in comp.items()} == cc
    # acyclic + spanning: |F| = V - #components (the forest identity)
    assert len(forest) == len(cc) - len(set(cc.values()))
    # weight optimality on the same input (vs Kruskal's total)
    assert sum(r.w for r in forest) == sum(w for _, _, w in brute_kruskal(edges))


def test_parallel_edges_collapse_and_self_loops_drop(spark):
    edges = [(1, 2, 9), (2, 1, 4), (1, 2, 7), (2, 2, 1), (2, 3, 5)]
    got = sorted(tuple(r) for r in minimum_spanning_forest(_mk(spark, edges)).collect())
    assert got == [(1, 2, 4), (2, 3, 5)]


def test_duplicate_weights_break_ties_lexicographically(spark):
    # triangle with all-equal weights: the cycle property under the
    # (w, a, b) order keeps (1,2) and (1,3), drops (2,3)
    edges = [(1, 2, 5), (1, 3, 5), (2, 3, 5)]
    got = sorted(tuple(r) for r in minimum_spanning_forest(_mk(spark, edges)).collect())
    assert got == [(1, 2, 5), (1, 3, 5)]


def test_chain_contraction_converges_in_log_rounds(spark):
    # a 64-vertex path whose weights DECREASE along the path: every
    # Borůvka round merges only adjacent pairs (each component's min
    # edge is its right edge), exercising the pointer-jumping chains
    edges = [(i, i + 1, 1000 - i) for i in range(63)]
    got = minimum_spanning_forest(_mk(spark, edges), max_iters=10).collect()
    assert len(got) == 63  # a path IS its own MSF


def test_max_iters_raises_instead_of_partial(spark):
    edges = [(1, 2, 1), (3, 4, 1)]
    with pytest.raises(RuntimeError, match="did not converge"):
        minimum_spanning_forest(_mk(spark, edges), max_iters=0)


def test_fractional_weights_raise_instead_of_truncating(spark):
    g = Graph.from_edges(
        spark.createDataFrame(
            [(1, 2, 0.3), (2, 3, 0.7)], "src long, dst long, weight double"
        )
    )
    with pytest.raises(ValueError, match="must be integral"):
        minimum_spanning_forest(g)

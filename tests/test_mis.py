"""Luby MIS + greedy coloring (algorithms/mis.py) against an
INDEPENDENT reference: a plain-Python round simulator with the same
shared hash literals, plus the structural laws (independence,
maximality, proper coloring) that hold regardless of priorities."""

from __future__ import annotations

import random

import pytest

from quiver_spark.algorithms.anf import M31, fm_params
from quiver_spark.algorithms.mis import greedy_coloring, maximal_independent_set
from quiver_spark.graph import Graph


def _mk(spark, edges):
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))


def _rand_edges(seed, n=32, m=100):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def _adj(edges):
    adj: dict[int, set[int]] = {}
    verts: set[int] = set()
    for a, b in edges:
        verts.update((a, b))
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    return adj, verts


def brute_luby(edges, mode, seed=20260820, rounds=200):
    adj, verts = _adj(edges)
    und = set(verts)
    out: dict[int, tuple[int, bool]] = {}
    t = 0
    while und and t < rounds:
        a, b = fm_params(t + 1, seed)[t]
        p = {v: (a * (v % M31) + b) % M31 for v in und}
        sel = {
            v
            for v in und
            if all((p[v], v) < (p[u], u) for u in adj.get(v, ()) if u in und)
        }
        for v in sel:
            out[v] = (t, True)
        if mode == "mis":
            for v in sel:
                for u in adj.get(v, ()):
                    if u in und and u not in sel and u not in out:
                        out[u] = (t, False)
        und -= {v for v in out if v in und}
        t += 1
    return out


def test_mis_matches_brute_and_laws(spark):
    edges = _rand_edges(5)
    g = _mk(spark, edges)
    got = {r.id: (r.round, r.in_mis) for r in maximal_independent_set(g).collect()}
    assert got == brute_luby(edges, "mis")
    adj, verts = _adj(edges)
    mis = {v for v, (_, s) in got.items() if s}
    # independence: no edge inside the MIS
    assert not any(u in mis and v in mis for u in adj for v in adj[u])
    # maximality: every non-member has a MIS neighbor
    assert all(adj.get(v) and adj[v] & mis for v in verts - mis)


def test_coloring_matches_brute_and_is_proper(spark):
    edges = _rand_edges(11)
    g = _mk(spark, edges)
    got = {r.id: r.color for r in greedy_coloring(g).collect()}
    want = {v: t for v, (t, s) in brute_luby(edges, "color").items() if s}
    assert got == want
    adj, _ = _adj(edges)
    assert all(got[u] != got[v] for u in adj for v in adj[u])


def test_fixed_rounds_truncate_with_minus_one(spark):
    # triangle + pendant: round counts are tiny, so 1 fixed round must
    # leave the knocked-out triangle vertices decided and any survivor
    # of round 0 undecided in color mode
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = _mk(spark, edges)
    ref = brute_luby(edges, "color", rounds=1)
    got = {r.id: r.color for r in greedy_coloring(g, num_iters=1).collect()}
    want = {v: (ref[v][0] if v in ref else -1) for v in (0, 1, 2, 3)}
    assert got == want


def test_isolated_vertex_selected_round0(spark):
    g = _mk(spark, [(0, 1)])
    g = g.add_nodes(g.spark.createDataFrame([(9,)], "id long"))
    got = {r.id: (r.in_mis, r.round) for r in maximal_independent_set(g).collect()}
    assert got[9] == (True, 0)
    assert sorted(got) == [0, 1, 9]


def test_fixpoint_raises_on_max_iters(spark):
    g = _mk(spark, _rand_edges(3))
    with pytest.raises(RuntimeError, match="did not decide"):
        maximal_independent_set(g, max_iters=0)

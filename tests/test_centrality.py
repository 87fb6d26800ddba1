"""Landmark distances / harmonic centrality / eccentricity
(algorithms/centrality.py) against an INDEPENDENT reference: plain
Python deque-BFS per seed."""

from __future__ import annotations

import random
from collections import deque

import pytest

from quiver_spark.algorithms.centrality import (
    H_SCALE,
    betweenness,
    closeness_centrality,
    eccentricity,
    harmonic_centrality,
    landmark_distances,
    sp_counts,
)
from quiver_spark.graph import Graph


def brute_bfs(edges, seeds, directed: bool):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    out: dict[tuple[int, int], int] = {}
    for seed in seeds:
        dist = {seed: 0}
        q = deque([seed])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, dv in dist.items():
            out[(seed, v)] = dv
    return out


def _mk(spark, edges):
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))


def _rand_edges(seed, n=28, m=90):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def test_landmark_distances_match_brute_both_directions(spark):
    edges = _rand_edges(3)
    g = _mk(spark, edges)
    seeds = [0, 1, 5]
    for direction, directed in (("both", False), ("out", True)):
        got = {
            (r.seed, r.id): r.dist
            for r in landmark_distances(g, seeds, direction=direction).collect()
        }
        assert got == brute_bfs(edges, seeds, directed)


def test_overlapping_seeds_keep_per_seed_distances(spark):
    # path 0-1-2-3-4: seeds 0 and 4 overlap over the whole path; the
    # merged-frontier bfs would keep one (id, level) row, landmarks two
    edges = [(i, i + 1) for i in range(4)]
    got = {
        (r.seed, r.id): r.dist
        for r in landmark_distances(_mk(spark, edges), [0, 4]).collect()
    }
    assert got[(0, 4)] == 4 and got[(4, 0)] == 4
    assert got[(0, 2)] == 2 and got[(4, 2)] == 2
    assert len(got) == 10


def test_harmonic_and_ecc_aggregate_brute(spark):
    edges = _rand_edges(9)
    g = _mk(spark, edges)
    seeds = [0, 2, 4, 6]
    ref = brute_bfs(edges, seeds, directed=False)
    h_ref: dict[int, tuple[int, int]] = {}
    for (s, v), dv in ref.items():
        if dv >= 1:
            r, hs = h_ref.get(v, (0, 0))
            h_ref[v] = (r + 1, hs + int(H_SCALE / dv))
    got = {r.id: (r.reach, r.hsum_e9) for r in harmonic_centrality(g, seeds).collect()}
    assert got == h_ref
    e_ref: dict[int, tuple[int, int]] = {}
    for (s, v), dv in ref.items():
        ecc, n = e_ref.get(s, (0, 0))
        e_ref[s] = (max(ecc, dv), n + 1)
    got_e = {r.seed: (r.ecc, r.reached) for r in eccentricity(g, seeds).collect()}
    assert got_e == e_ref


def test_closeness_aggregate_brute(spark):
    edges = _rand_edges(13)
    g = _mk(spark, edges)
    seeds = [0, 3, 5, 8]
    ref = brute_bfs(edges, seeds, directed=False)
    c_ref: dict[int, tuple[int, int]] = {}
    for (s, v), dv in ref.items():
        if dv >= 1:
            r, ds = c_ref.get(v, (0, 0))
            c_ref[v] = (r + 1, ds + dv)
    got = {r.id: (r.reach, r.dsum) for r in closeness_centrality(g, seeds).collect()}
    assert got == c_ref


def brute_brandes(edges, seeds, directed: bool):
    """Textbook Brandes: per-seed BFS with σ and predecessor lists,
    then stack-order dependency accumulation. Returns (delta_sum,
    {seed: (dist, sigma)})."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    delta_sum: dict[int, float] = {}
    fwd = {}
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1}
        preds: dict[int, list[int]] = {}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0
                    order.append(v)
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds.setdefault(v, []).append(u)
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for u in preds.get(w, ()):
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
        for v, dv in delta.items():
            if v != s:
                delta_sum[v] = delta_sum.get(v, 0.0) + dv
        fwd[s] = (dist, sigma)
    return delta_sum, fwd


def test_sp_counts_match_brute_both_directions(spark):
    edges = _rand_edges(21)
    g = _mk(spark, edges)
    seeds = [0, 3, 7]
    for direction, directed in (("both", False), ("out", True)):
        _, fwd = brute_brandes(edges, seeds, directed)
        got = {
            (r.seed, r.id): (r.dist, r.sigma)
            for r in sp_counts(g, seeds, direction=direction).collect()
        }
        want = {
            (s, v): (dist[v], sigma[v])
            for s, (dist, sigma) in fwd.items()
            for v in dist
        }
        assert got == want


def test_sigma_diamond_exact(spark):
    # 0→1, 0→2, 1→3, 2→3: two shortest paths to 3; δ(1)=δ(2)=
    # σ(1)/σ(3)·(1+δ(3)) = 1/2; δ(3)=0 (no successors → absent row)
    g = _mk(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    got = {(r.seed, r.id): r.sigma for r in sp_counts(g, [0], direction="out").collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 2): 1, (0, 3): 2}
    bc = {r.id: r.delta_sum for r in betweenness(g, [0], direction="out").collect()}
    assert bc == pytest.approx({1: 0.5, 2: 0.5})


def test_betweenness_matches_brute_brandes(spark):
    for seed_g, direction, directed in ((31, "both", False), (37, "out", True)):
        edges = _rand_edges(seed_g)
        g = _mk(spark, edges)
        seeds = [0, 2, 5, 9]
        ref, _ = brute_brandes(edges, seeds, directed)
        got = {r.id: r.delta_sum for r in betweenness(g, seeds, direction=direction).collect()}
        want = {v: x for v, x in ref.items() if x != 0.0}
        assert got == pytest.approx(want, rel=1e-9)


def test_max_depth_truncates(spark):
    edges = [(i, i + 1) for i in range(6)]
    got = {
        (r.seed, r.id): r.dist
        for r in landmark_distances(_mk(spark, edges), [0], max_depth=2).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2}

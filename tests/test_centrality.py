"""Landmark distances / harmonic centrality / eccentricity
(algorithms/centrality.py) against an INDEPENDENT reference: plain
Python deque-BFS per seed."""

from __future__ import annotations

import random
from collections import deque

from quiver_spark.algorithms.centrality import (
    H_SCALE,
    eccentricity,
    harmonic_centrality,
    landmark_distances,
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


def test_max_depth_truncates(spark):
    edges = [(i, i + 1) for i in range(6)]
    got = {
        (r.seed, r.id): r.dist
        for r in landmark_distances(_mk(spark, edges), [0], max_depth=2).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2}

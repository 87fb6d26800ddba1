"""Deterministic random walks (algorithms/walks.py) against an
INDEPENDENT plain-Python simulator sharing the hash literals, plus
the structural laws (edges followed, dead-end stops, determinism)."""

from __future__ import annotations

import random

import pytest

from quiver_spark.algorithms.anf import M31
from quiver_spark.algorithms.walks import pick_expr, random_walks, walk_params
from quiver_spark.graph import Graph


def _mk(spark, edges):
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))


def _rand_edges(seed, n=24, m=70):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def brute_walks(edges, wpv, length, directed, seed=None):
    from quiver_spark.algorithms.walks import WALK_SEED

    a, b = walk_params(seed if seed is not None else WALK_SEED)
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    pairs = set()
    for s, d in edges:
        verts.update((s, d))
        pairs.add((s, d))
        if not directed:
            pairs.add((d, s))
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
    for u in adj:
        adj[u] = sorted(set(adj[u]))
    rows = set()
    for start in verts:
        for widx in range(wpv):
            v = start
            rows.add((start, widx, 0, start))
            for t in range(length):
                nbrs = adj.get(v)
                if not nbrs:
                    break
                mix = ((start % M31) * 31 + widx * 1009 + t * 9176) % M31
                h = (a * ((mix + (v % M31)) % M31) + b) % M31
                v = nbrs[h % len(nbrs)]
                rows.add((start, widx, t + 1, v))
    return rows


@pytest.mark.parametrize("direction,directed", [("out", True), ("both", False)])
def test_walks_match_brute(spark, direction, directed):
    edges = _rand_edges(23)
    g = _mk(spark, edges)
    got = {
        (r.start, r.widx, r.step, r.id)
        for r in random_walks(g, walks_per_vertex=2, length=6, direction=direction).collect()
    }
    assert got == brute_walks(edges, 2, 6, directed)


def test_walk_steps_follow_edges_and_stop_at_dead_ends(spark):
    # 0→1→2 (2 is a dead end), 3 isolated: walks from 0 have 3 rows,
    # from 2 and 3 exactly one row each
    g = _mk(spark, [(0, 1), (1, 2)])
    g = g.add_nodes(g.spark.createDataFrame([(3,)], "id long"))
    rows = random_walks(g, length=5, direction="out").collect()
    by_start: dict[int, list] = {}
    for r in rows:
        by_start.setdefault(r.start, []).append((r.step, r.id))
    assert sorted(by_start[0]) == [(0, 0), (1, 1), (2, 2)]
    assert sorted(by_start[2]) == [(0, 2)]
    assert sorted(by_start[3]) == [(0, 3)]


def test_seed_changes_walks_but_not_coverage(spark):
    edges = _rand_edges(41)
    g = _mk(spark, edges)
    w1 = {
        (r.start, r.widx, r.step, r.id)
        for r in random_walks(g, length=5, direction="both", seed=1).collect()
    }
    w2 = {
        (r.start, r.widx, r.step, r.id)
        for r in random_walks(g, length=5, direction="both", seed=2).collect()
    }
    assert w1 != w2
    # same walk-row count per (start, widx): the graph has no dead
    # ends under "both", so every walk has exactly length+1 rows
    assert len(w1) == len(w2)


def test_pick_expr_matches_python_modulo(spark):
    # non-negative operands: SQL % and Python % agree; this pins the
    # shared-text contract the DuckDB twin relies on
    a, b = walk_params()
    df = spark.range(1).select(
        *[
            __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
                pick_expr(a, b, str(s), str(w), str(t), str(v))
            ).alias(f"c{i}")
            for i, (s, w, t, v) in enumerate([(5, 0, 0, 5), (7, 1, 3, 11), (123456, 1, 7, 98765)])
        ]
    )
    row = df.first()
    for i, (s, w, t, v) in enumerate([(5, 0, 0, 5), (7, 1, 3, 11), (123456, 1, 7, 98765)]):
        mix = ((s % M31) * 31 + w * 1009 + t * 9176) % M31
        assert row[f"c{i}"] == (a * ((mix + (v % M31)) % M31) + b) % M31

"""Louvain (algorithms/louvain.py): exact-fraction fixture optima,
bit-equality of the distributed smj tier against the pure-pandas twin
(the same claim the louvain_parts oracle pins on the sf0.01 bowtie),
the monotone-Qnum termination witness, the level-0 objective identity
with community.modularity, and the contract raises."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from quiver_spark.algorithms.community import modularity
from quiver_spark.algorithms.louvain import (
    MAX_EXACT_S,
    louvain,
    louvain_local_arrays,
)
from quiver_spark.graph import Graph


def _two_cliques():
    """Two 5-cliques joined by one bridge + isolated vertex 99."""
    edges = []
    for base in (0, 10):
        for i, j in itertools.combinations(range(5), 2):
            edges.append((base + i, base + j))
    edges.append((0, 10))
    ids = sorted({a for a, _ in edges} | {b for _, b in edges} | {99})
    return ids, edges


def _ring_of_triangles(k=12):
    """Louvain's classic hierarchical case: level 1 finds the
    triangles, level 2 merges adjacent pairs (optimal Q = 17/24)."""
    edges = set()
    for c in range(k):
        b0 = 10 * c
        edges |= {(b0, b0 + 1), (b0, b0 + 2), (b0 + 1, b0 + 2)}
        edges.add((b0 + 2, 10 * ((c + 1) % k)))
    ids = sorted({a for a, _ in edges} | {b for _, b in edges})
    return ids, sorted(edges)


def _rand_graph(seed=7, n=400, m=3000):
    rng = np.random.default_rng(seed)
    src = rng.zipf(1.8, m) % n
    dst = rng.integers(0, n, m)
    keep = src != dst
    el = sorted(
        {(min(int(s), int(d)), max(int(s), int(d))) for s, d in zip(src[keep], dst[keep])}
    )
    ids = sorted({a for a, _ in el} | {b for _, b in el})
    return ids, el


def _local(ids, edges, **kw):
    a = np.array([min(e) for e in edges], dtype=np.int64)
    b = np.array([max(e) for e in edges], dtype=np.int64)
    return louvain_local_arrays(
        np.array(ids, dtype=np.int64), a, b, np.ones(len(edges), dtype=np.int64), **kw
    )


def _graph(spark, ids, edges):
    v = spark.createDataFrame(pd.DataFrame({"id": ids}), "id long")
    e = spark.createDataFrame(
        pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]}),
        "src long, dst long",
    )
    return Graph(v, e)


def test_two_cliques_exact_optimum():
    ids, edges = _two_cliques()
    out, res = _local(ids, edges)
    groups = out.groupby("comm")["id"].apply(lambda s: sorted(s)).to_dict()
    assert groups == {0: [0, 1, 2, 3, 4], 10: [10, 11, 12, 13, 14], 99: [99]}
    # m = 21, Q = 2·(10/21 − (21/42)²) = 19/42 exactly → Qnum = 798, S = 42
    assert res.s_total == 42
    assert res.qnum_history[-1] == 798


def test_ring_of_triangles_hierarchical_merge():
    """Level-2 merging: the full-set fast path chain-rejects (every
    triangle targets its smallest neighbor — a swap pattern), the
    community-disjoint fallback then pairs adjacent triangles. The
    parallel maximal matching strands two triangles that a sequential
    ring-order scan would pair (maximal ≠ maximum matching), so the
    pinned optimum is Qnum = 6464 (Q ≈ 0.7014) — strictly above the
    triangles-only partition (Qnum = 6144, Q = 2/3), which proves the
    level-2 merge really fired; the global optimum for reference is
    6528 (Q = 17/24). Deterministic, so pinned exactly."""
    ids, edges = _ring_of_triangles()
    out, res = _local(ids, edges)
    sizes = sorted(out.groupby("comm").size().tolist())
    assert sizes == [3, 3, 6, 6, 6, 6, 6]
    assert res.n_levels == 3
    assert res.s_total == 96
    assert res.qnum_history[-1] == 6464
    assert res.qnum_history[-1] > 6144  # beats the triangle-level partition


def test_qnum_strictly_increasing_and_deterministic():
    ids, edges = _rand_graph()
    out1, res1 = _local(ids, edges)
    out2, res2 = _local(ids, edges)
    qh = res1.qnum_history
    assert all(qh[i] < qh[i + 1] for i in range(len(qh) - 1))
    assert res1.qnum_history == res2.qnum_history
    pd.testing.assert_frame_equal(out1, out2)


@pytest.mark.parametrize("case", ["ring", "rand"])
def test_smj_tier_equals_pandas_twin(spark, case):
    """The louvain_parts oracle's claim, pinned through the algorithm:
    the distributed smj tier and the pure-pandas twin agree bit-for-bit
    on assignment AND on the full accepted-Qnum history."""
    ids, edges = _ring_of_triangles(8) if case == "ring" else _rand_graph(n=120, m=700)
    lout, lres = _local(ids, edges)
    sres = louvain(_graph(spark, ids, edges), strategy="smj")
    sout = sres.assignment.orderBy("id").toPandas()
    assert sout["id"].tolist() == lout["id"].tolist()
    assert sout["comm"].tolist() == lout["comm"].tolist()
    assert sres.qnum_history == lres.qnum_history
    assert sres.s_total == lres.s_total


def test_smj_invariant_to_shuffle_partitions(spark):
    """Engine-order independence: the integer scores + total-order
    argmax/claims make the smj result a pure function of the graph, so
    changing the shuffle-partition count must not change the
    assignment or the Qnum history."""
    ids, edges = _rand_graph(seed=13, n=100, m=500)
    g = _graph(spark, ids, edges)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        r3 = louvain(g, strategy="smj")
        a3 = r3.assignment.orderBy("id").toPandas()
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        r8 = louvain(g, strategy="smj")
        a8 = r8.assignment.orderBy("id").toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    pd.testing.assert_frame_equal(a3, a8)
    assert r3.qnum_history == r8.qnum_history


def test_local_strategy_and_auto_route(spark):
    ids, edges = _two_cliques()
    g = _graph(spark, ids, edges)
    r_local = louvain(g, strategy="local")
    r_auto = louvain(g)  # tiny graph → auto routes to the local tier
    a = r_local.assignment.orderBy("id").toPandas()
    b = r_auto.assignment.orderBy("id").toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert r_local.qnum_history[-1] == 798


def test_q_matches_modularity_operator(spark):
    """Level-0 objective identity: res.q IS community.modularity's Q
    of the assignment over the same simple undirected view."""
    ids, edges = _rand_graph(seed=11, n=80, m=400)
    g = _graph(spark, ids, edges)
    res = louvain(g, strategy="local")
    q_op = modularity(g, res.assignment)
    assert res.q == pytest.approx(q_op, abs=1e-12)


def test_multigraph_selfloop_invariance():
    """Level-0 canonicalization: parallel edges, reversed duplicates
    and self-loops do not change the unweighted result."""
    ids, edges = _two_cliques()
    noisy = edges + [(1, 0), (0, 1), (3, 3), (12, 11), (99, 99)]
    out_clean, res_clean = _local(ids, edges)
    # run through the same canonicalization the Graph path uses
    a = np.array([min(e) for e in noisy if e[0] != e[1]], dtype=np.int64)
    b = np.array([max(e) for e in noisy if e[0] != e[1]], dtype=np.int64)
    canon = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
    out_noisy, res_noisy = louvain_local_arrays(
        np.array(ids, dtype=np.int64),
        canon["a"].to_numpy(),
        canon["b"].to_numpy(),
        np.ones(len(canon), dtype=np.int64),
    )
    pd.testing.assert_frame_equal(out_clean, out_noisy)
    assert res_clean.qnum_history == res_noisy.qnum_history


def test_weighted_level0():
    """weight_col semantics: heavy edges bind. 0—1 and 2—3 heavy,
    1—2 light → communities {0,1} and {2,3}."""
    ids = [0, 1, 2, 3]
    a = np.array([0, 1, 2], dtype=np.int64)
    b = np.array([1, 2, 3], dtype=np.int64)
    w = np.array([10, 1, 10], dtype=np.int64)
    out, res = louvain_local_arrays(np.array(ids, dtype=np.int64), a, b, w)
    groups = out.groupby("comm")["id"].apply(lambda s: sorted(s)).to_dict()
    assert groups == {0: [0, 1], 2: [2, 3]}


def test_weighted_spark_equals_twin(spark):
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 1), (2, 3, 10)], "src long, dst long, weight long"
    )
    res = louvain(Graph(v, e), weight_col="weight", strategy="smj")
    out = res.assignment.orderBy("id").toPandas()
    assert out["comm"].tolist() == [0, 0, 2, 2]


def test_tail_tol_trades_rounds_not_validity(spark):
    """tail_tol (the standard Louvain gain floor): fewer rounds, Q no
    better than exact, result still a valid deterministic partition —
    and the smj tier and pandas twin agree bit-for-bit with the knob
    active (the gate integer is computed identically)."""
    ids, edges = _rand_graph(seed=5, n=200, m=1200)
    out0, res0 = _local(ids, edges)
    out1, res1 = _local(ids, edges, tail_tol=1e-3)
    assert sum(res1.rounds_per_level) <= sum(res0.rounds_per_level)
    assert res1.qnum_history[-1] <= res0.qnum_history[-1]
    assert sorted(out1["id"].tolist()) == sorted(ids)
    s1 = louvain(_graph(spark, ids, edges), strategy="smj", tail_tol=1e-3)
    a1 = s1.assignment.orderBy("id").toPandas()
    assert a1["comm"].tolist() == out1["comm"].tolist()
    assert s1.qnum_history == res1.qnum_history
    # a huge floor ends every level after its first applied round
    _, res_huge = _local(ids, edges, tail_tol=1.0)
    assert all(rl <= 2 for rl in res_huge.rounds_per_level)


def test_overflow_guard_raises():
    ids = [0, 1]
    with pytest.raises(ValueError, match="exact-score bound"):
        louvain_local_arrays(
            np.array(ids, dtype=np.int64),
            np.array([0], dtype=np.int64),
            np.array([1], dtype=np.int64),
            np.array([MAX_EXACT_S], dtype=np.int64),
        )


def test_max_rounds_contract():
    ids, edges = _two_cliques()
    with pytest.raises(RuntimeError, match="max_rounds"):
        _local(ids, edges, max_rounds=1)


def test_unknown_strategy_raises(spark):
    ids, edges = _two_cliques()
    with pytest.raises(ValueError, match="strategy"):
        louvain(_graph(spark, ids, edges), strategy="bhj")

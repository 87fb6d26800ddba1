"""ANF (algorithms/anf.py) against an INDEPENDENT reference: plain
python-int Flajolet-Martin simulation written to the documented spec
(the spec is shared; the code paths are disjoint — Spark runs the
generated SQL ladders, this file runs shifts and dict-BFS)."""

from __future__ import annotations

import random

import pytest

from quiver_spark.algorithms.anf import (
    M31,
    anf,
    effective_diameter,
    fm_params,
    neighborhood_function,
    nf_estimate,
    with_r_sum,
)
from quiver_spark.graph import Graph

K, BITS = 4, 16


def init_mask(v: int, a: int, b: int, bits: int) -> int:
    h = (a * (v % M31) + b) % M31
    for t in range(bits - 1):
        if h % (1 << (t + 1)) == (1 << t):
            return 1 << t
    return 1 << (bits - 1)


def lsz(m: int, bits: int) -> int:
    for b in range(bits):
        if m % (1 << (b + 1)) == (1 << b) - 1:
            return b
    return bits


def brute_anf(edges, directed: bool, radius: int, k=K, bits=BITS, seed=20260819):
    """masks[v] after `radius` OR-propagation rounds, per python ints."""
    adj: dict[int, set[int]] = {}
    ids = set()
    for s, d in edges:
        ids |= {s, d}
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    params = fm_params(k, seed)
    state = {v: [init_mask(v, a, b, bits) for a, b in params] for v in ids}
    for _ in range(radius):
        state = {
            v: [
                m | _or_all(state[u][j] for u in adj.get(v, ()))
                for j, m in enumerate(ms)
            ]
            for v, ms in state.items()
        }
    return state


def _or_all(it):
    out = 0
    for x in it:
        out |= x
    return out


def _mk(spark, edges):
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))


def _rand_edges(seed, n=24, m=70):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def _collect_masks(df, k=K):
    return {r.id: [r[f"m{j}"] for j in range(k)] for r in df.collect()}


def test_fixed_rounds_bit_exact_vs_brute_both_directions(spark):
    edges = _rand_edges(7)
    g = _mk(spark, edges)
    for direction, directed in (("out", True), ("both", False)):
        res = anf(g, radius=3, k=K, bits=BITS, direction=direction)
        assert _collect_masks(res.state) == brute_anf(edges, directed, 3)


def test_saturation_masks_equal_reachability_or(spark):
    # fixpoint mode: every mask must equal the OR of init masks over
    # the vertex's full out-reachable closure (independent dict-BFS)
    edges = _rand_edges(11)
    res = anf(_mk(spark, edges), k=K, bits=BITS, direction="out")
    assert res.converged
    adj: dict[int, set[int]] = {}
    ids = set()
    for s, d in edges:
        ids |= {s, d}
        adj.setdefault(s, set()).add(d)
    params = fm_params(K, 20260819)
    want = {}
    for v in ids:
        seen, stack = {v}, [v]
        while stack:
            u = stack.pop()
            for w in adj.get(u, ()):
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        want[v] = [
            _or_all(init_mask(w, a, b, BITS) for w in seen) for a, b in params
        ]
    assert _collect_masks(res.state) == want


def test_r_sum_matches_brute_ladder(spark):
    edges = _rand_edges(13)
    res = anf(_mk(spark, edges), radius=2, k=K, bits=BITS, direction="both")
    got = {r.id: r.r_sum for r in with_r_sum(res.state, K, BITS).collect()}
    ref = {
        v: sum(lsz(m, BITS) for m in ms)
        for v, ms in brute_anf(edges, False, 2).items()
    }
    assert got == ref


def test_neighborhood_function_matches_brute_and_is_monotone(spark):
    edges = _rand_edges(17)
    nf = neighborhood_function(_mk(spark, edges), h_max=3, k=K, bits=BITS, direction="both")
    assert [h for h, _, _ in nf] == [0, 1, 2, 3]
    totals = [rs for _, rs, _ in nf]
    assert totals == sorted(totals)  # OR-monotone masks → monotone r_sum
    for h in range(4):
        ref = sum(
            lsz(m, BITS)
            for ms in brute_anf(edges, False, h).values()
            for m in ms
        )
        assert nf[h][1] == ref


def test_estimate_order_of_magnitude_on_clique(spark):
    # 32-clique: every 1-ball is exactly 32; with k=32 masks the FM
    # estimate lands well inside [16, 64] for this fixed seed
    n = 32
    edges = [(i, j) for i in range(n) for j in range(n) if i < j]
    nf = neighborhood_function(_mk(spark, edges), h_max=1, k=32, bits=20, direction="both")
    est = nf_estimate(nf[1][1], nf[1][2], k=32)
    assert n / 2 <= est <= n * 2
    # ball saturates at h=1 → effective diameter ≈ 1
    nf2 = neighborhood_function(_mk(spark, edges), h_max=2, k=32, bits=20, direction="both")
    assert effective_diameter(nf2, k=32) <= 1.0


def test_saturation_raises_past_max_radius(spark):
    chain = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="max_radius"):
        anf(_mk(spark, chain), k=2, bits=8, direction="out", max_radius=3)

"""Traversal properties (SURVEY.md §5.1): BFS levels, reachability
closure, esp endpoints+minimality, dff parent validity, DFS oracle
exact order, Bellman-Ford costs."""

from __future__ import annotations

from pyspark.sql import functions as F

from quiver_spark import traverse
from tests.conftest import build_graph


def test_bfs_levels_chain(chain5):
    out = {r["id"]: r["level"] for r in traverse.bfs(chain5, [0]).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_parents_form_forest(chain5, star10):
    rows = traverse.bfs(star10, [0]).collect()
    assert {r["id"]: r["parent"] for r in rows} == {0: None, **{i: 0 for i in range(1, 11)}}
    assert all(r["root"] == 0 for r in rows)


def test_bfs_multi_seed_min_tiebreak(spark):
    # diamond: 0→2, 1→2 — seeded from {0,1}, vertex 2 must pick parent 0
    g = build_graph(spark, [(0, "a"), (1, "b"), (2, "c")], [(0, 2, "e"), (1, 2, "e")])
    rows = {r["id"]: r for r in traverse.bfs(g, [0, 1]).collect()}
    assert rows[2]["parent"] == 0 and rows[2]["level"] == 1


def test_bfs_direction_and_max_depth(chain5):
    back = {r["id"]: r["level"] for r in traverse.bfs(chain5, [4], direction="in").collect()}
    assert back == {4: 0, 3: 1, 2: 2, 1: 3, 0: 4}
    capped = traverse.bfs(chain5, [0], max_depth=2)
    assert sorted(r["id"] for r in capped.collect()) == [0, 1, 2]


def test_bfs_cycle_terminates(k3):
    out = {r["id"]: r["level"] for r in traverse.bfs(k3, [0]).collect()}
    assert out == {0: 0, 1: 1, 2: 1}


def test_reachable_closure(chain5, two_cliques_bridge):
    # edge a→b ⇒ b ∈ reachable(a)
    assert sorted(r["id"] for r in traverse.reachable(chain5, 2).collect()) == [2, 3, 4]
    # bridge: clique 1 reaches clique 2 but not vice versa
    r1 = sorted(r["id"] for r in traverse.reachable(two_cliques_bridge, 0).collect())
    assert r1 == [0, 1, 2, 3, 10, 11, 12, 13]
    r2 = sorted(r["id"] for r in traverse.reachable(two_cliques_bridge, 10).collect())
    assert r2 == [10, 11, 12, 13]
    # undirected reachability unions them
    r3 = sorted(r["id"] for r in traverse.reachable(two_cliques_bridge, 10, direction="both").collect())
    assert r3 == [0, 1, 2, 3, 10, 11, 12, 13]


def test_rdfs_set(chain5):
    assert sorted(r["id"] for r in traverse.rdfs_set(chain5, [2]).collect()) == [0, 1, 2]


def test_dff_all_vertices_covered(planted_cc):
    forest = traverse.dff(planted_cc.undir())
    rows = forest.collect()
    assert len(rows) == 10  # every vertex in exactly one tree
    by_id = {r["id"]: r for r in rows}
    # parent edges must be real graph edges (in the undirected view)
    und = {(r["src"], r["dst"]) for r in planted_cc.undir().edges.collect()}
    for r in rows:
        if r["parent"] is not None:
            assert (r["parent"], r["id"]) in und


def test_esp(chain5, two_cliques_bridge):
    assert traverse.esp(chain5, 0, 4) == [0, 1, 2, 3, 4]
    assert traverse.esp(chain5, 4, 0) == []  # directed
    p = traverse.esp(two_cliques_bridge, 0, 13)
    assert p[0] == 0 and p[-1] == 13 and len(p) == 4  # 0→3→10→13 minimal


def test_lesp(two_cliques_bridge):
    lp = traverse.lesp(two_cliques_bridge, 0, 10)
    assert [v for v, _ in lp] == [0, 3, 10]
    assert lp[1][1]["etype"] == "e" and lp[2][1]["etype"] == "bridge"


def test_dfs_oracle_exact_order(spark, chain5):
    assert traverse.dfs_oracle(chain5, [0]) == [0, 1, 2, 3, 4]
    # Erwig order with branching: visit smallest successor's subtree first
    g = build_graph(
        spark,
        [(i, f"v{i}") for i in range(7)],
        [(0, 1, "e"), (0, 4, "e"), (1, 2, "e"), (1, 3, "e"), (4, 5, "e"), (4, 6, "e")],
    )
    assert traverse.dfs_oracle(g, [0]) == [0, 1, 2, 3, 4, 5, 6]
    # dfs covers exactly the reachable set
    assert set(traverse.dfs_oracle(g, [1])) == {1, 2, 3}


def test_cheapest_path_costs(spark):
    # weighted diamond: 0→1 (1.0), 1→3 (1.0), 0→2 (5.0), 2→3 (0.5);
    # also a longer-but-cheaper detour check
    V = spark.createDataFrame([(i,) for i in range(4)], "id long")
    E = spark.createDataFrame(
        [(0, 1, 1.0), (1, 3, 1.0), (0, 2, 5.0), (2, 3, 0.5)], "src long, dst long, weight double"
    )
    from quiver_spark.graph import Graph

    g = Graph.mk_graph(V, E)
    costs = {r["id"]: (r["cost"], r["parent"]) for r in traverse.cheapest_path_costs(g, [0]).collect()}
    assert costs[0] == (0.0, None)
    assert costs[3] == (2.0, 1)  # via 0→1→3, not 0→2→3 (5.5)
    assert costs[2] == (5.0, 0)


def test_bfs_non_broadcast_fallback_same_result(spark, monkeypatch):
    """Frontiers past BROADCAST_FRONTIER_MAX skip the broadcast hint;
    the exchange-plan fallback must produce identical levels/parents."""
    from quiver_spark import traverse as tv
    from quiver_spark.graph import Graph

    edges = spark.createDataFrame(
        [(i, i + 1, "e") for i in range(50)] + [(0, i, "e") for i in range(2, 30, 3)],
        "src long, dst long, etype string",
    )
    g = Graph.from_edges(edges)
    normal = sorted(tuple(r) for r in tv.bfs(g, [0]).collect())
    monkeypatch.setattr(tv, "BROADCAST_FRONTIER_MAX", 2)
    fallback = sorted(tuple(r) for r in tv.bfs(g, [0]).collect())
    assert normal == fallback


def test_cheapest_path_salted_equals_unsalted(spark):
    """Verdict r3 item 5: degree-proportional salting of the relax
    aggregate is a physical rewrite only — (cost, parent) identical on
    a seeded power-law fixture whose hub forces the salted plan."""
    from quiver_spark import ingest as ing
    from quiver_spark.graph import Graph
    from pyspark.sql import functions as F2

    edges = (
        ing.synthesize_powerlaw_edges(spark, n_vertices=500, n_edges=3000, seed=13)
        .withColumn("weight", (F2.pmod(F2.xxhash64("src", "dst"), F2.lit(7)) + F2.lit(1)).cast("double"))
    )
    g = Graph.from_edges(edges)
    seeds = [r["id"] for r in g.vertices.orderBy("id").limit(3).collect()]
    plain = {
        (r["id"]): (r["cost"], r["parent"])
        for r in traverse.cheapest_path_costs(g, seeds, rows_per_salt=10**9).collect()
    }
    salted = {
        (r["id"]): (r["cost"], r["parent"])
        for r in traverse.cheapest_path_costs(g, seeds, rows_per_salt=10).collect()
    }
    assert plain == salted
    assert len(plain) > 3  # actually relaxed beyond the seeds


def test_dfs_oracle_edgeless_graph_visits_seeds(spark):
    """Erwig DFS visits every in-graph seed even with no successors; a
    zero-row direction-projected edge frame used to skip the kernel
    entirely (groupBy.applyInPandas never runs on zero rows) and
    return []."""
    g = build_graph(spark, [(1, "a"), (2, "b")], [])
    assert traverse.dfs_oracle(g, [1, 2]) == [1, 2]
    # edges exist only in the opposite direction of the projection
    g2 = build_graph(spark, [(1, "a"), (2, "b")], [(1, 2, "e")])
    assert traverse.dfs_oracle(g2, [2], direction="out") == [2]


def test_dfs_oracle_skips_seeds_not_in_graph(spark):
    """fgl's dfs drops nodes that fail to match; the kernel only saw
    edge endpoints, so a nonexistent seed was wrongly visited."""
    g = build_graph(spark, [(1, "a"), (2, "b")], [(1, 2, "e")])
    assert traverse.dfs_oracle(g, [99, 1]) == [1, 2]


def test_cheapest_path_raises_on_iteration_exhaustion(spark):
    """Exhausting max_iters with relaxations still firing must raise —
    returning partial distances silently hands callers non-converged
    costs labeled as exact."""
    import pytest

    from quiver_spark.graph import Graph

    n = 12
    V = spark.createDataFrame([(i,) for i in range(n)], "id long")
    E = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "src long, dst long, weight double"
    )
    g = Graph.mk_graph(V, E)
    with pytest.raises(RuntimeError, match="did not converge"):
        traverse.cheapest_path_costs(g, [0], max_iters=3)

"""Generator-driven property suites over seeded random multigraphs —
the distributed re-encoding of quiver's ScalaCheck laws (SURVEY.md
§5.1; [pub: Verizon/quiver core/src/test/scala/quiver/GraphSpec.scala]
property names cited per test). Fixed seeds keep every run identical
at any parallelism; each property runs over ≥ 20 generated graphs.

Graphs are deliberately tiny (≤ 20 vertices) — these laws are about
semantics, not scale; the scale evidence lives in bench/ and the
oracle layer.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quiver_spark.graph import Graph

N_GRAPHS = 22
SEEDS = list(range(N_GRAPHS))


def random_multigraph(spark, seed: int, n_min: int = 4, n_max: int = 16) -> Graph:
    """Seeded random labeled multigraph. The small (3-value) edge-label
    space makes parallel-edge collisions common, exercising the
    Set[B] dedup paths; ~10% of generated graphs have zero edges."""
    rng = np.random.default_rng(1_000_003 * seed + 17)
    n = int(rng.integers(n_min, n_max + 1))
    ids = sorted(int(x) for x in rng.choice(np.arange(1, 400), size=n, replace=False))
    m = int(rng.integers(0, 4 * n))
    vs = [(i, f"n{int(rng.integers(0, 5))}") for i in ids]
    es = [
        (int(rng.choice(ids)), int(rng.choice(ids)), f"e{int(rng.integers(0, 3))}")
        for _ in range(m)
    ]
    V = spark.createDataFrame(vs, "id long, name string")
    E = spark.createDataFrame(es, "src long, dst long, etype string")
    return Graph.mk_graph(V, E)


def gsig(g: Graph) -> tuple[tuple, tuple]:
    """Canonical value signature: sorted vertex rows + sorted edge rows."""
    vs = tuple(sorted(tuple(r) for r in g.vertices.select("id", *sorted(g.vlabel_cols)).collect()))
    es = tuple(sorted(tuple(r) for r in g.edges.select("src", "dst", *sorted(g.elabel_cols)).collect()))
    return vs, es


@pytest.fixture(scope="module")
def graphs(spark):
    return {s: random_multigraph(spark, s) for s in SEEDS}


def test_decomp_embed_round_trip(spark, graphs):
    """[pub: GraphSpec.scala 'decomposition round-trip']: for any v,
    embed(decomp(g, v).rest, context(v)) == g."""
    for s, g in graphs.items():
        v = int(g.vertices.select("id").orderBy("id").limit(1).collect()[0]["id"])
        ctx, rest = g.decomp(v)
        node = g.vertices.filter(F.col("id") == v)
        # incident edges from the original graph (self-loops appear in
        # both in_ and out_; embed's add_edges re-dedups on identity)
        in_e = g.edges.filter(F.col("dst") == v)
        out_e = g.edges.filter(F.col("src") == v)
        back = rest.embed(node, in_e, out_e)
        assert gsig(back) == gsig(g), f"seed {s}: decomp/embed not a round-trip"


def test_union_monoid_laws(spark, graphs):
    """[pub: package.scala graph Monoid]: identity, idempotence, and
    associativity of union (right-biased labels)."""
    empty = Graph.empty(spark, "id long, name string", "src long, dst long, etype string")
    for s in SEEDS[:20]:
        g = graphs[s]
        assert gsig(g.union(empty)) == gsig(g), f"seed {s}: right identity"
        assert gsig(empty.union(g)) == gsig(g), f"seed {s}: left identity"
        assert gsig(g.union(g)) == gsig(g), f"seed {s}: idempotence"
    # associativity over overlapping id spaces (labels collide by design)
    for s in range(7):
        a, b, c = graphs[3 * s], graphs[3 * s + 1], graphs[3 * s + 2]
        assert gsig(a.union(b).union(c)) == gsig(a.union(b.union(c))), f"triple {s}: associativity"


def test_degree_sum_invariants(spark, graphs):
    """[pub: GraphSpec.scala 'degree invariants']: Σ out = Σ in = |E|;
    degree = in + out pointwise."""
    for s, g in graphs.items():
        m = g.count_edges()
        out_sum = g.out_degrees().agg(F.sum("out_degree")).collect()[0][0] or 0
        in_sum = g.in_degrees().agg(F.sum("in_degree")).collect()[0][0] or 0
        assert out_sum == m == in_sum, f"seed {s}: degree sums {out_sum}/{in_sum} vs |E|={m}"
        bad = (
            g.degrees()
            .filter(F.col("degree") != F.col("in_degree") + F.col("out_degree"))
            .count()
        )
        assert bad == 0, f"seed {s}: degree != in+out"


def test_add_edge_increments_degrees(spark, graphs):
    """addEdge bumps exactly the two endpoint degrees by one (fresh
    label so the Set[B] dedup cannot absorb it)."""
    for s in SEEDS[:20]:
        g = graphs[s]
        two = [r["id"] for r in g.vertices.select("id").orderBy("id").limit(2).collect()]
        a, b = (two + two)[:2]
        e = spark.createDataFrame([(a, b, f"fresh_{s}")], "src long, dst long, etype string")
        g2 = g.add_edges(e)
        assert g2.count_edges() == g.count_edges() + 1, f"seed {s}: edge count"
        d1 = {r["id"]: r["out_degree"] for r in g.out_degrees().collect()}
        d2 = {r["id"]: r["out_degree"] for r in g2.out_degrees().collect()}
        assert d2[a] == d1[a] + 1, f"seed {s}: out-degree of src"


def test_reverse_involution_and_degree_swap(spark, graphs):
    """[pub: GraphSpec.scala 'reverse involution']: grev∘grev = id and
    in-degrees(g) == out-degrees(grev(g))."""
    for s, g in graphs.items():
        assert gsig(g.reverse().reverse()) == gsig(g), f"seed {s}: reverse not involutive"
        a = sorted((r["id"], r["in_degree"]) for r in g.in_degrees().collect())
        b = sorted((r["id"], r["out_degree"]) for r in g.reverse().out_degrees().collect())
        assert a == b, f"seed {s}: degree swap"


def test_emap_collision_dedup(spark, graphs):
    """[pub: Graph.scala#emap Set[B] semantics]: collapsing all edge
    labels to one value leaves exactly one edge per (src, dst) pair."""
    for s, g in graphs.items():
        collapsed = g.emap(etype=F.lit("x"))
        assert collapsed.count_edges() == g.edge_pairs().count(), f"seed {s}: emap dedup"


def test_undir_symmetric_and_idempotent(spark, graphs):
    """[pub: Graph.scala#undir]: the undirected pair set is symmetric,
    and undir is idempotent."""
    for s in SEEDS[:20]:
        u = graphs[s].undir()
        pairs = {(r["src"], r["dst"]) for r in u.edge_pairs().collect()}
        assert all((b, a) in pairs for a, b in pairs), f"seed {s}: asymmetric undir"
        assert gsig(u.undir()) == gsig(u), f"seed {s}: undir not idempotent"


def test_safe_mk_graph_drops_exactly_dangling(spark):
    """[pub: package.scala#safeMkGraph]: dangling edges are dropped,
    nothing else; mk_graph raises iff a dangling edge exists."""
    for s in SEEDS[:20]:
        rng = np.random.default_rng(900_001 * s + 5)
        ids = sorted(int(x) for x in rng.choice(np.arange(1, 60), size=8, replace=False))
        es = [
            (int(rng.integers(1, 80)), int(rng.integers(1, 80)), "e")
            for _ in range(12)
        ]
        V = spark.createDataFrame([(i, "v") for i in ids], "id long, name string")
        E = spark.createDataFrame(es, "src long, dst long, etype string")
        safe = Graph.safe_mk_graph(V, E)
        idset = set(ids)
        expect = {(a, b, t) for a, b, t in es if a in idset and b in idset}
        got = {tuple(r) for r in safe.edges.collect()}
        assert got == expect, f"seed {s}: safe_mk_graph kept wrong edge set"
        if len(expect) < len(set(es)):
            with pytest.raises(ValueError):
                Graph.mk_graph(V, E)


def test_subgraph_induced(spark, graphs):
    """[pub: Graph.scala#subgraph]: subgraph(all ids) == g; induced
    edges have both endpoints inside."""
    for s in SEEDS[:20]:
        g = graphs[s]
        all_ids = [r["id"] for r in g.vertices.select("id").collect()]
        assert gsig(g.subgraph(all_ids)) == gsig(g), f"seed {s}: full subgraph"
        half = all_ids[: max(1, len(all_ids) // 2)]
        sub = g.subgraph(half)
        hs = set(half)
        assert all(
            r["src"] in hs and r["dst"] in hs for r in sub.edges.collect()
        ), f"seed {s}: non-induced edge"


# ------------------------------------------------- traversal laws (r3)
def _hop_oracle(edges: list[tuple[int, int]], seeds: set[int]) -> dict[int, int]:
    """Plain-python BFS hop distances from the seed set (graphs are
    tiny by design; this is the in-kernel oracle the distributed bfs
    is checked against)."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    dist = {s: 0 for s in seeds}
    q = deque(sorted(seeds))
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _graph_edges(g: Graph) -> list[tuple[int, int]]:
    return [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]


def test_bfs_levels_are_hop_minimal(spark, graphs):
    """[pub: GraphSpec.scala 'bfs visits in level order']: bfs level(v)
    equals the exact hop distance from the seed set, for every
    reachable v, and nothing unreachable appears."""
    from quiver_spark import traverse

    for s, g in graphs.items():
        ids = [r["id"] for r in g.vertices.select("id").orderBy("id").collect()]
        if not ids:
            continue
        rng = np.random.default_rng(31 * s + 5)
        seeds = {int(x) for x in rng.choice(ids, size=min(2, len(ids)), replace=False)}
        got = {r["id"]: r["level"] for r in traverse.bfs(g, sorted(seeds)).collect()}
        want = _hop_oracle(_graph_edges(g), seeds)
        assert got == want, f"seed {s}: bfs levels != hop oracle"


def test_bfs_parent_pointers_form_valid_forest(spark, graphs):
    """[pub: Graph.scala#bft]: every non-seed row's parent is reached
    one level earlier via a real edge, shares the row's root, and
    chasing parents terminates at a seed (= the row's root, level 0,
    parent NULL)."""
    from quiver_spark import traverse

    for s, g in graphs.items():
        ids = [r["id"] for r in g.vertices.select("id").orderBy("id").collect()]
        if not ids:
            continue
        rng = np.random.default_rng(77 * s + 1)
        seeds = {int(x) for x in rng.choice(ids, size=min(3, len(ids)), replace=False)}
        rows = {r["id"]: r for r in traverse.bfs(g, sorted(seeds)).collect()}
        eset = set(_graph_edges(g))
        for v, r in rows.items():
            if v in seeds and r["level"] == 0:
                assert r["parent"] is None and r["root"] == v
                continue
            p = r["parent"]
            assert p in rows, f"seed {s}: parent {p} of {v} not visited"
            assert rows[p]["level"] == r["level"] - 1
            assert (p, v) in eset, f"seed {s}: parent edge {p}->{v} missing"
            assert rows[p]["root"] == r["root"]
            # chase to a root: bounded by level
            cur, hops = v, 0
            while rows[cur]["parent"] is not None:
                cur = rows[cur]["parent"]
                hops += 1
                assert hops <= r["level"]
            assert cur == r["root"] and cur in seeds


def test_dff_partitions_reachable_set(spark, graphs):
    """[pub: Graph.scala#dff 'forest partitions the graph']: with a
    random seed subset, dff assigns every reachable vertex to exactly
    one tree whose root is a seed; trees are vertex-disjoint by
    construction (one row per id) and cover exactly the reachable
    set."""
    from quiver_spark import traverse

    for s, g in graphs.items():
        ids = [r["id"] for r in g.vertices.select("id").orderBy("id").collect()]
        if not ids:
            continue
        rng = np.random.default_rng(13 * s + 3)
        seeds = {int(x) for x in rng.choice(ids, size=min(3, len(ids)), replace=False)}
        forest = traverse.dff(g, sorted(seeds)).collect()
        by_id = {}
        for r in forest:
            assert r["id"] not in by_id, f"seed {s}: vertex in two trees"
            by_id[r["id"]] = r
        assert set(by_id) == set(_hop_oracle(_graph_edges(g), seeds)), (
            f"seed {s}: forest does not cover exactly the reachable set"
        )
        for r in forest:
            assert r["root"] in seeds


def test_esp_is_shortest_and_valid(spark, graphs):
    """[pub: Graph.scala#esp]: the returned path starts at s, ends at
    t, every consecutive pair is an edge, its hop length equals the
    oracle distance; [] exactly when t is unreachable from s."""
    from quiver_spark import traverse

    for s, g in graphs.items():
        ids = [r["id"] for r in g.vertices.select("id").orderBy("id").collect()]
        if len(ids) < 2:
            continue
        rng = np.random.default_rng(97 * s + 7)
        a, b = (int(x) for x in rng.choice(ids, size=2, replace=False))
        dist = _hop_oracle(_graph_edges(g), {a})
        path = traverse.esp(g, a, b)
        if b not in dist:
            assert path == [], f"seed {s}: path to unreachable {b}"
            continue
        assert path[0] == a and path[-1] == b
        assert len(path) - 1 == dist[b], f"seed {s}: not hop-minimal"
        eset = set(_graph_edges(g))
        for u, v in zip(path, path[1:]):
            assert (u, v) in eset, f"seed {s}: non-edge {u}->{v} in path"


def test_cheapest_path_costs_match_dijkstra(spark, graphs):
    """[pub: Graph.scala#cheapestPath]: distributed Bellman-Ford
    distances equal an in-python Dijkstra oracle on the same weighted
    multigraph (min over parallel edges), seeds cost 0, every non-seed
    row's parent admits an edge achieving cost[v] = cost[p] + w, and
    unreachable vertices are absent."""
    import heapq

    from quiver_spark import traverse

    for s, g in graphs.items():
        ids = [r["id"] for r in g.vertices.select("id").orderBy("id").collect()]
        if not ids:
            continue
        # deterministic per-(src,dst,etype) weights; parallel edges of
        # one pair get distinct costs, exercising the min-relaxation
        wcol = 1.0 + (F.col("src") * 7 + F.col("dst") * 13 + F.length("etype")) % 5
        wg = Graph(g.vertices, g.edges.withColumn("weight", wcol.cast("double")))
        rows = wg.edges.select("src", "dst", "weight").collect()
        adj: dict[int, dict[int, float]] = {}
        for r in rows:
            d = adj.setdefault(r["src"], {})
            d[r["dst"]] = min(d.get(r["dst"], float("inf")), r["weight"])
        rng = np.random.default_rng(53 * s + 11)
        seeds = {int(x) for x in rng.choice(ids, size=min(2, len(ids)), replace=False)}
        dist = {v: 0.0 for v in seeds}
        heap = [(0.0, v) for v in sorted(seeds)]
        while heap:
            dv, v = heapq.heappop(heap)
            if dv > dist.get(v, float("inf")):
                continue
            for u, w in adj.get(v, {}).items():
                nd = dv + w
                if nd < dist.get(u, float("inf")):
                    dist[u] = nd
                    heapq.heappush(heap, (nd, u))
        got = {
            r["id"]: (r["cost"], r["parent"])
            for r in traverse.cheapest_path_costs(wg, sorted(seeds)).collect()
        }
        assert set(got) == set(dist), f"seed {s}: reachable set mismatch"
        for v, (c, p) in got.items():
            assert abs(c - dist[v]) < 1e-9, f"seed {s}: cost[{v}] {c} != {dist[v]}"
            if v in seeds and c == 0.0:
                continue
            assert p in got, f"seed {s}: parent {p} of {v} not in result"
            assert abs(got[p][0] + adj[p][v] - c) < 1e-9, (
                f"seed {s}: parent edge {p}->{v} does not achieve the min cost"
            )

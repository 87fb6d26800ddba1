"""Graph core property tests — re-encode quiver's ScalaCheck suite
(SURVEY.md §5.1: decomp round-trip, add/remove identity, reverse
involution, union monoid laws, degree invariants, multigraph dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from tests.conftest import build_graph, rows_set


def test_empty(spark):
    g = Graph.empty(spark)
    assert g.is_empty()
    assert g.count_nodes() == 0 and g.count_edges() == 0


def test_mk_graph_dedup_and_validation(spark):
    V = spark.createDataFrame([(0, "a"), (0, "a2"), (1, "b")], "id long, name string")
    E = spark.createDataFrame([(0, 1, "x"), (0, 1, "x")], "src long, dst long, etype string")
    g = Graph.mk_graph(V, E)
    assert g.count_nodes() == 2
    assert g.count_edges() == 1  # exact duplicate collapsed
    bad = spark.createDataFrame([(0, 99, "x")], "src long, dst long, etype string")
    with pytest.raises(ValueError):
        Graph.mk_graph(V, bad)
    safe = Graph.safe_mk_graph(V, E.unionByName(bad))
    assert safe.count_edges() == 1  # dangling dropped silently
    # ids_unique fast path: caller-warranted distinct ids, same result
    Vu = V.dropDuplicates(["id"])
    fast = Graph.safe_mk_graph(Vu, E.unionByName(bad), ids_unique=True)
    assert fast.count_nodes() == 2 and fast.count_edges() == 1


def test_multigraph_set_semantics(multi_edges):
    # (0,1,x) twice + (0,1,y) → exactly 2 parallel edges survive
    assert multi_edges.count_edges() == 2
    # degree counts parallel labeled edges individually
    deg = {r["id"]: r["out_degree"] for r in multi_edges.out_degrees().collect()}
    assert deg == {0: 2, 1: 0}


def test_add_remove_node_roundtrip(spark, chain5):
    n = spark.createDataFrame([(99, "new")], "id long, name string")
    e_in = spark.createDataFrame([(4, 99, "e")], "src long, dst long, etype string")
    e_out = spark.createDataFrame([(99, 0, "e")], "src long, dst long, etype string")
    g2 = chain5.embed(n, e_in, e_out)
    assert g2.count_nodes() == 6 and g2.count_edges() == 6
    # removing the vertex drops it and all incident edges → original
    g3 = g2.remove_nodes([99])
    assert rows_set(g3.vertices) == rows_set(chain5.vertices)
    assert rows_set(g3.edges) == rows_set(chain5.edges)


def test_add_node_replaces_label(spark, chain5):
    n = spark.createDataFrame([(0, "renamed")], "id long, name string")
    g2 = chain5.add_nodes(n)
    assert g2.count_nodes() == 5
    assert g2.label(0) == {"name": "renamed"}


def test_add_edges_endpoint_check(spark, chain5):
    bad = spark.createDataFrame([(0, 77, "e")], "src long, dst long, etype string")
    with pytest.raises(ValueError):
        chain5.add_edges(bad)
    g2 = chain5.add_edges(bad, safe=True)
    assert g2.count_edges() == chain5.count_edges()


def test_decomp_roundtrip(spark, k3):
    """(c & g).decomp(v) recovers c and rest — quiver's signature
    embed/decomp property."""
    ctx, rest = k3.decomp(0)
    row = ctx.collect()[0]
    assert row["id"] == 0
    assert sorted(a["nbr"] for a in row["out_adj"]) == [1, 2]
    assert sorted(a["nbr"] for a in row["in_adj"]) == [1, 2]
    assert rest.count_nodes() == 2
    assert rest.count_edges() == 2  # only 1<->2 remain
    # re-embed: recover the original graph
    n = spark.createDataFrame([(0, "v0")], "id long, name string")
    e_in = spark.createDataFrame([(a["nbr"], 0, a["etype"]) for a in row["in_adj"]], "src long, dst long, etype string")
    e_out = spark.createDataFrame([(0, a["nbr"], a["etype"]) for a in row["out_adj"]], "src long, dst long, etype string")
    g2 = rest.embed(n, e_in, e_out)
    assert rows_set(g2.vertices) == rows_set(k3.vertices)
    assert rows_set(g2.edges) == rows_set(k3.edges)


def test_degrees_and_roots_leaves(star10, chain5):
    deg = {r["id"]: (r["in_degree"], r["out_degree"]) for r in star10.degrees().collect()}
    assert deg[0] == (0, 10)
    assert all(deg[i] == (1, 0) for i in range(1, 11))
    assert [r["id"] for r in star10.roots().collect()] == [0]
    assert sorted(r["id"] for r in star10.leaves().collect()) == list(range(1, 11))
    assert sorted(r["id"] for r in chain5.roots().collect()) == [0]
    assert sorted(r["id"] for r in chain5.leaves().collect()) == [4]


def test_adjacency(chain5):
    assert [r["id"] for r in chain5.successors(1).collect()] == [2]
    assert [r["id"] for r in chain5.predecessors(1).collect()] == [0]
    assert sorted(r["id"] for r in chain5.neighbors(1).collect()) == [0, 2]
    assert chain5.contains(3) and not chain5.contains(42)
    assert chain5.label(2) == {"name": "v2"}
    assert chain5.find_edges(0, 1).count() == 1
    assert chain5.find_edges(1, 0).count() == 0


def test_reverse_involution(k4, chain5):
    for g in (k4, chain5):
        rr = g.reverse().reverse()
        assert rows_set(rr.edges) == rows_set(g.edges)
        assert rows_set(rr.vertices) == rows_set(g.vertices)


def test_undir(chain5):
    u = chain5.undir()
    assert u.count_edges() == 8
    # undir of an already-symmetric graph is a no-op (Set dedup)
    assert u.undir().count_edges() == 8


def test_union_monoid(spark, chain5, star10):
    empty = Graph.empty(spark, "id long, name string", "src long, dst long, etype string")
    # identity
    left = chain5.union(empty)
    assert rows_set(left.vertices) == rows_set(chain5.vertices)
    assert rows_set(left.edges) == rows_set(chain5.edges)
    # idempotent on self
    self_u = chain5.union(chain5)
    assert self_u.count_nodes() == 5 and self_u.count_edges() == 4
    # associativity on vertex/edge sets
    a = chain5.union(star10).union(chain5)
    b = chain5.union(star10.union(chain5))
    assert rows_set(a.vertices) == rows_set(b.vertices)
    assert rows_set(a.edges) == rows_set(b.edges)


def test_union_right_bias(spark, chain5):
    other = build_graph(spark, [(0, "OTHER")], [])
    u = chain5.union(other)
    assert u.label(0) == {"name": "OTHER"}


def test_labfilter_drops_incident_edges(chain5):
    g = chain5.labfilter(F.col("name") != "v2")
    assert g.count_nodes() == 4
    # edges 1→2 and 2→3 are gone
    assert rows_set(g.edge_pairs()) == rows_set(
        chain5.edges.filter(~F.col("src").isin(2) & ~F.col("dst").isin(2)).select("src", "dst")
    )


def test_efilter_keeps_vertices(two_cliques_bridge):
    g = two_cliques_bridge.efilter(F.col("etype") != "bridge")
    assert g.count_nodes() == 8
    assert g.count_edges() == 24


def test_subgraph(k4):
    sg = k4.subgraph([0, 1, 2])
    assert sg.count_nodes() == 3 and sg.count_edges() == 6


def test_nmap_emap(chain5):
    g = chain5.nmap(name=F.upper(F.col("name")))
    assert g.label(0) == {"name": "V0"}
    g2 = chain5.emap(etype=F.lit("all_same"))
    assert g2.count_edges() == 4  # chain has distinct (src,dst) so no merge
    # emap that collapses label distinction merges parallel edges
    m = build_graph(chain5.spark, [(0, "a"), (1, "b")], [(0, 1, "x"), (0, 1, "y")])
    assert m.emap(etype=F.lit("z")).count_edges() == 1


def test_vmap_relabels_edges(chain5):
    g = chain5.vmap(F.col("id") + 100)
    assert sorted(r["id"] for r in g.nodes().collect()) == [100, 101, 102, 103, 104]
    assert rows_set(g.edge_pairs()) == sorted(
        [(("dst", i + 101), ("src", i + 100)) for i in range(4)]
    )


def test_remove_edges_vs_ledges(spark, multi_edges):
    pairs = spark.createDataFrame([(0, 1)], "src long, dst long")
    assert multi_edges.remove_edges(pairs).count_edges() == 0
    led = spark.createDataFrame([(0, 1, "x")], "src long, dst long, etype string")
    g = multi_edges.remove_ledges(led)
    assert g.count_edges() == 1
    assert g.edges.collect()[0]["etype"] == "y"


def test_contexts_batch_view(k3, star10):
    ctx = {r["id"]: r for r in k3.contexts().collect()}
    for v in range(3):
        assert sorted(a["nbr"] for a in ctx[v]["out_adj"]) == sorted(set(range(3)) - {v})
        assert sorted(a["nbr"] for a in ctx[v]["in_adj"]) == sorted(set(range(3)) - {v})
    # leaf contexts have empty out_adj (coalesced, not null)
    leaf = star10.contexts().filter(F.col("id") == 5).collect()[0]
    assert leaf["out_adj"] == [] and [a["nbr"] for a in leaf["in_adj"]] == [0]


def test_select_contexts(star10):
    hubs = star10.select_contexts(F.size("out_adj") >= 10)
    assert [r["id"] for r in hubs.collect()] == [0]


def test_fold_contexts(k4):
    row = k4.fold_contexts([F.sum(F.size("out_adj")).alias("m"), F.count("*").alias("n")]).collect()[0]
    assert row["m"] == 12 and row["n"] == 4


def test_gmap(star10):
    out = star10.gmap(
        lambda pdf: pdf.assign(total_deg=pdf.in_adj.str.len() + pdf.out_adj.str.len())[["id", "total_deg"]],
        "id long, total_deg long",
    )
    got = {r["id"]: r["total_deg"] for r in out.collect()}
    assert got[0] == 10 and all(got[i] == 1 for i in range(1, 11))


def test_parquet_roundtrip(tmp_path, two_cliques_bridge):
    """Serialization parity (quiver codecs → parquet round-trip,
    SURVEY.md §2.1): write V,E, read back, row sets identical."""
    vp, ep = str(tmp_path / "v.parquet"), str(tmp_path / "e.parquet")
    two_cliques_bridge.vertices.write.parquet(vp)
    two_cliques_bridge.edges.write.parquet(ep)
    spark = two_cliques_bridge.spark
    g2 = Graph(spark.read.parquet(vp), spark.read.parquet(ep))
    assert rows_set(g2.vertices) == rows_set(two_cliques_bridge.vertices)
    assert rows_set(g2.edges) == rows_set(two_cliques_bridge.edges)

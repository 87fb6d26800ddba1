"""Graph persistence round-trip (the codecs-parity surface
[pub: Verizon/quiver codecs/.../GraphCodecs.scala]): save→load
preserves content exactly (manifest hashes), and corruption is
detected at load."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from quiver_spark import graph_io, tpch_graphs as tg


def test_round_trip_exact(spark, tmp_path):
    g = tg.hierarchy_graph(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "g")
    manifest = graph_io.save_graph(g, path)
    assert manifest["n_vertices"] == g.count_nodes()
    assert manifest["n_edges"] == g.count_edges()

    g2 = graph_io.load_graph(spark, path, verify=True)
    assert g2.count_nodes() == g.count_nodes()
    assert g2.count_edges() == g.count_edges()
    # content equality, order-insensitive
    a = sorted(tuple(r) for r in g.edges.collect())
    b = sorted(tuple(r) for r in g2.edges.collect())
    assert a == b


def test_load_detects_corruption(spark, tmp_path):
    """Silent content drift (table rewritten after the manifest was
    published) must fail the hash check — a vanished part-file already
    fails loudly at the Spark read layer, so tamper content instead."""
    g = tg.hierarchy_graph(spark, "/root/testdata/sf0.001").labfilter(
        F.col("kind").isin("region", "nation")
    )
    path = str(tmp_path / "g")
    graph_io.save_graph(g, path)
    # tamper: rewrite the edge table with one row dropped, same schema
    e2 = spark.read.parquet(os.path.join(path, "edges"))
    e2 = e2.limit(e2.count() - 1)
    e2.write.mode("overwrite").parquet(str(tmp_path / "edges_tampered"))
    import shutil

    shutil.rmtree(os.path.join(path, "edges"))
    shutil.copytree(str(tmp_path / "edges_tampered"), os.path.join(path, "edges"))
    with pytest.raises(ValueError, match="manifest verification"):
        graph_io.load_graph(spark, path, verify=True)


def test_save_is_atomic_about_manifest(spark, tmp_path):
    g = tg.hierarchy_graph(spark, "/root/testdata/sf0.001").labfilter(F.col("kind") == "region")
    path = str(tmp_path / "g")
    graph_io.save_graph(g, path)
    assert os.path.exists(os.path.join(path, "_MANIFEST"))
    assert not os.path.exists(os.path.join(path, "_MANIFEST.tmp"))


def test_manifest_hash_is_multiset_sensitive(spark, tmp_path):
    # duplicating a row in PAIRS keeps a pure-xor fold unchanged — the
    # wrapping-sum component must still flag it (ADVICE graph_io.py:39)
    from quiver_spark.graph_io import _content_hash

    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(1, "x"), (1, "x"), (1, "x"), (2, "y")], "id long, v string")
    assert _content_hash(a) != _content_hash(b)
    # order/partitioning-insensitive on identical multisets
    assert _content_hash(a.repartition(7)) == _content_hash(a.coalesce(1))


def test_manifest_attests_persisted_bytes(spark, tmp_path):
    # the manifest must hash what landed on disk, not the input lineage
    import json

    from quiver_spark.graph import Graph
    from quiver_spark.graph_io import load_graph, save_graph

    v = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    e = spark.createDataFrame([(1, 2, "e")], "src long, dst long, etype string")
    path = str(tmp_path / "g")
    m = save_graph(Graph.mk_graph(v, e), path)
    with open(f"{path}/_MANIFEST") as f:
        on_disk = json.load(f)
    assert on_disk == m
    g2 = load_graph(spark, path, verify=True)
    assert g2.vertices.count() == 2 and g2.edges.count() == 1

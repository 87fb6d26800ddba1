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

"""TableIO format seam: the parquet branch is exercised for real; the
Iceberg branch's routing + fail-fast guard are tested without jars
(SURVEY.md §7 — no Iceberg in this sandbox)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quiver_spark.table_io import TableIO, _table_ident


def test_parquet_branch_round_trip(spark, tmp_path):
    io = TableIO(spark, "parquet")
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    io.write(df, str(tmp_path / "t"))
    back = io.read(str(tmp_path / "t"))
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in df.collect())


def test_iceberg_branch_fails_fast_without_catalog(spark):
    with pytest.raises(NotImplementedError, match="Iceberg catalog"):
        TableIO(spark, "iceberg", catalog="lake")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown table format"):
        TableIO(spark, "orc")


def test_table_ident_mapping():
    # full-path sanitization: same tail under different run dirs must
    # NOT collide on one Iceberg table (a second run would clobber the
    # first and resume could read another run's checkpoint state)
    a = _table_ident("lake", "/runs/x/state_k=00004")
    b = _table_ident("lake", "/runs/y/state_k=00004")
    assert a != b
    assert a.startswith("lake.") and "state_k_00004" in a
    # deterministic: the ident is a pure function of (catalog, path)
    assert a == _table_ident("lake", "/runs/x/state_k=00004/")


def test_graph_io_routes_through_seam(spark, tmp_path):
    """save_graph/load_graph call the seam for every table write+read."""
    from quiver_spark import graph_io
    from quiver_spark.graph import Graph

    calls = []

    class Spy(TableIO):
        def write(self, df, target, mode="overwrite"):
            calls.append(("w", target.rsplit("/", 1)[-1]))
            super().write(df, target, mode)

        def read(self, target):
            calls.append(("r", target.rsplit("/", 1)[-1]))
            return super().read(target)

    v = spark.createDataFrame([(1, "a")], "id long, name string")
    e = spark.createDataFrame([(1, 1, "x")], "src long, dst long, etype string")
    io = Spy(spark, "parquet")
    graph_io.save_graph(Graph.mk_graph(v, e), str(tmp_path / "g"), io=io)
    assert ("w", "vertices") in calls and ("w", "edges") in calls
    assert ("r", "vertices") in calls and ("r", "edges") in calls
    calls.clear()
    g = graph_io.load_graph(spark, str(tmp_path / "g"), io=io)
    assert ("r", "edges") in calls
    assert g.count_edges() == 1
    # iceberg requested without a catalog → seam construction fails fast
    with pytest.raises(NotImplementedError, match="Iceberg catalog"):
        graph_io.save_graph(Graph.mk_graph(v, e), str(tmp_path / "g2"), fmt="iceberg")


def test_superstep_checkpoints_route_through_seam(spark, tmp_path):
    from quiver_spark.superstep import SuperstepRunner

    writes = []

    class Spy(TableIO):
        def write(self, df, target, mode="overwrite"):
            writes.append(target.rsplit("/", 1)[-1])
            super().write(df, target, mode)

    runner = SuperstepRunner(
        spark, run_dir=str(tmp_path / "run"), checkpoint_every=1, table_io=Spy(spark, "parquet")
    )
    s0 = spark.createDataFrame([(0, 0.0)], "id long, x double")

    def step(state, k):
        return state.withColumn("x", F.col("x") + 1), 1.0

    res = runner.run(s0, step, tol=None, max_iters=2, resume=False)
    assert res.supersteps == 2
    assert "state_k=00000" in writes and "lineage_k=00000" in writes
    assert "state_k=00001" in writes and "lineage_k=00001" in writes

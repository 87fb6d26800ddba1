"""Ingest: determinism, mandated shape, sha256 invariant, multigraph
parallel edges, power-law skew presence (FIXTURES.md §A)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from quiver_spark import ingest as ing


@pytest.fixture(scope="module")
def repos(spark):
    df = ing.synthesize_repo_table(spark, n_files=800, n_repos=12, seed=42)
    df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def graph(repos):
    g = ing.ingest(repos)
    g.persist()
    g.count_nodes()
    yield g
    g.unpersist()


def test_shape_and_determinism(spark, repos):
    assert repos.columns == ["repo", "path", "commit", "lang", "content"]
    assert repos.count() == 800
    # regeneration at different partitioning → byte-identical rows
    again = ing.synthesize_repo_table(spark, n_files=800, n_repos=12, seed=42, num_partitions=3)
    sym_diff = repos.exceptAll(again).unionByName(again.exceptAll(repos))
    assert sym_diff.count() == 0
    # different seed → different corpus
    other = ing.synthesize_repo_table(spark, n_files=800, n_repos=12, seed=7)
    assert repos.exceptAll(other).count() > 0


def test_duplicate_commits_make_parallel_edges(repos, graph):
    # same (repo,path) under 2 commits exists…
    multi = repos.groupBy("repo", "path").count().filter(F.col("count") > 1)
    assert multi.count() > 0
    # …and yields parallel imports edges (same src,dst,etype, diff commit)
    par = (
        graph.edges.filter(F.col("etype") == "imports")
        .groupBy("src", "dst", "etype")
        .count()
        .filter(F.col("count") > 1)
    )
    assert par.count() > 0


def test_sha256_invariant(repos, graph):
    assert ing.verify_content_sha(repos, graph.vertices) == 0
    # and it actually detects corruption
    corrupted = graph.vertices.withColumn(
        "content_sha",
        F.when(F.col("content_sha").isNotNull(), F.lit("0" * 64)).otherwise(F.col("content_sha")),
    )
    assert ing.verify_content_sha(repos, corrupted) > 0
    # spot-check one row against hashlib directly
    row = repos.orderBy("repo", "path", "commit").limit(1).collect()[0]
    expect = hashlib.sha256(row["content"].encode()).hexdigest()
    got = (
        graph.vertices.filter((F.col("repo") == row["repo"]) & (F.col("path") == row["path"]))
        .collect()[0]["content_sha"]
    )
    # vertex carries the NEWEST commit's sha; equal if this file has 1 commit
    n_commits = repos.filter((F.col("repo") == row["repo"]) & (F.col("path") == row["path"])).count()
    if n_commits == 1:
        assert got == expect


def test_graph_structure(repos, graph):
    n_files = repos.select("repo", "path").dropDuplicates().count()
    file_vs = graph.vertices.filter(F.col("content_sha").isNotNull()).count()
    assert file_vs == n_files
    etypes = {r["etype"] for r in graph.edges.select("etype").dropDuplicates().collect()}
    assert etypes == {"contains", "imports"}
    # every import edge endpoint resolves (safe_mk_graph dropped rest)
    vids = graph.vertices.select("id")
    assert graph.edges.join(vids.withColumnRenamed("id", "dst"), "dst", "left_anti").count() == 0
    # contains edges form the dir tree: every file vertex has ≥1 parent
    files = graph.vertices.filter(F.col("content_sha").isNotNull()).select("id")
    contained = graph.edges.filter(F.col("etype") == "contains").select(F.col("dst").alias("id"))
    orphans = files.join(contained, "id", "left_anti").count()
    assert orphans == 0


def test_power_law_skew(graph):
    """Import in-degree must be heavily skewed (max ≫ median) — the
    fixture that makes salting meaningful (FIXTURES.md §A3)."""
    indeg = (
        graph.edges.filter(F.col("etype") == "imports")
        .groupBy("dst")
        .count()
    )
    stats = indeg.agg(F.max("count").alias("mx"), F.expr("percentile_approx(count, 0.5)").alias("med")).collect()[0]
    assert stats["mx"] >= 10 * stats["med"]


def test_import_extraction_jvm_matches_arrow_reference(spark, repos):
    """The codegen regexp_extract_all path (hot path since the round-4
    attribution run showed the Arrow IPC copy of content was half the
    engine's concurrency-scaling loss) must extract the exact same
    import list, in order, as the retired pandas-UDF reference —
    including rows with zero imports (empty array, not null)."""
    jvm = repos.select("repo", "path", "commit", ing._extract_imports_expr("content").alias("imps"))
    ref = repos.select("repo", "path", "commit", ing._extract_imports_arrow("content").alias("imps"))
    sym = jvm.exceptAll(ref).unionByName(ref.exceptAll(jvm))
    assert sym.count() == 0
    # non-degenerate fixture: some rows import, and empties are []
    n_with = jvm.filter(F.size("imps") > 0).count()
    assert 0 < n_with < repos.count()
    assert jvm.filter(F.col("imps").isNull()).count() == 0


def test_root_paths_and_null_content(spark):
    """Real-world repo tables (the mandated input shape) may contain
    root-level paths (no '/') and NULL content. Root files must not
    fabricate self-loop contains edges, empty-string dirs, or dir
    vertices whose id collides with the file's own id (the unguarded
    sequence(1, size-1) DESCENDS to [1, 0] for a one-part path); NULL
    content must extract [] imports like the Arrow reference's
    ``c or ""``."""
    rows = [
        ("repo_0001", "README.md", "c0", "md", None),
        ("repo_0001", "src/f1.py", "c1", "py", "import repo_0001/f2\nx"),
        ("repo_0001", "src/f2.py", "c2", "py", "y"),
    ]
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    g = ing.ingest(repos)
    v = g.vertices.collect()
    by_path = {r["path"]: r for r in v}
    # the root file vertex survives with its metadata intact
    assert by_path["README.md"]["lang"] == "md"
    # no empty-string dir vertex, no dir duplicating the root file
    assert "" not in by_path
    assert sum(1 for r in v if r["path"] == "README.md") == 1
    # exactly one dir vertex: src
    dirs = [r for r in v if r["content_sha"] is None and r["lang"] is None]
    assert [d["path"] for d in dirs] == ["src"]
    # no self-loop edges anywhere
    assert g.edges.filter(F.col("src") == F.col("dst")).count() == 0
    # NULL content row extracted [] imports (not NULL): slim is stable
    slim = ing.slim_scan(repos)
    nulls = slim.filter(F.col("path") == "README.md").collect()[0]
    assert nulls["imps"] == []
    # and the import from f1 to f2 resolved
    assert g.edges.filter(F.col("etype") == "imports").count() == 1


def test_synthesize_pandas_twin_matches_spark(spark):
    """The Spark-free generator twin (synthesize_repo_pandas) must be
    bit-identical to the mapInPandas path: the repo_* DuckDB value
    oracles materialize their input parquet through the twin, so any
    divergence would silently decouple the oracle's graph from the
    one the Spark queries ingest. Shared code makes this true by
    construction; this pins it against refactors."""
    import pandas as pd

    sdf = (
        ing.synthesize_repo_table(spark, n_files=400, n_repos=10, seed=7, num_partitions=8)
        .toPandas()
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    pdf = (
        ing.synthesize_repo_pandas(n_files=400, n_repos=10, seed=7)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sdf, pdf)

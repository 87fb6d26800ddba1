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

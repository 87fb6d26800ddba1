"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (synthesize repo table →
ingest link graph → PageRank to 1e-6 → top-20 joined with labels) on
sf0.001-sized input. ``queries()`` / ``oracle_sql()`` expose the
operator surface from SURVEY.md §2 for the DuckDB parity gate — see
quiver_spark/queries.py for the implementations and the oracle SQL
generators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001-scale input."""
    from quiver_spark import ingest as ing
    from quiver_spark.algorithms import pagerank

    repos = ing.synthesize_repo_table(spark, n_files=1000, n_repos=20, seed=42)
    g = ing.ingest(repos)
    res = pagerank(g, tol=1e-6, max_iters=50, strategy="auto")
    return (
        res.state.join(g.vertices, "id")
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
        .select("id", "repo", "path", "lang", "rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from quiver_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (where SQL-expressible)."""
    from quiver_spark.queries import (
        _REPO_ORACLE_SF_DIR,
        ORACLES,
        materialize_louvain_assignment,
        materialize_repo_table,
    )

    # the repo_* oracles read the deterministic synthetic repo table
    # from parquet, and louvain_parts reads the pure-pandas twin's
    # assignment; write both here (idempotent, Spark-free) so the SQL
    # is runnable even if DuckDB goes first
    materialize_repo_table(_REPO_ORACLE_SF_DIR)
    materialize_louvain_assignment(_REPO_ORACLE_SF_DIR)
    return dict(ORACLES)

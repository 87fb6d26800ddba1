"""Shared fixtures: one SparkSession per test run + the hand-built
property-test graphs from FIXTURES.md §C (re-encoding quiver's
ScalaCheck suite, SURVEY.md §5.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from quiver_spark.graph import Graph
from quiver_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark("quiver-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def build_graph(spark, vertices, edges, vschema="id long, name string", eschema="src long, dst long, etype string"):
    V = spark.createDataFrame(vertices, vschema)
    E = spark.createDataFrame(edges, eschema)
    return Graph.mk_graph(V, E)


@pytest.fixture(scope="session")
def k3(spark) -> Graph:
    """Complete directed triangle (both directions) on {0,1,2}."""
    vs = [(i, f"v{i}") for i in range(3)]
    es = [(a, b, "e") for a in range(3) for b in range(3) if a != b]
    return build_graph(spark, vs, es)


@pytest.fixture(scope="session")
def k4(spark) -> Graph:
    vs = [(i, f"v{i}") for i in range(4)]
    es = [(a, b, "e") for a in range(4) for b in range(4) if a != b]
    return build_graph(spark, vs, es)


@pytest.fixture(scope="session")
def star10(spark) -> Graph:
    """Hub 0 → leaves 1..10."""
    vs = [(i, f"v{i}") for i in range(11)]
    es = [(0, i, "e") for i in range(1, 11)]
    return build_graph(spark, vs, es)


@pytest.fixture(scope="session")
def chain5(spark) -> Graph:
    """0→1→2→3→4."""
    vs = [(i, f"v{i}") for i in range(5)]
    es = [(i, i + 1, "e") for i in range(4)]
    return build_graph(spark, vs, es)


@pytest.fixture(scope="session")
def multi_edges(spark) -> Graph:
    """a→b with labels x and y, (a,b,x) inserted twice: Set[B] dedup
    must keep exactly 2 edges (FIXTURES.md §C multi_edges)."""
    vs = [(0, "a"), (1, "b")]
    es = [(0, 1, "x"), (0, 1, "x"), (0, 1, "y")]
    return build_graph(spark, vs, es)


@pytest.fixture(scope="session")
def planted_cc(spark) -> Graph:
    """3 undirected components: sizes 5/3/2 with min ids 0/100/200."""
    vs = [(i, f"v{i}") for i in [0, 1, 2, 3, 4, 100, 101, 102, 200, 201]]
    es = (
        [(0, 1, "e"), (1, 2, "e"), (2, 3, "e"), (3, 4, "e"), (4, 0, "e")]
        + [(100, 101, "e"), (101, 102, "e")]
        + [(200, 201, "e")]
    )
    return build_graph(spark, vs, es)


@pytest.fixture(scope="session")
def two_cliques_bridge(spark) -> Graph:
    """Two K4s (ids 0-3 and 10-13) joined by one bridge edge 3→10."""
    vs = [(i, f"v{i}") for i in [0, 1, 2, 3, 10, 11, 12, 13]]
    es = [(a, b, "e") for a in [0, 1, 2, 3] for b in [0, 1, 2, 3] if a != b]
    es += [(a, b, "e") for a in [10, 11, 12, 13] for b in [10, 11, 12, 13] if a != b]
    es += [(3, 10, "bridge")]
    return build_graph(spark, vs, es)


@pytest.fixture(scope="session")
def dangling_dag(spark) -> Graph:
    """DAG with sinks (PageRank dangling-mass fixture)."""
    vs = [(i, f"v{i}") for i in range(6)]
    es = [(0, 1, "e"), (0, 2, "e"), (1, 3, "e"), (2, 3, "e"), (2, 4, "e"), (3, 5, "e")]
    return build_graph(spark, vs, es)


@pytest.fixture(scope="session")
def planted_labels(spark) -> Graph:
    """Two dense clusters with distinct langs + 1 cross edge."""
    vs_schema = "id long, lang string"
    vs = [(i, "py") for i in range(5)] + [(i, "go") for i in range(10, 15)]
    es = [(a, b, "e") for a in range(5) for b in range(5) if a != b]
    es += [(a, b, "e") for a in range(10, 15) for b in range(10, 15) if a != b]
    es += [(4, 10, "e")]
    V = spark.createDataFrame(vs, vs_schema)
    E = spark.createDataFrame(es, "src long, dst long, etype string")
    return Graph.mk_graph(V, E)


def rows_set(df, float_cols=()):
    """Order-insensitive row set for equality asserts; floats rounded."""
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        for c in float_cols:
            d[c] = round(d[c], 9)
        out.append(tuple(sorted(d.items())))
    return sorted(out)

"""Secondary graphs derived from the driver testdata tables.

The driver's correctness gate compares Spark queries against DuckDB
SQL over the same parquet (``__spark_entry__.py``), and DuckDB only
has the TPC-H-ish views — so the oracle-checkable graph surface is
built here from those tables (SURVEY.md §5.2 layer 2).

Vertex-id namespacing (stable across Spark and the SQL oracles):

    region    1_000_000 + r_regionkey
    nation    2_000_000 + n_nationkey
    customer  3_000_000 + c_custkey
    supplier  4_000_000 + s_suppkey
    order     5_000_000 + o_orderkey

Edges point child→parent (customer→nation→region …): the natural
"link" direction, making regions the PageRank sinks and giving the
reverse traversal (region downward) a real multi-hop frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.graph import Graph

R, N, C, S, O = 1_000_000, 2_000_000, 3_000_000, 4_000_000, 5_000_000


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def hierarchy_graph(spark: SparkSession, sf_dir: str, with_orders: bool = False) -> Graph:
    """customer→nation→region (+supplier→nation, optionally
    order→customer), labeled vertices, etype-labeled edges."""
    region = _read(spark, sf_dir, "region").select(
        (F.lit(R) + F.col("r_regionkey")).cast("long").alias("id"), F.col("r_name").alias("name"), F.lit("region").alias("kind")
    )
    nation = _read(spark, sf_dir, "nation")
    nation_v = nation.select(
        (F.lit(N) + F.col("n_nationkey")).cast("long").alias("id"), F.col("n_name").alias("name"), F.lit("nation").alias("kind")
    )
    customer = _read(spark, sf_dir, "customer")
    customer_v = customer.select(
        (F.lit(C) + F.col("c_custkey")).cast("long").alias("id"), F.col("c_mktsegment").alias("name"), F.lit("customer").alias("kind")
    )
    supplier = _read(spark, sf_dir, "supplier")
    supplier_v = supplier.select(
        (F.lit(S) + F.col("s_suppkey")).cast("long").alias("id"), F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    edges = (
        nation.select(
            (F.lit(N) + F.col("n_nationkey")).cast("long").alias("src"),
            (F.lit(R) + F.col("n_regionkey")).cast("long").alias("dst"),
            F.lit("in_region").alias("etype"),
        )
        .unionByName(
            customer.select(
                (F.lit(C) + F.col("c_custkey")).cast("long").alias("src"),
                (F.lit(N) + F.col("c_nationkey")).cast("long").alias("dst"),
                F.lit("in_nation").alias("etype"),
            )
        )
        .unionByName(
            supplier.select(
                (F.lit(S) + F.col("s_suppkey")).cast("long").alias("src"),
                (F.lit(N) + F.col("s_nationkey")).cast("long").alias("dst"),
                F.lit("in_nation").alias("etype"),
            )
        )
    )
    vertices = region.unionByName(nation_v).unionByName(customer_v).unionByName(supplier_v)
    if with_orders:
        orders = _read(spark, sf_dir, "orders")
        vertices = vertices.unionByName(
            orders.select(
                (F.lit(O) + F.col("o_orderkey")).cast("long").alias("id"),
                F.col("o_orderstatus").alias("name"),
                F.lit("order").alias("kind"),
            )
        )
        edges = edges.unionByName(
            orders.select(
                (F.lit(O) + F.col("o_orderkey")).cast("long").alias("src"),
                (F.lit(C) + F.col("o_custkey")).cast("long").alias("dst"),
                F.lit("placed_by").alias("etype"),
            )
        )
    return Graph(vertices, edges)


def admin_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Small region+nation+supplier graph — the CC oracle target
    (closure stays tiny in DuckDB's recursive CTE)."""
    g = hierarchy_graph(spark, sf_dir)
    return g.labfilter(F.col("kind").isin("region", "nation", "supplier"))


def supplier_copart_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Suppliers sharing a part (from lineitem) — undirected simple
    edges canonicalized s1<s2; triangle-rich."""
    li = _read(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    a = li.select(F.col("l_partkey").alias("p"), (F.lit(S) + F.col("l_suppkey")).cast("long").alias("s1")).dropDuplicates()
    b = a.select(F.col("p"), F.col("s1").alias("s2"))
    pairs = (
        a.join(b, "p")
        .filter(F.col("s1") < F.col("s2"))
        .select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .dropDuplicates()
        .withColumn("etype", F.lit("co_part"))
    )
    vertices = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    return Graph(vertices, pairs)


def weighted_hierarchy_edges(spark: SparkSession, sf_dir: str) -> Graph:
    """Hierarchy graph with a deterministic synthetic weight
    ``(src + dst) % 7 + 1`` — Bellman-Ford oracle target (DAG, so the
    recursive SQL terminates)."""
    g = hierarchy_graph(spark, sf_dir)
    e = g.edges.withColumn("weight", ((F.col("src") + F.col("dst")) % 7 + 1).cast("double"))
    return Graph(g.vertices, e)

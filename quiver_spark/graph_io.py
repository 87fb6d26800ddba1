"""Graph persistence seam — the engine's stand-in for quiver's scodec
codecs module [pub: Verizon/quiver codecs/src/main/scala/quiver/codecs/
GraphCodecs.scala] and for Iceberg tables on a real cluster.

Layout of a saved graph::

    <path>/vertices/   parquet
    <path>/edges/      parquet
    <path>/_MANIFEST   json: schemas, row counts, order-insensitive
                       content hashes, format, writer version

The manifest hash (xxhash64 of every column cast to string, bit_xor
folded — order-insensitive, partitioning-independent) is verified on
load, so a corrupted or partially-written table fails fast: the moral
equivalent of the codecs round-trip property, and the same audit
discipline the superstep runtime applies to its checkpoints.

``fmt="iceberg"`` routes writes through ``writeTo(table)`` when an
Iceberg catalog is configured (not in this sandbox — SURVEY.md §7
caveat); the default is plain Parquet directories.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.graph import Graph

_VERSION = 1


def _content_hash(df: DataFrame) -> int:
    """Order-insensitive 64-bit content hash (bit_xor of row hashes)."""
    h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    out = df.select(h.alias("h")).agg(F.expr("bit_xor(h)").alias("x")).collect()[0]["x"]
    return int(out) if out is not None else 0


def save_graph(graph: Graph, path: str, fmt: str = "parquet") -> dict:
    """Write (vertices, edges, manifest); returns the manifest."""
    if fmt != "parquet":
        raise NotImplementedError("only parquet in this sandbox (Iceberg seam: SURVEY.md §7)")
    graph.vertices.write.mode("overwrite").parquet(os.path.join(path, "vertices"))
    graph.edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    manifest = {
        "version": _VERSION,
        "format": fmt,
        "vertex_schema": graph.vertices.schema.json(),
        "edge_schema": graph.edges.schema.json(),
        "n_vertices": graph.vertices.count(),
        "n_edges": graph.edges.count(),
        "vertex_hash": _content_hash(graph.vertices),
        "edge_hash": _content_hash(graph.edges),
    }
    tmp = os.path.join(path, "_MANIFEST.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "_MANIFEST"))  # atomic publish
    return manifest


def load_graph(spark: SparkSession, path: str, verify: bool = True) -> Graph:
    """Read a saved graph; ``verify=True`` re-hashes both tables
    against the manifest (codecs round-trip property)."""
    with open(os.path.join(path, "_MANIFEST")) as f:
        manifest = json.load(f)
    v = spark.read.parquet(os.path.join(path, "vertices"))
    e = spark.read.parquet(os.path.join(path, "edges"))
    if verify:
        problems = []
        if v.count() != manifest["n_vertices"]:
            problems.append("vertex row count")
        if e.count() != manifest["n_edges"]:
            problems.append("edge row count")
        if _content_hash(v) != manifest["vertex_hash"]:
            problems.append("vertex content hash")
        if _content_hash(e) != manifest["edge_hash"]:
            problems.append("edge content hash")
        if problems:
            raise ValueError(f"graph at {path} fails manifest verification: {', '.join(problems)}")
    return Graph(v, e)

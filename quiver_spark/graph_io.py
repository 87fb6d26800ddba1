"""Graph persistence seam — the engine's stand-in for quiver's scodec
codecs module [pub: Verizon/quiver codecs/src/main/scala/quiver/codecs/
GraphCodecs.scala] and for Iceberg tables on a real cluster.

Layout of a saved graph::

    <path>/vertices/   parquet
    <path>/edges/      parquet
    <path>/_MANIFEST   json: schemas, row counts, order-insensitive
                       content hashes, format, writer version

The manifest hash (xxhash64 of every column cast to string, folded
with BOTH a wrapping sum mod 2^64 and a bit_xor — order-insensitive,
partitioning-independent, and multiset-sensitive: a pure xor is blind
to rows duplicated in pairs, the sum is not) is computed by reading
the *written* parquet back, so the manifest attests exactly the
persisted bytes (not the input lineage, which could be
non-deterministic). It is verified on load, so a corrupted or
partially-written table fails fast: the moral equivalent of the
codecs round-trip property, and the same audit discipline the
superstep runtime applies to its checkpoints.

``fmt="iceberg"`` routes writes through the :class:`~quiver_spark.
table_io.TableIO` ``writeTo(table)`` branch when an Iceberg catalog is
configured (not in this sandbox — the seam fails fast with a clear
message; SURVEY.md §7 caveat); the default is Parquet directories.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.graph import Graph

_VERSION = 2
_2_64 = 1 << 64


def _content_hash(df: DataFrame) -> str:
    """Order-insensitive, multiset-sensitive content hash.

    ``"<sum mod 2^64 hex>:<xor hex>"`` over per-row xxhash64. The
    wrapping sum distinguishes row multiplicities that a pure xor
    cancels (two identical rows xor to 0); the xor is kept as a
    second independent fold. The sum runs in decimal(38,0) so ANSI
    long overflow can't fire, then wraps mod 2^64 on the driver.
    """
    h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    row = (
        df.select(h.alias("h"))
        .agg(
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.expr("bit_xor(h)").alias("x"),
        )
        .collect()[0]
    )
    s = int(row["s"]) % _2_64 if row["s"] is not None else 0
    x = int(row["x"]) % _2_64 if row["x"] is not None else 0
    return f"{s:016x}:{x:016x}"


def save_graph(graph: Graph, path: str, fmt: str = "parquet", io: "TableIO | None" = None) -> dict:
    """Write (vertices, edges, manifest); returns the manifest.

    Counts and content hashes are computed from the written tables
    *after* the write (re-read through the same seam), so the manifest
    attests the persisted bytes even when the input lineage is
    non-deterministic. ``io`` overrides the format seam (tests inject
    fakes; a cluster passes ``TableIO(spark, "iceberg")``).
    """
    from quiver_spark.table_io import TableIO

    spark = graph.vertices.sparkSession
    io = io or TableIO(spark, fmt)  # iceberg without a catalog fails fast here
    io.write(graph.vertices, os.path.join(path, "vertices"))
    io.write(graph.edges, os.path.join(path, "edges"))
    v_disk = io.read(os.path.join(path, "vertices"))
    e_disk = io.read(os.path.join(path, "edges"))
    manifest = {
        "version": _VERSION,
        "format": io.fmt,
        "vertex_schema": v_disk.schema.json(),
        "edge_schema": e_disk.schema.json(),
        "n_vertices": v_disk.count(),
        "n_edges": e_disk.count(),
        "vertex_hash": _content_hash(v_disk),
        "edge_hash": _content_hash(e_disk),
    }
    tmp = os.path.join(path, "_MANIFEST.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "_MANIFEST"))  # atomic publish
    return manifest


def load_graph(spark: SparkSession, path: str, verify: bool = True, io: "TableIO | None" = None) -> Graph:
    """Read a saved graph; ``verify=True`` re-hashes both tables
    against the manifest (codecs round-trip property). The manifest's
    recorded format selects the read branch unless ``io`` overrides."""
    from quiver_spark.table_io import TableIO

    with open(os.path.join(path, "_MANIFEST")) as f:
        manifest = json.load(f)
    io = io or TableIO(spark, manifest.get("format", "parquet"))
    v = io.read(os.path.join(path, "vertices"))
    e = io.read(os.path.join(path, "edges"))
    if verify:
        version = manifest.get("version")
        if version != _VERSION:
            # v1 manifests hold a plain-int xor-only hash; verifying it
            # against the v2 "sum:xor" string would fail with a
            # misleading "content hash" mismatch — fail with the
            # actionable cause instead (verify=False still loads)
            raise ValueError(
                f"graph at {path} was written by manifest version {version}; "
                f"this reader verifies version {_VERSION} only — re-save with "
                "the current writer (save_graph) or load with verify=False"
            )
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

"""TableIO: the durable-table format seam (parquet directories now,
Iceberg ``writeTo`` on a real cluster).

The north rule stores the edge table and every superstep checkpoint in
Iceberg. This sandbox has no Iceberg jars, so the seam is REAL CODE
with two branches selected by config — not a docstring promise:

- ``fmt="parquet"`` (default): plain parquet directories, exercised by
  the whole test suite.
- ``fmt="iceberg"``: ``df.writeTo(catalog.namespace.table)`` /
  ``spark.table(...)`` — import-guarded: constructing the IO object
  verifies an Iceberg catalog is actually configured on the session
  and fails fast with a clear message otherwise, so the branch is
  testable (routing + guard) without the jars.

Used by :mod:`quiver_spark.graph_io` (graph persistence) and
:class:`quiver_spark.superstep.SuperstepRunner` (durable checkpoints +
lineage tables).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession


def _table_ident(catalog: str, target: str) -> str:
    """parquet targets are paths; iceberg targets are table idents —
    derive one from the FULL sanitized path plus a short stable digest
    of it, so distinct graphs / run dirs never collide on one table
    (``/runs/a/state_k=00004`` and ``/runs/b/state_k=00004`` must be
    different tables: a tail-only ident would let a second run
    silently clobber the first and resume from another run's state).
    The tail is kept readable; the digest guarantees uniqueness within
    identifier-length limits."""
    norm = target.rstrip("/")
    tail = re.sub(r"[^A-Za-z0-9_]", "_", norm).strip("_")[-80:]
    digest = hashlib.sha256(norm.encode()).hexdigest()[:8]
    return f"{catalog}.{tail}_{digest}"


class TableIO:
    """Write/read durable tables through the configured format branch."""

    def __init__(self, spark: SparkSession, fmt: str = "parquet", catalog: str | None = None):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(f"unknown table format: {fmt!r}")
        self.spark = spark
        self.fmt = fmt
        self.catalog = catalog
        if fmt == "iceberg":
            cat = catalog or spark.conf.get("spark.sql.defaultCatalog", None)
            impl = spark.conf.get(f"spark.sql.catalog.{cat}", None) if cat else None
            if not impl:
                raise NotImplementedError(
                    "TableIO(fmt='iceberg') needs an Iceberg catalog on the session "
                    f"(spark.sql.catalog.{cat or '<name>'} is unset — no Iceberg jars "
                    "in this sandbox; SURVEY.md §7). The parquet branch is the "
                    "sandbox-exercised path."
                )
            self.catalog = cat

    def write(
        self,
        df: DataFrame,
        target: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        if self.fmt == "parquet":
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(target)
        else:
            writer = df.writeTo(_table_ident(self.catalog, target))
            if partition_by and mode == "overwrite":
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()

    def read(self, target: str) -> DataFrame:
        if self.fmt == "parquet":
            return self.spark.read.parquet(target)
        return self.spark.table(_table_ident(self.catalog, target))

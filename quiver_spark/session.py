"""SparkSession factory with the engine's standard configuration.

Tuned for local[N] testing but every knob is the one you would set on
a real multi-executor cluster: AQE on (dynamic join switching +
skew-join splitting is the first line of defense for power-law degree
skew), Arrow on (all Python kernels are pandas/Arrow vectorized —
no per-row Python UDFs anywhere in this engine), and a shuffle
partition count sized to the parallelism level rather than the 200
default (at 100 TB you would size this to cluster cores × 2-3 and let
AQE coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "quiver_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, falling
    back to all cores). ``shuffle_partitions`` defaults to 2x the
    local parallelism — small enough that sf0.01 tests don't drown in
    empty-partition overhead, proportional to cores so the same code
    scales on a real cluster.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # parse local[N] for partition sizing; fall back to cpus
        n = cpus
        if master.startswith("local[") and master[6:-1] not in ("*", ""):
            try:
                n = int(master[6:-1])
            except ValueError:
                n = cpus
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # NOTE measured and rejected: requireAllClusterKeysForCoPartition=
        # false would elide the mirror join-back's vertex-sized exchange
        # (subset co-partitioning on block), but fusing the whole
        # superstep into one stage made bhj ~1.7x slower and noisier at
        # local[16] on 80M edges (3.7-7s/step vs steady 2.3-2.8s with
        # the default two small exchanges). The edge table never
        # shuffles either way — test_plans pins that invariant.
        # iterative jobs re-reference the same frames many times; keep
        # broadcast threshold default (10 MB) but make timeouts lax
        .config("spark.sql.broadcastTimeout", "600")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

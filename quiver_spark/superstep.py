"""Superstep runtime: the engine's iteration primitive.

quiver's per-vertex recomputation is ``GDecomp.extend`` — a comonadic
map that relabels every vertex from the graph focused at that vertex
[pub: Verizon/quiver core/src/main/scala/quiver/Decomp.scala#extend].
Distributed, that is a Pregel-style superstep: a *state* DataFrame
``(id, ...)`` is rewritten each round from messages joined out of the
edge table. PageRank / connected components / label propagation all
run on this runner.

The runner owns the three scale problems an iterative DataFrame
program has (SURVEY.md §4.3):

1. **Lineage bloat** — 100+ supersteps of joins build an
   exponentially deep plan. Every superstep's output is
   ``localCheckpoint``-ed (plan truncated, partitions pinned); every
   ``checkpoint_every``-th superstep is *durably* written to Parquet.
2. **Resumability** — each durable checkpoint writes the state table,
   a per-partition lineage table (partition id, row count, xxhash64
   content sum) and a metrics row, then an atomic ``_DONE`` marker.
   ``run(resume=True)`` restarts from the newest marked superstep.
3. **Convergence metrics** — the per-superstep metric (rows changed /
   max delta / wall ms) is appended to ``metrics.jsonl`` in the run
   dir — the evidence table the bench harness reads.

On a real cluster the durable writes target an Iceberg table; this
sandbox has no Iceberg jars, so the ``TableIO`` seam writes Parquet
directories with the same layout (SURVEY.md §7 caveat).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def truncated_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` that also drops the carried plan statistics.

    ``Dataset.localCheckpoint`` embeds the optimized plan's
    ``Statistics`` into the resulting ``LogicalRDD`` (Spark
    ``Dataset.checkpoint`` passes ``optimizedPlan.stats`` through).
    Catalyst's size-only estimator multiplies child ``sizeInBytes``
    across every join, so a superstep that references its state frame
    more than once — smj PageRank's messages + join-back, HITS's
    ``auth ⋈ hub`` — makes the carried BigInteger's BIT COUNT double
    (or worse) per superstep: planning cost is O(2^k) supersteps and a
    long tolerance run kills the driver with an OutOfMemoryError
    inside ``BigInteger.multiply`` (measured: HITS on an 8-vertex
    fixture dies ≈ superstep 30; probe: bits 85 → 225 → 506 → 1068 →
    2191 → 4438 → 8933 across 7 supersteps).

    Fix: let ``localCheckpoint`` do the safe part (eager row-copy +
    partition pinning), then rewrap its materialized RDD via
    ``SparkSession.internalCreateDataFrame`` — the new ``LogicalRDD``
    has no origin stats and reports the constant
    ``spark.sql.defaultSizeInBytes``. Costs: (a) the rewrap loses
    ``outputPartitioning`` metadata, so a next-superstep join on the
    same key re-shuffles the vertex-sized state instead of reusing the
    checkpointed layout — bounded and AQE-visible, vs unbounded
    planning growth; (b) stats-based auto-broadcast of the state is
    off — every mirror tier already broadcasts explicitly via
    ``F.broadcast``, and AQE still converts at runtime from observed
    shuffle sizes.
    """
    ck = df.localCheckpoint()
    spark = df.sparkSession
    jrdd = ck._jdf.queryExecution().toRdd()  # noqa: SLF001
    jschema = spark._jvm.org.apache.spark.sql.types.DataType.fromJson(df.schema.json())
    jdf = spark._jsparkSession.internalCreateDataFrame(jrdd, jschema, False)  # noqa: SLF001
    return DataFrame(jdf, spark)


@dataclass
class SuperstepResult:
    state: DataFrame
    supersteps: int
    metrics: list[dict] = field(default_factory=list)
    resumed_from: int = -1

    @property
    def converged(self) -> bool:
        return bool(self.metrics and self.metrics[-1].get("converged"))


class SuperstepRunner:
    """Drives ``state_{k+1} = step_fn(state_k, k)`` to convergence.

    ``step_fn(state, k) -> (new_state, delta)`` where ``delta`` is the
    convergence measure (None = not measured this round). Iteration
    stops when ``delta <= tol`` or ``max_iters`` is reached.

    ``run_dir=None`` keeps everything in memory (localCheckpoint
    only); with a directory, durable checkpoints + lineage + metrics
    are written and ``resume=True`` picks up mid-run.
    """

    def __init__(
        self,
        spark: SparkSession,
        run_dir: str | None = None,
        run_id: str | None = None,
        checkpoint_every: int = 5,
        table_io=None,
    ):
        from quiver_spark.table_io import TableIO

        self.spark = spark
        self.run_dir = run_dir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.checkpoint_every = max(1, checkpoint_every)
        # durable state/lineage writes route through the format seam:
        # parquet here, TableIO(spark, "iceberg") on a real cluster
        self.table_io = table_io or TableIO(spark, "parquet")
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)

    # ------------------------------------------------------------------
    # durable checkpoint layout
    # ------------------------------------------------------------------
    def _state_dir(self, k: int) -> str:
        return os.path.join(self.run_dir, f"state_k={k:05d}")

    def _marker(self, k: int) -> str:
        return os.path.join(self.run_dir, f"_DONE_k={k:05d}")

    def _metrics_path(self) -> str:
        return os.path.join(self.run_dir, "metrics.jsonl")

    def last_completed(self) -> int:
        """Newest superstep with an atomic completion marker, or -1."""
        if not self.run_dir or not os.path.isdir(self.run_dir):
            return -1
        ks = [
            int(f.split("=")[1])
            for f in os.listdir(self.run_dir)
            if f.startswith("_DONE_k=")
        ]
        return max(ks) if ks else -1

    def _write_checkpoint(self, state: DataFrame, k: int, extra: dict) -> None:
        sdir = self._state_dir(k)
        self.table_io.write(state, sdir)
        # per-partition lineage: deterministic content hash per partition
        # bit_xor fold: order-insensitive, overflow-free under ANSI mode
        hash_cols = F.xxhash64(*[F.col(c).cast("string") for c in state.columns])
        lineage = (
            state.withColumn("_pid", F.spark_partition_id())
            .withColumn("_h", hash_cols)
            .groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("rows"), F.expr("bit_xor(_h)").alias("content_hash_sum"))
        )
        self.table_io.write(lineage, os.path.join(self.run_dir, f"lineage_k={k:05d}"))
        with open(self._marker(k), "w") as f:
            json.dump({"run_id": self.run_id, "superstep": k, **extra}, f)

    def _append_metric(self, m: dict) -> None:
        if self.run_dir:
            with open(self._metrics_path(), "a") as f:
                f.write(json.dumps(m) + "\n")

    # ------------------------------------------------------------------
    def _job_path(self) -> str:
        return os.path.join(self.run_dir, "job.json")

    def _check_resume_fingerprint(self, state0: DataFrame, job_key: str | None) -> None:
        """Refuse to resume a run_dir that belongs to a different job.

        ``last_completed()`` matches any ``_DONE_k=`` marker, so without
        this check reusing one run_dir across algorithms (or across
        parameterizations of the same algorithm) silently warm-starts
        from FOREIGN state — e.g. connected_components reading a
        pagerank checkpoint as its state0 and producing garbage.
        ``job.json`` records the job key + state schema at fresh-start
        time; a resume must match both. Run dirs written before
        job.json existed fall back to a schema-only check.
        """
        fp = {"job_key": job_key, "state_schema": state0.schema.simpleString()}
        recorded = None
        if os.path.exists(self._job_path()):
            with open(self._job_path()) as f:
                recorded = json.load(f)
        if recorded is None:
            return
        schema_ok = recorded.get("state_schema") == fp["state_schema"]
        key_ok = (
            recorded.get("job_key") is None
            or job_key is None
            or recorded["job_key"] == job_key
        )
        if not (schema_ok and key_ok):
            raise ValueError(
                f"run_dir {self.run_dir!r} holds checkpoints for a different job: "
                f"recorded {recorded}, requested {fp}. Use a fresh run_dir, or "
                f"resume=False to restart in place."
            )

    def run(
        self,
        state0: DataFrame,
        step_fn: Callable[[DataFrame, int], tuple[DataFrame, float | None]],
        tol: float | None = None,
        max_iters: int = 100,
        resume: bool = True,
        job_key: str | None = None,
    ) -> SuperstepResult:
        start_k = 0
        state = state0
        resumed_from = -1
        if self.run_dir and resume:
            last = self.last_completed()
            if last >= 0:
                self._check_resume_fingerprint(state0, job_key)
                state = self.table_io.read(self._state_dir(last))
                start_k = last + 1
                resumed_from = last
        if self.run_dir and resumed_from < 0:
            # fresh start in this dir: clear stale completion markers so a
            # later resume can't stitch this run's early checkpoints to a
            # previous run's later ones, then record this job's identity
            for f in os.listdir(self.run_dir):
                if f.startswith("_DONE_k="):
                    os.remove(os.path.join(self.run_dir, f))
            with open(self._job_path(), "w") as f:
                json.dump(
                    {"job_key": job_key, "state_schema": state0.schema.simpleString()}, f
                )

        state = truncated_checkpoint(state)
        metrics: list[dict] = []
        k = start_k - 1
        for k in range(start_k, max_iters):
            t0 = time.monotonic()
            new_state, delta = step_fn(state, k)
            # materialize + truncate lineage (unless the step already
            # checkpointed — e.g. to compute its convergence delta from
            # the cached result instead of recomputing the DAG)
            if not getattr(new_state, "_qs_checkpointed", False):
                new_state = truncated_checkpoint(new_state)
            wall_ms = (time.monotonic() - t0) * 1000
            converged = tol is not None and delta is not None and delta <= tol
            m = {
                "run_id": self.run_id,
                "superstep": k,
                "delta": delta,
                "wall_ms": round(wall_ms, 1),
                "converged": converged,
            }
            metrics.append(m)
            self._append_metric(m)
            durable = self.run_dir and (converged or k % self.checkpoint_every == self.checkpoint_every - 1)
            if durable:
                self._write_checkpoint(new_state, k, {"delta": delta})
            state = new_state
            if converged:
                break
        return SuperstepResult(state=state, supersteps=k - start_k + 1, metrics=metrics, resumed_from=resumed_from)

"""HITS (hubs & authorities) over the edge table.

Beyond the SURVEY §2 inventory (the reference's public surface has no
eigenvector scoring at all — PageRank here plays that role); HITS is
the second classic link-analysis operator a quiver user migrating a
link-graph workload would reach for, and it drops onto the same
superstep machinery PageRank already runs on.

One HITS superstep is the full Kleinberg update with L2
normalization:

    auth'(v) = sum over in-edges  (u,v) of hub(u);  auth = auth'/||auth'||2
    hub'(v)  = sum over out-edges (v,w) of auth(w); hub  = hub'/||hub'||2

Parallel edges count individually (degree semantics, same as
PageRank's out-degree weights). Init hub = 1.0 everywhere.

Tiers (shared decision thresholds with the other iterative
flagships, quiver_spark.tiering): ``local`` — the guarded
driver-numpy tiny tier (one Arrow collect, supersteps are two
gathers + two segment sums); ``smj`` — co-partitioned joins, one
lazy DAG per superstep with both L2 norms as in-DAG broadcast 1-row
frames (no driver action inside a superstep; the only per-step
actions are the runner's localCheckpoint materialization and the
optional convergence read). ``auto`` routes every
larger-than-local graph to smj: the smj step never re-shuffles the
persisted edge table (co-partitioned joins + map-side-combined
aggregates), so it is a legitimate any-size plan; the known
optimization at mirror size is a packed-CSR twin of pagerank's
csr_packed with two broadcast vectors (same problem shape), not
built here.

Oracle: fixed ``num_iters`` runs bit-comparably against an unrolled
DuckDB CTE chain (queries.py ``hits_hierarchy``) — same fp op order:
raw sums, one sqrt-of-sum-of-squares per vector, one division.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepResult, SuperstepRunner, truncated_checkpoint


def _norm_row(df: DataFrame, col: str) -> DataFrame:
    """1-row frame ``(_n)`` = L2 norm of ``col``, 1.0 when zero (the
    degenerate edgeless graph keeps its zeros instead of NaN-ing)."""
    n = F.sqrt(F.sum(F.col(col) * F.col(col)))
    return df.agg(F.when(n == 0.0, F.lit(1.0)).otherwise(n).alias("_n"))


def hits(
    graph: Graph,
    num_iters: int | None = 5,
    tol: float | None = None,
    max_iters: int = 100,
    strategy: str = "auto",
    runner: SuperstepRunner | None = None,
) -> SuperstepResult:
    """Returns a SuperstepResult whose state is ``(id, auth, hub)``.

    ``num_iters`` set → exactly that many supersteps (oracle mode, no
    convergence action). ``tol`` set (and num_iters None) → iterate
    until max |Δauth| + max |Δhub| ≤ tol.
    """
    if (num_iters is None) == (tol is None):
        raise ValueError("exactly one of num_iters / tol must be set")
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)

    if strategy == "auto":
        from quiver_spark import tiering

        if (
            runner.run_dir is None
            and graph.edges.count() <= tiering.local_max_edges(spark)
        ):
            strategy = "local"
        else:
            strategy = "smj"

    if strategy == "local":
        if runner.run_dir is not None:
            raise ValueError(
                "strategy='local' keeps state in the driver; durable "
                "checkpoint/resume (run_dir) needs a distributed strategy"
            )
        return _hits_local(graph, num_iters, tol, max_iters)
    if strategy != "smj":
        raise ValueError(f"unknown hits strategy {strategy!r}")

    edges = graph.edges.select("src", "dst").persist()
    edges.count()
    v = graph.vertices.select("id")

    state0 = v.select("id", F.lit(0.0).alias("auth"), F.lit(1.0).alias("hub"))

    def step(state: DataFrame, k: int) -> tuple[DataFrame, float | None]:
        a_raw = (
            v.join(
                edges.join(state.select(F.col("id").alias("src"), "hub"), "src")
                .groupBy("dst")
                .agg(F.sum("hub").alias("_a"))
                .withColumnRenamed("dst", "id"),
                "id",
                "left",
            )
            .fillna(0.0, ["_a"])
        )
        auth = a_raw.crossJoin(F.broadcast(_norm_row(a_raw, "_a"))).select(
            "id", (F.col("_a") / F.col("_n")).alias("auth")
        )
        h_raw = (
            v.join(
                edges.join(auth.select(F.col("id").alias("dst"), "auth"), "dst")
                .groupBy("src")
                .agg(F.sum("auth").alias("_h"))
                .withColumnRenamed("src", "id"),
                "id",
                "left",
            )
            .fillna(0.0, ["_h"])
        )
        hub = h_raw.crossJoin(F.broadcast(_norm_row(h_raw, "_h"))).select(
            "id", (F.col("_h") / F.col("_n")).alias("hub")
        )
        new_state = auth.join(hub, "id")
        if tol is None:
            return new_state, None
        new_state = truncated_checkpoint(new_state)
        new_state._qs_checkpointed = True  # noqa: SLF001 — runner skips its own
        d = (
            new_state.select("id", "auth", "hub")
            .join(state.select("id", F.col("auth").alias("_pa"), F.col("hub").alias("_ph")), "id")
            .agg(
                (F.max(F.abs(F.col("auth") - F.col("_pa"))) + F.max(F.abs(F.col("hub") - F.col("_ph")))).alias("d")
            )
            .collect()[0]["d"]
        )
        return new_state, float(d) if d is not None else 0.0

    iters = num_iters if num_iters is not None else max_iters
    res = runner.run(state0, step, tol=tol, max_iters=iters, job_key=f"hits:{num_iters}:{tol}")
    edges.unpersist()
    return res


def _hits_local(
    graph: Graph,
    num_iters: int | None,
    tol: float | None,
    max_iters: int,
) -> SuperstepResult:
    """Driver-numpy tiny tier — same semantics, one Arrow collect.
    Norms use numpy's pairwise float64 sum (vs the engines'
    accumulation orders); equality vs smj is allclose 1e-12
    (tests/test_hits.py)."""
    from quiver_spark.algorithms.local_tier import _collect_graph, _guard

    _guard(graph.spark, graph.edges.count())
    ids, si, di = _collect_graph(graph)
    spark = graph.spark
    n = len(ids)
    if n == 0:
        return SuperstepResult(
            state=spark.createDataFrame([], "id long, auth double, hub double"), supersteps=0
        )
    hub = np.ones(n, np.float64)
    auth = np.zeros(n, np.float64)
    iters = num_iters if num_iters is not None else max_iters
    k = -1
    metrics: list[dict] = []
    for k in range(iters):
        pa, ph = auth, hub
        a = np.zeros(n, np.float64)
        np.add.at(a, di, hub[si])
        an = np.sqrt((a * a).sum())
        auth = a / (an if an != 0.0 else 1.0)
        h = np.zeros(n, np.float64)
        np.add.at(h, si, auth[di])
        hn = np.sqrt((h * h).sum())
        hub = h / (hn if hn != 0.0 else 1.0)
        delta = None
        if tol is not None:
            delta = float(np.abs(auth - pa).max() + np.abs(hub - ph).max())
        metrics.append({"superstep": k, "delta": delta, "wall_ms": 0.0, "converged": tol is not None and delta is not None and delta <= tol})
        if tol is not None and delta <= tol:
            break
    import pandas as pd

    pdf = pd.DataFrame({"id": ids, "auth": auth, "hub": hub})
    return SuperstepResult(
        state=spark.createDataFrame(pdf, "id long, auth double, hub double"),
        supersteps=k + 1,
        metrics=metrics,
    )

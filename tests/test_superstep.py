"""Superstep runtime: convergence, durable checkpoints + lineage,
resume-equals-uninterrupted (BASELINE.md resumability row)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from quiver_spark.algorithms import pagerank
from quiver_spark.superstep import SuperstepRunner


def _doubling_step(state, k):
    new = state.withColumn("x", F.col("x") * 2)
    delta = 0.0 if k >= 4 else 1.0  # "converges" after 5 steps
    return new, delta


def test_runner_converges_and_records_metrics(spark, tmp_path):
    run_dir = str(tmp_path / "run1")
    r = SuperstepRunner(spark, run_dir=run_dir, checkpoint_every=2)
    s0 = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, x double")
    res = r.run(s0, _doubling_step, tol=0.5, max_iters=50)
    assert res.supersteps == 5 and res.converged
    vals = {row["id"]: row["x"] for row in res.state.collect()}
    assert vals == {1: 32.0, 2: 64.0}
    # metrics.jsonl: one line per superstep with delta + wall_ms
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert [m["superstep"] for m in lines] == [0, 1, 2, 3, 4]
    assert all("wall_ms" in m for m in lines)
    # durable checkpoints at k=1,3 (every 2) and k=4 (converged)
    assert r.last_completed() == 4
    assert os.path.isdir(os.path.join(run_dir, "state_k=00001"))
    # lineage table: per-partition rows + content hash
    ldir = os.path.join(run_dir, "lineage_k=00004")
    lineage = spark.read.parquet(ldir)
    assert lineage.agg(F.sum("rows")).collect()[0][0] == 2
    assert set(lineage.columns) == {"_pid", "rows", "content_hash_sum"}


def test_resume_equals_uninterrupted(spark, tmp_path, two_cliques_bridge):
    """Kill after superstep 9, resume: final ranks identical to a
    straight 20-superstep run (sha-equivalent rows)."""
    # uninterrupted 20 fixed iters
    full = pagerank(two_cliques_bridge, num_iters=20)
    a = {r["id"]: round(r["rank"], 12) for r in full.state.collect()}

    # phase 1: run only 10 supersteps with durable checkpoints
    d = str(tmp_path / "resume_run")
    r1 = SuperstepRunner(spark, run_dir=d, run_id="rr", checkpoint_every=5)
    p1 = pagerank(two_cliques_bridge, num_iters=10, runner=r1)
    assert r1.last_completed() == 9  # k=4 and k=9 durable

    # phase 2: new runner on same dir resumes at k=10 and finishes
    r2 = SuperstepRunner(spark, run_dir=d, run_id="rr2", checkpoint_every=5)
    p2 = pagerank(two_cliques_bridge, num_iters=20, runner=r2)
    assert p2.resumed_from == 9
    b = {r["id"]: round(r["rank"], 12) for r in p2.state.collect()}
    assert a == b


def test_resume_ignores_unmarked_partial_state(spark, tmp_path):
    """A state dir without its _DONE marker (crash mid-write) is not
    resumed from."""
    d = str(tmp_path / "crashy")
    r = SuperstepRunner(spark, run_dir=d, checkpoint_every=1)
    s0 = spark.createDataFrame([(1, 1.0)], "id long, x double")
    r.run(s0, _doubling_step, tol=0.5, max_iters=3)
    assert r.last_completed() == 2
    # simulate a crash: k=3 state written but no marker
    spark.createDataFrame([(1, 999.0)], "id long, x double").write.parquet(
        os.path.join(d, "state_k=00003")
    )
    assert SuperstepRunner(spark, run_dir=d).last_completed() == 2


def test_resume_refuses_foreign_run_dir(spark, tmp_path):
    """last_completed() matches ANY _DONE marker — without the job.json
    fingerprint, reusing one run_dir across algorithms silently resumes
    from foreign state (e.g. CC warm-started from a pagerank table)."""
    import pytest

    d = str(tmp_path / "shared")
    r1 = SuperstepRunner(spark, run_dir=d, checkpoint_every=1)
    s0 = spark.createDataFrame([(1, 1.0)], "id long, x double")
    r1.run(s0, _doubling_step, tol=0.5, max_iters=50, job_key="doubling:a")
    # same schema, different job key -> refused
    with pytest.raises(ValueError, match="different job"):
        SuperstepRunner(spark, run_dir=d).run(
            s0, _doubling_step, tol=0.5, max_iters=50, job_key="doubling:b"
        )
    # different state schema -> refused even with no job keys at all
    s0b = spark.createDataFrame([(1, 2)], "id long, component long")
    with pytest.raises(ValueError, match="different job"):
        SuperstepRunner(spark, run_dir=d).run(s0b, lambda st, k: (st, 0.0), tol=0.5)
    # the matching job still resumes
    res = SuperstepRunner(spark, run_dir=d).run(
        s0, _doubling_step, tol=0.5, max_iters=50, job_key="doubling:a"
    )
    assert res.resumed_from == 4


def test_fresh_start_clears_stale_markers(spark, tmp_path):
    """resume=False restarts in place: stale _DONE markers from the
    previous run must go, or a later resume stitches this run's early
    checkpoints to the old run's later ones."""
    d = str(tmp_path / "restart")
    s0 = spark.createDataFrame([(1, 1.0)], "id long, x double")
    r1 = SuperstepRunner(spark, run_dir=d, checkpoint_every=1)
    r1.run(s0, _doubling_step, tol=0.5, max_iters=50)
    assert r1.last_completed() == 4
    r2 = SuperstepRunner(spark, run_dir=d, checkpoint_every=1)
    res = r2.run(s0, _doubling_step, tol=None, max_iters=2, resume=False)
    assert res.resumed_from == -1
    assert r2.last_completed() == 1  # k=2..4 markers cleared, not resumable


def _stats_bits(df) -> int:
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()  # noqa: SLF001
    ).bit_length()


def test_checkpoint_stats_stay_bounded_under_double_reference(spark):
    """Regression: Dataset.localCheckpoint carries the optimized plan's
    Statistics into the LogicalRDD, and any superstep referencing its
    state twice (smj pagerank, HITS auth⋈hub) then DOUBLES the carried
    sizeInBytes' bit count per superstep — O(2^k) planning, driver OOM
    in BigInteger.multiply around superstep ~30 (measured on HITS).
    truncated_checkpoint must keep the carried stats constant-size."""
    from quiver_spark.superstep import truncated_checkpoint

    edges = spark.range(50).select(
        (F.col("id") % 10).alias("src"), ((F.col("id") * 7) % 10).alias("dst")
    )

    def double_ref_step(state, k):
        # state appears twice: message join + join-back (the smj shape)
        msgs = (
            edges.join(state.select(F.col("id").alias("src"), "x"), "src")
            .groupBy("dst")
            .agg(F.sum("x").alias("m"))
            .withColumnRenamed("dst", "id")
        )
        return state.join(msgs, "id", "left").select(
            "id", F.coalesce(F.col("m"), F.col("x")).alias("x")
        ), None

    state = truncated_checkpoint(
        spark.range(10).select("id", F.lit(1.0).alias("x"))
    )
    bits = []
    for k in range(8):
        new, _ = double_ref_step(state, k)
        state = truncated_checkpoint(new)
        bits.append(_stats_bits(state))
    # with plain localCheckpoint this sequence doubles every step
    # (probe: 85, 225, 506, 1068, 2191, 4438, 8933, ...); truncated
    # checkpoints must stay flat at the defaultSizeInBytes constant
    assert max(bits) <= 128, bits
    assert bits[-1] == bits[0], bits
    # and the data survives the rewrap bit-exactly
    rows = {r["id"]: r["x"] for r in state.orderBy("id").collect()}
    assert len(rows) == 10 and all(v is not None for v in rows.values())

"""Structured Streaming layer: incremental ingest composes to the
batch graph, the stateful per-user transition operator matches its
batch twin across micro-batch boundaries, and the watermarked window
agg matches the batch aggregate."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from quiver_spark import streaming as qstream
from quiver_spark.ingest import ingest, synthesize_repo_table


def _stage_single_file(df, staging_dir: str, dest: str) -> None:
    """Write df as ONE parquet file at dest (a plain file path) so the
    file stream picks up increments one micro-batch at a time."""
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(f"{staging_dir}/part-*.parquet")[0]
    shutil.copy(part, dest)


def test_incremental_ingest_composes_to_batch_graph(spark, tmp_path):
    """ANY split of the repo table into increments must compose exactly
    to the batch graph: the split here is by path hash parity —
    deliberately NOT repo-aligned, so import statements and their
    target files land in different micro-batches in both arrival
    orders, exercising the cross-batch delta-join resolution (and
    multi-commit files can straddle the boundary, exercising the
    newest-commit vertex merge)."""
    repos = synthesize_repo_table(spark, n_files=240, n_repos=6, seed=11)
    repos.persist()
    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    half = F.pmod(F.xxhash64("path"), F.lit(2)) == 0
    _stage_single_file(repos.filter(half), str(tmp_path / "s1"), str(stream_dir / "a.parquet"))
    _stage_single_file(repos.filter(~half), str(tmp_path / "s2"), str(stream_dir / "b.parquet"))

    src = qstream.read_stream_like(spark, str(stream_dir), like=repos, maxFilesPerTrigger=1)
    q = qstream.incremental_ingest(
        src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(timeout=180)
    assert not q.isActive

    got = qstream.load_incremental_graph(spark, str(tmp_path / "out"))
    want = ingest(repos)
    gv = {tuple(r) for r in got.vertices.select(sorted(got.vertices.columns)).collect()}
    wv = {tuple(r) for r in want.vertices.select(sorted(want.vertices.columns)).collect()}
    assert gv == wv
    ge = {tuple(r) for r in got.edges.select(sorted(got.edges.columns)).collect()}
    we = {tuple(r) for r in want.edges.select(sorted(want.edges.columns)).collect()}
    assert ge == we
    assert got.edges.count() == want.edges.count()  # sets equal AND no dup rows
    repos.unpersist()


def test_incremental_ingest_batch_sink_is_idempotent(spark, tmp_path):
    """Replaying a batch id overwrites its own directory instead of
    duplicating rows — the foreachBatch exactly-once contract."""
    repos = synthesize_repo_table(spark, n_files=80, n_repos=2, seed=3)
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    _stage_single_file(repos, str(tmp_path / "s"), str(stream_dir / "a.parquet"))

    out, ck1, ck2 = str(tmp_path / "out"), str(tmp_path / "ck1"), str(tmp_path / "ck2")
    for ck in (ck1, ck2):  # second run = full replay of batch 0 (fresh checkpoint)
        src = qstream.read_stream_like(spark, str(stream_dir), like=repos)
        q = qstream.incremental_ingest(src, out, ck)
        q.awaitTermination(timeout=120)
    got = qstream.load_incremental_graph(spark, out)
    want = ingest(repos)
    assert got.count_nodes() == want.count_nodes()
    assert got.count_edges() == want.count_edges()


def test_user_transitions_stream_matches_batch_across_microbatches(spark, tmp_path):
    """The applyInPandasWithState operator must carry per-user state
    over micro-batch boundaries: events split into two time-ordered
    files, streamed one file per trigger, must yield exactly the batch
    twin's transition rows."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.orderBy("ts", "event_id").persist()
    n = ev.count()
    first = ev.limit(n // 2)
    second = ev.subtract(first)
    stream_dir = tmp_path / "ev_in"
    stream_dir.mkdir()
    _stage_single_file(first, str(tmp_path / "e1"), str(stream_dir / "a.parquet"))
    _stage_single_file(second, str(tmp_path / "e2"), str(stream_dir / "b.parquet"))

    src = qstream.read_stream_like(spark, str(stream_dir), like=ev, maxFilesPerTrigger=1)
    out = qstream.user_transitions_stream(src)
    q = (
        out.writeStream.format("memory")
        .queryName("ut_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    assert spark.sql("SELECT count(*) FROM ut_stream").collect()[0][0] > 0

    got = sorted(
        tuple(r) for r in spark.sql("SELECT user_id, src, dst, ts FROM ut_stream").collect()
    )
    want = sorted(
        tuple(r) for r in qstream.user_transitions(ev).select("user_id", "src", "dst", "ts").collect()
    )
    assert got == want
    ev.unpersist()


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    stream_dir = tmp_path / "win_in"
    stream_dir.mkdir()
    _stage_single_file(ev, str(tmp_path / "w1"), str(stream_dir / "a.parquet"))

    src = qstream.read_stream_like(spark, str(stream_dir), like=ev)
    out = qstream.windowed_type_counts_stream(src, window="1 hour", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)

    got = sorted(
        tuple(r) for r in spark.sql("SELECT window_start, event_type, n FROM win_stream").collect()
    )
    want = sorted(
        tuple(r)
        for r in qstream.windowed_type_counts(ev, "1 hour")
        .select("window_start", "event_type", "n")
        .collect()
    )
    assert got == want


def test_buffered_transitions_exact_on_cross_batch_disorder(spark, tmp_path):
    """The watermark-buffered operator must equal the batch twin on a
    feed whose events are deliberately SHUFFLED ACROSS micro-batches
    (disorder bounded by the watermark delay) — the case the
    unbuffered operator documents as its limitation. Three files
    stream one-per-trigger: each user's events are dealt round-robin
    so consecutive events land in different batches in non-time order;
    two far-future sentinel files advance the watermark past every
    real event and trigger the EventTimeTimeout flush of quiet keys."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        for k in range(12):
            rows.append((u, f"t{(u + k) % 4}", base + dt.timedelta(minutes=3 * k + u), eid))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    ).persist()

    stream_dir = tmp_path / "buf_in"
    stream_dir.mkdir()
    # deal each user's time-ordered events across 3 files round-robin,
    # REVERSED file order: file a holds the latest thirds, so earlier
    # events arrive in later micro-batches (true cross-batch disorder:
    # the earliest event lands ~35 min of event-time behind the stream
    # head, inside the 45 min delay — with delay=30min the watermark
    # would rightly DROP it, which is how this fixture caught its own
    # first draft)
    for i, name in enumerate(("a", "b", "c")):
        part = ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == (2 - i))
        _stage_single_file(part, str(tmp_path / f"s{i}"), str(stream_dir / f"{name}.parquet"))
    far = base + dt.timedelta(days=2)
    for j, name in enumerate(("zz1", "zz2")):
        sentinel = spark.createDataFrame(
            [(999, "end", far + dt.timedelta(minutes=j), 100000 + j)],
            "user_id long, event_type string, ts timestamp, event_id long",
        )
        _stage_single_file(sentinel, str(tmp_path / f"sz{j}"), str(stream_dir / f"{name}.parquet"))

    src = qstream.read_stream_like(spark, str(stream_dir), like=ev, maxFilesPerTrigger=1)
    out = qstream.user_transitions_stream_buffered(src, delay="45 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("buf_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)

    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, src, dst, ts FROM buf_stream WHERE user_id != 999"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in qstream.user_transitions(ev)
        .select("user_id", "src", "dst", F.col("ts").cast("timestamp"))
        .collect()
    )
    assert got == want
    # and the unbuffered operator would NOT have survived this feed —
    # the disorder is real (sanity check on the fixture, not a law)
    assert len(want) == 6 * 11
    ev.unpersist()

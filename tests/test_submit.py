"""spark-submit --py-files packaging smoke (BASELINE.json:14: the
engine ships as spark-submit jobs and resumes from checkpoints).

Runs the real ``spark-submit`` binary in a subprocess against
``dist/quiver_spark.zip`` built by tools/package.py — the same
artifact a cluster submit would use. PYTHONPATH is scrubbed from the
child env so the import genuinely comes from the zip.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spark_submit = shutil.which("spark-submit")
pytestmark = pytest.mark.skipif(spark_submit is None, reason="spark-submit not on PATH")


def _submit(tmp_path, *job_args: str) -> dict:
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import package

    zip_path = package.build(str(tmp_path / "quiver_spark.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(ROOT, "jobs", "run.py"),
            *job_args,
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # NOT the repo root: the zip must supply the package
        timeout=600,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_cli_rejects_warm_start_with_fixed_iters(tmp_path):
    """--init-ranks + --num-iters is rejected at parse time (ADVICE r4):
    a warm start under a pinned superstep count yields init-dependent
    ranks, defeating the bit-comparable-oracle purpose of --num-iters.
    In-process (argparse errors before any SparkSession is built)."""
    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    import run as job_run

    with pytest.raises(SystemExit) as exc:
        job_run.main([
            "pagerank",
            "--input", str(tmp_path / "nope"),
            "--output", str(tmp_path / "out"),
            "--num-iters", "5",
            "--init-ranks", str(tmp_path / "ranks"),
        ])
    assert exc.value.code == 2


def test_cli_rejects_reset_with_warm_start(tmp_path):
    """--reset (personalized teleport) + --init-ranks is rejected at
    parse time, mirroring pagerank(reset=..., init_ranks=...) raising:
    the warm start's renormalization assumes the uniform-teleport
    fixpoint."""
    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    import run as job_run

    with pytest.raises(SystemExit) as exc:
        job_run.main([
            "pagerank",
            "--input", str(tmp_path / "nope"),
            "--output", str(tmp_path / "out"),
            "--reset", str(tmp_path / "seeds"),
            "--init-ranks", str(tmp_path / "ranks"),
        ])
    assert exc.value.code == 2


def test_cli_rejects_run_dir_on_one_shot_jobs(tmp_path):
    """msf/walks/louvain are one-shot: --run-dir is refused at parse
    time instead of silently voiding the resume contract it
    advertises."""
    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    import run as job_run

    for cmd in ("msf", "walks", "louvain"):
        with pytest.raises(SystemExit) as exc:
            job_run.main([
                cmd,
                "--input", str(tmp_path / "nope"),
                "--output", str(tmp_path / "out"),
                "--run-dir", str(tmp_path / "ckpt"),
            ])
        assert exc.value.code == 2


def test_submit_pagerank_job_and_resume(tmp_path):
    res = _submit(
        tmp_path,
        "pagerank",
        "--synthesize",
        "--n-files", "300",
        "--output", str(tmp_path / "ranks"),
        "--run-dir", str(tmp_path / "ckpt"),
        "--num-iters", "5",
        "--strategy", "auto",
    )
    assert res["job"] == "pagerank"
    assert res["supersteps"] == 5
    assert res["resumed_from"] == -1
    # durable checkpoint artifacts exist (resumability evidence)
    assert any(f.startswith("_DONE_k=") for f in os.listdir(tmp_path / "ckpt"))
    assert os.path.exists(tmp_path / "ckpt" / "metrics.jsonl")
    # output parquet written
    import duckdb

    n = duckdb.sql(f"select count(*) from '{tmp_path}/ranks/*.parquet'").fetchone()[0]
    assert n > 0

    # re-submit with a longer horizon against the SAME run-dir: the job
    # must resume from the newest durable superstep, not restart
    res2 = _submit(
        tmp_path,
        "pagerank",
        "--synthesize",
        "--n-files", "300",
        "--output", str(tmp_path / "ranks2"),
        "--run-dir", str(tmp_path / "ckpt"),
        "--num-iters", "10",
        "--strategy", "auto",
    )
    assert res2["resumed_from"] == 4
    assert res2["supersteps"] == 5  # ran only 5..9


def _submit_and_kill_after_first_checkpoint(tmp_path, *job_args: str) -> None:
    """Launch the job, SIGKILL it as soon as the first durable
    checkpoint marker lands in --run-dir (a real mid-run crash, not a
    polite stop). If the job wins the race and finishes first, that is
    fine — the caller's resume/equality assertions hold either way."""
    import time

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import package

    zip_path = package.build(str(tmp_path / "quiver_spark.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    run_dir = [a for a in job_args if str(a).endswith("ckpt")][0]
    proc = subprocess.Popen(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(ROOT, "jobs", "run.py"),
            *job_args,
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        env=env,
        cwd=str(tmp_path),
    )
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline and proc.poll() is None:
        if os.path.isdir(run_dir) and any(f.startswith("_DONE_k=") for f in os.listdir(run_dir)):
            proc.kill()
            proc.wait()
            break
        time.sleep(0.25)
    else:
        if proc.poll() is None:  # no checkpoint within deadline: fail loudly
            proc.kill()
            proc.wait()
            pytest.fail("no durable checkpoint appeared within 300s")
    assert any(f.startswith("_DONE_k=") for f in os.listdir(run_dir))


def _parquet_rows_equal(a: str, b: str) -> bool:
    """Exact multiset equality of two parquet outputs (DuckDB)."""
    import duckdb

    n = duckdb.sql(
        f"select count(*) from ((select * from '{a}/*.parquet' except all "
        f"select * from '{b}/*.parquet') union all "
        f"(select * from '{b}/*.parquet' except all select * from '{a}/*.parquet'))"
    ).fetchone()[0]
    return n == 0


def test_submit_components_kill_resume_equals_uninterrupted(tmp_path):
    """Crash a components run after its first durable checkpoint, then
    re-submit with the same --run-dir: the resumed run must report
    resumed_from >= 0 and produce EXACTLY the component assignment of
    an uninterrupted run (BASELINE.json north rule: resumable from
    checkpoint with per-partition lineage)."""
    common = ["--synthesize", "--n-files", "300", "--checkpoint-every", "1"]
    _submit_and_kill_after_first_checkpoint(
        tmp_path, "components", *common,
        "--output", str(tmp_path / "dead"),
        "--run-dir", str(tmp_path / "cc_ckpt"),
    )
    res = _submit(
        tmp_path, "components", *common,
        "--output", str(tmp_path / "resumed"),
        "--run-dir", str(tmp_path / "cc_ckpt"),
    )
    assert res["job"] == "components" and res["resumed_from"] >= 0
    ref = _submit(
        tmp_path, "components", *common,
        "--output", str(tmp_path / "reference"),
        "--run-dir", str(tmp_path / "cc_ckpt_ref"),
    )
    assert ref["resumed_from"] == -1
    assert _parquet_rows_equal(str(tmp_path / "resumed"), str(tmp_path / "reference"))


def test_submit_labelprop_kill_resume_equals_uninterrupted(tmp_path):
    """Same crash/resume/equality contract for label propagation (its
    fixed-round mode makes the superstep arithmetic explicit: a resume
    from k runs exactly rounds k+1..n-1)."""
    common = [
        "--synthesize", "--n-files", "300", "--checkpoint-every", "1",
        "--lp-iters", "6",
    ]
    _submit_and_kill_after_first_checkpoint(
        tmp_path, "labelprop", *common,
        "--output", str(tmp_path / "dead"),
        "--run-dir", str(tmp_path / "lp_ckpt"),
    )
    res = _submit(
        tmp_path, "labelprop", *common,
        "--output", str(tmp_path / "resumed"),
        "--run-dir", str(tmp_path / "lp_ckpt"),
    )
    assert res["job"] == "labelprop" and res["resumed_from"] >= 0
    # superstep accounting: resumed run executes only the remainder
    assert res["supersteps"] == 6 - (res["resumed_from"] + 1)
    ref = _submit(
        tmp_path, "labelprop", *common,
        "--output", str(tmp_path / "reference"),
        "--run-dir", str(tmp_path / "lp_ckpt_ref"),
    )
    assert ref["resumed_from"] == -1
    assert _parquet_rows_equal(str(tmp_path / "resumed"), str(tmp_path / "reference"))


def test_submit_pagerank_kill_resume_equals_uninterrupted(tmp_path):
    """Crash/resume/equality contract for the FLAGSHIP (BASELINE.json
    north rule: PageRank resumable from checkpoint). Ranks are doubles
    whose shuffle-order-dependent sums may differ in the last ulp
    between a resumed and an uninterrupted run, so equality is
    allclose (1e-12 — far inside the rule's 1e-6) rather than
    bit-for-bit; vertex sets must match exactly."""
    import duckdb

    common = [
        "--synthesize", "--n-files", "300", "--checkpoint-every", "1",
        "--num-iters", "6", "--strategy", "auto",
    ]
    _submit_and_kill_after_first_checkpoint(
        tmp_path, "pagerank", *common,
        "--output", str(tmp_path / "dead"),
        "--run-dir", str(tmp_path / "pr_ckpt"),
    )
    res = _submit(
        tmp_path, "pagerank", *common,
        "--output", str(tmp_path / "resumed"),
        "--run-dir", str(tmp_path / "pr_ckpt"),
    )
    assert res["job"] == "pagerank" and res["resumed_from"] >= 0
    assert res["supersteps"] == 6 - (res["resumed_from"] + 1)
    ref = _submit(
        tmp_path, "pagerank", *common,
        "--output", str(tmp_path / "reference"),
        "--run-dir", str(tmp_path / "pr_ckpt_ref"),
    )
    assert ref["resumed_from"] == -1
    n_a, n_b, n_joined, max_diff = duckdb.sql(
        f"select (select count(*) from '{tmp_path}/resumed/*.parquet'), "
        f"(select count(*) from '{tmp_path}/reference/*.parquet'), "
        f"count(*), max(abs(a.rank - b.rank)) "
        f"from '{tmp_path}/resumed/*.parquet' a "
        f"join '{tmp_path}/reference/*.parquet' b using (id)"
    ).fetchone()
    assert n_a == n_b == n_joined  # identical vertex sets
    assert max_diff <= 1e-12, f"resumed ranks diverge: max abs diff {max_diff}"


def test_submit_ann_index_partitioned_by_cell(tmp_path):
    """ann-index writes the IVF-assigned table partitioned by cell —
    the partition layout that makes an ANN probe a pruned read."""
    import glob

    out = _submit(
        tmp_path,
        "ann-index",
        "--input", "/root/testdata/sf0.001/embeddings.parquet",
        "--output", str(tmp_path / "cells"),
        "--ivf-cells", "8",
    )
    assert out["job"] == "ann-index" and out["vectors"] > 0
    parts = glob.glob(str(tmp_path / "cells" / "cell=*"))
    assert len(parts) >= 2, f"expected cell= partition dirs, got {parts}"


def test_submit_dedup_keep_writes_canonical_table(tmp_path):
    """dedup-keep ships the canonical keep/drop table as a job: one row
    per document, exactly one keeper per dup cluster."""
    out = _submit(
        tmp_path,
        "dedup-keep",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", str(tmp_path / "keep"),
        "--jaccard", "0.5",
    )
    assert out["job"] == "dedup-keep"
    assert out["docs"] == 500  # sf0.001 documents row count
    assert 0 < out["kept"] <= out["docs"]


def test_submit_stream_ingest_incremental_resume(tmp_path, spark):
    """stream-ingest is incrementally resumable: a re-submit with the
    same --run-dir processes only newly arrived repo files, and the
    assembled graph equals batch ingest over everything seen."""
    import glob

    from quiver_spark import ingest as ing

    repos = ing.synthesize_repo_table(spark, n_files=200, n_repos=4, seed=11)
    staged = tmp_path / "staged"
    repos.repartition(2).write.parquet(str(staged))
    parts = sorted(glob.glob(str(staged / "part-*")))
    assert len(parts) == 2

    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(parts[0], feed / "a.parquet")
    out1 = _submit(
        tmp_path,
        "stream-ingest",
        "--input", str(feed),
        "--output", str(tmp_path / "graph"),
        "--run-dir", str(tmp_path / "stream_ckpt"),
    )
    assert out1["job"] == "stream-ingest" and out1["vertices"] > 0

    shutil.copy(parts[1], feed / "b.parquet")
    out2 = _submit(
        tmp_path,
        "stream-ingest",
        "--input", str(feed),
        "--output", str(tmp_path / "graph"),
        "--run-dir", str(tmp_path / "stream_ckpt"),
    )
    g_ref = ing.ingest(spark.read.parquet(str(staged)))
    try:
        assert out2["vertices"] == g_ref.count_nodes()
        assert out2["edges"] == g_ref.count_edges()
    finally:
        ing.release_source_caches(g_ref)
    assert out1["vertices"] <= out2["vertices"]


def test_submit_stream_ingest_kill_resume_equals_batch(tmp_path, spark):
    """SIGKILL stream-ingest mid-run (after the first micro-batch's
    LAST sink lands but racing its checkpoint commit — the exact
    replay window the per-batch overwrite pattern exists for), then
    re-submit: the assembled graph must still equal batch ingest over
    the full input. If the job wins the race and finishes first, the
    equality assertions hold either way."""
    import glob
    import time

    from quiver_spark import ingest as ing

    repos = ing.synthesize_repo_table(spark, n_files=200, n_repos=4, seed=23)
    feed = tmp_path / "feed"
    repos.repartition(4).write.parquet(str(feed))
    assert len(glob.glob(str(feed / "part-*"))) == 4

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import package

    zip_path = package.build(str(tmp_path / "quiver_spark.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    out_dir = str(tmp_path / "graph")
    args = [
        spark_submit,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(ROOT, "jobs", "run.py"),
        "stream-ingest",
        "--input", str(feed),
        "--output", out_dir,
        "--run-dir", str(tmp_path / "stream_ckpt"),
        "--max-files-per-trigger", "1",
    ]
    proc = subprocess.Popen(
        args, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env, cwd=str(tmp_path)
    )
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline and proc.poll() is None:
        if glob.glob(f"{out_dir}/imports/batch=0/part-*"):
            proc.kill()
            proc.wait()
            break
        time.sleep(0.1)
    else:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
            pytest.fail("first micro-batch output never appeared within 300s")

    out = _submit(
        tmp_path,
        "stream-ingest",
        "--input", str(feed),
        "--output", out_dir,
        "--run-dir", str(tmp_path / "stream_ckpt"),
        "--max-files-per-trigger", "1",
    )
    g_ref = ing.ingest(spark.read.parquet(str(feed)))
    try:
        assert out["vertices"] == g_ref.count_nodes()
        assert out["edges"] == g_ref.count_edges()
    finally:
        ing.release_source_caches(g_ref)


def test_submit_louvain_job(tmp_path):
    """Round 5: the louvain job runs through the packaged spark-submit
    surface; min-id-canonicalization invariants checked independently
    on the WRITTEN parquet (each label is <= every member id AND is
    itself a member — so a canonicalization regression fails here, not
    a row-count tautology), plus the job-reported Q > 0."""
    res = _submit(
        tmp_path,
        "louvain",
        "--synthesize",
        "--n-files", "200",
        "--output", str(tmp_path / "comms"),
    )
    assert res["job"] == "louvain" and res["levels"] >= 1 and res["q"] > 0
    import duckdb

    n_rows, n_ids, bad_label, orphan_label = duckdb.sql(f"""
        WITH a AS (SELECT id, comm FROM '{tmp_path}/comms/*.parquet')
        SELECT (SELECT count(*) FROM a),
               (SELECT count(DISTINCT id) FROM a),
               (SELECT count(*) FROM a WHERE comm > id),
               (SELECT count(*) FROM (SELECT DISTINCT comm FROM a) c
                WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.id = c.comm
                                  AND a.comm = c.comm))
    """).fetchone()
    assert n_rows == n_ids, "assignment is not a partition (duplicate ids)"
    assert bad_label == 0, "a community label exceeds a member id"
    assert orphan_label == 0, "a community label is not its own member"


def test_submit_msf_and_walks_jobs(tmp_path):
    """Round 5: the msf (unit-weight spanning forest) and walks
    (training-corpus artifact) jobs run through the same packaged
    spark-submit surface; laws checked on the written parquet."""
    res = _submit(
        tmp_path,
        "msf",
        "--synthesize",
        "--n-files", "200",
        "--output", str(tmp_path / "forest"),
    )
    assert res["job"] == "msf" and res["forest_edges"] > 0
    import duckdb

    # forest identity on the WRITTEN parquet: an acyclic edge set has
    # exactly (vertices - components) edges — computed independently
    # in DuckDB via the undirected recursive closure, so a contraction
    # regression that emits a cycle or a duplicate intra-component
    # edge fails here (not a row-count tautology)
    n_edges, n_verts, n_comps = duckdb.sql(f"""
        WITH RECURSIVE f AS (SELECT a, b FROM '{tmp_path}/forest/*.parquet'),
        u AS (SELECT a AS s, b AS d FROM f UNION ALL SELECT b, a FROM f),
        verts AS (SELECT DISTINCT s AS id FROM u),
        r(root, id) AS (
          SELECT id, id FROM verts
          UNION
          SELECT r.root, u.d FROM r JOIN u ON u.s = r.id
        ),
        comp AS (SELECT id, MIN(root) AS c FROM r GROUP BY id)
        SELECT (SELECT count(*) FROM f),
               (SELECT count(*) FROM verts),
               (SELECT count(DISTINCT c) FROM comp)
    """).fetchone()
    assert n_edges == res["forest_edges"]
    assert n_edges == n_verts - n_comps, "written forest is not acyclic"

    res2 = _submit(
        tmp_path,
        "walks",
        "--synthesize",
        "--n-files", "200",
        "--walks-per-vertex", "2",
        "--walk-len", "4",
        "--output", str(tmp_path / "walks"),
    )
    assert res2["job"] == "walks" and res2["rows"] > 0
    # every walk starts at its start vertex (step 0 law) and no walk
    # exceeds the requested length
    bad = duckdb.sql(
        f"""select count(*) from '{tmp_path}/walks/*.parquet'
            where (step = 0 and id <> start) or step > 4"""
    ).fetchone()[0]
    assert bad == 0

"""Training-data pipeline operators: planted-case exactness tests
(dedup, minhash/LSH near-dup, simhash, ANN, text analysis, multimodal
plumbing) — complements the DuckDB parity layer in test_oracle_parity.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quiver_spark import dedup, multimodal, simsearch, textops


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


BASE = "the quick brown fox jumps over the lazy dog again and again until done"


# ------------------------------------------------------------------ dedup
def test_exact_dedup_normalizes_whitespace_and_case(spark):
    df = _docs(spark, [BASE, "  The  QUICK brown fox jumps over the lazy dog again and again until done ", "something else entirely different words here"])
    groups = dedup.exact_duplicate_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2
    assert groups[0]["keep_id"] == 0
    kept = dedup.dedup_exact(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]


def test_minhash_lsh_finds_planted_near_duplicate(spark):
    near = BASE.replace("lazy", "sleepy")  # one-token edit → high jaccard
    far = "completely unrelated text with different content and no overlap at all whatsoever in any shingle"
    df = _docs(spark, [BASE, near, far])
    pairs = dedup.near_duplicate_pairs(df, threshold=0.3).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(0, 1)}
    jac = pairs[0]["jaccard"]
    # 13 tokens → 11 shingles; a middle-token edit breaks 3 of them
    assert 0.3 <= jac < 1.0


def test_minhash_identical_docs_full_signature_match(spark):
    df = _docs(spark, [BASE, BASE])
    sig = dedup.minhash_signatures(df).collect()
    s = {r["doc_id"]: r["sig"] for r in sig}
    assert s[0] == s[1]


def test_simhash_near_texts_closer_than_far(spark):
    near = BASE.replace("lazy", "sleepy")
    far = "totally different words appear in this unrelated document about databases"
    df = _docs(spark, [BASE, near, far])
    s = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(s[0], s[1]) < ham(s[0], s[2])


def test_simhash_band_pairs_catch_identical(spark):
    df = _docs(spark, [BASE, BASE, "other words entirely different here now"])
    sim = dedup.simhash64(df)
    pairs = {(r["a"], r["b"]) for r in dedup.simhash_candidate_pairs(sim).collect()}
    assert (0, 1) in pairs


# -------------------------------------------------------------- simsearch
@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    vecs[7] = vecs[0] * 0.99 + 0.01 * rng.standard_normal(8).astype(np.float32)  # planted near-dup of 0
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)], "vec_id long, embedding array<float>"
    )
    return df, vecs


def test_cosine_topk_matches_numpy(spark, emb):
    df, vecs = emb
    q = vecs[0].astype(np.float64)
    cos = (vecs.astype(np.float64) @ q) / (np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q))
    expect = list(np.lexsort((np.arange(40), -cos))[:5])
    got = [r["vec_id"] for r in simsearch.cosine_topk(df, [float(x) for x in vecs[0]], k=5).collect()]
    assert got == [int(i) for i in expect]
    assert got[0] == 0 and 7 in got[:2]


def test_knn_join_matches_brute(spark, emb):
    df, vecs = emb
    queries = df.limit(3).select(F.col("vec_id").alias("qid"), "embedding")
    res = simsearch.knn_join(df, queries, k=3)
    rows = res.collect()
    assert len(rows) == 9
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r["vec_id"])
    m = vecs.astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    for qid, ids in by_q.items():
        cos = (m @ m[qid]) / (norms * norms[qid])
        expect = [int(i) for i in np.lexsort((np.arange(40), -cos))[:3]]
        assert ids == expect


def test_lsh_probe_recall_reasonable(spark, emb):
    df, vecs = emb
    bucketed = simsearch.lsh_bucket(df, n_bits=6)
    brute = {r["vec_id"] for r in simsearch.cosine_topk(df, [float(x) for x in vecs[0]], k=5).collect()}
    approx = {
        r["vec_id"]
        for r in simsearch.lsh_probe_topk(bucketed, [float(x) for x in vecs[0]], k=5, n_bits=6).collect()
    }
    # multiprobe over hamming-1 must at least find the vector itself and
    # its planted near-duplicate (they agree on ~every hyperplane)
    assert 0 in approx
    assert len(brute & approx) >= 2


def test_embedding_near_dup_pairs_finds_planted(spark, emb):
    df, _ = emb
    pairs = {(r["a"], r["b"]) for r in simsearch.embedding_near_dup_pairs(df, threshold=0.95, n_bits=6).collect()}
    assert (0, 7) in pairs


# ---------------------------------------------------------------- textops
def test_langid_marker_argmax_and_tiebreak(spark):
    df = _docs(spark, ["el gato que vive en la casa de los gatos", "xyzzy plugh", "the cat and the dog of to in"])
    out = {r["doc_id"]: (r["lang_pred"], r["marker_hits"]) for r in textops.langid(df).collect()}
    assert out[0][0] == "es"
    assert out[1] == ("und", 0)
    assert out[2][0] == "en"


def test_quality_score_orders_clean_above_noise(spark):
    clean = "the house stands near the river and the trees grow tall in the quiet morning light"
    noisy = "!!! ??? 123 456 ,,, ;;; 789 000 !!! ??? ... 111"
    df = _docs(spark, [clean, noisy])
    s = {r["doc_id"]: r["quality"] for r in textops.quality_score(df).collect()}
    assert s[0] > s[1]


def test_shingles_and_min_fingerprint(spark):
    df = _docs(spark, ["a b c d", "x"])
    sh = df.select("doc_id", textops.shingles("text", 3).alias("s")).collect()
    m = {r["doc_id"]: r["s"] for r in sh}
    assert m[0] == ["a b c", "b c d"]
    assert m[1] == []
    fp = {r["doc_id"]: r["min_shingle_md5"] for r in textops.min_shingle_fingerprint(df).collect()}
    assert fp[0] is not None and fp[1] is None


# ------------------------------------------------------------- multimodal
def test_multimodal_synthesis_deterministic_and_typed(spark):
    a1 = multimodal.synthesize_assets(spark, 30, seed=42, num_partitions=4)
    a2 = multimodal.synthesize_assets(spark, 30, seed=42, num_partitions=7)
    s1 = sorted((r["asset_id"], bytes(r["payload"])) for r in a1.collect())
    s2 = sorted((r["asset_id"], bytes(r["payload"])) for r in a2.collect())
    assert s1 == s2  # partitioning-independent bytes
    kinds = {r["kind"] for r in a1.collect()}
    assert kinds == {"image", "audio", "video"}


def test_multimodal_features_real_plumbing_fake_decode(spark):
    assets = multimodal.synthesize_assets(spark, 30, seed=42)
    feats = multimodal.extract_features(assets, decode="fake")
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in rows)
    norms = [float(np.linalg.norm(r["feature"])) for r in rows]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)


def test_multimodal_real_decode_is_stubbed(spark):
    assets = multimodal.synthesize_assets(spark, 5, seed=42)
    feats = multimodal.extract_features(assets, decode="real")
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        feats.collect()


def test_frame_sample_plan_counts(spark):
    assets = multimodal.synthesize_assets(spark, 30, seed=42)
    plan = multimodal.frame_sample_plan(assets, every_ms=1000)
    counts = {r["asset_id"]: r["n_frames"] for r in plan.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n_frames")).collect()}
    for aid, n in counts.items():
        dur = 1000 + (aid * 13) % 60000
        assert n == (dur - 1) // 1000 + 1


# ----------------------------------------------------- hot-bucket guards
def test_simhash_pairs_cap_hot_bucket(spark):
    # 40 byte-identical docs share every band → one hot bucket of 40;
    # with max_bucket below that the quadratic self-pairing must not
    # fire, while a disjoint small near-dup group is still paired
    rows = [BASE] * 40 + ["alpha beta gamma delta epsilon zeta eta theta"] * 2
    df = _docs(spark, rows)
    sim = dedup.simhash64(df)
    capped = {(r["a"], r["b"]) for r in dedup.simhash_candidate_pairs(sim, max_bucket=8).collect()}
    assert (40, 41) in capped
    assert all(a >= 40 for a, _ in capped), "hot boilerplate bucket leaked pairs"
    # uncapped default still catches the identical docs (bucket ≤ 64)
    full = {(r["a"], r["b"]) for r in dedup.simhash_candidate_pairs(sim).collect()}
    assert (0, 1) in full


def test_embedding_near_dup_cap_hot_bucket(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal(8).astype(np.float32)
    # 30 near-identical vectors → one hot sign-bucket; plus a planted
    # separate near-dup pair far from the cluster
    vecs = [base + 0.001 * rng.standard_normal(8).astype(np.float32) for _ in range(30)]
    other = -base
    vecs += [other, other * np.float32(1.001)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    pairs = simsearch.embedding_near_dup_pairs(df, threshold=0.99, n_bits=6, max_bucket=8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (30, 31) in got
    assert all(a >= 30 for a, _ in got), "hot cluster bucket leaked pairs"
    # n_pairs bounded: ≤ C(max_bucket, 2) per surviving bucket
    assert len(got) <= 8 * 7 // 2


def test_knn_join_deterministic_under_ties(spark):
    # four copies of the same vector (cos ties at every boundary) in a
    # corpus spread over several partitions: top-k must pick ascending
    # ids, matching the (cos desc, id asc) global order
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, base) for i in range(4)] + [(10 + i, [0.0, 1.0, 0.0, float(i)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(5)
    queries = spark.createDataFrame([(0, base)], "qid long, embedding array<float>")
    got = [r["vec_id"] for r in simsearch.knn_join(df, queries, k=3).orderBy(F.desc("cos"), F.asc("vec_id")).collect()]
    assert got == [0, 1, 2]


# ------------------------------------------------------------------ IVF
def test_ivf_assign_deterministic_and_complete(spark, emb):
    df, vecs = emb
    cent = simsearch.ivf_centroids(df, k=4, sample_size=40)
    assert cent.shape == (4, 8)
    a1 = {r["vec_id"]: r["cell"] for r in simsearch.ivf_assign(df, cent).collect()}
    a2 = {r["vec_id"]: r["cell"] for r in simsearch.ivf_assign(df.repartition(7), cent).collect()}
    assert a1 == a2, "cell assignment must not depend on partitioning"
    assert len(a1) == 40
    assert all(0 <= c < 4 for c in a1.values())


def test_ivf_topk_finds_planted_near_dup(spark, emb):
    df, vecs = emb
    cent = simsearch.ivf_centroids(df, k=4, sample_size=40)
    assigned = simsearch.ivf_assign(df, cent)
    got = [
        r["vec_id"]
        for r in simsearch.ivf_topk(assigned, cent, [float(x) for x in vecs[0]], k=5, nprobe=1).collect()
    ]
    # vector 0 and its planted near-dup 7 share a cell (cosine ~0.9999)
    assert got[0] == 0 and 7 in got[:2]
    # full probe == brute (recall 1 when every cell is scanned)
    brute = [r["vec_id"] for r in simsearch.cosine_topk(df, [float(x) for x in vecs[0]], k=5).collect()]
    full = [
        r["vec_id"]
        for r in simsearch.ivf_topk(assigned, cent, [float(x) for x in vecs[0]], k=5, nprobe=4).collect()
    ]
    assert full == brute


def test_ivf_knn_join_full_probe_equals_exact(spark, emb):
    """nprobe = n_cells probes every cell, so the cell-cogrouped join
    must equal the exact broadcast knn_join bit-for-bit, including
    tie-breaks and the chunked-matmul path (chunk=7 < cell widths)."""
    df, vecs = emb
    cent = simsearch.ivf_centroids(df, k=4, sample_size=40)
    assigned = simsearch.ivf_assign(df, cent)
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in vecs[i]]) for i in range(10)],
        "qid long, embedding array<float>",
    )
    exact = {
        (r["qid"], r["vec_id"]): r["cos"]
        for r in simsearch.knn_join(df, queries, k=3).collect()
    }
    got = {
        (r["qid"], r["vec_id"]): r["cos"]
        for r in simsearch.ivf_knn_join(assigned, queries, cent, k=3, nprobe=4, chunk=7).collect()
    }
    assert set(got) == set(exact)
    for key in exact:
        assert abs(got[key] - exact[key]) < 1e-12


def test_ivf_knn_join_probes_limit_candidates(spark, emb):
    """nprobe=1: every returned neighbor must come from one of the
    query's probed cells, and the planted near-dup pair still finds
    itself (vector 0 and 7 share a cell)."""
    df, vecs = emb
    cent = simsearch.ivf_centroids(df, k=4, sample_size=40)
    assigned = simsearch.ivf_assign(df, cent)
    cell_of = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    queries = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]])], "qid long, embedding array<float>"
    )
    got = simsearch.ivf_knn_join(assigned, queries, cent, k=5, nprobe=1).collect()
    assert {r["vec_id"] for r in got} <= {v for v, c in cell_of.items() if c == cell_of[0]}
    ids = [r["vec_id"] for r in sorted(got, key=lambda r: (-r["cos"], r["vec_id"]))]
    assert ids[0] == 0 and 7 in ids[:2]


def test_knn_join_guard_points_at_ivf_knn_join(spark, emb):
    """Beyond the broadcast guard the error must name the real
    distributed alternative — and that alternative must work on the
    same inputs."""
    df, vecs = emb
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in vecs[i]]) for i in range(10)],
        "qid long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="ivf_knn_join"):
        simsearch.knn_join(df, queries, k=3, max_broadcast_queries=5)
    cent = simsearch.ivf_centroids(df, k=4, sample_size=40)
    assigned = simsearch.ivf_assign(df, cent)
    assert simsearch.ivf_knn_join(assigned, queries, cent, k=3, nprobe=2).count() == 30


def test_doc_dup_clusters_composition(spark, tmp_path):
    """dedup chain edges → Graph → connected components recovers
    exactly the fingerprint groups: planted groups of sizes 4, 3, 2
    (plus whitespace/case variants that normalize equal, and unique
    docs that must NOT appear) yield the histogram {4:1, 3:1, 2:1}."""
    from quiver_spark.queries import q_doc_dup_clusters

    rows = []
    did = 0

    def add(text, n):
        nonlocal did
        for i in range(n):
            # variants that normalize to the same fingerprint
            t = text if i % 2 == 0 else ("  " + text.upper() + " ")
            rows.append((did, t))
            did += 1

    add("alpha beta gamma", 4)
    add("delta epsilon", 3)
    add("zeta eta theta", 2)
    for u in range(5):  # unique docs: excluded from the dup graph
        rows.append((did, f"unique text number {u}"))
        did += 1
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r["cluster_size"]: r["n_clusters"] for r in q_doc_dup_clusters(spark, str(tmp_path)).collect()}
    assert got == {4: 1, 3: 1, 2: 1}, got


def test_lsh_multi_table_amplifies_recall(spark, emb):
    """OR-amplification: the multi-table candidate set is a superset of
    any single table's, so recall is monotone in n_tables; with 4 bits
    × 6 tables the fixed 8-query gate clears 0.9 at sf0.001 data too
    (deterministic — seeded planes)."""
    from quiver_spark import simsearch
    from pyspark.sql import functions as F

    df, vecs = emb
    qvec = [float(x) for x in vecs[0]]
    brute = {r["vec_id"] for r in simsearch.cosine_topk(df, qvec, k=10).collect()}
    b1 = simsearch.lsh_bucket(df, n_bits=4, n_tables=1)
    b6 = simsearch.lsh_bucket(df, n_bits=4, n_tables=6)
    r1 = {r["vec_id"] for r in simsearch.lsh_probe_topk(b1, qvec, k=10, n_bits=4, n_tables=1).collect()}
    r6 = {r["vec_id"] for r in simsearch.lsh_probe_topk(b6, qvec, k=10, n_bits=4, n_tables=6).collect()}
    assert len(brute & r6) >= len(brute & r1)
    # table-0 buckets of the multi-table frame equal the single-table
    # frame's buckets exactly (key = (t << n_bits) | bits)
    one = {(r["vec_id"], r["bucket"]) for r in b1.collect()}
    zero = {(r["vec_id"], r["bucket"]) for r in b6.filter(F.col("bucket") < 16).collect()}
    assert one == zero


def test_canonical_keep_table_planted_clusters(spark):
    """Planted near-dup groups {1,2,3} and {10,11}; 20 and 21 are
    singletons. The keep table must keep exactly the min id per
    cluster and every singleton, and components must label by min id."""
    from quiver_spark import dedup

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    rows = {r["doc_id"]: (r["component"], r["keep"]) for r in
            dedup.canonical_keep_table(docs, pairs).collect()}
    assert rows == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (21, True),
    }
    kept = [i for i, (_, k) in rows.items() if k]
    assert sorted(kept) == [1, 10, 20, 21]


def test_knn_dispatcher_routes_instead_of_raising(spark, emb):
    """Verdict item 6: beyond the broadcast guard the dispatcher must
    ROUTE to the distributed ivf path (knn_join alone raises there);
    within the guard it returns the exact broadcast result."""
    from quiver_spark import simsearch

    df, _ = emb
    queries = df.limit(8).select(F.col("vec_id").alias("qid"), "embedding")
    exact = {(r["qid"], r["vec_id"]) for r in simsearch.knn_join(df, queries, k=3).collect()}
    # within guard → exact path, identical pairs
    small = {(r["qid"], r["vec_id"]) for r in simsearch.knn(df, queries, k=3).collect()}
    assert small == exact
    # beyond guard: knn_join raises, knn routes (nprobe=cells → exact)
    with pytest.raises(ValueError, match="ivf_knn_join"):
        simsearch.knn_join(df, queries, k=3, max_broadcast_queries=4)
    routed = simsearch.knn(
        df, queries, k=3, max_broadcast_queries=4, ivf_cells=8, nprobe=8
    )
    assert {(r["qid"], r["vec_id"]) for r in routed.collect()} == exact


def test_knn_dispatcher_loads_index_via_tableio(spark, emb, tmp_path):
    """The big path can consume the jobs/run.py ann-index layout
    (cell-partitioned vectors + centroid table) through TableIO."""
    from quiver_spark import simsearch
    from quiver_spark.table_io import TableIO

    df, _ = emb
    io = TableIO(spark, "parquet")
    cent = simsearch.ivf_centroids(df, k=8)
    assigned = simsearch.ivf_assign(df, cent)
    path = str(tmp_path / "annidx")
    io.write(assigned, path, partition_by=["cell"])
    io.write(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
            "cell int, centroid array<double>",
        ),
        path + "_centroids",
    )
    queries = df.limit(6).select(F.col("vec_id").alias("qid"), "embedding")
    exact = {(r["qid"], r["vec_id"]) for r in simsearch.knn_join(df, queries, k=3).collect()}
    routed = simsearch.knn(
        df, queries, k=3, max_broadcast_queries=2, index_path=path, nprobe=8
    )
    assert {(r["qid"], r["vec_id"]) for r in routed.collect()} == exact


def test_knn_dispatcher_honors_caller_centroids(spark, emb):
    """A caller-supplied quantizer must be USED, not silently retrained:
    centroids without assigned → assign against the caller's centroids
    (full probe of their 4 cells == exact); assigned without centroids
    → hard error (cell routing needs the matching matrix)."""
    from quiver_spark import simsearch

    df, _ = emb
    queries = df.limit(6).select(F.col("vec_id").alias("qid"), "embedding")
    exact = {(r["qid"], r["vec_id"]) for r in simsearch.knn_join(df, queries, k=3).collect()}
    my_cent = simsearch.ivf_centroids(df, k=4)
    routed = simsearch.knn(
        df, queries, k=3, max_broadcast_queries=2, centroids=my_cent, nprobe=4
    )
    # nprobe == the CALLER's cell count → exact only if their 4-cell
    # quantizer was honored (the default inline build is 64 cells,
    # where nprobe=4 probes a fraction of the corpus)
    assert {(r["qid"], r["vec_id"]) for r in routed.collect()} == exact
    with pytest.raises(ValueError, match="centroid"):
        simsearch.knn(
            df,
            queries,
            k=3,
            max_broadcast_queries=2,
            assigned=simsearch.ivf_assign(df, my_cent),
        )


def test_minhash_short_docs_never_collide_in_lsh(spark):
    """Docs below k_shingle tokens must get NULL signatures: Spark's
    xxhash64(NULL) returns the SEED (non-null), so the unguarded
    explode_outer placeholder gave every short doc ONE identical
    signature — flooding every LSH band with bogus candidate pairs."""
    df = spark.createDataFrame(
        [
            (1, "hi"),
            (2, "yo"),
            (3, "a b"),
            (4, "totally unrelated words one"),
            (5, "totally unrelated words one"),
        ],
        "doc_id long, text string",
    )
    sig = dedup.minhash_signatures(df, k_shingle=3, n_hashes=8)
    rows = {r["doc_id"]: r["sig"] for r in sig.collect()}
    for short_id in (1, 2, 3):
        assert rows[short_id][0] is None
    pairs = {(r["a"], r["b"]) for r in dedup.lsh_candidate_pairs(sig, n_bands=4).collect()}
    assert pairs == {(4, 5)}


def test_lsh_rejects_n_bands_beyond_signature_length(spark):
    """n_bands > len(sig) floors rows_per_band to 0 — every band slice
    empty, all docs in one bucket: the quadratic self-join LSH exists
    to avoid. Must raise, not silently degenerate."""
    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "five six seven eight")],
        "doc_id long, text string",
    )
    sig = dedup.minhash_signatures(df, n_hashes=8)
    with pytest.raises(Exception, match="n_bands=16 exceeds signature length"):
        dedup.lsh_candidate_pairs(sig, n_bands=16).collect()


def test_jaccard_verify_exposes_cache_handles(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "x y z w")],
        "doc_id long, text string",
    )
    out = dedup.near_duplicate_pairs(df, threshold=0.5)
    assert {(r["a"], r["b"]) for r in out.collect()} == {(1, 2)}
    caches = out._qs_caches  # noqa: SLF001
    assert len(caches) == 2 and all(c.is_cached for c in caches)
    for c in caches:
        c.unpersist()
    assert not any(c.is_cached for c in caches)

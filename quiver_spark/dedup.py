"""Deduplication operators for training-data pipelines.

Scale shapes (all JVM/codegen — explode+groupBy, no Python kernels):

- **exact**: hash-groupBy on the canonical fingerprint; one shuffle on
  the digest. At 100 TB the digest groupBy is the cheapest possible
  dedup — 16-byte keys, map-side partial aggregation.
- **minhash + LSH**: word-shingles → n permuted 64-bit hashes → min
  per permutation → band buckets → candidate pairs join only WITHIN
  buckets (the quadratic all-pairs join never happens) → exact
  jaccard verify on the candidates. Permutation hashing uses
  ``(a_j * h + b_j) mod 2^31-1`` over a base ``xxhash64`` — all
  column arithmetic, codegen'd.
- **simhash**: 64-bit signature from per-token hash bit votes; near-dup
  candidates = equal 16-bit band (hamming ≤ 3 of 4 bands ⇒ at least
  one identical band by pigeonhole when hamming ≤ 3).
- **jaccard verify**: array_intersect/array_union on distinct shingle
  sets — exact, only on LSH candidates.

Skew note: a boilerplate shingle ("all rights reserved …") creates hot
LSH buckets; ``lsh_candidate_pairs`` caps bucket width
(``max_bucket``) and drops wider buckets (standard practice — a
bucket with thousands of colliding docs is boilerplate, handled by the
exact-dup pass, not pairwise jaccard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.textops import fingerprint, shingles

# 31-bit Mersenne field: a*h stays under 2^62, so ANSI-mode long
# arithmetic never overflows in the permuted-min aggregates; 31-bit
# min-hashes are ample for shingle-set sketching
_MERSENNE31 = (1 << 31) - 1


def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fp, n_docs, keep_id): groups of byte-identical (normalized)
    documents with the representative = min id."""
    return (
        fingerprint(df, text_col, id_col)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one document (min id) per normalized fingerprint."""
    fp = fingerprint(df, text_col, id_col)
    keep = fp.groupBy("fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keep, id_col, "left_semi")


def _perm_coeffs(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via splitmix-style avalanche of the
    seed — no RNG state, reproducible at any parallelism."""
    coeffs = []
    x = seed & ((1 << 64) - 1)
    for _ in range(2 * n_hashes):
        x = (x + 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
        coeffs.append((z ^ (z >> 31)) % _MERSENNE31)
    return [(coeffs[2 * i] | 1, coeffs[2 * i + 1]) for i in range(n_hashes)]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>[n_hashes]) minhash signature per document.

    One explode + one groupBy(id) with ``n_hashes`` min-aggregates —
    map-side combine keeps the shuffle at one row per (doc, 64 longs).
    Documents with fewer than k_shingle tokens get an empty signature
    row (sig of nulls) and never collide: the base hash is guarded to
    NULL on the explode_outer placeholder row (Spark's ``xxhash64(NULL)``
    returns the SEED, a non-null value — unguarded, every short doc
    would share one identical signature and flood every LSH band with
    bogus candidate pairs).
    """
    h = F.when(
        F.col("_sh").isNotNull(), F.pmod(F.xxhash64(F.col("_sh")), F.lit(_MERSENNE31))
    )
    exploded = df.select(
        F.col(id_col), F.explode_outer(shingles(text_col, k_shingle)).alias("_sh")
    ).withColumn("_h", h)
    aggs = [
        F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))).alias(f"_m{j}")
        for j, (a, b) in enumerate(_perm_coeffs(n_hashes, seed))
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"_m{j}" for j in range(n_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
    max_bucket: int = 64,
) -> DataFrame:
    """(a, b) candidate pairs (a < b) sharing at least one LSH band.

    Band bucket = xxhash64(band index, concat of the band's rows);
    self-join happens per bucket only. Buckets wider than
    ``max_bucket`` are dropped (boilerplate guard — see module doc).
    """
    sig = sig_df.filter(F.col("sig")[0].isNotNull())
    # misconfiguration guard: n_bands > len(sig) floors rows_per_band
    # to 0, every band slice is empty, and ALL docs share one bucket
    # per band — the quadratic self-join LSH exists to avoid. The
    # signature length is data (array column), not schema, so the
    # check runs per row inside the used path (one comparison/row).
    sig = sig.withColumn(
        "sig",
        F.when(F.size("sig") >= F.lit(n_bands), F.col("sig")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"lsh_candidate_pairs: n_bands={n_bands} exceeds signature length "),
                    F.size("sig").cast("string"),
                )
            )
        ),
    )
    rows_per_band = F.floor(F.size("sig") / F.lit(n_bands)).cast("int")
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        b.cast("string"),
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        ),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    small = (
        bands.groupBy("band", "bucket")
        .agg(F.collect_list(id_col).alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
    )
    pairs = small.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x: F.transform(F.col("ids"), lambda y: F.struct(x.alias("a"), y.alias("b"))),
                    )
                ),
                lambda p: p["a"] < p["b"],
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    return pairs.dropDuplicates(["a", "b"])


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact shingle-set jaccard on candidate pairs → (a, b, jaccard)
    for pairs ≥ threshold. Shingles are computed for CANDIDATE docs
    only (semi-join first) and cached for both join sides; arrays
    deduped via array_distinct."""
    # only candidate docs need exact shingle sets — semi-join the
    # corpus down to ids that appear in any pair, shingle those ONCE,
    # and cache the result for both join sides. Without this the
    # corpus is shingled twice more here (once per side) on top of
    # minhash's pass: 3 full shingle scans -> 1 full + 1 candidates-
    # only. pairs is persisted because it now has three consumers
    # (id union + both joins); both caches are candidate-sized and
    # re-exposed on the result (``_qs_caches``) so callers can release
    # them after materializing.
    pairs = pairs.persist()
    cand_ids = (
        pairs.select(F.col("a").alias(id_col))
        .unionByName(pairs.select(F.col("b").alias(id_col)))
        .dropDuplicates()
    )
    sh = (
        df.join(cand_ids, id_col, "left_semi")
        .select(F.col(id_col), F.array_distinct(shingles(text_col, k_shingle)).alias("_s"))
        .persist()
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "a").withColumnRenamed("_s", "_sa"), "a")
        .join(sh.withColumnRenamed(id_col, "b").withColumnRenamed("_s", "_sb"), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("_sa", "_sb"))
                / F.greatest(F.size(F.array_union("_sa", "_sb")), F.lit(1))
            ).alias("jaccard"),
        )
    )
    out = j.filter(F.col("jaccard") >= threshold)
    out._qs_caches = (pairs, sh)  # noqa: SLF001 — caller releases after materializing
    return out


def near_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """The full minhash→LSH→verify pipeline: (a, b, jaccard)."""
    sig = minhash_signatures(df, text_col, id_col, k_shingle, n_hashes, seed)
    cand = lsh_candidate_pairs(sig, id_col, n_bands)
    return jaccard_verify(df, cand, text_col, id_col, k_shingle, threshold)


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash: per-token xxhash64, each bit votes ±1, sign of
    the vote sum per bit. 64 sum-aggregates after one explode —
    shuffle is one row per doc."""
    from quiver_spark.textops import tokens

    tok = df.select(F.col(id_col), F.explode_outer(tokens(text_col)).alias("_t"))
    h = F.xxhash64("_t")
    aggs = [
        F.sum(
            F.when(F.col("_t").isNull(), 0).otherwise(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            )
        ).alias(f"_b{i}")
        for i in range(64)
    ]
    votes = tok.groupBy(id_col).agg(*aggs)
    # shiftleft(1L, 63) wraps to Long.MIN — the correct two's-complement
    # bit pattern (F.lit(1 << 63) would overflow the Py4J long protocol)
    sig = sum(
        (
            F.when(F.col(f"_b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(64)
        ),
        F.lit(0).cast("long"),
    )
    return votes.select(id_col, sig.alias("simhash"))


def simhash_candidate_pairs(
    sim_df: DataFrame, id_col: str = "doc_id", max_bucket: int | None = None
) -> DataFrame:
    """(a, b) pairs sharing at least one of four 16-bit simhash bands —
    catches every pair with hamming distance ≤ 3 (pigeonhole). That
    guarantee holds only uncapped, so the hot-bucket guard is OPT-IN
    here (default ``max_bucket=None``), unlike the minhash-LSH path
    where banding is probabilistic to begin with.

    Pass ``max_bucket`` to drop buckets wider than it before pairing
    (same guard as :func:`lsh_candidate_pairs`): degenerate corpora —
    empty/whitespace docs all hash to simhash 0, shared boilerplate
    concentrates one band value — make the self-pairing quadratic in
    the hot bucket's width. Capping trades the hamming-≤3 recall
    guarantee for bounded work; callers that cap can measure the loss
    with :func:`simhash_bucket_stats`.
    """
    bands = sim_df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bits"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bits")
    small = bands.groupBy("band", "bits").agg(
        F.collect_list(id_col).alias("ids"), F.count(F.lit(1)).alias("n")
    ).filter(F.col("n") > 1)
    if max_bucket is not None:
        small = small.filter(F.col("n") <= max_bucket)
    pairs = small.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x: F.transform(F.col("ids"), lambda y: F.struct(x.alias("a"), y.alias("b"))),
                    )
                ),
                lambda p: p["a"] < p["b"],
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    return pairs.dropDuplicates(["a", "b"])


def simhash_bucket_stats(
    sim_df: DataFrame, id_col: str = "doc_id", max_bucket: int = 64
) -> DataFrame:
    """One row per band: total buckets, buckets wider than
    ``max_bucket``, and docs inside those dropped buckets — the recall
    loss a capped :func:`simhash_candidate_pairs` run would pay, made
    visible instead of silent. Broadcast-small output (<= 4 rows)."""
    bands = sim_df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bits"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bits")
    widths = bands.groupBy("band", "bits").agg(F.count(F.lit(1)).alias("n"))
    return widths.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("n") > max_bucket).cast("long")).alias("n_dropped_buckets"),
        F.sum(F.when(F.col("n") > max_bucket, F.col("n")).otherwise(F.lit(0))).alias("n_dropped_docs"),
    )


def canonical_keep_table(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The dedup deliverable at 100 TB: given verified near-dup pairs
    ``(a, b)``, cluster them with distributed connected components and
    emit one row per document — ``(id, component, keep)`` — keeping
    exactly one canonical doc per cluster. Canonical = the min doc id
    in the cluster (deterministic; ``connected_components``' exactness
    contract labels every component by its min vertex id, so no second
    per-component aggregate is needed). Documents in no pair form
    singleton clusters and keep themselves via the left join's
    coalesce. Downstream: ``filter(keep)`` is the deduped corpus;
    ``filter(~keep)`` joined back on ``component`` audits what was
    dropped and why.

    Shape at scale: pairs ≪ docs (candidates only), so the CC runs on
    the small pair graph; the final left join is the only doc-sized
    shuffle. [pub: Verizon/quiver Graph.scala#components composed with
    the minhash pipeline — the reference clusters in-memory; here the
    cluster step IS the distributed CC flagship.]
    """
    from quiver_spark.algorithms import connected_components
    from quiver_spark.graph import Graph

    e = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit("dup").alias("etype")
    )
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("name", F.lit("doc"))
    )
    comp = connected_components(Graph(v, e)).state
    out = docs.select(F.col(id_col)).join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    )
    c = F.coalesce(F.col("component"), F.col(id_col))
    return out.select(
        F.col(id_col), c.alias("component"), (c == F.col(id_col)).alias("keep")
    )

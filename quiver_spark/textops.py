"""Text-analysis operators for training-data pipelines over the
``documents`` table (doc_id, text, lang, source, n_chars).

Everything here is JVM-side `pyspark.sql.functions` — whole-stage
codegen, no Python in the hot path. At 100 TB these are single-pass
map-only columns: no shuffle, filters and projections push into the
parquet scan. These ops are not part of quiver (a graph library); they
are the document-pipeline layer the task brief requires alongside the
graph engine, and each has a DuckDB oracle in quiver_spark.queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword marker sets for the language-ID
# heuristic: count hits per language's marker list, argmax with
# lexicographic tie-break. Real pipelines would use fastText/cld3;
# the heuristic keeps everything JVM-side and oracle-checkable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

_PUNCT_RE = r"[!?.,;:]"
_WS_RE = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text; empty text → []."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, _WS_RE))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish count: splits on whitespace AND on letter/digit
    boundaries (a cheap BPE proxy — real tokenizers aren't in this
    container). regexp_count is codegen'd, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))).cast("long")


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality signals: length, token stats, punctuation /
    digit / uppercase / stopword ratios. One projection, zero shuffles."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("long")
    n_tok = token_count(text_col)
    stop_hits = sum(
        (F.regexp_count(c, F.lit(rf"\b{w}\b")) for w in LANG_MARKERS["en"]),
        F.lit(0),
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.regexp_count(c, F.lit(_PUNCT_RE)) / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (F.regexp_count(c, F.lit(r"[0-9]")) / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (F.regexp_count(c, F.lit(r"[A-Z]")) / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
        (stop_hits / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
        (n_chars / F.greatest(n_tok, F.lit(1))).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scalar quality score in [0,1]: rewards stopword presence and
    moderate token length, penalizes punctuation/digit noise — the
    standard cheap pre-filter shape (C4/Gopher-style rules)."""
    f = quality_features(df, text_col, id_col)
    score = (
        F.lit(0.4) * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 10, F.lit(1.0)))
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.col("digit_ratio") * 10, F.lit(1.0)))
        + F.lit(0.1) * F.when((F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 12), 1.0).otherwise(0.0)
    )
    return f.select(id_col, score.alias("quality"))


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram-marker language ID: per-language marker hit counts,
    argmax with lexicographic tie-break ('und' when zero hits
    everywhere). Pure codegen — a stack of regexp_count columns."""
    c = F.col(text_col)
    # greatest() over (key, lang, hits) structs compares field-by-field;
    # key = hits*10 + per-language epsilon decreasing in lang order, so
    # hit ties resolve to the lexicographically SMALLEST language
    # (epsilon ≤ |langs| < 10 can never outvote a real hit difference).
    scores = [
        F.struct(
            (
                sum((F.regexp_count(c, F.lit(rf"\b{w}\b")) for w in words), F.lit(0)) * 10
                + (len(LANG_MARKERS) - i)
            ).alias("key"),
            F.lit(lang).alias("lang"),
            sum((F.regexp_count(c, F.lit(rf"\b{w}\b")) for w in words), F.lit(0)).alias("hits"),
        )
        for i, (lang, words) in enumerate(sorted(LANG_MARKERS.items()))
    ]
    best = F.greatest(*scores)
    return df.select(
        F.col(id_col),
        F.when(best["hits"] == 0, F.lit("und")).otherwise(best["lang"]).alias("lang_pred"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical content fingerprint: md5 of whitespace-normalized
    lowercase text. md5 (not xxhash64) so the DuckDB oracle computes
    the identical digest."""
    c = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(c)), _WS_RE, " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingle array (joined with single spaces) — the
    substrate for minhash/jaccard. Pure array functions: transform
    over a sequence of slice+join, no explode until the caller wants
    one."""
    t = tokens(col)
    n = F.size(t)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(t, i, F.lit(k)), " "),
        )
    )


def min_shingle_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """The 1-permutation minhash primitive: lexicographic min of the
    md5'd shingle set (documents sharing any low shingle collide —
    the LSH band building block, oracle-checkable since DuckDB md5
    and string-min agree)."""
    sh = shingles(text_col, k)
    return df.select(
        F.col(id_col),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("min_shingle_md5"),
    )

"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is REAL and tested — schema, deterministic
synthesis, partition-friendly Arrow kernels with correct batch shapes —
while the media decoding itself is STUBBED (this container has no
PIL/ffmpeg/torchaudio): ``decode=\"real\"`` raises NotImplementedError
at the call site; the default ``decode=\"fake\"`` derives a
deterministic feature vector from the payload's sha256, so every
downstream stage (dedup by content digest, feature similarity,
frame sampling) exercises the genuine distributed path with stable
bytes.

Asset schema: ``(asset_id long, kind string ∈ {image,audio,video},
payload binary, meta map<string,string>)`` — metadata typed, payload
opaque, exactly how a 100 TB lake stores media next to text.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KINDS = ("image", "audio", "video")
FEATURE_DIM = 16


def synthesize_assets(spark: SparkSession, n_assets: int = 300, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """Deterministic fake assets: payload bytes from an avalanche of
    (seed, asset_id); meta carries plausible typed fields."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            kinds = [KINDS[int(i) % len(KINDS)] for i in ids]
            payloads = [
                hashlib.sha256(f"{seed}:{int(i)}".encode()).digest() * (2 + int(i) % 5) for i in ids
            ]
            metas = [
                {
                    "width": str(64 + (int(i) * 7) % 512),
                    "height": str(64 + (int(i) * 11) % 512),
                    "duration_ms": str(1000 + (int(i) * 13) % 60000),
                }
                for i in ids
            ]
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    num_partitions = num_partitions or max(4, spark.sparkContext.defaultParallelism)
    return spark.range(0, n_assets, numPartitions=num_partitions).mapInPandas(
        gen, "asset_id long, kind string, payload binary, meta map<string,string>"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic unit-norm vector from sha256(payload)."""
    d = hashlib.sha256(payload).digest()
    raw = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / 2**32) - 0.5
    n = np.linalg.norm(v)
    return (v / (n if n else 1.0)).astype(np.float32)


def extract_features(assets: DataFrame, decode: str = "fake", dim: int = FEATURE_DIM) -> DataFrame:
    """(asset_id, kind, feature array<float>, payload_sha) — Arrow
    kernel over whole payload batches; ``decode=\"real\"`` is the stub
    boundary where a PIL/ffmpeg pipeline would plug in."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":  # pragma: no cover - stub boundary
                raise NotImplementedError(
                    "real media decoding needs PIL/ffmpeg/torchaudio — not in this container"
                )
            feats = [_fake_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "payload_sha": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(gen, "asset_id long, kind string, feature array<float>, payload_sha string")


def resize_meta(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-JVM metadata transform: computes the post-resize geometry
    (aspect-preserving clamp to max_side) WITHOUT touching payloads —
    the planning half of a resize job; the pixel half is the stub."""
    w = F.element_at("meta", "width").cast("int")
    h = F.element_at("meta", "height").cast("int")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double"))
    return assets.filter(F.col("kind") == "image").select(
        "asset_id",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("out_width"),
        F.round(h * scale).cast("int").alias("out_height"),
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (asset_id, frame_ts_ms) rows via a
    JVM sequence explode over duration metadata — the shuffle-free
    fan-out a real frame extractor would map over."""
    dur = F.element_at("meta", "duration_ms").cast("long")
    return assets.filter(F.col("kind") == "video").select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), dur - 1, F.lit(every_ms))).alias("frame_ts_ms"),
    )

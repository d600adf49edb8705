"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is STUBBED —
the decode libraries (PIL/ffmpeg/librosa) are not in this container.
``deterministic_fake=True`` (default in tests) replaces decoding with a
seeded hash-derived feature so pipelines are end-to-end testable;
``deterministic_fake=False`` raises NotImplementedError at the decode
boundary, which is exactly where a real codec plugs in.

Media table shape::

    media(media_id: long, kind: string,       -- image|audio|video
          payload: binary, meta: map<string,string>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "feature array<float>"
)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, 128 + (i % 64), dtype=np.uint8).tobytes()
        rows.append((i, kind, bytearray(payload), {"src": f"synth/{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str, feat_dim: int) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real codec: features derived from
    the payload bytes only, so results are stable across runs/executors."""
    h = np.frombuffer(payload[: (len(payload) // 8) * 8], dtype=np.uint64)
    seed = int(h.sum() % (2**32)) if len(h) else len(payload)
    rng = np.random.default_rng(seed)
    width = 16 + seed % 512
    height = 16 + (seed >> 9) % 512
    n_frames = 1 if kind == "image" else 1 + seed % 64
    feature = rng.standard_normal(feat_dim).astype(np.float32)
    return width, height, n_frames, feature.tolist()


def decode_features(
    media: DataFrame,
    feat_dim: int = 32,
    batch_size_hint: int = 256,
    deterministic_fake: bool = True,
) -> DataFrame:
    """media → (media_id, kind, width, height, n_frames, feature).

    mapInPandas over Arrow batches: payloads never round-trip through
    Python row objects; each batch is decoded vectorized. On a real
    cluster, repartition upstream so each task holds
    O(batch_size_hint) payloads (media bytes dominate memory)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "width": [], "height": [],
                   "n_frames": [], "feature": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if not deterministic_fake:
                    raise NotImplementedError(
                        "real media decode requires codec libraries not in "
                        "this container; plug PIL/ffmpeg here"
                    )
                w, h, nf, feat = _fake_decode(bytes(payload or b""), kind, feat_dim)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(op, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, deterministic_fake: bool = True) -> DataFrame:
    """video → (media_id, frame_idx) sampled frame indices. Decode is
    stubbed; the plumbing (filter by kind, explode frames) is real."""
    feats = decode_features(media.filter(F.col("kind") == "video"),
                            deterministic_fake=deterministic_fake)
    return feats.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Compute target (width, height) preserving aspect ratio — the
    metadata half of a resize; the pixel work is behind the decode stub."""
    feats = decode_features(media)
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return feats.select(
        "media_id", "kind", "width", "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )

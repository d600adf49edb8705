"""Multimodal columns: image/audio/video as opaque binary.

Images (PPM/BMP/PNG) and audio (PCM16 WAV) are REALLY decoded — the
pure-stdlib/NumPy codecs in functions/codecs.py need no container
libraries. Decoding runs inside Arrow-batched ``mapInPandas``
(payload bytes never round-trip through Python row objects); features
are fixed-dim so the output schema is stable for downstream ANN/dedup.

Video is decoded for real too, for uncompressed 24bpp AVI ('DIB '
frames — functions/codecs.py): frame sampling, per-frame features and
the video→image handoff (``sample_frames`` re-encodes sampled frames
as PPM rows) all run on actual pixels. Compressed codecs (MJPEG/H.264)
raise NotImplementedError at the documented boundary — exactly where
ffmpeg would plug in. The legacy ``deterministic_fake=True`` mode
(hash-derived features) is kept for plumbing tests and for payloads in
formats outside the codec scope.

Media table shape::

    media(media_id: long, kind: string,       -- image|audio|video
          payload: binary, meta: map<string,string>)
"""

from __future__ import annotations

from collections.abc import Iterator
from struct import error as struct_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codecs

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


def synth_media_real(spark: SparkSession, n: int = 48, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: seeded gradient+noise
    images encoded as PPM/BMP/PNG round-robin and sine-mix PCM16 WAVs."""
    rng = np.random.default_rng(seed)
    rows = []
    encoders = [codecs.encode_ppm, codecs.encode_bmp, codecs.encode_png]
    for i in range(n):
        if i % 4 < 3:
            h, w = 12 + i % 9, 16 + i % 13
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * 7 + i) % 256, (yy * 13 + 2 * i) % 256,
                 rng.integers(0, 256, (h, w))],
                axis=2,
            ).astype(np.uint8)
            rows.append((i, "image", bytearray(encoders[i % 3](img)),
                         {"src": f"synth/{i}"}))
        else:
            rate = 8000
            t = np.arange(rate // 10 + 40 * (i % 5)) / rate
            freq = 220.0 * (1 + i % 7)
            samples = np.floor(9000 * np.sin(2 * np.pi * freq * t)
                               + 3000 * np.sin(2 * np.pi * 2.5 * freq * t)
                               + 0.5).astype(np.int16)
            rows.append((i, "audio", bytearray(codecs.encode_wav(samples, rate)),
                         {"src": f"synth/{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def formula_frames(i: int) -> tuple[np.ndarray, int]:
    """The closed-form video clip for id ``i``: (frames, fps) with
    pixels r=(7x+13y+5t+i)%256, g=(3x+5y+11t+2i)%256,
    b=(11x+y+7t+3i)%256 over w=8+i%9, h=8+i%7, n_frames=4+i%13,
    fps=5+i%7. The SINGLE Python source of the formula — shared by
    synth_media_video and the driver query builder so the two engine
    copies cannot drift from the oracle SQL recomputations."""
    w, h, nf = 8 + i % 9, 8 + i % 7, 4 + i % 13
    tt, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
    frames = np.stack(
        [(7 * xx + 13 * yy + 5 * tt + i) % 256,
         (3 * xx + 5 * yy + 11 * tt + 2 * i) % 256,
         (11 * xx + yy + 7 * tt + 3 * i) % 256], axis=3).astype(np.uint8)
    return frames, 5 + i % 7


def synth_media_video(spark: SparkSession, n: int = 16) -> DataFrame:
    """Deterministic real-AVI media table built from formula_frames —
    an oracle can recompute any frame statistic without touching
    bytes. (No seed: the corpus IS the closed-form formula.)"""
    rows = []
    for i in range(n):
        frames, fps = formula_frames(i)
        rows.append((i, "video", bytearray(codecs.encode_avi(frames, fps=fps)),
                     {"src": f"synth/{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def video_feature(frames: np.ndarray, n_buckets: int = 8) -> list[float]:
    """(N, H, W, 3) uint8 → per-time-bucket mean RGB in [0, 1]
    (n_buckets×3 floats): a fixed-dim color-motion trajectory embedding
    compatible with the ANN/near-dup operators regardless of length."""
    n = frames.shape[0]
    bounds = np.linspace(0, n, n_buckets + 1).astype(int)
    feat = np.empty(n_buckets * 3, dtype=np.float32)
    for i in range(n_buckets):
        chunk = frames[bounds[i]:max(bounds[i + 1], bounds[i] + 1)]
        feat[3 * i:3 * i + 3] = chunk.reshape(-1, 3).mean(axis=0) / 255.0
    return feat.tolist()


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


def image_feature(img: np.ndarray, grid: int = 4) -> list[float]:
    """(H, W, 3) uint8 → grid×grid×3 mean-pool in [0, 1] — a fixed-dim,
    roughly resolution-invariant color-layout embedding (48 floats for
    grid=4), ready for the ANN/near-dup operators."""
    h, w = img.shape[:2]
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    feat = np.empty(grid * grid * 3, dtype=np.float32)
    k = 0
    for i in range(grid):
        for j in range(grid):
            cell = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                       xs[j]:max(xs[j + 1], xs[j] + 1)]
            feat[k:k + 3] = cell.reshape(-1, 3).mean(axis=0) / 255.0
            k += 3
    return feat.tolist()


def audio_feature(pcm: np.ndarray, n_windows: int = 16) -> list[float]:
    """(frames, channels) int16 → per-window RMS in [0, 1] (mono mix)."""
    mono = pcm.astype(np.float64).mean(axis=1) / 32768.0
    bounds = np.linspace(0, len(mono), n_windows + 1).astype(int)
    return [
        float(np.sqrt(np.mean(np.square(mono[bounds[i]:max(bounds[i + 1], bounds[i] + 1)]))))
        if len(mono) else 0.0
        for i in range(n_windows)
    ]


def _real_decode(payload: bytes, kind: str, feat_dim: int) -> tuple[int, int, int, list[float]]:
    """Codec-backed decode for image (PPM/BMP/PNG), audio (WAV) and
    video (uncompressed AVI); everything else raises at the documented
    ffmpeg plug-in boundary."""
    fmt = codecs.sniff_format(payload)
    if fmt in ("ppm", "bmp", "png"):
        img = codecs.decode_image(payload)
        feat = image_feature(img)
        feat = (feat + [0.0] * feat_dim)[:feat_dim]
        return img.shape[1], img.shape[0], 1, feat
    if fmt == "wav":
        rate, _, pcm = codecs.decode_wav(payload)
        feat = audio_feature(pcm)
        feat = (feat + [0.0] * feat_dim)[:feat_dim]
        return rate, pcm.shape[1], pcm.shape[0], feat
    if fmt == "avi":
        _fps, frames = codecs.decode_avi(payload)
        feat = video_feature(frames)
        feat = (feat + [0.0] * feat_dim)[:feat_dim]
        return frames.shape[2], frames.shape[1], frames.shape[0], feat
    raise NotImplementedError(
        f"no pure-stdlib codec for kind={kind} format={fmt}; "
        "plug ffmpeg/PIL here (compressed video and exotic formats)"
    )


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
    O(batch_size_hint) payloads (media bytes dominate memory).

    ``deterministic_fake=False`` uses the real codecs
    (functions/codecs.py) for PPM/BMP/PNG images and PCM16 WAV audio;
    for audio, width=sample_rate, height=n_channels, n_frames=frames."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        for pdf in batches:
            out = {"media_id": [], "kind": [], "width": [], "height": [],
                   "n_frames": [], "feature": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                decode = _fake_decode if deterministic_fake else _real_decode
                try:
                    w, h, nf, feat = decode(bytes(payload or b""), kind, feat_dim)
                except (ValueError, _struct.error):
                    # quarantine, don't kill the stage: a malformed
                    # payload yields a null-feature row (same stance as
                    # decode_media's decoded=false rows); the documented
                    # NotImplementedError plug-in boundary still raises
                    w = h = nf = None
                    feat = None
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(op, FEATURE_SCHEMA)


DECODED_SCHEMA = (
    "media_id long, kind string, format string, width int, height int, "
    "n_channels int, sample_rate int, n_frames long, duration double, "
    "mean_rgb array<double>, rms double, feature array<float>, decoded boolean"
)


def decode_media(media: DataFrame, grid: int = 4, n_windows: int = 16) -> DataFrame:
    """Full typed decode: media → per-item metadata + modality features.

    Unsupported payloads (video, unknown formats) come back with
    ``decoded=false`` and null metadata instead of failing the stage —
    at 100 TB a poisonous payload must not kill the pipeline; the
    undecodable rows stay joinable for quarantine/retry."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload or b"")
                fmt = codecs.sniff_format(raw)
                base = dict(media_id=mid, kind=kind, format=fmt, width=None,
                            height=None, n_channels=None, sample_rate=None,
                            n_frames=None, duration=None, mean_rgb=None,
                            rms=None, feature=None, decoded=False)
                try:
                    if fmt in ("ppm", "bmp", "png"):
                        img = codecs.decode_image(raw)
                        base.update(
                            width=img.shape[1], height=img.shape[0],
                            n_channels=3, n_frames=1,
                            mean_rgb=[float(x) for x in
                                      img.reshape(-1, 3).mean(axis=0)],
                            feature=image_feature(img, grid), decoded=True)
                    elif fmt == "avi":
                        fps, frames = codecs.decode_avi(raw)
                        base.update(
                            width=frames.shape[2], height=frames.shape[1],
                            n_channels=3, sample_rate=fps,  # frames/sec
                            n_frames=frames.shape[0],
                            duration=frames.shape[0] / max(1, fps),
                            mean_rgb=[float(x) for x in
                                      frames.reshape(-1, 3).mean(axis=0)],
                            feature=video_feature(frames), decoded=True)
                    elif fmt == "wav":
                        rate, ch, pcm = codecs.decode_wav(raw)
                        mono = pcm.astype(np.float64).mean(axis=1) / 32768.0
                        base.update(
                            n_channels=ch, sample_rate=rate,
                            n_frames=pcm.shape[0],
                            duration=pcm.shape[0] / rate,
                            rms=float(np.sqrt(np.mean(np.square(mono))))
                            if len(mono) else 0.0,
                            feature=audio_feature(pcm, n_windows), decoded=True)
                except (ValueError, struct_error):
                    pass  # malformed payload → decoded=False quarantine row
                rows.append(base)
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(op, DECODED_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Real pixel resize (nearest-neighbor, aspect-preserving, never
    upscales) → (media_id, width, height, payload) re-encoded as PPM."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                if codecs.sniff_format(raw) not in ("ppm", "bmp", "png"):
                    continue
                img = codecs.decode_image(raw)
                h, w = img.shape[:2]
                scale = min(1.0, max_side / max(h, w))
                tw, th = max(1, round(w * scale)), max(1, round(h * scale))
                small = codecs.resize_nearest(img, tw, th)
                out["media_id"].append(mid)
                out["width"].append(tw)
                out["height"].append(th)
                out["payload"].append(codecs.encode_ppm(small))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(op, "media_id long, width int, height int, payload binary")


def sample_frames(media: DataFrame, every_n: int = 10, max_side: int | None = None) -> DataFrame:
    """Real video frame sampling: decode AVI payloads, keep every
    ``every_n``-th frame (optionally resized), re-encode each as PPM →
    (media_id, frame_idx, width, height, payload). The output rows are
    ordinary image payloads, so the whole image pipeline (decode_media,
    resize_images, image features → ANN/dedup) composes downstream.
    Non-AVI video payloads are skipped (quarantine via decode_media).

    Memory bound: one clip is decoded fully per row, so repartition
    upstream to O(few) payloads per task for long clips — the ffmpeg
    plug-in point would stream frames instead (same output schema)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "width": [],
                   "height": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                if codecs.sniff_format(raw) != "avi":
                    continue
                try:
                    _fps, frames = codecs.decode_avi(raw)
                except (ValueError, struct_error):
                    continue  # malformed AVI → skip like non-AVI payloads
                for idx in range(0, frames.shape[0], every_n):
                    img = frames[idx]
                    if max_side is not None:
                        h, w = img.shape[:2]
                        scale = min(1.0, max_side / max(h, w))
                        img = codecs.resize_nearest(
                            img, max(1, round(w * scale)), max(1, round(h * scale)))
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["payload"].append(codecs.encode_ppm(img))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(
        op, "media_id long, frame_idx int, width int, height int, payload binary")


def frame_sample(media: DataFrame, every_n: int = 10, deterministic_fake: bool = True) -> DataFrame:
    """video → (media_id, frame_idx) sampled frame indices.
    ``deterministic_fake=False`` reads real frame counts from AVI
    payloads; ``sample_frames`` above returns the actual pixels."""
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

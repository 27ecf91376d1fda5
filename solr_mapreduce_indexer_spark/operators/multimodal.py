"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are mapInPandas stages.
The decode kernel is REAL for PNG images and WAV audio (pure stdlib + numpy
codecs in operators/media_codecs.py — no PIL/ffmpeg needed); formats that
require external codec libraries (JPEG/MP3/MP4) surface per-row
decode_ok=False, or use `decoder=fake_decode` for a deterministic stand-in.
Swap in a PIL/ffmpeg-backed decoder on a cluster that has them.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = ("asset_id long, modality string, n_bytes long, "
                  "feature array<float>, decode_ok boolean")


def fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives a fixed-length
    float feature from the payload bytes. Replace with PIL/librosa/ffmpeg
    decoding on a cluster with media libs (raise NotImplementedError there
    if the lib is missing rather than silently faking)."""
    if payload is None:
        raise ValueError("empty payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) < 8:
        arr = np.pad(arr, (0, 8 - len(arr)))
    chunks = np.array_split(arr.astype(np.float32), 8)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                    dtype=np.float32)


def default_decode(payload: bytes, modality: str) -> np.ndarray:
    """Real stdlib decode (PNG/WAV) via media_codecs.real_decode."""
    from .media_codecs import real_decode
    return real_decode(payload, modality)


def extract_features(df: DataFrame,
                     decoder: Callable[[bytes, str], np.ndarray] = default_decode,
                     batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. The plumbing is
    production-shaped: Arrow batches in, bounded memory (one batch of
    payloads at a time), per-row failure isolation (decode_ok flag instead
    of task abort — the reference's fault-tolerance policy analog,
    morphline/MorphlineMapRunner.java:115-119)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, oks = [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                try:
                    feats.append(decoder(payload, modality).tolist())
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "feature": feats,
                "decode_ok": oks,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (asset_id, frame_ts_ms) — pure relational expansion, the decode itself
    happens in extract_features once codecs exist."""
    n_frames = (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (df.where(F.col("modality") == "video")
              .select("asset_id",
                      F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
                       .alias("frame_idx"))
              .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms))


def synth_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic asset table for tests: REAL PNG images and WAV audio
    (decodable by the stdlib codecs), opaque random bytes for video (which
    exercises the decode_ok=False isolation path)."""
    from .media_codecs import png_encode, wav_encode

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
            payload, mime = png_encode(img), "image/png"
        elif modality == "audio":
            t = np.arange(1600)
            wave_s = (8000 * np.sin(2 * np.pi * (220 + 20 * i) * t / 16000))
            payload, mime = wav_encode(wave_s.astype(np.int16)), "audio/wav"
        else:
            payload = rng.integers(0, 256, size=64 + (i % 5) * 16,
                                   dtype=np.uint8).tobytes()
            mime = "video/mp4"
        rows.append((i, modality, mime, payload, (16, 12, 5000, 16000)))
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)

"""Multimodal column plumbing — binary payloads with typed metadata.

Image/audio/video payloads are opaque ``binary`` columns plus a typed
metadata struct. The decode step is STUBBED (no codec libraries in
this container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded by
the payload hash) produces stable "pixels" so the Spark-side plumbing
— schema, partitioning, mapInPandas batch shape, feature extraction —
is real and testable end-to-end.

Schema:
    media(media_id: long, kind: string, payload: binary,
          meta: struct<width:int, height:int, channels:int,
                       sample_rate:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)


def synth_media(spark, n: int = 16, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (32, 24, 3, None, None)
                if kind == "image"
                else (None, None, None, 16000, 1000),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic fake 'decode': payload-hash-seeded pixels."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int, channels: int, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real image decoding requires an image codec library not "
            "present in this environment; pass fake=True for the "
            "deterministic stub"
        )
    return _fake_decode(payload, width, height, channels)


def decode_audio(
    payload: bytes, sample_rate: int, duration_ms: int, fake: bool = False
) -> np.ndarray:
    """int16 PCM mono. Real decoding needs an audio codec library not
    present in this environment; fake=True yields payload-hash-seeded
    samples (same seed derivation as the image fake)."""
    if not fake:
        raise NotImplementedError(
            "real audio decoding requires an audio codec library not "
            "present in this environment; pass fake=True for the "
            "deterministic stub"
        )
    n = sample_rate * duration_ms // 1000
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=n, dtype=np.int16)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sumsq", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def audio_window_features(
    df: DataFrame, window_ms: int = 250, fake: bool = True
) -> DataFrame:
    """mapInPandas decode (stub) -> per-window energy (sum of squared
    samples) and zero-crossing count — the audio analog of
    extract_image_features: batch shape, Arrow transfer, and schema
    are the real production plumbing; integer metrics survive any
    engine comparison exactly."""
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in (
                "media_id", "window_id", "n_samples", "sumsq",
                "zero_crossings",
            )}
            for r in pdf.itertuples():
                meta = r.meta
                pcm = decode_audio(
                    bytes(r.payload),
                    meta["sample_rate"],
                    meta["duration_ms"],
                    fake=fake,
                )
                win = meta["sample_rate"] * window_ms // 1000
                if win < 1:
                    raise ValueError(
                        f"window_ms={window_ms} spans <1 sample at "
                        f"sample_rate={meta['sample_rate']}"
                    )
                for w, start in enumerate(range(0, len(pcm), win)):
                    seg = pcm[start : start + win]
                    out["media_id"].append(r.media_id)
                    out["window_id"].append(w)
                    out["n_samples"].append(len(seg))
                    out["sumsq"].append(
                        int((seg.astype(np.int64) ** 2).sum())
                    )
                    out["zero_crossings"].append(
                        int(((seg[:-1] < 0) != (seg[1:] < 0)).sum())
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=AUDIO_WINDOW_SCHEMA)


def extract_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: decode (stub) -> 8-bin channel
    histogram feature vector. The batch shape / Arrow transfer /
    schema are the real production plumbing."""

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, ids, sizes = [], [], []
            for r in pdf.itertuples():
                meta = r.meta
                img = decode_image(
                    bytes(r.payload),
                    meta["width"],
                    meta["height"],
                    meta["channels"],
                    fake=fake,
                )
                hist, _ = np.histogram(img, bins=8, range=(0, 256))
                feats.append((hist / hist.sum()).astype(np.float32))
                ids.append(r.media_id)
                sizes.append(len(bytes(r.payload)))
            yield pd.DataFrame(
                {"media_id": ids, "feature": feats, "n_bytes": sizes}
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


HIST_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType(), False)]
    + [T.StructField(f"b{i}", T.LongType(), False) for i in range(8)]
    + [T.StructField("n_bytes", T.LongType(), False)]
)


def image_histogram_counts(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode -> 8-bin integer pixel histogram (counts,
    not normalized floats — exact integers survive any downstream
    comparison). Same production plumbing as extract_image_features;
    the flat schema is the driver-oracle-friendly projection."""

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "n_bytes": []}
            bins: list[list[int]] = [[] for _ in range(8)]
            for r in pdf.itertuples():
                meta = r.meta
                img = decode_image(
                    bytes(r.payload),
                    meta["width"],
                    meta["height"],
                    meta["channels"],
                    fake=fake,
                )
                hist, _ = np.histogram(img, bins=8, range=(0, 256))
                out["media_id"].append(r.media_id)
                out["n_bytes"].append(len(bytes(r.payload)))
                for i in range(8):
                    bins[i].append(int(hist[i]))
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    **{f"b{i}": bins[i] for i in range(8)},
                    "n_bytes": out["n_bytes"],
                }
            )

    return df.mapInPandas(kernel, schema=HIST_SCHEMA)


def resize_image_meta(df: DataFrame, max_side: int = 16) -> DataFrame:
    """Resize planning as pure expressions (the actual pixel resize
    happens inside the decode kernel at real scale): computes target
    dims preserving aspect ratio."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(max_side) / F.greatest(w, h), F.lit(1.0)
    )
    return df.select(
        "media_id",
        "kind",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )


def sample_frames(df: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame-sampling plan for audio/video rows: one row per sampled
    timestamp via sequence+explode (JVM-side)."""
    return (
        df.filter(F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
                )
            ).alias("frame_ms"),
        )
    )

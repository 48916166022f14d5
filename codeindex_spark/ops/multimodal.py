"""Multimodal column plumbing — binary payloads with typed metadata.

Image/audio/video payloads are opaque ``binary`` columns plus a typed
metadata struct. One REAL codec per modality needs no external
libraries and is implemented here: binary PPM (P6) images parsed with
pure numpy, and 16-bit PCM WAV audio via the stdlib ``wave`` module —
plus matching encoders so tests and synthetic media exercise the real
decode path end-to-end. Compressed formats (JPEG/PNG/MP3/...) would
need codec libraries absent from this container, so ``decode_image``
/ ``decode_audio`` raise NotImplementedError for payloads that are
not PPM/WAV; ``fake=True`` selects a deterministic payload-hash-
seeded stub decoder for plumbing tests that don't care about bytes.

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


def synth_media(
    spark, n: int = 16, kind: str = "image", real: bool = False
) -> DataFrame:
    """Deterministic synthetic media table. real=False: payload =
    opaque seeded bytes (decode with fake=True). real=True: payload =
    genuine encoded media — a P6 PPM of seeded pixels for images, a
    16-bit PCM WAV of seeded samples for audio — decodable with the
    real (fake=False) path. Content is seeded by media_id either way.
    """
    rows = []
    for i in range(n):
        seed_bytes = hashlib.sha256(f"media{i}".encode()).digest()
        if not real:
            payload = seed_bytes * 8
        else:
            rng = np.random.default_rng(
                int.from_bytes(seed_bytes[:8], "big")
            )
            if kind == "image":
                payload = encode_ppm(
                    rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
                )
            else:
                payload = encode_wav_pcm(
                    rng.integers(-32768, 32768, size=16000, dtype=np.int16),
                    16000,
                )
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


# ---------- real codecs (no external libraries) ----------


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) from an (h, w, 3) uint8 array."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm needs an (h, w, 3) uint8 array")
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6): header tokens (width, height, maxval)
    with #-comment support, then raw big-endian RGB bytes."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(
            f"PPM raster truncated: need {need} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_wav_pcm(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono 16-bit PCM WAV bytes from an int16 array (stdlib wave)."""
    import io
    import wave

    if samples.dtype != np.int16:
        raise ValueError("encode_wav_pcm needs an int16 array")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a 16-bit PCM WAV: (mono int16 samples, sample_rate).
    Multi-channel input keeps channel 0 (deterministic, cheap; a
    production mixdown policy belongs in the caller)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM WAV supported, got sampwidth="
                f"{w.getsampwidth()}"
            )
        nch = w.getnchannels()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    pcm = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        pcm = pcm.reshape(-1, nch)[:, 0]
    return np.ascontiguousarray(pcm), sr


def _fake_decode(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic fake 'decode': payload-hash-seeded pixels."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int, channels: int, fake: bool = False) -> np.ndarray:
    """(height, width, channels) uint8 pixels. Real path decodes
    binary PPM (P6) with pure numpy and cross-checks the metadata
    struct against the container header — a mismatch means corrupt
    metadata upstream, which must fail loudly, not propagate.
    Compressed formats (JPEG/PNG/...) need codec libraries absent
    from this container."""
    if fake:
        return _fake_decode(payload, width, height, channels)
    if payload[:2] != b"P6":
        raise NotImplementedError(
            "only binary PPM (P6) images decode without external codec "
            "libraries; compressed formats need an image codec not "
            "present in this environment (or pass fake=True for the "
            "deterministic stub)"
        )
    img = _decode_ppm(bytes(payload))
    if (img.shape[0], img.shape[1]) != (height, width) or channels != 3:
        raise ValueError(
            f"metadata/container mismatch: meta says {width}x{height}x"
            f"{channels}, PPM header says {img.shape[1]}x{img.shape[0]}x3"
        )
    return img


def decode_audio(
    payload: bytes, sample_rate: int, duration_ms: int, fake: bool = False
) -> np.ndarray:
    """int16 PCM mono. Real path decodes 16-bit PCM WAV via the
    stdlib ``wave`` module and cross-checks the metadata sample rate
    against the container (corrupt metadata must fail loudly).
    Compressed formats (MP3/AAC/...) need codec libraries absent from
    this container. fake=True yields payload-hash-seeded samples
    (same seed derivation as the image fake)."""
    if fake:
        n = sample_rate * duration_ms // 1000
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(-32768, 32768, size=n, dtype=np.int16)
    if bytes(payload[:4]) != b"RIFF":
        raise NotImplementedError(
            "only 16-bit PCM WAV decodes without external codec "
            "libraries; compressed formats need an audio codec not "
            "present in this environment (or pass fake=True for the "
            "deterministic stub)"
        )
    pcm, sr = _decode_wav(bytes(payload))
    if sample_rate is not None and sr != sample_rate:
        raise ValueError(
            f"metadata/container mismatch: meta says sample_rate="
            f"{sample_rate}, WAV header says {sr}"
        )
    return pcm


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

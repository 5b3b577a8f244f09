"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition-parallel
decode fan-out) is real and tested; the actual media decode is stubbed —
the codec libraries aren't in this container — behind ``decoder=``
hooks. ``deterministic_fake_decoder`` stands in for tests: it derives
stable pseudo-content from the bytes so downstream feature extraction is
verifiable. Swap in a real decoder (PIL/ffmpeg) without touching the
Spark plumbing.

Byte-level feature extraction (size, entropy-ish histogram stats,
content hash) is real — computed vectorized over Arrow batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def real_decoder(content: bytes, media_type: str) -> tuple[int, int]:
    """Decode media and return (width, height).

    Genuinely decodes uncompressed public formats (BMP/PPM header parse,
    WAV RIFF chunk walk — functions/media_codecs.py, pure numpy/struct).
    Compressed formats (JPEG/PNG/MP4/...) raise NotImplementedError: those
    codecs (PIL/ffmpeg) are not available in this container."""
    from featureform_spark.functions.media_codecs import sniff_decoder

    return sniff_decoder(content, media_type)


def deterministic_fake_decoder(content: bytes, media_type: str) -> tuple[int, int]:
    """Stable fake 'decode': dimensions derived from the md5 hexdigest
    (hex-char arithmetic so a SQL oracle can reproduce it exactly)."""
    h = hashlib.md5(content).hexdigest()
    return 16 + int(h[0:2], 16) % 64, 16 + int(h[2:4], 16) % 64


def extract_media_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], tuple[int, int]] = real_decoder,
) -> DataFrame:
    """Per-media features via mapInPandas (Arrow batches, partition
    parallel). Byte stats are real; width/height come from ``decoder``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    # np.frombuffer, not python sum(): the content column
                    # is the whole data volume, a per-byte python loop
                    # here dominated the entire suite at 10x scale
                    "byte_mean": pdf["content"].map(
                        lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
                        if len(b)
                        else 0.0
                    ),
                }
            )
            dims = [
                decoder(c, t)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            out["width"] = pd.Series([d[0] for d in dims], dtype="int32")
            out["height"] = pd.Series([d[1] for d in dims], dtype="int32")
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, str, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize pass over a media table via mapInPandas — same MEDIA_SCHEMA
    out as in, so resize stages compose with decode/extract stages.

    ``resizer(content, media_type, w, h) -> bytes`` is the pluggable codec
    step. Default is the deterministic fake (md5-tagged truncation) so the
    pipeline is testable without codec libraries; swap a PIL/ffmpeg-backed
    callable in production. Metadata records the target dims so downstream
    stages can trust them without re-decoding.
    """

    if resizer is None:
        resizer = deterministic_fake_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                resizer(c, t, target_w, target_h)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            out["metadata"] = [
                {**(m or {}), "width": str(target_w), "height": str(target_h)}
                for m in pdf["metadata"]
            ]
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)


def real_resizer(content: bytes, media_type: str, w: int, h: int) -> bytes:
    """Genuine resize for BMP (decode → numpy nearest-neighbor → re-encode,
    functions/media_codecs.py); other formats raise — inject
    deterministic_fake_resizer for them in tests."""
    from featureform_spark.functions.media_codecs import bmp_resize

    if content[:2] == b"BM":
        return bmp_resize(content, w, h)
    raise NotImplementedError(
        f"real resize only implemented for BMP bytes (media_type={media_type!r})"
    )


def deterministic_fake_resizer(
    content: bytes, media_type: str, w: int, h: int
) -> bytes:
    """Stand-in 'resize': output bytes sized ~w*h, deterministic from the
    input (md5 keystream) — exercises the real Spark plumbing (binary
    column rewrite, Arrow round-trip, output sizing) without codecs."""
    need = max(1, (w * h) // 64)
    out = bytearray()
    block = 0
    seed = hashlib.md5(content).digest()
    while len(out) < need:
        out.extend(hashlib.md5(seed + block.to_bytes(4, "big")).digest())
        block += 1
    return bytes(out[:need])


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index. Frame decode itself is the stubbed step; the explode keeps
    per-frame work partition-parallel downstream."""
    n_frames = (F.length(F.col("content")) / 1024).cast("int") + 1  # fake frame count
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )

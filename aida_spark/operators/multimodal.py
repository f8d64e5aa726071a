"""Multimodal column handling: images / audio / video as opaque ``binary``
columns with typed metadata, processed through ``mapInPandas`` so each
Arrow batch is decoded/transformed in one vectorized pass.

The decode step is STUBBED — the real image/audio libraries are not in
this container. ``decoder="fake"`` (default) produces a deterministic fake
decode (dimensions/duration derived from the byte content) so the
Spark-side plumbing — schema, batching, partitioning, UDF signature — is
real and tested; ``decoder="real"`` raises NotImplementedError at the
exact point a PIL/ffmpeg call would go.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["MEDIA_SCHEMA", "decode_media", "sample_frames"]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("content", BinaryType()),    # opaque payload
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("feature_hash", LongType()),
    ]
)


def _fake_decode(content: bytes, kind: str) -> tuple[int, int, int, int]:
    """Deterministic stand-in for the real decoder: derives plausible
    dimensions/duration from the byte content so downstream logic
    (partitioning, joins, feature columns) is exercised realistically."""
    h = zlib.crc32(content or b"")
    width = 64 + (h & 0x3FF)
    height = 64 + ((h >> 10) & 0x3FF)
    duration = 0 if kind == "image" else 1000 + ((h >> 20) & 0xFFFF)
    feature = (h * 0x9E3779B1) & 0x7FFFFFFFFFFFFFFF
    return width, height, duration, feature


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """binary media -> typed metadata + feature hash, one Arrow batch at a
    time. Column pruning matters at scale: only (media_id, kind, content)
    are read; the content bytes never leave the executor."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # Real path: PIL.Image.open(io.BytesIO(content)) / ffmpeg
                # probe. Libraries unavailable in this environment.
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; use decoder='fake'"
                )
            rows = [
                (mid, kind, *_fake_decode(content, kind))
                for mid, kind, content in zip(
                    pdf["media_id"], pdf["kind"], pdf["content"]
                )
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "duration_ms", "feature_hash",
                ],
            )

    return df.select("media_id", "kind", "content").mapInPandas(
        decode, DECODED_SCHEMA
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.
    Fake decoder yields frame stubs at the requested cadence; the real
    path would seek+decode via ffmpeg."""
    decoded = decode_media(df.filter(F.col("kind") == "video"), decoder)
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
        "width",
        "height",
    )

"""Multimodal column handling: images / audio / video as opaque ``binary``
columns with typed metadata, processed through ``mapInPandas`` so each
Arrow batch is decoded/transformed in one vectorized pass.

Decoder tiers:

- ``decoder="auto"`` (default): REAL decoding for formats the Python
  stdlib can parse — WAV audio (the ``wave`` module: channels, sample
  rate, true duration) and binary PGM/PPM images (dimensions + mean
  pixel feature) — falling back to the deterministic fake for anything
  else (JPEG/PNG/MP4 need PIL/ffmpeg, which this container lacks).
- ``decoder="fake"``: deterministic fake decode only (dimensions and
  duration derived from the byte content) — exercises the Spark-side
  plumbing (schema, batching, partitioning, UDF signature) end to end.
- ``decoder="real"``: strict — raises NotImplementedError where the
  PIL/ffmpeg call would go if the format is not stdlib-decodable, so
  silent fake fallbacks cannot masquerade as real decodes.
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


def _try_stdlib_decode(content: bytes) -> tuple[int, int, int, int] | None:
    """Real decode for stdlib-parseable formats; None if unrecognized.

    - WAV (RIFF): channels/rate/frames via the ``wave`` module; duration
      from true frame math; feature hash over the PCM payload.
    - PGM/PPM (binary P5/P6): width/height from the header; feature =
      mean pixel value folded into the hash.
    """
    if not content:
        return None
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(bytes(content))) as w:
                channels = w.getnchannels()
                frames = w.getnframes()
                rate = w.getframerate() or 1
                duration_ms = int(frames * 1000 / rate)
                pcm = w.readframes(frames)
        except (wave.Error, EOFError):
            return None
        feature = (zlib.crc32(pcm) * 0x9E3779B1) & 0x7FFFFFFFFFFFFFFF
        return channels, rate, duration_ms, feature
    if content[:2] in (b"P5", b"P6"):
        try:
            header = bytes(content[:64]).split()
            width, height = int(header[1]), int(header[2])
            n_px = width * height * (3 if content[:2] == b"P6" else 1)
            pixels = bytes(content[-n_px:])
            mean_px = sum(pixels) // max(len(pixels), 1)
        except (ValueError, IndexError):
            return None
        feature = (
            (zlib.crc32(bytes(content)) ^ mean_px) * 0x9E3779B1
        ) & 0x7FFFFFFFFFFFFFFF
        return width, height, 0, feature
    return None


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


def decode_media(df: DataFrame, decoder: str = "auto") -> DataFrame:
    """binary media -> typed metadata + feature hash, one Arrow batch at a
    time. Column pruning matters at scale: only (media_id, kind, content)
    are read; the content bytes never leave the executor."""

    def one(mid, kind, content):
        if decoder != "fake":
            real = _try_stdlib_decode(content)
            if real is not None:
                return (mid, kind, *real)
            if decoder == "real":
                # the exact point a PIL/ffmpeg call would go; those
                # libraries are unavailable in this environment
                raise NotImplementedError(
                    f"no stdlib decoder for this {kind} payload; "
                    "PIL/ffmpeg required"
                )
        return (mid, kind, *_fake_decode(content, kind))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                one(mid, kind, content)
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

"""Watermarked tumbling-window aggregation: event counts per
(window, event_type) with late-data tolerance — the canonical
Structured-Streaming windowed aggregate (readStream -> withWatermark ->
groupBy(window(...)) -> agg).

Scale shape: one shuffle on (window, event_type); state per key is one
count, and the watermark bounds total state (windows older than the
watermark are finalized and evicted). The batch twin (same grouping over
a static frame) is what the driver oracle checks; the streaming test
proves batch/stream parity including late rows inside the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_event_counts", "windowed_event_counts_stream"]


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Batch twin: (window_start, event_type, n) over tumbling windows."""
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .groupBy(F.window(ts_col, window).alias("w"), type_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col).alias("event_type"),
            "n",
        )
    )


def windowed_event_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming version: same result columns, late data accepted within
    ``watermark``; state for closed windows is evicted."""
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), type_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col).alias("event_type"),
            "n",
        )
    )

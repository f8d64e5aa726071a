"""Stateful streaming sessionization: the streaming twin of the batch
``event_sessions`` query (gap-based sessions via lag + running sum).

Implemented with ``applyInPandasWithState`` — Spark's arbitrary-stateful
pandas operator — keyed by user: the state carries (last event epoch,
running session number) per user, so session numbering continues
seamlessly across micro-batches and restarts (state lives in the
streaming checkpoint). Event-time watermarking bounds state for users
that go quiet.

Scale shape: one shuffle on user_id (the state key); per-group work is
O(batch events of that user) in an Arrow-batched pandas function; state
per key is two scalars. Hot users are bounded by per-batch volume, not
history length.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["SESSION_SCHEMA", "sessionize_stream"]

SESSION_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_epoch", DoubleType()),
        StructField("session_no", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "2 hours",
    id_col: str = "event_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a per-user session number to every event: a new session
    starts after > ``gap_sec`` of inactivity (same rule as the batch
    ``event_sessions`` oracle query). Works on a streaming DataFrame;
    emits one output row per input event, in update mode."""

    def assign(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_epoch, session_no = state.get
        else:
            last_epoch, session_no = None, 0
        user = int(key[0])
        # applyInPandasWithState delivers a group's rows in arbitrary order
        # ACROSS Arrow chunks (maxRecordsPerBatch bounds each chunk), so a
        # per-chunk sort is not enough for a user with >1 chunk in a batch:
        # gap detection would see out-of-order timestamps. Materialize the
        # whole group first — memory is already bounded by the user's
        # per-micro-batch volume, which is the operator's documented bound.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((last_epoch, session_no))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values([ts_col, id_col])
        out_ids = []
        out_sessions = []
        for ev, ts in zip(pdf[id_col], pdf[ts_col]):
            epoch = ts.timestamp()
            if last_epoch is None or (epoch - last_epoch) > gap_sec:
                session_no += 1
            last_epoch = epoch
            out_ids.append(int(ev))
            out_sessions.append(session_no)
        state.update((last_epoch, session_no))
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": user,
                "session_no": out_sessions,
            }
        )

    stream = events.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark)
    return (
        stream.groupBy(user_col)
        .applyInPandasWithState(
            assign,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )

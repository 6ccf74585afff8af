"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming (SURVEY §2.5 marks it absent);
this is part of the engine's extension surface: arbitrary per-key
state machines over micro-batches with watermark-driven timeout — the
Structured Streaming replacement for hand-rolled per-key bookkeeping.

``sessionize_stream`` is the flagship: gap-based session aggregation
whose *batch* twin (catalog.sessionize_events) is oracle-checked; the
streaming version emits a session row when a key's inactivity timeout
fires, so results stream out incrementally instead of waiting for
end-of-input.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sess_start", TimestampType()),
        StructField("sess_end", TimestampType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sess_start", TimestampType()),
        StructField("sess_end", TimestampType()),
    ]
)


def _session_fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
    """Accumulate per-user counts; emit the session when the processing
    -time timeout fires (inactivity gap)."""
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        n, start, end = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sess_start": [start],
                "sess_end": [end],
            }
        )
        return
    n, start, end = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts = pd.to_datetime(pdf["ts"])
        n += len(pdf)
        start = ts.min() if start is None else min(start, ts.min())
        end = ts.max() if end is None else max(end, ts.max())
    state.update((n, start, end))
    state.setTimeoutDuration(30 * 60 * 1000)  # 30-min inactivity gap
    return
    yield  # pragma: no cover — generator form required by the API


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Gap-based sessionization over a streaming (user_id, ts, ...) frame.

    State per user: (count, start, end); a 30-minute processing-time
    timeout closes the session and emits it downstream. Use with
    ``outputMode("append")``.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )

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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
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


def _session_fn_event_time(gap_ms: int):
    """Build the per-key state fn for the event-time-timeout variant.

    The timeout fires when the *watermark* (not the wall clock) passes
    ``session end + gap``, so emissions are a pure function of the data
    — replayable, and testable under availableNow."""

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
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
        incoming: list = []
        for pdf in pdfs:
            if len(pdf):
                incoming.extend(pd.to_datetime(pdf["ts"]))
        incoming.sort()
        # split on gap as data arrives: events beyond end+gap close the
        # open session inline (the watermark timeout only handles keys
        # that go silent)
        closed: list[tuple] = []
        for t in incoming:
            if end is not None and (t - end).value // 1_000_000 > gap_ms:
                closed.append((n, start, end))
                n, start, end = 0, t, t
            start = t if start is None else min(start, t)
            end = t if end is None else max(end, t)
            n += 1
        state.update((n, start, end))
        # timeout timestamps must be strictly beyond the current
        # watermark (late data can put end+gap behind it)
        deadline = end.value // 1_000_000 + gap_ms
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(deadline, wm + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "n_events": [c[0] for c in closed],
                    "sess_start": [c[1] for c in closed],
                    "sess_end": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stream_event_time(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Event-time gap sessionization: a session closes when the stream's
    watermark passes its last event + ``gap_minutes``.

    Unlike the processing-time variant, emission depends only on the
    DATA (watermark = max seen ts - delay), so the operator is
    deterministic under replay and batch-testable with
    ``trigger(availableNow=True)``: keys whose gap elapsed before the
    final watermark are emitted; still-open sessions stay in the state
    store for the next run. At scale the state store shards by the
    group key across executors, same as any shuffle."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn_event_time(gap_minutes * 60 * 1000),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming exact dedup by key with watermark-bounded state.

    Batch dedup (operators/dedup.exact_dedup) sees the whole corpus;
    a stream must instead remember seen keys — unboundedly, unless a
    watermark bounds how late a duplicate may arrive. State per key is
    evicted once the watermark passes it, so memory is O(keys per
    watermark window), not O(all keys ever).

    ``within_watermark=True`` uses dropDuplicatesWithinWatermark
    (Spark 3.5+): duplicates are only suppressed if they arrive within
    the watermark delay of the first occurrence — the right semantics
    when the key can legitimately recur later (e.g. re-crawls)."""
    w = events.withWatermark(ts_col, watermark_delay)
    if within_watermark:
        return w.dropDuplicatesWithinWatermark(key_cols)
    return w.dropDuplicates(key_cols)


FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", IntegerType()),
        StructField("at", TimestampType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [StructField("stage", IntegerType()), StructField("t", TimestampType())]
)


def _funnel_fn(steps: list[str]):
    """Per-user funnel state machine (streaming twin of
    operators/temporal.funnel_stages): state = (stage reached, ts of
    the event that reached it); a batch's events are sorted by event
    time and folded with the same greedy-earliest rule, emitting one
    row per stage ADVANCE. With in-order arrival (or a single
    availableNow batch) the final stage per user equals the batch
    operator exactly; funnels never expire, so no timeout is set."""

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (user_id,) = key
        stage, t = state.get if state.exists else (0, None)
        inc: list[tuple] = []
        for pdf in pdfs:
            for ts, y in zip(pd.to_datetime(pdf["ts"]), pdf["event_type"]):
                inc.append((ts, y))
        inc.sort(key=lambda e: e[0])
        advanced: list[tuple] = []
        for ts, y in inc:
            if stage < len(steps) and y == steps[stage] and (t is None or ts > t):
                stage += 1
                t = ts
                advanced.append((stage, ts))
        state.update((stage, t))
        if advanced:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(advanced),
                    "stage": [a[0] for a in advanced],
                    "at": [a[1] for a in advanced],
                }
            )

    return fn


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming ordered-funnel tracker: emits (user_id, stage, at)
    whenever a user advances a stage. State is one (int, timestamp)
    per user — bounded by the user population, not the event volume;
    shards across executors on the user key like any stateful agg."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn(steps),
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


COHORT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cohort_period", LongType()),
        StructField("period_offset", LongType()),
    ]
)

COHORT_STATE_SCHEMA = StructType(
    [
        StructField("cohort_period", LongType()),
        StructField("seen", ArrayType(LongType())),
    ]
)


def _cohort_fn(period_seconds: int):
    """Per-user cohort/activity state machine (streaming twin of
    operators/temporal.cohort_retention): state = (cohort period, seen
    periods); a batch's events reduce to their distinct periods, and
    each period not seen before emits one
    (user_id, cohort_period, period_offset) row.

    In-order contract: the user's FIRST-ever event must not arrive in
    a later micro-batch than a later event (guaranteed when batches
    are time-ordered — e.g. availableNow file replay or an in-order
    Kafka partition keyed by user). A violation would re-base the
    cohort; like the sessionizer's processing-time variant, this
    operator trades retro-correction for bounded append-only output.
    State is bounded by the horizon/period count, not event volume.
    """

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (user_id,) = key
        cohort, seen = state.get if state.exists else (None, [])
        seen_set = set(seen)
        periods: set[int] = set()
        for pdf in pdfs:
            secs = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000_000
            periods.update((secs // period_seconds).astype("int64").tolist())
        new = sorted(p for p in periods if p not in seen_set)
        if not new:
            return
        if cohort is None:
            cohort = new[0]
        seen_set.update(new)
        state.update((int(cohort), sorted(seen_set)))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(new),
                "cohort_period": [int(cohort)] * len(new),
                "period_offset": [int(p - cohort) for p in new],
            }
        )

    return fn


def cohort_stream(
    events: DataFrame,
    period_seconds: int = 604800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming cohort-activity tracker: emits one
    (user_id, cohort_period, period_offset) row the first time a user
    is active in each period. ``cohort_retention_from_stream`` over
    the emitted rows equals the batch ``cohort_retention`` table under
    the in-order contract (see ``_cohort_fn``); the replay-equality
    property is pinned in tests/test_streaming.py."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _cohort_fn(period_seconds),
            outputStructType=COHORT_OUT_SCHEMA,
            stateStructType=COHORT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cohort_retention_from_stream(rows: DataFrame) -> DataFrame:
    """Fold the ``cohort_stream`` activity rows into the batch-shaped
    retention table (cohort_period, period_offset, n_users)."""
    from pyspark.sql import functions as F

    return (
        rows.groupBy("cohort_period", "period_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("cohort_period", "period_offset")
    )


SEQ_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("context", ArrayType(StringType())),
        StructField("label", StringType()),
    ]
)

SEQ_STATE_SCHEMA = StructType(
    [StructField("recent", ArrayType(StringType()))]
)


def _sequence_fn(context: int, min_context: int):
    """Per-user sliding-context state machine (streaming twin of
    operators/temporal.sequence_examples): state = the last
    ``context`` item labels; each arriving event (sorted by
    (ts, event_id) within the batch) emits (context-so-far, label) and
    pushes its label into the window.

    In-order contract (as the cohort/funnel trackers): a user's
    events must not arrive in a later micro-batch than later events —
    guaranteed by time-ordered availableNow replay or an in-order
    per-user Kafka partition. State is bounded at ``context`` strings
    per user regardless of history length.
    """

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (user_id,) = key
        (recent,) = state.get if state.exists else ([],)
        recent = list(recent)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "event_id"])
        for ev_id, label in zip(batch["event_id"], batch["event_type"]):
            if len(recent) >= min_context:
                rows.append((int(ev_id), list(recent), str(label)))
            recent.append(str(label))
            if len(recent) > context:
                recent = recent[-context:]
        state.update((recent,))
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "event_id": [r[0] for r in rows],
                    "context": [r[1] for r in rows],
                    "label": [r[2] for r in rows],
                }
            )

    return fn


def sequence_stream(
    events: DataFrame,
    context: int = 3,
    min_context: int = 1,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming next-event example generator: append-mode
    (user_id, event_id, context, label) rows as events arrive, with
    per-user state bounded at ``context`` labels. availableNow replay
    equals the batch ``sequence_examples`` exactly (pinned in
    tests/test_streaming.py)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sequence_fn(context, min_context),
            outputStructType=SEQ_OUT_SCHEMA,
            stateStructType=SEQ_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ZSCORE_OUT_SCHEMA = (
    "entity string, bucket_start string, n long, z double"
)
ZSCORE_STATE_SCHEMA = (
    "hist_counts array<long>, cur_bucket long, cur_n long"
)


def _zscore_fn(bucket_seconds: int, window: int):
    """Per-entity trailing-window z-score state machine (streaming twin
    of operators/temporal.rolling_zscore_anomalies, default non-filled
    semantics: the frame is the trailing ``window`` NON-EMPTY buckets).

    State = (counts of the last ``window`` CLOSED non-empty buckets,
    the open bucket, its running count). A bucket closes when a LATER
    bucket's first event arrives; closing scores it against the
    history with the batch twin's exact closed form
    z = (k·n − S)/sqrt(k·Q − S²) (k == window gate, null z on zero
    variance) and pushes it into the history.

    In-order contract (the cohort_stream trade): events for an
    already-closed bucket are dropped, not retro-corrected — batches
    must be time-ordered per entity (availableNow file replay, an
    in-order Kafka partition). The final open bucket never closes, so
    a drained stream's output equals the batch operator on all
    buckets EXCEPT each entity's last — pinned in
    tests/test_streaming.py. State is O(window) per entity.
    """

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        from datetime import datetime, timezone

        import pandas as pd

        (entity,) = key
        hist, cur_bucket, cur_n = (
            state.get if state.exists else ([], None, 0)
        )
        hist = list(hist)
        batch_counts: dict[int, int] = {}
        for pdf in pdfs:
            secs = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000_000
            for b, c in (secs // bucket_seconds).value_counts().items():
                batch_counts[int(b)] = batch_counts.get(int(b), 0) + int(c)
        out_rows = []

        def close(bucket: int, n: int) -> None:
            if len(hist) >= window:
                k = window
                tail = hist[-window:]
                s = sum(tail)
                q = sum(c * c for c in tail)
                denom = k * q - s * s
                z = (k * n - s) / denom**0.5 if denom > 0 else None
                out_rows.append(
                    (
                        entity,
                        datetime.fromtimestamp(
                            bucket * bucket_seconds, tz=timezone.utc
                        ).strftime("%Y-%m-%d %H:%M:%S"),
                        n,
                        z,
                    )
                )
            hist.append(n)
            del hist[:-window]

        for b in sorted(batch_counts):
            c = batch_counts[b]
            if cur_bucket is None:
                cur_bucket, cur_n = b, c
            elif b == cur_bucket:
                cur_n += c
            elif b > cur_bucket:
                close(cur_bucket, cur_n)
                cur_bucket, cur_n = b, c
            # b < cur_bucket: closed-bucket stragglers dropped (contract)
        state.update((hist, cur_bucket, int(cur_n)))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["entity", "bucket_start", "n", "z"]
            )

    return fn


def zscore_stream(
    events: DataFrame,
    entity_col: str = "event_type",
    bucket_seconds: int = 3600,
    window: int = 24,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming volume-anomaly z-scores: one row per CLOSED bucket
    with a full trailing window (see ``_zscore_fn`` for the in-order
    contract and the last-open-bucket caveat)."""
    return (
        events.select(F.col(entity_col).alias("entity"), "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("entity")
        .applyInPandasWithState(
            _zscore_fn(bucket_seconds, window),
            outputStructType=ZSCORE_OUT_SCHEMA,
            stateStructType=ZSCORE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Stream-stream event-time joins (Structured Streaming built-ins).

The canonical attribution shape: a purchase stream joined to the
click stream that preceded it within an interval, both sides
watermarked so Spark can bound the join state and emit/evict
deterministically. This is the streaming twin of the batch as-of join
(catalog asof_purchase_prior_click) — the batch form answers "nearest
prior click"; the stream form answers "all clicks within the
attribution window" incrementally, with state bounded by
watermark + interval instead of the full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap_seconds: int = 3600,
    left_watermark: str = "0 seconds",
    right_watermark: str = "0 seconds",
) -> DataFrame:
    """Join each left event to right events of the same key that
    happened in the ``max_gap_seconds`` BEFORE it (exclusive of later
    rights, inclusive of simultaneous).

    Both inputs must already expose distinct timestamp column names
    (``left_ts``/``right_ts``). Watermarks bound the state store: a
    right row is evictable once the left watermark passes
    ``right_ts + max_gap``, exactly the Structured Streaming
    inner-join state contract — without the interval condition the
    state would grow unboundedly and the join would be rejected for
    append-mode streams.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[user_col] == rw[user_col])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {max_gap_seconds} SECONDS"))
    )
    return lw.join(rw, cond, "inner").select(
        lw[user_col].alias(user_col),
        lw[left_ts].alias(left_ts),
        rw[right_ts].alias(right_ts),
    )


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap_seconds: int = 3600,
) -> DataFrame:
    """Batch twin of :func:`interval_join_stream` — the replay oracle:
    identical join condition on static frames, so an availableNow run
    of the stream form must produce exactly these rows."""
    cond = (
        (left[user_col] == right[user_col])
        & (right[right_ts] <= left[left_ts])
        & (
            right[right_ts]
            >= left[left_ts] - F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        )
    )
    return left.join(right, cond, "inner").select(
        left[user_col].alias(user_col),
        left[left_ts].alias(left_ts),
        right[right_ts].alias(right_ts),
    )

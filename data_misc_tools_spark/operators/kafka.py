"""Kafka batch source/sink wrappers + time-window semantics.

Reference surface: ``kf_pull(cfgs, start, end, topics...)`` converts
timestamps→offsets and polls records into rows (reference:
hive-udfs/.../kafka/UDFKafkaPull.java:44-145, KafkaHelper.java:173-254);
``t_kf_push`` produces per-row with ack echo (UDTFKafkaPush.java:31-121);
``kf_topics``/``kf_*_cfgs`` are catalog/config helpers.

Spark-first: the pull is the built-in Kafka batch source with
``startingOffsetsByTimestamp`` / ``endingOffsetsByTimestamp`` — offset
resolution, partition-parallel fetch, and ranges are all handled by
the source (the reference hand-rolls all three). The window contract
is **[start, end)** — made explicit here and unit-tested via
:func:`time_window_slice`, which is also applied to any timestamped
DataFrame (the portable half of kf_pull's semantics).

No broker exists in the test environment, so the broker-touching
functions build the plan but are integration-gated; the window/record
shaping logic is what the correctness gate checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_RECORD_COLUMNS = ("t", "ct", "k", "v")


def consumer_defaults() -> dict[str, str]:
    """Default consumer configs (reference: KafkaHelper.java:81-101)."""
    return {
        "group.id": "data-misc-tools-spark",
        "enable.auto.commit": "false",
        "max.poll.records": "1000",
        "max.partition.fetch.bytes": "2097152",
        "key.deserializer": "org.apache.kafka.common.serialization.StringDeserializer",
        "value.deserializer": "org.apache.kafka.common.serialization.StringDeserializer",
    }


def producer_defaults() -> dict[str, str]:
    """Default producer configs (reference: KafkaHelper.java:103-115)."""
    return {
        "acks": "all",
        "compression.type": "gzip",
        "request.timeout.ms": "1000",
        "key.serializer": "org.apache.kafka.common.serialization.StringSerializer",
        "value.serializer": "org.apache.kafka.common.serialization.StringSerializer",
    }


def time_window_slice(df: DataFrame, ts_col: str, start: str, end: str) -> DataFrame:
    """[start, end) slice on a timestamp column.

    Parity notes (reference: UDFKafkaPull.java:105-108, KafkaHelper
    .java:246-250): start must be < end — start == end and start > end
    both yield an empty result, and the end bound is exclusive.
    """
    s, e = F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp")
    return df.filter((F.col(ts_col) >= s) & (F.col(ts_col) < e))


def kf_pull(
    spark: SparkSession,
    bootstrap_servers: str,
    start: str,
    end: str,
    *topics: str,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Batch-read Kafka records in the time window [start, end).

    Returns the reference's record shape ``(t, ct, k, v)``
    (topic, creation-time millis, key, value — reference:
    kafka/KafkaHelper.java:42-50) as a DataFrame. Requires the
    spark-sql-kafka connector on the classpath and a reachable broker.
    """
    if not bootstrap_servers:
        raise ValueError("bootstrap.servers is required")  # UDFKafkaPull.java:123-127
    start_ms = _to_millis(start)
    end_ms = _to_millis(end)
    if start_ms >= end_ms:
        # start==end / start>end -> empty (UDFKafkaPull.java:105-108)
        return spark.createDataFrame([], "t string, ct bigint, k string, v string")
    topics_csv = ",".join(topics)
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics_csv)
        # global timestamp bounds: the source resolves offsets per
        # partition (offsetsForTimes) and fetches partition-parallel —
        # everything KafkaHelper.java:173-254 hand-rolls
        .option("startingTimestamp", str(start_ms))
        .option("endingTimestamp", str(end_ms))
        .option("startingOffsetsByTimestampStrategy", "latest")
    )
    for key, val in (extra_options or {}).items():
        reader = reader.option(key, val)
    raw = reader.load()
    return raw.select(
        F.col("topic").alias("t"),
        F.unix_millis(F.col("timestamp")).alias("ct"),
        F.col("key").cast("string").alias("k"),
        F.col("value").cast("string").alias("v"),
    )


def t_kf_push(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str = "k",
    value_col: str = "v",
    extra_options: dict[str, str] | None = None,
) -> None:
    """Produce rows to Kafka via the built-in sink (at-least-once; the
    reference's per-row ack-echo becomes sink-level delivery semantics,
    exactly-once available via Structured Streaming checkpoints)."""
    writer = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).cast("string").alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
    for key, val in (extra_options or {}).items():
        writer = writer.option(key, val)
    writer.save()


def plan_rate_limited_backfill(
    start_offsets: dict[tuple[str, int], int],
    end_offsets: dict[tuple[str, int], int],
    max_offsets_per_trigger: int,
) -> list[dict[tuple[str, int], tuple[int, int]]]:
    """Deterministic trigger plan for a rate-limited Kafka backfill —
    the offline twin of Spark's ``maxOffsetsPerTrigger`` proration
    (reference throttles the same way via backpressure +
    max.poll.records, Configs.scala:52-64; Spark's KafkaMicroBatchStream
    prorates each trigger's budget across partitions by lag share).

    Input: per topic-partition ``(topic, partition) -> offset`` maps
    for the range [start, end), and the per-trigger offset budget.
    Output: a list of triggers, each mapping the partition to its
    ``(from_offset, until_offset)`` window (until exclusive).

    Contract (stricter than Spark's, so it is testable exactly):
    - per-trigger total = min(budget, remaining lag) EXACTLY — the
      fractional shares are floored and the remainder is assigned one
      offset at a time to the laggiest partitions (ties by partition
      key), where Spark's rounding may drift around the cap;
    - progress every trigger (budget >= 1), so the plan always
      terminates in ceil(total_lag / budget) triggers;
    - concatenating a partition's windows over all triggers
      reconstructs [start, end) with no gaps or overlaps.

    Use the plan to drive bounded ``kf_pull``-shaped batch reads
    (startingOffsets/endingOffsets JSON per trigger), or to audit what
    a streaming backfill with ``maxOffsetsPerTrigger`` will do before
    launching it. Pure metadata: |partitions| work per trigger.
    """
    if max_offsets_per_trigger < 1:
        raise ValueError("max_offsets_per_trigger must be >= 1")
    if set(start_offsets) != set(end_offsets):
        raise ValueError("start and end offset maps cover different partitions")
    cur = dict(start_offsets)
    for p, e in end_offsets.items():
        if e < cur[p]:
            raise ValueError(f"end offset below start for {p}")
    triggers: list[dict[tuple[str, int], tuple[int, int]]] = []
    while True:
        lags = {p: end_offsets[p] - cur[p] for p in cur if end_offsets[p] > cur[p]}
        total = sum(lags.values())
        if total == 0:
            return triggers
        budget = min(max_offsets_per_trigger, total)
        shares = {p: budget * lag // total for p, lag in lags.items()}
        rem = budget - sum(shares.values())
        if rem:
            # laggiest-first (ties by key) keeps the plan deterministic
            # and drains skewed partitions fastest
            for p in sorted(lags, key=lambda p: (-(lags[p] - shares[p]), p)):
                if rem == 0:
                    break
                if shares[p] < lags[p]:
                    shares[p] += 1
                    rem -= 1
        step = {
            p: (cur[p], cur[p] + take)
            for p, take in sorted(shares.items())
            if take > 0
        }
        triggers.append(step)
        for p, (_, until) in step.items():
            cur[p] = until


def kafka_backfill_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    max_offsets_per_trigger: int,
    starting_offsets: str = "earliest",
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Rate-limited streaming backfill reader: the online form of
    :func:`plan_rate_limited_backfill`. Builds a ``readStream`` over
    Kafka with ``maxOffsetsPerTrigger`` so a Trigger.AvailableNow run
    drains the topic in bounded batches instead of one giant first
    micro-batch (the 100 TB posture: an unbounded first batch shuffles
    the whole retention window at once). Records surface in the
    reference's ``(t, ct, k, v)`` shape. Requires the Kafka connector
    and broker; plan construction itself touches neither.

    Spark's streaming Kafka source rejects ``endingOffsets`` ("ending
    offset not valid in streaming queries"), so this reader is
    unbounded-by-option: Trigger.AvailableNow bounds the drain at the
    offsets present at query start. For an explicitly bounded offset
    range, use :func:`backfill_batch_options` +
    :func:`plan_rate_limited_backfill` to drive batch reads instead."""
    if max_offsets_per_trigger < 1:
        raise ValueError("max_offsets_per_trigger must be >= 1")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    )
    for key, val in (extra_options or {}).items():
        reader = reader.option(key, val)
    raw = reader.load()
    return raw.select(
        F.col("topic").alias("t"),
        F.unix_millis(F.col("timestamp")).alias("ct"),
        F.col("key").cast("string").alias("k"),
        F.col("value").cast("string").alias("v"),
    )


def backfill_batch_options(
    plan: list[dict[tuple[str, int], tuple[int, int]]],
) -> list[dict[str, str]]:
    """Convert a :func:`plan_rate_limited_backfill` trigger plan into
    per-trigger ``{"startingOffsets": ..., "endingOffsets": ...}`` JSON
    option pairs for bounded **batch** Kafka reads — the route for
    explicitly bounded ranges, since the streaming source rejects
    ``endingOffsets``. Each trigger's options read exactly that
    trigger's ``[from, until)`` offsets per partition; running all
    triggers and unioning the records reproduces one unthrottled
    ``[start, end)`` batch read exactly (gap/overlap-free by the
    planner's reconstruction contract). Pure metadata transform."""
    import json

    out: list[dict[str, str]] = []
    for trig in plan:
        starting: dict[str, dict[str, int]] = {}
        ending: dict[str, dict[str, int]] = {}
        for (topic, part), (frm, until) in sorted(trig.items()):
            starting.setdefault(topic, {})[str(part)] = frm
            ending.setdefault(topic, {})[str(part)] = until
        out.append(
            {
                "startingOffsets": json.dumps(starting, sort_keys=True),
                "endingOffsets": json.dumps(ending, sort_keys=True),
            }
        )
    return out


def _to_millis(ts: str) -> int:
    """Parse 'yyyy-MM-dd HH:mm:ss[.f]' or ISO-8601 to epoch millis (UTC)."""
    from datetime import datetime, timezone

    s = ts.replace("T", " ")
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return int(
                datetime.strptime(s, fmt).replace(tzinfo=timezone.utc).timestamp() * 1000
            )
        except ValueError:
            continue
    raise ValueError(f"unparseable timestamp: {ts!r}")


def kf_topics(spark: SparkSession, bootstrap_servers: str) -> DataFrame:
    """List topics + partition counts as (t, p) rows (reference:
    hive-udfs/.../kafka/UDFKafkaTopics.java:32-81 returns
    array<struct<t,p>> via consumer.listTopics).

    Driver-side admin call → DataFrame (a topic catalog is metadata,
    not data; no reason to involve executors). Import-gated on a
    Python Kafka client.
    """
    try:
        from confluent_kafka.admin import AdminClient  # type: ignore[import-not-found]
    except ImportError:
        try:
            from kafka import KafkaConsumer  # type: ignore[import-not-found]
        except ImportError as e:
            raise ImportError(
                "kf_topics requires confluent-kafka or kafka-python on the driver"
            ) from e
        consumer = KafkaConsumer(bootstrap_servers=bootstrap_servers)
        try:
            rows = [
                (t, len(consumer.partitions_for_topic(t) or []))
                for t in sorted(consumer.topics())
            ]
        finally:
            consumer.close()
        return spark.createDataFrame(rows, "t string, p int")
    admin = AdminClient({"bootstrap.servers": bootstrap_servers})
    md = admin.list_topics(timeout=10)
    rows = [(t, len(tp.partitions)) for t, tp in sorted(md.topics.items())]
    return spark.createDataFrame(rows, "t string, p int")

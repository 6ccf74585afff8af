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

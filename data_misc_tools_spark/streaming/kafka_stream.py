"""Structured Streaming Kafka wrappers.

The streaming replacement for the reference's hand-rolled micro-batch
Kafka machinery: offset bookkeeping in ZK (reference:
process/KafkaHelper.scala:42-65), backpressure/rate configs
(process/Configs.scala:51-65), and the 60 s scheduler tick all
collapse into readStream + checkpointLocation + maxOffsetsPerTrigger
+ trigger(processingTime/availableNow).

Requires the spark-sql-kafka connector package on the session
classpath (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`);
absent a broker these builders construct plans but cannot start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Kafka stream in the reference's record shape (t, ct, k, v).

    ``max_offsets_per_trigger`` is the rate-limit replacing the
    reference's backpressure configs (Configs.scala:52-64).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load()
    return raw.select(
        F.col("topic").alias("t"),
        F.unix_millis(F.col("timestamp")).alias("ct"),
        F.col("key").cast("string").alias("k"),
        F.col("value").cast("string").alias("v"),
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ct",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts over a (t, ct, k, v) stream —
    the streaming twin of the batch hourly rollup; late data beyond
    ``watermark`` is dropped instead of blocking state forever."""
    with_ts = stream.withColumn("__ts", F.timestamp_millis(F.col(ts_col)))
    return (
        with_ts.withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window).alias("win"), *(group_extra or ["t"]))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_extra or ["t"]),
            "n_events",
        )
    )


def write_stream_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    trigger_sec: int = 60,
):
    """Stream → parquet with exactly-once file-sink semantics; the
    trigger interval is the reference's scheduler cadence
    (InterpreterLoader.scala:25)."""
    return (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_sec} seconds")
        .start()
    )

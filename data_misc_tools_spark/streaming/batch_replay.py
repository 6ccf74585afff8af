"""availableNow replay: run a streaming aggregation over existing files.

The reference's runner re-reads a window of Kafka data every minute
and recomputes aggregates (reference: process/InterpreterLoader
.scala:127-131, KafkaHelper.scala:89-131). Structured Streaming's
``Trigger.AvailableNow`` + checkpointing subsumes that loop: each
invocation processes exactly the unseen input and stops.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import Column, DataFrame, SparkSession


def replay_parquet_aggregate(
    spark: SparkSession,
    path: str,
    group_cols: list[Column],
    aggs: list[Column],
    timeout_sec: int = 120,
    transform=None,
) -> DataFrame:
    """Stream `path` (parquet) through a grouped aggregation with an
    availableNow trigger into a memory sink; returns the materialized
    result as a DataFrame.

    The memory sink is test/demo infrastructure — production sinks are
    parquet/Kafka with the same plan. Complete output mode because the
    aggregation is unwindowed-bounded here; watermarked append-mode
    variants live alongside in this package.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    schema = spark.read.parquet(path).schema
    name = f"replay_{uuid.uuid4().hex[:12]}"
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    # The file stream source requires a directory; expose single files
    # through a symlinked staging dir.
    import os

    if os.path.isfile(path):
        stage = tempfile.mkdtemp(prefix=f"stage_{name}_")
        os.symlink(os.path.abspath(path), os.path.join(stage, os.path.basename(path)))
        path = stage
    source = spark.readStream.schema(schema).parquet(path)
    if transform is not None:
        source = transform(source)
    stream = (
        source.groupBy(*group_cols)
        .agg(*aggs)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        stream.awaitTermination(timeout_sec)
    finally:
        if stream.isActive:
            stream.stop()
    return spark.table(name)

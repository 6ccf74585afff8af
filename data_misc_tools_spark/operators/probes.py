"""Execution-lifecycle probes.

The reference registers introspection functions (``udf_test``,
``gudf_tests``, ``udtf_tests``) that print constructor/initialize/
evaluate/close call sites to stdout so lifecycle behavior can be
verified by eye (reference: hive-udfs/.../tests/UDTFTests.java:25-86,
note.md:1-7). The engine replaces eyeballing with data: the probe
returns the lifecycle facts as columns, so tests (and users debugging
partition behavior) can assert on them.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def udtf_probe(df: DataFrame) -> DataFrame:
    """Tag every row with its partition id, Arrow-batch index within
    the partition, and batch size — the observable facts of the
    per-partition open→batches→close lifecycle that the reference's
    probes print. One 'client' per partition corresponds to one
    distinct partition_id here.
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("partition_id", IntegerType()),
            StructField("batch_index", IntegerType()),
            StructField("batch_rows", LongType()),
        ]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator) -> Iterator:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # "open client" would happen here — once per partition
        for i, pdf in enumerate(batches):
            out = pdf[cols].copy()
            out["partition_id"] = pid
            out["batch_index"] = i
            out["batch_rows"] = len(pdf)
            yield out
        # "close client" here — guaranteed, even on empty partitions

    return df.mapInPandas(run, schema=out_schema)

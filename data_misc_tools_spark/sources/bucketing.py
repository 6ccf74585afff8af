"""Bucketed-table layout: co-located joins without a shuffle.

At 100 TB the dominant cost of fact-to-fact joins is the shuffle. If
both tables are WRITTEN bucketed (and optionally sorted) on the join
key with the same bucket count, Spark's scan reports a compatible
output partitioning and the join planner drops the Exchange on both
sides entirely — the join runs scan-local per bucket. This is the
storage-layout analog of the reference's pre-partitioned Hive tables
(``CLUSTERED BY ... INTO n BUCKETS``; Spark's bucketing is the same
contract via the session catalog).

Cluster sizing rule: pick ``n_buckets`` so one bucket of the LARGER
table fits an executor's task comfortably (~128-512 MB); bucket counts
must match (or divide) across tables that join together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets additionally removes the Sort from
    sort-merge joins, leaving a pure streaming merge per bucket.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With compatible bucketing this plans with ZERO Exchange operators;
    callers can assert that via ``df.explain()`` (see
    tests/test_scale_io.py).
    """
    return spark.table(left_table).join(spark.table(right_table), on)

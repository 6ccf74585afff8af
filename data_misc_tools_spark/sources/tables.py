"""Managed-table helpers: bucketing for co-located joins, compaction.

The reference's Hive config enables sort-merge-bucket joins and
small-file merging (reference: spark-process/configs/configs.properties
:6-9,2-5 — hive.optimize.bucketmapjoin.sortedmerge, hive.merge.*).
On Spark, bucketed tables make repeated large⋈large joins on a stable
key shuffle-free: both sides are hash-partitioned on disk, so the join
reads co-located buckets directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    Joins/aggregations on ``bucket_cols`` between tables bucketed the
    same way skip the shuffle entirely — the 100 TB pattern for fact⋈
    fact joins repeated across many queries (pay one write-time
    shuffle, amortize over every read).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Rewrite a parquet dataset into ~target-sized files (the
    reference's hive.merge.* small-file merge as an explicit op).

    Returns the output file count. Uses a size-based partition count
    estimate; writes to a temp location then swaps, so a failed
    compaction never destroys the source.
    """
    import math
    import os
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = tempfile.mkdtemp(prefix="compact_")
    out = os.path.join(tmp, "data")
    df.repartition(n).write.mode("overwrite").parquet(out)
    # swap
    bak = path.rstrip("/") + ".compact_bak"
    os.rename(path, bak)
    shutil.move(out, path)
    shutil.rmtree(bak)
    files = [f for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")]
    return len(files)

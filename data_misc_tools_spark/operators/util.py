"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure at least default-parallelism partitions before a
    high-amplification operation (explode, per-row fan-out).

    When the input sits in fewer partitions than cores (small files,
    coalesced scans), everything downstream of a ~100-1000× explode
    runs underparallelized; shuffling the *small* pre-explode rows is
    cheap and unlocks full parallelism for the expensive stage. At
    cluster scale inputs normally arrive with enough partitions and
    this is a no-op (getNumPartitions is plan metadata, no job).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

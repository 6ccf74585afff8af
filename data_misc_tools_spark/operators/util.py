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


def salted_aggregate(df, key_cols: list[str], aggs: dict[str, tuple[str, str]], salt: int = 16):
    """Two-phase aggregation with key salting for skewed group keys.

    ``aggs`` maps output column -> (input column, fn) where fn ∈
    {"sum", "count", "min", "max"} (the re-aggregable functions).
    Phase 1 aggregates by (key, random salt in [0, salt)) so a hot key
    spreads over ``salt`` reducers; phase 2 merges the partials by key.
    Same result as a direct groupBy — strictly for skew relief: use
    when one key holds a disproportionate share of rows and AQE skew
    handling isn't available (e.g. pre-3.0 clusters or non-join aggs).

    At 100 TB a single hot key (null join keys, bot users, empty
    documents) otherwise serializes one reducer; salting bounds any
    reducer's share at ~1/salt of the hot key.
    """
    from pyspark.sql import functions as F

    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}

    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partials = salted.groupBy(*key_cols, "__salt").agg(
        *[phase1_fn[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partials.groupBy(*key_cols).agg(
        *[merge_fn[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )


def half_up_ratio4(numer, denom):
    """round-half-up(numer/denom, 4) as pure integer arithmetic.

    Engines disagree on rounding *identical* doubles at exact .00005
    halves (BigDecimal-exact vs multiply-then-round), so any 4dp ratio
    that can land on a half (int/int, exact-decimal/int) must round via
    integer division instead: (2·10⁴·A + B) div (2·B) / 10⁴. ``a % b``
    / subtraction / the final exact division keep every step integral
    (valid for |values| < 2^53).
    """
    from pyspark.sql import functions as F

    a = F.lit(20000) * numer.cast("long") + denom.cast("long")
    b = F.lit(2) * denom.cast("long")
    q = (a - a % b) / b  # exact: a - a%b is an exact multiple of b
    return q.cast("long") / F.lit(10000.0)

"""Changelog compaction and snapshot merge (incremental pipelines).

The reference refreshes derived tables by full re-ETL on a schedule
(reference: README.md Runner examples; spark/Runner.scala entry point).
At 100 TB a nightly full rebuild is the bottleneck, so the engine
carries the primitives that make refreshes incremental:

* :func:`compact_changelog` — collapse an upsert/delete changelog to
  latest-state-per-key. ONE shuffle (hash partition by key); the
  per-key pick is a ``row_number`` over the sequence columns, i.e.
  sort-within-partition, never a global sort. On a real cluster the
  changelog and base table should share bucketing on the key so the
  next merge is Exchange-free.
* :func:`merge_snapshot` — apply a compacted changelog to a base
  snapshot (merge-on-read compaction): when the changelog is small
  its key set broadcasts and the base table is never shuffled.

Keyed snapshot-to-snapshot diffing lives in operators/etl.py
(:func:`~data_misc_tools_spark.operators.etl.snapshot_diff`, the
oracle-checked catalog entry); the streaming twin of compaction is
streaming/upsert.py's keep-latest sink.

Both are pure Catalyst (no Python in the hot path) and orders of
magnitude cheaper than the rebuild they replace: compaction touches
only the changelog, the merge reads one snapshot scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_changelog(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """Latest state per key from an upsert/delete changelog.

    ``seq_cols`` must be a total order within each key (e.g.
    ``["ts", "event_id"]``) — ties would make the winner
    engine/partition-dependent, same invariant as max_by.  Rows whose
    winning ``op_col`` is in ``delete_ops`` are dropped (the key no
    longer exists).

    Scale shape: one hash Exchange on ``key_cols``; ``row_number`` is
    a within-partition sort; the filter on rn=1 is evaluated before
    anything downstream sees the row.  No global sort, no Python.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    out = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        out = out.filter(~F.col(op_col).isin(list(delete_ops)))
    return out


def merge_snapshot(
    base: DataFrame,
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """Next snapshot = base rows whose key has no change, plus the
    compacted changelog's surviving rows (upsert-wins, deletes drop).

    The classic merge-on-read compaction: compact the (small)
    changelog first, then LEFT ANTI join the (large) base against the
    compacted keys — when the changelog is small Spark broadcasts the
    anti-join side and the base table is never shuffled at all.
    Column set follows ``base``.
    """
    compacted = compact_changelog(
        changelog, key_cols, seq_cols, op_col=op_col, delete_ops=delete_ops
    )
    touched = compact_changelog(changelog, key_cols, seq_cols)  # incl. deletes
    keys = list(key_cols)
    kept = base.join(touched.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(compacted.select(*base.columns))


def scd2_intervals(
    changelog: DataFrame,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    seq_cols: Sequence[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals from a changelog —
    the third leg of the CDC toolkit beside :func:`compact_changelog`
    (latest state) and :func:`merge_snapshot` (apply): full HISTORY as
    validity ranges, the classic warehouse dimension shape (Kimball
    SCD type 2).

    Consecutive rows per key whose ``state_cols`` are UNCHANGED
    collapse into one interval; each emitted row carries
    ``valid_from`` (the first seq value of the run), ``valid_to``
    (the next run's valid_from — NULL while current), ``version``
    (1-based change counter per key) and ``is_current``.

    ``seq_cols`` must totally order each key's changelog (the
    compact_changelog invariant — ties would make run boundaries
    engine-dependent). NULL-safe state comparison (``<=>``), so NULL
    states form runs too.

    Plan shape: one hash Exchange on the key, two within-partition
    window passes (lag to find run starts, lead over run starts for
    valid_to) — no global sort, no Python, no self-join. At 100 TB
    the changelog should be bucketed by key so the Exchange vanishes.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(c).asc() for c in seq_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for c in state_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.lag(seq_cols[0]).over(w).isNull()
    starts = (
        changelog.withColumn("__chg", first | changed)
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    vf = F.col(seq_cols[0])
    vt = F.lead(seq_cols[0]).over(w2)
    return starts.select(
        *key_cols,
        *state_cols,
        vf.alias("valid_from"),
        vt.alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        vt.isNull().alias("is_current"),
    )

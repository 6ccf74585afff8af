"""Streaming keep-latest upsert sink: a CDC "latest state" table fed
by a changelog stream.

The batch side of this pipeline already exists (operators/cdc.py:
compact_changelog collapses an upsert/delete log to final state);
this module is its STREAMING twin: a foreachBatch sink that folds
each micro-batch of change rows into a persistent key→latest-row
snapshot, exactly the materialized-view upkeep the reference's runner
loop approximates by re-reading a window every minute (reference:
process/InterpreterLoader.scala:127-131).

Design — versioned snapshot directories, not in-place overwrite:

* ``path/v=N`` holds a full snapshot; the CURRENT snapshot is the
  highest N whose directory contains Spark's ``_SUCCESS`` marker.
  Readers never see a torn snapshot: a crash mid-write leaves a
  marker-less directory that every reader and the next merge skip.
* Each micro-batch: union the change rows with the current snapshot,
  keep-latest per key (max_by over the order columns — one hash agg,
  no window), write version N+1. The merge cost is O(snapshot + batch) per batch
  — the standard copy-on-write table format trade (Delta/Hudi/Iceberg
  do exactly this per commit, plus a manifest). At 100 TB the
  snapshot would be partitioned by key-hash bucket so a batch only
  rewrites touched buckets; here versions are whole-directory for
  auditability.
* Deletes are TOMBSTONES, not removals: the snapshot retains the
  winning delete row per key so a late out-of-order update (older
  sequence than the delete) can never resurrect the key on a later
  merge. ``read_latest(op_col=...)`` filters them out at read time;
  dropping aged tombstones is a compaction policy, not merge logic.

Replays are idempotent: re-processing batch B produces a snapshot
with the same CONTENT (keep-latest is associative/commutative over
the same inputs); the exactly-once batch-id ledger pattern from
streaming/exactly_once.py applies unchanged if side-effect-free
retries matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_misc_tools_spark.sources import fs as _fsh


def keep_latest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """One row per key: the row with the max (order_cols) tuple.

    max_by over a struct — single map-side-combined hash aggregate,
    no window/sort. ``order_cols`` must be a total order per key
    (include a unique sequence column as tiebreak: max_by ties are
    engine-unspecified, CLAUDE.md invariant).
    """
    others = [c for c in df.columns if c not in key_cols]
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*others), F.struct(*order_cols)).alias("__row")
    )
    return packed.select(*key_cols, *[F.col(f"__row.{c}").alias(c) for c in others])


def _versions(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot versions, ascending — Hadoop FileSystem API,
    so the store works on any supported FS (local, HDFS, S3A), not
    just the driver's local disk."""
    if not _fsh.exists(spark, path):
        return []
    out = []
    for ent in _fsh.ls(spark, path):
        name = ent["path"].rstrip("/").rsplit("/", 1)[-1]
        if (
            ent["is_dir"]
            and name.startswith("v=")
            and _fsh.exists(spark, ent["path"] + "/_SUCCESS")
        ):
            out.append(int(name[2:]))
    return sorted(out)


def _current_version(spark: SparkSession, path: str) -> int | None:
    vs = _versions(spark, path)
    return vs[-1] if vs else None


def read_latest(
    spark: SparkSession,
    path: str,
    op_col: str | None = None,
    delete_ops: tuple[str, ...] = ("d", "delete"),
) -> DataFrame | None:
    """The current committed snapshot, or None before the first one.

    Pass ``op_col`` to hide tombstoned keys (rows whose winning change
    is a delete) — the live-state view; omit it for the raw snapshot
    including tombstones (what the merge path reads).
    """
    v = _current_version(spark, path)
    if v is None:
        return None
    snap = spark.read.parquet(f"{path}/v={v}")
    if op_col is not None:
        snap = snap.filter(~F.col(op_col).isin(list(delete_ops)))
    return snap


class ParquetUpsertSink:
    """foreachBatch handler maintaining a keep-latest snapshot.

    Change-type semantics live at READ time (see read_latest): the
    stored snapshot keeps each key's winning row even when it is a
    delete, so out-of-order changes merge correctly forever.
    """

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        order_cols: list[str],
        keep_versions: int = 2,
    ) -> None:
        self.path = path
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.keep_versions = keep_versions

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        merged = batch
        current = read_latest(spark, self.path)
        if current is not None:
            merged = current.select(*batch.columns).unionAll(batch)
        latest = keep_latest(merged, self.key_cols, self.order_cols)
        next_v = (_current_version(spark, self.path) or 0) + 1
        latest.write.mode("overwrite").parquet(f"{self.path}/v={next_v}")
        self._prune(spark)

    def _prune(self, spark: SparkSession) -> None:
        keep = self.keep_versions
        if keep <= 0:
            return
        for v in _versions(spark, self.path)[:-keep]:
            _fsh.delete(spark, f"{self.path}/v={v}")


def upsert_stream(
    changes: DataFrame,
    path: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint: str,
):
    """Wire a streaming changelog into a ParquetUpsertSink with an
    availableNow trigger; returns the started StreamingQuery."""
    sink = ParquetUpsertSink(path, key_cols, order_cols)
    return (
        changes.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

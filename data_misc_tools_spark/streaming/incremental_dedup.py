"""Streaming incremental near-dup pipeline: the production shape for
CONTINUOUS corpus ingestion (VERDICT r8 #4).

Composes three proven batch pieces inside one foreachBatch sink —
per micro-batch of documents:

1. candidate edges = batch-internal LSH pairs
   (dedup.minhash_candidate_pairs) ∪ batch-vs-index collisions
   (dedup.minhash_index_query — only the BATCH is hashed; the backlog
   was hashed once, when it streamed through);
2. cluster labels merge INCREMENTALLY
   (cluster.connected_components_incremental over the contracted
   graph) into a versioned snapshot store (the upsert.py layout:
   ``labels/v=N`` + ``_SUCCESS`` commit markers, torn writes
   invisible);
3. the batch's band table appends into the persisted MinHash index
   (dedup.minhash_index_append), and the batch's normalized edges
   append to an ``edges`` audit log.

Equality contract (pinned in tests/test_streaming.py): after an
availableNow replay over a file stream, labels == the BATCH
incremental pipeline over the same batches == a from-scratch
minhash_candidate_pairs + connected_components over the full corpus,
and the edge log == the full-corpus candidate pair set. The edge-set
equality holds for ANY batch order: a colliding pair lands either in
one batch (internal) or across two (the later batch queries the index
that already holds the earlier one).

Replay idempotency: re-processing a micro-batch after a crash appends
duplicate band rows to the index — harmless (minhash_index_query
distincts its output) — and re-merging the same edges into labels is
a no-op; a strict batch-id ledger can be layered with
streaming/exactly_once.py if side-effect-free retries matter.

At 100 TB: the index is band-partitioned parquet (batch joins read
band-aligned row groups), the per-batch CC runs on the CONTRACTED
graph (component-representatives touched by new edges, not the
corpus), and the labels snapshot would be hash-bucketed so a batch
rewrites touched buckets only — here versions are whole-directory for
auditability (the upsert.py trade, documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_misc_tools_spark.sources import fs as _fsh
from data_misc_tools_spark.streaming.upsert import _current_version, _versions


def read_labels(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Current committed (node, component) snapshot, None before the
    first batch."""
    v = _current_version(spark, f"{state_path}/labels")
    if v is None:
        return None
    return spark.read.parquet(f"{state_path}/labels/v={v}")


def read_edges(spark: SparkSession, state_path: str) -> DataFrame | None:
    """The accumulated candidate-edge log (doc_a < doc_b, may hold
    cross-batch duplicates — distinct at read time)."""
    p = f"{state_path}/edges"
    if not _fsh.exists(spark, p):
        return None
    return spark.read.parquet(p).select("doc_a", "doc_b").distinct()


class IncrementalDedupSink:
    """foreachBatch handler maintaining a persisted MinHash index,
    versioned CC labels, and a candidate-edge log."""

    def __init__(
        self,
        index_path: str,
        state_path: str,
        num_perm: int = 8,
        k: int = 5,
        bands: int = 4,
        text_col: str = "text",
        id_col: str = "doc_id",
        portable_hash: bool = False,
        keep_versions: int = 2,
    ) -> None:
        self.index_path = index_path
        self.state_path = state_path
        self.kw = dict(
            num_perm=num_perm,
            k=k,
            bands=bands,
            text_col=text_col,
            id_col=id_col,
            portable_hash=portable_hash,
        )
        self.id_col = id_col
        self.text_col = text_col
        self.keep_versions = keep_versions

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from data_misc_tools_spark.operators import dedup as D
        from data_misc_tools_spark.operators.cluster import (
            connected_components,
            connected_components_incremental,
        )

        spark = batch.sparkSession
        b = batch.select(self.id_col, self.text_col)
        if not b.take(1):
            return
        # the batch feeds three consumers (internal pairs, index
        # query, index append): pin it or each re-reads the source
        b = b.localCheckpoint()

        internal = D.minhash_candidate_pairs(b, **self.kw)
        edges = internal
        if _fsh.exists(spark, self.index_path):
            vs = D.minhash_index_query(b, self.index_path, **self.kw).select(
                F.least("batch_id", "index_id").alias("doc_a"),
                F.greatest("batch_id", "index_id").alias("doc_b"),
            )
            edges = internal.unionByName(vs)
        edges = edges.distinct().localCheckpoint()

        cur = read_labels(spark, self.state_path)
        if cur is None:
            labels = connected_components(edges, src="doc_a", dst="doc_b")
        else:
            labels = connected_components_incremental(
                cur, edges, src="doc_a", dst="doc_b"
            )
        next_v = (_current_version(spark, f"{self.state_path}/labels") or 0) + 1
        labels.write.mode("overwrite").parquet(
            f"{self.state_path}/labels/v={next_v}"
        )
        if self.keep_versions > 0:
            for v in _versions(spark, f"{self.state_path}/labels")[
                : -self.keep_versions
            ]:
                _fsh.delete(spark, f"{self.state_path}/labels/v={v}")

        edges.write.mode("append").parquet(f"{self.state_path}/edges")
        D.minhash_index_append(b, self.index_path, **self.kw)


def incremental_dedup_stream(
    docs: DataFrame,
    index_path: str,
    state_path: str,
    checkpoint: str,
    **params,
):
    """Wire a streaming documents source into an IncrementalDedupSink
    with an availableNow trigger; returns the started StreamingQuery."""
    sink = IncrementalDedupSink(index_path, state_path, **params)
    return (
        docs.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

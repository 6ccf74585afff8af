"""Exactly-once Kafka batch sink: transactional produce + batch-id dedup.

The reference ships a transactional producer path
(reference: hive-udfs/.../kafka/KafkaHelper.java pushWithTransaction:
151-171 — initTransactions / beginTransaction / send* / commitTransaction,
abort on error) that its UDTF never wires up. Spark-first, the same
guarantee is the ``foreachBatch`` idempotent-sink pattern:

- Structured Streaming gives deterministic, replayable batch ids;
- each micro-batch partition is produced inside ONE producer
  transaction (``transactional.id`` = sink group + partition index, so
  a restarted task fences its zombie predecessor);
- every record carries a ``batch_id`` header, so a ``read_committed``
  consumer can drop replays even in the one unavoidable gap (driver
  dies after some partitions committed but before the batch marker is
  written — Kafka transactions cannot span producers);
- a fully-committed batch writes a marker; a replayed batch id with a
  marker is skipped entirely without touching the producer.

No broker exists in this environment, so ``producer_factory`` is
pluggable: the default builds a kafka-python transactional producer
(import-gated); tests inject a fake with the same 5-method surface.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

BATCH_HEADER = "batch_id"


def default_producer_factory(configs: dict[str, str], transactional_id: str):
    """Real transactional producer (requires kafka-python + a broker)."""
    from kafka import KafkaProducer  # import-gated: not in this env

    p = KafkaProducer(
        transactional_id=transactional_id,
        enable_idempotence=True,
        **{k.replace(".", "_"): v for k, v in configs.items()},
    )
    p.init_transactions()
    return p


def push_partition_transactional(
    rows: Iterator,
    producer,
    topic: str,
    batch_id: int,
    key_col: str = "k",
    value_col: str = "v",
) -> int:
    """Produce one partition's rows inside a single transaction.

    Mirrors the reference's pushWithTransaction control flow
    (begin -> send all -> commit; abort + re-raise on any failure) so a
    failed task leaves nothing visible to ``read_committed`` consumers.
    Returns the number of records sent (the reference UDTF echoes acks
    per row; per-partition counts are the batch equivalent).
    """
    producer.begin_transaction()
    n = 0
    try:
        header = [(BATCH_HEADER, str(batch_id).encode())]
        for row in rows:
            k = row[key_col]
            v = row[value_col]
            producer.send(
                topic,
                key=None if k is None else str(k).encode(),
                value=None if v is None else str(v).encode(),
                headers=header,
            )
            n += 1
        producer.commit_transaction()
        return n
    except Exception:
        producer.abort_transaction()
        raise


class ExactlyOnceKafkaSink:
    """``foreachBatch(sink)`` callable with batch-id replay skipping.

    ``commit_dir`` holds one marker file per fully-committed batch id —
    the driver-side ledger that makes a foreachBatch replay (checkpoint
    recovery re-runs the last uncommitted batch) a no-op instead of a
    duplicate produce.
    """

    def __init__(
        self,
        topic: str,
        commit_dir: str,
        producer_factory: Callable = default_producer_factory,
        configs: dict[str, str] | None = None,
        key_col: str = "k",
        value_col: str = "v",
        group: str = "data-misc-tools-spark-sink",
        driver_side: bool = False,
    ) -> None:
        self.topic = topic
        self.commit_dir = commit_dir
        self.producer_factory = producer_factory
        self.configs = dict(configs or {})
        self.key_col = key_col
        self.value_col = value_col
        self.group = group
        # driver_side=True routes rows through toLocalIterator so a
        # driver-local fake producer can observe them (tests). The
        # production path produces executor-side per partition.
        self.driver_side = driver_side
        os.makedirs(commit_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commit_dir, f"batch-{int(batch_id)}.committed")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.committed(batch_id):
            return  # replayed batch: already fully produced + committed
        cols = batch_df.select(self.key_col, self.value_col)
        topic, bid = self.topic, int(batch_id)
        kc, vc = self.key_col, self.value_col
        factory, configs, group = self.producer_factory, self.configs, self.group
        if self.driver_side:
            producer = factory(configs, f"{group}-driver")
            push_partition_transactional(
                cols.toLocalIterator(), producer, topic, bid, kc, vc
            )
        else:

            def send(rows: Iterator) -> None:
                # transactional.id is stable per (sink group, partition
                # attempt) -> a retried task fences its zombie twin
                producer = factory(configs, f"{group}-{os.getpid()}")
                push_partition_transactional(rows, producer, topic, bid, kc, vc)

            cols.foreachPartition(send)
        # all partitions committed: record the batch as done (atomic
        # create; replay between produce and marker is covered by the
        # batch_id header consumer-side)
        with open(self._marker(bid), "x") as f:
            f.write("")

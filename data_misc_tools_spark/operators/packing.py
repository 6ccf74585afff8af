"""Sequence packing: group documents into token-budget batches.

Training-data pipelines batch variable-length documents into
fixed-budget sequences (pad-free packing). Extension surface — the
reference has no such operator (SURVEY §2.3); at 100 TB the packing
must be distributed, deterministic, and single-pass.

Two variants:

- ``pack_by_cumsum`` (oracle-checked): contiguous next-fit in
  cumulative-token space. Documents are ordered deterministically
  inside each shard (md5-derived hash, then id); a document joins the
  batch in which its cumulative range STARTS, i.e. ``batch_id =
  (cumsum - tokens) div budget``. Pure window arithmetic — one
  shuffle, no Python — but a batch may overflow the budget by up to
  one document's tokens (bounded by the corpus max-doc length).
- ``pack_exact`` : strict next-fit (no batch exceeds the budget unless
  a single document alone does). Running-capacity state is inherently
  sequential, so it runs as an ``applyInPandas`` loop per shard; the
  shard count is the parallelism knob (1000 executors want >= 1000
  shards; shards are hash-balanced).

Both are deterministic functions of (id, tokens): stable under
re-partitioning and repeatable across runs — the property that makes
a packing reproducible for training-restart purposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window


def _shard_hash(col, salt: str):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def pack_by_cumsum(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 32,
    salt: str = "",
) -> DataFrame:
    """Assign (shard, batch_id) via cumulative-sum division.

    Output: input columns + ``shard`` + ``batch_id``. One shuffle (the
    shard window); every step is integer arithmetic, so any engine
    agrees on the assignment bit-for-bit."""
    h = _shard_hash(F.col(id_col), salt)
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % shards).cast("long"))
        .withColumn("__cum", F.sum(F.col(token_col)).over(w))
        .withColumn(
            "batch_id",
            # integer div keeps the assignment exact at any cumsum size
            F.expr(f"(__cum - {token_col}) div {int(budget)}"),
        )
        .drop("__h", "__cum")
    )


def pack_exact(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 32,
    salt: str = "",
) -> DataFrame:
    """Strict next-fit packing: walk each shard in deterministic order,
    open a new batch whenever the current one cannot fit the next
    document. Output: (shard, batch_id, id, tokens).

    Per-shard sequential state -> applyInPandas; shards bound the
    parallelism and each shard's rows must fit one executor's memory
    (at 100 TB raise ``shards`` accordingly — the hash balances load)."""
    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("batch_id", LongType()),
            StructField(id_col, LongType()),
            StructField(token_col, LongType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["__h", id_col], kind="mergesort")
        batch, used = 0, 0
        ids = []
        for tok in pdf[token_col]:
            if used > 0 and used + tok > budget:
                batch, used = batch + 1, 0
            used += tok
            ids.append(batch)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                "batch_id": ids,
                id_col: pdf[id_col].to_numpy(),
                token_col: pdf[token_col].to_numpy(),
            }
        )

    h = _shard_hash(F.col(id_col), salt)
    return (
        df.select(F.col(id_col), F.col(token_col).cast("long"))
        .withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % shards).cast("long"))
        .groupBy("shard")
        .applyInPandas(pack, out_schema)
    )

"""Training-data export: WebDataset-style tar shards.

Beyond-reference capability: multimodal training loaders (WebDataset,
torchdata) consume datasets as numbered ``.tar`` shards of
(name, payload) members. This builds those shards distributed:
deterministic hash-sharding, per-shard USTAR assembly inside
``applyInPandas`` (Python is the right tool here — the output IS an
opaque binary artifact, not a relational hot path), canonical
metadata (mtime=0, mode 0644, uid/gid 0) so shard bytes are
bit-reproducible run-to-run.

Scale shape: ONE shuffle on the shard id (AQE-balanced; shard count
chosen by the caller to bound shard size), then each shard is
assembled independently — no driver collect, no global sort. Member
order inside a shard is (name) — deterministic under any
partitioning. For text-only corpora prefer ``df.write.json`` (JSONL)
— native, splittable, columnar-pruned upstream; tar shards are for
binary payload + loader compatibility.

The tar size is a pure function of the member sizes:

    512*members + Σ ceil(size/512)*512 + 1024, padded to 10240

which is what the oracle-checked demo recomputes relationally — the
Spark side only matches if the assembled archive has exactly the
canonical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from data_misc_tools_spark.operators.sampling import _hash_u32

__all__ = ["tar_shard_export", "tar_expected_size"]

_RECORDSIZE = 10240  # tarfile default blocking factor 20 * 512


def tar_expected_size(total_payload_padded: F.Column, n_members: F.Column) -> F.Column:
    """Canonical USTAR archive size from member stats: headers +
    512-padded payloads + two end blocks, padded to the 10240-byte
    record size. ``total_payload_padded`` must already be
    Σ ceil(size/512)*512."""
    raw = n_members * 512 + total_payload_padded + 1024
    return (-F.floor(-raw / _RECORDSIZE)).cast("long") * _RECORDSIZE


def tar_shard_export(
    df: DataFrame,
    n_shards: int,
    payload_col: str = "payload",
    name_col: str = "name",
    id_col: str = "doc_id",
    salt: str = "tarshard:",
) -> DataFrame:
    """Assemble WebDataset-style tar shards: hash-assign each row to a
    shard (engine-portable md5 rule, stable under repartitioning),
    then build one canonical USTAR archive per shard.

    Output: (shard_id, n_members, n_bytes, tar) — ``tar`` is the
    archive blob; callers persist with
    ``df.write.format("parquet")`` or side-write each blob to object
    storage from ``foreachPartition``.
    """
    shard = (_hash_u32(F.col(id_col), salt) % n_shards).alias("shard_id")
    src = df.select(shard, F.col(name_col).alias("__name"), F.col(payload_col).alias("__payload"))
    out_schema = StructType(
        [
            StructField("shard_id", LongType()),
            StructField("n_members", LongType()),
            StructField("n_bytes", LongType()),
            StructField("tar", BinaryType()),
        ]
    )

    def build(pdf):
        import io
        import tarfile

        import pandas as pd

        order = sorted(range(len(pdf)), key=lambda i: pdf["__name"].iloc[i])
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for i in order:
                b = bytes(pdf["__payload"].iloc[i])
                info = tarfile.TarInfo(name=str(pdf["__name"].iloc[i]))
                info.size = len(b)
                info.mtime = 0
                info.mode = 0o644
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(b))
        blob = buf.getvalue()
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "n_members": [len(pdf)],
                "n_bytes": [len(blob)],
                "tar": [blob],
            }
        )

    return src.groupBy("shard_id").applyInPandas(build, schema=out_schema)


def shard_manifest(spark, path: str, glob: str | None = None) -> DataFrame:
    """Manifest of an exported shard directory — (file, bytes,
    sha256), the lineage record a training job pins next to its data
    (did the shards change since the run that read them?).

    DISTRIBUTED hashing via the built-in ``binaryFile`` source: one
    task per file reads the bytes and computes sha2-256 JVM-side — no
    driver-side reads, no Python, scales to any shard count. Order-
    insensitive by construction (a manifest row per file; compare as
    sets or join on file name).

    ``glob`` filters file names (e.g. ``*.tar``). Caveat from the
    source itself: binaryFile loads each file's content as ONE row,
    so it is for shard-sized artifacts (MBs-GBs), not a substitute
    for a record format.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
        F.col("length").cast("long").alias("bytes"),
        F.lower(F.sha2(F.col("content"), 256)).alias("sha256"),
    )

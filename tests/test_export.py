"""Tar shard export: archive readability, canonical determinism,
size formula, shard-assignment stability."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from data_misc_tools_spark.operators.export import tar_shard_export


def _src(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc_"), F.col("id"), F.lit(".txt")).alias("name"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "UTF-8").alias("payload"),
    )


def test_tar_shards_read_back_with_tarfile(spark):
    out = tar_shard_export(_src(spark), n_shards=4).collect()
    assert {r.shard_id for r in out} <= set(range(4))
    seen = {}
    for r in out:
        assert r.n_bytes == len(r.tar) and r.n_bytes % 10240 == 0
        with tarfile.open(fileobj=io.BytesIO(bytes(r.tar))) as tf:
            names = tf.getnames()
            assert names == sorted(names)
            assert len(names) == r.n_members
            for m in tf.getmembers():
                assert m.mtime == 0 and m.uid == 0 and m.mode == 0o644
                body = tf.extractfile(m).read()
                i = int(m.name.split("_")[1].split(".")[0])
                assert body == f"payload-{i}".encode()
                seen[i] = r.shard_id
    assert len(seen) == 40  # every row landed in exactly one shard


def test_tar_shards_bit_deterministic_under_repartition(spark):
    a = {r.shard_id: bytes(r.tar)
         for r in tar_shard_export(_src(spark), n_shards=4).collect()}
    b = {r.shard_id: bytes(r.tar)
         for r in tar_shard_export(_src(spark).repartition(7), n_shards=4).collect()}
    assert a == b


def test_tar_size_matches_formula(spark):
    rows = tar_shard_export(_src(spark, n=10), n_shards=1).collect()
    assert len(rows) == 1
    r = rows[0]
    sizes = [len(f"payload-{i}".encode()) for i in range(10)]
    padded = sum((s + 511) // 512 * 512 for s in sizes)
    raw = 10 * 512 + padded + 1024
    assert r.n_bytes == (raw + 10239) // 10240 * 10240


def test_shard_manifest_hashes_match_hashlib(spark, tmp_path):
    """The binaryFile-source manifest must agree byte-for-byte with a
    local hashlib pass, and the glob must filter."""
    import hashlib

    from data_misc_tools_spark.operators.export import shard_manifest

    (tmp_path / "a.tar").write_bytes(b"alpha" * 100)
    (tmp_path / "b.tar").write_bytes(b"beta")
    (tmp_path / "notes.txt").write_text("ignore me")
    got = {
        r.file: (r.bytes, r.sha256)
        for r in shard_manifest(spark, str(tmp_path), glob="*.tar").collect()
    }
    want = {
        name: (
            len((tmp_path / name).read_bytes()),
            hashlib.sha256((tmp_path / name).read_bytes()).hexdigest(),
        )
        for name in ["a.tar", "b.tar"]
    }
    assert got == want  # and notes.txt filtered out

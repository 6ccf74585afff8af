"""Python DataSource connectors: zktree and rediskeys enter the planner
as real scans (schema declared, partitions planned, executor-side
reads) — reference: UDFZooKeeperRead.java, UDTFJedisKeys.java.
"""

import json

from pyspark.sql import functions as F

ZK_SEED = {"/app": "root", "/app/db": "mysql", "/app/db/host": "h1", "/other": "x"}


def test_zktree_format_reads_subtree(spark):
    df = (
        spark.read.format("zktree")
        .option("paths", "/app")
        .option("fake_data", json.dumps(ZK_SEED))
        .load()
    )
    assert df.columns == ["p", "v"]
    rows = {(r.p, r.v) for r in df.collect()}
    assert rows == {("/app", "root"), ("/app/db", "mysql"), ("/app/db/host", "h1")}


def test_zktree_merges_covered_roots_and_partitions(spark):
    # /app/db is covered by /app -> merge_paths plans 2 partitions, not 3
    df = (
        spark.read.format("zktree")
        .option("paths", "/app,/app/db,/other")
        .option("fake_data", json.dumps(ZK_SEED))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 4  # no duplicated /app/db subtree


def test_zktree_composes_with_sql(spark):
    df = (
        spark.read.format("zktree")
        .option("paths", "/app")
        .option("fake_data", json.dumps(ZK_SEED))
        .load()
    )
    out = df.filter(F.col("p").endswith("host")).select("v")
    assert [r.v for r in out.collect()] == ["h1"]


def test_rediskeys_format_scans_pattern(spark):
    data = {"user:1": "ann", "user:2": "bob", "cfg:x": "1", "user:10": "cat"}
    df = (
        spark.read.format("rediskeys")
        .option("pattern", "user:*")
        .option("fake_data", json.dumps(data))
        .load()
    )
    assert df.columns == ["k", "v"]
    rows = {(r.k, r.v) for r in df.collect()}
    # page size 3 in the fake -> the cursor loop really pages
    assert rows == {("user:1", "ann"), ("user:2", "bob"), ("user:10", "cat")}

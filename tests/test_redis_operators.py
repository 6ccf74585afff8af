"""Redis operators against the file-backed fake (per-partition client
lifecycle + ctx passthrough + fan-out semantics)."""

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.operators import redis_ops as R
from data_misc_tools_spark.testing.fakeredis import FakeRedis, fake_redis_factory


@pytest.fixture()
def store(tmp_path):
    path = str(tmp_path / "redis.json")
    r = FakeRedis(path)
    r.mset({"user:1": "alice", "user:2": "bob", "cfg:x": "1"})
    return path


def test_jd_get_with_missing_keys(spark, store):
    df = spark.createDataFrame(
        [("c1", "user:1"), ("c2", "user:2"), ("c3", "nope")], "ctx string, k string"
    )
    rows = {r.k: (r.ctx, r.ret) for r in
            R.jd_get(df, fake_redis_factory(store)).collect()}
    assert rows["user:1"] == ("c1", "alice")
    assert rows["nope"] == ("c3", None)  # missing key -> null, ctx intact


def test_jd_set_visible_to_test_process(spark, store):
    df = spark.createDataFrame([("k1", "v1"), ("k2", "v2")], "k string, v string")
    out = R.jd_set(df, fake_redis_factory(store)).collect()
    assert all(r.ret == "OK" for r in out)
    assert FakeRedis(store).get("k1") == "v1"  # executor write observable


def test_jd_set_nx_xx(spark, store):
    df = spark.createDataFrame([("user:1", "override")], "k string, v string")
    out = R.jd_set(df, fake_redis_factory(store), nx=True).first()
    assert out.ret is None  # NX on existing key -> no-op
    assert FakeRedis(store).get("user:1") == "alice"
    out2 = R.jd_set(df, fake_redis_factory(store), xx=True).first()
    assert out2.ret == "OK"  # XX on existing key -> set
    assert FakeRedis(store).get("user:1") == "override"


def test_jd_mget_fans_out_one_row_per_value(spark, store):
    df = spark.createDataFrame(
        [("ctx0", ["user:1", "user:2", "gone"])], "ctx string, ks array<string>"
    )
    rows = R.jd_mget(df, fake_redis_factory(store), "ks").collect()
    assert len(rows) == 3  # 1 input row -> 3 output rows (UDTF forward per value)
    by_key = {r.key: r.ret for r in rows}
    assert by_key == {"user:1": "alice", "user:2": "bob", "gone": None}
    assert all(r.ctx == "ctx0" for r in rows)


def test_jd_del_counts(spark, store):
    df = spark.createDataFrame([("user:1",), ("missing",)], "k string")
    rows = {r.k: r.ret for r in R.jd_del(df, fake_redis_factory(store)).collect()}
    assert rows == {"user:1": 1, "missing": 0}
    assert FakeRedis(store).get("user:1") is None


def test_jd_mset_map_column(spark, store):
    df = spark.range(1).select(
        F.create_map(F.lit("m1"), F.lit("x"), F.lit("m2"), F.lit("y")).alias("kv")
    )
    assert R.jd_mset(df, fake_redis_factory(store)).first().ret == "OK"
    assert FakeRedis(store).get("m2") == "y"


def test_jd_keys_driver_side_scan(spark, store):
    df = R.jd_keys(spark, fake_redis_factory(store), "user:*")
    assert [r.key for r in df.collect()] == ["user:1", "user:2"]

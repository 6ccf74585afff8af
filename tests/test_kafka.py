"""Kafka wrapper semantics testable without a broker."""

import pytest

from data_misc_tools_spark.operators import kafka as K


def test_time_window_slice_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (2, "2024-01-15 12:00:00"),
         (3, "2024-01-19 23:59:59"), (4, "2024-01-20 00:00:00")],
        "id int, s string",
    ).selectExpr("id", "cast(s as timestamp) as ts")
    got = {r.id for r in
           K.time_window_slice(df, "ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00").collect()}
    assert got == {1, 2, 3}  # [start, end): start inclusive, end exclusive


def test_empty_window_semantics(spark):
    df = spark.createDataFrame([(1, "2024-01-10 00:00:00")], "id int, s string") \
        .selectExpr("id", "cast(s as timestamp) as ts")
    assert K.time_window_slice(df, "ts", "2024-01-10 00:00:00", "2024-01-10 00:00:00").count() == 0
    assert K.time_window_slice(df, "ts", "2024-01-20 00:00:00", "2024-01-10 00:00:00").count() == 0


def test_to_millis_formats():
    assert K._to_millis("1970-01-01 00:00:01") == 1000
    assert K._to_millis("1970-01-01T00:00:01") == 1000
    assert K._to_millis("1970-01-02") == 86_400_000
    assert K._to_millis("1970-01-01 00:00:00.5") == 500
    with pytest.raises(ValueError):
        K._to_millis("not a time")


def test_kf_pull_contract_without_broker(spark):
    # start >= end -> empty frame in the record shape, no broker needed
    df = K.kf_pull(spark, "broker:9092", "2024-01-02", "2024-01-01", "topic_a")
    assert df.columns == ["t", "ct", "k", "v"]
    assert df.count() == 0
    with pytest.raises(ValueError):
        K.kf_pull(spark, "", "2024-01-01", "2024-01-02", "topic_a")


def test_default_cfgs_match_reference():
    c = K.consumer_defaults()
    assert c["max.poll.records"] == "1000"            # Configs.scala:74
    assert c["max.partition.fetch.bytes"] == "2097152"  # :75
    assert c["enable.auto.commit"] == "false"
    p = K.producer_defaults()
    assert p["compression.type"] == "gzip"
    assert p["request.timeout.ms"] == "1000"          # UDTFKafkaPush.java:41

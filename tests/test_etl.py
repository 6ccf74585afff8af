"""ETL idioms: JSON results explode + timestamp extraction."""

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.operators.etl import json_results_explode, parse_event_time


def test_explode_n_elements(spark):
    df = spark.createDataFrame(
        [
            (1, '{"results":[{"type":"a","v":1},{"type":"b","v":2}]}'),
            (2, '{"results":[{"type":"c","v":3}]}'),
            (3, '{"results":[]}'),
            (4, None),
        ],
        "id int, content string",
    )
    out = json_results_explode(df, "content", "type string, v int")
    rows = [(r.id, r.ev.type if r.ev else None) for r in out.orderBy("id").collect()]
    # 1 -> 2 rows, 2 -> 1 row, 3/4 -> one null row each (explode_outer keeps ctx)
    assert rows == [(1, "a"), (1, "b"), (2, "c"), (3, None), (4, None)]


def test_nested_braces_safe(spark):
    # the reference's split-on-'},{' regex breaks on nested objects
    # (SURVEY §7.3); from_json does not
    df = spark.createDataFrame(
        [(1, '{"results":[{"type":"x","meta":{"a":1,"b":2}},{"type":"y","meta":{}}]}')],
        "id int, content string",
    )
    out = json_results_explode(df, "content", "type string")
    assert [r.ev.type for r in out.collect()] == ["x", "y"]


def test_ctx_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "keep-me", '{"results":[{"t":"a"}]}')], "id int, tag string, content string"
    )
    out = json_results_explode(df, "content", "t string").first()
    assert out.tag == "keep-me" and out.id == 1


def test_parse_event_time(spark):
    df = spark.createDataFrame(
        [("2024-03-01T12:30:45.123456Z",), ("2024-03-01T12:30:45",)], "s string"
    )
    rows = df.select(parse_event_time("s").alias("ts")).collect()
    assert str(rows[0].ts) == "2024-03-01 12:30:45"  # sub-seconds truncated (README:217)
    assert str(rows[1].ts) == "2024-03-01 12:30:45"


def test_kf_topics_import_gate(spark):
    from data_misc_tools_spark.operators.kafka import kf_topics

    with pytest.raises(ImportError, match="confluent-kafka or kafka-python"):
        kf_topics(spark, "broker:9092")

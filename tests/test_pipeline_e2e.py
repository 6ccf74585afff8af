"""The reference's flagship documented ETL pipeline, end-to-end on this
engine (reference: README.md:173-219):

  1. build per-window request URLs (TP/default_now macros, url_encode)
  2. t_http_get enrichment with ctx passthrough           (:183-199)
  3. land (load_time, query_begin, query_end, content)    (:199-201)
  4. explode content '{"results":[...]}' into events      (:202-214)
  5. extract timestamp (first 19 chars) + type, cast      (:215-219)
  6. aggregate per type

The loopback server returns a deterministic results document per URL,
so every stage's output is assertable.
"""

import json

import pyspark.sql.functions as F

from data_misc_tools_spark.functions.scalar import default_now, tp, url_encode
from data_misc_tools_spark.operators.etl import json_results_explode, parse_event_time
from data_misc_tools_spark.operators.http import t_http_get
from data_misc_tools_spark.testing.httpserver import ensure_echo_server


def test_reference_etl_pipeline(spark):
    port = ensure_echo_server()

    # stage 1: request table with ctx columns (the reference's
    # named_struct ctx) — one window per row; URL embeds a results doc
    payload = {
        "results": [
            {"timestamp": "2024-03-01T10:00:05.123456", "type": "chat"},
            {"timestamp": "2024-03-01T10:30:00.000001", "type": "visit"},
        ]
    }
    doc = json.dumps(payload, separators=(",", ":"))
    windows = spark.createDataFrame(
        [(1700000000, "2024-03-01T10:00", "2024-03-01T11:00"),
         (1700003600, "2024-03-01T11:00", None)],
        "t bigint, s string, e string",
    )
    reqs = windows.select(
        "t",
        "s",
        default_now("e").alias("e"),
        F.concat(
            F.lit(f"http://127.0.0.1:{port}/"), url_encode(F.lit(doc))
        ).alias("url"),
    )

    # stage 2+3: enrichment; ctx (t, s, e) flows through
    landed = t_http_get(reqs, "url").select(
        F.col("t").alias("load_time"),
        F.col("s").alias("query_begin"),
        F.col("e").alias("query_end"),
        F.col("http_result.code").alias("code"),
        F.col("http_result.content").alias("content"),
    )
    rows = landed.collect()
    assert all(r.code == 200 for r in rows)
    assert all(r.query_end is not None for r in rows)  # default_now filled NULL

    # the echo server returns the (url-decoded) path: our results doc
    assert json.loads(rows[0].content) == payload

    # stage 4+5: explode + extract (from_json replaces the split-regex)
    events = json_results_explode(landed, "content", "timestamp string, type string")
    typed = events.select(
        "load_time",
        parse_event_time(F.col("ev.timestamp")).alias("time_stamp"),
        F.col("ev.type").alias("type"),
    )
    out = typed.collect()
    assert len(out) == 4  # 2 windows x 2 results
    assert {str(r.time_stamp) for r in out} == {
        "2024-03-01 10:00:05", "2024-03-01 10:30:00"  # sub-seconds truncated
    }

    # stage 6: downstream aggregation
    agg = {r.type: r.n for r in typed.groupBy("type").agg(F.count("*").alias("n")).collect()}
    assert agg == {"chat": 2, "visit": 2}

    # the TP macro renders the landing time exactly like the reference
    fmt = windows.select(tp("yyyy-MM-dd HH:mm", "t").alias("lt")).first().lt
    assert fmt == "2023-11-14 22:13"

"""HTTP batch enrichment operators against the loopback echo server."""

import pyspark.sql.functions as F

from data_misc_tools_spark.operators.http import t_http_get, t_http_post
from data_misc_tools_spark.testing.httpserver import ensure_echo_server


def _base(spark, port, n=5):
    return spark.range(n).select(
        F.col("id"),
        F.lit("ctx").alias("tag"),
        F.concat(F.lit(f"http://127.0.0.1:{port}/id-"), F.col("id")).alias("url"),
    )


def test_get_enrichment_and_ctx_passthrough(spark):
    port = ensure_echo_server()
    out = t_http_get(_base(spark, port), "url").orderBy("id").collect()
    assert len(out) == 5
    for row in out:
        assert row.tag == "ctx"  # every input column carried through
        assert row.http_result.code == 200
        assert row.http_result.content == f"id-{row.id}"
        assert "Content-Type" in row.http_result.headers


def test_post_body_roundtrip(spark):
    port = ensure_echo_server()
    df = _base(spark, port, 3).withColumn(
        "body", F.concat(F.lit("payload-"), F.col("id"))
    )
    out = t_http_post(df, "url", "body").orderBy("id").collect()
    for row in out:
        assert row.http_result.content == f"id-{row.id}|payload-{row.id}"


def test_error_as_data_never_fails_task(spark):
    port = ensure_echo_server()
    df = spark.createDataFrame(
        [
            (1, f"http://127.0.0.1:{port}/err/500"),
            (2, f"http://127.0.0.1:{port}/err/404"),
            (3, "http://127.0.0.1:9/refused"),
            (4, None),
        ],
        "id int, url string",
    )
    rows = {r.id: r.http_result for r in t_http_get(df, "url", timeout_ms=1000).collect()}
    assert rows[1].code == 500
    assert rows[2].code == 404
    assert rows[3].code == -1 and "refused" in rows[3].content.lower()
    assert rows[4].code == -1  # null url -> error row (not NPE)


def test_custom_headers_sent(spark):
    port = ensure_echo_server()
    df = spark.createDataFrame(
        [(1, f"http://127.0.0.1:{port}/h")], "id int, url string"
    ).withColumn("hdrs", F.create_map(F.lit("X-Tag"), F.lit("42")))
    out = t_http_get(df, "url", headers_col="hdrs").first()
    assert out.http_result.code == 200

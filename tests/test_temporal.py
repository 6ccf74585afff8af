"""As-of and range join semantics."""

import pyspark.sql.functions as F

from data_misc_tools_spark.operators.temporal import asof_join, range_join


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (3, 100, 30), (4, 200, 15)],
        "lid int, k int, t int",
    )
    right = spark.createDataFrame(
        [(100, 5, "a"), (100, 20, "b"), (100, 25, "c"), (300, 1, "z")],
        "k int, t int, val string",
    )
    return left, right


def test_asof_strict_excludes_ties(spark):
    left, right = _sides(spark)
    out = {
        r.lid: r.val_asof
        for r in asof_join(left, right, on="t", by="k", right_cols=["val"], strict=True).collect()
    }
    assert out[1] == "a"   # t=10: only t=5 is before
    assert out[2] == "a"   # t=20 strict: the t=20 right row is excluded
    assert out[3] == "c"   # t=30: latest prior is t=25
    assert out[4] is None  # no right rows for k=200


def test_asof_non_strict_includes_ties(spark):
    left, right = _sides(spark)
    out = {
        r.lid: r.val_asof
        for r in asof_join(left, right, on="t", by="k", right_cols=["val"], strict=False).collect()
    }
    assert out[2] == "b"  # tie included


def test_asof_no_row_amplification(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="t", by="k", right_cols=["val"])
    assert out.count() == left.count()


def test_asof_plan_is_single_shuffle_no_join(spark):
    left, right = _sides(spark)
    plan = (
        asof_join(left, right, on="t", by="k", right_cols=["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union-window construction: a Window over one Exchange, no join node
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_bands(spark):
    facts = spark.createDataFrame([(1, 0.0), (2, 49.9), (3, 50.0), (4, -5.0)], "id int, v double")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 100.0)], "band string, lo double, hi double"
    )
    out = {r.id: r.band for r in range_join(facts, bands, "v").collect()}
    assert out == {1: "low", 2: "low", 3: "mid", 4: None}  # lo inclusive, hi exclusive

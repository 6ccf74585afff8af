"""Scale-path I/O evidence: partition pruning and sketch aggregates."""

import pyspark.sql.functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_then_pruned_read(spark, sf_dir, tmp_path):
    """write.partitionBy(lang) -> a lang filter becomes a PARTITION
    filter (directory pruning), not a data filter: the scan never opens
    the other languages' files. This is the layout that turns a 100 TB
    corpus scan into a per-language slice read."""
    from data_misc_tools_spark.session import load_tables

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = str(tmp_path / "docs_by_lang")
    d.write.partitionBy("lang").parquet(out)

    rd = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = _plan(rd)
    assert "PartitionFilters" in plan
    # the lang predicate is satisfied by pruning, pushed as partition
    # (not data) filter
    assert plan.split("PartitionFilters")[1].split("]")[0].count("lang") >= 1
    want = d.filter(F.col("lang") == "en").count()
    assert rd.count() == want


def test_partition_pruning_reads_fewer_files(spark, sf_dir, tmp_path):
    from data_misc_tools_spark.session import load_tables

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = str(tmp_path / "docs_by_source")
    d.write.partitionBy("source").parquet(out)
    all_rows = spark.read.parquet(out)
    one = all_rows.filter(F.col("source") == "src1")
    # selected files metric: pruned scan touches a strict subset
    assert one.count() < all_rows.count()
    assert one.select("source").distinct().count() == 1


def test_sketch_aggregates_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++) and percentile_approx are the
    documented scale substitutes for their exact twins (1000x less
    shuffle state); pin their error here so the trade is explicit."""
    from data_misc_tools_spark.session import load_tables

    e = load_tables(spark, sf_dir, ["events"])["events"]
    exact, approx = e.agg(
        F.countDistinct("user_id").alias("x"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.05

    p_exact = e.agg(F.expr("percentile(value, 0.9)")).first()[0]
    p_approx = e.agg(F.percentile_approx("value", 0.9, 1000)).first()[0]
    spread = e.agg(F.max("value") - F.min("value")).first()[0]
    assert abs(p_approx - p_exact) <= 0.05 * spread

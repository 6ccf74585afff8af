"""DML/DDL surface (SURVEY §2.3: CTAS, INSERT INTO/OVERWRITE, DROP)."""

import tempfile

import pytest


@pytest.fixture(scope="module", autouse=True)
def warehouse(spark):
    yield


def test_ctas_insert_overwrite_roundtrip(spark, sf_dir):
    from data_misc_tools_spark.session import load_tables

    load_tables(spark, sf_dir, ["nation"])
    spark.sql("drop table if exists t_nations")
    spark.sql(
        "create table t_nations using parquet as "
        "select n_nationkey, n_name from nation where n_nationkey < 5"
    )
    assert spark.table("t_nations").count() == 5
    spark.sql("insert into t_nations select n_nationkey, n_name from nation where n_nationkey = 5")
    assert spark.table("t_nations").count() == 6
    spark.sql(
        "insert overwrite t_nations select n_nationkey, n_name from nation where n_nationkey >= 20"
    )
    assert spark.table("t_nations").count() == 5
    spark.sql("drop table t_nations")
    assert "t_nations" not in [t.name for t in spark.catalog.listTables()]


def test_insert_via_sql_script_runner(spark, sf_dir, tmp_path):
    from data_misc_tools_spark.plans.sql_script import run_sql_script
    from data_misc_tools_spark.session import load_tables

    load_tables(spark, sf_dir, ["region"])
    results = run_sql_script(
        spark,
        """
        drop table if exists t_regions;
        create table t_regions using parquet as select * from region;  -- CTAS
        select count(*) as n from t_regions;
        """,
    )
    # results are lazy DataFrames: consume before mutating DDL runs
    assert results[2][1].first().n == 5
    run_sql_script(spark, "drop table t_regions;")


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """The reference stores tables as ORC (README.md:205); verify the
    format path end-to-end."""
    from data_misc_tools_spark.session import load_tables

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    path = str(tmp_path / "orc_out")
    li.limit(1000).write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == 1000
    assert set(back.columns) == set(li.columns)

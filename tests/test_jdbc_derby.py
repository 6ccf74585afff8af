"""JDBC bridges end-to-end against embedded Derby (ships with Spark).

Upgrades the JDBC surface from argument-construction checks to a real
round-trip: DDL + inserts via exec_update (reference:
hive/JdbcHelper.scala:27-44), executor-parallel partitioned read via
jdbc_to_df (replacing the reference's collect-to-driver jdbcToDF:46-64),
write-back via df_to_jdbc, and query->view. Derby's in-memory database
is per-JVM, which is exactly the local[*] test topology; on a cluster
the same code points at a networked database.
"""

import pytest

from data_misc_tools_spark.sources.jdbc import (
    df_to_jdbc,
    exec_update,
    jdbc_to_df,
    jdbc_to_view,
)

URL = "jdbc:derby:memory:jdbctest;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby(spark):
    exec_update(spark, URL, "CREATE TABLE people (id INT, name VARCHAR(32))")
    for i, name in enumerate(["ann", "bob", "cat", "dan", "eve", "fay"]):
        n = exec_update(
            spark, URL, f"INSERT INTO people VALUES ({i}, '{name}')"
        )
        assert n == 1
    yield URL
    exec_update(spark, URL, "DROP TABLE people")


def test_jdbc_to_df_reads_query(spark, derby):
    df = jdbc_to_df(
        spark, derby, "SELECT id, name FROM people WHERE id >= 2", properties=PROPS
    )
    rows = sorted((r.ID, r.NAME) for r in df.collect())
    assert rows == [(2, "cat"), (3, "dan"), (4, "eve"), (5, "fay")]


def test_jdbc_partitioned_read_is_parallel_and_complete(spark, derby):
    df = jdbc_to_df(
        spark, derby, "SELECT id, name FROM people", properties=PROPS,
        partition_column="id", lower_bound=0, upper_bound=6, num_partitions=3,
    )
    # range predicates really split the scan into 3 tasks
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 6  # no row lost/duplicated at range boundaries


def test_df_to_jdbc_write_back_roundtrip(spark, derby):
    src = spark.createDataFrame([(10, "zed"), (11, "yan")], "id int, name string")
    df_to_jdbc(src, derby, "people2", mode="overwrite", properties=PROPS)
    # the JDBC writer quotes lowercase column names; Derby folds
    # unquoted identifiers to uppercase, so read back with SELECT *
    back = jdbc_to_df(spark, derby, "SELECT * FROM people2", properties=PROPS)
    assert sorted((r.id, r.name) for r in back.collect()) == [(10, "zed"), (11, "yan")]
    exec_update(spark, derby, "DROP TABLE people2")


def test_jdbc_to_view_composes_with_sql(spark, derby):
    jdbc_to_view(
        spark, derby, "SELECT id, name FROM people", "people_v", properties=PROPS
    )
    n = spark.sql("SELECT count(*) AS n FROM people_v WHERE id < 3").first().n
    assert n == 3


def test_runner_records_to_jdbc_and_restart_recovery(spark, tmp_path):
    """Execution records persisted to a database table (the reference's
    RecordDao/MySQL path) — and a fresh Runner instance recovers its
    interval throttle state from the database across 'restarts'."""
    import time

    from data_misc_tools_spark.runner import Runner, ScriptTask

    script = tmp_path / "job.py"
    script.write_text("def run(spark, param):\n    return 'ok'\n")
    url = "jdbc:derby:memory:runnerrec;create=true"
    kw = dict(
        records_jdbc_url=url, records_table="exec_records",
        jdbc_properties=PROPS,
    )
    r1 = Runner(spark, str(tmp_path / "unused"), **kw)
    task = ScriptTask(str(script), interval="PT1H")
    assert r1.run_once(task) == "ok"
    recs = [r for r in r1.records().collect() if r.status != "running"]
    assert len(recs) == 1 and recs[0].status == "succeeded"

    # restart: a brand-new Runner reads last_started from the DB, so
    # the 1-hour throttle suppresses an immediate re-run
    r2 = Runner(spark, str(tmp_path / "unused2"), **kw)
    assert r2.last_started  # recovered
    assert not r2.is_ready(task, now=time.time())

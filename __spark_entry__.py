"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + the
training-data-pipeline suite) as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query for the driver's
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _prepare(spark: SparkSession) -> None:
    """Install functions + parity confs on the driver-provided session.

    The driver builds its own SparkSession, so the runtime-settable
    parity configs (LAST_WIN map merge for m_add, pinned UTC session
    timezone for timestamp round-trips) must be applied here, not only
    in our own session factory.
    """
    from data_misc_tools_spark.session import register_all

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Parquet micros timestamps without isAdjustedToUTC must read as
    # TIMESTAMP (LTZ), not TIMESTAMP_NTZ — value-identical under the UTC
    # session timezone, and required by unix_millis/session_window.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    register_all(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's own argmax test query shape
    (max_with over a grouped dimension, tests.sql:79-83) on sf0.001."""
    _prepare(spark)
    from data_misc_tools_spark.catalog import QUERIES

    return QUERIES["argmax_customer_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_misc_tools_spark.catalog import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from data_misc_tools_spark.catalog import ORACLES

    return dict(ORACLES)

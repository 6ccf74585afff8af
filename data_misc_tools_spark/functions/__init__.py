"""SQL-function surface: scalar, aggregate, and map helpers.

The analog of the reference's registered Hive UDF library
(reference: hive-udfs/src/test/resources/setup.sql:6-56).
"""

from data_misc_tools_spark.functions.scalar import (
    cfgs,
    m_add,
    su_strip,
    tp,
    url_encode,
)
from data_misc_tools_spark.functions.aggregates import max_with

__all__ = ["url_encode", "m_add", "su_strip", "cfgs", "tp", "max_with"]

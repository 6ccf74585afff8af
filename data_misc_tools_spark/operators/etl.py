"""ETL idioms from the reference's documented pipeline.

The reference's flagship ETL splits a JSON response body into
per-event rows with string surgery: ``lateral view explode(split(
su_strip(get_json_object(content,'$.results'),'[]'), '(?<=\\}),(?=\\{)'))``
followed by per-field ``get_json_object`` + casts (reference:
README.md:202-219).

Spark-first, that whole pipeline is ``from_json`` with an explicit
schema + ``explode`` — no regex lookarounds (which also do not exist
in RE2-based engines), no split-on-brace fragility with nested braces
(the known edge case of the reference's approach, SURVEY §7.3), and
Catalyst prunes unreferenced JSON fields from the parse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_results_explode(
    df: DataFrame,
    content_col: str,
    element_schema: str,
    results_path: str = "results",
    out_col: str = "ev",
) -> DataFrame:
    """Explode a ``{"<results_path>": [...]}`` JSON document column into
    one row per array element (struct-typed ``out_col``), keeping all
    input columns (ctx passthrough).

    ``element_schema`` is the element's DDL schema, e.g.
    ``"timestamp string, type string"`` — explicit schemas keep the
    parse single-pass and the output analysis-time typed, matching the
    engine's fixed-schema stance (SURVEY §1.3).
    """
    full_schema = f"struct<{results_path}: array<struct<{element_schema}>>>"
    parsed = F.from_json(F.col(content_col), full_schema)
    return df.withColumn(
        out_col, F.explode_outer(parsed[results_path])
    )


def parse_event_time(
    col: Column | str, fmt: str = "yyyy-MM-dd'T'HH:mm:ss", prefix_len: int = 19
) -> Column:
    """The reference's timestamp-extraction idiom: first 19 chars of an
    ISO-8601-with-subseconds string cast to timestamp (reference:
    README.md:217 ``cast(substr(ev.timestamp,1,19) as timestamp)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(F.substring(c, 1, prefix_len), fmt)

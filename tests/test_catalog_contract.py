"""Driver-contract smoke: every catalog query runs at sf0.001 with a
stable schema; every oracle is syntactically valid DuckDB SQL.

(The full value-hash comparison runs in tools/check.py — at sf0.01 it
is the driver's own gate; here we keep the per-test cost small.)
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_oracle_or_documented_skip():
    from data_misc_tools_spark.catalog import ROWS_ONLY

    missing = set(QUERIES) - set(ORACLES)
    assert missing <= ROWS_ONLY, f"queries without oracle or skip note: {missing - ROWS_ONLY}"


def test_graded_window_is_the_designed_50():
    """The driver grades only the first 50 queries() entries: pin the
    window to GRADED_FIRST so an innocent reorder/addition can't push
    an oracle-checked operator out of grading silently."""
    from data_misc_tools_spark.catalog import GRADED_FIRST, ROWS_ONLY

    names = list(QUERIES)
    assert names[:50] == GRADED_FIRST
    ungraded_oracle_less = [
        n for n in names[:50] if n not in ORACLES and n not in ROWS_ONLY
    ]
    assert not ungraded_oracle_less


def test_no_catalog_entry_escapes_grading():
    """VERDICT r8 ask #7 — the zero-backlog grading invariant: every
    catalog entry must either hold an official driver row in some
    CORRECTNESS_r*.json already, or sit in the CURRENT GRADED_FIRST
    window (so it earns one this round). The r7 slip (a 20-entry
    backlog accumulating while the window stayed frozen) can no longer
    recur silently."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graded: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(p) as f:
            d = json.load(f)
        if isinstance(d, dict):
            graded |= set(d.keys())
    assert graded, "no CORRECTNESS_r*.json records found"
    from data_misc_tools_spark.catalog import GRADED_FIRST

    window = set(GRADED_FIRST[:50])
    never = sorted(n for n in QUERIES if n not in graded and n not in window)
    assert not never, (
        "catalog entries with no official driver row that are NOT in "
        f"the current graded window: {never}"
    )


def test_fixture_docs_fit_series_bound(sf_dir):
    """Several oracles enumerate per-doc token/char positions through a
    bounded `JOIN generate_series(1, 2048)` (DuckDB 1.0 has no
    correlated lateral series). That bound silently drops positions
    past 2048, so pin the fixture contract: no document may exceed
    2048 whitespace tokens or 2053 chars (char-position oracles bound
    length(text) - 4)."""
    con = duckdb.connect()
    n_long = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE len(list_filter(string_split(lower(text), ' '), x -> x != '')) > 2048
           OR length(text) > 2052
        """
    ).fetchone()[0]
    assert n_long == 0


def test_fixture_customers_fit_fisher_series_bound(sf_dir):
    """fisher_exact_customers' oracle enumerates log-factorials and
    support points through a bounded `generate_series(0, 32768)`; a
    customer table larger than that would silently drop support rows
    on the DuckDB side (ADVICE r9). fisher_exact_2x2's max_n default
    now matches the oracle bound — pin the fixture contract too."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/customer.parquet')"
    ).fetchone()[0]
    assert n <= 32768

    from data_misc_tools_spark.operators import profile as profile_mod
    import inspect

    sig = inspect.signature(profile_mod.fisher_exact_2x2)
    assert sig.parameters["max_n"].default == 32768


def test_fixture_hourly_span_fits_series_bound(sf_dir):
    """hourly_anomaly_zscore_filled's oracle builds the zero-filled
    bucket axis with a bounded `JOIN generate_series(0, 8192)` per
    entity, while the Spark operator fills the full min..max span —
    an entity spanning more hourly buckets would silently diverge
    (ADVICE r4). Pin the fixture contract like the 2048-token one."""
    con = duckdb.connect()
    worst = con.execute(
        f"""
        SELECT coalesce(max(mx - mn), 0) FROM (
            SELECT event_type,
                   min(epoch(date_trunc('hour', ts))::BIGINT // 3600) AS mn,
                   max(epoch(date_trunc('hour', ts))::BIGINT // 3600) AS mx
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY event_type
        )
        """
    ).fetchone()[0]
    assert worst <= 8192


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["n_name", "top_customer", "top_acctbal"]


def test_rows_only_outputs_survive_driver_canonicalization(spark, sf_dir):
    """The driver's rows-only check lexsorts the collected frame in
    pandas (sort_values over every column) — a cell holding a list or
    any other unhashable type throws `unhashable type` there and burns
    the query's official row, which is exactly how pca_project_demo's
    array<double> column died in CORRECTNESS_r05. Replicate that
    canonicalization for EVERY rows-only entry so the failure mode is
    caught at commit time, not at grading time."""
    from data_misc_tools_spark.catalog import ROWS_ONLY

    for name in sorted(ROWS_ONLY):
        pdf = QUERIES[name](spark, sf_dir).limit(50).toPandas()
        pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_matches_oracle_columns(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.limit(5).count() >= 0  # rows-only contract
        return
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    assert sorted(df.columns) == sorted(ocols), name
    # cheap execution check (full value comparison: tools/check.py)
    assert df.limit(5).count() >= 0

"""SQL script splitter + execution (Beeline-emulation path)."""

from data_misc_tools_spark.plans.sql_script import (
    run_sql_script,
    split_sql_statements,
)


def test_basic_split():
    assert split_sql_statements("select 1; select 2;") == ["select 1", "select 2"]


def test_comments_and_beeline_commands():
    script = """
    -- a leading comment
    !connect jdbc:hive2://nope
    # hash comment
    select 1;  -- trailing comment
    /* block
       comment */ select 2;
    """
    assert split_sql_statements(script) == ["select 1", "select 2"]


def test_semicolon_inside_strings_not_split():
    script = "select 'a;b' as x; select \"c;d\" as y;"
    assert split_sql_statements(script) == ["select 'a;b' as x", 'select "c;d" as y']


def test_quote_escapes():
    script = "select 'it''s; fine' as x;"
    assert split_sql_statements(script) == ["select 'it''s; fine' as x"]


def test_multiline_statement_joined():
    script = "select *\nfrom t\nwhere x = 1;"
    assert split_sql_statements(script) == ["select *\nfrom t\nwhere x = 1"]


def test_no_trailing_semicolon():
    assert split_sql_statements("select 1") == ["select 1"]


def test_run_sql_script_executes_in_order(spark):
    results = run_sql_script(
        spark,
        """
        create or replace temporary view _t as select 41 as x;
        select x + 1 as y from _t;
        """,
    )
    assert len(results) == 2
    assert results[-1][1].first().y == 42


def test_run_sql_script_uses_engine_functions(spark):
    results = run_sql_script(spark, "select su_strip('[7]', '[]') as v;")
    assert results[0][1].first().v == "7"


class TestVariableSubstitution:
    def test_hivevar_var_and_bare_forms(self):
        from data_misc_tools_spark.plans.sql_script import substitute_vars

        s = ("SELECT * FROM ${hivevar:tbl} WHERE d >= '${var:start}' "
             "AND d < '${end}' AND tag = '${missing}'")
        out = substitute_vars(s, {"tbl": "events", "start": "2024-01-01",
                                  "end": "2024-02-01"})
        assert out == ("SELECT * FROM events WHERE d >= '2024-01-01' "
                       "AND d < '2024-02-01' AND tag = '${missing}'")

    def test_run_script_with_variables(self, spark):
        from data_misc_tools_spark.plans.sql_script import run_sql_script

        res = run_sql_script(
            spark,
            "SELECT ${a} + ${hivevar:b} AS s;",
            variables={"a": "2", "b": "3"},
        )
        assert res[-1][1].first().s == 5

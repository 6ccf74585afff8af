"""SQL script splitting + execution.

Reference surface: the embedded Beeline runs ``;``-separated
statements from a script file, skipping ``#``/``--`` comment lines and
``!``-prefixed beeline commands, joining continuation lines
(reference: hive/HiveBeeLine.scala:56-92 ``processSqlLines``,
runSqlFile:94-122).

Divergence (documented): the reference's splitter is line-based and
naive about quotes; ours is a character scanner that respects single/
double-quoted strings (with '' and backslash escapes) and inline
comments, so a ``;`` inside a string literal does not split. This is
strictly safer; scripts that relied on the naive behavior (none in
the reference corpus) would differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def split_sql_statements(script: str) -> list[str]:
    """Split a SQL script into executable statements.

    Rules: ``;`` terminates a statement unless inside a quoted string;
    ``--`` and ``#`` start a line comment (outside strings) running to
    end of line; ``/* */`` block comments are skipped; lines whose
    first non-space char is ``!`` are beeline client commands and are
    dropped; empty/whitespace-only statements are dropped.
    """
    # Drop beeline '!' command lines first (line-scoped syntax).
    lines = [
        ln for ln in script.split("\n") if not ln.lstrip().startswith("!")
    ]
    text = "\n".join(lines)

    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    quote: str | None = None
    while i < n:
        ch = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if quote:
            buf.append(ch)
            if ch == "\\" and nxt:  # backslash escape inside string
                buf.append(nxt)
                i += 2
                continue
            if ch == quote:
                if nxt == quote:  # doubled-quote escape ('' or "")
                    buf.append(nxt)
                    i += 2
                    continue
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
            i += 1
            continue
        if ch == "-" and nxt == "-":
            while i < n and text[i] != "\n":
                i += 1
            continue
        if ch == "#":
            while i < n and text[i] != "\n":
                i += 1
            continue
        if ch == "/" and nxt == "*":
            i += 2
            while i + 1 < n and not (text[i] == "*" and text[i + 1] == "/"):
                i += 1
            i += 2
            continue
        if ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                stmts.append(stmt)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts


def substitute_vars(script: str, variables: dict[str, str]) -> str:
    """Hive/Beeline-style variable substitution: ``${hivevar:name}``,
    ``${var:name}``, and bare ``${name}`` all resolve from
    ``variables`` (the reference runs scripts through Beeline, whose
    ``--hivevar k=v`` flags substitute this way; reference:
    hive/HiveBeeLine.scala:94-122 invocation surface). Unknown
    references are left VERBATIM — Hive's behavior — so a missing
    variable fails loudly at SQL parse, not silently as empty text.
    Substitution is textual and happens before statement splitting,
    exactly like Beeline (inside string literals too).
    """
    import re as _re

    def repl(m: "_re.Match[str]") -> str:
        name = m.group(2)
        return str(variables[name]) if name in variables else m.group(0)

    return _re.sub(r"\$\{(hivevar:|var:)?([A-Za-z_][A-Za-z0-9_.]*)\}", repl, script)


def run_sql_script(
    spark: SparkSession, script: str, variables: dict[str, str] | None = None
) -> list[tuple[str, DataFrame]]:
    """Execute each statement via ``spark.sql``; returns
    (statement, result DataFrame) pairs in execution order. Catalyst
    replaces the Hive compiler; registered engine functions replace
    the reference's aux-jar UDFs. ``variables`` applies Beeline
    ``--hivevar``-style substitution first (:func:`substitute_vars`).

    Caveat: DDL/DML statements execute eagerly (spark.sql side
    effects), but SELECT results are lazy DataFrames — consume them
    before a later statement drops what they read (Beeline prints
    eagerly; ScriptTask materializes the final statement for you).
    """
    if variables:
        script = substitute_vars(script, variables)
    return [(stmt, spark.sql(stmt)) for stmt in split_sql_statements(script)]


def run_sql_file(
    spark: SparkSession, path: str, variables: dict[str, str] | None = None
) -> list[tuple[str, DataFrame]]:
    """Read a script file and execute it (reference: runSqlFile reads
    from HDFS; any fsspec/posix path works here — executors are not
    involved in reading the script)."""
    with open(path, encoding="utf-8") as f:
        return run_sql_script(spark, f.read(), variables=variables)

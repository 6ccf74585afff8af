"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at the given sf dir, comparing row count,
column names, and an order-insensitive value hash (columns sorted by
name, rows sorted, values stringified with float rounding).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def norm_cell(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # EXACT rendering (shortest repr). The driver hashes exact
        # values, so the local gate must not absorb any difference —
        # round-1 shipped 5 red queries because .6g collapsed
        # Decimal('0.0494000') and 0.0494 into the same string.
        return repr(v + 0.0)  # +0.0 canonicalizes -0.0
    if isinstance(v, decimal.Decimal):
        # do NOT coerce to float: a decimal-typed column must fail
        # against a double-typed oracle column (driver-strict)
        return "dec:" + str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _family(typename: str) -> str:
    """Collapse an engine type name into a comparison family. HUGEINT
    gets its own family on purpose: the driver's pandas fetch renders
    INT128 as float ('5.0' vs '5'), so HUGEINT vs BIGINT must FAIL
    locally even though fetchall() yields equal Python ints."""
    t = typename.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t in ("hugeint", "int128", "uhugeint"):
        return "hugeint"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long",
             "utinyint", "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("float", "double", "real", "float4", "float8"):
        return "float"
    if t in ("varchar", "string", "text"):
        return "str"
    if t.startswith("timestamp"):
        return "timestamp"
    return t


def dtype_problems(scols, sdtypes, ocols, odtypes) -> list[str]:
    smap = {c: _family(t) for c, t in zip(scols, sdtypes)}
    out = []
    for c, t in zip(ocols, odtypes):
        fo, fs = _family(t), smap.get(c)
        if fs is not None and fs != fo:
            out.append(f"dtype[{c}] spark={fs} duck={fo}")
    return out


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--bare"]
    bare = "--bare" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb

    import __spark_entry__ as entrymod

    if bare:
        # exact driver conditions: a plain session, relying on
        # __spark_entry__._prepare for all parity configs
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from data_misc_tools_spark.session import build_session

        spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name used to match NOTHING and print "all green"
        # over zero checked queries — fail loudly instead
        print(f"UNKNOWN query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            # relation API (not DB-API execute): .types yields real
            # DuckDB types (HUGEINT/DECIMAL/...) where .description
            # collapses every numeric to 'NUMBER'
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            odtypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            problems.extend(dtype_problems(scols, sdtypes, ocols, odtypes))
            sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash spark={sh} duck={oh}")
                # show first differing rows for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                a = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
                b = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
                for x, y in zip(a, b):
                    if x != y:
                        problems.append(f"  first diff:\n    spark: {x}\n    duck:  {y}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:3]))
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} failing: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

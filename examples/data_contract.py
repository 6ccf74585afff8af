"""Runnable data-contract walkthrough.
`python examples/data_contract.py [sf_dir]`.

The round-7 session-2 suite composed the way a platform team gates a
dataset-version promotion — discover the key, assert the contract,
diff the schema, test for drift, explain any metric movement, and
ship canonical entities with honest uncertainty:

  UCC key discovery  ->  Deequ-style expectations gate
    ->  schema/content diff vs the new version  ->  PSI value drift
    ->  mix-vs-rate decomposition of the moved metric
    ->  golden-record canonicalization + conformal error bars

Every stage is an oracle-checked catalog operator; this script only
composes them and prints a PROMOTE / HOLD decision the way a CI gate
would.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.etl import metric_decomposition
    from data_misc_tools_spark.operators.linkage import golden_record
    from data_misc_tools_spark.operators.profile import (
        conformal_report,
        expectations_report,
        psi_report,
        schema_drift_report,
        unique_column_combinations,
    )
    from data_misc_tools_spark.session import build_session, load_tables

    spark = build_session(
        app_name="data_contract",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "events"])
    holds = []

    # 1. what is the actual key of lineitem? (never trust the docs)
    print("== unique-column-combination discovery (lineitem) ==")
    ucc = unique_column_combinations(
        t["lineitem"],
        [("l_orderkey", "l_linenumber"),
         ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")],
    ).collect()
    for r in sorted(ucc, key=lambda r: r["cols"]):
        print(f"  {r['cols']}: groups={r['n_groups']}/{r['n_rows']} "
              f"dup_rows={r['n_extra_rows']} unique={r['is_unique']}")

    # 2. the publication contract on orders
    print("== expectations gate (orders) ==")
    rep = expectations_report(
        t["orders"],
        [
            {"check": "not_null", "column": "o_custkey"},
            {"check": "distinct", "column": "o_orderkey"},
            {"check": "in_set", "column": "o_orderstatus",
             "values": ["O", "F", "P"]},
            {"check": "matches", "column": "o_orderpriority",
             "pattern": "^[1-5]-"},
            {"check": "min_ge", "column": "o_totalprice", "value": 0},
        ],
    ).collect()
    for r in rep:
        print(f"  {r['check']}({r['column']}): rate={r['rate_e6'] / 1e4:.2f}% "
              f"passed={r['passed']}")
    if not all(r["passed"] for r in rep):
        holds.append("expectations")

    # 3. schema/content diff vs a simulated new version
    print("== schema drift (orders v2: renamed + partially nulled) ==")
    new_v = t["orders"].filter(F.col("o_orderkey") % 2 == 0).select(
        "o_custkey",
        F.expr("nullif(o_orderstatus, 'P')").alias("o_orderstatus"),
        "o_totalprice",
        F.substring("o_orderpriority", 1, 1).alias("o_priority_code"),
    )
    old_v = t["orders"].select(
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    for r in schema_drift_report(old_v, new_v).collect():
        print(f"  {r['col_name']}: {r['status']}"
              + (f" null_drift={r['null_drift_e6']}e-6"
                 if r["null_drift_e6"] is not None else ""))
        if r["status"] in ("removed", "type_changed"):
            holds.append(f"schema:{r['col_name']}")

    # 4. value drift between window halves (PSI)
    print("== PSI drift (event value, first half vs second half) ==")
    b = t["events"].select(
        F.col("ts").cast("long").alias("tt"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    mid = b.agg(F.expr("(min(tt) + max(tt)) div 2").alias("m")).collect()[0]["m"]
    psi_rows = psi_report(
        b.filter(F.col("tt") < mid), b.filter(F.col("tt") >= mid), "x"
    ).collect()
    psi = sum(r["term_e6"] for r in psi_rows) / 1e6
    print(f"  PSI = {psi:.4f} "
          f"({'stable' if psi < 0.1 else 'shifting' if psi < 0.25 else 'DRIFTED'})")
    if psi >= 0.25:
        holds.append("psi")

    # 5. if the mean value moved, WHY? mix vs rate by event type
    print("== mix-vs-rate decomposition of mean value ==")
    base = t["events"].select(
        F.col("ts").cast("long").alias("tt"),
        F.col("event_type").alias("seg"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.lit(1).cast("long").alias("one"),
    )
    dec = metric_decomposition(
        base.filter(F.col("tt") < mid),
        base.filter(F.col("tt") >= mid),
        "seg", "one", "x",
    ).collect()
    for r in dec:
        print(f"  {r['segment']}: mix={r['mix_contrib']:+.2f}c "
              f"rate={r['rate_contrib']:+.2f}c")
    print(f"  total delta = {sum(r['mix_contrib'] + r['rate_contrib'] for r in dec):+.2f} cents")

    # 6. canonical entities + honest uncertainty for the serving layer
    print("== golden records (top-3 customers by order count) ==")
    top = [
        r["o_custkey"]
        for r in t["orders"].groupBy("o_custkey").count()
        .orderBy(F.desc("count"), "o_custkey").limit(3).collect()
    ]
    gr = golden_record(
        t["orders"].filter(F.col("o_custkey").isin(top)),
        "o_custkey", ["o_orderstatus", "o_orderpriority"],
    ).collect()
    for r in sorted(gr, key=lambda r: (r["cluster"], r["attr"])):
        print(f"  cust {r['cluster']} {r['attr']} -> {r['value']} "
              f"({r['votes']}/{r['n_obs']} votes)")

    print("== conformal intervals (value by event type, 90%) ==")
    for r in conformal_report(
        t["events"], "event_type", "value", "event_id"
    ).orderBy("group").collect():
        if r["qhat"] is None:
            print(f"  {r['group']}: not enough calibration data")
            continue
        print(f"  {r['group']}: {r['pred_cents'] / 100:.2f} ± {r['qhat'] / 100:.2f} "
              f"(test coverage {r['covered_e6'] / 1e4:.1f}%)")

    print()
    if holds:
        print(f"DECISION: HOLD promotion — {', '.join(holds)}")
    else:
        print("DECISION: PROMOTE")
    # the simulated v2 intentionally trips the schema gate
    assert any(h.startswith("schema:") for h in holds)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

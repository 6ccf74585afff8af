"""Runnable lake-profiling walkthrough.
`python examples/lake_profiling.py [sf_dir]`.

The profiling/statistics suite composed the way a data team meets an
UNDOCUMENTED lake — first discover its structure, then audit its
quality, then read its behavior:

  inclusion-dependency mining (FK discovery)  ->  FD / key validation
    ->  column profiles + drift-ready fingerprint
    ->  corpus readability + English-slice keyness
    ->  repeat-purchase survival (Kaplan-Meier) + log-rank gate

Every stage prints a compact report. Stages are the same
oracle-checked operators the catalog grades; this script only
composes them.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from data_misc_tools_spark.operators.profile import (
        fd_violation_report,
        inclusion_deps,
        kaplan_meier,
        logrank_test,
        profile_table,
    )
    from data_misc_tools_spark.operators.text import keyness_llr, readability_scores
    from data_misc_tools_spark.session import build_session, load_tables

    spark = build_session(
        app_name="lake_profiling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(
        spark, sf_dir,
        ["region", "nation", "customer", "supplier", "orders", "documents", "events"],
    )

    # 1. schema discovery: which columns contain which others?
    print("== discovered inclusion dependencies (candidate FKs) ==")
    cands = [
        ("region.r_regionkey", t["region"], "r_regionkey"),
        ("nation.n_regionkey", t["nation"], "n_regionkey"),
        ("nation.n_nationkey", t["nation"], "n_nationkey"),
        ("customer.c_nationkey", t["customer"], "c_nationkey"),
        ("supplier.s_nationkey", t["supplier"], "s_nationkey"),
        ("customer.c_custkey", t["customer"], "c_custkey"),
        ("orders.o_custkey", t["orders"], "o_custkey"),
    ]
    for r in inclusion_deps(cands).where("contained").collect():
        print(f"  {r.from_col} (n={r.n_from})  ⊆  {r.to_col}")

    # 2. key validation on the discovered dimension
    print("== functional dependencies (key checks) ==")
    for r in fd_violation_report(
        t["orders"], [("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus")]
    ).collect():
        verdict = "HOLDS" if r.n_violating_groups == 0 else (
            f"violated in {r.n_violating_groups} groups"
        )
        print(f"  {r.lhs} -> {r.rhs}: {verdict}")

    # 3. column profile of the fact table (one scan)
    print("== orders profile ==")
    for r in profile_table(t["orders"], ["o_totalprice", "o_orderstatus"]).collect():
        print(
            f"  {r.col_name}: nulls={r.n_nulls}, distinct={r.n_distinct},"
            f" min={r.min_val}, max={r.max_val}"
        )

    # 4. corpus readability + what makes the English slice different
    print("== corpus readability ==")
    rb = readability_scores(t["documents"]).agg(
        F.count("*").alias("n"),
        F.round(F.avg("flesch"), 1).alias("avg_flesch"),
        F.round(F.avg("fk_grade"), 1).alias("avg_grade"),
    ).collect()[0]
    print(f"  {rb.n} docs, mean Flesch {rb.avg_flesch}, mean FK grade {rb.avg_grade}")
    print("== top English-keyness terms (Dunning LLR) ==")
    for r in keyness_llr(
        t["documents"], F.col("lang") == "en", min_count=5, k=5
    ).collect():
        print(
            f"  #{r.rank} {r.term!r}: llr={r.llr:.2f}"
            f" ({r.enriched}-enriched, {r.c_focus} vs {r.c_rest})"
        )

    # 5. behavior: repeat-purchase survival, heavy vs light users
    ev = t["events"]
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = p.withColumn("nxt", F.lead("ts").over(w))
    end = ev.agg(F.max("ts").alias("dend"))
    counts = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    tots = ev.agg(F.count("*").cast("long").alias("total"))
    nus = counts.agg(F.count("*").cast("long").alias("n_users"))
    grp = (
        counts.crossJoin(F.broadcast(tots)).crossJoin(F.broadcast(nus))
        .select("user_id", (F.col("c") * F.col("n_users") > F.col("total"))
                .cast("long").alias("g"))
    )
    spells = (
        nxt.crossJoin(F.broadcast(end)).join(grp, "user_id")
        .select(
            F.expr(
                "(coalesce(cast(nxt as long), cast(dend as long))"
                " - cast(ts as long)) div 3600"
            ).cast("long").alias("duration"),
            F.col("nxt").isNotNull().cast("long").alias("event"),
            "g",
        )
    )
    km = kaplan_meier(spells.select("duration", "event")).orderBy("duration").collect()
    half = next(
        (r for r in km if r.log_surv_e6 is not None
         and math.exp(r.log_surv_e6 / 1e6) <= 0.5),
        None,
    )
    print("== repeat-purchase survival ==")
    print(f"  {len(km)} distinct gap durations,"
          f" {sum(r.n_event for r in km)} repeats,"
          f" {sum(r.n_censored for r in km)} censored")
    if half is not None:
        print(f"  median time-to-next-purchase ~ {half.duration}h")
    lr = logrank_test(spells, "duration", "event", "g").collect()[0]
    print(
        f"  log-rank heavy-vs-light: O1={lr.o1}, E1={lr.e1:.1f},"
        f" z={lr.z:.2f}"
        + ("  (heavy users repurchase FASTER)" if lr.z and lr.z > 1.96 else "")
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

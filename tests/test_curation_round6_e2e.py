"""Round-6 session-2 operators composed end-to-end, the way a data
team meets an undocumented lake, on the sf0.001 tables:

  1. discover the join keys from data alone       (profile.inclusion_deps)
  2. use a DISCOVERED FK to join fact->dim        (orders -> customer)
  3. readability-profile the document corpus      (text.readability_scores)
  4. keyness of the English slice vs the rest     (text.keyness_llr)
  5. survival of the repeat-purchase behavior     (profile.kaplan_meier)

Every stage is oracle-tested alone; this pins the COMPOSITION: the
discovered inclusion dependencies are the true TPC-H FKs (and only
containments that actually hold), the discovered key joins losslessly,
the keyness verdicts agree with readability's corpus facts, and the
KM curve's accounting reconciles exactly against the spell frame.
"""

import math

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window as W

from data_misc_tools_spark.operators.profile import inclusion_deps, kaplan_meier
from data_misc_tools_spark.operators.text import keyness_llr, readability_scores
from data_misc_tools_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(
        spark, SF_DIR,
        ["region", "nation", "customer", "supplier", "orders", "documents", "events"],
    )


def test_fk_discovery_finds_the_real_schema(spark, tables):
    cands = [
        ("region.r_regionkey", tables["region"], "r_regionkey"),
        ("nation.n_regionkey", tables["nation"], "n_regionkey"),
        ("nation.n_nationkey", tables["nation"], "n_nationkey"),
        ("customer.c_nationkey", tables["customer"], "c_nationkey"),
        ("supplier.s_nationkey", tables["supplier"], "s_nationkey"),
        ("customer.c_custkey", tables["customer"], "c_custkey"),
        ("orders.o_custkey", tables["orders"], "o_custkey"),
    ]
    got = {
        (r.from_col, r.to_col): r.contained
        for r in inclusion_deps(cands).collect()
    }
    # every true TPC-H FK is discovered from the data alone
    for fk, pk in [
        ("nation.n_regionkey", "region.r_regionkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey"),
        ("orders.o_custkey", "customer.c_custkey"),
    ]:
        assert got[(fk, pk)], f"missed FK {fk} -> {pk}"
    # this generator gives every customer >=1 order, so the REVERSE
    # containment also genuinely holds (unlike classic TPC-H's 1/3
    # orderless customers) — the miner must report the data, not the
    # textbook schema
    assert got[("customer.c_custkey", "orders.o_custkey")]
    # cross-domain containments must not be invented
    assert not got[("customer.c_custkey", "nation.n_nationkey")]
    assert not got[("orders.o_custkey", "nation.n_regionkey")]

    # 2. the discovered key joins losslessly: every order finds
    # exactly one customer
    orders = tables["orders"]
    n = orders.count()
    joined = orders.join(
        tables["customer"], F.col("o_custkey") == F.col("c_custkey"), "left"
    )
    assert joined.count() == n
    assert joined.where(F.col("c_custkey").isNull()).count() == 0


def test_readability_and_keyness_agree_on_corpus_facts(spark, tables):
    docs = tables["documents"]
    scores = readability_scores(docs)
    facts = scores.agg(
        F.count("*").alias("n"),
        F.sum("n_words").alias("w"),
        F.sum(F.when(F.col("n_sentences") == 0, 1).otherwise(0)).alias("unpunct"),
    ).collect()[0]
    assert facts.n == docs.count()
    # this corpus is punctuation-free: every doc clamps to 1 sentence
    assert facts.unpunct == facts.n

    key = keyness_llr(docs, F.col("lang") == "en", min_count=5, k=1000)
    rows = key.collect()
    # keyness totals reconcile with readability's word census:
    # whitespace tokens == regexp \S+ runs, so focus+rest term mass
    # (before the min_count cut) is bounded by the corpus word count
    assert sum(r.c_focus + r.c_rest for r in rows) <= facts.w
    # G2 is nonnegative and ranks are dense from 1
    assert all(r.llr >= 0 for r in rows)
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    # the focus/rest split reconciles with the actual language mix
    n_en = docs.where(F.col("lang") == "en").count()
    assert 0 < n_en < facts.n


def test_km_accounting_reconciles_with_the_spell_frame(spark, tables):
    ev = tables["events"]
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = p.withColumn("nxt", F.lead("ts").over(w))
    end = ev.agg(F.max("ts").alias("dend"))
    spells = (
        nxt.crossJoin(F.broadcast(end))
        .select(
            F.when(
                F.col("nxt").isNotNull(),
                F.col("nxt").cast("long") - F.col("ts").cast("long"),
            )
            .otherwise(F.col("dend").cast("long") - F.col("ts").cast("long"))
            .alias("gap_s"),
            F.col("nxt").isNotNull().cast("long").alias("event"),
        )
        .select(F.expr("gap_s div 3600").cast("long").alias("duration"), "event")
    )
    km = kaplan_meier(spells).orderBy("duration").collect()

    n_spells = spells.count()
    n_users = p.select("user_id").distinct().count()
    # exact accounting: one censored spell per purchasing user (their
    # last purchase), events + censored == spells, max at-risk == all
    assert sum(r.n_event for r in km) == n_spells - n_users
    assert sum(r.n_censored for r in km) == n_users
    assert km[0].n_risk == n_spells
    # at-risk counts strictly decrease along the curve; survival
    # (where defined) is monotone nonincreasing and starts below 1
    risks = [r.n_risk for r in km]
    assert risks == sorted(risks, reverse=True)
    surv = [
        math.exp(r.log_surv_e6 / 1e6) for r in km if r.log_surv_e6 is not None
    ]
    assert surv and all(a >= b for a, b in zip(surv, surv[1:]))
    assert surv[0] <= 1.0

"""Round-7 session-2 operators composed end-to-end on the sf0.001
tables — the data-contract + measurement pipeline a platform team runs
before promoting a dataset version:

  1. discover the REAL key before declaring a dedup key
                                     (profile.unique_column_combinations)
  2. assert the publication contract  (profile.expectations_report)
  3. check the new slice didn't drift (profile.psi_report)
  4. sketch distinct users cheaply and verify against exact
                                     (profile.kmv_distinct)
  5. attribute conversions causally-ish: exact Shapley credit,
     DiD on the heavy-user split     (temporal.shapley_attribution,
                                      profile.did_report)
  6. ship uncertainty honestly       (profile.conformal_report)
  7. survival cross-check: exp(-H_NA) tracks the KM curve on the SAME
     spells                          (profile.nelson_aalen/kaplan_meier)
  8. canonicalize the entity table   (linkage.golden_record)

Every stage is oracle-tested alone; this pins the COMPOSITION — the
UCC report's violation counts reconcile with direct distinct counts,
the contract passes on clean data and fails pointedly on a poisoned
row, PSI reads stable on an exchangeable split and drifted on the
time split, the Shapley allocation satisfies efficiency, and the
sketch / exact / survival numbers all tell one story.
"""

import math

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.catalog import QUERIES
from data_misc_tools_spark.operators.profile import (
    expectations_report,
    kmv_distinct,
    psi_report,
    unique_column_combinations,
)
from data_misc_tools_spark.session import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF, ["lineitem", "orders", "events"])


def test_ucc_reconciles_with_direct_counts(spark, tables):
    li = tables["lineitem"]
    rep = {
        r["cols"]: r
        for r in unique_column_combinations(
            li, [("l_orderkey", "l_linenumber"),
                 ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")]
        ).collect()
    }
    n = li.count()
    two = li.select("l_orderkey", "l_linenumber").distinct().count()
    four = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    ).distinct().count()
    r2 = rep["l_orderkey+l_linenumber"]
    r4 = rep["l_orderkey+l_linenumber+l_partkey+l_suppkey"]
    assert r2["n_groups"] == two and r2["n_extra_rows"] == n - two
    assert r4["n_groups"] == four
    assert r2["is_unique"] == (two == n)
    assert r4["is_unique"] == (four == n)
    # THIS generator's trap: the classic TPC-H 2-column key is FAR
    # from unique (thousands of duplicate groups at every SF), while
    # the 4-column combo is unique or within a hair of it (exactly
    # unique at the sf0.01 gate scale; one residual dup at sf0.001)
    assert not r2["is_unique"]
    assert r4["n_extra_rows"] * 100 < r2["n_extra_rows"]


def test_contract_passes_clean_fails_poisoned(spark, tables):
    o = tables["orders"]
    checks = [
        {"check": "not_null", "column": "o_custkey"},
        {"check": "distinct", "column": "o_orderkey"},
        {"check": "in_set", "column": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"check": "min_ge", "column": "o_totalprice", "value": 0},
    ]
    clean = expectations_report(o, checks).collect()
    assert all(r["passed"] for r in clean)
    poisoned = o.unionByName(
        spark.createDataFrame(
            [(999999999, None, "X", -5.0, None, "1-URGENT")], o.schema
        )
    )
    bad = {r["check"]: r for r in expectations_report(poisoned, checks).collect()}
    # the poisoned row flips exactly the three row-level checks it
    # violates; the key stays unique (new orderkey)
    assert not bad["not_null"]["passed"]
    assert not bad["in_set"]["passed"]
    assert not bad["min_ge"]["passed"]
    assert bad["distinct"]["passed"]


def test_psi_stable_on_exchangeable_split_drifted_on_none(spark, tables):
    e = tables["events"]
    b = e.select(
        F.col("event_id"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    even = b.filter(F.col("event_id") % 2 == 0).select("x")
    odd = b.filter(F.col("event_id") % 2 == 1).select("x")
    psi_stable = sum(
        r["term_e6"] for r in psi_report(even, odd, "x").collect()
    )
    # exchangeable halves of one distribution: well under the 0.1
    # rule-of-thumb threshold (1e5 in e6 units)
    assert psi_stable < 30_000
    # a deliberately shifted copy reads as drifted
    shifted = odd.select((F.col("x") * 2).alias("x"))
    psi_drift = sum(
        r["term_e6"] for r in psi_report(even, shifted, "x").collect()
    )
    assert psi_drift > 100_000 > psi_stable


def test_kmv_sketch_vs_exact(spark, tables):
    e = tables["events"]
    exact = e.select("user_id").distinct().count()
    r = kmv_distinct(
        e.select(F.lit("all").alias("g"), "user_id"), "user_id", ["g"], k=64
    ).collect()[0]
    if r["is_exact"]:
        assert r["estimate"] == exact
    else:
        assert abs(r["estimate"] - exact) / exact < 0.4  # ~3 sigma, k=64


def test_shapley_efficiency_and_monotone_credit(spark):
    rows = QUERIES["shapley_attribution_events"](spark, SF).collect()
    v_full = rows[0]["v_full"]
    v_empty = rows[0]["v_empty"]
    assert sum(r["phi_scaled"] for r in rows) == math.factorial(4) * (
        v_full - v_empty
    )
    assert all(r["phi_scaled"] >= 0 for r in rows)  # monotone game


def test_did_cells_populated_and_finite(spark):
    r = QUERIES["did_purchase_heavy"](spark, SF).collect()[0]
    assert min(r["n_c_pre"], r["n_c_post"], r["n_t_pre"], r["n_t_post"]) > 0
    assert r["did"] is not None and abs(r["did"]) < 1e6


def test_conformal_coverage_lands_near_alpha(spark):
    rows = QUERIES["conformal_interval_value"](spark, SF).collect()
    covered = [r["covered_e6"] for r in rows if r["covered_e6"] is not None]
    assert covered, "no group had enough calibration data"
    for c in covered:
        assert 780_000 < c <= 1_000_000  # 90% nominal, small-n slack


def test_survival_cross_check_exp_neg_hazard_tracks_km(spark):
    km = {
        r["duration"]: r["log_surv_e6"]
        for r in QUERIES["purchase_gap_survival_km"](spark, SF).collect()
    }
    na = {
        r["duration"]: r["cumhaz_e6"]
        for r in QUERIES["purchase_gap_hazard_na"](spark, SF).collect()
    }
    assert set(km) == set(na)  # same spell frame -> same event times
    checked = 0
    for d, h in na.items():
        if km[d] is None:
            continue
        s_km = math.exp(km[d] / 1e6)
        s_na = math.exp(-h / 1e6)
        assert s_na >= s_km - 1e-9  # the classic inequality
        assert abs(s_na - s_km) < 0.05
        checked += 1
    assert checked > 10


def test_golden_record_reconciles_with_direct_mode(spark, tables):
    from data_misc_tools_spark.operators.linkage import golden_record

    o = tables["orders"]
    rep = golden_record(o, "o_custkey", ["o_orderpriority"])
    # pick the customer with the most orders for a meaningful vote
    top = (
        o.groupBy("o_custkey").count().orderBy(F.desc("count"), "o_custkey")
        .first()["o_custkey"]
    )
    direct = (
        o.filter(F.col("o_custkey") == top)
        .groupBy("o_orderpriority").count()
        .orderBy(F.desc("count"), "o_orderpriority")
        .first()
    )
    got = rep.filter(F.col("cluster") == top).collect()[0]
    assert got["value"] == direct["o_orderpriority"]
    assert got["votes"] == direct["count"]


def test_auc_gate_catches_the_broken_detector(spark):
    """The eval trio catches a filter that LOOKS reasonable: this
    corpus shares one 31-word vocabulary across languages, so the
    naive en-stopword-ratio detector is ANTI-predictive — AUC lands
    below 0.5, the exact failure an operating-metric gate exists to
    catch before a threshold ships."""
    r = QUERIES["auc_stopword_en"](spark, SF).collect()[0]
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert r["auc"] < 0.5


def test_isotonic_fit_conserves_mass_and_is_monotone(spark):
    """PAVA invariants on the graded demo: the fitted rates are
    monotone and the weighted fitted mass equals the positive count
    exactly (pooling preserves totals)."""
    rows = QUERIES["isotonic_stopword_en"](spark, SF).collect()
    seq = [r["iso_rate"] for r in rows]
    assert seq == sorted(seq)
    mass = sum(r["n_rows"] * r["iso_rate"] for r in rows)
    pos = sum(r["n_pos"] for r in rows)
    assert abs(mass - pos) < 1e-6


def test_threshold_sweep_reconciles_with_scored_pairs(spark):
    """The sweep's counts are exactly the scored frame thresholded:
    recompute one cutoff directly and compare."""
    import pyspark.sql.functions as FF

    from data_misc_tools_spark.operators import dedup as D2
    from data_misc_tools_spark.session import load_tables

    rows = {r["threshold"]: r for r in
            QUERIES["dedup_threshold_sweep"](spark, SF).collect()}
    d = load_tables(spark, SF, ["documents"])["documents"]
    cand = D2.minhash_candidate_pairs(
        d, num_perm=8, bands=2, k=5, portable_hash=True
    )
    scored = D2.ngram_jaccard_pairs(cand, d, n=3).select(
        FF.round(FF.col("jaccard") * 10000).cast("long").alias("s")
    )
    for t in (3000, 9000):
        direct = scored.filter(FF.col("s") >= t).count()
        assert rows[t]["n_pairs"] == direct
    # monotone: pairs and touched docs shrink as the cutoff rises
    ts = sorted(rows)
    assert [rows[t]["n_pairs"] for t in ts] == sorted(
        [rows[t]["n_pairs"] for t in ts], reverse=True
    )


def test_jsd_bounded_and_vocab_shared(spark):
    """JSD across languages is bounded by ln2 and STRICTLY below it
    here (one shared template vocabulary — slices differ in mixture,
    not support), consistent with the OOV report where a full budget
    would cover every language."""
    from data_misc_tools_spark.operators.text import E6_LN2

    rows = QUERIES["jsd_lang_pairs"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2)
    for r in rows:
        assert 0 <= r["jsd_e6"] < E6_LN2


def test_trimmed_mean_sits_below_raw_on_the_heavy_tail(spark):
    """The documented exponential-ish value column: the 5%-trimmed
    mean falls below the raw mean for every event type (right tail),
    winsorized in between."""
    rows = QUERIES["trimmed_mean_value"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["trimmed_mean"] < r["mean_scaled"]
        assert r["trimmed_mean"] <= r["winsorized_mean"] <= r["mean_scaled"]

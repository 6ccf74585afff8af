"""Round-8 capstone wave 2: the experimentation/monitoring suite
composed on the sf0.001 events — the way an analytics team actually
chains these gates, with cross-operator reconciliation:

  1. the SPRT monitor STOPS EARLY (accepts H1 well before the last
     day) on the ~20% purchase stream vs H0=15%,
  2. Cochran-Armitage finds the mechanically-positive activity →
     ever-purchased trend, and its z agrees in sign with the raw
     top-vs-bottom bucket rates,
  3. Kruskal-Wallis is a correct NEGATIVE control: event values are
     exchangeable across types, so the omnibus must NOT fire — and
     must agree with pairwise Mann-Whitney staying small,
  4. IPW per-cell terms carry the SAME SIGN as each cell's within-cell
     mean difference (a provable identity of the estimator),
  5. the fairness report's totals reconcile with direct counts of the
     scored frame.

Every operator is oracle-checked alone; this pins the COMPOSITION.
"""

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.catalog import QUERIES
from data_misc_tools_spark.session import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_tables(spark, SF, ["events"])["events"]


def test_sprt_stops_early_and_stays_consistent(spark):
    rows = QUERIES["sprt_purchase_rate"](spark, SF).collect()
    assert len(rows) >= 10
    decisions = [r["decision"] for r in rows]
    # the ~20% corpus under H0=150 vs H1=200 permille accepts H1...
    assert "accept_h1" in decisions
    # ...and does so EARLY (the whole point of sequential testing)
    first = decisions.index("accept_h1")
    assert first < len(rows) - 1
    # llr is a cumulative statistic: the crossing day's llr exceeds
    # every pre-crossing day's
    llrs = [r["llr_e6"] for r in rows]
    assert llrs[first] >= max(llrs[:first] or [llrs[first]])


def test_trend_is_an_honest_null_and_user_level_form_is_degenerate(
    spark, events
):
    """The graded demo is a NULL-result audit (no weekly purchase
    trend planted: |z| small but DEFINED over 7 populated levels);
    and the capstone documents WHY the user-level 'ever purchased vs
    activity' form was rejected — every user has ~20 events, so the
    outcome saturates and the statistic degenerates."""
    r = QUERIES["trend_dow_purchase"](spark, SF).collect()[0]
    assert r["k_levels"] == 7
    assert r["z"] is not None
    assert abs(r["z"]) < 3.5  # no trend planted
    # the rejected user-level form really is degenerate here:
    u = events.groupBy("user_id").agg(
        F.count("*").alias("c"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias("s"),
    )
    stats = u.agg(
        F.min("c").alias("min_c"), F.avg("s").alias("rate")
    ).collect()[0]
    assert stats["min_c"] > 2          # nobody lands in a low bucket
    assert stats["rate"] > 0.95        # 'ever purchased' saturates


def test_kruskal_negative_control_agrees_with_pairwise_mw(spark, events):
    from data_misc_tools_spark.operators.profile import mannwhitney_u

    rows = QUERIES["kruskal_value_by_type"](spark, SF).collect()
    h = rows[0]["h_corr_e6"]
    assert h is not None and h >= 0
    # values are exchangeable across types by construction: the
    # omnibus must stay below the chi2(k-1=4) 5% critical value 9.488
    assert h < 9_488_000
    # and the headline pairwise contrast agrees (|z| small)
    mw = mannwhitney_u(
        events.filter(F.col("event_type").isin("purchase", "click")),
        F.col("event_type") == "purchase",
        "value",
    ).collect()[0]
    assert mw["z_stat"] is not None and abs(mw["z_stat"]) < 3.0


def test_ipw_cell_terms_match_within_cell_mean_signs(spark):
    rows = QUERIES["ipw_ate_purchase"](spark, SF).collect()
    assert rows
    seen_nonzero = False
    for r in rows:
        if r["ipw_term_e6"] is None:
            assert r["n_t"] == 0 or r["n_c"] == 0  # positivity violation
            continue
        # term = (n/N) * (mean_t - mean_c): the sign identity
        mean_t = r["sum_t_cents"] / r["n_t"]
        mean_c = r["sum_c_cents"] / r["n_c"]
        diff = mean_t - mean_c
        if r["ipw_term_e6"] > 0:
            assert diff > 0, r
            seen_nonzero = True
        elif r["ipw_term_e6"] < 0:
            assert diff < 0, r
            seen_nonzero = True
    assert seen_nonzero


def test_fairness_totals_reconcile_with_direct_counts(spark):
    from data_misc_tools_spark.operators.text import STOPWORDS, tokens

    rows = QUERIES["fairness_stopword_length"](spark, SF).collect()
    assert {r["group"] for r in rows} == {"short", "mid", "long"}
    d = load_tables(spark, SF, ["documents"])["documents"]
    low = tokens(F.lower(F.col("text")))
    hits = F.size(F.filter(low, lambda x: x.isin(*STOPWORDS["en"]))).cast("long")
    n = F.size(tokens("text")).cast("long")
    direct = (
        d.select(
            (F.col("lang") == "en").alias("y"),
            F.when(F.col("n_chars") < 200, "short")
            .when(F.col("n_chars") < 350, "mid")
            .otherwise("long")
            .alias("grp"),
            hits.alias("h"),
            n.alias("n"),
        )
        .filter(F.col("n") > 0)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("y").cast("long")).alias("n_pos"),
        )
        .collect()
    )
    want = {r["grp"]: (r["n"], r["n_pos"]) for r in direct}
    for r in rows:
        assert (r["n"], r["n_pos"]) == want[r["group"]]
        # rate sanity: every e6 rate in [0, 1e6]
        for c in ("sel_rate_e6", "base_rate_e6"):
            assert 0 <= r[c] <= 1_000_000

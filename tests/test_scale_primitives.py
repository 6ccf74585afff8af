"""Scale primitives: salting, bucketed co-located joins, compaction."""

import os

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.operators.util import salted_aggregate, spread
from data_misc_tools_spark.sources.tables import compact_parquet, write_bucketed


def test_salted_aggregate_matches_direct(spark):
    # heavy skew: 90% of rows on one key
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise("cold").alias("k"),
        F.col("id").alias("v"),
    )
    direct = {
        (r.k): (r.n, r.total, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total, r.lo, r.hi)
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "n": ("v", "count"),
                "total": ("v", "sum"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            salt=8,
        ).collect()
    }
    assert salted == direct


def test_salted_aggregate_spreads_partials(spark):
    df = spark.range(1000).select(F.lit("only").alias("k"), F.col("id").alias("v"))
    salted = df.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
    n_groups = salted.select("k", "__salt").distinct().count()
    assert n_groups > 1  # the hot key really fans out


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", "-1"
    )  # force non-broadcast join path
    try:
        left = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        write_bucketed(left, "t_left_b", ["k"], num_buckets=8, sort_cols=["k"])
        write_bucketed(right, "t_right_b", ["k"], num_buckets=8, sort_cols=["k"])
        joined = spark.table("t_left_b").join(spark.table("t_right_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located buckets: zero shuffle
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("drop table if exists t_left_b")
        spark.sql("drop table if exists t_right_b")


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10_000).repartition(40).write.parquet(path)
    before = len([f for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")])
    assert before >= 40
    after = compact_parquet(spark, path, target_file_mb=128)
    assert after < before
    assert spark.read.parquet(path).count() == 10_000  # no data loss


def test_profile_table_counts_nulls_and_distincts(spark):
    from data_misc_tools_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "k int, v string"
    )
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert prof["k"].n_rows == 4
    assert prof["k"].n_nulls == 1
    assert prof["k"].n_distinct == 3
    assert (prof["k"].min_val, prof["k"].max_val) == ("1", "3")
    assert prof["v"].n_nulls == 1 and prof["v"].n_distinct == 2

    # scale mode: HLL distinct, same shape
    approx = {r.col_name: r for r in profile_table(df, exact_distinct=False).collect()}
    assert approx["v"].n_distinct >= 1


def test_skew_report_counts_shares_and_tiebreak(spark):
    from data_misc_tools_spark.operators.profile import skew_report

    rows = [(k,) for k in ["a"] * 6 + ["b"] * 3 + ["c"] * 1]
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", top=2).collect()
    assert [(r.key_value, r.n_rows, r.share) for r in out] == [
        ("a", 6, 0.6), ("b", 3, 0.3),
    ]
    # ties break lexicographically so the top-k cut is deterministic
    df2 = spark.createDataFrame([(k,) for k in ["y", "x", "z"]], "k string")
    out2 = skew_report(df2, "k", top=2).collect()
    assert [r.key_value for r in out2] == ["x", "y"]


def test_k_anonymity_flags_small_classes_and_l_diversity(spark):
    from data_misc_tools_spark.operators.profile import k_anonymity

    rows = (
        [("a", "x", u) for u in [1, 1, 2, 3]]          # size 4 < k, l=3
        + [("a", "y", u) for u in [7] * 5]             # size 5, but l=1
        + [("b", "x", u) for u in [1, 2, 3, 4, 5, 6]]  # size 6, l=6
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string, user long")
    out = {(r.q1, r.q2): r for r in
           k_anonymity(df, ["q1", "q2"], k=5, sensitive_col="user").collect()}
    assert out[("a", "x")].at_risk and out[("a", "x")].class_size == 4
    assert out[("a", "x")].l_diversity == 3
    assert not out[("a", "y")].at_risk and out[("a", "y")].l_diversity == 1
    assert not out[("b", "x")].at_risk and out[("b", "x")].l_diversity == 6

    # without a sensitive column the report has no l_diversity column
    slim = k_anonymity(df, ["q1"], k=100)
    assert slim.columns == ["q1", "class_size", "at_risk"]
    assert all(r.at_risk for r in slim.collect())


def test_pearson_exact_matches_numpy_and_handles_degenerate(spark):
    import numpy as np

    from data_misc_tools_spark.operators.profile import pearson_exact

    rng = np.random.default_rng(7)
    x = rng.integers(1, 50, 400)
    y = (x * 3.17 + rng.normal(0, 20, 400)).round(2)  # 2dp "prices"
    rows = [("g", int(a), float(b)) for a, b in zip(x, y)]
    rows += [("flat", i % 7 + 1, 5.0) for i in range(20)]  # zero y-variance
    df = spark.createDataFrame(rows, "grp string, x long, y double")
    out = {r.grp: r for r in
           pearson_exact(df, ["grp"], "x", "y", x_scale=1, y_scale=100).collect()}
    expected = np.corrcoef(x, (y * 100).round())[0, 1]
    assert abs(out["g"].corr - expected) < 1e-9
    assert out["g"].n_rows == 400
    assert out["flat"].corr is None  # 0/0 -> null, not a crash


def test_mad_outliers_flags_spikes_not_uniform_noise(spark):
    from data_misc_tools_spark.operators.profile import mad_outliers

    rows = [("a", float(i % 10)) for i in range(100)]      # tight cluster
    rows += [("a", 1000.0), ("a", -1000.0)]                # spikes
    rows += [("b", float(i)) for i in range(50)]           # uniform ramp
    df = spark.createDataFrame(rows, "g string, v double")
    out = mad_outliers(df, ["g"], "v", k=3.0)
    flagged = [(r.g, r.v) for r in out.filter("is_outlier").collect()]
    assert sorted(flagged) == [("a", -1000.0), ("a", 1000.0)]
    # the approx variant agrees on an easy case like this
    approx = mad_outliers(df, ["g"], "v", k=3.0, exact=False)
    assert sorted((r.g, r.v) for r in approx.filter("is_outlier").collect()) \
        == sorted(flagged)
    # robustness: a 400 spike sits under z=3 once the +/-1000 spikes
    # have inflated sigma (~139), but the MAD threshold still flags it
    df2 = spark.createDataFrame(rows[:-1] + [("a", 400.0)], "g string, v double")
    out2 = [r.v for r in mad_outliers(df2, ["g"], "v", k=3.0)
            .filter("is_outlier and g = 'a'").collect()]
    assert 400.0 in out2 and 1000.0 in out2


def test_validate_contract_counts_violations_including_nulls(spark):
    from data_misc_tools_spark.operators.profile import (
        fk_violations,
        validate_contract,
    )

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, -1.0, "a"), (3, None, "b"), (4, 2.0, None)],
        "id long, v double, cat string",
    )
    out = {r.rule: (r.n_violations, r.n_rows) for r in validate_contract(
        df,
        {
            "v_non_negative": F.col("v") >= 0,        # -1 fails, null fails
            "cat_known": F.col("cat").isin("a", "b"),  # null cat fails
            "id_positive": F.col("id") > 0,            # all pass
        },
    ).collect()}
    assert out == {
        "v_non_negative": (2, 4),
        "cat_known": (1, 4),
        "id_positive": (0, 4),
    }

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame(
        [(1, "x"), (3, "y"), (None, "z")], "k long, payload string"
    )
    orphans = {r.payload for r in fk_violations(child, parent, ["k"]).collect()}
    assert orphans == {"y", "z"}  # missing parent AND null key


def test_zipf_fit_matches_numpy_ols(spark):
    import math

    import numpy as np

    from data_misc_tools_spark.operators.profile import zipf_fit

    # construct a corpus with exact counts: term i appears 1000//i times
    words = []
    for i in range(1, 51):
        words += [f"w{i:03d}"] * (1000 // i)
    # chunk into docs of 40 tokens
    docs = [(j, " ".join(words[j * 40:(j + 1) * 40]))
            for j in range((len(words) + 39) // 40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = zipf_fit(df, top_k=50).collect()[0]
    assert r.n_terms == 50
    # numpy reference on the e6-rounded points (the operator's spec)
    from collections import Counter
    cnt = Counter(words)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    xs = np.array([round(math.log(i + 1) * 1e6) for i in range(len(ranked))], dtype=float)
    ys = np.array([round(math.log(c) * 1e6) for _, c in ranked], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    assert r.slope == pytest.approx(slope, rel=1e-9)
    assert r.intercept_e6 == pytest.approx(intercept, rel=1e-9)
    # near-perfect power law -> corr close to -1, slope near -1
    assert r.corr < -0.99
    assert -1.1 < r.slope < -0.9


def test_corpus_drift_identity_and_churn(spark):
    import math

    from data_misc_tools_spark.operators.profile import corpus_drift

    a = spark.createDataFrame(
        [(1, "x y x"), (2, "y z")], "doc_id long, text string"
    )
    r = corpus_drift(a, a).collect()[0]
    assert r.n_new_terms == 0 and r.n_dead_terms == 0
    assert r.kl_b_from_a == pytest.approx(0.0, abs=1e-6)
    assert r.vocab_a == r.vocab_b == 3 and r.n_tokens_a == r.n_tokens_b == 5

    b = spark.createDataFrame([(1, "x x w")], "doc_id long, text string")
    r2 = corpus_drift(a, b).collect()[0]
    assert r2.n_new_terms == 1   # w
    assert r2.n_dead_terms == 2  # y, z
    # hand-computed smoothed KL over union vocab {x,y,z,w}:
    ta, tb, v = 5, 3, 4
    ca = {"x": 2, "y": 2, "z": 1, "w": 0}
    cb = {"x": 2, "y": 0, "z": 0, "w": 1}
    kl = sum(
        cb[t] * round(math.log((cb[t] + 1) * (ta + v) / ((ca[t] + 1) * (tb + v))) * 1e6)
        for t in ca
    ) / tb / 1e6
    assert r2.kl_b_from_a == pytest.approx(kl, abs=1e-9)


def test_bootstrap_ci_sane_and_deterministic(spark):
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.profile import bootstrap_ci_mean

    # group a: values 0..999 (mean 499.5); group b: constant 42
    rows = [(i, "a", float(i % 1000)) for i in range(2000)]
    rows += [(10_000 + i, "b", 42.0) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    out = {r.grp: r for r in bootstrap_ci_mean(
        df, "value", "event_id", group_cols=["grp"], n_boot=100
    ).collect()}
    a, b = out["a"], out["b"]
    assert a.n_rows == 2000 and a.mean == pytest.approx(499.5)
    assert a.ci_lo < a.mean < a.ci_hi
    # CI half-width should be in the vicinity of 1.96*sd/sqrt(n) ~ 12.6
    assert 5 < (a.ci_hi - a.ci_lo) / 2 < 30
    # constant group: degenerate CI exactly at the mean
    assert b.ci_lo == b.ci_hi == b.mean == pytest.approx(42.0)
    # deterministic under repartition
    again = {r.grp: r for r in bootstrap_ci_mean(
        df.repartition(7), "value", "event_id", group_cols=["grp"], n_boot=100
    ).collect()}
    assert (again["a"].ci_lo, again["a"].ci_hi) == (a.ci_lo, a.ci_hi)


def test_ab_lift_detects_true_difference(spark):
    from data_misc_tools_spark.operators.profile import bootstrap_ab_lift

    rows = [(i, "control", 10.0 + (i % 5)) for i in range(1000)]
    rows += [(10_000 + i, "treatment", 13.0 + (i % 5)) for i in range(1000)]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    r = bootstrap_ab_lift(
        df, "value", "event_id", "grp", control="control", treatment="treatment"
    ).collect()[0]
    assert r.n_control == r.n_treatment == 1000
    assert r.lift == pytest.approx(3.0)
    assert r.ci_lo < 3.0 < r.ci_hi
    assert r.ci_lo > 0  # true lift: CI excludes zero
    assert (r.ci_hi - r.ci_lo) < 1.0
    # null experiment: identical distributions -> CI straddles zero
    rows0 = [(i, "control", 10.0 + (i % 5)) for i in range(1000)]
    rows0 += [(10_000 + i, "treatment", 10.0 + (i % 5)) for i in range(1000)]
    df0 = spark.createDataFrame(rows0, "event_id long, grp string, value double")
    r0 = bootstrap_ab_lift(
        df0, "value", "event_id", "grp", control="control", treatment="treatment"
    ).collect()[0]
    assert r0.ci_lo < 0 < r0.ci_hi


def test_bootstrap_fast_path_same_ci_semantics(spark):
    """portable=False (xxhash64 draws) must behave as the SAME
    estimator: identical point stats, deterministic under
    repartition, statistically equivalent CI on a fixed fixture
    (both paths' intervals cover the true mean and agree in width to
    within bootstrap noise)."""
    import pytest as _pt

    from data_misc_tools_spark.operators.profile import (
        bootstrap_ab_lift,
        bootstrap_ci_mean,
    )

    rows = [(i, "a", float(i % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    slow = bootstrap_ci_mean(
        df, "value", "event_id", group_cols=["grp"], n_boot=100
    ).collect()[0]
    fast = bootstrap_ci_mean(
        df, "value", "event_id", group_cols=["grp"], n_boot=100, portable=False
    ).collect()[0]
    assert (fast.n_rows, fast.mean) == (slow.n_rows, slow.mean)
    assert fast.ci_lo < fast.mean < fast.ci_hi
    # same machinery, different draws: widths agree within 2x
    w_slow, w_fast = slow.ci_hi - slow.ci_lo, fast.ci_hi - fast.ci_lo
    assert 0.5 < w_fast / w_slow < 2.0
    again = bootstrap_ci_mean(
        df.repartition(7), "value", "event_id", group_cols=["grp"],
        n_boot=100, portable=False,
    ).collect()[0]
    assert (again.ci_lo, again.ci_hi) == (fast.ci_lo, fast.ci_hi)

    rows = [(i, "control", 10.0 + (i % 5)) for i in range(1000)]
    rows += [(10_000 + i, "treatment", 13.0 + (i % 5)) for i in range(1000)]
    ab = spark.createDataFrame(rows, "event_id long, grp string, value double")
    r = bootstrap_ab_lift(
        ab, "value", "event_id", "grp", control="control",
        treatment="treatment", portable=False,
    ).collect()[0]
    assert r.lift == _pt.approx(3.0)
    assert 0 < r.ci_lo < 3.0 < r.ci_hi


class TestChiSquare2x2:
    def test_matches_scipy_formula_by_hand(self, spark):
        """Hand-checkable 2x2: chi2 = N(ad-bc)^2 / (r1 r2 c1 c2)."""
        from data_misc_tools_spark.operators.profile import chi_square_2x2

        # 30 variant (20 success), 30 control (10 success)
        rows = (
            [(1, 1)] * 20 + [(1, 0)] * 10 + [(0, 1)] * 10 + [(0, 0)] * 20
        )
        df = spark.createDataFrame(rows, "v int, s int")
        r = chi_square_2x2(df, F.col("v") == 1, F.col("s") == 1).head()
        assert (r.n11, r.n10, r.n01, r.n00) == (20, 10, 10, 20)
        want = 60 * (20 * 20 - 10 * 10) ** 2 / (30 * 30 * 30 * 30)
        assert abs(r.chi2 - want) < 1e-12
        assert r.chi2 > 3.841  # significant at p < .05

    def test_null_on_empty_margin(self, spark):
        from data_misc_tools_spark.operators.profile import chi_square_2x2

        df = spark.createDataFrame([(1, 1), (1, 0)], "v int, s int")
        r = chi_square_2x2(df, F.col("v") == 1, F.col("s") == 1).head()
        assert r.chi2 is None  # control column empty -> undefined

    def test_independent_variants_score_near_zero(self, spark):
        from data_misc_tools_spark.operators.profile import chi_square_2x2

        rows = [(i % 2, (i // 2) % 2) for i in range(400)]
        df = spark.createDataFrame(rows, "v int, s int")
        r = chi_square_2x2(df, F.col("v") == 1, F.col("s") == 1).head()
        assert r.chi2 == 0.0  # perfectly balanced


class TestWelchTTest:
    def test_matches_pinned_ieee_reference(self, spark):
        import math
        import random

        from data_misc_tools_spark.operators.profile import welch_ttest

        random.seed(5)
        rows = [(i, round(random.uniform(1, 300), 2)) for i in range(400)]
        df = spark.createDataFrame(rows, "user_id long, value double")
        r = welch_ttest(df, F.col("user_id") % 2 == 0, "value").head()
        a = [round(v * 100) for i, v in rows if i % 2 == 0]
        b = [round(v * 100) for i, v in rows if i % 2 != 0]
        na, nb = len(a), len(b)
        sa, sb = sum(a), sum(b)
        qa, qb = sum(x * x for x in a), sum(x * x for x in b)
        se2a = float(na * qa - sa * sa) / float(na * (na - 1)) / float(na)
        se2b = float(nb * qb - sb * sb) / float(nb * (nb - 1)) / float(nb)
        t = (float(sa) / float(na) - float(sb) / float(nb)) / math.sqrt(
            se2a + se2b
        )
        dfw = ((se2a + se2b) * (se2a + se2b)) / (
            se2a * se2a / float(na - 1) + se2b * se2b / float(nb - 1)
        )
        # BIT-exact: the whole point of the closed form (no tolerance)
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.t_stat == t
        assert r.df_welch == dfw
        assert r.mean_a == float(sa) / float(na) / 100.0

    def test_null_on_tiny_group(self, spark):
        from data_misc_tools_spark.operators.profile import welch_ttest

        df = spark.createDataFrame(
            [(0, 1.0), (1, 2.0), (3, 3.0)], "user_id long, value double"
        )
        r = welch_ttest(df, F.col("user_id") % 2 == 0, "value").head()
        assert r.n_a == 1 and r.t_stat is None and r.df_welch is None

    def test_null_on_zero_variance_both(self, spark):
        from data_misc_tools_spark.operators.profile import welch_ttest

        rows = [(i, 5.0) for i in range(10)]
        df = spark.createDataFrame(rows, "user_id long, value double")
        r = welch_ttest(df, F.col("user_id") % 2 == 0, "value").head()
        assert r.t_stat is None and r.df_welch is None
        assert r.mean_a == 5.0 and r.mean_b == 5.0

    def test_sign_follows_means(self, spark):
        from data_misc_tools_spark.operators.profile import welch_ttest

        rows = [(i, 10.0 + (i % 3)) for i in range(0, 100, 2)]
        rows += [(i, 1.0 + (i % 3)) for i in range(1, 100, 2)]
        df = spark.createDataFrame(rows, "user_id long, value double")
        r = welch_ttest(df, F.col("user_id") % 2 == 0, "value").head()
        assert r.mean_a > r.mean_b and r.t_stat > 0
        # huge separation vs within-group spread: clearly significant
        assert r.t_stat > 10


class TestFDViolationReport:
    def test_holding_and_violated_dependencies(self, spark):
        from data_misc_tools_spark.operators.profile import fd_violation_report

        rows = [
            (1, "a", "x"), (1, "a", "y"),   # 1 -> col2 holds; 1 -> col3 breaks
            (2, "b", "z"), (2, "b", "z"),
            (3, "c", "w"),
        ]
        df = spark.createDataFrame(rows, "k long, v string, s string")
        rep = {
            (r.lhs, r.rhs): (
                r.n_groups, r.n_violating_groups,
                r.n_violating_rows, r.max_distinct_rhs,
            )
            for r in fd_violation_report(
                df, [("k", "v"), ("k", "s"), (["k", "v"], "s")]
            ).collect()
        }
        assert rep[("k", "v")] == (3, 0, 0, 1)            # holds
        assert rep[("k", "s")] == (3, 1, 2, 2)            # group 1 breaks
        assert rep[("k,v", "s")] == (3, 1, 2, 2)          # compound LHS

    def test_empty_deps_raise(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import fd_violation_report

        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with _pytest.raises(ValueError):
            fd_violation_report(df, [])


class TestGlobalCumsum:
    def test_matches_python_prefix_sums(self, spark):
        import random

        from data_misc_tools_spark.operators.etl import global_cumsum

        random.seed(11)
        rows = [(k, random.randint(0, 9), random.randint(0, 5))
                for k in random.sample(range(10_000), 500)]
        df = spark.createDataFrame(rows, "k long, a long, b long")
        got = {
            r.k: (r.cum_a, r.cum_b)
            for r in global_cumsum(
                df, [F.col("k")], ["a", "b"], num_partitions=7
            ).collect()
        }
        ca = cb = 0
        for k, a, b in sorted(rows):
            ca += a
            cb += b
            assert got[k] == (ca, cb)

    def test_partition_count_invariance(self, spark):
        from data_misc_tools_spark.operators.etl import global_cumsum

        rows = [(i, 1) for i in range(100)]
        df = spark.createDataFrame(rows, "k long, c long")
        for nparts in (1, 3, 16):
            out = {
                r.k: r.cum_c
                for r in global_cumsum(
                    df, [F.col("k")], ["c"], num_partitions=nparts
                ).collect()
            }
            assert out == {i: i + 1 for i in range(100)}


class TestMannWhitneyU:
    def _reference(self, rows):
        """Pinned IEEE reference over python bigints: same closed form,
        same parenthesization as the operator and its DuckDB twin."""
        import math

        a = sorted(round(v * 100) for i, v in rows if i % 2 == 0)
        b = sorted(round(v * 100) for i, v in rows if i % 2 != 0)
        na, nb = len(a), len(b)
        # brute-force U_A: pairs a > b count 1, ties count 1/2
        u2 = sum(
            2 if x > y else (1 if x == y else 0) for x in a for y in b
        )  # 2*U_A
        from collections import Counter

        t = sum(c * c * c - c for c in Counter(a + b).values())
        n = na + nb
        varnum = na * nb * ((n + 1) * n * (n - 1) - t)
        varden = 12 * n * (n - 1)
        z = (float(u2 - na * nb) / 2) / math.sqrt(
            float(varnum) / float(varden)
        )
        return na, nb, float(u2) / 2, z

    def test_matches_bigint_reference_with_ties(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import mannwhitney_u

        random.seed(7)
        # values from a small grid -> lots of ties, exercising the
        # tie-corrected variance and half-integer U
        rows = [(i, random.choice([1.25, 2.5, 2.5, 3.75, 9.99]))
                for i in range(300)]
        df = spark.createDataFrame(rows, "user_id long, value double")
        r = mannwhitney_u(df, F.col("user_id") % 2 == 0, "value").head()
        na, nb, ua, z = self._reference(rows)
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.u_a == ua          # BIT-exact, half-integer ties
        assert r.z_stat == z        # pinned IEEE chain, no tolerance

    def test_continuous_values_no_ties(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import mannwhitney_u

        random.seed(13)
        rows = [(i, round(random.uniform(1, 500), 2)) for i in range(250)]
        df = spark.createDataFrame(rows, "user_id long, value double")
        r = mannwhitney_u(df, F.col("user_id") % 2 == 0, "value").head()
        na, nb, ua, z = self._reference(rows)
        assert r.u_a == ua and r.z_stat == z

    def test_shifted_distribution_is_significant(self, spark):
        from data_misc_tools_spark.operators.profile import mannwhitney_u

        rows = [(2 * i, 10.0 + (i % 7)) for i in range(100)]
        rows += [(2 * i + 1, 1.0 + (i % 7)) for i in range(100)]
        df = spark.createDataFrame(rows, "user_id long, value double")
        r = mannwhitney_u(df, F.col("user_id") % 2 == 0, "value").head()
        assert r.u_a > 100 * 100 * 0.9  # A nearly always wins
        assert r.z_stat > 10

    def test_null_z_when_all_tied_or_one_sided(self, spark):
        from data_misc_tools_spark.operators.profile import mannwhitney_u

        tied = spark.createDataFrame(
            [(i, 5.0) for i in range(10)], "user_id long, value double"
        )
        r = mannwhitney_u(tied, F.col("user_id") % 2 == 0, "value").head()
        assert r.z_stat is None and r.u_a == 5 * 5 / 2  # all half-ties

        onesided = spark.createDataFrame(
            [(0, 1.0), (2, 2.0)], "user_id long, value double"
        )
        r = mannwhitney_u(onesided, F.col("user_id") % 2 == 0, "value").head()
        assert r.n_b == 0 and r.z_stat is None


class TestKS2Sample:
    def _reference(self, rows):
        a = sorted(round(v * 100) for g, v in rows if g)
        b = sorted(round(v * 100) for g, v in rows if not g)
        na, nb = len(a), len(b)
        pooled = sorted(set(a) | set(b))
        best = (-1, None)
        for v in pooled:
            ca = sum(1 for x in a if x <= v)
            cb = sum(1 for x in b if x <= v)
            dn = abs(ca * nb - cb * na)
            if dn > best[0]:
                best = (dn, v)
        return na, nb, best[0], best[1]

    def test_matches_bruteforce_ecdf_max(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import ks_2sample

        random.seed(3)
        rows = [(i % 3 == 0, round(random.gauss(50 + (10 if i % 3 == 0 else 0), 15), 2))
                for i in range(400)]
        df = spark.createDataFrame(rows, "g boolean, value double")
        r = ks_2sample(df, F.col("g"), "value").head()
        na, nb, dn, v = self._reference(rows)
        assert (r.n_a, r.n_b, r.d_num) == (na, nb, dn)
        assert r.d_stat == float(dn) / float(na * nb)  # one IEEE division
        assert r.at_value == float(v) / 100

    def test_identical_samples_zero_distance(self, spark):
        from data_misc_tools_spark.operators.profile import ks_2sample

        rows = [(bool(g), float(v)) for v in range(20) for g in (0, 1)]
        df = spark.createDataFrame(rows, "g boolean, value double")
        r = ks_2sample(df, F.col("g"), "value").head()
        assert r.d_num == 0 and r.d_stat == 0.0

    def test_disjoint_supports_distance_one(self, spark):
        from data_misc_tools_spark.operators.profile import ks_2sample

        rows = [(True, float(v)) for v in range(10)]
        rows += [(False, float(v) + 100) for v in range(10)]
        df = spark.createDataFrame(rows, "g boolean, value double")
        r = ks_2sample(df, F.col("g"), "value").head()
        assert r.d_stat == 1.0 and r.at_value == 9.0

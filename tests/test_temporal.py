"""As-of and range join semantics."""

import pytest
import pyspark.sql.functions as F

from data_misc_tools_spark.operators.temporal import asof_join, range_join


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (3, 100, 30), (4, 200, 15)],
        "lid int, k int, t int",
    )
    right = spark.createDataFrame(
        [(100, 5, "a"), (100, 20, "b"), (100, 25, "c"), (300, 1, "z")],
        "k int, t int, val string",
    )
    return left, right


def test_asof_strict_excludes_ties(spark):
    left, right = _sides(spark)
    out = {
        r.lid: r.val_asof
        for r in asof_join(left, right, on="t", by="k", right_cols=["val"], strict=True).collect()
    }
    assert out[1] == "a"   # t=10: only t=5 is before
    assert out[2] == "a"   # t=20 strict: the t=20 right row is excluded
    assert out[3] == "c"   # t=30: latest prior is t=25
    assert out[4] is None  # no right rows for k=200


def test_asof_non_strict_includes_ties(spark):
    left, right = _sides(spark)
    out = {
        r.lid: r.val_asof
        for r in asof_join(left, right, on="t", by="k", right_cols=["val"], strict=False).collect()
    }
    assert out[2] == "b"  # tie included


def test_asof_no_row_amplification(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="t", by="k", right_cols=["val"])
    assert out.count() == left.count()


def test_asof_plan_is_single_shuffle_no_join(spark):
    left, right = _sides(spark)
    plan = (
        asof_join(left, right, on="t", by="k", right_cols=["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union-window construction: a Window over one Exchange, no join node
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_bands(spark):
    facts = spark.createDataFrame([(1, 0.0), (2, 49.9), (3, 50.0), (4, -5.0)], "id int, v double")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 100.0)], "band string, lo double, hi double"
    )
    out = {r.id: r.band for r in range_join(facts, bands, "v").collect()}
    assert out == {1: "low", 2: "low", 3: "mid", 4: None}  # lo inclusive, hi exclusive


class TestFunnel:
    @pytest.fixture(scope="class")
    def events(self, spark):
        rows = [
            # user 1: full funnel in order
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 00:01:00", 1, "click"),
            (3, "2024-01-01 00:02:00", 1, "purchase"),
            # user 2: purchase BEFORE click -> stops at stage 2
            (4, "2024-01-01 00:00:00", 2, "view"),
            (5, "2024-01-01 00:02:00", 2, "click"),
            (6, "2024-01-01 00:01:00", 2, "purchase"),
            # user 3: click only (no view first) -> stage 0
            (7, "2024-01-01 00:00:00", 3, "click"),
            # user 4: view only -> stage 1; noise types ignored
            (8, "2024-01-01 00:00:00", 4, "view"),
            (9, "2024-01-01 00:01:00", 4, "error"),
            # user 5: second view opens the path (greedy restarts not
            # needed: earliest view at t0, click at t2 after it)
            (10, "2024-01-01 00:00:00", 5, "view"),
            (11, "2024-01-01 00:03:00", 5, "view"),
            (12, "2024-01-01 00:04:00", 5, "click"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        )
        return df.withColumn("ts", F.to_timestamp("ts"))

    def test_stages_per_user(self, spark, events):
        from data_misc_tools_spark.operators.temporal import funnel_stages

        got = {
            r.user_id: r.funnel_stage
            for r in funnel_stages(events, ["view", "click", "purchase"]).collect()
        }
        assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 2}

    def test_counts_are_at_least_stage(self, spark, events):
        from data_misc_tools_spark.operators.temporal import funnel_counts

        got = {
            r.stage: r.n_users
            for r in funnel_counts(events, ["view", "click", "purchase"]).collect()
        }
        assert got == {1: 4, 2: 3, 3: 1}

    def test_order_scramble_invariant(self, spark, events):
        from data_misc_tools_spark.operators.temporal import funnel_stages

        shuffled = events.orderBy(F.col("event_id").desc()).repartition(7)
        a = sorted(map(tuple, funnel_stages(events, ["view", "click"]).collect()))
        b = sorted(map(tuple, funnel_stages(shuffled, ["view", "click"]).collect()))
        assert a == b

    def test_single_scan_no_python(self, spark, events):
        from data_misc_tools_spark.operators.temporal import funnel_stages

        plan = (
            funnel_stages(events, ["view", "click", "purchase"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan


class TestCohortRetention:
    def test_hand_computed_table(self, spark):
        from data_misc_tools_spark.operators.temporal import cohort_retention

        day = 86400
        rows = [
            # users 1,2 start day 0; user 1 returns day 2; user 2 never
            (1, 0), (1, 10), (1, 2 * day),
            (2, day // 2),
            # user 3 starts day 1, returns days 2 and 3
            (3, day), (3, 2 * day), (3, 3 * day),
        ]
        df = spark.createDataFrame(rows, "user_id long, sec long").select(
            "user_id", F.timestamp_seconds("sec").alias("ts")
        )
        got = {
            (r.cohort_period, r.period_offset): r.n_users
            for r in cohort_retention(df, period_seconds=day).collect()
        }
        assert got == {
            (0, 0): 2, (0, 2): 1,   # cohort day-0: both, then user 1 back
            (1, 0): 1, (1, 1): 1, (1, 2): 1,  # user 3 daily streak
        }

    def test_offset_zero_equals_cohort_size(self, spark):
        from data_misc_tools_spark.operators.temporal import cohort_retention

        rows = [(u, u % 3, ) for u in range(30)]
        df = spark.createDataFrame(rows, "user_id long, d long").select(
            "user_id", F.timestamp_seconds(F.col("d") * 86400).alias("ts")
        )
        out = cohort_retention(df, period_seconds=86400).collect()
        by = {(r.cohort_period, r.period_offset): r.n_users for r in out}
        assert by[(0, 0)] == 10 and by[(1, 0)] == 10 and by[(2, 0)] == 10
        assert len(by) == 3  # nobody returns


def test_missing_intervals_finds_only_long_gaps(spark):
    from data_misc_tools_spark.operators.temporal import missing_intervals

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),   # 600 s — below threshold
        (1, "2024-01-01 02:10:00"),   # 7200 s gap
        (1, "2024-01-01 02:10:00"),   # duplicate ts -> zero gap, dropped
        (2, "2024-01-01 00:00:00"),   # single event: no gap at all
        (3, "2024-01-01 00:00:00"),
        (3, "2024-01-02 00:00:00"),   # 86400 s gap
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    out = {(r.user_id): (str(r.gap_start), str(r.gap_end), r.gap_seconds)
           for r in missing_intervals(df, "user_id", "ts", 3600).collect()}
    assert out == {
        1: ("2024-01-01 00:10:00", "2024-01-01 02:10:00", 7200),
        3: ("2024-01-01 00:00:00", "2024-01-02 00:00:00", 86400),
    }


def test_sequence_examples_contexts(spark):
    from data_misc_tools_spark.operators.temporal import sequence_examples

    rows = [
        (1, 10, 1, "a"), (1, 20, 2, "b"), (1, 30, 3, "c"), (1, 40, 4, "d"),
        (2, 10, 5, "x"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, event_type string")
    out = {r.event_id: r for r in sequence_examples(
        df, order_cols=["ts", "event_id"], context=3
    ).collect()}
    # first event per user has no context -> dropped
    assert 1 not in out and 5 not in out
    assert out[2].context == ["a"] and out[2].label == "b"
    assert out[3].context == ["a", "b"]
    assert out[4].context == ["a", "b", "c"]
    # context window slides: add a 5th event, context caps at 3
    df2 = df.unionAll(spark.createDataFrame(
        [(1, 50, 6, "e")], "user_id long, ts long, event_id long, event_type string"))
    out2 = {r.event_id: r for r in sequence_examples(
        df2, order_cols=["ts", "event_id"], context=3).collect()}
    assert out2[6].context == ["b", "c", "d"]
    # tie on ts broken by event_id deterministically
    df3 = spark.createDataFrame(
        [(3, 10, 1, "p"), (3, 10, 2, "q"), (3, 10, 3, "r")],
        "user_id long, ts long, event_id long, event_type string")
    out3 = {r.event_id: r for r in sequence_examples(
        df3, order_cols=["ts", "event_id"], context=3).collect()}
    assert out3[3].context == ["p", "q"]


def test_rolling_zscore_flags_spike(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.temporal import rolling_zscore_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(30):
        # alternating 4/6 baseline (nonzero variance), spike at hour 27
        n = (4 + 2 * (h % 2)) if h != 27 else 50
        for _ in range(n):
            rows.append((eid, "click", base + dt.timedelta(hours=h, minutes=30)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    out = rolling_zscore_anomalies(df, window=24, threshold=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.entity == "click" and r.n == 50 and r.z > 10
    # normal hours score small |z|; all full-window hours present
    allrows = rolling_zscore_anomalies(df, window=24).collect()
    assert len(allrows) == 6  # hours 24..29
    normal = [x for x in allrows if x.n <= 6]
    assert normal and all(abs(x.z) < 3 for x in normal if x.z is not None)


def test_decayed_popularity_halves_per_half_life(spark):
    import datetime as dt

    from data_misc_tools_spark.operators.temporal import decayed_popularity

    t0 = dt.datetime(2024, 1, 1)
    hl = 3600
    rows = [
        (1, "a", t0),                               # age 2h -> 0.25
        (2, "a", t0 + dt.timedelta(hours=1)),       # age 1h -> 0.5
        (3, "a", t0 + dt.timedelta(hours=2)),       # age 0  -> 1.0
        (4, "b", t0 + dt.timedelta(hours=2)),       # age 0  -> 1.0
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = {r.entity: r for r in decayed_popularity(df, half_life_seconds=hl).collect()}
    assert got["a"].n_events == 3 and got["a"].score == pytest.approx(1.75)
    assert got["b"].score == pytest.approx(1.0)
    # explicit as_of one half-life later halves every weight
    later = decayed_popularity(
        df, half_life_seconds=hl, as_of="2024-01-01 03:00:00"
    ).collect()
    lmap = {r.entity: r.score for r in later}
    assert lmap["a"] == pytest.approx(0.875)
    assert lmap["b"] == pytest.approx(0.5)


def test_transition_matrix_hand_case(spark):
    from data_misc_tools_spark.operators.temporal import transition_matrix

    rows = [
        (1, 1, 1, "a"), (1, 2, 2, "b"), (1, 3, 3, "a"), (1, 4, 4, "b"),
        (2, 1, 5, "a"), (2, 2, 6, "a"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, event_type string")
    got = {(r.from_item, r.to_item): (r.n, r.p)
           for r in transition_matrix(df).collect()}
    # a->b twice (user 1), a->a once (user 2): p(a->b)=2/3, p(a->a)=1/3
    assert got[("a", "b")] == (2, 0.6667)
    assert got[("a", "a")] == (1, 0.3333)
    assert got[("b", "a")] == (1, 1.0)
    assert ("b", "b") not in got
    # rows per from_item sum to ~1
    assert abs(got[("a", "b")][1] + got[("a", "a")][1] - 1.0) < 2e-4


def test_rolling_zscore_zero_fill_gap_semantics(spark):
    from data_misc_tools_spark.operators.temporal import rolling_zscore_anomalies

    # entity with steady traffic for 30 hours, then 30 quiet hours
    # (one event every 3rd hour), then one busy hour. Default
    # (non-empty buckets only) reaches back past the quiet stretch
    # into the busy era, DAMPING the spike's z; zero_fill scores it
    # against the true trailing 24 wall-clock hours (mostly zeros)
    # -> huge z. (A totally silent gap would give zero variance and
    # null z on the filled axis — variance needs at least one
    # non-constant bucket.)
    rows = []
    base = 1_600_000_000
    for h in range(30):
        for i in range(10):  # 10 events/hour
            rows.append(("a", base + h * 3600 + i))
    for h in range(30, 60, 3):
        rows.append(("a", base + h * 3600))  # sparse: 1 event / 3 h
    for i in range(10):      # hour 60: back with 10 events
        rows.append(("a", base + 60 * 3600 + i))
    df = spark.createDataFrame(rows, "event_type string, sec long").selectExpr(
        "event_type", "timestamp_seconds(sec) AS ts"
    )
    plain = {r.bucket_start: r.z for r in rolling_zscore_anomalies(df).collect()}
    filled = {r.bucket_start: r.z for r in rolling_zscore_anomalies(
        df, zero_fill=True
    ).collect()}
    # locate the post-quiet spike bucket
    from datetime import datetime, timezone
    key = datetime.fromtimestamp((base // 3600 + 60) * 3600, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    # default: the trailing 24 NON-EMPTY buckets include 14 busy
    # (n=10) pre-quiet hours -> high-mean baseline damps the spike
    assert key in plain and plain[key] < 2
    # zero-filled: trailing 24 wall-clock hours are 8 ones + 16 zeros
    # -> the spike is a screaming anomaly
    assert key in filled and filled[key] > 10
    assert filled[key] > plain[key] + 5
    # filled axis scores the zero buckets as negative-z dips
    assert any(z is not None and z < 0 for z in filled.values())


def test_stationary_distribution_known_chain(spark):
    from data_misc_tools_spark.operators.temporal import stationary_distribution

    # 2-event users give exact transition counts: P(a->a)=.5,
    # P(a->b)=.5, P(b->a)=1 -> stationary (2/3, 1/3)
    rows = []
    eid = 0
    def pair(u, x, y):
        nonlocal eid
        rows.append((u, eid, 1_600_000_000, x)); eid += 1
        rows.append((u, eid, 1_600_000_100, y)); eid += 1
    for u in range(5):
        pair(u, "a", "a")
    for u in range(5, 10):
        pair(u, "a", "b")
    for u in range(10, 20):
        pair(u, "b", "a")
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, event_type string"
    ).selectExpr("user_id", "event_id", "timestamp_seconds(sec) AS ts", "event_type")
    got = {r.state: r for r in stationary_distribution(df, iters=12).collect()}
    assert set(got) == {"a", "b"}
    assert abs(got["a"].p - 2 / 3) < 0.01
    assert abs(got["b"].p - 1 / 3) < 0.01
    # integer mass approximately conserved (truncation drift only)
    total = got["a"].v_e6 + got["b"].v_e6
    assert abs(total - 1_000_000) < 100
    # deterministic under repartition
    again = {r.state: r.v_e6 for r in stationary_distribution(
        df.repartition(7), iters=12
    ).collect()}
    assert again == {k: v.v_e6 for k, v in got.items()}


def test_stationary_distribution_absorbing_state(spark):
    from data_misc_tools_spark.operators.temporal import stationary_distribution

    # c only receives: it's absorbing, so iteration drains mass into it
    rows = [
        (1, 1, 1_600_000_000, "a"), (1, 2, 1_600_000_100, "c"),
        (2, 3, 1_600_000_000, "a"), (2, 4, 1_600_000_100, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, event_type string"
    ).selectExpr("user_id", "event_id", "timestamp_seconds(sec) AS ts", "event_type")
    got = {r.state: r for r in stationary_distribution(df, iters=8).collect()}
    assert set(got) == {"a", "c"}
    assert got["c"].v_e6 > got["a"].v_e6  # mass accumulates in the sink
    total = got["a"].v_e6 + got["c"].v_e6
    assert abs(total - 1_000_000) < 100  # conserved, never lost


def test_stationary_fast_matches_exact_twin(spark):
    """The driver-side float twin (VERDICT r5 ask) must agree with the
    integer-exact distributed form to e6 truncation tolerance, and hit
    the known chain's closed form to float precision."""
    from data_misc_tools_spark.operators.temporal import (
        stationary_distribution,
        stationary_distribution_fast,
    )

    rows = []
    eid = 0

    def pair(u, x, y):
        nonlocal eid
        rows.append((u, eid, 1_600_000_000, x)); eid += 1
        rows.append((u, eid, 1_600_000_100, y)); eid += 1

    for u in range(5):
        pair(u, "a", "a")
    for u in range(5, 10):
        pair(u, "a", "b")
    for u in range(10, 20):
        pair(u, "b", "a")
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, event_type string"
    ).selectExpr("user_id", "event_id", "timestamp_seconds(sec) AS ts", "event_type")
    fast = {r.state: r.p for r in stationary_distribution_fast(df, iters=12).collect()}
    assert set(fast) == {"a", "b"}
    assert abs(fast["a"] - 2 / 3) < 1e-4  # float convergence, 12 rounds
    assert abs(fast["b"] - 1 / 3) < 1e-4
    assert abs(sum(fast.values()) - 1.0) < 1e-12  # no truncation loss
    exact = {r.state: r.p for r in stationary_distribution(df, iters=12).collect()}
    for s in exact:
        assert abs(fast[s] - exact[s]) < 1e-3, s


def test_stationary_fast_max_states_guard(spark):
    from data_misc_tools_spark.operators.temporal import (
        stationary_distribution_fast,
    )

    rows = [
        (1, 1, 1_600_000_000, "a"), (1, 2, 1_600_000_100, "b"),
        (1, 3, 1_600_000_200, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, event_type string"
    ).selectExpr("user_id", "event_id", "timestamp_seconds(sec) AS ts", "event_type")
    with pytest.raises(ValueError, match="max_states"):
        stationary_distribution_fast(df, max_states=2)


def test_cusum_deviation_locates_a_level_shift(spark):
    from data_misc_tools_spark.operators.temporal import cusum_deviation

    # flat 100 for 20 buckets, then flat 200: changepoint at k=20
    vals = [100] * 20 + [200] * 10
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "pos int, v int"
    )
    out = {r.k: r for r in cusum_deviation(df, "pos", "v").collect()}
    n, s_n = len(vals), sum(vals)
    # bit-exact against the python reference at every position
    s = 0
    for k1, v in enumerate(vals, start=1):
        s += v
        assert out[k1].s_k == s
        assert out[k1].dev_num == abs(n * s - k1 * s_n)
        assert out[k1].dev_frac == abs(n * s - k1 * s_n) / (n * s_n)
    best = max(out.values(), key=lambda r: (r.dev_num, -r.k))
    assert best.k == 20  # the true changepoint
    # a constant series has zero deviation everywhere
    flat = spark.createDataFrame(
        [(i, 7) for i in range(5)], "pos int, v int"
    )
    assert all(
        r.dev_num == 0 for r in cusum_deviation(flat, "pos", "v").collect()
    )


def test_lag_crosscorr_finds_the_planted_lead(spark):
    from data_misc_tools_spark.operators.temporal import lag_crosscorr

    # y is x shifted forward by exactly 2: corr at lag=+2 must be 1.0
    import random

    rng = random.Random(11)
    xs = [rng.randint(0, 100) for _ in range(40)]
    rows = [
        (t, xs[t], xs[t - 2] if t >= 2 else 0) for t in range(40)
    ]
    df = spark.createDataFrame(rows, "t int, x int, y int")
    out = {r.lag: r for r in lag_crosscorr(df, "t", "x", "y", 3).collect()}
    assert set(out) == set(range(-3, 4))
    assert abs(out[2].corr - 1.0) < 1e-12  # IEEE sqrt-product ulp
    assert all(abs(out[l].corr) < 0.5 for l in out if l != 2)
    # overlap shrinks by |lag|
    assert out[3].n_rows == 37 and out[-3].n_rows == 37 and out[0].n_rows == 40
    # constant series -> NULL corr, not an error
    flat = spark.createDataFrame(
        [(t, 5, t) for t in range(10)], "t int, x int, y int"
    )
    assert all(
        r.corr is None
        for r in lag_crosscorr(flat, "t", "x", "y", 1).collect()
    )


def test_attribution_ushape_credit_positions(spark):
    from data_misc_tools_spark.operators.temporal import (
        attribution_position_credit,
    )

    # one conversion with 5 touches, one with 2, one with 1; a tied
    # timestamp pair ordered by the unique touch id
    rows = (
        [(1, 100, t, i) for i, t in enumerate([10, 20, 20, 30, 40])]
        + [(2, 200, 5, 0), (2, 200, 9, 1)]
        + [(3, 300, 7, 0)]
    )
    df = spark.createDataFrame(
        rows, "user int, conv int, touch_ts int, touch_id int"
    )
    out = attribution_position_credit(
        df, ["user", "conv"], ["touch_ts", "touch_id"]
    ).collect()
    by = {(r.user, r.pos): r for r in out}
    # 5 touches: 400 / 67 / 67 / 67 / 400  (200/3 half-up = 67)
    assert [by[(1, p)].credit_permille for p in range(1, 6)] == [
        400, 67, 67, 67, 400,
    ]
    assert by[(1, 1)].touch_ts == 10 and by[(1, 5)].touch_ts == 40
    # tie at ts=20 broken by touch_id
    assert by[(1, 2)].touch_id == 1 and by[(1, 3)].touch_id == 2
    assert [by[(2, p)].credit_permille for p in (1, 2)] == [500, 500]
    assert by[(3, 1)].credit_permille == 1000
    assert all(r.n_touches in (1, 2, 5) for r in out)
    import pytest as _pt

    with _pt.raises(ValueError):
        attribution_position_credit(
            df, ["user"], ["touch_ts"], first_permille=600, last_permille=600
        )


class TestShapleyAttribution:
    def _ref_phi(self, masks, n):
        """Brute-force Shapley over orderings (n! enumeration)."""
        import itertools

        full = (1 << n) - 1
        v = [0] * (full + 1)
        for s in range(full + 1):
            v[s] = sum(1 for m in masks if (m & s) == m)
        phi = [0] * n
        for perm in itertools.permutations(range(n)):
            s = 0
            for i in perm:
                phi[i] += v[s | (1 << i)] - v[s]
                s |= 1 << i
        return phi, v  # phi already scaled by n!

    def test_matches_brute_force_orderings(self, spark):
        import datetime
        import random

        from data_misc_tools_spark.operators.temporal import (
            shapley_attribution,
        )

        rng = random.Random(5)
        channels = ["a", "b", "c"]
        rows, masks = [], []
        t0 = datetime.datetime(2024, 1, 1)
        for u in range(120):
            touched = [c for c in channels if rng.random() < 0.5]
            for i, c in enumerate(touched):
                rows.append((u, c, t0 + datetime.timedelta(minutes=i)))
            converted = rng.random() < 0.6
            if converted:
                rows.append((u, "buy", t0 + datetime.timedelta(hours=1)))
                masks.append(
                    sum(1 << channels.index(c) for c in touched)
                )
            # post-conversion touches must NOT count
            rows.append((u, "a", t0 + datetime.timedelta(hours=2)))
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        got = {
            r["channel"]: r
            for r in shapley_attribution(
                df, channels, conversion_type="buy"
            ).collect()
        }
        phi, v = self._ref_phi(masks, 3)
        for i, c in enumerate(channels):
            assert got[c]["phi_scaled"] == phi[i]
            assert got[c]["v_empty"] == v[0]
            assert got[c]["v_full"] == v[7]
        # efficiency: sum phi = n! * (v(N) - v(empty))
        assert sum(phi) == 6 * (v[7] - v[0])

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import (
            shapley_attribution,
        )

        df = spark.createDataFrame(
            [(1, "a", None)], "user_id long, event_type string, ts timestamp"
        )
        with _pytest.raises(ValueError):
            shapley_attribution(df, [])
        with _pytest.raises(ValueError):
            shapley_attribution(df, ["a", "a"])
        with _pytest.raises(ValueError):
            shapley_attribution(df, ["purchase"])
        with _pytest.raises(ValueError):
            shapley_attribution(df, [f"c{i}" for i in range(17)])


class TestEwmaSmooth:
    def test_matches_python_recursion(self, spark):
        import random

        from data_misc_tools_spark.operators.temporal import ewma_smooth

        rng = random.Random(3)
        rows = [(i, rng.randrange(0, 10_000)) for i in range(200)]
        df = spark.createDataFrame(rows, "o long, x long")
        a = 250
        s = None
        ref = {}
        for o, x in rows:
            s = x if s is None else (2 * (a * x + (1000 - a) * s) + 1000) // 2000
            ref[o] = s
        for r in ewma_smooth(df, "o", "x", alpha_permille=a).collect():
            assert r["ewma"] == ref[r["o"]]

    def test_alpha_1000_is_identity(self, spark):
        from data_misc_tools_spark.operators.temporal import ewma_smooth

        df = spark.createDataFrame([(1, 10), (2, 99), (3, 5)], "o long, x long")
        got = ewma_smooth(df, "o", "x", alpha_permille=1000).collect()
        assert all(r["ewma"] == r["x"] for r in got)

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import ewma_smooth

        df = spark.createDataFrame([(i, i) for i in range(10)], "o long, x long")
        with _pytest.raises(ValueError):
            ewma_smooth(df, "o", "x", alpha_permille=0)
        with _pytest.raises(ValueError):
            ewma_smooth(df, "o", "x", max_rows=5)

    def test_empty_series_raises_cleanly(self, spark):
        """ADVICE r7: an over-filtered rollup must surface as a clean
        ValueError, not a VALUES-list ParseException."""
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import ewma_smooth

        df = spark.createDataFrame([], "o long, x long")
        with _pytest.raises(ValueError, match="empty series"):
            ewma_smooth(df, "o", "x")


class TestFunnelBounded:
    STEPS = ["view", "click", "purchase"]

    def _py_stage(self, evs, gap):
        """Exists-semantics reachability DP: chains are STRICTLY
        increasing in time, so checks at time t read a snapshot of the
        state from before t (same-second updates are invisible to
        same-second events — the ADVICE r8 divergence)."""
        from itertools import groupby

        latest = [None] * len(self.STEPS)
        for t, group in groupby(sorted(evs), key=lambda e: e[0]):
            snap = list(latest)
            for _, _, y in group:
                s = self.STEPS.index(y)
                if s == 0:
                    latest[0] = t
                elif (
                    snap[s - 1] is not None
                    and t > snap[s - 1]
                    and t - snap[s - 1] <= gap
                ):
                    latest[s] = t
        stage = 0
        for v in latest:
            if v is None:
                break
            stage += 1
        return stage

    def test_tied_timestamp_view_does_not_shadow(self, spark):
        """ADVICE r8: view@a, view@b, click@b (click id > view id) —
        the same-second view must not overwrite the stage-1 anchor the
        click chains off; the exists-join oracle counts stage 2."""
        import datetime as dt

        from data_misc_tools_spark.operators.temporal import (
            funnel_stages_bounded,
        )

        base = dt.datetime(2024, 1, 1)
        b = base + dt.timedelta(seconds=10)
        rows = [
            (1, base, 1, "view"),
            (1, b, 2, "view"),
            (1, b, 3, "click"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        got = funnel_stages_bounded(df, self.STEPS, max_gap_s=60).collect()
        assert got[0]["funnel_stage"] == 2
        # And same-second chaining stays forbidden: click@b alone
        # (no earlier view) must NOT complete stage 2 off view@b.
        df2 = spark.createDataFrame(
            [(1, b, 2, "view"), (1, b, 3, "click")],
            "user_id long, ts timestamp, event_id long, event_type string",
        )
        got2 = funnel_stages_bounded(df2, self.STEPS, max_gap_s=60).collect()
        assert got2[0]["funnel_stage"] == 1

    def test_greedy_counterexample_recovers_chain(self, spark):
        """view@0, view@10, click@12 at gap 5: greedy-earliest anchors
        on view@0 and fails; the DP finds view@10 -> click@12."""
        import datetime as dt

        from data_misc_tools_spark.operators.temporal import (
            funnel_stages_bounded,
        )

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, 1, "view"),
            (1, base + dt.timedelta(seconds=10), 2, "view"),
            (1, base + dt.timedelta(seconds=12), 3, "click"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        got = funnel_stages_bounded(df, self.STEPS, max_gap_s=5).collect()
        assert got[0]["funnel_stage"] == 2

    def test_matches_python_dp_on_random_streams(self, spark):
        import datetime as dt
        import random

        from data_misc_tools_spark.operators.temporal import (
            funnel_stages_bounded,
        )

        rng = random.Random(23)
        base = dt.datetime(2024, 1, 1)
        rows, by_user = [], {}
        eid = 0
        for u in range(60):
            # Half the users draw from a tight range so tied
            # timestamps (the ADVICE r8 case) occur routinely.
            hi = 500 if u % 2 == 0 else 20
            for _ in range(rng.randrange(1, 15)):
                t = rng.randrange(0, hi)
                y = rng.choice(self.STEPS)
                eid += 1
                rows.append(
                    (u, base + dt.timedelta(seconds=t), eid, y)
                )
                by_user.setdefault(u, []).append((t, eid, y))
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        gap = 60
        got = {
            r["user_id"]: r["funnel_stage"]
            for r in funnel_stages_bounded(df, self.STEPS, gap).collect()
        }
        for u, evs in by_user.items():
            assert got[u] == self._py_stage(evs, gap), u

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import (
            funnel_stages_bounded,
        )

        df = spark.createDataFrame(
            [(1, None, 1, "view")],
            "user_id long, ts timestamp, event_id long, event_type string",
        )
        with _pytest.raises(ValueError, match="max_gap_s"):
            funnel_stages_bounded(df, self.STEPS, 0)
        with _pytest.raises(ValueError, match="two steps"):
            funnel_stages_bounded(df, ["view"], 10)


class TestHoltWintersSmooth:
    def test_constant_series_is_fixed_point(self, spark):
        from data_misc_tools_spark.operators.temporal import (
            holt_winters_smooth,
        )

        df = spark.createDataFrame(
            [(i, 500) for i in range(20)], "o long, x long"
        )
        rows = holt_winters_smooth(df, "o", "x", season=4).collect()
        assert rows[0]["fcast"] is None  # init row
        for r in rows:
            assert r["level"] == 500
            assert r["trend"] == 0
            assert r["seasonal"] == 0
        assert all(r["fcast"] == 500 for r in rows[1:])

    def test_pure_seasonal_pattern_is_learned(self, spark):
        """A trendless exact period-4 pattern: after the init season
        the one-step forecast reproduces the actual value exactly
        (level == mean, seasonals == deviations, nothing to adapt)."""
        from data_misc_tools_spark.operators.temporal import (
            holt_winters_smooth,
        )

        pat = [100, 300, 200, 400]  # mean 250
        df = spark.createDataFrame(
            [(i, pat[i % 4]) for i in range(24)], "o long, x long"
        )
        rows = holt_winters_smooth(df, "o", "x", season=4).collect()
        for r in rows[1:]:
            assert r["fcast"] == r["x"], r
            assert r["level"] == 250

    def test_trending_series_fcast_tracks(self, spark):
        """x_t = 10t: the trend term must pull forecasts toward the
        slope — mean absolute forecast error over the last half of the
        series beats the naive same-season baseline (error 40/step)."""
        from data_misc_tools_spark.operators.temporal import (
            holt_winters_smooth,
        )

        df = spark.createDataFrame(
            [(i, 10 * i) for i in range(40)], "o long, x long"
        )
        rows = holt_winters_smooth(
            df, "o", "x", season=4, beta_permille=300
        ).collect()
        tail = rows[len(rows) // 2:]
        mae = sum(abs(r["fcast"] - r["x"]) for r in tail) / len(tail)
        assert mae < 40, mae

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import (
            holt_winters_smooth,
        )

        df = spark.createDataFrame([(i, i) for i in range(6)], "o long, x long")
        with _pytest.raises(ValueError, match="season"):
            holt_winters_smooth(df, "o", "x", season=1)
        with _pytest.raises(ValueError, match="full season"):
            holt_winters_smooth(df, "o", "x", season=6)
        with _pytest.raises(ValueError, match="permille"):
            holt_winters_smooth(df, "o", "x", season=3, alpha_permille=0)
        with _pytest.raises(ValueError, match="max_rows"):
            holt_winters_smooth(df, "o", "x", season=3, max_rows=4)


class TestHoltSmooth:
    @staticmethod
    def _tdiv(num, den):
        q = abs(num) // den
        return q if num >= 0 else -q

    def test_matches_python_recursion_with_negative_trends(self, spark):
        """A crashing-then-recovering series forces NEGATIVE trend
        numerators — the trunc-vs-floor divergence case the emitter
        must handle (DuckDB // and Spark div truncate; python //
        floors)."""
        import random

        from data_misc_tools_spark.operators.temporal import holt_smooth

        rng = random.Random(11)
        vals = [10_000 - 400 * i for i in range(30)]  # steep decline
        vals += [rng.randrange(0, 20_000) for _ in range(170)]
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "o long, x long")
        a, bb = 300, 200
        lvl, trd = rows[0][1], rows[1][1] - rows[0][1]
        ref = {rows[0][0]: (lvl, trd, None)}
        for o, x in rows[1:]:
            fc = lvl + trd
            lp = lvl
            lvl = self._tdiv(2 * (a * x + (1000 - a) * (lp + trd)) + 1000, 2000)
            trd = self._tdiv(2 * (bb * (lvl - lp) + (1000 - bb) * trd) + 1000, 2000)
            ref[o] = (lvl, trd, fc)
        got = holt_smooth(df, "o", "x", a, bb).collect()
        assert len(got) == len(rows)
        saw_negative = False
        for r in got:
            lv, t, f = ref[r["o"]]
            assert (r["level"], r["trend"], r["fcast"]) == (lv, t, f), r["o"]
            saw_negative = saw_negative or t < 0
        assert saw_negative  # the fixture actually exercised the case

    def test_perfect_line_is_tracked_exactly(self, spark):
        """On x_t = c + d·t the level equals x and the trend equals d
        at every step (both updates are exact there), so the one-step
        forecast is exact from t=2 on."""
        from data_misc_tools_spark.operators.temporal import holt_smooth

        rows = [(i, 100 + 7 * i) for i in range(50)]
        df = spark.createDataFrame(rows, "o long, x long")
        for r in holt_smooth(df, "o", "x").collect():
            assert r["level"] == 100 + 7 * r["o"]
            assert r["trend"] == 7
            if r["o"] > 0:
                assert r["fcast"] == 100 + 7 * r["o"]

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import holt_smooth

        df1 = spark.createDataFrame([(1, 5)], "o long, x long")
        with _pytest.raises(ValueError, match="at least 2"):
            holt_smooth(df1, "o", "x")
        df = spark.createDataFrame([(i, i) for i in range(10)], "o long, x long")
        with _pytest.raises(ValueError, match="permille"):
            holt_smooth(df, "o", "x", alpha_permille=0)
        with _pytest.raises(ValueError, match="max_rows"):
            holt_smooth(df, "o", "x", max_rows=5)


class TestSeasonalNaiveBacktest:
    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.temporal import (
            seasonal_naive_backtest,
        )

        rng = random.Random(59)
        rows = [(i, rng.randrange(0, 10_000)) for i in range(60)
                if rng.random() > 0.1]  # calendar gaps drop out
        df = spark.createDataFrame(rows, "o long, x long")
        vals = dict(rows)
        errs = sorted(
            abs(x - vals[o - 7]) for o, x in rows if o - 7 in vals
        )
        xs = [abs(x) for o, x in rows if o - 7 in vals]
        r = seasonal_naive_backtest(df, "o", "x", 7).collect()[0]
        assert r["n_scored"] == len(errs)
        se = sum(errs)
        assert r["mae_e2"] == (2 * 100 * se + len(errs)) // (2 * len(errs))
        assert r["wape_e6"] == (2 * 1_000_000 * se + sum(xs)) // (2 * sum(xs))
        # lower median: smallest e with 2*cum >= n
        cum = 0
        for e in errs:
            cum += 1
            if 2 * cum >= len(errs):
                assert r["medae"] == e
                break

    def test_perfect_seasonality_zero_error(self, spark):
        from data_misc_tools_spark.operators.temporal import (
            seasonal_naive_backtest,
        )

        rows = [(i, 100 + (i % 7) * 10) for i in range(28)]
        df = spark.createDataFrame(rows, "o long, x long")
        r = seasonal_naive_backtest(df, "o", "x", 7).collect()[0]
        assert r["mae_e2"] == 0 and r["medae"] == 0 and r["wape_e6"] == 0
        assert r["n_scored"] == 21

    def test_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import (
            seasonal_naive_backtest,
        )

        df = spark.createDataFrame([(1, 1)], "o long, x long")
        with _pytest.raises(ValueError):
            seasonal_naive_backtest(df, "o", "x", 0)


class TestMarkovRemovalAttribution:
    """temporal.markov_removal_attribution — removal-effect chains."""

    @staticmethod
    def _events(spark, journeys):
        """journeys: list of channel-name lists; 'P' converts."""
        rows = []
        eid = 0
        for u, j in enumerate(journeys):
            for t, c in enumerate(j):
                rows.append((u, "purchase" if c == "P" else c, t * 1000, eid))
                eid += 1
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts long, event_id long"
        )

    def test_journey_transitions_counts(self, spark):
        from data_misc_tools_spark.operators.temporal import (
            journey_transitions,
        )

        e = self._events(spark, [["a", "b", "P"], ["a"], ["b", "b", "P", "a"]])
        got = {
            (r.src, r.dst): r.n
            for r in journey_transitions(e, ts_col="ts").collect()
        }
        # user 2's trailing 'a' after the first purchase is DROPPED
        assert got == {
            ("__start", "a"): 2,
            ("__start", "b"): 1,
            ("a", "b"): 1,
            ("b", "__conv"): 2,
            ("a", "__null"): 1,
            ("b", "b"): 1,
        }

    def test_exclusive_converter_takes_all_credit(self, spark):
        from data_misc_tools_spark.operators.temporal import (
            markov_removal_attribution,
        )

        # 'a' appears on every converting path; 'b' only on dead ends
        e = self._events(
            spark, [["a", "P"], ["a", "P"], ["b"], ["b"]]
        )
        got = {
            r.channel: r for r in markov_removal_attribution(e).collect()
        }
        assert got["a"].attribution_e6 == 1_000_000
        assert got["b"].attribution_e6 == 0
        assert got["a"].f_removed_e6 == 0  # removing a kills conversion

    def test_symmetric_channels_split_evenly(self, spark):
        from data_misc_tools_spark.operators.temporal import (
            markov_removal_attribution,
        )

        e = self._events(
            spark, [["a", "P"], ["b", "P"], ["a"], ["b"]]
        )
        got = {
            r.channel: r.attribution_e6
            for r in markov_removal_attribution(e).collect()
        }
        assert got["a"] == got["b"] == 500_000

    def test_attribution_sums_to_e6(self, spark, sf_dir):
        from data_misc_tools_spark.operators.temporal import (
            markov_removal_attribution,
        )
        from data_misc_tools_spark.session import load_tables

        e = load_tables(spark, sf_dir, ["events"])["events"]
        rows = markov_removal_attribution(e).collect()
        total = sum(r.attribution_e6 for r in rows)
        assert abs(total - 1_000_000) <= len(rows)  # half-up residue
        assert all(0 <= r.removal_e6 <= 1_000_000 for r in rows)

    def test_max_states_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import (
            markov_removal_attribution,
        )

        e = self._events(spark, [[f"c{i}"] for i in range(30)])
        with _pytest.raises(ValueError, match="max_states"):
            markov_removal_attribution(e, max_states=8)


class TestCrostonSmooth:
    def test_python_reference_recursion(self, spark):
        from data_misc_tools_spark.operators.temporal import croston_smooth

        # demands on days 0, 3, 4, 10 (intervals 1, 3, 1, 6)
        rows = [(0, 4), (3, 2), (4, 6), (10, 3)]
        df = spark.createDataFrame(rows, "day long, n long")
        got = [
            (r.o, r.x, r.interval, r.z_e3, r.p_e3, r.fcast_e3)
            for r in croston_smooth(
                df, "day", "n", alpha_permille=200
            ).orderBy("o").collect()
        ]

        def halfup(num, den):
            return (2 * num + den) // (2 * den)

        z, p = 4000, 1000
        want = [(0, 4, 1, 4000, 1000, halfup(1000 * 4000, 1000))]
        prev = 0
        for o, x in rows[1:]:
            iv = o - prev
            z = halfup(200 * 1000 * x + 800 * z, 1000)
            p = halfup(200 * 1000 * iv + 800 * p, 1000)
            want.append((o, x, iv, z, p, halfup(1000 * z, p)))
            prev = o
        assert got == want

    def test_constant_demand_fixed_point(self, spark):
        """Constant size 5 every 2 periods: z -> 5000, p -> 2000,
        forecast -> 2500 (2.5 demand/period... per-period rate 5/2)."""
        from data_misc_tools_spark.operators.temporal import croston_smooth

        rows = [(2 * i, 5) for i in range(40)]
        df = spark.createDataFrame(rows, "day long, n long")
        last = croston_smooth(df, "day", "n", alpha_permille=300).orderBy(
            "o"
        ).collect()[-1]
        assert last.z_e3 == 5000
        # p approaches 2000 from below (init interval is 1 by
        # convention); the e3 half-up quantization can pin it one
        # grid point short — a documented property, not drift
        assert last.p_e3 in (1999, 2000)
        assert abs(last.fcast_e3 - 2500) <= 2

    def test_zero_rows_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.temporal import croston_smooth

        df = spark.createDataFrame([(1, 0)], "day long, n long")
        with _pytest.raises(ValueError, match="non-zero demand"):
            croston_smooth(df, "day", "n")

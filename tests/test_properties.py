"""Property-based tests (hypothesis) for the pure-Python components."""

from hypothesis import given, settings
from hypothesis import strategies as st

from data_misc_tools_spark.functions.scalar import _py_url_encode
from data_misc_tools_spark.operators.kafka import _to_millis
from data_misc_tools_spark.operators.zookeeper import merge_paths
from data_misc_tools_spark.plans.sql_script import split_sql_statements
from data_misc_tools_spark.runner import parse_iso_duration

# statements free of quote/comment/semicolon machinery
_plain = st.text(
    alphabet=st.characters(
        blacklist_characters=";'\"#-/!\\", blacklist_categories=("Cs",)
    ),
    min_size=1,
).filter(lambda s: s.strip())


@given(st.lists(_plain, min_size=1, max_size=8))
@settings(max_examples=200)
def test_split_inverts_join_for_plain_statements(stmts):
    script = ";".join(stmts) + ";"
    assert split_sql_statements(script) == [s.strip() for s in stmts if s.strip()]


@given(_plain)
@settings(max_examples=200)
def test_quoted_semicolons_never_split(s):
    body = s.replace("'", "")
    script = f"select '{body};{body}' as x;"
    out = split_sql_statements(script)
    assert len(out) == 1
    assert f"{body};{body}" in out[0]


@given(st.lists(st.sampled_from(["/a", "/a/b", "/a/b/c", "/ab", "/x", "/x/y", "/"]),
                min_size=1, max_size=7))
@settings(max_examples=200)
def test_merge_paths_properties(paths):
    merged = merge_paths(paths)
    # no element is a descendant of another
    for p in merged:
        for q in merged:
            if p != q:
                assert not p.startswith(q + "/") and (q != "/" or p == "/")
    # every input is covered by some kept ancestor-or-self
    for p in paths:
        norm = p.rstrip("/") or "/"
        assert any(norm == m or norm.startswith(m + "/") or m == "/" for m in merged)


@given(st.text(max_size=50))
@settings(max_examples=300)
def test_url_encode_roundtrip(s):
    from urllib.parse import unquote_plus

    assert unquote_plus(_py_url_encode(s)) == s


@given(st.integers(min_value=0, max_value=4_102_444_800))
@settings(max_examples=200)
def test_to_millis_roundtrip_seconds(epoch):
    from datetime import datetime, timezone

    s = datetime.fromtimestamp(epoch, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    assert _to_millis(s) == epoch * 1000


@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=0, max_value=59))
@settings(max_examples=100)
def test_iso_duration_composition(hours, minutes):
    assert parse_iso_duration(f"PT{hours}H{minutes}M") == hours * 3600 + minutes * 60


class _MiniState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


@given(
    st.lists(st.sampled_from(["view", "click", "purchase", "noise"]),
             min_size=0, max_size=24),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_funnel_state_machine_is_batch_split_invariant(types, data):
    """Folding an in-order event stream through ANY micro-batch
    partitioning must equal folding it in one batch — the property
    that makes the streaming funnel replay-equal to the batch
    operator."""
    import pandas as pd

    from data_misc_tools_spark.streaming.stateful import _funnel_fn

    events = [
        (pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i), y)
        for i, y in enumerate(types)
    ]

    def run(batches):
        fn = _funnel_fn(["view", "click", "purchase"])
        state = _MiniState()
        rows = []
        for b in batches:
            pdf = pd.DataFrame(
                {"ts": [t for t, _ in b], "event_type": [y for _, y in b]}
            )
            for out in fn((1,), iter([pdf]), state):
                rows.extend(map(tuple, out[["stage", "at"]].values))
        return state.get, rows

    # arbitrary in-order split points
    cuts = sorted(
        data.draw(
            st.lists(st.integers(0, len(events)), max_size=4), label="cuts"
        )
    )
    parts, prev = [], 0
    for c in cuts + [len(events)]:
        parts.append(events[prev:c])
        prev = c
    split_state, split_rows = run([p for p in parts if p])
    one_state, one_rows = run([events] if events else [])
    assert split_state == one_state
    assert split_rows == one_rows


@given(
    st.integers(min_value=0, max_value=10**18),
    st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=500)
def test_half_up_integer_pattern_matches_fraction_rounding(a, b):
    """The repo-wide engine-portable rounding idiom: (2A + B) div (2B)
    must equal round-half-up(A/B) EXACTLY — pinned against exact
    Fraction arithmetic, since every oracle-checked ratio (q1 shares,
    stationary mass routing, pagerank, kmeans centroids, nDCG) leans
    on this identity."""
    from fractions import Fraction

    got = (2 * a + b) // (2 * b)
    frac = Fraction(a, b)
    whole = frac.numerator // frac.denominator
    want = whole + (1 if frac - whole >= Fraction(1, 2) else 0)
    assert got == want


@given(st.integers(min_value=1, max_value=100_000))
@settings(max_examples=500)
def test_exact_split_rank_cut_boundaries_partition_every_n(n):
    """exact_stratified_split's 80/10/10 rank-cut boundaries must
    partition any stratum size exactly, with each bucket within one
    item of its target proportion."""
    b80 = n * 80 // 100
    b90 = n * 90 // 100
    counts = (b80, b90 - b80, n - b90)
    assert sum(counts) == n
    assert all(c >= 0 for c in counts)
    assert abs(counts[0] - 0.8 * n) < 1
    assert abs(counts[1] - 0.1 * n) < 1
    assert abs(counts[2] - 0.1 * n) <= 1  # takes both remainders


def test_theil_sen_ignores_outliers(spark):
    from data_misc_tools_spark.operators.profile import theil_sen_slope

    # perfect trend y = 10x + spike at x=5
    rows = [(x, 10 * x if x != 5 else 100000) for x in range(11)]
    df = spark.createDataFrame(rows, "x int, y int")
    r = theil_sen_slope(df, "x", "y").collect()[0]
    assert r.n_pairs == 55
    assert r.slope == 10.0  # the outlier's 10 pair-slopes are outvoted
    # python reference on a scrambled series: exact lower median
    import itertools

    rows = [(0, 7), (1, 3), (2, 9), (4, 1), (7, 8)]
    slopes = sorted(
        ((y2 - y1) / (x2 - x1), x1, x2)
        for (x1, y1), (x2, y2) in itertools.combinations(rows, 2)
    )
    want = slopes[(len(slopes) + 1) // 2 - 1]
    df = spark.createDataFrame(rows, "x int, y int")
    r = theil_sen_slope(df, "x", "y").collect()[0]
    assert (r.slope, r.x1, r.x2) == want


def test_benford_first_digit_audit(spark):
    from data_misc_tools_spark.operators.profile import (
        _BENFORD_E6,
        benford_first_digit,
    )

    assert sum(_BENFORD_E6.values()) == 1_000_000
    # a perfect Benford sample: counts proportional to the e6 shares
    rows = [
        (float(d * 10 ** (i % 3)),)
        for d, share in _BENFORD_E6.items()
        for i in range(share // 45757)
    ]
    df = spark.createDataFrame(rows, "v double")
    out = {r.digit: r for r in benford_first_digit(df, "v", scale=1).collect()}
    assert set(out) == set(range(1, 10))
    n = sum(r.n_obs for r in out.values())
    assert all(out[d].n_total == n for d in out)
    # python reference for every chi2 term
    for d, r in out.items():
        a = 1_000_000 * r.n_obs - n * _BENFORD_E6[d]
        assert r.chi2_term == (a * a) / (1_000_000 * n * _BENFORD_E6[d])
    # a constant column concentrates all mass on one digit: its term
    # dominates and zero-observation digits still carry penalty rows
    flat = spark.createDataFrame([(5.0,)] * 100, "v double")
    out2 = {r.digit: r for r in benford_first_digit(flat, "v").collect()}
    assert out2[5].n_obs == 100 and out2[1].n_obs == 0
    assert out2[5].chi2_term > out2[1].chi2_term > 0


def test_cuped_report_matches_numpy_and_reduces_variance(spark):
    import numpy as np

    from data_misc_tools_spark.operators.profile import cuped_report

    rng = np.random.RandomState(5)
    x = rng.randint(0, 1000, 200)
    y = (3 * x + rng.randint(0, 500, 200)).astype(np.int64)  # correlated
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x long, y long"
    )
    r = cuped_report(df, "x", "y").collect()[0]
    n = len(x)
    dxx = n * int((x.astype(object) ** 2).sum()) - int(x.sum()) ** 2
    dyy = n * int((y.astype(object) ** 2).sum()) - int(y.sum()) ** 2
    dxy = n * int((x.astype(object) * y).sum()) - int(x.sum()) * int(y.sum())
    assert r.n_rows == n
    # the engines convert each exact side to double FIRST, then divide
    assert r.theta == float(dxy) / float(dxx)
    assert r.var_y == float(dyy) / float(n * n)
    assert r.var_y_adj == float(dxx * dyy - dxy * dxy) / float(n * n * dxx)
    assert r.r2 == float(dxy * dxy) / float(dxx * dyy)
    # strongly correlated covariate -> big reduction
    assert r.var_y_adj < 0.2 * r.var_y
    # identity: var_y_adj = var_y * (1 - r2) up to IEEE ulps
    assert abs(r.var_y_adj - r.var_y * (1 - r.r2)) < 1e-6 * r.var_y
    # zero-variance covariate -> NULL theta, var_y intact
    flat = spark.createDataFrame([(7, i) for i in range(10)], "x long, y long")
    r0 = cuped_report(flat, "x", "y").collect()[0]
    assert r0.theta is None and r0.var_y is not None


def test_mann_kendall_detects_monotone_trend(spark):
    import math

    from data_misc_tools_spark.operators.profile import mann_kendall_test

    # strictly increasing: S = n(n-1)/2, max z
    up = spark.createDataFrame([(i, 10 * i) for i in range(20)], "x int, y int")
    r = mann_kendall_test(up, "x", "y").collect()[0]
    n = 20
    assert (r.n_points, r.s_stat) == (n, n * (n - 1) // 2)
    var = n * (n - 1) * (2 * n + 5) / 18
    assert r.z_stat == (r.s_stat - 1) / math.sqrt(var)
    assert r.z_stat > 1.96
    # scrambled python reference with ties
    import itertools

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = spark.createDataFrame(list(enumerate(vals)), "x int, y int")
    s = sum(
        (a < b) - (a > b)
        for (i, a), (j, b) in itertools.combinations(enumerate(vals), 2)
    )
    from collections import Counter

    tt = sum(t * (t - 1) * (2 * t + 5) for t in Counter(vals).values())
    m = len(vals)
    var = (m * (m - 1) * (2 * m + 5) - tt) / 18
    want_z = 0.0 if s == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(var)
    r = mann_kendall_test(df, "x", "y").collect()[0]
    assert (r.s_stat, r.z_stat) == (s, want_z)
    # constant series: zero variance -> NULL
    flat = spark.createDataFrame([(i, 7) for i in range(5)], "x int, y int")
    assert mann_kendall_test(flat, "x", "y").collect()[0].z_stat is None


def test_kaplan_meier_matches_python_reference(spark):
    import math
    from collections import Counter

    from data_misc_tools_spark.operators.profile import kaplan_meier

    # (duration, event): observed deaths + right-censored spells
    spells = [
        (1, 1), (1, 1), (1, 0), (2, 1), (3, 0), (3, 1), (3, 1),
        (5, 1), (5, 0), (7, 0), (7, 1), (9, 0), (9, 0), (12, 1),
    ]
    df = spark.createDataFrame(spells, "duration int, event int")
    got = {r.duration: r for r in kaplan_meier(df).collect()}

    deaths = Counter(d for d, e in spells if e == 1)
    cens = Counter(d for d, e in spells if e == 0)
    durs = sorted(set(d for d, _ in spells))
    log_s = 0
    absorbed = False
    for t in durs:
        n_risk = sum(deaths[u] + cens[u] for u in durs if u >= t)
        d = deaths[t]
        if d and d == n_risk:
            absorbed = True  # survival hits exactly 0 -> log undefined
        elif d:
            log_s += round(math.log((n_risk - d) / n_risk) * 1e6)
        r = got[t]
        assert (r.n_risk, r.n_event, r.n_censored) == (n_risk, d, cens[t])
        assert r.log_surv_e6 == (None if absorbed else log_s)
    assert set(got) == set(durs) and len(got) == len(durs)
    # survival recoverable and monotone nonincreasing (pre-absorption)
    surv = [
        math.exp(got[t].log_surv_e6 / 1e6)
        for t in durs
        if got[t].log_surv_e6 is not None
    ]
    assert surv and all(a >= b for a, b in zip(surv, surv[1:]))

    # absorbing time (everyone dies at t=4): S hits exactly 0 ->
    # log_surv NULL from that row on
    ab = spark.createDataFrame(
        [(2, 1), (2, 0), (4, 1), (4, 1)], "duration int, event int"
    )
    rows = {r.duration: r for r in kaplan_meier(ab).collect()}
    assert rows[2].log_surv_e6 == round(math.log(3 / 4) * 1e6)
    assert rows[4].log_surv_e6 is None and rows[4].n_risk == 2


def test_inclusion_deps_matches_set_semantics(spark):
    from data_misc_tools_spark.operators.profile import inclusion_deps

    a = spark.createDataFrame([(1,), (2,), (3,), (None,)], "x int")
    b = spark.createDataFrame([(1,), (2,), (3,), (4,), (4,)], "y int")
    c = spark.createDataFrame([(2,), (3,), (9,)], "z int")
    got = {
        (r.from_col, r.to_col): r
        for r in inclusion_deps([("a.x", a, "x"), ("b.y", b, "y"), ("c.z", c, "z")]).collect()
    }
    sets = {"a.x": {1, 2, 3}, "b.y": {1, 2, 3, 4}, "c.z": {2, 3, 9}}
    assert len(got) == 6
    for (fa, fb), r in got.items():
        sa, sb = sets[fa], sets[fb]
        assert r.n_from == len(sa)
        assert r.n_overlap == len(sa & sb)
        assert r.contained is (sa <= sb)
    # NULLs excluded: a.x ⊆ b.y despite the NULL row
    assert got[("a.x", "b.y")].contained
    assert not got[("b.y", "a.x")].contained

    import pytest as _pytest

    with _pytest.raises(ValueError):
        inclusion_deps([("only", a, "x")])
    with _pytest.raises(ValueError):
        inclusion_deps([("dup", a, "x"), ("dup", b, "y")])


def test_logrank_matches_python_reference_and_detects_separation(spark):
    import math

    from data_misc_tools_spark.operators.profile import logrank_test

    # group 1 fails early, group 0 late -> strong positive z
    rows = [
        (1, 1, 1), (2, 1, 1), (2, 1, 1), (3, 0, 1), (4, 1, 1),
        (6, 0, 0), (8, 1, 0), (9, 1, 0), (10, 0, 0), (12, 1, 0),
    ]
    df = spark.createDataFrame(rows, "duration int, event int, group int")
    r = logrank_test(df).collect()[0]

    def half_up(a, b):
        return (2 * a + b) // (2 * b)

    per = {}
    for t, e, g in rows:
        d1, d, a1, a = per.get(t, (0, 0, 0, 0))
        per[t] = (d1 + e * g, d + e, a1 + g, a + 1)
    N, N1 = len(rows), sum(g for _, _, g in rows)
    o1 = e1 = v = cum_a = cum_a1 = 0
    for t in sorted(per):
        d1, d, a1, a = per[t]
        cum_a, cum_a1 = cum_a + a, cum_a1 + a1
        n, n1 = N - cum_a + a, N1 - cum_a1 + a1
        if d > 0:
            o1 += d1
            e1 += half_up(1000000 * d * n1, n)
            r1 = half_up(1000000 * n1 * (n - n1), n * n)
            v += half_up(d * (n - d) * r1, n - 1) if n > 1 else 0
    assert (r.n_spells, r.n_group1, r.o1) == (N, N1, o1)
    assert (r.e1, r.v) == (e1 / 1e6, v / 1e6)
    assert r.z == (o1 * 1000000 - e1) / math.sqrt(v * 1e6)
    assert r.z > 1.96  # the separation is real

    # swapped labels flip the sign (same |z| up to per-term rounding)
    sw = spark.createDataFrame(
        [(t, e, 1 - g) for t, e, g in rows], "duration int, event int, group int"
    )
    r2 = logrank_test(sw).collect()[0]
    assert r2.z < -1.96 and abs(abs(r2.z) - abs(r.z)) < 1e-3

    # e6 definition tracks the unrounded textbook statistic closely
    ee = vv = 0.0
    cum_a = cum_a1 = 0
    for t in sorted(per):
        d1, d, a1, a = per[t]
        cum_a, cum_a1 = cum_a + a, cum_a1 + a1
        n, n1 = N - cum_a + a, N1 - cum_a1 + a1
        if d > 0:
            ee += d * n1 / n
            if n > 1:
                vv += d * (n - d) * n1 * (n - n1) / (n * n * (n - 1))
    assert abs(r.z - (o1 - ee) / math.sqrt(vv)) < 1e-4

    # degenerate: everyone in one group -> zero variance -> NULL z
    one = spark.createDataFrame(
        [(t, e, 1) for t, e, _ in rows], "duration int, event int, group int"
    )
    assert logrank_test(one).collect()[0].z is None

"""Table profiler: per-column statistics in one scan.

The data-quality pass every large-scale ingest runs before training:
null ratios, cardinalities, and value ranges per column, as a
DataFrame (one row per column) so drift checks can diff profiles
across dataset versions.

Shape: ONE aggregate over the table computes every statistic as a
single wide row (Catalyst evaluates all aggregates in one pass over
the scan; the distinct counts add an Expand but no extra scan), then
``stack`` unpivots driver-free to a row per column. For 100 TB runs
set ``exact_distinct=False`` — approx_count_distinct (HLL++) keeps
the distinct-count state bounded instead of shuffling every value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_misc_tools_spark.session import local_df


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Output: (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)
    — min/max cast to string AFTER aggregation so numeric ordering is
    preserved and the output schema is column-type-independent.
    """
    cols = columns or df.columns
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.extend(
            [
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
                distinct(c).alias(f"__dist_{c}"),
                F.min(c).cast("string").alias(f"__min_{c}"),
                F.max(c).cast("string").alias(f"__max_{c}"),
            ]
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_val, max_val)",
        "__n AS n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Re-identification risk report over quasi-identifier columns.

    Groups the table by the quasi-identifier combination and reports
    each equivalence class's size plus an ``at_risk`` flag (size < k —
    the k-anonymity criterion: any record in a class smaller than k is
    re-identifiable by linking on the quasi identifiers). With
    ``sensitive_col`` the report adds ``l_diversity``, the number of
    distinct sensitive values in the class — a class can be k-anonymous
    yet leak the sensitive attribute outright when l = 1.

    The release-gate pass a privacy-scrubbed training corpus needs
    before export. Scale: ONE hash aggregate shuffled on the quasi
    keys (map-side combined); the distinct count is state-bounded per
    class, no second scan, no window.

    Output: (*quasi_cols, class_size, at_risk[, l_diversity]).
    """
    aggs = [F.count("*").alias("class_size")]
    tail = []
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("l_diversity"))
        tail = ["l_diversity"]
    return (
        df.groupBy(*quasi_cols)
        .agg(*aggs)
        .select(
            *quasi_cols,
            "class_size",
            (F.col("class_size") < F.lit(k)).alias("at_risk"),
            *tail,
        )
    )


def pearson_exact(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """Per-group Pearson correlation with an engine-portable result.

    ``corr()`` is a classic oracle trap: both engines accumulate
    centered doubles in engine-specific order, so the last bits differ.
    Here the inputs are fixed-point decimals (x·x_scale and y·y_scale
    are integers, e.g. cents), so every sufficient statistic
    (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT integer — accumulated as
    decimal(38,0), which is order-independent. The single float step
    is the closed form num/(√dxx·√dyy) over those exact integers:
    int→double conversion, sqrt, multiply and divide are all IEEE
    correctly-rounded, so two engines computing the same formula over
    the same integers produce the bit-identical double, emitted
    UNROUNDED (CLAUDE.md rounding invariant).

    Scale: one map-side-combined hash aggregate; decimal(38,0) partials
    are 16 bytes each — the same shuffle shape as a plain sum. Groups
    with zero variance yield null (0/0).

    Output: (*group_cols, n_rows, corr).
    """
    dec = "decimal(38,0)"
    x = F.round(F.col(x_col) * F.lit(x_scale)).cast(dec)
    y = F.round(F.col(y_col) * F.lit(y_scale)).cast(dec)
    g = (
        df.select(*group_cols, x.alias("__x"), y.alias("__y"))
        .groupBy(*group_cols)
        .agg(
            F.count("*").cast(dec).alias("__n"),
            F.sum("__x").alias("__sx"),
            F.sum("__y").alias("__sy"),
            F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
            F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
            F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        )
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    dxx = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    dyy = (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    return g.select(
        *group_cols,
        F.col("__n").cast("long").alias("n_rows"),
        # try_divide: zero-variance groups are null, not an ANSI error
        F.try_divide(num, F.sqrt(dxx) * F.sqrt(dyy)).alias("corr"),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Brown–Forsythe variance-equality test (Brown & Forsythe 1974;
    Levene's test with the MEDIAN center, the robust form): one-way
    ANOVA F on the absolute deviations z = |x − median_group| — "do
    these groups differ in SPREAD", the homogeneity gate to run
    before trusting a means test, robust where classic Bartlett
    shatters on heavy tails. Completes the battery: welch (means),
    kruskal (locations, rank), THIS (scales).

    Exact-integer route: per-group lower medians come off a
    group-partitioned value-census cumsum (the mad_outlier order
    statistic); deviations are exact integers; each group's
    between-term S_g²/n_g exits as ONE half-up e6 integer (per-group
    rows — the kruskal convention), so B = Σ b_term_e6 is an exact
    integer sum, num_e6 = B − e6·S²/N and den_e6 = e6·ΣQ − B are
    exact integers, and F = ((N−k)·num)/((k−1)·den) is ONE IEEE
    division — emitted UNROUNDED, bit-identical across engines.
    Degenerate inputs (k < 2 or zero within-group spread) yield F
    NULL via try_divide/guards.

    Scale shape: one (group, value) census with group-partitioned
    cumsums (parallel over groups), medians broadcast back, one
    deviation aggregate, k-row arithmetic. Output: one row per group
    — (group, n_g, median_scaled, b_term_e6, f_stat) with f_stat
    repeated (the mad convention), ordered by group.
    """
    from pyspark.sql.window import Window

    dec = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("g"),
        F.round(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("x"),
    )
    census = base.groupBy("g", "x").agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.partitionBy("g").orderBy("x")
    cum = census.withColumn("cum", F.sum("c").over(w))
    ngs = census.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    # the k-row medians feed the deviation pass AND the final join;
    # the k-row terms feed the totals AND the final join — checkpoint
    # both bounded frames or each reference replays the census scan
    med = (
        cum.join(F.broadcast(ngs), "g")
        .filter(F.col("cum") >= F.expr("(n_g + 1) div 2"))
        .groupBy("g")
        .agg(F.min("x").alias("med"), F.first("n_g").alias("n_g"))
    ).localCheckpoint()
    z = base.join(F.broadcast(med.select("g", "med")), "g").select(
        "g", F.abs(F.col("x") - F.col("med")).alias("z")
    )
    stats = z.groupBy("g").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(F.col("z").cast(dec)).alias("s"),
        F.sum(F.col("z").cast(dec) * F.col("z")).alias("q"),
    )
    terms = stats.selectExpr(
        "g", "n_g", "s", "q",
        "cast((2 * 1000000 * s * s + n_g) div (2 * n_g) as decimal(38,0))"
        " AS b_term",
    ).localCheckpoint()
    tot = terms.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast(dec).alias("nn"),
        F.sum("s").cast(dec).alias("s_tot"),
        F.sum("q").cast(dec).alias("q_tot"),
        F.sum("b_term").cast(dec).alias("b"),
    ).selectExpr(
        "k", "nn", "q_tot", "b",
        "cast((2 * 1000000 * s_tot * s_tot + nn) div (2 * nn) "
        "as decimal(38,0)) AS grand_e6",
    )
    med_out = med.selectExpr("g", "med AS median_scaled")
    return (
        terms.join(F.broadcast(med_out), "g")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "g AS group", "n_g", "median_scaled",
            "cast(b_term as long) AS b_term_e6",
            # den can go epsilon-NEGATIVE on zero within-spread (B's
            # half-up terms overshoot e6*Q by <= k/2): guard > 0, not
            # just != 0, so the degenerate case is NULL, not a huge
            # negative F. num has the mirror problem on zero BETWEEN-
            # group spread (b - grand_e6 in [-k/2, k/2] micro-units):
            # clamp at 0 so F stays in range (ADVICE r8)
            """CASE WHEN k >= 2 AND 1000000 * q_tot - b > 0 THEN
                 cast((nn - k) * greatest(b - grand_e6,
                                          cast(0 as decimal(38,0))) as double)
                 / cast((k - 1) * (1000000 * q_tot - b) as double)
               END AS f_stat""",
        )
        .orderBy("group")
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Kruskal–Wallis H (Kruskal & Wallis 1952) — Mann–Whitney's
    k-group extension: "do ANY of these groups' distributions sit
    higher than the others", rank-based, outlier-robust, the test to
    run before k·(k−1)/2 pairwise U tests. H ~ χ²(k−1) under H0.

    Exact-integer route (the spearman doubled-rank trick): tied
    average ranks double to integers (2·avgrank = 2·prefix + c + 1),
    so per-group doubled rank sums R2_g, N, and the tie term
    T = Σ(t³−t) are exact decimal(38,0) integers. Every per-group H
    contribution h_g = 3·R2_g²/(N(N+1)·n_g) is ONE half-up e6
    integer (per-group rows, the benford no-float-sum-order rule);
    h_e6 = Σ h_term_e6 − 3(N+1)·1e6 is then an EXACT integer sum
    (error ≤ k/2 micro-units), and the tie correction
    H/(1 − T/(N³−N)) = H·(N³−N)/(N³−N−T) is one more half-up integer
    division — no float accumulation exists anywhere. R2² bounds the
    path at ~1e9 rows (decimal38); beyond that Spark raises rather
    than mis-reporting. All-tied inputs yield NULL h values.

    Scale shape: one (group, value) census + one pooled value census
    with a range-partitioned prefix sum (global_cumsum — never a
    single-reducer window), a value-keyed join, then k-row
    arithmetic. Output: one row per group —
    (group, n_g, r2_g, h_term_e6, h_e6, h_corr_e6) — h_e6/h_corr_e6
    repeated per row (the mad_outlier convention), ordered by group.
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    dec = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("g"),
        F.round(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("v"),
    )
    cells = base.groupBy("g", "v").agg(
        F.count("*").cast("long").alias("cg")
    )
    pooled = base.groupBy("v").agg(F.count("*").cast("long").alias("c"))
    # the pooled census feeds the totals AND the rank join: checkpoint
    # the bounded distinct-value frame or both references re-scan
    pooled = global_cumsum(pooled, [F.col("v")], ["c"]).localCheckpoint()
    tots = pooled.agg(
        F.sum("c").cast(dec).alias("nn"),
        F.sum(
            (F.col("c").cast(dec)) * F.col("c") * F.col("c") - F.col("c")
        ).cast(dec).alias("tie_t"),
    )
    r2 = (
        cells.join(
            pooled.selectExpr("v", "c", "cum_c - c AS s"), "v"
        )
        .groupBy("g")
        .agg(
            F.sum("cg").cast("long").alias("n_g"),
            F.sum(
                (F.col("cg").cast(dec))
                * (2 * F.col("s") + F.col("c") + 1)
            ).cast(dec).alias("r2"),
        )
    )
    # the k-row terms frame feeds the hsum aggregate AND the final
    # crossJoin: checkpoint the bounded frame or both references
    # replay the cells census and its events scan (ADVICE r8)
    terms = r2.crossJoin(F.broadcast(tots)).selectExpr(
        "g AS group", "n_g", "cast(r2 as long) AS r2_g", "nn", "tie_t",
        """cast((2 * 1000000 * 3 * r2 * r2
                 + nn * (nn + 1) * n_g)
                div (2 * nn * (nn + 1) * n_g) as long) AS h_term_e6""",
    ).localCheckpoint()
    hsum = terms.agg(
        F.sum("h_term_e6").cast("long").alias("__hs"),
        F.first("nn").alias("__n"),
        F.first("tie_t").alias("__t"),
    ).selectExpr(
        "cast(__hs - 3 * (cast(__n as decimal(38,0)) + 1) * 1000000 "
        "as decimal(38,0)) AS h_num",
        "cast(__n as decimal(38,0)) * __n * __n - __n AS n3n",
        "__t AS tie_t2",
    )
    return (
        terms.crossJoin(F.broadcast(hsum))
        .selectExpr(
            "group", "n_g", "r2_g", "h_term_e6",
            """CASE WHEN n3n - tie_t2 > 0 THEN cast(h_num as long) END
               AS h_e6""",
            """CASE WHEN n3n - tie_t2 > 0 THEN
                 cast((2 * h_num * n3n + (n3n - tie_t2))
                      div (2 * (n3n - tie_t2)) as long)
               END AS h_corr_e6""",
        )
        .orderBy("group")
    )


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    success_col: str,
) -> DataFrame:
    """Cochran–Armitage trend test (Cochran 1954; Armitage 1955) for
    a binary outcome against ORDERED integer scores — the
    dose-response gate the 2×k chi-square can't give: chi-square asks
    "are the rates different anywhere", this asks "do they INCREASE
    with the score", one degree of freedom, far more power against
    monotone alternatives. The monotone-propensity companion to
    mann_kendall (metric trends) and ab_chi_square (2×2).

    Statistic (no continuity/finite-population correction; the exact
    convention is pinned in the docstring formula and tests):

        N·T   = N·Σᵢ wᵢrᵢ − R·Σᵢ wᵢnᵢ                    (exact int)
        N²Var = R·(N−R)·(N·Σnᵢwᵢ² − (Σnᵢwᵢ)²) / N
        z     = N·T / √(N²Var)

    Engine-exact by the pearson_exact template: every Σ is a
    decimal(38,0) integer; z is ONE pinned IEEE chain over their
    double conversions (num / sqrt(prod / N)), emitted UNROUNDED —
    identical bits in both engines. Degenerate inputs (all successes,
    all failures, or a single score level) yield z NULL via
    try_divide.

    Scale shape: one score-keyed aggregate (bounded score levels)
    plus one 1-row reduction. Output: one row — (k_levels, n_total,
    r_total, num, z).
    """
    dec = "decimal(38,0)"
    base = df.select(
        F.col(score_col).cast("long").alias("w"),
        F.col(success_col).cast("boolean").cast("long").alias("s"),
    )
    per = base.groupBy("w").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("r"),
    )
    agg = per.agg(
        F.count("*").cast("long").alias("k_levels"),
        F.sum("n").cast(dec).alias("nn"),
        F.sum("r").cast(dec).alias("rr"),
        F.sum(F.col("w").cast(dec) * F.col("r")).alias("swr"),
        F.sum(F.col("w").cast(dec) * F.col("n")).alias("swn"),
        F.sum(F.col("w").cast(dec) * F.col("w") * F.col("n")).alias("sw2n"),
    )
    return agg.selectExpr(
        "k_levels",
        "cast(nn as long) AS n_total",
        "cast(rr as long) AS r_total",
        "cast(nn * swr - rr * swn as long) AS num",
        """try_divide(
             cast(nn * swr - rr * swn as double),
             sqrt(cast(rr * (nn - rr) * (nn * sw2n - swn * swn) as double)
                  / cast(nn as double))
           ) AS z""",
    )


def rmst_report(km: DataFrame, tau: int) -> DataFrame:
    """Restricted mean survival time (Royston & Parmar 2013 for the
    modern case; the estimand is ∫₀^τ S(t)dt) over a
    :func:`kaplan_meier` curve — the EFFECT-SIZE companion the
    KM/log-rank/Nelson-Aalen trio lacks: "expected survival hours
    within the first τ" is a number a product team can act on, and
    unlike the median it exists even when the curve never crosses ½.

    The KM curve is a step function, so the integral is exact given
    the steps: per inter-event interval [tᵢ, min(tᵢ₊₁, τ)) the
    contribution is S(tᵢ)·width, plus the leading [0, t₁) interval at
    S = 1. S(tᵢ) re-materializes from log_surv_e6 as one per-quantity
    e6-rounded exp of the SAME integer in both engines (the e6ln
    idiom's inverse — transcendentals of a shared double don't sit on
    decimal halves); after that every term is an exact integer
    product s_e6 · width. Absorbed curves (log NULL) contribute 0.
    Per-INTERVAL rows are emitted (the benford no-float-sum-order
    rule); Σ rmst_term_e6 / 1e6 is the RMST in duration units.

    The ordered window runs over the KM frame — per-duration rows,
    the bounded-rollup contract (hits/kaplan precedent), never the
    spell table.

    Output: (t_start, t_end, s_e6, rmst_term_e6), zero-width
    intervals dropped, ordered by t_start.
    """
    from pyspark.sql.window import Window

    t = int(tau)
    if t <= 0:
        raise ValueError("tau must be positive")
    w = Window.orderBy("duration")
    steps = (
        km.filter(F.col("duration") < t)
        .select("duration", "log_surv_e6")
        .withColumn(
            "t_end",
            F.least(
                F.coalesce(F.lead("duration").over(w), F.lit(t).cast("long")),
                F.lit(t).cast("long"),
            ),
        )
        .selectExpr(
            "cast(duration as long) AS t_start",
            "t_end",
            "CASE WHEN log_surv_e6 IS NULL THEN 0L "
            "ELSE cast(round(exp(cast(log_surv_e6 as double) / 1e6) * 1e6) "
            "as long) END AS s_e6",
        )
    )
    init = km.agg(
        F.least(F.min("duration").cast("long"), F.lit(t).cast("long")).alias(
            "t_end"
        )
    ).selectExpr("0L AS t_start", "t_end", "cast(1000000 as long) AS s_e6")
    return (
        init.unionByName(steps)
        .filter(F.col("t_end") > F.col("t_start"))
        .selectExpr(
            "t_start", "t_end", "s_e6",
            "s_e6 * (t_end - t_start) AS rmst_term_e6",
        )
        .orderBy("t_start")
    )


def fairness_report(
    df: DataFrame,
    group_col: str,
    label_col: str,
    score_col: str,
    threshold_e6: int,
) -> DataFrame:
    """Per-group classifier fairness counts at a FIXED decision
    threshold (Hardt et al. 2016's equalized-odds quantities;
    Feldman et al. 2015's disparate-impact selection rate) — the gate
    a data-curation filter needs before shipping: a quality/language
    classifier whose selection rate or error rates differ wildly
    across slices silently reshapes the corpus mix.

    Per group: n, n_pos (labeled positive), n_pred (selected at the
    threshold), tp/fp, and the half-up e6 rates — sel_rate (selection
    / demographic-parity quantity), base_rate, tpr and fpr (the
    equalized-odds pair), ppv (calibration-by-group). Groups with an
    empty denominator emit NULL for that rate (a slice with no
    positives has no TPR — surfaced, not dropped).

    Engine-exact by the calibration_report convention: the score
    arrives as an e6 INTEGER in [0, 1e6] (float scores would bucket
    differently at threshold boundaries); every count is exact and
    every rate the integer half-up pattern.

    Scale shape: ONE group-keyed aggregate over one scan. Parity GAPS
    are one tiny self-comparison away downstream; emitting per-group
    rows keeps the operator composable (the benford per-row rule).

    Output: (group, n, n_pos, n_pred, tp, fp, sel_rate_e6,
    base_rate_e6, tpr_e6, fpr_e6, ppv_e6) ordered by group.
    """
    thr = int(threshold_e6)
    base = df.select(
        F.col(group_col).alias("group"),
        F.col(label_col).cast("boolean").alias("y"),
        F.col(score_col).cast("long").alias("s"),
    ).withColumn("pred", F.col("s") >= thr)
    g = base.groupBy("group").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("y").cast("long")).cast("long").alias("n_pos"),
        F.sum(F.col("pred").cast("long")).cast("long").alias("n_pred"),
        F.sum((F.col("pred") & F.col("y")).cast("long"))
        .cast("long")
        .alias("tp"),
        F.sum((F.col("pred") & ~F.col("y")).cast("long"))
        .cast("long")
        .alias("fp"),
    )
    rate = (
        lambda num, den: f"CASE WHEN {den} > 0 THEN "
        f"(2 * 1000000 * {num} + {den}) div (2 * {den}) END"
    )  # noqa: E731
    return g.selectExpr(
        "group", "n", "n_pos", "n_pred", "tp", "fp",
        rate("n_pred", "n") + " AS sel_rate_e6",
        rate("n_pos", "n") + " AS base_rate_e6",
        rate("tp", "n_pos") + " AS tpr_e6",
        rate("fp", "(n - n_pos)") + " AS fpr_e6",
        rate("tp", "n_pred") + " AS ppv_e6",
    ).orderBy("group")


def corr_matrix(
    df: DataFrame,
    cols: list[str],
    scales: list[int] | None = None,
) -> DataFrame:
    """All-pairs Pearson correlation over k fixed-point numeric
    columns from ONE aggregate pass — the profiling matrix beside
    :func:`pearson_exact` (which does one pair): k sums, k squares and
    k·(k−1)/2 cross-products accumulate together as decimal(38,0)
    partials in a single map-side-combined aggregate (one scan, one
    1-row exchange — never k² scans), then every pair's closed form
    is evaluated over the shared single row and exits via one
    explode.

    Engine-exact by the pearson_exact discipline: all sufficient
    statistics are exact integers; the only float step per pair is
    num/(√dxx·√dyy) over int→double conversions — IEEE
    correctly-rounded, so emitted UNROUNDED and still hash-identical
    across engines. Zero-variance pairs yield NULL via try_divide.

    ``k ≤ 16`` (k²/2 aggregate expressions stay bounded metadata).
    Output: (col_a, col_b, n_rows, corr), col_a < col_b by input
    order, ordered by (col_a, col_b).
    """
    k = len(cols)
    if k < 2:
        raise ValueError("need at least two columns")
    if k > 16:
        raise ValueError(f"{k} columns make {k * (k - 1) // 2} pairs — "
                         "bound the column list")
    if scales is None:
        scales = [1] * k
    if len(scales) != k:
        raise ValueError("scales must match cols")
    dec = "decimal(38,0)"
    sel = [
        F.round(F.col(c).cast("double") * F.lit(s)).cast(dec).alias(f"__x{i}")
        for i, (c, s) in enumerate(zip(cols, scales))
    ]
    aggs = [F.count("*").cast(dec).alias("__n")]
    for i in range(k):
        aggs.append(F.sum(F.col(f"__x{i}")).alias(f"__s{i}"))
    for i in range(k):
        for j in range(i, k):
            aggs.append(
                F.sum(F.col(f"__x{i}") * F.col(f"__x{j}")).alias(f"__q{i}_{j}")
            )
    g = df.select(*sel).agg(*aggs)
    n = F.col("__n")
    pairs = []
    for i in range(k):
        for j in range(i + 1, k):
            num = (
                n * F.col(f"__q{i}_{j}") - F.col(f"__s{i}") * F.col(f"__s{j}")
            ).cast("double")
            dxx = (
                n * F.col(f"__q{i}_{i}") - F.col(f"__s{i}") * F.col(f"__s{i}")
            ).cast("double")
            dyy = (
                n * F.col(f"__q{j}_{j}") - F.col(f"__s{j}") * F.col(f"__s{j}")
            ).cast("double")
            pairs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_a"),
                    F.lit(cols[j]).alias("col_b"),
                    n.cast("long").alias("n_rows"),
                    F.try_divide(num, F.sqrt(dxx) * F.sqrt(dyy)).alias("corr"),
                )
            )
    return (
        g.select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.*")
        .orderBy("col_a", "col_b")
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    ordered: bool = True,
    max_values: int = 1000,
) -> DataFrame:
    """t-closeness report (Li, Li & Venkatasubramanian 2007) — the
    gate :func:`k_anonymity`'s l-diversity column can't close: a class
    can hold many DISTINCT sensitive values yet still leak by skew
    (99% of the class in one bucket). t-closeness bounds the distance
    between each equivalence class's sensitive-value distribution and
    the global one.

    Distance, exact integers end to end:

    - ``ordered=True`` — Earth-Mover's on the value order (the paper's
      ordered-attribute form): t = Σ_j |CumP_j − CumQ_j| / (m−1) =
      Σ_j |n·cumc_j − s·cumg_j| / ((m−1)·s·n) with s = class size,
      n = table size, m = distinct sensitive values;
    - ``ordered=False`` — total variation: t = ½ Σ_j |P_j − Q_j| =
      Σ_j |n·c_j − s·g_j| / (2·s·n).

    Both are one exact-integer fraction per class, emitted half-up e6
    (the (2A+B) div (2B) invariant; decimal(38,0) — n·cum ≤ n²).

    Scale shape: one global value census with a range-partitioned
    prefix count, one (class, value) census, then the FULL grid
    class × m via a broadcast of the m-row census (absent values must
    contribute their cumulative gap, so the grid is not optional);
    the per-class cumulative is a keyed window over ≤ m rows. m is
    bounded by ``max_values`` (a sensitive attribute with thousands
    of levels needs bucketing first — raise, don't silently explode
    the grid).

    Output: (*quasi_cols, class_size, t_closeness_e6), one row per
    equivalence class. Gate with t_closeness_e6 > t·1e6.
    """
    from pyspark.sql.window import Window

    from data_misc_tools_spark.operators.etl import global_cumsum

    dec = "decimal(38,0)"
    base = df.select(*quasi_cols, F.col(sensitive_col).alias("__v"))
    gc = base.groupBy("__v").agg(F.count("*").cast("long").alias("__g"))
    gcum = global_cumsum(gc, [F.col("__v")], ["__g"])
    m_vals = gcum.count()
    if m_vals > max_values:
        raise ValueError(
            f"sensitive attribute has {m_vals} levels (> max_values="
            f"{max_values}); bucket it before the class x value grid"
        )
    tot = gcum.agg(
        F.sum("__g").cast("long").alias("__n"),
        F.count("*").cast("long").alias("__m"),
    )
    vals = gcum.crossJoin(F.broadcast(tot)).select(
        "__v", "__g", F.col("cum___g").alias("__cg"), "__n", "__m"
    )
    cls = base.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("class_size")
    )
    cvc = base.groupBy(*quasi_cols, "__v").agg(
        F.count("*").cast("long").alias("__c")
    )
    grid = (
        cls.crossJoin(F.broadcast(vals))
        .join(cvc, [*quasi_cols, "__v"], "left")
        .fillna(0, subset=["__c"])
    )
    if ordered:
        w = (
            Window.partitionBy(*quasi_cols)
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        term = F.abs(
            F.col("__n").cast(dec) * F.sum("__c").over(w)
            - F.col("class_size").cast(dec) * F.col("__cg")
        )
        den = (F.col("__m") - 1).cast(dec) * F.col("class_size") * F.col("__n")
    else:
        term = F.abs(
            F.col("__n").cast(dec) * F.col("__c")
            - F.col("class_size").cast(dec) * F.col("__g")
        )
        den = F.lit(2).cast(dec) * F.col("class_size") * F.col("__n")
    per = grid.select(
        *quasi_cols, "class_size", term.alias("__t"), den.alias("__d")
    )
    agg = per.groupBy(*quasi_cols, "class_size").agg(
        F.sum("__t").cast(dec).alias("__num"), F.first("__d").alias("__den")
    )
    # degenerate m == 1 (ordered): every class trivially matches the
    # global single-value distribution — denominator 0, t defined as 0
    return agg.selectExpr(
        *quasi_cols,
        "class_size",
        """CASE WHEN __den = 0 THEN CAST(0 AS LONG)
                ELSE CAST((2 * 1000000 * __num + __den) div (2 * __den)
                          AS LONG) END AS t_closeness_e6""",
    )


def mad_outlier_report(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
    k_e3: int = 3000,
) -> DataFrame:
    """Robust outlier gate: median + MAD (median absolute deviation)
    + the count of rows beyond k·MAD — the z-score's heavy-tail-proof
    sibling (mean/stddev are themselves dragged by the outliers they
    are supposed to find; median/MAD have a 50% breakdown point).

    Engine-exact and ONE table scan: values go fixed-point, the
    median is the LOWER median at deterministic rank ceil(n/2) (the
    theil_sen order-statistic convention) read off a value census +
    range-partitioned prefix counts; the deviation distribution is
    then DERIVED FROM THE SAME CENSUS (|v − med| regrouped with its
    counts — never a second scan), its median read the same way; the
    outlier census is a third pass over census rows. All comparisons
    are integer cross-multiplies: outlier ⇔ 1000·|x − med| > k_e3·MAD.

    Output: one row (n_rows, median_scaled, mad_scaled, n_outliers,
    k_e3) — fixed-point integers (divide by ``scale`` for units).
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    v = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    census = (
        df.select(v.alias("__v"))
        .groupBy("__v")
        .agg(F.count("*").cast("long").alias("__c"))
        .localCheckpoint(eager=True)
    )
    cum = global_cumsum(census, [F.col("__v")], ["__c"])
    tot = census.agg(F.sum("__c").cast("long").alias("__n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum___c") >= F.expr("(__n + 1) div 2"))
        .agg(F.min("__v").alias("median"), F.first("__n").alias("__n"))
    )
    dev = (
        census.crossJoin(F.broadcast(med))
        .select(
            F.abs(F.col("__v") - F.col("median")).alias("__d"),
            "__c", "median", "__n",
        )
        .groupBy("__d", "median", "__n")
        .agg(F.sum("__c").cast("long").alias("__c"))
    )
    dcum = global_cumsum(dev, [F.col("__d")], ["__c"])
    mad = (
        dcum.filter(F.col("cum___c") >= F.expr("(__n + 1) div 2"))
        .agg(
            F.min("__d").alias("mad"),
            F.first("median").alias("median"),
            F.first("__n").alias("__n"),
        )
    )
    out = (
        dev.select("__d", "__c")
        .crossJoin(F.broadcast(mad))
        .selectExpr(
            "__n", "median", "mad",
            f"CASE WHEN 1000 * __d > {k_e3} * mad THEN __c ELSE 0 END AS __o",
        )
        .groupBy("__n", "median", "mad")
        .agg(F.sum("__o").cast("long").alias("n_outliers"))
    )
    return out.selectExpr(
        "__n AS n_rows",
        "median AS median_scaled",
        "mad AS mad_scaled",
        "n_outliers",
        f"CAST({k_e3} AS LONG) AS k_e3",
    )


def sprt_report(
    df: DataFrame,
    success_col: str,
    order_col: str,
    p0_permille: int,
    p1_permille: int,
    alpha_permille: int = 50,
    beta_permille: int = 200,
) -> DataFrame:
    """Sequential probability ratio test (Wald 1945) over an ordered
    Bernoulli stream, snapshotted per period — the ANYTIME-VALID
    monitor the fixed-horizon gates (ab_chi_square / ab_power_mde)
    can't give: peek at every period and stop the moment the
    cumulative log-likelihood-ratio crosses a boundary, with type-I/II
    error still bounded by (α, β). Wald's boundaries:
    upper ln((1−β)/α) → accept H1 (rate = p1); lower ln(β/(1−α)) →
    accept H0 (rate = p0).

    Engine-exact: with FIXED simple hypotheses every success
    contributes the CONSTANT c1 = e6ln(p1) − e6ln(p0) and every
    failure c2 = e6ln(1000−p1) − e6ln(1000−p0) (per-quantity
    e6-rounded logs of integer arguments, computed IN-ENGINE — the
    pmi idiom), so the running llr collapses to
    c1·cum_successes + c2·cum_failures — pure counts, no per-event
    float. Boundaries are the same per-quantity e6 log differences.
    |c|·n stays in BIGINT to ~4e13 observations.

    Scale shape: one period-keyed aggregate over one scan, then an
    ordered cumulative window over the PERIOD rollup (bounded-rollup
    contract — days/hours, never events). Decision is evaluated on
    each period-end snapshot; the first non-'continue' row is the
    stopping time.

    Output: (period, n, successes, llr_e6, decision) ordered by
    period; decision ∈ {'accept_h1', 'accept_h0', 'continue'}.
    """
    from pyspark.sql.window import Window

    p0, p1 = int(p0_permille), int(p1_permille)
    a, b = int(alpha_permille), int(beta_permille)
    for v in (p0, p1, a, b):
        if not 0 < v < 1000:
            raise ValueError("permille parameters must be in (0, 1000)")
    if p0 == p1:
        raise ValueError("p0 and p1 must differ (simple vs simple)")
    daily = (
        df.select(
            F.col(order_col).cast("long").alias("period"),
            F.col(success_col).cast("boolean").cast("long").alias("s"),
        )
        .groupBy("period")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("s").cast("long").alias("successes"),
        )
    )
    w = (
        Window.orderBy("period")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "period", "n", "successes",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("successes").over(w).cast("long").alias("cs"),
    )

    def e6ln(x: int) -> str:
        return f"cast(round(ln(cast({x} as double)) * 1e6) as long)"

    c1 = f"({e6ln(p1)} - {e6ln(p0)})"
    c2 = f"({e6ln(1000 - p1)} - {e6ln(1000 - p0)})"
    upper = f"({e6ln(1000 - b)} - {e6ln(a)})"
    lower = f"({e6ln(b)} - {e6ln(1000 - a)})"
    return cum.selectExpr(
        "period", "n", "successes",
        f"cast({c1} * cs + {c2} * (cn - cs) as long) AS llr_e6",
        f"""CASE WHEN {c1} * cs + {c2} * (cn - cs) >= {upper}
                 THEN 'accept_h1'
                 WHEN {c1} * cs + {c2} * (cn - cs) <= {lower}
                 THEN 'accept_h0'
                 ELSE 'continue' END AS decision""",
    ).orderBy("period")


def wilson_ci(
    df: DataFrame,
    group_col: str,
    success: Column,
    z_e6: int = 1_959_964,
) -> DataFrame:
    """Wilson score interval per group (Wilson 1927) — the proportion
    CI that behaves at small n and extreme rates where the naive Wald
    interval collapses (p̂ ± z√(p̂q̂/n) is empty at p̂ = 0 and overshoots
    [0,1]); the per-group uncertainty readout beside
    :func:`chi_square_2x2`'s "different?" and :func:`ab_power_mde`'s
    "could we see it?":

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    Engine-exact the ab_power way: z rides as a FIXED e6 quantile
    (default z_.975 — no engine evaluates an inverse normal CDF) and
    is forced to DOUBLE in both engines (a bare 1.959964 literal is
    DECIMAL in DuckDB and its z² would be exact where Spark's double
    z² rounds — the 10000.0D lesson in reverse); counts are exact
    integers; every later op is one pinned-order IEEE step on shared
    doubles, emitted UNROUNDED. n = 0 groups can't occur (groupBy);
    p̂ ∈ {0, 1} is exactly where Wilson stays sane.

    Output: (group_col, n, k, p_hat, wilson_lo, wilson_hi), ordered
    by group.
    """
    z = z_e6 / 1e6
    g = df.groupBy(F.col(group_col)).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(success.cast("boolean").cast("long")).cast("long").alias("k"),
    )
    zs = f"{z!r}D"
    center = (
        f"(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)"
        f" + {zs} * {zs} / (2D * CAST(n AS DOUBLE)))"
        f" / (1D + {zs} * {zs} / CAST(n AS DOUBLE))"
    )
    half = (
        f"({zs} * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)"
        f" * (1D - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
        f" / CAST(n AS DOUBLE)"
        f" + {zs} * {zs} / (4D * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
        f" / (1D + {zs} * {zs} / CAST(n AS DOUBLE))"
    )
    return (
        g.selectExpr(
            group_col, "n", "k",
            "CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat",
            f"{center} AS __c",
            f"{half} AS __h",
        )
        .selectExpr(
            group_col, "n", "k", "p_hat",
            "__c - __h AS wilson_lo",
            "__c + __h AS wilson_hi",
        )
        .orderBy(group_col)
    )


def ab_power_mde(
    df: DataFrame,
    variant: Column,
    value_col: str,
    scale: int = 100,
    z_alpha_e6: int = 1_959_964,
    z_beta_e6: int = 841_621,
) -> DataFrame:
    """A/B power analysis: the minimum detectable effect at the
    CURRENT sample sizes, and the per-arm n required for a 5% / 1%
    relative lift — the experiment-design gate run BEFORE the test
    (Welch/Mann-Whitney answer "did it move"; this answers "could we
    even have seen it move"). Underpowered tests that ship neutral
    reads as "no effect" are the classic experimentation failure.

    Formulas (two-sided α = .05, power = .80 by default — the z
    quantiles ride as FIXED e6 integers, z_.975 = 1.959964 and
    z_.80 = 0.841621, so no engine evaluates an inverse normal CDF):

        MDE_abs = (z_α + z_β) · √(s_a²/n_a + s_b²/n_b)
        n_per_arm(δ) = (z_α + z_β)² · 2·s_pool² / δ²   (δ = rel·mean)

    Engine-exact the pearson_exact way: fixed-point values, exact
    decimal(38,0) sufficient statistics, sample variances as pinned
    IEEE chains over those integers (ddof = 1), one √ each — emitted
    UNROUNDED; required-n values ceil to longs (ceil of an IEEE
    quotient — both engines ceil the same double). One aggregate pass.

    Output: one row (n_a, n_b, mean_a, mean_b, sd_pooled, mde_abs,
    mde_rel, n_per_arm_5pct, n_per_arm_1pct) — means/sds in scaled
    units.
    """
    dec = "decimal(38,0)"
    v = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    lab = variant.cast("boolean")
    g = df.select(lab.alias("__v"), v.alias("__x")).agg(
        F.sum(F.when(F.col("__v"), 1).otherwise(0)).cast(dec).alias("na"),
        F.sum(F.when(~F.col("__v"), 1).otherwise(0)).cast(dec).alias("nb"),
        F.sum(F.when(F.col("__v"), F.col("__x")).otherwise(0))
        .cast(dec)
        .alias("sa"),
        F.sum(F.when(~F.col("__v"), F.col("__x")).otherwise(0))
        .cast(dec)
        .alias("sb"),
        F.sum(
            F.when(F.col("__v"), F.col("__x").cast(dec) * F.col("__x")).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("qa"),
        F.sum(
            F.when(~F.col("__v"), F.col("__x").cast(dec) * F.col("__x")).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("qb"),
    )
    z = (z_alpha_e6 + z_beta_e6) / 1e6
    return g.selectExpr(
        "CAST(na AS LONG) AS n_a",
        "CAST(nb AS LONG) AS n_b",
        "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_a",
        "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b",
        # sample variances over exact integers (ddof=1), pooled by dof
        """CASE WHEN na + nb > 2 THEN sqrt(
             (CAST(na * qa - sa * sa AS DOUBLE) / CAST(na AS DOUBLE)
            + CAST(nb * qb - sb * sb AS DOUBLE) / CAST(nb AS DOUBLE))
             / CAST(na + nb - 2 AS DOUBLE))
           ELSE CAST(NULL AS DOUBLE) END AS sd_pooled""",
        f"""CASE WHEN na > 1 AND nb > 1 THEN {z}D * sqrt(
              CAST(na * qa - sa * sa AS DOUBLE)
                / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)
                   * CAST(na AS DOUBLE))
            + CAST(nb * qb - sb * sb AS DOUBLE)
                / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)
                   * CAST(nb AS DOUBLE)))
            ELSE CAST(NULL AS DOUBLE) END AS mde_abs""",
    ).selectExpr(
        "n_a", "n_b", "mean_a", "mean_b", "sd_pooled", "mde_abs",
        "CASE WHEN mean_b != 0D THEN mde_abs / mean_b"
        " ELSE CAST(NULL AS DOUBLE) END AS mde_rel",
        f"""CASE WHEN sd_pooled IS NOT NULL AND mean_b != 0D THEN
              CAST(ceil({z}D * {z}D * 2D * sd_pooled * sd_pooled
                        / (0.05D * mean_b * 0.05D * mean_b)) AS LONG)
            ELSE CAST(NULL AS LONG) END AS n_per_arm_5pct""",
        f"""CASE WHEN sd_pooled IS NOT NULL AND mean_b != 0D THEN
              CAST(ceil({z}D * {z}D * 2D * sd_pooled * sd_pooled
                        / (0.01D * mean_b * 0.01D * mean_b)) AS LONG)
            ELSE CAST(NULL AS LONG) END AS n_per_arm_1pct""",
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Mutual information between two categorical columns, engine-
    exact — the dependence screen behind feature selection, linkage
    field ranking, and redundant-column detection (MI = 0 iff
    independent; MI close to min(H_a, H_b) means one column nearly
    determines the other).

    I(A;B) = Σ_xy p_xy·ln(p_xy·n / (c_x·c_y)) computed the keyness
    way: one (a, b) cell census (single map-side-combined aggregate),
    marginals re-derived from the CELLS (grouping the census, never a
    second table scan), and every log a per-quantity e6-rounded ln of
    an exact integer — n·I·1e6 = Σ cnt·(e6ln(cnt) + e6ln(n) −
    e6ln(c_a) − e6ln(c_b)) accumulates in decimal(38,0), then ONE
    half-up division brings it to mi_e6 (nats). Entropies H(A), H(B)
    ride the same pass so the normalized score
    NMI = I/min(H_a,H_b) is computable downstream.

    Output: one row (n_rows, n_cells, mi_e6, h_a_e6, h_b_e6) — e6
    nats, exact integers.
    """
    dec = "decimal(38,0)"
    cells = (
        df.select(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count("*").cast("long").alias("__c"))
        .localCheckpoint(eager=True)
    )
    ma = cells.groupBy("__a").agg(F.sum("__c").cast("long").alias("__ca"))
    mb = cells.groupBy("__b").agg(F.sum("__c").cast("long").alias("__cb"))
    tot = cells.agg(F.sum("__c").cast("long").alias("__n"))
    e6 = lambda x: f"CAST(round(ln(CAST({x} AS DOUBLE)) * 1e6) AS BIGINT)"  # noqa: E731
    joined = (
        cells.join(ma, "__a")
        .join(mb, "__b")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "__n",
            f"CAST(__c AS {dec}) * ({e6('__c')} + {e6('__n')}"
            f" - {e6('__ca')} - {e6('__cb')}) AS __mi_term",
        )
    )
    mi = joined.groupBy("__n").agg(
        F.sum("__mi_term").cast(dec).alias("__mi"),
        F.count("*").cast("long").alias("n_cells"),
    )
    ha = (
        ma.crossJoin(F.broadcast(tot))
        .selectExpr(
            "__n",
            f"CAST(__ca AS {dec}) * ({e6('__n')} - {e6('__ca')}) AS __t",
        )
        .groupBy("__n")
        .agg(F.sum("__t").cast(dec).alias("__ha"))
    )
    hb = (
        mb.crossJoin(F.broadcast(tot))
        .selectExpr(
            "__n",
            f"CAST(__cb AS {dec}) * ({e6('__n')} - {e6('__cb')}) AS __t",
        )
        .groupBy("__n")
        .agg(F.sum("__t").cast(dec).alias("__hb"))
    )
    out = mi.join(ha, "__n").join(hb, "__n")
    return out.selectExpr(
        "__n AS n_rows",
        "n_cells",
        # the term sum can be slightly negative from e6 rounding on an
        # independent pair — clamp BEFORE the half-up division (the
        # signed-div engine divergence: Spark div truncates, DuckDB //
        # floors; MI is nonnegative so the clamp is semantics, not a
        # dodge)
        f"CAST((2 * greatest(__mi, CAST(0 AS {dec})) + __n)"
        f" div (2 * CAST(__n AS {dec})) AS LONG) AS mi_e6",
        f"CAST((2 * __ha + __n) div (2 * CAST(__n AS {dec})) AS LONG)"
        " AS h_a_e6",
        f"CAST((2 * __hb + __n) div (2 * CAST(__n AS {dec})) AS LONG)"
        " AS h_b_e6",
    )


def calibration_report(
    df: DataFrame,
    score_e6_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Reliability diagram as data: does a [0,1] score MEAN what it
    says? Bucket rows by predicted score, compare each bucket's mean
    prediction against its observed positive rate — the calibration
    check every quality/classifier score feeding a sampling or
    filtering decision needs (a perfectly discriminative score can
    still be wildly miscalibrated, and thresholding a miscalibrated
    score at "0.9" does not give 90% precision).

    Engine-exact contract: the score arrives as an e6 INTEGER in
    [0, 1e6] (``score_e6_col`` — produce it upstream with the repo's
    half-up pattern so bucketing is exact; a float score would bucket
    differently across engines at boundaries). Bucket =
    least(score_e6·n div 1e6, n−1) — exact integer. Per bucket the
    report emits n_rows, n_pos, mean_score_e6 = half-up(Σscore, n)
    and pos_rate_e6 = half-up(1e6·pos, n); |mean − rate| is the
    bucket's calibration gap, Σ n/N-weighted gaps is ECE.

    One hash aggregate (map-side combined), bounded n_buckets rows.
    Output: (bucket, n_rows, n_pos, mean_score_e6, pos_rate_e6,
    gap_e6), ordered by bucket.
    """
    if n_buckets < 2:
        raise ValueError("need at least 2 buckets")
    s = F.col(score_e6_col).cast("long")
    guard = F.when(
        (s < 0) | (s > 1_000_000),
        F.raise_error(
            F.format_string(
                "calibration_report: score_e6 %s outside [0, 1e6]", s
            )
        ).cast("long"),
    ).otherwise(s)
    bucket = F.least(
        F.expr(f"({score_e6_col} * {n_buckets}) div 1000000"),
        F.lit(n_buckets - 1),
    ).cast("long")
    base = df.select(
        guard.alias("__s"),
        bucket.alias("bucket"),
        F.col(label_col).cast("boolean").cast("long").alias("__y"),
    )
    agg = base.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum("__s").cast("long").alias("__ss"),
    )
    return agg.selectExpr(
        "bucket", "n_rows", "n_pos",
        "(2 * __ss + n_rows) div (2 * n_rows) AS mean_score_e6",
        "(2 * 1000000 * n_pos + n_rows) div (2 * n_rows) AS pos_rate_e6",
    ).selectExpr(
        "bucket", "n_rows", "n_pos", "mean_score_e6", "pos_rate_e6",
        "abs(mean_score_e6 - pos_rate_e6) AS gap_e6",
    ).orderBy("bucket")


def gini_concentration(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Gini coefficient + Herfindahl–Hirschman index of a nonnegative
    metric — the concentration profile ("how unequal is revenue across
    customers / token mass across documents") that decides whether a
    corpus or customer base is long-tail or whale-dominated before
    sampling or capping decisions.

    Engine-exact via the rank-census route (no per-row rank): values
    go fixed-point (``value·scale`` integer), the distinct-value
    census gets a range-partitioned prefix count
    (:func:`~data_misc_tools_spark.operators.etl.global_cumsum`), and
    each tie group's rank-weighted mass is closed-form —
    Σ_{i∈group} i·v = v·(c·s + c·(c+1)/2) with s the exclusive prefix
    count — doubled to stay integral. Gini then is
    (2Σi·x − (n+1)·Σx) / (n·Σx) and HHI is Σx²/(Σx)², each ONE IEEE
    division of exact decimal(38,0) integers, emitted UNROUNDED (the
    pearson_exact portability contract). Tie order cannot matter:
    permuting equal values across ranks leaves Σi·x unchanged, so the
    census form is not an approximation.

    Negative values would make both statistics meaningless — the
    aggregate raises via an ANSI guard instead of returning a wrong
    number. Empty input yields no row; an all-zero total yields NULLs.

    Scale shape: one value census (map-side combined), one prefix sum
    over distinct values, one single-row aggregate.

    Output: one row (n_rows, total, gini, hhi).
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    dec = "decimal(38,0)"
    v = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    census = (
        df.select(v.alias("__v"))
        .select(
            F.when(
                F.col("__v") < 0,
                F.raise_error(
                    F.format_string(
                        "gini_concentration: negative value %s", F.col("__v")
                    )
                ).cast("long"),
            )
            .otherwise(F.col("__v"))
            .alias("__v")
        )
        .groupBy("__v")
        .agg(F.count("*").cast("long").alias("__c"))
    )
    cum = global_cumsum(census, [F.col("__v")], ["__c"]).selectExpr(
        "__v", "__c", "cum___c - __c AS __s"
    )
    agg = cum.agg(
        F.sum("__c").cast(dec).alias("n"),
        F.sum(F.col("__v").cast(dec) * F.col("__c")).alias("sx"),
        F.sum(
            F.col("__v").cast(dec)
            * (2 * F.col("__c") * F.col("__s") + F.col("__c") * (F.col("__c") + 1))
        ).alias("s2ix"),
        F.sum(F.col("__v").cast(dec) * F.col("__v") * F.col("__c")).alias("sxx"),
    )
    return agg.selectExpr(
        "CAST(n AS LONG) AS n_rows",
        f"CAST(sx AS LONG) AS total",
        """CASE WHEN sx = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(s2ix - (n + 1) * sx AS DOUBLE)
                     / CAST(n * sx AS DOUBLE) END AS gini""",
        """CASE WHEN sx = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(sxx AS DOUBLE) / CAST(sx * sx AS DOUBLE)
           END AS hhi""",
    )


def spearman_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """Spearman rank correlation with an engine-portable result — the
    monotone-association companion to :func:`pearson_exact`: immune to
    the outliers and nonlinearity that distort Pearson on raw values
    (a heavy-tailed metric pair can show Pearson ≈ 0 with perfect
    monotone dependence; Spearman reports 1).

    Construction is Pearson ON TIED-AVERAGE RANKS, kept exact end to
    end: values go fixed-point (``value·scale`` integer per row), each
    axis gets a distinct-value census with a range-partitioned prefix
    count (:func:`~data_misc_tools_spark.operators.etl.global_cumsum`
    — never a single-reducer window), and the tie-averaged rank rides
    DOUBLED so it stays integral: 2·avgrank(v) = 2·(count below) +
    (tie size) + 1 (the :func:`mannwhitney_u` idiom). Rows join their
    doubled ranks back by fixed-point value, and the Pearson closed
    form runs over exact decimal(38,0) sums of those integers —
    doubling both axes cancels in the correlation, and the one float
    step is the pinned IEEE chain num/(√dxx·√dyy), emitted UNROUNDED
    (the pearson_exact contract; HUGEINT twin in DuckDB). Bound:
    Σ(2rx·2ry) ≤ 4n³ — decimal(38,0) holds to n ≈ 10^11 rows.

    Scale shape: two value-keyed censuses (map-side combined), two
    joins back on the value key (AQE-handled skew; a census is
    |distinct fixed-point values| rows — the quantile-histogram
    class), one single-row aggregate. Zero-variance axes (all ties)
    yield NULL via try_divide.

    Output: one row (n_rows, spearman).
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    dec = "decimal(38,0)"
    rows = df.select(
        F.round(F.col(x_col) * F.lit(x_scale)).cast("long").alias("__x"),
        F.round(F.col(y_col) * F.lit(y_scale)).cast("long").alias("__y"),
    )

    def ranks2(col: str) -> DataFrame:
        census = rows.groupBy(col).agg(F.count("*").cast("long").alias("__c"))
        cum = global_cumsum(census, [F.col(col)], ["__c"])
        return cum.select(
            col,
            (2 * (F.col("cum___c") - F.col("__c")) + F.col("__c") + 1)
            .cast("long")
            .alias(f"{col}_r2"),
        )

    joined = rows.join(ranks2("__x"), "__x").join(ranks2("__y"), "__y")
    g = joined.agg(
        F.count("*").cast(dec).alias("__n"),
        F.sum("__x_r2").cast(dec).alias("__sx"),
        F.sum("__y_r2").cast(dec).alias("__sy"),
        F.sum(F.col("__x_r2").cast(dec) * F.col("__y_r2")).alias("__sxy"),
        F.sum(F.col("__x_r2").cast(dec) * F.col("__x_r2")).alias("__sxx"),
        F.sum(F.col("__y_r2").cast(dec) * F.col("__y_r2")).alias("__syy"),
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    dxx = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    dyy = (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(
        "double"
    )
    return g.select(
        F.col("__n").cast("long").alias("n_rows"),
        F.try_divide(num, F.sqrt(dxx) * F.sqrt(dyy)).alias("spearman"),
    )


def validate_contract(
    df: DataFrame,
    rules: dict[str, "object"],
) -> DataFrame:
    """Data-contract gate: named row-level predicates → violation
    counts, in ONE aggregate pass over the table.

    ``rules`` maps rule name → boolean Column that is True when the
    row SATISFIES the contract (nulls count as violations — an
    unknown value cannot prove compliance). Every rule is evaluated
    in the same scan; the output is one row per rule, so a 100-rule
    contract over 100 TB is still a single map-side-combined
    aggregate, not 100 scans.

    Output: (rule, n_violations, n_rows) — a release gate passes when
    max(n_violations) == 0; keeping the per-rule rows (instead of one
    boolean) is what makes the failure actionable.

    Referential rules (FK orphans) need a join, not a predicate — see
    :func:`fk_violations`.
    """
    names = list(rules)
    aggs = [F.count("*").alias("__n")] + [
        F.sum(
            (~F.coalesce(rules[n], F.lit(False))).cast("long")
        ).alias(f"__v_{i}")
        for i, n in enumerate(names)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', __v_{i}" for i, n in enumerate(names))
    return one.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (rule, n_violations)",
        "__n AS n_rows",
    ).select("rule", "n_violations", "n_rows")


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Referential-integrity check: child rows whose key tuple has no
    parent — LEFT ANTI join on the keys (broadcast when the parent is
    a dimension; null keys are reported too, matching
    validate_contract's unknown-is-violation stance)."""
    return child.join(parent.select(*keys).distinct(), on=keys, how="left_anti")


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """Robust per-group outlier flags: |x − median| > k·1.4826·MAD.

    Median/MAD instead of mean/stddev because metric columns in ops
    tables are heavy-tailed — a single spike inflates a stddev
    threshold until nothing is an outlier; the median absolute
    deviation barely moves (1.4826 rescales MAD to σ under normality,
    so k keeps its usual z-score reading).

    Two grouped percentile passes joined back broadcast (the group
    table is small by construction), flag evaluated scan-local.
    ``exact=True`` uses Spark's exact ``percentile`` — linear-
    interpolated, bit-identical to DuckDB's quantile_cont (verified:
    every catalog median matches exactly), but it buffers each
    group's values in the aggregation state, so for 100 TB groups
    use ``exact=False`` (percentile_approx, bounded state, no oracle).

    Output: input columns + __med, __mad, is_outlier.
    """
    fn = "percentile" if exact else "percentile_approx"
    med = df.groupBy(*group_cols).agg(
        F.expr(f"{fn}({value_col}, 0.5)").alias("__med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.expr(f"{fn}(__adev, 0.5)").alias("__mad")
    )
    return (
        dev.join(F.broadcast(mad), group_cols)
        .withColumn(
            "is_outlier",
            F.col("__adev") > F.lit(k) * F.lit(1.4826) * F.col("__mad"),
        )
        .drop("__adev")
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 20,
) -> DataFrame:
    """Pre-join skew diagnostic: the ``top`` heaviest values of a
    prospective join/group key with their row counts and share of the
    table (4dp, half-up integer math — engine-portable).

    The thing to check BEFORE shipping a 100 TB join: one hash-agg on
    the key (map-side combined), a broadcast scalar total, and a
    top-k heap — no global sort, no second scan. A key whose top value
    holds >1% of a 100 TB table needs salting or AQE skew handling;
    this report is how you find out for pennies.

    Output: (key_value string, n_rows, share), heaviest first.
    """
    counts = (
        df.groupBy(F.col(key_col).cast("string").alias("key_value"))
        .agg(F.count("*").alias("n_rows"))
    )
    total = counts.agg(F.sum("n_rows").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.desc("n_rows"), "key_value")
        .limit(top)
        .selectExpr(
            "key_value",
            "n_rows",
            "((2 * 10000 * n_rows + __t) div (2 * __t)) / 10000.0D AS share",
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency power-law fit over the corpus vocabulary —
    the classic corpus-health diagnostic (natural language sits near
    slope -1; machine-generated or template-heavy corpora deviate).

    Fits OLS on (ln rank, ln count) over the ``top_k`` most frequent
    terms (the standard practice — the long tail bends away from the
    power law). Engine-exact like :func:`pearson_exact`: ln values are
    e6-scaled BIGINTs (transcendentals never sit on decimal halves),
    sufficient statistics accumulate in decimal(38,0), and slope /
    intercept / corr are single closed-form IEEE steps over those
    exact integers, emitted unrounded.

    Scale: one token-count aggregate (map-side combined); the rank is
    a global row_number whose WindowGroupLimit keeps only top_k rows
    per partition before the single-partition final — k rows shuffle,
    not the vocabulary.

    Output: one row (n_terms, slope, intercept_e6, corr) —
    intercept_e6 is in e6 log units (divide by 1e6 for ln-count
    units; kept scaled so the value itself is a pure two-integer
    division).
    """
    from pyspark.sql.window import Window

    from data_misc_tools_spark.operators.text import tokens

    dec = "decimal(38,0)"
    cnts = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.col("tok"))
    ranked = cnts.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_k
    )
    pts = ranked.select(
        F.round(F.log(F.col("rank").cast("double")) * 1e6).cast(dec).alias("__x"),
        F.round(F.log(F.col("cnt").cast("double")) * 1e6).cast(dec).alias("__y"),
    )
    g = pts.agg(
        F.count("*").cast(dec).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    dxx = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    dyy = (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    inum = (
        F.col("__sy") * F.col("__sxx") - F.col("__sx") * F.col("__sxy")
    ).cast("double")
    return g.select(
        F.col("__n").cast("long").alias("n_terms"),
        F.try_divide(num, dxx).alias("slope"),
        F.try_divide(inum, dxx).alias("intercept_e6"),
        F.try_divide(num, F.sqrt(dxx) * F.sqrt(dyy)).alias("corr"),
    )


def heaps_law_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps' law vocabulary-growth fit V(N) = k·N^β — the companion
    corpus diagnostic to :func:`zipf_fit`: natural text grows its
    vocabulary at β ≈ 0.4–0.6; β near 0 means a closed template
    vocabulary (dedup harder, n-gram LMs saturate), β near 1 means
    id-like noise tokens. Read β BEFORE sizing vocabularies,
    tokenizers, or hash spaces for a 100× larger crawl.

    Construction, exact integers end to end: documents are consumed
    in ``id_col`` order; N_d (cumulative tokens) and V_d (cumulative
    DISTINCT types — each type counted at its FIRST document, the min
    id owning it) both ride :func:`~data_misc_tools_spark.operators
    .etl.global_cumsum`; the fit is OLS on (ln N_d, ln V_d) with the
    zipf_fit machinery — e6-scaled lns of exact integers,
    decimal(38,0) sufficient statistics, closed-form IEEE slope /
    intercept / corr emitted unrounded (β = slope).

    Scale shape: one (doc, tok) distinct aggregate feeding both the
    per-doc token counts and the first-occurrence census (two shuffles
    on small keys), two range-partitioned prefix sums, one single-row
    aggregate. Docs with zero tokens contribute nothing.

    Output: one row (n_docs, n_tokens, n_types, beta, intercept_e6,
    corr).
    """
    from data_misc_tools_spark.operators.etl import global_cumsum
    from data_misc_tools_spark.operators.text import tokens

    dec = "decimal(38,0)"
    toks = df.select(
        F.col(id_col).alias("__d"), F.explode(tokens(text_col)).alias("tok")
    )
    per_doc = toks.groupBy("__d").agg(F.count("*").cast("long").alias("__nt"))
    first = (
        toks.groupBy("tok")
        .agg(F.min("__d").alias("__d"))
        .groupBy("__d")
        .agg(F.count("*").cast("long").alias("__nv"))
    )
    base = per_doc.join(first, "__d", "left").select(
        "__d", "__nt", F.coalesce(F.col("__nv"), F.lit(0)).cast("long").alias("__nv")
    )
    cum = global_cumsum(base, [F.col("__d")], ["__nt", "__nv"])
    pts = cum.select(
        F.round(F.log(F.col("cum___nt").cast("double")) * 1e6)
        .cast(dec)
        .alias("__x"),
        F.round(F.log(F.col("cum___nv").cast("double")) * 1e6)
        .cast(dec)
        .alias("__y"),
        F.col("cum___nt").alias("__N"),
        F.col("cum___nv").alias("__V"),
    )
    g = pts.agg(
        F.count("*").cast(dec).alias("__n"),
        F.max("__N").cast("long").alias("n_tokens"),
        F.max("__V").cast("long").alias("n_types"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    dxx = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    dyy = (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(
        "double"
    )
    inum = (
        F.col("__sy") * F.col("__sxx") - F.col("__sx") * F.col("__sxy")
    ).cast("double")
    return g.select(
        F.col("__n").cast("long").alias("n_docs"),
        "n_tokens",
        "n_types",
        F.try_divide(num, dxx).alias("beta"),
        F.try_divide(inum, dxx).alias("intercept_e6"),
        F.try_divide(num, F.sqrt(dxx) * F.sqrt(dyy)).alias("corr"),
    )


def corpus_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distribution drift between two corpus versions — the audit a
    pipeline runs after every filter/dedup step ("what did that stage
    do to the token distribution?") and between crawl snapshots.

    Reports vocabulary churn (terms that appeared/died) and the
    KL divergence KL(B ‖ A) of the add-one-smoothed unigram
    distributions over the union vocabulary. Engine-exact: per-term
    log ratios are e6-scaled BIGINTs (ln of a quotient of exact
    < 2^53 integer products — the dsir/NLL idiom), the weighted sum
    Σ c_b·t is a pure integer aggregate, and the final
    S/total_b/1e6 is two correctly-rounded double divisions both
    engines execute identically (unrounded per the repo float
    invariant; S may be negative so no integer half-up div).

    Scale: one (token) count aggregate per side — full-outer-joined
    on the term (vocabulary-sized shuffle) — then a single-row total.
    Output: one row (n_tokens_a, n_tokens_b, vocab_a, vocab_b,
    n_new_terms, n_dead_terms, kl_b_from_a).
    """
    from data_misc_tools_spark.operators.text import tokens

    def counts(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(tokens(text_col)).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").cast("long").alias("c"))
        )

    ca, cb = counts(a), counts(b)
    j = ca.withColumnRenamed("c", "ca").join(
        cb.withColumnRenamed("c", "cb"), "tok", "full_outer"
    ).select(
        "tok",
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    tots = j.agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum("cb").cast("long").alias("tb"),
        F.count("*").cast("long").alias("v"),
        F.sum((F.col("ca") > 0).cast("long")).alias("vocab_a"),
        F.sum((F.col("cb") > 0).cast("long")).alias("vocab_b"),
        F.sum(((F.col("ca") == 0) & (F.col("cb") > 0)).cast("long")).alias("n_new_terms"),
        F.sum(((F.col("cb") == 0) & (F.col("ca") > 0)).cast("long")).alias("n_dead_terms"),
    )
    contrib = j.crossJoin(F.broadcast(tots)).select(
        "ta", "tb", "v", "vocab_a", "vocab_b", "n_new_terms", "n_dead_terms",
        (
            F.col("cb")
            * F.round(
                F.log(
                    ((F.col("cb") + 1) * (F.col("ta") + F.col("v"))).cast("double")
                    / ((F.col("ca") + 1) * (F.col("tb") + F.col("v")))
                )
                * 1e6
            ).cast("long")
        ).alias("w"),
    )
    return (
        contrib.groupBy(
            "ta", "tb", "vocab_a", "vocab_b", "n_new_terms", "n_dead_terms"
        )
        .agg(F.sum("w").alias("s"))
        .select(
            F.col("ta").alias("n_tokens_a"),
            F.col("tb").alias("n_tokens_b"),
            "vocab_a", "vocab_b", "n_new_terms", "n_dead_terms",
            (F.col("s").cast("double") / F.col("tb") / F.lit(1e6)).alias("kl_b_from_a"),
        )
    )


# Poisson(1) inverse-CDF thresholds on the 32-bit hash space:
# floor(P(X <= k) * 2^32) for k = 0..5; weights above cap at 6.
# exp(-1) * sum(1/i!) terms — identical literals in the SQL oracle.
POISSON1_THRESHOLDS: list[int] = [
    int(c * (1 << 32))
    for c in (
        0.36787944117144233,
        0.7357588823428847,
        0.9196986029286058,
        0.9810118431238462,
        0.9963401531726563,
        0.9994058151824183,
    )
]


def _boot_u(salt: str, portable: bool):
    """Uniform u32 of (key, replicate) for the Poisson bootstrap.

    portable=True: md5-derived (engine-portable; a DuckDB oracle can
    reproduce every replicate weight bit-exactly) — but md5 per
    (row x n_boot) dominates the bootstrap's runtime (the suite's two
    slowest queries at sf0.1, ~19 s / ~9 s). portable=False: one
    JVM-native xxhash64 over the raw (key, replicate) columns — same
    online-Poisson estimator, different (still deterministic,
    partitioning-independent) replicate draws, ~4-6x faster. The
    dedup_minhash_lsh / _fast precedent: grade the md5 path, run the
    xxhash64 path in production."""
    from data_misc_tools_spark.operators.sampling import _hash_u32

    if portable:
        return _hash_u32(
            F.concat(F.col("__k"), F.lit(":"), F.col("__r").cast("string")), salt
        )
    return F.pmod(
        F.xxhash64(F.lit(salt), F.col("__k"), F.col("__r")), F.lit(1 << 32)
    )


def _poisson1_w(u: Column) -> Column:
    """Inverse-CDF Poisson(1) multiplicity of a uniform u32 (capped
    at 6; P[X>6] < 6e-4 is folded into the cap)."""
    w = F.lit(6)
    for k in range(len(POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < POISSON1_THRESHOLDS[k], k).otherwise(w)
    return w


def bootstrap_ci_mean(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_cols: list[str] | None = None,
    n_boot: int = 100,
    alpha: float = 0.05,
    scale: int = 10000,
    salt: str = "boot:",
    portable: bool = True,
) -> DataFrame:
    """Percentile bootstrap confidence interval for a per-group mean,
    via the ONLINE Poisson bootstrap (Chamandy et al. 2012 /
    Owen & Eckles 2012): each row's multiplicity in replicate r is
    Poisson(1)-distributed, derived DETERMINISTICALLY from
    hash(key, r) by inverse CDF — no resampling pass per replicate, no
    RNG state, reproducible under any partitioning (the repo's
    hash-sampling invariant), and embarrassingly parallel: one bounded
    explode (x n_boot) + one grouped aggregate.

    Engine-exact: values fix to ``scale``-scaled BIGINTs, replicate
    sums are integer, each replicate mean is the same two
    correctly-rounded double divisions in both engines, and the CI
    bounds are ORDER STATISTICS of those means (row_number selection
    at floor(B·α/2)+1 and B−floor(B·α/2), ties broken by replicate
    id) — never an interpolated percentile, which engines disagree on.

    Scale: the explode multiplies the scanned slice by ``n_boot`` —
    bootstrap an aggregated or sampled slice, not the raw 100 TB
    table; everything downstream is |groups|·n_boot rows. Replicates
    where every weight drew 0 (tiny groups) are dropped from the
    order statistics.

    ``portable=False`` swaps the md5-derived replicate draws for
    JVM-native xxhash64 (see :func:`_boot_u`): identical estimator and
    CI machinery, different (equally deterministic) draws, ~4-6x
    faster — the production path; keep the default for oracle-graded
    runs.

    Output: (*group_cols, n_rows, mean, ci_lo, ci_hi).
    """
    from pyspark.sql.window import Window

    g = list(group_cols or [])
    x = F.round(F.col(value_col) * scale).cast("long")
    base = df.select(*g, F.col(key_col).cast("string").alias("__k"), x.alias("__x"))
    point = base.groupBy(*g).agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.sum("__x").cast("double") / F.count("*") / scale).alias("mean"),
    )
    # spread before the n_boot-x explode (r11): a single-file input
    # scan otherwise runs the whole replicate fan-out + per-replicate
    # hashing on one or two tasks (guide §2.5 input skew; the
    # minhash_signatures guard — at sf1 the 21 MB events table is ONE
    # scan partition and the md5 pass serialized)
    from data_misc_tools_spark.operators.util import spread as _spread

    rep = _spread(base).select(
        *g, "__k", "__x",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("__r"),
    )
    reps = (
        rep.withColumn("__u", _boot_u(salt, portable))
        # the hash is PROJECTED once: inlined into _poisson1_w's
        # nested CASE it sat in conditional branches, outside codegen
        # subexpression elimination — the md5 ran up to 6x per
        # (row x replicate). Measured 16.0 -> 8.8s on the 100-replicate
        # events explode at sf0.1 (r10).
        .withColumn("__w", _poisson1_w(F.col("__u")).cast("long"))
        .drop("__u")
        .groupBy(*g, "__r")
        .agg(
            F.sum("__w").alias("__n"),
            F.sum(F.col("__w") * F.col("__x")).alias("__s"),
        )
        .where(F.col("__n") > 0)
        .select(
            *g, "__r",
            (F.col("__s").cast("double") / F.col("__n") / scale).alias("__m"),
        )
    )
    win = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    ranked = reps.select(
        *g, "__m",
        F.row_number().over(win.orderBy("__m", "__r")).alias("__rn"),
        F.count("*").over(win).alias("__b"),
    )
    # integer permille arithmetic: floor(b * alpha/2) via (b*permille)
    # div 1000 — a double multiply could land at x.4999…/x.5000…4 and
    # floor differently across engines
    permille = int(round(alpha / 2 * 1000))
    lo_i = F.expr(f"(__b * {permille}) div 1000") + 1
    hi_i = F.col("__b") - F.expr(f"(__b * {permille}) div 1000")
    ci = ranked.groupBy(*g).agg(
        F.max(F.when(F.col("__rn") == lo_i, F.col("__m"))).alias("ci_lo"),
        F.max(F.when(F.col("__rn") == hi_i, F.col("__m"))).alias("ci_hi"),
    )
    if g:
        return point.join(ci, g).select(*g, "n_rows", "mean", "ci_lo", "ci_hi")
    return point.crossJoin(ci).select("n_rows", "mean", "ci_lo", "ci_hi")


def bootstrap_ab_lift(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_col: str,
    control: str,
    treatment: str,
    n_boot: int = 100,
    alpha: float = 0.05,
    scale: int = 10000,
    salt: str = "boot:",
    portable: bool = True,
) -> DataFrame:
    """Percentile-bootstrap CI for the LIFT (treatment mean − control
    mean) between two variants — the A/B readout. Same deterministic
    online Poisson machinery as :func:`bootstrap_ci_mean`; each
    replicate resamples BOTH variants (independent hash-derived
    weights), the per-replicate lift is a difference of two exact-
    integer-ratio doubles, and the CI bounds are order statistics of
    those lifts. Replicates where either variant drew all-zero
    weights are dropped.

    Output: one row (n_control, n_treatment, lift, ci_lo, ci_hi) —
    the null hypothesis "no lift" is rejected at ``alpha`` when the
    CI excludes 0. ``portable=False`` = xxhash64 production draws
    (see :func:`bootstrap_ci_mean`).
    """
    from pyspark.sql.window import Window

    x = F.round(F.col(value_col) * scale).cast("long")
    base = df.where(F.col(group_col).isin([control, treatment])).select(
        F.col(key_col).cast("string").alias("__k"),
        (F.col(group_col) == treatment).alias("__t"),
        x.alias("__x"),
    )
    point = base.agg(
        F.sum(F.when(~F.col("__t"), 1).otherwise(0)).cast("long").alias("n_control"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).cast("long").alias("n_treatment"),
        (
            F.sum(F.when(F.col("__t"), F.col("__x"))).cast("double")
            / F.sum(F.when(F.col("__t"), 1)) / scale
            - F.sum(F.when(~F.col("__t"), F.col("__x"))).cast("double")
            / F.sum(F.when(~F.col("__t"), 1)) / scale
        ).alias("lift"),
    )
    # spread before the n_boot-x explode (r11): the bootstrap_ci_mean
    # single-file-input guard (guide §2.5)
    from data_misc_tools_spark.operators.util import spread as _spread

    rep = _spread(base).select(
        "__k", "__t", "__x",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("__r"),
    )
    reps = (
        rep.withColumn("__u", _boot_u(salt, portable))
        # the hash is PROJECTED once: inlined into _poisson1_w's
        # nested CASE it sat in conditional branches, outside codegen
        # subexpression elimination — the md5 ran up to 6x per
        # (row x replicate). Measured 16.0 -> 8.8s on the 100-replicate
        # events explode at sf0.1 (r10).
        .withColumn("__w", _poisson1_w(F.col("__u")).cast("long"))
        .drop("__u")
        .groupBy("__r")
        .agg(
            F.sum(F.when(F.col("__t"), F.col("__w"))).cast("long").alias("nt"),
            F.sum(F.when(F.col("__t"), F.col("__w") * F.col("__x"))).cast("long").alias("st"),
            F.sum(F.when(~F.col("__t"), F.col("__w"))).cast("long").alias("nc"),
            F.sum(F.when(~F.col("__t"), F.col("__w") * F.col("__x"))).cast("long").alias("sc"),
        )
        .where((F.coalesce(F.col("nt"), F.lit(0)) > 0) & (F.coalesce(F.col("nc"), F.lit(0)) > 0))
        .select(
            "__r",
            (
                F.col("st").cast("double") / F.col("nt") / scale
                - F.col("sc").cast("double") / F.col("nc") / scale
            ).alias("__d"),
        )
    )
    win = Window.partitionBy(F.lit(1))
    ranked = reps.select(
        "__d",
        F.row_number().over(win.orderBy("__d", "__r")).alias("__rn"),
        F.count("*").over(win).alias("__b"),
    )
    permille = int(round(alpha / 2 * 1000))
    lo_i = F.expr(f"(__b * {permille}) div 1000") + 1
    hi_i = F.col("__b") - F.expr(f"(__b * {permille}) div 1000")
    ci = ranked.agg(
        F.max(F.when(F.col("__rn") == lo_i, F.col("__d"))).alias("ci_lo"),
        F.max(F.when(F.col("__rn") == hi_i, F.col("__d"))).alias("ci_hi"),
    )
    return point.crossJoin(ci)


def brier_decomposition(
    df: DataFrame,
    score_e6_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Murphy decomposition of the (binned) Brier score (Murphy 1973)
    — the third leg of the calibration battery beside
    :func:`calibration_report` (per-bucket gaps) and
    :func:`isotonic_fit` (repair): Brier = RELIABILITY − RESOLUTION +
    UNCERTAINTY, where reliability = Σ n_b·(s̄_b − ȳ_b)²/N (how far
    predictions sit from observed rates — lower is better),
    resolution = Σ n_b·(ȳ_b − ȳ)²/N (how much the buckets actually
    separate outcomes — HIGHER is better), uncertainty = ȳ(1−ȳ) (the
    irreducible base-rate noise). The split answers "is my score bad
    because it is miscalibrated, or because it cannot discriminate?"
    — two different fixes.

    Engine-exact: scores arrive as e6 INTEGERS (the calibration_report
    contract); every term is a half-up e9 integer of exact products —
    rel_term = (SS_b − 1e6·p_b)²/(1000·n_b), res_term =
    1e9·(N·p_b − P·n_b)²/(n_b·N²), unc = 1e9·P·(N−P)/N² — carried in
    decimal(38,0)/HUGEINT, summed as exact integers (per-bucket rows,
    the benford no-float-sum-order rule). Both bounded frames are
    localCheckpointed (two consumers each — the r8 pin-haul rule).
    Exactness bound: 2e9·(N·p−P·n)² must fit decimal(38,0) — N up
    to ~1e7 worst-case; past that Spark raises (ANSI) rather than
    mis-reporting (the _den_dec convention).

    Output: one row per bucket — (bucket, n_rows, n_pos,
    mean_score_e6, pos_rate_e6, rel_term_e9, res_term_e9) plus the
    repeated scalars rel_e9 = half-up(Σrel_terms/N), res_e9 =
    half-up(Σres_terms/N), unc_e9 — ordered by bucket.
    """
    if n_buckets < 2:
        raise ValueError("need at least 2 buckets")
    dec = "decimal(38,0)"
    s = F.col(score_e6_col).cast("long")
    guard = F.when(
        (s < 0) | (s > 1_000_000),
        F.raise_error(
            F.format_string(
                "brier_decomposition: score_e6 %s outside [0, 1e6]", s
            )
        ).cast("long"),
    ).otherwise(s)
    bucket = F.least(
        F.expr(f"({score_e6_col} * {n_buckets}) div 1000000"),
        F.lit(n_buckets - 1),
    ).cast("long")
    base = df.select(
        guard.alias("__s"),
        bucket.alias("bucket"),
        F.col(label_col).cast("boolean").cast("long").alias("__y"),
    )
    agg = (
        base.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("__y").cast("long").alias("n_pos"),
            F.sum("__s").cast("long").alias("__ss"),
        )
        .localCheckpoint()
    )
    tot = agg.agg(
        F.sum("n_rows").cast("long").alias("__N"),
        F.sum("n_pos").cast("long").alias("__P"),
    )
    terms = (
        agg.crossJoin(F.broadcast(tot))
        .selectExpr(
            "bucket", "n_rows", "n_pos", "__N", "__P",
            "(2 * __ss + n_rows) div (2 * n_rows) AS mean_score_e6",
            "(2 * 1000000 * n_pos + n_rows) div (2 * n_rows)"
            " AS pos_rate_e6",
            f"""cast((2 * (cast(__ss as {dec}) - cast(1000000 as {dec})
                           * n_pos)
                        * (cast(__ss as {dec}) - cast(1000000 as {dec})
                           * n_pos)
                      + 1000 * n_rows)
                     div (2 * 1000 * n_rows) as long) AS rel_term_e9""",
            f"""cast((2 * 1000000000 * (cast(__N as {dec}) * n_pos
                                        - cast(__P as {dec}) * n_rows)
                        * (cast(__N as {dec}) * n_pos
                           - cast(__P as {dec}) * n_rows)
                      + cast(n_rows as {dec}) * __N * __N)
                     div (2 * cast(n_rows as {dec}) * __N * __N) as long)
                AS res_term_e9""",
        )
        .localCheckpoint()
    )
    sums = terms.agg(
        F.sum("rel_term_e9").cast("long").alias("__relsum"),
        F.sum("res_term_e9").cast("long").alias("__ressum"),
        F.first("__N").alias("__N2"),
        F.first("__P").alias("__P2"),
    ).selectExpr(
        "(2 * __relsum + __N2) div (2 * __N2) AS rel_e9",
        "(2 * __ressum + __N2) div (2 * __N2) AS res_e9",
        f"""cast((2 * 1000000000 * cast(__P2 as {dec}) * (__N2 - __P2)
                  + cast(__N2 as {dec}) * __N2)
                 div (2 * cast(__N2 as {dec}) * __N2) as long) AS unc_e9""",
    )
    return (
        terms.crossJoin(F.broadcast(sums))
        .select(
            "bucket", "n_rows", "n_pos", "mean_score_e6", "pos_rate_e6",
            "rel_term_e9", "res_term_e9", "rel_e9", "res_e9", "unc_e9",
        )
        .orderBy("bucket")
    )


def cohens_kappa_2x2(
    df: DataFrame,
    rater_a: Column,
    rater_b: Column,
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) for two binary raters — agreement
    BEYOND CHANCE, the honest replacement for raw accuracy when one
    class dominates (two raters who both say "not-English" to 95% of
    docs agree 90%+ by luck alone; kappa strips that out):

        kappa = (p_o − p_e) / (1 − p_e)
              = (n·(n11+n00) − (r1·c1 + r2·c2))
                / (n² − (r1·c1 + r2·c2))

    with r = rater-A margins, c = rater-B margins. The curation use:
    "does my cheap heuristic labeler actually AGREE with the trusted
    labels, or only as much as chance would?" kappa ≥ ~0.6 is the
    usual "substantial agreement" bar.

    Engine-exact the chi_square_2x2 way: four exact cells from ONE
    aggregate, margin products in decimal(38,0) (HUGEINT twin), then
    ONE IEEE division of exact integers, UNROUNDED. Both-raters-
    constant tables (p_e = 1 → 0/0) yield NULL.

    Output: one row (n11, n10, n01, n00, kappa).
    """
    a = rater_a.cast("boolean")
    b = rater_b.cast("boolean")
    cells = df.agg(
        F.sum(F.when(a & b, 1).otherwise(0)).cast("long").alias("n11"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).cast("long").alias("n10"),
        F.sum(F.when(~a & b, 1).otherwise(0)).cast("long").alias("n01"),
        F.sum(F.when(~a & ~b, 1).otherwise(0)).cast("long").alias("n00"),
    )
    dec = "decimal(38,0)"
    return cells.selectExpr(
        "n11", "n10", "n01", "n00",
        f"""
        CASE WHEN (cast(n11 + n10 + n01 + n00 as {dec})
                   * (n11 + n10 + n01 + n00))
                  - (cast(n11 + n10 as {dec}) * (n11 + n01)
                     + cast(n01 + n00 as {dec}) * (n10 + n00)) = 0
             THEN CAST(NULL AS DOUBLE)
             ELSE cast((cast(n11 + n10 + n01 + n00 as {dec})
                        * (n11 + n00))
                       - (cast(n11 + n10 as {dec}) * (n11 + n01)
                          + cast(n01 + n00 as {dec}) * (n10 + n00))
                       as double)
                  / cast((cast(n11 + n10 + n01 + n00 as {dec})
                          * (n11 + n10 + n01 + n00))
                         - (cast(n11 + n10 as {dec}) * (n11 + n01)
                            + cast(n01 + n00 as {dec}) * (n10 + n00))
                         as double)
        END AS kappa""",
    )


def fisher_exact_2x2(
    df: DataFrame,
    variant: Column,
    success: Column,
    max_n: int = 32_768,
) -> DataFrame:
    """Fisher's EXACT test for a 2x2 table — the small-sample
    companion of :func:`chi_square_2x2` (whose chi² approximation
    breaks down when any expected cell < ~5): the two-sided p-value
    is the total hypergeometric probability of every table, at the
    observed margins, that is no more likely than the observed one
    (the "method of small p-values" — what R's fisher.test reports).

    Engine-exact pipeline, every float op shared bit-for-bit:

    1. log-factorials as PER-QUANTITY e6 sums: lf(k) = Σ_{j≤k}
       round(1e6·ln j) over a bounded 0..n range with a prefix sum —
       each ln(j) e6-rounds identically in both engines (the
       nll/keyness idiom), so lf is the SAME integer table everywhere.
    2. per-support-point log-likelihood lsum(x) = −(lf[x] + lf[r1−x]
       + lf[c1−x] + lf[r2−c1+x]) — exact integer sums; the
       "more extreme" comparison lsum(x) <= lsum(a) compares
       identical integers, so selection is engine-exact (ties at the
       symmetric point included).
    3. probabilities re-enter as e9 integers: t(x) = round(1e9·
       exp((lsum(x) − max lsum)/1e6)) — exp of an exact-integer/1e6
       double (the rmst idiom); p = Σ_selected t / Σ_all t is ONE
       IEEE division of exact BIGINT sums (the pearson_exact class).

    The e6/e9 quantization makes this a DETERMINISTIC approximation
    of the exact rational Fisher p (relative error ~1e-6 on the log
    scale, terms below 5e-10 of the mode vanish); significance calls
    at any sane threshold are unaffected, and both engines agree
    bit-for-bit. ``max_n`` guards the bounded lf/support frames (the
    bounded-rollup contract; Fisher is the SMALL-table gate — use
    chi_square_2x2 on large ones). The default 32768 MATCHES the
    catalog oracle's ``generate_series(0, 32768)`` bound — raising it
    past the oracle bound silently drops support rows on the DuckDB
    side, so keep the two in lockstep.

    Output: one row (n11, n10, n01, n00, support_n, lsum_obs_e6,
    p_fisher). Zero-margin tables yield NULL p.
    """
    v = variant.cast("boolean")
    s = success.cast("boolean")
    spark = df.sparkSession
    cells = df.agg(
        F.sum(F.when(v & s, 1).otherwise(0)).cast("long").alias("n11"),
        F.sum(F.when(v & ~s, 1).otherwise(0)).cast("long").alias("n10"),
        F.sum(F.when(~v & s, 1).otherwise(0)).cast("long").alias("n01"),
        F.sum(F.when(~v & ~s, 1).otherwise(0)).cast("long").alias("n00"),
    ).collect()[0]
    n11, n10, n01, n00 = cells["n11"], cells["n10"], cells["n01"], cells["n00"]
    n = n11 + n10 + n01 + n00
    if n > max_n:
        raise ValueError(
            f"table total {n} exceeds max_n={max_n}: Fisher's exact "
            "test is the small-table gate — use chi_square_2x2"
        )
    r1, r2, c1 = n11 + n10, n01 + n00, n11 + n01
    one_row = spark.range(1).selectExpr(
        f"{n11}L AS n11", f"{n10}L AS n10", f"{n01}L AS n01",
        f"{n00}L AS n00",
    )
    if r1 == 0 or r2 == 0 or c1 == 0 or (n - c1) == 0:
        return one_row.selectExpr(
            "n11", "n10", "n01", "n00",
            "cast(0 as long) AS support_n",
            "cast(null as long) AS lsum_obs_e6",
            "cast(null as double) AS p_fisher",
        )
    from pyspark.sql.window import Window

    # bounded frames: lf over 0..n, support over the feasible x range
    lf = (
        spark.range(0, n + 1)
        .select(
            F.col("id").cast("long").alias("k"),
            F.when(
                F.col("id") >= 2, F.round(F.log(F.col("id").cast("double")) * 1e6)
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("l"),
        )
        .withColumn("lf", F.sum("l").over(Window.orderBy("k")))
        .select("k", "lf")
        .localCheckpoint()  # 4 join consumers: never replay the range
    )
    lo, hi = max(0, c1 - r2), min(r1, c1)
    sup = spark.range(lo, hi + 1).select(F.col("id").cast("long").alias("x"))
    for alias_, expr in (
        ("lx", "x"),
        ("lr1", f"{r1} - x"),
        ("lc1", f"{c1} - x"),
        ("lr2", f"{r2 - c1} + x"),
    ):
        sup = sup.join(
            F.broadcast(lf.selectExpr(f"k AS __k_{alias_}", f"lf AS {alias_}")),
            F.expr(f"__k_{alias_} = {expr}"),
        ).drop(f"__k_{alias_}")
    sup = sup.selectExpr("x", "-(lx + lr1 + lc1 + lr2) AS lsum").localCheckpoint()
    stats = (
        sup.crossJoin(
            F.broadcast(
                sup.agg(
                    F.max("lsum").alias("__m"),
                    F.max(F.when(F.col("x") == n11, F.col("lsum"))).alias(
                        "__obs"
                    ),
                )
            )
        )
        .selectExpr(
            "x", "lsum", "__obs",
            """cast(round(1e9 * exp(cast(lsum - __m as double) / 1e6))
                    as long) AS t""",
        )
        .agg(
            F.count("*").cast("long").alias("support_n"),
            F.first("__obs").alias("lsum_obs_e6"),
            F.sum(F.when(F.col("lsum") <= F.col("__obs"), F.col("t"))).alias(
                "__sel"
            ),
            F.sum("t").alias("__all"),
        )
    )
    return one_row.crossJoin(F.broadcast(stats)).selectExpr(
        "n11", "n10", "n01", "n00", "support_n", "lsum_obs_e6",
        "cast(__sel as double) / cast(__all as double) AS p_fisher",
    )


def chi_square_2x2(
    df: DataFrame,
    variant: Column,
    success: Column,
) -> DataFrame:
    """2x2 chi-square test of independence — the classical A/B
    significance readout next to :func:`bootstrap_ab_lift`'s CI:
    chi2 = N·(n11·n00 − n10·n01)² / (r1·r2·c1·c2) over the
    variant × success contingency counts. chi2 >= 3.841 rejects
    independence at p < 0.05 (1 dof).

    Engine-exact the pearson_exact way: the four cells are exact
    integer counts from ONE aggregate; the determinant is computed in
    decimal(38,0) (exact to ~1e19-row cells, HUGEINT twin in DuckDB);
    the closed form is then a fixed-parenthesization chain of IEEE
    double ops on exactly-representable inputs, so the unrounded
    double matches any engine bit-for-bit. Zero-margin tables (an
    empty row or column) yield NULL chi2 on both sides via the 0
    denominator guard.

    Scale: one map-side-combined aggregate over the scan — no
    shuffle wider than 4 longs.

    Output: one row (n11, n10, n01, n00, chi2).
    """
    v = variant.cast("boolean")
    s = success.cast("boolean")
    cells = df.agg(
        F.sum(F.when(v & s, 1).otherwise(0)).cast("long").alias("n11"),
        F.sum(F.when(v & ~s, 1).otherwise(0)).cast("long").alias("n10"),
        F.sum(F.when(~v & s, 1).otherwise(0)).cast("long").alias("n01"),
        F.sum(F.when(~v & ~s, 1).otherwise(0)).cast("long").alias("n00"),
    )
    return cells.selectExpr(
        "n11", "n10", "n01", "n00",
        # det exact in decimal(38,0); every later op is one IEEE double
        # step in a pinned order (matches the DuckDB twin textually)
        """
        CASE WHEN n11 + n10 = 0 OR n01 + n00 = 0
               OR n11 + n01 = 0 OR n10 + n00 = 0
             THEN CAST(NULL AS DOUBLE)
             ELSE (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                   * CAST(CAST(n11 AS decimal(38,0)) * n00
                          - CAST(n10 AS decimal(38,0)) * n01 AS DOUBLE)
                   * CAST(CAST(n11 AS decimal(38,0)) * n00
                          - CAST(n10 AS decimal(38,0)) * n01 AS DOUBLE))
                  / (CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE)
                     * CAST(n11 + n01 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
        END AS chi2
        """,
    )


def welch_ttest(
    df: DataFrame,
    variant: Column,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on a fixed-point
    metric column — the "is the average different" companion to
    :func:`chi_square_2x2`'s rate test and :func:`bootstrap_ab_lift`'s
    CI: t = (m_a − m_b) / sqrt(s²_a/n_a + s²_b/n_b), with the
    Welch–Satterthwaite degrees of freedom emitted beside it
    (|t| >= ~1.96 at large df rejects equal means at p < 0.05).

    Engine-exact the pearson_exact way: ``value·scale`` is an exact
    integer per row (cents), so every sufficient statistic
    (n, Σx, Σx²) accumulates exactly in decimal(38,0) (HUGEINT twin);
    the closed form is then a fixed-parenthesization chain of IEEE
    correctly-rounded double ops over those exact integers, so t and
    df match any engine bit-for-bit UNROUNDED. Degenerate inputs
    (a group smaller than 2, or both groups zero-variance) yield NULL
    t/df on both sides via integer-exact CASE guards.

    Scale: one map-side-combined aggregate over the scan — the
    shuffle is six 16-byte decimals, nothing else.

    Output: one row (n_a, n_b, mean_a, mean_b, t_stat, df_welch);
    means are back in original units (exactly two IEEE divisions).
    """
    v = variant.cast("boolean")
    dec = "decimal(38,0)"
    x = F.round(F.col(value_col) * F.lit(scale)).cast(dec)
    zero = F.lit(0).cast(dec)
    cells = df.select(v.alias("__v"), x.alias("__x")).agg(
        F.sum(F.when(F.col("__v"), 1).otherwise(0)).cast(dec).alias("na"),
        F.sum(F.when(~F.col("__v"), 1).otherwise(0)).cast(dec).alias("nb"),
        F.sum(F.when(F.col("__v"), F.col("__x")).otherwise(zero)).alias("sa"),
        F.sum(F.when(~F.col("__v"), F.col("__x")).otherwise(zero)).alias("sb"),
        F.sum(
            F.when(F.col("__v"), F.col("__x") * F.col("__x")).otherwise(zero)
        ).alias("qa"),
        F.sum(
            F.when(~F.col("__v"), F.col("__x") * F.col("__x")).otherwise(zero)
        ).alias("qb"),
    )
    # s²/n per group: exact-integer numerators, then a pinned chain of
    # two IEEE divisions (textually mirrored by the DuckDB twin).
    # try_divide == / bit-for-bit on nonzero divisors; it only differs
    # on the degenerate n<2 groups (NULL instead of an ANSI error),
    # which the output CASE guards turn into NULL t/df anyway.
    mid = cells.selectExpr(
        "na", "nb", "sa", "sb", "qa", "qb",
        "try_divide(try_divide(CAST(na * qa - sa * sa AS DOUBLE),"
        " CAST(na * (na - 1) AS DOUBLE)), CAST(na AS DOUBLE)) AS se2a",
        "try_divide(try_divide(CAST(nb * qb - sb * sb AS DOUBLE),"
        " CAST(nb * (nb - 1) AS DOUBLE)), CAST(nb AS DOUBLE)) AS se2b",
    )
    guard = (
        "na < 2 OR nb < 2"
        " OR (na * qa - sa * sa = 0 AND nb * qb - sb * sb = 0)"
    )
    return mid.selectExpr(
        "CAST(na AS LONG) AS n_a",
        "CAST(nb AS LONG) AS n_b",
        f"try_divide(CAST(sa AS DOUBLE), CAST(na AS DOUBLE))"
        f" / CAST({scale} AS DOUBLE) AS mean_a",
        f"try_divide(CAST(sb AS DOUBLE), CAST(nb AS DOUBLE))"
        f" / CAST({scale} AS DOUBLE) AS mean_b",
        f"""
        CASE WHEN {guard} THEN CAST(NULL AS DOUBLE)
             ELSE (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                   - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                  / sqrt(se2a + se2b)
        END AS t_stat
        """,
        f"""
        CASE WHEN {guard} THEN CAST(NULL AS DOUBLE)
             ELSE ((se2a + se2b) * (se2a + se2b))
                  / (se2a * se2a / CAST(na - 1 AS DOUBLE)
                     + se2b * se2b / CAST(nb - 1 AS DOUBLE))
        END AS df_welch
        """,
    )


def _rank_groups(
    df: DataFrame,
    variant: Column,
    value_col: str,
    scale: int,
) -> DataFrame:
    """Shared per-distinct-value frame for the rank statistics: group
    the fixed-point metric into distinct values with per-variant
    counts, then attach distributed inclusive prefix counts over the
    value order via :func:`etl.global_cumsum` (never a single-reducer
    global window). Distinct fixed-point values bound the frame —
    cents of a bounded metric, the quantile-histogram class — so the
    cumsum's per-partition offset collect stays bounded metadata.

    Output: one row per distinct value v with (ca, cb, c, cum_ca,
    cum_cb, cum_c) — counts long, prefixes inclusive.
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    x = df.select(
        variant.cast("boolean").alias("__v"),
        F.round(F.col(value_col) * F.lit(scale)).cast("long").alias("v"),
    )
    g = x.groupBy("v").agg(
        F.sum(F.when(F.col("__v"), 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(~F.col("__v"), 1).otherwise(0)).cast("long").alias("cb"),
        F.count("*").cast("long").alias("c"),
    )
    return global_cumsum(g, [F.col("v")], ["ca", "cb", "c"])


def mannwhitney_u(
    df: DataFrame,
    variant: Column,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Mann–Whitney U rank-sum test — the distribution-free companion
    to :func:`welch_ttest`: "does variant A stochastically dominate
    B", robust to the heavy tails and outliers that wreck a means
    test. U_A counts pairs (a, b) with a > b (ties half); the
    tie-corrected normal approximation z = (U − n_a·n_b/2) / sqrt(Var)
    with Var = n_a·n_b·((n+1)·n·(n−1) − Σ(t³−t)) / (12·n·(n−1)) is
    emitted beside it (|z| ≥ ~1.96 rejects at p < 0.05).

    Engine-exact the pearson_exact way: ``value·scale`` is an exact
    integer per row, so tied-rank arithmetic doubles exactly —
    2·avgrank of a tie group = 2·(count before) + (group size) + 1 —
    and every sufficient statistic (n_a, n_b, 2·R_A = Σ ca·(2s+c+1),
    tie term T = Σ c³−c) accumulates exactly in decimal(38,0)
    (HUGEINT twin). The closed form is then a pinned-parenthesization
    chain of IEEE doubles over those exact integers — U and z match
    any engine bit-for-bit UNROUNDED. Degenerate inputs (an empty
    variant, or every value tied) yield NULL z via integer guards.

    Scale: one groupBy on the fixed-point value (map-side combined),
    one range-partitioned prefix sum over the distinct-value frame,
    one single-row aggregate. No global window, no collect beyond the
    cumsum's per-partition offsets.

    Output: one row (n_a, n_b, u_a, z_stat); u_a in half-unit-exact
    doubles (ties make U half-integral).
    """
    dec = "decimal(38,0)"
    cg = _rank_groups(df, variant, value_col, scale)
    # s = exclusive prefix of the pooled count; 2*avgrank = 2s + c + 1.
    agg = cg.selectExpr(
        "ca", "cb", "c", "cum_c - c AS s"
    ).agg(
        F.sum("ca").cast(dec).alias("na"),
        F.sum("cb").cast(dec).alias("nb"),
        F.sum(
            (F.col("ca") * (2 * F.col("s") + F.col("c") + 1)).cast(dec)
        ).alias("r2a"),
        F.sum(
            (F.col("c") * F.col("c") * F.col("c") - F.col("c")).cast(dec)
        ).alias("t"),
    )
    guard = (
        "na = 0 OR nb = 0"
        " OR (na + nb + 1) * (na + nb) * (na + nb - 1) - t = 0"
    )
    return agg.selectExpr(
        "CAST(na AS LONG) AS n_a",
        "CAST(nb AS LONG) AS n_b",
        "CAST(r2a - na * (na + 1) AS DOUBLE) / 2 AS u_a",
        f"""
        CASE WHEN {guard} THEN CAST(NULL AS DOUBLE)
             ELSE (CAST(r2a - na * (na + 1) - na * nb AS DOUBLE) / 2)
                  / sqrt(CAST(na * nb *
                              ((na + nb + 1) * (na + nb) * (na + nb - 1) - t)
                              AS DOUBLE)
                         / CAST(12 * (na + nb) * (na + nb - 1) AS DOUBLE))
        END AS z_stat
        """,
    )


def ks_2sample(
    df: DataFrame,
    variant: Column,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance — the whole-distribution
    drift test next to :func:`mannwhitney_u`'s location test:
    D = sup_x |F_A(x) − F_B(x)|, the classic gate for "did this
    feature's distribution shift between dataset versions". Both
    ECDFs are step functions jumping only at pooled sample points, so
    the sup is attained at a distinct value of the pooled sample.

    Engine-exact by integer cross-multiplication (the split-boundary
    idiom): at each distinct value, |cum_a·n_b − cum_b·n_a| is an
    exact integer, its max an exact integer, and D is ONE IEEE
    division of exact integers — bit-exact unrounded in any engine.
    The argmax value is made deterministic by (diff DESC, value ASC).

    Scale: groupBy on the fixed-point value, range-partitioned prefix
    sums, then top-1 by the integer diff (TakeOrdered — never a
    global sort).

    Output: one row (n_a, n_b, d_num, d_stat, at_value): d_stat =
    d_num / (n_a·n_b), at_value the smallest value attaining it.
    """
    cg = _rank_groups(df, variant, value_col, scale)
    tot = cg.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    d = cg.crossJoin(F.broadcast(tot)).selectExpr(
        "v", "na", "nb",
        "abs(cum_ca * nb - cum_cb * na) AS dn",
    )
    top = d.orderBy(F.desc("dn"), F.asc("v")).limit(1)
    return top.selectExpr(
        "na AS n_a",
        "nb AS n_b",
        "dn AS d_num",
        "CAST(dn AS DOUBLE) / CAST(na * nb AS DOUBLE) AS d_stat",
        f"CAST(v AS DOUBLE) / {scale} AS at_value",
    )


def fd_violation_report(
    df: DataFrame,
    deps: list,
) -> DataFrame:
    """Functional-dependency profiling (the Metanome-family check):
    for each candidate dependency ``LHS -> rhs``, does every LHS group
    determine exactly one rhs value? The workhorse of schema
    discovery, key validation, and denormalization audits — "is
    o_orderkey really a key", "does customer determine nation" — and
    the report a data-contract gate reads before trusting a join key.

    ``deps`` is a list of (lhs_cols: list[str] | str, rhs_col: str).
    For each dependency ONE hash aggregate computes per-LHS-group
    distinct-rhs counts (map-side combined — the shuffle is LHS-keyed
    groups, never rows), then one tiny rollup: group counts, how many
    groups VIOLATE (>1 distinct rhs), how many rows sit inside
    violating groups (the repair cost), and the worst group's distinct
    count. Dependencies are unioned into one report frame; all counts
    exact BIGINTs.

    Output: (lhs, rhs, n_groups, n_violating_groups, n_violating_rows,
    max_distinct_rhs) — a dependency HOLDS iff n_violating_groups = 0.
    """
    if not deps:
        raise ValueError("deps must name at least one candidate dependency")
    out = None
    for lhs, rhs in deps:
        lhs_cols = [lhs] if isinstance(lhs, str) else list(lhs)
        g = (
            df.groupBy(*lhs_cols)
            .agg(
                F.countDistinct(rhs).cast("long").alias("__d"),
                F.count("*").cast("long").alias("__n"),
            )
            .agg(
                F.lit(",".join(lhs_cols)).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count("*").cast("long").alias("n_groups"),
                F.sum(F.when(F.col("__d") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_groups"),
                F.sum(F.when(F.col("__d") > 1, F.col("__n")).otherwise(0))
                .cast("long")
                .alias("n_violating_rows"),
                F.max("__d").cast("long").alias("max_distinct_rhs"),
            )
        )
        out = g if out is None else out.unionByName(g)
    return out


def theil_sen_slope(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil–Sen robust trend estimator: the MEDIAN of all pairwise
    slopes (y_j − y_i)/(x_j − x_i) — the slope estimate with a 29.3%
    breakdown point, immune to the outlier days that wreck OLS (the
    robust companion to :func:`zipf_fit`-style exact OLS).

    Caller contract: ``df`` is a BOUNDED pre-aggregate (a daily/hourly
    rollup — the pair frame is n(n−1)/2 rows and the median window is
    global; both are fine for series of thousands of points, which is
    what a rollup produces at any corpus scale — never feed raw
    events). x and y must be exact integers.

    Engine-exact: each slope is ONE IEEE division of exact integers
    (bit-identical in any engine); the lower median is selected by
    deterministic order (slope, x1, x2) at rank (n_pairs+1) div 2, so
    even duplicate slope values pick the same row. Emitted UNROUNDED.

    Output: one row (n_pairs, slope, x1, x2) — the selected median
    pair rides along as determinism evidence.
    """
    a = df.select(F.col(x_col).cast("long").alias("x1"),
                  F.col(y_col).cast("long").alias("y1"))
    b = df.select(F.col(x_col).cast("long").alias("x2"),
                  F.col(y_col).cast("long").alias("y2"))
    pairs = a.join(b, F.col("x1") < F.col("x2")).select(
        "x1",
        "x2",
        (
            (F.col("y2") - F.col("y1")).cast("double")
            / (F.col("x2") - F.col("x1")).cast("double")
        ).alias("slope"),
    )
    from pyspark.sql.window import Window

    n = pairs.agg(F.count("*").cast("long").alias("n_pairs"))
    w = Window.orderBy("slope", "x1", "x2")
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(n))
        .filter(F.col("__rn") == F.expr("(n_pairs + 1) div 2"))
        .select("n_pairs", "slope", "x1", "x2")
    )


# log10(1 + 1/d) e6-scaled; sums to exactly 1_000_000
_BENFORD_E6 = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_first_digit(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Benford's-law first-digit audit — the classic fabricated-data
    detector for money-like columns: naturally-occurring amounts put
    ~30.1% of first digits on 1, fabricated or unit-mixed data does
    not. Emits the per-digit observed count against the expected
    Benford share and that digit's chi-square contribution; a release
    gate thresholds max/sum of the contributions.

    Engine-exact: the first digit comes from the DECIMAL STRING of the
    fixed-point integer (no log10 — a float log on a power of 10 can
    land 2.9999...); expected shares are fixed e6 integer constants
    (summing to exactly 1e6); each contribution
    (1e6·obs − n·exp)² / (1e6·n·exp) is ONE IEEE division of exact
    decimal(38,0) integers (HUGEINT twin), per-digit per-row so no
    cross-row float summation order exists. One map-side-combined
    groupBy over 9 keys.

    Output: (digit, n_obs, n_total, expected_e6, chi2_term), digits
    with zero observations included (expected counts still penalize).
    """
    spark = df.sparkSession
    exp = local_df(
        spark, sorted(_BENFORD_E6.items()), "digit int, expected_e6 long"
    )
    cents = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    obs = (
        df.select(cents.alias("__v"))
        .filter(F.col("__v") > 0)
        .select(
            F.substring(F.col("__v").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    n = obs.agg(F.sum("n_obs").cast("long").alias("n_total"))
    dec = "decimal(38,0)"
    return (
        F.broadcast(exp)
        .join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "digit",
            "coalesce(n_obs, 0L) AS n_obs",
            "n_total",
            "expected_e6",
            f"""
            CAST((1000000 * CAST(coalesce(n_obs, 0L) AS {dec})
                  - CAST(n_total AS {dec}) * expected_e6)
                 * (1000000 * CAST(coalesce(n_obs, 0L) AS {dec})
                    - CAST(n_total AS {dec}) * expected_e6) AS DOUBLE)
            / CAST(1000000 * CAST(n_total AS {dec}) * expected_e6 AS DOUBLE)
            AS chi2_term
            """,
        )
    )


def cuped_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the
    experimentation-platform staple: adjust the experiment metric Y by
    a pre-period covariate X (Y_adj = Y − θ·(X − X̄), θ =
    cov(X,Y)/var(X)) and report how much metric variance the
    adjustment removes — smaller variance ⇒ smaller detectable effect
    at the same sample size.

    Engine-exact the pearson_exact way: one map-side-combined
    aggregate collects the exact decimal(38,0) sufficient statistics
    (inputs must be exact integers — fixed-point first), then

        θ        = dxy / dxx
        var(Y)   = dyy / n²
        var(Yadj)= (dxx·dyy − dxy²) / (n²·dxx)
        r²       = dxy² / (dxx·dyy)     (the variance-reduction share)

    with d·· = n·Σ·· − Σ·Σ· — every numerator and denominator an exact
    decimal product (bounds: |d··| ≲ n·Σ·², so the dxx·dyy products
    stay inside decimal(38,0) up to ~1e19-scale sums), each emitted
    value ONE IEEE division, UNROUNDED. Zero-variance X or Y yields
    NULLs via try_divide, never an ANSI error.

    Output: one row (n_rows, theta, var_y, var_y_adj, r2).
    """
    dec = "decimal(38,0)"
    g = df.select(
        F.col(x_col).cast("long").cast(dec).alias("__x"),
        F.col(y_col).cast("long").cast(dec).alias("__y"),
    ).agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    return g.selectExpr(
        "CAST(n AS LONG) AS n_rows",
        "try_divide(CAST(n * sxy - sx * sy AS DOUBLE),"
        "           CAST(n * sxx - sx * sx AS DOUBLE)) AS theta",
        "try_divide(CAST(n * syy - sy * sy AS DOUBLE),"
        "           CAST(n * n AS DOUBLE)) AS var_y",
        "try_divide(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)"
        "                - (n * sxy - sx * sy) * (n * sxy - sx * sy)"
        "                AS DOUBLE),"
        "           CAST(n * n * (n * sxx - sx * sx) AS DOUBLE))"
        " AS var_y_adj",
        "try_divide(CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE),"
        "           CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE))"
        " AS r2",
    )


def mann_kendall_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mann–Kendall trend test — the significance companion to
    :func:`theil_sen_slope`: S = Σ_{i<j} sign(y_j − y_i) counts
    concordant minus discordant pairs over the time order; the
    tie-corrected normal approximation z = (S ∓ 1)/√Var with
    Var = (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18 rejects "no trend" at
    |z| ≥ ~1.96. Nonparametric: a single outlier moves S by at most
    n−1, where it moves an OLS slope arbitrarily.

    Same bounded-preaggregate contract as Theil–Sen (the pair frame is
    n(n−1)/2 over a rollup, never raw events; x must be a total order,
    y exact integers). Engine-exact: S and the tie term are exact
    integer sums in decimal(38,0); z is a pinned IEEE chain over those
    integers with the standard continuity correction (S>0 → S−1,
    S<0 → S+1, S=0 → z=0), NULL on degenerate variance.

    Output: one row (n_points, s_stat, z_stat).
    """
    dec = "decimal(38,0)"
    a = df.select(F.col(x_col).cast("long").alias("x1"),
                  F.col(y_col).cast("long").alias("y1"))
    b = df.select(F.col(x_col).cast("long").alias("x2"),
                  F.col(y_col).cast("long").alias("y2"))
    s = (
        a.join(b, F.col("x1") < F.col("x2"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("y2") - F.col("y1")).cast("double")
                ).cast("long")
            ).cast(dec).alias("s")
        )
    )
    n = df.agg(F.count("*").cast(dec).alias("n"))
    ties = (
        df.groupBy(F.col(y_col).cast("long").alias("__y"))
        .agg(F.count("*").cast(dec).alias("t"))
        .agg(
            F.sum(
                F.expr("t * (t - 1) * (2 * t + 5)")
            ).cast(dec).alias("tt")
        )
    )
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .selectExpr(
            "CAST(n AS LONG) AS n_points",
            "CAST(s AS LONG) AS s_stat",
            """
            CASE WHEN n * (n - 1) * (2 * n + 5) - tt = 0 THEN CAST(NULL AS DOUBLE)
                 WHEN s = 0 THEN 0.0D
                 ELSE CAST(s - CAST(sign(CAST(s AS DOUBLE)) AS {d}) AS DOUBLE)
                      / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18.0D)
            END AS z_stat
            """.replace("{d}", "decimal(38,0)"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    num_partitions: int | None = None,
) -> DataFrame:
    """Kaplan–Meier survival estimator with right-censoring — the
    standard nonparametric answer to "how long until a user churns /
    a job fails / the next purchase lands" when some spells are still
    open at observation end (Kaplan & Meier 1958).

    Input: one row per spell with an integer ``duration`` and
    ``event`` = 1 if the terminal event was observed, 0 if the spell
    is right-censored at ``duration``. At each distinct duration t the
    at-risk count is n_t = Σ_{u≥t} (events_u + censored_u) and the
    product-limit estimate multiplies (1 − d_t/n_t) over event times
    ≤ t. Engine-portable output: the curve is emitted as
    ``log_surv_e6`` = Σ e6-rounded ln((n_t − d_t)/n_t) — each term is
    ln of a quotient of exact BIGINTs (both engines hold the same
    IEEE double; the dsir/pmi idiom), summed as exact integers, so
    S(t) = exp(log_surv_e6 / 1e6) is recoverable without any
    cross-engine float accumulation. After an absorbing time
    (d_t = n_t, survival hits exactly 0) ``log_surv_e6`` is NULL.

    Scale shape: one groupBy(duration) aggregate (map-side combine),
    then two range-partitioned prefix sums via
    :func:`data_misc_tools_spark.operators.etl.global_cumsum` — the
    at-risk suffix sum and the log-survival running sum — never an
    unpartitioned ``ORDER BY`` window (single-reducer). The duration
    rollup localCheckpoints before fan-out: its four downstream
    consumers (each cumsum reads its input twice — prefix path +
    offsets aggregate) would otherwise each re-plan the full spell
    pipeline under per-branch column pruning (0 ReusedExchange, 4
    input scans measured — the tfidf/nb_train lesson); checkpointed,
    the input is scanned ONCE and everything downstream is bounded by
    the distinct-duration domain. The total-row scalar broadcasts.

    Output: (duration, n_risk, n_event, n_censored, log_surv_e6),
    one row per distinct duration.
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    ev = F.col(event_col).cast("long")
    per = (
        df.select(
            F.col(duration_col).cast("long").alias("duration"),
            ev.alias("__e"),
        )
        .groupBy("duration")
        .agg(
            F.sum("__e").cast("long").alias("n_event"),
            (F.count("*") - F.sum("__e")).cast("long").alias("n_censored"),
            F.count("*").cast("long").alias("n_at"),
        )
        .localCheckpoint(eager=True)
    )
    tot = per.agg(F.sum("n_at").cast("long").alias("__n"))
    risk = (
        global_cumsum(per, ["duration"], ["n_at"], num_partitions)
        .crossJoin(F.broadcast(tot))
        .select(
            "duration", "n_event", "n_censored",
            (F.col("__n") - F.col("cum_n_at") + F.col("n_at")).alias("n_risk"),
        )
    )
    terms = risk.select(
        "duration", "n_risk", "n_event", "n_censored",
        F.when(
            (F.col("n_event") > 0) & (F.col("n_risk") > F.col("n_event")),
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("n_event")).cast("double")
                    / F.col("n_risk")
                )
                * 1e6
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("__term"),
        (
            (F.col("n_event") > 0) & (F.col("n_risk") == F.col("n_event"))
        ).cast("long").alias("__ab"),
    )
    out = global_cumsum(terms, ["duration"], ["__term", "__ab"], num_partitions)
    return out.select(
        "duration", "n_risk", "n_event", "n_censored",
        F.when(F.col("cum___ab") > 0, F.lit(None).cast("long"))
        .otherwise(F.col("cum___term"))
        .alias("log_surv_e6"),
    )


def inclusion_deps(
    cols: list,
) -> DataFrame:
    """Unary inclusion-dependency mining (the SINDY/Spider family,
    Kruse et al. 2015) — which columns' value sets are contained in
    which others', i.e. FOREIGN-KEY DISCOVERY: the profiling pass that
    proposes join keys on an undocumented lake before anyone writes a
    join. The companion to :func:`fd_violation_report` (keys) and
    :func:`fk_violations` (validating a KNOWN key).

    ``cols`` is a list of (label, DataFrame, column) candidates.
    SINDY's insight makes this one pipeline instead of O(k²) anti
    joins: distinct (value, attribute) pairs group BY VALUE into the
    attribute set that carries each value; every ordered pair (a, b)
    inside a set scores one co-occurrence, and a ⊆ b holds iff
    cooc(a, b) equals a's distinct-value count. NULLs are excluded
    (the SQL-standard IND convention); values compare as strings so
    heterogeneous candidates can be probed.

    Scale shape: per-candidate distinct is a map-side-combined
    aggregate; the value census is ONE value-keyed shuffle whose
    attribute-set explode is bounded by k² per value (k = candidate
    count, tens at most). Self-pairs are KEPT, so cooc(a, a) IS a's
    distinct count — both the totals and the overlaps come out of the
    same single aggregation, one scan per candidate table, and the
    ≤ k² census rows are a bounded-metadata collect (the codebook
    class). No pairwise scans, no anti joins — adding a candidate is
    linear, not quadratic.

    Output: (from_col, to_col, n_from, n_overlap, contained) for
    every ordered pair, contained = (n_overlap == n_from).
    """
    from functools import reduce

    if len(cols) < 2:
        raise ValueError("need at least two candidate columns")
    labels = [label for label, _, _ in cols]
    if len(set(labels)) != len(labels):
        raise ValueError("candidate labels must be unique")
    parts = [
        df.where(F.col(c).isNotNull())
        .select(F.col(c).cast("string").alias("v"))
        .distinct()
        .select("v", F.lit(label).alias("c"))
        for label, df, c in cols
    ]
    pairs = reduce(lambda a, b: a.unionByName(b), parts)
    cells = pairs.groupBy("v").agg(F.collect_set("c").alias("cs"))
    cnt = {
        (r["a"], r["b"]): r["n"]
        for r in (
            cells.select(F.explode("cs").alias("a"), "cs")
            .select("a", F.explode("cs").alias("b"))  # a == b kept: the totals
            .groupBy("a", "b")
            .agg(F.count("*").cast("long").alias("n"))
            .collect()
        )
    }
    report = [
        (
            a,
            b,
            cnt.get((a, a), 0),
            cnt.get((a, b), 0),
            cnt.get((a, b), 0) == cnt.get((a, a), 0),
        )
        for a in labels
        for b in labels
        if a != b
    ]
    spark = cols[0][1].sparkSession
    # LocalRelation via VALUES (no Python-RDD hop — the cfgs lesson)
    vals = ", ".join(
        "('{}', '{}', {}L, {}L, {})".format(
            a.replace("'", "''"), b.replace("'", "''"), nf, ov, str(c).lower()
        )
        for a, b, nf, ov, c in report
    )
    return spark.sql(
        "SELECT * FROM VALUES "
        + vals
        + " AS t(from_col, to_col, n_from, n_overlap, contained)"
    )


def logrank_test(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "group",
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-group log-rank test (Mantel–Cox) — the significance
    companion to :func:`kaplan_meier`, exactly as
    :func:`mann_kendall_test` gates :func:`theil_sen_slope`: do the
    two groups' survival curves differ, or is the gap noise? At each
    event time the observed group-1 deaths are compared with the
    hypergeometric expectation given the at-risk margins; z =
    (O₁ − E₁)/√V is standard-normal under H₀.

    Engine-portable by construction: every per-time term is a HALF-UP
    e6 integer via the repo's (2A+B) div (2B) pattern —
    e1_e6 = ⌈1e6·d·n1/n⌋, r1_e6 = ⌈1e6·n1(n−n1)/n²⌋,
    v_e6 = ⌈d(n−d)·r1_e6/(n−1)⌋ — summed exactly in
    decimal(38,0) (HUGEINT twin), so the statistic is bit-identical
    across engines; z is one pinned IEEE chain over the exact sums
    (deviation from the unrounded textbook value is O(1e-6) per term,
    the ir_metrics/nDCG precedent). Products are widened so the bound
    is ~1e24 at a billion at-risk, far inside decimal(38,0). z is
    NULL on zero variance (a group empty at every event time).

    Scale shape: one (duration, group→flags) rollup (map-side
    combine), localCheckpointed before the fan-out (the kaplan_meier
    lesson), ONE range-partitioned prefix-sum pass carrying both
    at-risk counters, one global aggregate. Censored spells enter the
    at-risk sums and never the event terms — dropping them is the
    classic churn-analysis mistake this exists to prevent.

    Output: one row (n_spells, n_group1, o1, e1, v, z), e1/v as the
    e6 sums' pinned IEEE divisions (UNROUNDED doubles).
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    ev = F.col(event_col).cast("long")
    g = F.col(group_col).cast("long")
    per = (
        df.select(
            F.col(duration_col).cast("long").alias("duration"),
            ev.alias("__e"),
            g.alias("__g"),
        )
        .groupBy("duration")
        .agg(
            F.sum(F.col("__e") * F.col("__g")).cast("long").alias("d1"),
            F.sum("__e").cast("long").alias("d"),
            F.sum("__g").cast("long").alias("a1"),
            F.count("*").cast("long").alias("a"),
        )
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("a").cast("long").alias("__n"),
        F.sum("a1").cast("long").alias("__n1"),
    )
    risk = (
        global_cumsum(per, ["duration"], ["a", "a1"], num_partitions)
        .crossJoin(F.broadcast(tot))
        .select(
            "d1", "d",
            (F.col("__n") - F.col("cum_a") + F.col("a")).alias("n"),
            (F.col("__n1") - F.col("cum_a1") + F.col("a1")).alias("n1"),
            F.col("__n").alias("n_spells"),
            F.col("__n1").alias("n_group1"),
        )
        .where(F.col("d") > 0)
    )
    dec = "decimal(38,0)"
    terms = risk.selectExpr(
        "n_spells", "n_group1", "d1",
        # half-up e6 expectation and variance terms, exact integers
        f"(2 * 1000000 * cast(d as {dec}) * n1 + n) div (2 * n) AS e1_e6",
        f"""CASE WHEN n > 1 THEN
              (2 * cast(d as {dec}) * (n - d)
                 * ((2 * 1000000 * cast(n1 as {dec}) * (n - n1)
                     + cast(n as {dec}) * n)
                    div (2 * cast(n as {dec}) * n))
               + (n - 1)) div (2 * (n - 1))
            ELSE cast(0 as {dec}) END AS v_e6""",
    )
    return terms.groupBy("n_spells", "n_group1").agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_e6").cast(dec).alias("__e1_e6"),
        F.sum("v_e6").cast(dec).alias("__v_e6"),
    ).selectExpr(
        "n_spells", "n_group1", "o1",
        "cast(__e1_e6 as double) / 1e6 AS e1",
        "cast(__v_e6 as double) / 1e6 AS v",
        """CASE WHEN __v_e6 = 0 THEN cast(NULL as double)
                ELSE cast(o1 * 1000000 - __e1_e6 as double)
                     / sqrt(cast(__v_e6 as double) * 1e6)
           END AS z""",
    )


def unique_column_combinations(
    df: DataFrame,
    combos: list,
) -> DataFrame:
    """Unique-column-combination discovery (the HyUCC/DUCC problem,
    Heise et al. 2013) — which column combinations are KEYS: the third
    leg of the profiling tripod beside :func:`inclusion_deps` (foreign
    keys) and FD mining (derived columns). Run before declaring a
    dedup key or a merge key on an undocumented lake: a combo that
    LOOKS like a key but has duplicate groups silently drops rows in
    any keep-one pipeline built on it.

    ``combos`` is a list of column-name tuples/lists to test (bounded:
    the caller enumerates candidates, typically singletons + promising
    pairs — full lattice search is the client's loop, each level
    pruned by the previous report exactly as HyUCC prunes supersets of
    keys and subsets of non-keys).

    Scale shape: ONE scan. Each row explodes into one struct per
    candidate (values cast to string, padded with NULLs to the max
    arity), so the whole batch is a single explode + a single
    (combo, value-tuple) shuffle with map-side combine — never one
    job per candidate. NULLs group as values (the "key allows no
    duplicate tuples" reading; SQL UNIQUE semantics would need a
    null filter, which the caller can apply). The per-combo report is
    an aggregate over the census, all-distributed, no collect.

    Output: (cols, n_rows, n_groups, max_group_size, n_extra_rows,
    is_unique) — n_extra_rows = rows that would be dropped by a
    keep-one dedup on that combo; is_unique = (n_groups == n_rows).
    """
    if not combos:
        raise ValueError("need at least one candidate combo")
    norm = [tuple(c) for c in combos]
    labels = ["+".join(c) for c in norm]
    if len(set(labels)) != len(labels):
        raise ValueError("candidate combos must be unique")
    max_k = max(len(c) for c in norm)
    structs = []
    for label, combo in zip(labels, norm):
        fields = [F.lit(label).alias("cols")]
        fields += [
            F.col(c).cast("string").alias(f"k{i}") for i, c in enumerate(combo)
        ]
        fields += [
            F.lit(None).cast("string").alias(f"k{i}")
            for i in range(len(combo), max_k)
        ]
        structs.append(F.struct(*fields))
    keys = [f"k{i}" for i in range(max_k)]
    census = (
        df.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .groupBy("cols", *keys)
        .agg(F.count("*").cast("long").alias("c"))
    )
    return census.groupBy("cols").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.max("c").cast("long").alias("max_group_size"),
        F.sum(F.col("c") - 1).cast("long").alias("n_extra_rows"),
    ).withColumn("is_unique", F.col("n_groups") == F.col("n_rows"))


def expectations_report(
    df: DataFrame,
    checks: list,
) -> DataFrame:
    """Deequ-style declarative data-quality gate (Schelter et al.,
    "Automating large-scale data quality verification", VLDB 2018) —
    the contract a 100 TB ingest asserts BEFORE publishing a
    partition: every check compiles into one aggregate over ONE scan,
    and the report is a row per check with an exact satisfaction rate
    and a pass flag, so the pipeline can gate on `min(passed)`.

    Each check is a dict:
      {"check": "not_null",  "column": c}                  — c IS NOT NULL
      {"check": "distinct",  "column": c}                  — distinctness
          rate = n_distinct / n_rows (exact count_distinct; one Expand,
          no extra scan — swap to approx upstream if state matters)
      {"check": "satisfies", "column": label, "expr": sql} — row predicate
      {"check": "in_set",    "column": c, "values": [...]}
      {"check": "matches",   "column": c, "pattern": regex}
      {"check": "min_ge" | "max_le", "column": c, "value": v} — bound
          holds for EVERY row (counted per-row so the rate is
          meaningful, not a single min/max scalar)
    plus optional "min_rate_e6" (default 1_000_000 = must fully hold).

    Engine-portable: rate_e6 is the half-up integer (2·1e6·s + n) div
    (2n); pass = rate_e6 >= min_rate_e6. Empty tables pass vacuously
    (rate defined as 1e6 when n_rows = 0).

    Output: (check_id, check, column, n_rows, n_satisfied, rate_e6,
    min_rate_e6, passed), one row per check, ordered by check_id.
    """
    if not checks:
        raise ValueError("need at least one check")
    aggs = [F.count("*").cast("long").alias("__n")]
    meta = []
    for i, ch in enumerate(checks):
        kind = ch["check"]
        col = ch.get("column", "")
        if kind == "not_null":
            sat = F.sum(F.col(col).isNotNull().cast("long"))
        elif kind == "distinct":
            sat = F.count_distinct(F.col(col)).cast("long")
        elif kind == "satisfies":
            sat = F.sum(F.expr(ch["expr"]).cast("long"))
        elif kind == "in_set":
            sat = F.sum(F.col(col).isin(list(ch["values"])).cast("long"))
        elif kind == "matches":
            sat = F.sum(
                F.regexp_like(F.col(col), F.lit(ch["pattern"])).cast("long")
            )
        elif kind == "min_ge":
            sat = F.sum((F.col(col) >= F.lit(ch["value"])).cast("long"))
        elif kind == "max_le":
            sat = F.sum((F.col(col) <= F.lit(ch["value"])).cast("long"))
        else:
            raise ValueError(f"unknown check kind: {kind}")
        aggs.append(sat.cast("long").alias(f"__s{i}"))
        meta.append((i, kind, col, int(ch.get("min_rate_e6", 1_000_000))))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(i).cast("long").alias("check_id"),
            F.lit(kind).alias("check"),
            F.lit(col).alias("column"),
            F.col("__n").alias("n_rows"),
            F.coalesce(F.col(f"__s{i}"), F.lit(0).cast("long")).alias(
                "n_satisfied"
            ),
            F.lit(rate).cast("long").alias("min_rate_e6"),
        )
        for i, kind, col, rate in meta
    ]
    rep = row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
    rate_e6 = F.when(F.col("n_rows") == 0, F.lit(1_000_000).cast("long")).otherwise(
        F.expr("(2 * 1000000 * n_satisfied + n_rows) div (2 * n_rows)")
    )
    return (
        rep.withColumn("rate_e6", rate_e6.cast("long"))
        .withColumn("passed", F.col("rate_e6") >= F.col("min_rate_e6"))
        .select(
            "check_id", "check", "column", "n_rows", "n_satisfied",
            "rate_e6", "min_rate_e6", "passed",
        )
        .orderBy("check_id")
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    num_partitions: int | None = None,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator — the additive
    companion to :func:`kaplan_meier`: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over
    event times, the quantity whose slope IS the hazard rate (where
    is churn risk concentrated in time?), better-behaved than
    -ln(KM) in small risk sets and defined through absorbing times.

    Engine-portable: each per-time term is the HALF-UP e6 integer
    (2·1e6·d + n) div (2n) and the curve is their exact integer
    prefix sum — no float accumulation anywhere, unlike the KM curve
    which needs the ln idiom because its estimate is a product.

    Scale shape: identical to :func:`kaplan_meier` — one
    groupBy(duration) rollup (localCheckpointed: it feeds both
    range-partitioned prefix sums), at-risk counts from a suffix sum
    via :func:`...etl.global_cumsum`, never an unpartitioned window.

    Output: (duration, n_risk, n_event, n_censored, cumhaz_e6).
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    ev = F.col(event_col).cast("long")
    per = (
        df.select(
            F.col(duration_col).cast("long").alias("duration"),
            ev.alias("__e"),
        )
        .groupBy("duration")
        .agg(
            F.sum("__e").cast("long").alias("n_event"),
            (F.count("*") - F.sum("__e")).cast("long").alias("n_censored"),
            F.count("*").cast("long").alias("n_at"),
        )
        .localCheckpoint(eager=True)
    )
    tot = per.agg(F.sum("n_at").cast("long").alias("__n"))
    risk = (
        global_cumsum(per, ["duration"], ["n_at"], num_partitions)
        .crossJoin(F.broadcast(tot))
        .select(
            "duration", "n_event", "n_censored",
            (F.col("__n") - F.col("cum_n_at") + F.col("n_at")).alias("n_risk"),
        )
    )
    terms = risk.select(
        "duration", "n_risk", "n_event", "n_censored",
        F.expr(
            "(2 * 1000000 * n_event + n_risk) div (2 * n_risk)"
        ).cast("long").alias("__term"),
    )
    out = global_cumsum(terms, ["duration"], ["__term"], num_partitions)
    return out.select(
        "duration", "n_risk", "n_event", "n_censored",
        F.col("cum___term").cast("long").alias("cumhaz_e6"),
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list,
    k: int = 64,
) -> DataFrame:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002;
    Beyer et al. 2007 "On synopses for distinct-value estimation") —
    the ORDER-STATISTIC sketch beside the HLL rollup: keep the k
    smallest distinct hash values per group; if the k-th smallest is
    v on a hash space of M, the unbiased estimate is (k−1)·M/v.
    Unlike HLL its state is exact hash values, so sketches MERGE by
    plain UNION + re-rank (bottom-k of a union is the bottom-k of the
    concatenated bottom-k's) and support set operations downstream.

    Engine-portable by construction: the hash is the repo's
    md5-derived 32-bit idiom (DuckDB twin
    ``('0x'||substr(md5(x),1,8))::BIGINT``), M = 2^32, and the
    estimate is the HALF-UP integer (2·(k−1)·2³² + v) div (2v) — no
    floats anywhere. Groups with fewer than k distinct hashes report
    their EXACT distinct count (the standard KMV fallback), flagged
    ``is_exact``.

    Scale shape: distinct (group, hash) is one map-side-combined
    aggregate; the bottom-k rank window is GROUP-partitioned (never
    an unpartitioned sort); output is one row per group. At 100 TB
    the sketch column (k hashes/group) is what you'd persist per
    partition and merge at read time.

    Output: (group cols..., n_kept, kth_hash, estimate, is_exact).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql.window import Window

    h = F.expr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 8), 16, 10) as bigint)"
    )
    distinct_h = (
        df.select(*group_cols, h.alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    kept = distinct_h.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    m = 1 << 32
    return kept.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("__h").cast("long").alias("kth_hash"),
    ).select(
        *group_cols,
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(
                f"(2 * {(k - 1) * m}L + kth_hash) div (2 * kth_hash)"
            )
        )
        .cast("long")
        .alias("estimate"),
        (F.col("n_kept") < k).alias("is_exact"),
    )


def conformal_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    alpha_permille: int = 100,
    salt: str = "conf",
) -> DataFrame:
    """Mondrian split-conformal prediction intervals (Vovk et al.
    2005; Papadopoulos et al. 2002) for a per-group mean predictor —
    the DISTRIBUTION-FREE uncertainty gate: on exchangeable data the
    interval pred ± q̂ covers at least 1−α of unseen values per
    group, no matter how wrong the model is. The honest way to ship
    "expected value ± error bars" from a 100 TB log without
    distributional assumptions.

    Protocol: rows split 2/1/1 into train/calibration/test by the
    engine-portable md5 hash of ``id_col`` (deterministic, no RNG
    state). Train fits the predictor (half-up integer mean of the
    CENTS value per group); calibration takes
    q̂ = the ⌈(n+1)(1−α)⌉-th smallest |residual| (NULL when the rank
    exceeds n — the honest "not enough calibration data" answer,
    conformal's +∞); test reports achieved coverage as a half-up e6
    rate, the empirical check that should land ≥ 1−α in expectation.

    Engine-exact: residuals are integers; the order statistic is
    read off a per-group residual census with a GROUP-partitioned
    cumulative count (the mad_outlier_report route — tie order
    provably irrelevant: the j-th smallest VALUE of a multiset);
    every rate is the half-up integer pattern.

    Scale shape: one role-tagged scan feeding three group aggregates,
    censuses keyed by (group, residual), windows group-partitioned,
    group-level frames broadcast — no global sort, no collect.

    Output: (group, n_train, n_calib, n_test, pred_cents, qhat,
    covered_e6), one row per group.
    """
    from pyspark.sql.window import Window

    a = int(alpha_permille)
    if not 0 < a < 1000:
        raise ValueError("alpha_permille must be in (0, 1000)")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    base = df.select(
        F.col(group_col).alias("g"),
        (h % 4).alias("__role"),
        F.round(F.col(value_col).cast("double") * 100)
        .cast("long")
        .alias("__x"),
    ).localCheckpoint()  # three role slices read it — one scan, not three
    preds = (
        base.filter(F.col("__role") <= 1)
        .groupBy("g")
        .agg(
            F.count("*").cast("long").alias("n_train"),
            F.expr("(2 * sum(__x) + count(*)) div (2 * count(*))")
            .cast("long")
            .alias("pred_cents"),
        )
    )
    calib = (
        base.filter(F.col("__role") == 2)
        .join(F.broadcast(preds.select("g", "pred_cents")), "g")
        .select("g", F.abs(F.col("__x") - F.col("pred_cents")).alias("r"))
    )
    ncal = calib.groupBy("g").agg(F.count("*").cast("long").alias("n_calib"))
    census = calib.groupBy("g", "r").agg(F.count("*").cast("long").alias("c"))
    w = Window.partitionBy("g").orderBy("r")
    cum = census.withColumn("cum", F.sum("c").over(w))
    qhats = (
        cum.join(F.broadcast(ncal), "g")
        .withColumn(
            "__j",
            F.expr(f"((n_calib + 1) * {1000 - a} + 999) div 1000").cast("long"),
        )
        .groupBy("g", "n_calib")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("__j"), F.col("r")))
            .cast("long")
            .alias("qhat")
        )
    )
    test = (
        base.filter(F.col("__role") == 3)
        .join(F.broadcast(preds.select("g", "pred_cents")), "g")
        .join(F.broadcast(qhats.select("g", "qhat")), "g", "left")
        .groupBy("g")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                (
                    F.abs(F.col("__x") - F.col("pred_cents")) <= F.col("qhat")
                ).cast("long")
            ).alias("__cov"),
        )
    )
    # LEFT joins off preds: a group whose calibration or test slice is
    # empty still emits its row (NULL n_calib/qhat/n_test/covered_e6 —
    # conformal's honest "not enough data"), honoring the one-row-per-
    # group contract instead of silently dropping thin groups.
    return (
        preds.join(F.broadcast(qhats), "g", "left")
        .join(F.broadcast(test), "g", "left")
        .select(
            F.col("g").alias("group"),
            "n_train", "n_calib", "n_test", "pred_cents", "qhat",
            F.when(
                F.col("qhat").isNull(), F.lit(None).cast("long")
            )
            .otherwise(
                F.expr("(2 * 1000000 * __cov + n_test) div (2 * n_test)")
            )
            .cast("long")
            .alias("covered_e6"),
        )
    )


def ols2_exact(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    y_scale: int = 100,
    x1_scale: int = 100,
    x2_scale: int = 100,
) -> DataFrame:
    """Two-feature ordinary least squares with intercept, engine-exact
    by the pearson_exact/cuped template: ONE aggregate computes the
    ten raw integer sums (values pre-scaled to integers, sums widened
    to decimal(38,0) / HUGEINT), the centered scatter entries are the
    cross-multiplied integers G_ab = n·Σab − Σa·Σb (still exact), and
    the coefficients come from Cramer's rule on the 2×2 centered
    system — each G converted to DOUBLE first, then ONE pinned IEEE
    chain (the welch/mann_kendall float-exit rule), UNROUNDED:

        β₁ = (G22·G1y − G12·G2y) / det,  det = G11·G22 − G12²
        β₂ = (G11·G2y − G12·G1y) / det
        β₀ = ȳ − β₁·x̄₁ − β₂·x̄₂        (means as exact-int ratios)
        R² = (β₁·G1y + β₂·G2y) / Gyy   (centered decomposition)

    Collinear features (det = 0) and constant y (Gyy = 0) exit NULL
    via try_divide — Spark 4 ANSI raises on unconditional mid-select
    division even for doubles (the welch_ttest lesson).

    Coefficients are reported in the SCALED integer units; the caller
    divides by the scale ratio to return to natural units (kept
    scaled here so the driver hash compares pure IEEE doubles of
    exact integer inputs).

    Scale shape: one map-side-combined aggregate, one output row —
    the 100 TB regression is one scan, no iteration (contrast SGD).

    Output: (n, beta0, beta1, beta2, r2), one row.
    """
    dec = "decimal(38,0)"
    base = df.select(
        F.round(F.col(y_col).cast("double") * y_scale).cast("long").alias("y"),
        F.round(F.col(x1_col).cast("double") * x1_scale).cast("long").alias("x1"),
        F.round(F.col(x2_col).cast("double") * x2_scale).cast("long").alias("x2"),
    )
    sums = base.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum("x1").cast(dec).alias("s1"),
        F.sum("x2").cast(dec).alias("s2"),
        F.sum(F.col("x1").cast(dec) * F.col("x1")).cast(dec).alias("s11"),
        F.sum(F.col("x2").cast(dec) * F.col("x2")).cast(dec).alias("s22"),
        F.sum(F.col("x1").cast(dec) * F.col("x2")).cast(dec).alias("s12"),
        F.sum(F.col("x1").cast(dec) * F.col("y")).cast(dec).alias("s1y"),
        F.sum(F.col("x2").cast(dec) * F.col("y")).cast(dec).alias("s2y"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
    )
    return sums.selectExpr(
        "cast(n as long) AS n",
        """cast(n * s11 - s1 * s1 as double) AS __g11""",
        "cast(n * s22 - s2 * s2 as double) AS __g22",
        "cast(n * s12 - s1 * s2 as double) AS __g12",
        "cast(n * s1y - s1 * sy as double) AS __g1y",
        "cast(n * s2y - s2 * sy as double) AS __g2y",
        "cast(n * syy - sy * sy as double) AS __gyy",
        "cast(sy as double) / cast(n as double) AS __my",
        "cast(s1 as double) / cast(n as double) AS __m1",
        "cast(s2 as double) / cast(n as double) AS __m2",
    ).selectExpr(
        "n",
        "try_divide(__g22 * __g1y - __g12 * __g2y,"
        " __g11 * __g22 - __g12 * __g12) AS beta1",
        "try_divide(__g11 * __g2y - __g12 * __g1y,"
        " __g11 * __g22 - __g12 * __g12) AS beta2",
        "__my AS __my", "__m1 AS __m1", "__m2 AS __m2",
        "__g1y AS __g1y", "__g2y AS __g2y", "__gyy AS __gyy",
    ).selectExpr(
        "n",
        "__my - beta1 * __m1 - beta2 * __m2 AS beta0",
        "beta1",
        "beta2",
        "try_divide(beta1 * __g1y + beta2 * __g2y, __gyy) AS r2",
    )


def reference_edges(
    ref_df: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> list:
    """The reference-quantile bin edges :func:`psi_report` bins
    against, exposed so a STREAMING monitor can compute them once at
    reference-build time and ship them as a bounded literal list (the
    deployment story: edges are versioned artifacts, not recomputed
    per micro-batch). Edge j is the ⌈j·n/B⌉-th smallest value read
    off the distinct-value census with a range-partitioned prefix
    count (ONE job for all edges); duplicates collapse.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    ref = ref_df.select(F.col(value_col).cast("long").alias("x"))
    # ONE reference scan (r10): the census is pinned (bounded by the
    # value domain — the documented psi_report assumption) because
    # BOTH the cumulative count and the grand total read it; the old
    # shape re-ran the reference scan for the total.
    census = (
        ref.groupBy("x")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    return edges_from_census(census, n_bins)


def edges_from_census(census: DataFrame, n_bins: int = 10) -> list:
    """:func:`reference_edges` over a pre-aggregated (x, c) value
    census — callers that already hold the census (e.g. to derive
    binned reference counts from the same frame) skip the raw scan.
    The census should be pinned by the caller if its construction is
    expensive; it is referenced twice here (cumulative count + grand
    total)."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    from data_misc_tools_spark.operators.etl import global_cumsum

    cum = global_cumsum(census, ["x"], ["c"]).crossJoin(
        F.broadcast(census.agg(F.sum("c").cast("long").alias("n")))
    )
    qs = census.sparkSession.range(1, n_bins).select(F.col("id").alias("j"))
    return sorted(
        {
            r["e"]
            for r in cum.crossJoin(F.broadcast(qs))
            .filter(
                F.col("cum_c")
                >= F.expr(f"(j * n + {n_bins} - 1) div {n_bins}")
            )
            .groupBy("j")
            .agg(F.min("x").alias("e"))
            .collect()
            if r["e"] is not None
        }
    )


def psi_report(
    ref_df: DataFrame,
    cur_df: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index drift report (the credit-scoring /
    model-monitoring standard; e.g. Siddiqi 2006) between a REFERENCE
    slice and a CURRENT slice of an integer-valued column: bin edges
    are the reference's exact quantile order statistics, both slices
    are binned against them, and each bin contributes
    (p − q)·ln(p/q) with Laplace-smoothed shares — the symmetric
    KL-style term whose total reads on the classic rule of thumb
    (< 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted). The
    column-level companion to corpus_drift (vocabulary KL).

    Engine-exact: edges are the ⌈j·n/B⌉-th smallest values read off a
    value census with a cumulative count (the mad_outlier route —
    tie order irrelevant for order STATISTICS); duplicate edges
    collapse (fewer, wider bins — documented); each bin term is the
    half-up e6 integer of the cross-multiplied exact form
    D·L / ((n_r+B)(n_c+B)) with D = (c_r+1)(n_c+B) − (c_c+1)(n_r+B)
    and L = e6ln((c_r+1)(n_c+B)) − e6ln((c_c+1)(n_r+B)) — per-
    quantity rounded logs of exact integer PRODUCTS (the pmi
    overflow-safe idiom), D and L share sign so every term is ≥ 0.
    Per-BIN rows are emitted (the benford no-float-sum-order rule);
    psi_e6 is their exact integer sum downstream.

    Scale shape: one census + one range-partitioned-free keyed window
    per slice is avoided — the census cumsum is a single-column
    ordered aggregate over DISTINCT VALUES (bounded by the value
    domain, not the row count), edges are a bounded collect
    (n_bins−1 values), and binning is a broadcast expression.

    Output: (bin, ref_n, cur_n, ref_share_e6, cur_share_e6, term_e6),
    one row per occupied-or-not bin 0..B−1 present in either slice.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    ref = ref_df.select(F.col(value_col).cast("long").alias("x"))
    cur = cur_df.select(F.col(value_col).cast("long").alias("x"))
    edges = reference_edges(ref_df, value_col, n_bins)
    def bin_expr():
        b = F.lit(0).cast("long")
        for e in edges:
            b = b + (F.col("x") > F.lit(e)).cast("long")
        return b.alias("bin")

    if not edges:
        raise ValueError("reference slice is empty - no bin edges")
    rc = ref.select(bin_expr()).groupBy("bin").agg(
        F.count("*").cast("long").alias("ref_n")
    )
    cc = cur.select(bin_expr()).groupBy("bin").agg(
        F.count("*").cast("long").alias("cur_n")
    )
    b = len(edges) + 1
    joined = (
        rc.join(cc, "bin", "full")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0).cast("long")).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0).cast("long")).alias("cur_n"),
        )
        .crossJoin(
            F.broadcast(
                rc.agg(F.sum("ref_n").cast("long").alias("nr")).crossJoin(
                    cc.agg(F.sum("cur_n").cast("long").alias("nc"))
                )
            )
        )
    )
    e6ln = (
        lambda e: F.round(F.log(e.cast("double")) * 1e6).cast("long")
    )  # noqa: E731
    # decimal-first for the smoothed products (the sum-widening
    # discipline): (c+1)*(n+B) in BIGINT wraps at ~3e9-row slices —
    # widen BEFORE multiplying; only the e6ln argument drops to double.
    a_num = (F.col("ref_n") + 1).cast("decimal(38,0)") * (F.col("nc") + b)
    b_num = (F.col("cur_n") + 1).cast("decimal(38,0)") * (F.col("nr") + b)
    return joined.select(
        "bin", "ref_n", "cur_n",
        F.expr("(2 * 1000000 * ref_n + nr) div (2 * nr)")
        .cast("long")
        .alias("ref_share_e6"),
        F.expr("(2 * 1000000 * cur_n + nc) div (2 * nc)")
        .cast("long")
        .alias("cur_share_e6"),
        (
            (a_num - b_num).cast("decimal(38,0)")
            * (e6ln(a_num) - e6ln(b_num))
        ).alias("__num"),
        ((F.col("nr") + b).cast("decimal(38,0)") * (F.col("nc") + b)).alias(
            "__den"
        ),
    ).selectExpr(
        "bin", "ref_n", "cur_n", "ref_share_e6", "cur_share_e6",
        "cast((2 * __num + __den) div (2 * __den) as long) AS term_e6",
    ).orderBy("bin")


def did_report(
    df: DataFrame,
    treated_col: str,
    post_col: str,
    value_col: str,
    value_scale: int = 100,
) -> DataFrame:
    """Difference-in-differences estimator (Card & Krueger 1994 made
    it canonical) — the quasi-experimental answer when you CANNOT
    randomize: compare the treated group's before→after change
    against the control group's, so any shared time trend cancels.
    The observational companion to cuped_report (which needs
    randomized assignment) and ab_power_mde.

    DiD = (ȳ_treated,post − ȳ_treated,pre)
        − (ȳ_control,post − ȳ_control,pre)

    Engine-exact: the four cell sums/counts come from ONE aggregate
    over one scan (values pre-scaled to integers, sums widened to
    decimal(38,0)); each cell mean is numerator-to-double /
    denominator-to-double (the cuped rule), the DiD is one pinned
    IEEE chain, UNROUNDED. Any empty cell exits NULL via try_divide.

    Output: one row — (n_c_pre, n_c_post, n_t_pre, n_t_post,
    m_c_pre, m_c_post, m_t_pre, m_t_post, did).
    """
    dec = "decimal(38,0)"
    t = F.col(treated_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    x = (
        F.round(F.col(value_col).cast("double") * value_scale)
        .cast("long")
        .alias("x")
    )
    base = df.select(t.alias("t"), p.alias("p"), x)
    cells = []
    for tt in (False, True):
        for pp in (False, True):
            tag = ("t" if tt else "c") + ("_post" if pp else "_pre")
            cond = (F.col("t") == tt) & (F.col("p") == pp)
            cells.append(
                F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{tag}")
            )
            cells.append(
                F.sum(F.when(cond, F.col("x")).otherwise(0))
                .cast(dec)
                .alias(f"s_{tag}")
            )
    agg = base.agg(*cells)
    means = agg.selectExpr(
        "n_c_pre", "n_c_post", "n_t_pre", "n_t_post",
        "try_divide(cast(s_c_pre as double), cast(n_c_pre as double)) AS m_c_pre",
        "try_divide(cast(s_c_post as double), cast(n_c_post as double)) AS m_c_post",
        "try_divide(cast(s_t_pre as double), cast(n_t_pre as double)) AS m_t_pre",
        "try_divide(cast(s_t_post as double), cast(n_t_post as double)) AS m_t_post",
    )
    return means.selectExpr(
        "*", "(m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did"
    )


def ipw_ate_report(
    df: DataFrame,
    treated_col: str,
    cell_col: str,
    value_col: str,
    value_scale: int = 100,
) -> DataFrame:
    """Inverse-propensity-weighted ATE with DISCRETE propensity cells
    (Horvitz–Thompson 1952 weighting; Rosenbaum & Rubin 1983 for the
    propensity framing) — the third leg of the observational-causal
    kit beside :func:`did_report` (needs a pre/post split) and
    :func:`cuped_report` (needs randomization): reweight each
    treated/control outcome by its cell's inverse treatment share so
    cell-mix confounding cancels,

        ATE = (1/N)·Σ_cells [ S¹(x)·n(x)/n_t(x) − S⁰(x)·n(x)/n_c(x) ]

    with e(x) = n_t(x)/n(x) the exact empirical propensity.

    Engine-exact by PER-CELL rows (the psi/benford no-float-sum-order
    rule): each cell's contribution is one half-up e6 of the
    cross-multiplied exact rational
    (S¹·n·n_c − S⁰·n·n_t) / (N·n_t·n_c) — SIGNED, safe because Spark's
    ``div`` and DuckDB's ``//`` both truncate toward zero (probed this
    round: −7 div 2 = −3 in both; only python's ``//`` floors). Sums
    ride decimal(38,0) (HUGEINT twin). A cell with no treated or no
    control rows is a POSITIVITY VIOLATION: its term is NULL (IPW is
    undefined there — surfacing it beats silently dropping the cell),
    and Σ over non-null terms is the trimmed estimate.

    Scale shape: one cell-keyed aggregate over one scan + a broadcast
    1-row total. Output: (cell, n, n_t, n_c, sum_t_cents, sum_c_cents,
    ipw_term_e6) ordered by cell; Σ ipw_term_e6 ≈ e6·ATE in cents.
    """
    dec = "decimal(38,0)"
    base = df.select(
        F.col(treated_col).cast("boolean").alias("t"),
        F.col(cell_col).cast("long").alias("cell"),
        F.round(F.col(value_col).cast("double") * value_scale)
        .cast("long")
        .alias("y"),
    )
    tot = base.agg(F.count("*").cast("long").alias("nn"))
    cells = base.groupBy("cell").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("t").cast("long")).cast("long").alias("n_t"),
        F.sum((~F.col("t")).cast("long")).cast("long").alias("n_c"),
        F.coalesce(F.sum(F.when(F.col("t"), F.col("y"))), F.lit(0))
        .cast(dec)
        .alias("sy_t"),
        F.coalesce(F.sum(F.when(~F.col("t"), F.col("y"))), F.lit(0))
        .cast(dec)
        .alias("sy_c"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .selectExpr(
            "cell", "n", "n_t", "n_c",
            "cast(sy_t as bigint) AS sum_t_cents",
            "cast(sy_c as bigint) AS sum_c_cents",
            """CASE WHEN n_t > 0 AND n_c > 0 THEN
                 cast((2 * 1000000 * (sy_t * n * n_c - sy_c * n * n_t)
                       + cast(nn as decimal(38,0)) * n_t * n_c)
                      div (2 * cast(nn as decimal(38,0)) * n_t * n_c)
                      as bigint)
               END AS ipw_term_e6""",
        )
        .orderBy("cell")
    )


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list | None = None,
) -> DataFrame:
    """Exact weighted (lower) median per group: the smallest value v
    whose cumulative weight reaches half the total — 2·cum ≥ W as a
    pure integer comparison, so no midpoint interpolation and no
    float anywhere (the mad_outlier order-statistic convention:
    ties irrelevant, the k-th smallest VALUE of a multiset is
    well-defined). The weighted companion the plain median lacks:
    "the price point where half the QUANTITY sits" is a different
    number from "the median price row".

    Scale shape: one (group, value) census with the weights summed
    map-side, a GROUP-partitioned cumulative weight (keyed window
    over the bounded per-group value DOMAIN), one argmin aggregate.

    Output: (group cols..., total_weight, wmedian).
    """
    from pyspark.sql.window import Window

    gcols = list(group_cols or [])
    wexp = F.col(weight_col).cast("long")
    census = (
        df.select(*gcols, F.col(value_col).cast("long").alias("__x"),
                  wexp.alias("__w"))
        .where(F.col("__w") > 0)
        .groupBy(*gcols, "__x")
        .agg(F.sum("__w").cast("long").alias("__c"))
    )
    if gcols:
        w = Window.partitionBy(*gcols).orderBy("__x")
    else:
        # global form: the cumsum runs over the VALUE DOMAIN census,
        # not the rows — acceptable for bounded domains, group the
        # call otherwise
        w = Window.orderBy("__x")
    tot = census.groupBy(*gcols).agg(F.sum("__c").cast("long").alias("__tot"))
    cum = census.withColumn("__cum", F.sum("__c").over(w))
    joined = (
        cum.join(F.broadcast(tot), gcols) if gcols
        else cum.crossJoin(F.broadcast(tot))
    )
    return joined.groupBy(*gcols).agg(
        F.max("__tot").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("__cum") >= F.col("__tot"), F.col("__x"))
        ).cast("long").alias("wmedian"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_e6_col: str,
    label_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Isotonic (monotone) calibration of a score against binary
    outcomes — the pool-adjacent-violators fit (Ayer et al. 1955;
    Zadrozny & Elkan 2002 for classifier calibration) that turns any
    ranking score into honest probabilities without assuming a
    parametric shape: the fitted rate is the best monotone
    approximation to the per-bucket positive rates.
    :func:`calibration_report` DIAGNOSES miscalibration; this REPAIRS
    it, and the fitted step function is the lookup table a serving
    layer ships.

    Computed via the minimax characterization — for bucket i,
    ĝ(i) = max_{j≤i} min_{k≥i} mean(pos, j..k) — which equals the
    PAVA block mean (pinned against a python PAVA in tests) but is
    pure joins + min/max aggregates, no sequential pooling loop.
    Engine-exact: every segment mean is ONE IEEE division of exact
    BIGINTs (both engines hold identical doubles; min/max of
    identical doubles are identical), raw rates are half-up e6
    integers.

    Scale shape: the million-row part is the one bucket-census
    aggregate (same e6-integer score contract as calibration_report —
    float scores would bucket differently across engines); everything
    after runs on the ≤ n_buckets census via bounded B³/6-row joins
    (B ≤ 128 enforced), all broadcast.

    Output: (bucket, n_rows, n_pos, raw_rate_e6, iso_rate), ordered,
    with iso_rate monotone non-decreasing.
    """
    if not 2 <= n_buckets <= 128:
        raise ValueError("n_buckets must be in [2, 128]")
    s = F.col(score_e6_col).cast("long")
    guard = F.when(
        (s < 0) | (s > 1_000_000),
        F.raise_error(
            F.format_string(
                "isotonic_calibration: score_e6 %s outside [0, 1e6]", s
            )
        ),
    ).otherwise(s)
    census = (
        df.select(
            guard.alias("__s"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .select(
            F.least(
                F.expr(f"__s * {n_buckets} div 1000000"),
                F.lit(n_buckets - 1),
            ).cast("long").alias("b"),
            "__y",
        )
        .groupBy("b")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__y").cast("long").alias("pos"),
        )
        .localCheckpoint()  # four bounded consumers below
    )
    j = census.select(F.col("b").alias("bj"))
    k = census.select(F.col("b").alias("bk"))
    m = census.select(F.col("b").alias("bm"), "n", "pos")
    seg = (
        j.join(k, F.col("bj") <= F.col("bk"))
        .join(m, (F.col("bm") >= F.col("bj")) & (F.col("bm") <= F.col("bk")))
        .groupBy("bj", "bk")
        .agg(
            F.sum("n").cast("long").alias("sn"),
            F.sum("pos").cast("long").alias("sp"),
        )
        .select(
            "bj", "bk",
            (F.col("sp").cast("double") / F.col("sn").cast("double")).alias(
                "m"
            ),
        )
    )
    i = census.select(F.col("b").alias("bi"))
    iso = (
        seg.join(i, (F.col("bj") <= F.col("bi")) & (F.col("bi") <= F.col("bk")))
        .groupBy("bi", "bj")
        .agg(F.min("m").alias("mn"))
        .groupBy("bi")
        .agg(F.max("mn").alias("iso_rate"))
    )
    return (
        census.join(iso, census["b"] == iso["bi"])
        .select(
            F.col("b").alias("bucket"),
            F.col("n").alias("n_rows"),
            F.col("pos").alias("n_pos"),
            F.expr("(2 * 1000000 * pos + n) div (2 * n)")
            .cast("long")
            .alias("raw_rate_e6"),
            "iso_rate",
        )
        .orderBy("bucket")
    )


def schema_drift_report(
    old_df: DataFrame,
    new_df: DataFrame,
) -> DataFrame:
    """Column-level schema + content drift between two versions of a
    table — the diff every ingest prints before promoting a new
    snapshot: which columns were ADDED / REMOVED / TYPE-CHANGED, and
    for surviving columns how the null rate and cardinality moved.
    The structural companion to :func:`psi_report` (one column's
    value distribution) and the full-profile diff a lakehouse catalog
    wants per version.

    Engine-exact: statuses come from schema METADATA (driver-side,
    not data); content stats are exact counts from ONE aggregate per
    version (count_distinct per column — the profile_table shape);
    null rates are half-up e6 integers, drift their signed
    difference.

    Output: (col_name, status, dtype_old, dtype_new, n_rows_old,
    n_rows_new, null_rate_old_e6, null_rate_new_e6, null_drift_e6,
    n_distinct_old, n_distinct_new), one row per column in either
    version, ordered by col_name. Removed/added columns carry NULLs
    on the absent side.
    """
    def stats(df: DataFrame, tag: str) -> DataFrame:
        aggs = [F.count("*").cast("long").alias("__n")]
        for c in df.columns:
            aggs.append(
                F.sum(F.col(c).isNull().cast("long"))
                .cast("long")
                .alias(f"__nul_{c}")
            )
            aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"__d_{c}"))
        row = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias(f"n_rows_{tag}"),
                F.expr(
                    f"CASE WHEN __n = 0 THEN 0L ELSE "
                    f"(2 * 1000000 * __nul_{c} + __n) div (2 * __n) END"
                )
                .cast("long")
                .alias(f"null_rate_{tag}_e6"),
                F.col(f"__d_{c}").alias(f"n_distinct_{tag}"),
            )
            for c in df.columns
        ]
        return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")

    d_old = dict(old_df.dtypes)
    d_new = dict(new_df.dtypes)
    so = stats(old_df, "old")
    sn = stats(new_df, "new")
    joined = so.join(sn, "col_name", "full")
    status = (
        F.when(F.col("n_rows_old").isNull(), F.lit("added"))
        .when(F.col("n_rows_new").isNull(), F.lit("removed"))
    )
    # dtype metadata rides as a literal CASE over the bounded column set
    to_case = lambda d: F.coalesce(  # noqa: E731
        *[
            F.when(F.col("col_name") == c, F.lit(t))
            for c, t in d.items()
        ],
        F.lit(None).cast("string"),
    ) if d else F.lit(None).cast("string")
    dt_old = to_case(d_old)
    dt_new = to_case(d_new)
    return joined.select(
        "col_name",
        status.otherwise(
            F.when(dt_old != dt_new, F.lit("type_changed")).otherwise(
                F.lit("kept")
            )
        ).alias("status"),
        dt_old.alias("dtype_old"),
        dt_new.alias("dtype_new"),
        "n_rows_old", "n_rows_new",
        "null_rate_old_e6", "null_rate_new_e6",
        (F.col("null_rate_new_e6") - F.col("null_rate_old_e6"))
        .cast("long")
        .alias("null_drift_e6"),
        "n_distinct_old", "n_distinct_new",
    ).orderBy("col_name")


def roc_auc_exact(
    df: DataFrame,
    label: Column,
    score_col: str,
    scale: int = 1,
) -> DataFrame:
    """Exact ROC-AUC of a score against binary labels — via the
    U-statistic identity AUC = U_pos/(n_pos·n_neg) (Hanley & McNeil
    1982): the probability a random positive outscores a random
    negative, ties counted half. The threshold-free ranking metric
    beside :func:`calibration_report` (which judges the VALUES) and
    :func:`pr_curve` (which judges each cutoff).

    Engine-exact by the :func:`mannwhitney_u` machinery: 2·rank sums
    and tie terms accumulate as exact decimal(38,0) integers over the
    distinct-score census (range-partitioned prefix sums), and AUC is
    ONE IEEE division of the half-unit-exact U by the exact pair
    count, UNROUNDED. NULL when either class is empty.

    Output: one row (n_pos, n_neg, u_pos, auc).
    """
    dec = "decimal(38,0)"
    cg = _rank_groups(df, label, score_col, scale)
    agg = cg.selectExpr("ca", "cb", "c", "cum_c - c AS s").agg(
        F.sum("ca").cast(dec).alias("na"),
        F.sum("cb").cast(dec).alias("nb"),
        F.sum(
            (F.col("ca") * (2 * F.col("s") + F.col("c") + 1)).cast(dec)
        ).alias("r2a"),
    )
    return agg.selectExpr(
        "CAST(na AS LONG) AS n_pos",
        "CAST(nb AS LONG) AS n_neg",
        "CASE WHEN na = 0 OR nb = 0 THEN CAST(NULL AS DOUBLE)"
        " ELSE CAST(r2a - na * (na + 1) AS DOUBLE) / 2 END AS u_pos",
        "CASE WHEN na = 0 OR nb = 0 THEN CAST(NULL AS DOUBLE)"
        " ELSE (CAST(r2a - na * (na + 1) AS DOUBLE) / 2)"
        "      / CAST(na * nb AS DOUBLE) END AS auc",
    )


def pr_curve(
    df: DataFrame,
    score_e6_col: str,
    label_col: str,
) -> DataFrame:
    """Exact precision/recall/F1 at EVERY observed score threshold —
    the operating-curve companion to :func:`roc_auc_exact`: row t
    answers "if I ship cutoff ≥ t, what do I get", which is the
    question a filter pipeline actually asks (threshold picking for
    gopher/quality/linkage scores).

    Engine-exact: same e6-INTEGER score contract as
    calibration_report (float scores would threshold differently at
    boundaries); TP/FP at each threshold are SUFFIX sums of the
    score census (total − prefix + current, the KM n_risk idiom,
    range-partitioned); precision/recall/F1 are half-up e6 integer
    ratios — F1 directly as 2TP/(2TP+FP+FN), no float compounding.

    One row per DISTINCT observed score (the census bounds the
    output — bucket upstream if the score domain is huge, the psi
    convention).

    Output: (threshold_e6, tp, fp, fn, precision_e6, recall_e6,
    f1_e6), descending thresholds = the curve left to right.
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    y = F.col(label_col).cast("long")
    census = df.select(
        F.col(score_e6_col).cast("long").alias("s"), y.alias("__y")
    ).groupBy("s").agg(
        F.sum("__y").cast("long").alias("pos"),
        (F.count("*") - F.sum("__y")).cast("long").alias("neg"),
    )
    cum = global_cumsum(census, ["s"], ["pos", "neg"])
    tot = census.agg(
        F.sum("pos").cast("long").alias("tp_all"),
        F.sum("neg").cast("long").alias("fp_all"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .selectExpr(
            "s AS threshold_e6",
            "tp_all - cum_pos + pos AS tp",
            "fp_all - cum_neg + neg AS fp",
            "cum_pos - pos AS fn",
        )
        .selectExpr(
            "threshold_e6", "tp", "fp", "fn",
            "CASE WHEN tp + fp = 0 THEN NULL ELSE"
            " (2 * 1000000 * tp + (tp + fp)) div (2 * (tp + fp)) END"
            " AS precision_e6",
            "CASE WHEN tp + fn = 0 THEN NULL ELSE"
            " (2 * 1000000 * tp + (tp + fn)) div (2 * (tp + fn)) END"
            " AS recall_e6",
            "CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE"
            " (2 * 1000000 * 2 * tp + (2 * tp + fp + fn))"
            " div (2 * (2 * tp + fp + fn)) END AS f1_e6",
        )
        .orderBy(F.desc("threshold_e6"))
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    scale: int = 100,
) -> DataFrame:
    """Hill estimator of the power-law tail index (Hill 1975) over the
    top-k order statistics: H = (1/k)·Σᵢ≤k ln(x₍ᵢ₎/x₍ₖ₊₁₎) and
    α = 1/H — the "how heavy is this tail" number that decides
    whether means/variances are even meaningful, beside
    :func:`mad_outlier_report` (which flags points; this
    characterizes the distribution) and benford (digit law). α ≈ 1–2
    = very heavy (infinite variance), large α or H ≈ 0 = thin/bounded
    tail.

    Engine-exact: the top-(k+1) VALUES are an order-statistic
    multiset (ties at the boundary don't change it); per-quantity
    e6-rounded logs of exact fixed-point integers (the pmi idiom)
    give H·k·1e6 = Σ e6ln(xᵢ) − (k+1)·e6ln(anchor) exactly;
    hill_e6 is its half-up /k and α is ONE IEEE division, UNROUNDED
    (NULL when H = 0 — all top values tied).

    Scale shape: TakeOrderedAndProject for the top-(k+1) (never a
    global sort), one aggregate over k+1 rows. Output: one row
    (k, n_pos, anchor, hill_e6, alpha).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    pos = df.select(
        F.round(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("x")
    ).filter(F.col("x") > 0)
    n_pos = pos.agg(F.count("*").cast("long").alias("n"))
    top = pos.orderBy(F.desc("x")).limit(k + 1)
    e6ln = F.round(F.log(F.col("x").cast("double")) * 1e6).cast("long")
    agg = top.select(F.col("x"), e6ln.alias("l")).agg(
        F.count("*").cast("long").alias("m"),
        F.sum("l").cast("long").alias("s"),
        F.min("x").cast("long").alias("anchor"),
        F.min("l").cast("long").alias("la"),
    )
    return (
        agg.crossJoin(F.broadcast(n_pos))
        .selectExpr(
            f"{k}L AS k",
            "n AS n_pos",
            "anchor",
            f"""CASE WHEN m < {k + 1} THEN CAST(NULL AS LONG)
                 ELSE (2 * (s - {k + 1} * la) + {k}) div (2 * {k})
            END AS hill_e6""",
        )
        .selectExpr(
            "k", "n_pos", "anchor", "hill_e6",
            "CASE WHEN hill_e6 IS NULL OR hill_e6 = 0 THEN CAST(NULL AS DOUBLE)"
            " ELSE 1000000.0D / CAST(hill_e6 AS DOUBLE) END AS alpha",
        )
    )


def trimmed_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list | None = None,
    trim_permille: int = 50,
    scale: int = 100,
) -> DataFrame:
    """Trimmed and winsorized means per group — the classic robust
    location estimators between the mean (efficient, fragile) and the
    median (robust, wasteful): drop (trimmed) or clamp (winsorized)
    the lowest/highest ⌊n·γ⌋ observations and average the rest
    (Tukey; the 'robust statistics 101' pair beside
    :func:`mad_outlier_report`'s scale estimate).

    Engine-exact order statistics off ONE value census with a
    group-keyed cumulative count (the weighted_median route): each
    distinct value contributes kept_c = |[cum−c+1, cum] ∩
    [cut+1, n−cut]| rows to the trimmed core — pure integer interval
    arithmetic, tie order provably irrelevant; boundary values for
    winsorizing are the (cut+1)-th and (n−cut)-th order statistics
    read off the same census. Sums widen to decimal(38,0); the two
    means exit as ONE IEEE division each of exact integers, UNROUNDED
    (the cuped rule). Groups where trimming would eat everything
    (n ≤ 2·cut) yield NULL means.

    Output: (group cols..., n, cut, mean_scaled, trimmed_mean,
    winsorized_mean) — all means in the SCALED fixed-point units.
    """
    if not 0 <= trim_permille < 500:
        raise ValueError("trim_permille must be in [0, 500)")
    from pyspark.sql.window import Window

    dec = "decimal(38,0)"
    gcols = list(group_cols or [])
    census = (
        df.select(
            *gcols,
            F.round(F.col(value_col).cast("double") * scale)
            .cast("long")
            .alias("v"),
        )
        .groupBy(*gcols, "v")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = (
        Window.partitionBy(*gcols).orderBy("v")
        if gcols
        else Window.orderBy("v")  # global form: domain-bounded census
    )
    cum = census.withColumn("cum", F.sum("c").over(w))
    tot = census.groupBy(*gcols).agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v").cast(dec) * F.col("c")).cast(dec).alias("s_all"),
    )
    j = (
        cum.join(F.broadcast(tot), gcols)
        if gcols
        else cum.crossJoin(F.broadcast(tot))
    )
    t = int(trim_permille)
    j = j.withColumn("cut", F.expr(f"n * {t} div 1000").cast("long"))
    kept = F.expr(
        "greatest(0L, least(cum, n - cut) - greatest(cum - c + 1, cut + 1) + 1)"
    )
    agg = j.select(
        *gcols, "n", "cut", "v", "c", "cum", "s_all",
        kept.alias("__k"),
        # boundary order statistics: the (cut+1)-th and (n-cut)-th
        F.when(
            (F.col("cum") >= F.col("cut") + 1)
            & (F.col("cum") - F.col("c") + 1 <= F.col("cut") + 1),
            F.col("v"),
        ).alias("__lo"),
        F.when(
            (F.col("cum") >= F.col("n") - F.col("cut"))
            & (F.col("cum") - F.col("c") + 1 <= F.col("n") - F.col("cut")),
            F.col("v"),
        ).alias("__hi"),
    ).groupBy(*gcols, "n", "cut", "s_all").agg(
        F.sum(F.col("v").cast(dec) * F.col("__k")).cast(dec).alias("s_trim"),
        F.sum("__k").cast("long").alias("n_trim"),
        F.min("__lo").cast("long").alias("v_lo"),
        F.min("__hi").cast("long").alias("v_hi"),
    )
    return agg.selectExpr(
        *gcols, "n", "cut",
        "cast(s_all as double) / cast(n as double) AS mean_scaled",
        "CASE WHEN n_trim = 0 THEN CAST(NULL AS DOUBLE)"
        " ELSE cast(s_trim as double) / cast(n_trim as double)"
        " END AS trimmed_mean",
        "CASE WHEN n_trim = 0 THEN CAST(NULL AS DOUBLE)"
        " ELSE cast(s_trim + cast(cut as decimal(38,0)) * v_lo"
        "           + cast(cut as decimal(38,0)) * v_hi as double)"
        "      / cast(n as double) END AS winsorized_mean",
    )


def cramers_v(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cramér's V association between two categorical columns — the
    [0, 1]-normalized chi-square companion to
    :func:`mutual_information` (MI is in nats and unbounded; V is the
    comparable-across-pairs effect size a profiling matrix wants):
    V = √(χ²/(n·min(r−1, k−1))).

    Engine-exact: a float Σ over cells would be accumulation-order-
    dependent (the corr() trap), so each OBSERVED cell contributes
    the HALF-UP e6 integer of 1e6·(n·c_ij − c_i·c_j)²/(n·c_i·c_j)
    (numerator and denominator exact decimal(38,0)/HUGEINT), the
    ABSENT cells' total Σ c_i·c_j/n folds in as ONE more exact term
    (their (n·0 − c_i·c_j)² form collapses), ``chi2_e6`` is the exact
    integer sum — n·χ² scaled by e6 — and
    ``v`` = √(chi2_e6/(1e6·n·min(r−1, k−1))) is one pinned IEEE
    chain, UNROUNDED. Degenerate single-level columns yield NULL v.

    Marginals derive FROM the cell census (one scan, one shuffle —
    the mutual_information shape).

    Output: one row (n_rows, n_levels_a, n_levels_b, chi2_e6, v).
    """
    dec = "decimal(38,0)"
    cells = (
        df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint()  # marginals + totals + the term sum
    )
    ma = cells.groupBy("a").agg(F.sum("c").cast("long").alias("ca"))
    mb = cells.groupBy("b").agg(F.sum("c").cast("long").alias("cb"))
    tot = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_cells"),
    ).crossJoin(ma.agg(F.count("*").cast("long").alias("ra"))).crossJoin(
        mb.agg(F.count("*").cast("long").alias("rb"))
    )
    # observed cells contribute (n*c - ca*cb)^2/(n*ca*cb); ABSENT
    # cells (c=0) contribute ca*cb/n each — their total is
    # (n^2 - sum_present ca*cb)/n, folded in as one exact term below
    terms = (
        cells.join(ma, "a")
        .join(mb, "b")
        .crossJoin(F.broadcast(tot.select("n")))
        .selectExpr(
            "cast(n as decimal(38,0)) * c"
            " - cast(ca as decimal(38,0)) * cb AS __d",
            "cast(ca as decimal(38,0)) * cb AS __e",
            "cast(n as decimal(38,0)) AS __n",
        )
        .selectExpr(
            "cast((2 * 1000000 * __d * __d + __n * __e)"
            " div (2 * __n * __e) as decimal(38,0)) AS __t",
            "__e",
        )
        .agg(
            F.sum("__t").cast(dec).alias("s_present"),
            F.sum("__e").cast(dec).alias("e_present"),
        )
    )
    return terms.crossJoin(F.broadcast(tot)).selectExpr(
        "n AS n_rows", "ra AS n_levels_a", "rb AS n_levels_b",
        # absent cells: sum over c=0 cells of 1e6*ca*cb/n =
        # 1e6*(n^2 - e_present)/n, half-up as one exact term
        """cast(s_present
             + (2 * 1000000 * (cast(n as decimal(38,0)) * n - e_present)
                + cast(n as decimal(38,0)))
               div (2 * cast(n as decimal(38,0))) as long) AS chi2_e6""",
        """CASE WHEN least(ra, rb) <= 1 THEN CAST(NULL AS DOUBLE)
                ELSE sqrt(
                  cast(cast(s_present
                    + (2 * 1000000 * (cast(n as decimal(38,0)) * n - e_present)
                       + cast(n as decimal(38,0)))
                      div (2 * cast(n as decimal(38,0))) as long) as double)
                  / (1000000.0D * cast(n as double)
                     * cast(least(ra, rb) - 1 as double)))
           END AS v""",
    )


def kendall_tau_b(
    df: DataFrame,
    x: Column,
    y: Column,
    max_cells: int = 65536,
) -> DataFrame:
    """Kendall's tau-b rank correlation for BOUNDED-cardinality pairs
    — the concordance companion of :func:`spearman_exact` (which
    measures monotone association via ranks; tau-b counts the pairs
    themselves and is the standard choice when both variables are
    ordinal scales with heavy ties).

    The O(n log n) inversion-count formulation needs a global sorted
    sweep; on a CONTINGENCY GRID it collapses to exact integer sums —
    the chi2/cramers_v census idiom: one (x, y) cell census (the only
    shuffle), then concordant/discordant pair mass from a bounded
    grid self-join (cells ≤ ``max_cells``, broadcast):

        C = Σ n_ij · n_kl over k>i, l>j      (each pair once)
        D = Σ n_ij · n_kl over k>i, l<j
        n0 = n(n−1)/2,  n1 = Σ_x t(t−1)/2,  n2 = Σ_y t(t−1)/2
        tau_b = (C − D) / sqrt((n0−n1)·(n0−n2))

    All counts and pair sums are exact decimal(38,0) integers; tau_b
    is ONE pinned-order IEEE expression — (C−D) to double, each
    radicand factor to double, multiply, sqrt, divide (the
    pearson_exact class: both engines evaluate the same doubles).
    Raises when the grid exceeds ``max_cells`` — an unbounded-
    cardinality column needs the sort-based formulation, not a census.

    Output: one row (n, n_cells, nc, nd, tau_b) — nc/nd as longs
    (raises past 2^63 via ANSI rather than silently wrapping).
    """
    dec = "decimal(38,0)"
    cells = (
        df.select(x.alias("__x"), y.alias("__y"))
        .groupBy("__x", "__y")
        .agg(F.count("*").cast("long").alias("__n"))
    ).localCheckpoint(eager=True)  # census feeds grid join + margins
    n_cells = cells.count()
    if n_cells > max_cells:
        raise ValueError(
            f"contingency grid has {n_cells} cells > max_cells={max_cells}: "
            "kendall_tau_b is the bounded-cardinality form"
        )
    a = cells.select(
        F.col("__x").alias("__xa"), F.col("__y").alias("__ya"),
        F.col("__n").cast(dec).alias("__na"),
    )
    b = cells.select(
        F.col("__x").alias("__xb"), F.col("__y").alias("__yb"),
        F.col("__n").cast(dec).alias("__nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("__xb") > F.col("__xa"))
    cd = pairs.agg(
        F.sum(
            F.when(F.col("__yb") > F.col("__ya"), F.col("__na") * F.col("__nb"))
            .otherwise(F.lit(0).cast(dec))
        ).alias("__c"),
        F.sum(
            F.when(F.col("__yb") < F.col("__ya"), F.col("__na") * F.col("__nb"))
            .otherwise(F.lit(0).cast(dec))
        ).alias("__d"),
    )
    margins = cells.agg(F.sum("__n").cast(dec).alias("__nn"))
    tx = (
        cells.groupBy("__x")
        .agg(F.sum("__n").cast(dec).alias("__t"))
        .agg(F.sum(F.col("__t") * (F.col("__t") - 1)).alias("__tx2"))
    )
    ty = (
        cells.groupBy("__y")
        .agg(F.sum("__n").cast(dec).alias("__t"))
        .agg(F.sum(F.col("__t") * (F.col("__t") - 1)).alias("__ty2"))
    )
    return (
        cd.crossJoin(F.broadcast(margins))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .selectExpr(
            "cast(__nn as long) AS n",
            f"cast({n_cells} as long) AS n_cells",
            "cast(__c as long) AS nc",
            "cast(__d as long) AS nd",
            # n0 - n1 = (n(n-1) - Σt(t-1))/2 per margin; fold the /2
            # into the radicand product as /4 exactly
            """CASE WHEN __nn * (__nn - 1) > __tx2
                     AND __nn * (__nn - 1) > __ty2 THEN
                 cast(cast(__c - __d as double)
                      / sqrt(cast((__nn * (__nn - 1) - __tx2) / 2 as double)
                             * cast((__nn * (__nn - 1) - __ty2) / 2 as double))
                      as double)
               END AS tau_b""",
        )
    )


def dp_histogram(
    df: DataFrame,
    key: Column,
    b_e3: int = 1000,
    salt: str = "dp",
) -> DataFrame:
    """Differentially-private histogram release with DETERMINISTIC,
    replayable Laplace noise — the release-side companion of the
    privacy audit battery (:func:`k_anonymity`, :func:`t_closeness`):
    per-group counts get Laplace(b) noise, ``b_e3 = round(1000·b)``
    and b = Δf/ε with count sensitivity Δf = 1 (so ``b_e3=2000`` is
    ε = 0.5).

    Noise is drawn by INVERSE CDF from an md5-derived uniform of
    (salt ‖ group): u32 ∈ [0, 2³²); t = 2·u32 − (2³²−1) (odd, exactly
    centered); noise = −b·sign(t)·ln(1 − |t|/2³²). Determinism is a
    feature two ways: the engine-portable oracle replays the release
    bit-for-bit, and a production release pinned to a salt is
    REPRODUCIBLE under reruns (fresh salt ⇒ fresh draw; reusing a
    salt across releases of the SAME statistic spends no extra ε
    because it re-publishes the same value — rotating salts is what
    consumes budget, the standard seeded-DP operational trade).

    Integer pipeline (the e6-ln idiom): ln of the exact rational
    (2³²−|t|)/2³² e6-rounds identically in both engines; noise_e9 =
    −sign(t)·b_e3·l_e6; the released count is the SIGNED half-up e3
    of n·1e9 + noise_e9 (noise can push small counts negative — a
    real Laplace release does too; no clamping, clamping breaks
    unbiasedness).

    Output: (k, noisy_count_e3) per group — true counts are NOT
    emitted (that would be the whole privacy failure).
    """
    if b_e3 <= 0:
        raise ValueError(f"b_e3 must be positive, got {b_e3}")
    g = key.cast("string").alias("__g")
    counts = df.select(g).groupBy("__g").agg(
        F.count("*").cast("long").alias("__n")
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col("__g"))), 1, 8), 16, 10
    ).cast("long")
    staged = counts.withColumn("__u", u).selectExpr(
        "__g",
        f"""__n * 1000000000 +
            (CASE WHEN 2 * __u - 4294967295 >= 0 THEN -1 ELSE 1 END)
            * {b_e3}
            * cast(round(1e6 * ln(
                (4294967296.0 - abs(2.0 * __u - 4294967295.0))
                / 4294967296.0)) as bigint) AS __r9""",
    )
    return staged.selectExpr(
        "__g AS k",
        """CASE WHEN __r9 >= 0 THEN (2 * __r9 + 1000000) div 2000000
           ELSE -((2 * -__r9 + 1000000) div 2000000)
           END AS noisy_count_e3""",
    )


def kmv_intersect(
    df: DataFrame,
    key_col: str,
    cond_a: Column,
    cond_b: Column,
    k: int = 64,
) -> DataFrame:
    """KMV set-INTERSECTION estimate (Beyer et al. 2007 §5 — the set
    operation HLL cannot do without inclusion-exclusion error blowup,
    and the reason :func:`kmv_distinct` keeps exact hash values): for
    the key-sets A = keys where ``cond_a`` and B = keys where
    ``cond_b``,

        L   = bottom-k of (sketch_A ∪ sketch_B)
        K∩  = |L ∩ sketch_A ∩ sketch_B|
        U   = (k−1)·M / v_k          (union estimate from L's max)
        |A∩B| ≈ (K∩ / k) · U,  Jaccard ≈ K∩ / k

    Integer end-to-end on the md5-derived 32-bit hash space (all the
    divisions half-up — the kmv_distinct idiom). When the union has
    fewer than k distinct hashes the sketches ARE the sets and every
    output is exact (``is_exact``).

    Scale shape: one distinct (side, hash) aggregate + side-keyed
    bottom-k windows; everything after is bounded by 2k rows. Output:
    one row (k, n_union_kept, kth_union_hash, inter_in_sketch,
    union_est, jaccard_e6, intersect_est, is_exact).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    m = 1 << 32
    h = F.expr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 8), 16, 10)"
        " as bigint)"
    )
    sides = df.select(
        h.alias("__h"),
        cond_a.cast("boolean").alias("__a"),
        cond_b.cast("boolean").alias("__b"),
    ).filter(F.col("__a") | F.col("__b"))
    # per-side distinct hashes; bottom-k via orderBy+limit
    # (TakeOrderedAndProject — NEVER an unpartitioned rank window,
    # the DSIR/zipf top-k rule)
    tagged = (
        sides.select(
            F.col("__h"),
            F.when(F.col("__a"), 1).otherwise(0).alias("__sa"),
            F.when(F.col("__b"), 1).otherwise(0).alias("__sb"),
        )
        .groupBy("__h")
        .agg(F.max("__sa").alias("__ia"), F.max("__sb").alias("__ib"))
    ).localCheckpoint(eager=True)  # feeds both side sketches
    ka = (
        tagged.filter(F.col("__ia") == 1)
        .select("__h")
        .orderBy("__h")
        .limit(k)
        .select("__h", F.lit(1).alias("__in_a"))
    )
    kb = (
        tagged.filter(F.col("__ib") == 1)
        .select("__h")
        .orderBy("__h")
        .limit(k)
        .select("__h", F.lit(1).alias("__in_b"))
    )
    union_sk = (
        ka.join(kb, "__h", "full_outer")
        .select(
            "__h",
            F.coalesce("__in_a", F.lit(0)).alias("__in_a"),
            F.coalesce("__in_b", F.lit(0)).alias("__in_b"),
        )
        .orderBy("__h")
        .limit(k)  # bounded: both inputs already <= k rows
    )
    agg = union_sk.agg(
        F.count("*").cast("long").alias("n_union_kept"),
        F.max("__h").cast("long").alias("kth_union_hash"),
        F.sum(
            F.when((F.col("__in_a") == 1) & (F.col("__in_b") == 1), 1).otherwise(0)
        ).cast("long").alias("inter_in_sketch"),
    )
    return agg.selectExpr(
        f"cast({k} as long) AS k",
        "n_union_kept",
        "kth_union_hash",
        "inter_in_sketch",
        f"""CASE WHEN n_union_kept < {k} THEN n_union_kept
             ELSE (2 * {(k - 1) * m}L + kth_union_hash)
                  div (2 * kth_union_hash)
           END AS union_est""",
        f"""CASE WHEN n_union_kept = 0 THEN cast(null as long)
             WHEN n_union_kept < {k} THEN
               (2 * 1000000 * inter_in_sketch + n_union_kept)
               div (2 * n_union_kept)
             ELSE (2 * 1000000 * inter_in_sketch + {k}) div (2 * {k})
           END AS jaccard_e6""",
        f"""CASE WHEN n_union_kept < {k} THEN inter_in_sketch
             ELSE (2 * inter_in_sketch
                   * ((2 * {(k - 1) * m}L + kth_union_hash)
                      div (2 * kth_union_hash)) + {k})
                  div (2 * {k})
           END AS intersect_est""",
        f"cast(n_union_kept < {k} as boolean) AS is_exact",
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    pre: Column,
    post: Column,
    scale: int = 100,
) -> DataFrame:
    """Wilcoxon signed-rank test — the PAIRED member of the
    nonparametric battery (:func:`mannwhitney_u` compares two
    independent groups; this compares two measurements of the SAME
    units): did the paired differences shift, robust to outliers
    that wreck the paired t-test.

    Classic pipeline, engine-exact: d = post − pre in exact
    fixed-point integers; zero differences DROP (the standard
    Wilcoxon treatment); |d| ranks with tied AVERAGE ranks via the
    doubled-rank census idiom (2·avgrank = 2·prefix + c + 1 — the
    :func:`_rank_groups` machinery reused with variant = (d > 0) and
    value = |d|, so r2a = Σ c₊·(2s+c+1) IS exactly 2·W⁺). The
    tie-corrected normal approximation (no continuity correction):

        A = 2·r2a − n(n+1)           (= 4·(W⁺ − n(n+1)/4), exact)
        z = A / sqrt((2·n(n+1)(2n+1) − T) / 3),  T = Σ(t³−t)
        (16·Var[W⁺] = 16·(n(n+1)(2n+1)/24 − T/48) — the T term halves
        relative to the leading one, a factor easy to double-count)

    — one pinned-order IEEE chain over exact decimal(38,0) sums (the
    pearson class). NULL z when no nonzero differences exist or all
    |d| tie into one group with zero variance.

    Output: one row (n_pairs, n_nonzero, w_plus, z_stat) — w_plus as
    half-unit-exact double (ties make W half-integral).
    """
    dec = "decimal(38,0)"
    d = df.select(
        (
            F.round(post * F.lit(scale)).cast("long")
            - F.round(pre * F.lit(scale)).cast("long")
        ).alias("__d")
    )
    n_pairs = d.count()
    nz = d.filter(F.col("__d") != 0).select(
        (F.col("__d") > 0).alias("__pos"),
        F.abs(F.col("__d")).alias("__absd"),
    )
    cg = _rank_groups(nz, F.col("__pos"), "__absd", scale=1)
    agg = cg.selectExpr("ca", "cb", "c", "cum_c - c AS s").agg(
        F.sum(F.col("ca") + F.col("cb")).cast(dec).alias("n"),
        F.sum(
            (F.col("ca") * (2 * F.col("s") + F.col("c") + 1)).cast(dec)
        ).alias("r2a"),
        F.sum(
            (F.col("c") * F.col("c") * F.col("c") - F.col("c")).cast(dec)
        ).alias("t"),
    )
    guard = "n = 0 OR n IS NULL OR 2 * n * (n + 1) * (2 * n + 1) - t = 0"
    return agg.selectExpr(
        f"cast({n_pairs} as long) AS n_pairs",
        "cast(coalesce(n, 0) as long) AS n_nonzero",
        "CAST(coalesce(r2a, 0) AS DOUBLE) / 2 AS w_plus",
        f"""
        CASE WHEN {guard} THEN CAST(NULL AS DOUBLE)
             ELSE CAST(2 * r2a - n * (n + 1) AS DOUBLE)
                  / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - t
                              AS DOUBLE) / 3.0D)
        END AS z_stat
        """,
    )


def mean_cumulative_function(
    events: DataFrame,
    user_col: str,
    day_col: Column,
    is_event: Column,
) -> DataFrame:
    """Nelson's mean cumulative function (MCF) for RECURRENT events —
    the repeated-events companion of the survival pair
    (:func:`kaplan_meier` / :func:`nelson_aalen` model time to ONE
    event; the MCF answers "how many events has the average
    still-observed unit accumulated by day t" — repeat purchases,
    failures, support tickets):

        risk(t)  = # users still under observation at t
                   (observation ends at the user's LAST activity day
                   — the operational proxy when no explicit censor
                   column exists)
        m(t)     = events at t among at-risk users / risk(t)
        MCF(t)   = Σ_{s ≤ t} m(s)

    Engine-exact: per-day increments are half-up e6 integers and the
    MCF is their EXACT integer cumsum (the nelson_aalen additive
    idiom — no products, no ln); both cumulative axes (risk
    depletion, MCF) ride :func:`etl.global_cumsum`
    (range-partitioned, never a single-reducer window).

    Output: (day, n_events, n_risk, increment_e6, mcf_e6) ordered by
    day, one row per day with ≥1 qualifying event.
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    base = events.select(
        F.col(user_col).alias("__u"),
        day_col.cast("long").alias("__d"),
        is_event.cast("boolean").alias("__e"),
    )
    # ONE events scan (r10): roll up to (user, day) first — the old
    # shape aggregated `base` twice on different keys (per-user end
    # day, per-day event count), so the events scan and its full-row
    # shuffle ran twice, plus a third pipeline run for ends.count().
    # The rollup's map-side partial aggregation shrinks the shuffle
    # to user x day rows, and every later frame derives from the
    # pinned rollup.
    ud = (
        base.groupBy("__u", "__d")
        .agg(F.sum(F.col("__e").cast("long")).cast("long").alias("__ne"))
        .localCheckpoint(eager=True)
    )
    ends = ud.groupBy("__u").agg(F.max("__d").alias("__end"))
    end_census = ends.groupBy("__end").agg(
        F.count("*").cast("long").alias("__k")
    ).localCheckpoint(eager=True)
    n_users = end_census.agg(F.sum("__k")).collect()[0][0] or 0
    ev = (
        ud.filter(F.col("__ne") > 0)
        .groupBy("__d")
        .agg(F.sum("__ne").cast("long").alias("n_events"))
    )
    # risk at day d = n_users - #(ends strictly before d): union the
    # event-day and end-day frames onto ONE day axis so a single
    # cumsum carries both counters (the logrank one-pass idiom)
    axis = (
        ev.selectExpr("__d", "n_events", "0L AS __k")
        .unionByName(
            end_census.selectExpr("__end AS __d", "0L AS n_events", "__k")
        )
        .groupBy("__d")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("__k").cast("long").alias("__k"),
        )
    )
    cum = global_cumsum(axis, [F.col("__d")], ["__k"]).selectExpr(
        "__d",
        "n_events",
        f"{n_users}L - (cum___k - __k) AS n_risk",
    )
    inc = cum.filter(F.col("n_events") > 0).selectExpr(
        "__d",
        "n_events",
        "n_risk",
        "(2 * 1000000 * n_events + n_risk) div (2 * n_risk) AS increment_e6",
    )
    out = global_cumsum(inc, [F.col("__d")], ["increment_e6"])
    return out.selectExpr(
        "__d AS day",
        "n_events",
        "n_risk",
        "increment_e6",
        "cum_increment_e6 AS mcf_e6",
    ).orderBy("day")


def bland_altman(
    df: DataFrame,
    a: Column,
    b: Column,
    scale: int = 100,
) -> DataFrame:
    """Bland–Altman agreement analysis (Bland & Altman 1986) — do two
    measurements of the SAME units agree well enough to be used
    interchangeably? The method-comparison companion of
    :func:`cohens_kappa_2x2` (categorical raters) and
    :func:`wilcoxon_signed_rank` (did the pairs SHIFT — a distinct
    question from "how far apart do they scatter"):

        bias = mean(d),  d = a − b in exact fixed-point units
        LoA  = bias ± 1.959964·sd(d)    (the 95% limits of agreement)

    plus the empirical share of pairs inside the limits. Engine-exact
    the pearson way: Σd and Σd² accumulate in decimal(38,0); bias and
    sd are pinned-order IEEE expressions of those exact integers; the
    z quantile is the FIXED e6 integer 1959964 forced to double in
    both engines (the wilson_ci lesson — a bare 1.959964 literal is
    DECIMAL in DuckDB and its square diverges). The within-limits
    comparison tests exact-integer d against the computed double
    bounds — deterministic in both engines. sd needs n ≥ 2 and
    non-constant d, else NULL limits.

    Output: one row (n, bias, sd_diff, loa_low, loa_high, n_within,
    within_e6) — bias/sd/limits in the SCALED unit (e.g. cents).
    """
    dec = "decimal(38,0)"
    d = df.select(
        (
            F.round(a * F.lit(scale)).cast("long")
            - F.round(b * F.lit(scale)).cast("long")
        ).alias("__d")
    ).localCheckpoint(eager=True)  # two consumers: stats + coverage
    # sd = sqrt((n·Σd² − (Σd)²) / (n(n−1))) — the textbook sample sd
    # of the differences from exact sums
    stats = d.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("__d").cast(dec).alias("sd_"),
        F.sum(F.col("__d").cast(dec) * F.col("__d").cast(dec)).alias("ss"),
    ).selectExpr(
        "n",
        "sd_",
        "ss",
        "CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE) AS bias",
        """CASE WHEN n >= 2 AND n * ss - sd_ * sd_ > 0 THEN
             sqrt(CAST(n * ss - sd_ * sd_ AS DOUBLE)
                  / CAST(n * (n - 1) AS DOUBLE))
           END AS sd_diff""",
    ).selectExpr(
        "n",
        "bias",
        "sd_diff",
        "bias - (CAST(1959964 AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " * sd_diff AS loa_low",
        "bias + (CAST(1959964 AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " * sd_diff AS loa_high",
    )
    within = (
        d.crossJoin(F.broadcast(stats))
        .agg(
            F.sum(
                F.when(
                    (F.col("__d").cast("double") >= F.col("loa_low"))
                    & (F.col("__d").cast("double") <= F.col("loa_high")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_within")
        )
    )
    return (
        stats.crossJoin(F.broadcast(within))
        .selectExpr(
            "CAST(n AS LONG) AS n",
            "bias",
            "sd_diff",
            "loa_low",
            "loa_high",
            "CASE WHEN loa_low IS NULL THEN CAST(NULL AS LONG)"
            " ELSE n_within END AS n_within",
            """CASE WHEN loa_low IS NULL OR n = 0 THEN CAST(NULL AS LONG)
               ELSE (2 * 1000000 * n_within + CAST(n AS LONG))
                    div (2 * CAST(n AS LONG))
               END AS within_e6""",
        )
    )

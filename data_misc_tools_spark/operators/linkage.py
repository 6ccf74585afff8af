"""Probabilistic record linkage: Fellegi–Sunter match weights.

The decision layer that sits ON TOP of this repo's candidate
generators (SNM blocking, PPJoin prefix filtering, MinHash-LSH,
edit-distance verify): given candidate pairs with per-field agreement
flags and a match label (from exact-dup ground truth, a hand-labeled
sample, or an unsupervised EM bootstrap), learn per-field log-odds
weights m_i/u_i (Fellegi & Sunter 1969, JASA; the model behind
Splink/dedupe.io) and score every pair by the summed weights of its
agreement pattern. High score = link, low = non-link, middle = review.

Engine-exact throughout (the keyness/dsir idiom): m and u are
add-one-smoothed ratios of EXACT pair counts, each weight is a sum of
per-quantity e6-rounded natural logs of those integers, and a pair's
score is an integer e6 sum — any engine reproduces the ranking
bit-for-bit.

Scale shape: learning is ONE map-side-combined aggregate over the
candidate pairs (4 counters per field in the same pass); scoring
broadcasts the single weights row back onto the pairs via crossJoin —
no collect, the whole learn+score pipeline is one lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_misc_tools_spark.session import local_df


def _e6ln(expr: str) -> str:
    """e6-rounded natural log of an exact-integer SQL expression —
    the engine-portable per-quantity log (DuckDB twin:
    round(ln((x)::DOUBLE) * 1e6)::BIGINT)."""
    return f"CAST(round(ln(CAST({expr} AS DOUBLE)) * 1e6) AS BIGINT)"


def fellegi_sunter_weights(
    pairs: DataFrame,
    agree_cols: list[str],
    label_col: str,
) -> DataFrame:
    """Learn per-field Fellegi–Sunter weights from labeled candidate
    pairs: m_i = P(field i agrees | match), u_i = P(agrees | unmatch),
    add-one smoothed so a field that never disagrees on matches still
    gets a finite weight. Emitted as exact integers:

    - n_match / n_unmatch, n_agree_match / n_agree_unmatch — the raw
      counters (one aggregate pass, all fields together);
    - w_agree_e6  = e6·ln(m/u)  = Σ ± e6ln of the four smoothed-count
      integers (am+1, nm+2, au+1, nu+2);
    - w_disagree_e6 = e6·ln((1−m)/(1−u)) over (nm−am+1, nm+2,
      nu−au+1, nu+2).

    ``agree_cols`` are boolean columns on ``pairs``; NULL agreement
    counts as disagreement (unknown cannot prove agreement — the
    validate_contract convention). Output: one row per field
    (field, n_match, n_unmatch, n_agree_match, n_agree_unmatch,
    w_agree_e6, w_disagree_e6), ordered by field.
    """
    if not agree_cols:
        raise ValueError("need at least one agreement column")
    lab = F.col(label_col).cast("boolean")
    aggs = [
        F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("__nm"),
        F.sum(F.when(~lab, 1).otherwise(0)).cast("long").alias("__nu"),
    ]
    for c in agree_cols:
        a = F.coalesce(F.col(c).cast("boolean"), F.lit(False))
        aggs.append(
            F.sum(F.when(lab & a, 1).otherwise(0)).cast("long").alias(f"__am_{c}")
        )
        aggs.append(
            F.sum(F.when(~lab & a, 1).otherwise(0)).cast("long").alias(f"__au_{c}")
        )
    wide = pairs.agg(*aggs)
    per_field = ", ".join(
        f"struct('{c}' AS field, __am_{c} AS am, __au_{c} AS au)"
        for c in agree_cols
    )
    rows = wide.selectExpr(
        "__nm", "__nu", f"explode(array({per_field})) AS f"
    ).selectExpr("f.field AS field", "__nm", "__nu", "f.am AS am", "f.au AS au")
    return rows.selectExpr(
        "field",
        "__nm AS n_match",
        "__nu AS n_unmatch",
        "am AS n_agree_match",
        "au AS n_agree_unmatch",
        f"""{_e6ln("am + 1")} - {_e6ln("__nm + 2")}
          - {_e6ln("au + 1")} + {_e6ln("__nu + 2")} AS w_agree_e6""",
        f"""{_e6ln("__nm - am + 1")} - {_e6ln("__nm + 2")}
          - {_e6ln("__nu - au + 1")} + {_e6ln("__nu + 2")} AS w_disagree_e6""",
    ).orderBy("field")


def fs_score_pairs(
    pairs: DataFrame,
    agree_cols: list[str],
    label_col: str,
) -> DataFrame:
    """Learn weights from the labeled pairs and score EVERY pair by
    its agreement pattern: score_e6 = Σ_i (agrees_i ? w_agree_i :
    w_disagree_i) — the Fellegi–Sunter decision statistic, exact e6
    integer. The single learned-weights row rides a broadcast
    crossJoin back onto the pairs (codebook-broadcast class, no
    collect, one lazy plan); self-training on ground-truth labels is
    the demo shape — production feeds a labeled sample or EM
    estimates through the same path.

    Output: every input pair column + n_agree + score_e6.
    """
    if not agree_cols:
        raise ValueError("need at least one agreement column")
    w = fellegi_sunter_weights(pairs, agree_cols, label_col)
    onerow = w.groupBy().pivot("field", agree_cols).agg(
        F.first("w_agree_e6").alias("wa"),
        F.first("w_disagree_e6").alias("wd"),
    )
    scored = pairs.crossJoin(F.broadcast(onerow))
    agree = [
        F.coalesce(F.col(c).cast("boolean"), F.lit(False)) for c in agree_cols
    ]
    score = None
    for c, a in zip(agree_cols, agree):
        term = F.when(a, F.col(f"{c}_wa")).otherwise(F.col(f"{c}_wd"))
        score = term if score is None else score + term
    n_agree = None
    for a in agree:
        t = a.cast("long")
        n_agree = t if n_agree is None else n_agree + t
    drop = [f"{c}_wa" for c in agree_cols] + [f"{c}_wd" for c in agree_cols]
    return (
        scored.withColumn("n_agree", n_agree.cast("long"))
        .withColumn("score_e6", score.cast("long"))
        .drop(*drop)
    )


def fs_em_weights(
    pairs: DataFrame,
    agree_cols: list[str],
    max_iter: int = 20,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.5,
    max_fields: int = 16,
) -> "tuple[DataFrame, float]":
    """UNSUPERVISED Fellegi–Sunter weights via EM over agreement
    patterns (Winkler 1988 — the Splink default when no labels
    exist): estimate per-field m_i, u_i and the match prevalence λ
    from the candidate pairs alone, assuming conditional independence
    of fields given match status.

    The scale trick (the markov_stationary_fast pattern): pairs
    collapse to their agreement PATTERN first — one aggregate pass
    yields ≤ 2^|fields| (pattern, count) rows, a BOUNDED table
    (``max_fields`` guards the 2^k blowup) — and EM then iterates
    DRIVER-SIDE over that tiny census with plain floats. A billion
    candidate pairs cost ONE distributed aggregate regardless of
    max_iter; the EM itself is microseconds.

    rows-only by design: float EM is not engine-portable — grading
    belongs to the supervised :func:`fellegi_sunter_weights`;
    production without labels runs this, then feeds the learned
    weights to scoring. NULL agreement counts as disagreement (the
    supervised convention). Returns (weights DataFrame with per-field
    m, u, w_agree, w_disagree doubles; final λ). The weights frame is
    built with createDataFrame — bounded |fields| rows.
    """
    import math

    if not agree_cols:
        raise ValueError("need at least one agreement column")
    if len(agree_cols) > max_fields:
        raise ValueError(
            f"{len(agree_cols)} fields would census 2^{len(agree_cols)} "
            f"patterns; raise max_fields if you mean it"
        )
    pat = [
        F.coalesce(F.col(c).cast("boolean"), F.lit(False)).cast("int").alias(c)
        for c in agree_cols
    ]
    census = [
        (tuple(r[c] for c in agree_cols), r["__n"])
        for r in pairs.select(*pat)
        .groupBy(*agree_cols)
        .agg(F.count("*").alias("__n"))
        .collect()
    ]
    total = sum(n for _, n in census)
    if total == 0:
        raise ValueError("no candidate pairs")
    k = len(agree_cols)
    m = [init_m] * k
    u = [init_u] * k
    lam = init_lambda
    eps = 1e-12
    for _ in range(max_iter):
        # E-step: posterior P(match | pattern) per census row
        sm = [0.0] * k
        su = [0.0] * k
        tm = 0.0
        for gamma, n in census:
            pm = lam
            pu = 1.0 - lam
            for i in range(k):
                pm *= m[i] if gamma[i] else (1.0 - m[i])
                pu *= u[i] if gamma[i] else (1.0 - u[i])
            w = pm / (pm + pu) if pm + pu > 0 else 0.0
            tm += w * n
            for i in range(k):
                if gamma[i]:
                    sm[i] += w * n
                    su[i] += (1.0 - w) * n
        # M-step, clamped away from 0/1 so log-odds stay finite
        lam = min(max(tm / total, eps), 1.0 - eps)
        tu = total - tm
        for i in range(k):
            m[i] = min(max(sm[i] / tm if tm > 0 else init_m, eps), 1.0 - eps)
            u[i] = min(max(su[i] / tu if tu > 0 else init_u, eps), 1.0 - eps)
    rows = [
        (
            c,
            float(m[i]),
            float(u[i]),
            float(math.log(m[i] / u[i])),
            float(math.log((1.0 - m[i]) / (1.0 - u[i]))),
        )
        for i, c in enumerate(agree_cols)
    ]
    wdf = local_df(
        pairs.sparkSession, rows,
        "field string, m double, u double, w_agree double, w_disagree double"
    )
    return wdf, float(lam)


def jaro_winkler_e6(
    s1: "Column | str",
    s2: "Column | str",
    max_len: int = 62,
) -> "Column":
    """Jaro–Winkler similarity as an exact e6 INTEGER — the jw_e6
    field of :func:`jaro_winkler_components` (see there for the full
    exactness story and cost contract)."""
    return jaro_winkler_components(s1, s2, max_len).getField("jw_e6")


def jaro_winkler_components(
    s1: "Column | str",
    s2: "Column | str",
    max_len: int = 62,
) -> "Column":
    """Jaro–Winkler as a STRUCT of its exact integer components
    (m, t, p, jw_e6) — m matches, t mismatched aligned positions
    (= 2·half-transpositions), p common prefix ≤ 4, and the final
    half-up e6 score derived from them. Emitting the components makes
    the comparator ORACLE-CHECKABLE: every field is an exact integer
    with no float boundary anywhere, so an engine twin that replays
    the same greedy matching loop (a bounded recursive CTE does)
    reproduces all four bit-for-bit — unlike comparing against a
    built-in double `jaro_winkler_similarity`, whose rounding and
    boost-threshold conventions vary by engine.

    Pure Catalyst —
    the record-linkage string comparator (names, titles, codes) beside
    JVM ``levenshtein``: J-W rewards shared prefixes and tolerates
    transpositions, which is why it is the default field comparator in
    Winkler's own matcher and Splink.

    Exactness: Jaro = (m/l1 + m/l2 + (2m−t)/(2m)) / 3 and Winkler's
    prefix boost jw = ((10−p)·jaro + p)/10 (p = common prefix ≤ 4) are
    RATIONALS of integer quantities (m matches, t half-transposition
    mismatches, lengths) — emitted as ONE half-up e6 value over the
    common denominator. Every integer step is exact: the floor
    division rides the (x − x % y)/y identity (the numerator is an
    exact multiple, so the double divide is exact), and the matched-
    position bitmask lives in bits 1..62 of one BIGINT (hence
    ``max_len`` ≤ 62 — longer strings raise loudly; truncate or chunk
    upstream). Any engine reproducing the same integers reproduces
    the same e6 score bit-for-bit.

    Mechanics (bounded folds, no Python): greedy left-to-right Jaro
    matching carries (bitmask, m, matched-s1-chars) as fold state; the
    window scan is a filter over a FIXED 1..max_len sequence (Spark's
    sequence(a, b) runs DESCENDING when a > b — the filter form keeps
    order and emptiness correct); m2/t/prefix read the let-bound match
    state (one-element-array lambda, the audio-fingerprint trick — the
    three consumers would otherwise re-run the O(max_len²) fold).

    Conventions: both empty → 1e6; one empty or m = 0 → 0. Cost is
    O(max_len²) interpreted fold steps per pair — apply to BLOCKED
    candidate pairs, never a raw cross join.
    """
    if max_len > 62:
        raise ValueError("bitmask lives in one BIGINT: max_len <= 62")
    c1 = F.col(s1) if isinstance(s1, str) else s1
    c2 = F.col(s2) if isinstance(s2, str) else s2
    l1, l2 = F.length(c1).cast("long"), F.length(c2).cast("long")
    guard = F.when(
        (l1 > max_len) | (l2 > max_len),
        F.raise_error(
            F.lit(
                f"jaro_winkler_e6: string longer than max_len={max_len}"
                " — truncate or chunk upstream"
            )
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    w = F.greatest(
        _floordiv(F.greatest(l1, l2), F.lit(2).cast("long")) - 1,
        F.lit(0).cast("long"),
    )

    def p2(j):
        # 2^(j-1) as an exact long (powers of two are exact doubles)
        return F.pow(F.lit(2.0), (j - 1).cast("int")).cast("long")

    def bit(mask, j):
        # 1-based bit j of mask via exact integer mod (no >> on Columns)
        return F.when(mask % (2 * p2(j)) >= p2(j), F.lit(1)).otherwise(F.lit(0))

    def match_step(acc, i):
        mask = acc.getField("mask")
        ch = F.substring(c1, i.cast("int"), F.lit(1))
        cand = F.filter(
            F.sequence(F.lit(1), F.lit(max_len)),
            lambda j: (j >= i - w)
            & (j <= i + w)
            & (j <= l2)
            & (F.substring(c2, j.cast("int"), F.lit(1)) == ch)
            & (bit(mask, j) == 0),
        )
        j0 = F.when(F.size(cand) > 0, F.element_at(cand, 1)).otherwise(
            F.lit(0)
        ).cast("long")
        hit = j0 > 0
        return F.struct(
            F.when(hit, mask + p2(j0)).otherwise(mask).alias("mask"),
            F.when(hit, acc.getField("m") + 1)
            .otherwise(acc.getField("m"))
            .alias("m"),
            F.when(hit, F.concat(acc.getField("m1"), ch))
            .otherwise(acc.getField("m1"))
            .alias("m1"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("mask"),
        F.lit(0).cast("long").alias("m"),
        F.lit("").alias("m1"),
    )
    matched = F.aggregate(
        F.filter(F.sequence(F.lit(1), F.lit(max_len)), lambda i: i <= l1),
        init,
        match_step,
    )

    def full(mt):
        mask = mt.getField("mask")
        m = mt.getField("m")
        m1 = mt.getField("m1")
        m2 = F.aggregate(
            F.filter(F.sequence(F.lit(1), F.lit(max_len)), lambda j: j <= l2),
            F.lit(""),
            lambda acc, j: F.when(
                bit(mask, j) == 1,
                F.concat(acc, F.substring(c2, j.cast("int"), F.lit(1))),
            ).otherwise(acc),
        )
        t = F.aggregate(
            F.filter(F.sequence(F.lit(1), F.lit(max_len)), lambda k: k <= m),
            F.lit(0).cast("long"),
            lambda acc, k: acc
            + F.when(
                F.substring(m1, k.cast("int"), F.lit(1))
                != F.substring(m2, k.cast("int"), F.lit(1)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        p = F.array_max(
            F.transform(
                F.sequence(F.lit(1), F.lit(4)),
                lambda i: F.when(
                    (i <= F.least(l1, l2))
                    & (
                        F.substring(c1, 1, i.cast("int"))
                        == F.substring(c2, 1, i.cast("int"))
                    ),
                    i,
                ).otherwise(F.lit(0)),
            )
        ).cast("long")
        num = 2 * m * m * l2 + 2 * m * m * l1 + l1 * l2 * (2 * m - t)
        dd = 6 * l1 * l2 * m
        jw_num = F.lit(1_000_000).cast("long") * ((10 - p) * num + p * dd)
        jw_den = 10 * dd
        half_up = _floordiv(2 * jw_num + jw_den, 2 * jw_den)
        jw = (
            F.when((l1 == 0) & (l2 == 0), F.lit(1_000_000).cast("long"))
            .when((m == 0) | (l1 == 0) | (l2 == 0), F.lit(0).cast("long"))
            .otherwise(half_up)
        )
        # guard rides every field so column pruning can't skip the
        # too-long raise no matter which component a query keeps
        return F.struct(
            (m + guard).alias("m"),
            (t + guard).alias("t"),
            (p + guard).alias("p"),
            (jw + guard).alias("jw_e6"),
        )

    return F.element_at(F.transform(F.array(matched), full), 1)


def _floordiv(x: "Column", y: "Column") -> "Column":
    """Exact nonnegative integer floor division on Columns: the
    numerator x − x % y is an exact multiple of y, so the double
    division is exact and the cast is safe (Column has no `div`;
    a plain `/`-then-cast truncates a ROUNDED quotient — the repo's
    documented divergence trap)."""
    return ((x - x % y) / y).cast("long")


def golden_record(
    df: DataFrame,
    cluster_col: str,
    attr_cols: list,
) -> DataFrame:
    """Golden-record construction — the survivorship step that closes
    the entity-resolution pipeline (blocking → scoring →
    :func:`fellegi_sunter_score` → clustering → THIS): for each
    resolved cluster, elect one canonical value per attribute by
    majority vote over the member records, ties broken
    deterministically to the lexicographically smallest value (the
    dedup keep-best convention). NULLs abstain (a missing field never
    outvotes an observed one); clusters where an attribute is never
    observed emit no row for it.

    Engine-exact: votes are exact counts; the winner is
    min(struct(−votes, value)) — count DESC then value ASC, a total
    order, so both engines elect the identical record.

    Scale shape: ONE scan (per-row explode into one (attr, value)
    struct per attribute — the unique_column_combinations idiom), one
    (cluster, attr, value) census shuffle with map-side combine, one
    argmin aggregate per (cluster, attr). No windows, no collect —
    the output is a full distributed frame, one row per (cluster,
    observed attr).

    Output: (cluster, attr, value, votes, n_obs) where n_obs counts
    the cluster's non-null observations of that attribute.
    """
    if not attr_cols:
        raise ValueError("need at least one attribute column")
    structs = [
        F.struct(
            F.lit(a).alias("attr"), F.col(a).cast("string").alias("value")
        )
        for a in attr_cols
    ]
    long = (
        df.select(
            F.col(cluster_col).alias("cluster"),
            F.explode(F.array(*structs)).alias("s"),
        )
        .select("cluster", "s.attr", "s.value")
        .where(F.col("value").isNotNull())
    )
    census = long.groupBy("cluster", "attr", "value").agg(
        F.count("*").cast("long").alias("c")
    )
    return census.groupBy("cluster", "attr").agg(
        F.min(
            F.struct((-F.col("c")).alias("nc"), F.col("value").alias("value"))
        ).alias("w"),
        F.sum("c").cast("long").alias("n_obs"),
    ).select(
        "cluster", "attr",
        F.col("w.value").alias("value"),
        (-F.col("w.nc")).cast("long").alias("votes"),
        "n_obs",
    )


def mutual_best_match(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal-best-match filtering of scored candidate pairs —
    the classic high-precision linkage rule (bioinformatics' ortholog
    BBH; dedup's "marriage" matching): keep (u, v) only when v is u's
    highest-scoring partner AND u is v's. Kills the hub failure mode
    where one template record matches hundreds — a hub can be best
    FOR many nodes but has only one best of its own, so at most one
    of those links survives. The precision step between
    :func:`fellegi_sunter_score` and :func:`golden_record`.

    Deterministic: the per-node best is the (score DESC, partner ASC)
    row-number-1 over the symmetrized pair list — a total order, so
    ties resolve identically in both engines.

    Scale shape: one symmetrizing union, one node-keyed rank window,
    one self-join of the two best-lists (mutuality check) — all
    keyed, no global sorts, no collect.

    Output: (node_a, node_b, score), node_a < node_b, each node
    appearing at most once.
    """
    from pyspark.sql.window import Window

    sym = pairs.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v"),
        F.col(score_col).alias("s"),
    ).unionAll(
        pairs.select(
            F.col(b_col).alias("u"), F.col(a_col).alias("v"),
            F.col(score_col).alias("s"),
        )
    )
    w = Window.partitionBy("u").orderBy(F.desc("s"), "v")
    best = (
        sym.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("u", "v", "s")
        # the mutuality self-join references best TWICE — unpinned,
        # the whole upstream scoring pipeline (e.g. the wedge-census
        # Jaccard in the catalog demo: 25 SortMergeJoins static) is
        # planned and executed once per reference. best is bounded by
        # the node count (one row per node), so pin it (r10; the mcf
        # precedent — local wall-clock is a slight win at sf0.1,
        # 1.2-1.4 -> 1.1-1.2 s canary-clean, and halving the upstream
        # is the scale lever)
        .localCheckpoint(eager=True)
    )
    other = best.select(
        F.col("u").alias("v2"), F.col("v").alias("u2")
    )
    return (
        best.join(
            other,
            (F.col("u") == F.col("u2")) & (F.col("v") == F.col("v2")),
        )
        .filter(F.col("u") < F.col("v"))
        .select(
            F.col("u").alias("node_a"), F.col("v").alias("node_b"),
            F.col("s").alias("score"),
        )
    )


def blocking_quality(
    candidates: DataFrame,
    truth: DataFrame,
    n_records: int,
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """Blocking-scheme evaluation (Christen 2012's standard triple) —
    the pre-flight audit every linkage/dedup pipeline needs before
    trusting its candidate generator (LSH bands, sorted neighborhood,
    blocking keys):

        reduction_ratio     = 1 − |C| / (n·(n−1)/2)   (work saved)
        pairs_completeness  = |C ∩ M| / |M|           (recall of truth)
        pairs_quality       = |C ∩ M| / |C|           (precision of C)

    A good blocker has RR ≈ 1 with PC ≈ 1; PQ says how much the
    verify stage will throw away. Candidate and truth pairs must be
    (left < right)-normalized; both are distinct-ed defensively.

    Exact integers end-to-end (counts, decimal(38,0) universe); each
    ratio is ONE unrounded IEEE division (the pearson class). Output:
    one row (n_records, n_universe_pairs, n_candidates, n_truth,
    n_matched, reduction_ratio, pairs_completeness, pairs_quality) —
    NULL ratios on empty denominators.
    """
    if n_records < 0:
        raise ValueError(f"n_records must be >= 0, got {n_records}")
    c = candidates.select(left, right).distinct()
    m = truth.select(left, right).distinct()
    # one pass over each input pipeline (r10): a full-outer join on
    # the pair key marks membership on both sides, and a single
    # aggregate reads all three counts. The previous shape consumed
    # `c` twice (count + intersection join) and `m` twice — each
    # reference re-ran its whole upstream (for the LSH demo, the md5
    # shingle + band self-join pipeline) because the count aggregate
    # and the join shuffle differently, so nothing was reusable.
    cm = c.withColumn("__c", F.lit(1)).join(
        m.withColumn("__m", F.lit(1)), [left, right], "full_outer"
    )
    stats = cm.agg(
        F.count("__c").cast("long").alias("n_candidates"),
        F.count("__m").cast("long").alias("n_truth"),
        F.count(F.when(F.col("__c").isNotNull() & F.col("__m").isNotNull(), 1))
        .cast("long")
        .alias("n_matched"),
    )
    n0 = n_records * (n_records - 1) // 2
    return stats.selectExpr(
        f"cast({n_records} as long) AS n_records",
        f"cast({n0} as long) AS n_universe_pairs",
        "n_candidates",
        "n_truth",
        "n_matched",
        f"""CASE WHEN {n0} > 0 THEN
             1.0D - cast(n_candidates as double) / cast({n0} as double)
           END AS reduction_ratio""",
        """CASE WHEN n_truth > 0 THEN
             cast(n_matched as double) / cast(n_truth as double)
           END AS pairs_completeness""",
        """CASE WHEN n_candidates > 0 THEN
             cast(n_matched as double) / cast(n_candidates as double)
           END AS pairs_quality""",
    )

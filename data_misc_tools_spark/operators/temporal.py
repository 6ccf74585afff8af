"""Temporal join operators Spark lacks as built-ins: as-of and range joins.

Neither exists in the reference (it delegates all joins to Hive) nor in
Spark's operator set; both are staples of event/time-series pipelines,
so the engine provides them as compositions of built-in operators with
plans that survive scale (SURVEY-prompt custom-operator tier (a)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_misc_tools_spark.session import local_df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    strict: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time join: for each left row, attach the columns of the
    most recent right row with the same ``by`` key and ``on`` (time)
    ≤ / < the left row's.

    Implementation is the union-window construction, NOT a range join:
    tag both sides, union, and take the last non-null right value over
    a (by)-partitioned window ordered by time. One shuffle on the by
    key, zero row amplification — the plan that survives 100 TB, where
    an inequality join would explode (per-key cross products) and a
    per-key UDF would serialize.

    ``strict=True`` means strictly-before (ties excluded): right rows
    at the same timestamp sort AFTER left rows so the window never
    sees them. With ``strict=False`` ties are included (right-at-ts
    sorts first). Ties among multiple right rows at one timestamp
    resolve to the one the window saw last — callers needing full
    determinism should pre-dedupe right to one row per (by, on).
    """
    lcols = left.columns
    # side marker orders equal timestamps: strict -> left first (right
    # not yet visible), non-strict -> right first
    l_tag = F.lit(1 if strict else 2)
    r_tag = F.lit(2 if strict else 1)
    l = left.select(
        F.col(by), F.col(on), l_tag.alias("__side"),
        *[F.col(c) for c in lcols if c not in (by, on)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r = right.select(
        F.col(by), F.col(on), r_tag.alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (by, on)],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *[F.col(c) for c in [by, on]],
        F.col("__side"),
        *[F.col(c) for c in lcols if c not in (by, on)],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return filled.filter(F.col("__side") == (1 if strict else 2)).drop("__side")


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join fact rows to the interval containing their value:
    ``lo <= value < hi``.

    The interval side is broadcast (interval dimensions are small by
    construction); Catalyst turns this into a broadcast nested-loop
    with the band predicate — no shuffle of the fact side. For huge
    interval tables, pre-bucket both sides on a coarse grid instead.

    Overlapping intervals multiply matching fact rows (standard join
    semantics) — supply disjoint intervals when a 1:1 result is
    expected; unmatched facts keep one row with null interval columns.
    """
    return facts.join(
        F.broadcast(intervals),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "left",
    )


def funnel_stages(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered-funnel analysis: how far each user progresses through
    ``steps`` (each step strictly LATER than the one before). Output:
    (user_col, funnel_stage) with stage in [0, len(steps)].

    Greedy-earliest matching (first step-1 event, then the first
    step-2 event after it, ...) is provably optimal for reachability,
    so this equals the correlated min-chain a SQL engine would run.

    One shuffle on the user key; the per-user fold is a Catalyst
    array_sort + aggregate lambda over (ts, type) structs — pure JVM,
    no Python, no per-user repeated scans (a join-per-stage plan scans
    the events table len(steps) times; this scans ONCE). Users whose
    event counts are pathological (bots with millions of events) cost
    O(n log n) in the sort; pre-filter df to the step types — done
    below — so only funnel-relevant events are carried."""
    steps_lit = F.array(*[F.lit(s) for s in steps])
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(id_col).alias("i"),
            F.col(type_col).alias("y"),
        ).alias("__e"),
    )
    folded = (
        ev.groupBy(user_col)
        .agg(F.array_sort(F.collect_list("__e")).alias("__evs"))
        .select(
            F.col(user_col),
            F.aggregate(
                F.col("__evs"),
                F.struct(
                    F.lit(0).alias("stage"),
                    F.lit(None).cast("timestamp").alias("t"),
                ),
                lambda acc, e: F.when(
                    (acc.stage < F.size(steps_lit))
                    & (e.y == F.element_at(steps_lit, acc.stage + 1))
                    & (acc.t.isNull() | (e.t > acc.t)),
                    F.struct((acc.stage + 1).alias("stage"), e.t.alias("t")),
                ).otherwise(acc),
            ).alias("__st"),
        )
        .select(user_col, F.col("__st.stage").alias("funnel_stage"))
    )
    return folded


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Funnel conversion table: (stage, n_users) where n_users counts
    users reaching AT LEAST that stage. Tiny result; the per-user
    stage frame reduces map-side before the final single-partition
    stack."""
    st = funnel_stages(df, steps, user_col, ts_col, type_col, id_col)
    aggs = [
        F.sum((F.col("funnel_stage") >= i).cast("long")).alias(f"__n{i}")
        for i in range(1, len(steps) + 1)
    ]
    wide = st.agg(*aggs)
    stack_args = ", ".join(f"{i}, __n{i}" for i in range(1, len(steps) + 1))
    return wide.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (stage, n_users)"
    ).selectExpr("cast(stage AS int) AS stage", "cast(n_users AS bigint) AS n_users")


def funnel_stages_bounded(
    df: DataFrame,
    steps: list[str],
    max_gap_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-bounded ordered funnel: how far each user progresses
    through ``steps`` when every consecutive step must land within
    ``max_gap_s`` seconds of the previous one — the product-analytics
    form ("clicked within a day of viewing"), where the unbounded
    :func:`funnel_stages` overcounts by pairing a January view with a
    June purchase.

    GREEDY-EARLIEST IS WRONG here (view@0, view@10, click@12 at
    gap 5: greedy anchors on view@0 and misses the feasible
    view@10→click@12 chain), so the fold is the correct reachability
    DP instead: state = the LATEST FEASIBLE completion time per
    stage; an event of step s at time t completes s iff stage s−1 has
    a feasible completion in [t−gap, t) — and since the constraint is
    a lower bound, the latest completion is the only one that
    matters. Events arrive time-sorted, so each update keeps the
    per-stage maximum for free, and non-null stages form a prefix
    (stage s needs s−1 first) — funnel_stage = count of non-nulls.

    TIED TIMESTAMPS: the chain constraint is STRICTLY increasing
    time, so an event at time t must see only completions strictly
    before t — a same-second stage-(s−1) update must be invisible to
    a same-second stage-s event (view@a, view@b, click@b: the click
    chains off view@a, and view@b must not shadow it). Each stage
    therefore carries TWO completion times: ``lt`` (latest overall)
    and ``pt`` (latest strictly before ``lt``); a check at time t
    reads ``lt`` when ``lt < t``, else ``pt`` — by time-sortedness
    that is exactly the latest completion strictly before t. The
    DuckDB oracle's exists-join (``c.t > v.t AND c.t - v.t <= gap``)
    counts the same chains.

    Same scale shape as funnel_stages: pre-filter to step types, ONE
    user-keyed shuffle, a Catalyst array_sort + aggregate fold over
    (ts, id, type) structs — pure JVM, one scan, never a
    join-per-stage plan.

    Output: (user_col, funnel_stage) with stage in [0, len(steps)].
    """
    if max_gap_s <= 0:
        raise ValueError("max_gap_s must be positive")
    k = len(steps)
    if k < 2:
        raise ValueError("need at least two steps")
    steps_lit = F.array(*[F.lit(s) for s in steps])
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).cast("long").alias("t"),
            F.col(id_col).alias("i"),
            F.col(type_col).alias("y"),
        ).alias("__e"),
    )
    null_t = F.lit(None).cast("long")
    init = F.array(
        *[
            F.struct(null_t.alias("lt"), null_t.alias("pt"))
            for _ in range(k)
        ]
    )

    def step_fn(acc, e):
        pos = F.array_position(steps_lit, e.y)  # 1-based
        ps = F.element_at(acc, (pos - 1).cast("int"))
        # Latest completion of stage pos-1 STRICTLY before e.t (events
        # are time-sorted, so lt <= e.t always; lt == e.t -> use pt).
        prev = F.when(ps["lt"] < e.t, ps["lt"]).otherwise(ps["pt"])
        ok = F.when(pos == 1, F.lit(True)).otherwise(
            prev.isNotNull()
            & (e.t > prev)
            & (e.t - prev <= F.lit(int(max_gap_s)))
        )
        return F.transform(
            acc,
            lambda v, i: F.when(
                (i + 1 == pos) & ok & (v["lt"].isNull() | (e.t > v["lt"])),
                F.struct(e.t.alias("lt"), v["lt"].alias("pt")),
            ).otherwise(v),
        )

    folded = (
        ev.groupBy(user_col)
        .agg(F.array_sort(F.collect_list("__e")).alias("__evs"))
        .select(
            F.col(user_col),
            F.aggregate(F.col("__evs"), init, step_fn).alias("__st"),
        )
        .select(
            user_col,
            F.size(F.filter(F.col("__st"), lambda v: v["lt"].isNotNull()))
            .cast("int")
            .alias("funnel_stage"),
        )
    )
    return folded


def funnel_counts_bounded(
    df: DataFrame,
    steps: list[str],
    max_gap_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Bounded-funnel conversion table: (stage, n_users) counting
    users reaching AT LEAST each stage under the gap constraint —
    :func:`funnel_counts`' shape over :func:`funnel_stages_bounded`.
    """
    st = funnel_stages_bounded(
        df, steps, max_gap_s, user_col, ts_col, type_col, id_col
    )
    aggs = [
        F.sum((F.col("funnel_stage") >= i).cast("long")).alias(f"__n{i}")
        for i in range(1, len(steps) + 1)
    ]
    wide = st.agg(*aggs)
    stack_args = ", ".join(f"{i}, __n{i}" for i in range(1, len(steps) + 1))
    return wide.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (stage, n_users)"
    ).selectExpr(
        "cast(stage AS int) AS stage", "cast(n_users AS bigint) AS n_users"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604800,
) -> DataFrame:
    """Cohort retention table: users bucketed by the period of their
    FIRST event, counted in every later period they return. Output:
    (cohort_period, period_offset, n_users) — n_users active exactly
    ``period_offset`` periods after their cohort period (offset 0 =
    cohort size).

    Periods are integer epoch buckets (default weekly), so every
    cross-engine comparison is integer math. Scale: the distinct
    (user, period) frame and the per-user min both hash-shuffle on the
    user key — co-partitioned, so the self-join adds no exchange; the
    final rollup groups a frame already reduced to user-period grain."""
    p = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(period_seconds)).cast("long")
    up = df.select(F.col(user_col), p.alias("__p")).distinct()
    cohort = up.groupBy(user_col).agg(F.min("__p").alias("__c"))
    return (
        up.join(cohort, user_col)
        .groupBy(
            F.col("__c").alias("cohort_period"),
            (F.col("__p") - F.col("__c")).alias("period_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("cohort_period", "period_offset")
    )


def missing_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    min_gap_seconds: int,
) -> DataFrame:
    """Heartbeat-gap mining: for every entity, the silent periods
    longer than ``min_gap_seconds`` between consecutive events — the
    monitoring question ("which feeds went dark, when, for how long")
    and the sessionizer's complement (a session BOUNDARY is exactly a
    reported gap).

    One key-partitioned window (lag), scan-local gap arithmetic —
    identical shuffle shape to sessionization, no global sort. Gap
    length is computed on epoch seconds (integer), so the output is
    engine-exact.

    Output: (key_col, gap_start, gap_end as timestamps, gap_seconds
    bigint), one row per qualifying gap.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(prev)
    return (
        df.select(F.col(key_col), F.col(ts_col), prev.alias("__prev"),
                  gap.alias("gap_seconds"))
        .filter(F.col("gap_seconds") > min_gap_seconds)
        .select(
            key_col,
            F.col("__prev").alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            F.col("gap_seconds").cast("long").alias("gap_seconds"),
        )
    )


def sequence_examples(
    df: DataFrame,
    entity_col: str = "user_id",
    order_cols: list[str] | None = None,
    item_col: str = "event_type",
    context: int = 3,
    min_context: int = 1,
) -> DataFrame:
    """Next-item-prediction training examples from an event log: for
    every event, emit (entity, context = up to ``context`` previous
    items in order, label = this item) — the standard
    sessions-to-examples export for sequence models / recommenders.

    Deterministic: events order by ``order_cols`` (default
    [ts, event_id]; MUST end in a unique tiebreaker or the context
    arrays are engine-unspecified). Examples with fewer than
    ``min_context`` previous items are dropped (the first event of
    each entity predicts nothing).

    Scale: ONE shuffle on the entity (the window exchange); the
    context is collect_list over a bounded rowsBetween frame — state
    per row is ``context`` items, not the whole history. Skewed
    power-users are one partition each — AQE splits the exchange, and
    the frame bound keeps per-row work constant.

    Output: (entity_col, *order_cols, context array<item>, label).
    """
    order_cols = order_cols or ["ts", "event_id"]
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order_cols)
        .rowsBetween(-context, -1)
    )
    return (
        df.select(entity_col, *order_cols, F.col(item_col).alias("label"))
        .withColumn("context", F.collect_list("label").over(w))
        .where(F.size("context") >= min_context)
        .select(entity_col, *order_cols, "context", "label")
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    entity_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    window: int = 24,
    threshold: float | None = None,
    zero_fill: bool = False,
) -> DataFrame:
    """Volume-anomaly detection on an event stream: bucket counts per
    entity, then score each bucket against the TRAILING ``window``
    buckets' mean/std — the standard ops-monitoring z-score, engine-
    exact: the trailing sums S=Σn, Q=Σn² and count k are integer
    window aggregates, and

        z = (k·n − S) / sqrt(k·Q − S²)

    is one closed-form IEEE step over exact integers (the
    pearson_exact idiom), emitted unrounded. Only buckets with a FULL
    trailing window score (k == window); constant windows (zero
    variance) yield null z. ``threshold`` keeps only |z| >= threshold.

    Gap semantics: the ROWS frame spans the trailing ``window``
    NON-EMPTY buckets, not wall-clock time — zero-count buckets are
    absent from the bucket relation, so after a quiet gap (e.g. an
    outage) the "trailing 24h" baseline reaches back past the gap to
    the last active buckets; a post-outage burst is scored against
    that stale (typically busier) baseline, which DAMPS, not
    inflates, its z. ``zero_fill=True`` densifies each entity's
    bucket axis (explodes sequence(min_bucket, max_bucket) per
    entity, zero-count buckets included) so the trailing frame is
    strict wall-clock; zero-filled buckets score too (n=0 against the
    baseline). Off by default: the fill materializes one row per
    entity per bucket in its ACTIVE SPAN, which for a sparse entity
    alive across the whole history is span/bucket_seconds rows of
    overhead.

    Scale: one bucket aggregate + one entity-keyed window — buckets
    per entity are time-bounded, so state is tiny regardless of event
    volume. Output: (entity, bucket_start, n, z).
    """
    b = (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    cnt = (
        df.select(F.col(entity_col).alias("entity"), b.alias("bucket"))
        .groupBy("entity", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    if zero_fill:
        axis = (
            cnt.groupBy("entity")
            .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
            .select(
                "entity",
                F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("bucket"),
            )
        )
        cnt = axis.join(cnt, ["entity", "bucket"], "left").select(
            "entity", "bucket", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n")
        )
    w = (
        Window.partitionBy("entity")
        .orderBy("bucket")
        .rowsBetween(-window, -1)
    )
    scored = (
        cnt.withColumn("k", F.count("n").over(w))
        .withColumn("s", F.sum("n").over(w))
        .withColumn("q", F.sum(F.col("n") * F.col("n")).over(w))
        .where(F.col("k") == window)
        .select(
            "entity",
            F.from_unixtime(F.col("bucket") * bucket_seconds).alias("bucket_start"),
            "n",
            F.try_divide(
                (F.col("k") * F.col("n") - F.col("s")).cast("double"),
                F.sqrt((F.col("k") * F.col("q") - F.col("s") * F.col("s")).cast("double")),
            ).alias("z"),
        )
    )
    if threshold is not None:
        scored = scored.where(F.abs(F.col("z")) >= threshold)
    return scored


def decayed_popularity(
    df: DataFrame,
    entity_col: str = "event_type",
    ts_col: str = "ts",
    half_life_seconds: int = 604800,
    as_of: str | None = None,
) -> DataFrame:
    """Recency-weighted popularity: each event contributes
    2^(-age/half_life), summed per entity — the standard trending /
    freshness score (a count where last week matters twice as much as
    the week before).

    Engine-exact: each event's weight rounds to an e6 BIGINT
    (exp of a shared IEEE double — transcendental, never on a decimal
    half), per-entity sums are pure integer, and the score divides by
    1e6 once at the end. A naive sum of double weights would be
    accumulation-order dependent and hash-unstable.

    ``as_of`` (ISO timestamp string) anchors the age; default is the
    max event time in the data (computed in the same aggregate pass,
    broadcast back). Scale: one scan + one entity-keyed aggregate.

    Output: (entity, n_events, score) — score unrounded double of an
    exact integer / 1e6.
    """
    anchor = (
        F.lit(as_of).cast("timestamp")
        if as_of is not None
        else None
    )
    base = df.select(F.col(entity_col).alias("entity"), F.col(ts_col).alias("__ts"))
    if anchor is None:
        mx = base.agg(F.max("__ts").alias("__mx"))
        base = base.crossJoin(F.broadcast(mx))
    else:
        base = base.withColumn("__mx", anchor)
    age = F.unix_timestamp("__mx") - F.unix_timestamp("__ts")
    w_e6 = F.round(
        F.pow(F.lit(2.0), -(age.cast("double") / half_life_seconds)) * 1e6
    ).cast("long")
    return (
        base.withColumn("__w", w_e6)
        .groupBy("entity")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.sum("__w").cast("double") / F.lit(1e6)).alias("score"),
        )
    )


def transition_matrix(
    df: DataFrame,
    entity_col: str = "user_id",
    order_cols: list[str] | None = None,
    item_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition counts/probabilities over each
    entity's event sequence — the behavior-model summary behind
    next-action prediction baselines and anomaly rules.

    Deterministic ordering by ``order_cols`` (default [ts, event_id];
    must end in a unique tiebreaker). The probability is the integer
    half-up ratio n(a→b)/n(a→*) at 4 decimals — engine-exact.

    Scale: one entity-keyed lag window + one (from,to) aggregate;
    the matrix is |alphabet|² rows. Output: (from_item, to_item,
    n, p).
    """
    order_cols = order_cols or ["ts", "event_id"]
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    pairs = (
        df.select(entity_col, *order_cols, F.col(item_col).alias("to_item"))
        .withColumn("from_item", F.lag("to_item").over(w))
        .where(F.col("from_item").isNotNull())
        .groupBy("from_item", "to_item")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = Window.partitionBy("from_item")
    return pairs.withColumn("__t", F.sum("n").over(tot)).selectExpr(
        "from_item",
        "to_item",
        "n",
        "((2 * n * 10000 + __t) div (2 * __t)) / 10000.0D AS p",
    )


def stationary_distribution(
    df: DataFrame,
    entity_col: str = "user_id",
    order_cols: list[str] | None = None,
    item_col: str = "event_type",
    iters: int = 10,
) -> DataFrame:
    """Stationary distribution of the first-order behavior Markov
    chain (the long-run share of attention each state captures —
    PageRank's ancestor), by ``iters`` rounds of engine-exact integer
    power iteration over :func:`transition_matrix` counts.

    Mass is carried as e6-scaled BIGINTs: v0 = 1e6 div n_states per
    state; each round routes v_i across i's outgoing edges with the
    half-up integer ratio (2*v_i*c_ij + r_i) div (2*r_i) — no float
    accumulation anywhere, so a DuckDB twin (the same formula
    unrolled) matches hash-exactly. States without outgoing edges
    hold their mass (absorbing self-loop). Truncation drift leaves
    sum(v) within iters*n_states of 1e6 — report the raw integers,
    not a renormalized float.

    Scale: each round is one broadcast-size join (the chain alphabet
    is small) over the |alphabet|² count matrix — iterations cost
    |edges| work, not |events|; the event scan happens once in
    transition_matrix and the counts frame is pinned with an eager
    localCheckpoint (one reference per round would otherwise replay
    the event scan every iteration). The mass vector v is referenced
    ONCE per round (routed mass and dangling pass-through share a
    single LEFT JOIN), so lineage grows LINEARLY and the whole
    iteration compiles into ONE lazy plan — the pagerank_exact
    finding (r10): per-round eager localCheckpoints bought only job-
    scheduling overhead; output is hash-identical integer math either
    way. ``checkpoint_every`` lazily bounds lineage depth for long
    runs.

    Output: (state, v_e6 BIGINT, p DOUBLE = v_e6/1e6).
    """
    checkpoint_every = 8
    t = transition_matrix(df, entity_col, order_cols, item_col).select(
        F.col("from_item").alias("i"), F.col("to_item").alias("j"), "n"
    )
    t = t.withColumn(
        "r", F.sum("n").over(Window.partitionBy("i")).cast("long")
    ).localCheckpoint(eager=True)
    states = (
        t.select(F.col("i").alias("state"))
        .union(t.select(F.col("j").alias("state")))
        .distinct()
    )
    n_states = states.count()
    v = states.select(
        "state", F.lit(1_000_000 // n_states).cast("long").alias("v")
    )
    for i in range(iters):
        # one reference to v per round (routed mass and dangling
        # pass-through in a single LEFT JOIN) keeps the lazy lineage
        # linear; a twice-referenced v would double the plan per
        # iteration (the cluster.py lesson) and need eager rounds
        v = (
            v.join(t, v["state"] == t["i"], "left")
            .select(
                F.coalesce(F.col("j"), v["state"]).alias("state"),
                F.when(
                    F.col("i").isNull(), v["v"]
                ).otherwise(F.expr("(2 * v * n + r) div (2 * r)")).alias("__m"),
            )
            .groupBy("state")
            .agg(F.sum("__m").cast("long").alias("v"))
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            v = v.localCheckpoint(eager=False)
    return v.select(
        "state",
        F.col("v").alias("v_e6"),
        (F.col("v") / F.lit(1_000_000.0)).alias("p"),
    )


def stationary_distribution_fast(
    df: DataFrame,
    entity_col: str = "user_id",
    order_cols: list[str] | None = None,
    item_col: str = "event_type",
    iters: int = 10,
    max_states: int = 10_000,
) -> DataFrame:
    """Production twin of :func:`stationary_distribution`: the same
    first-order chain, but the power iteration runs DRIVER-SIDE in
    float over the collected transition matrix. The matrix is bounded
    metadata — |alphabet|² rows for a categorical state column (event
    types, page names), nothing like the event volume — so collecting
    it is the 100 TB-correct move: ONE distributed scan builds the
    counts, then ``iters`` rounds cost microseconds instead of one
    Spark job each. ``max_states`` guards the bounded-collect claim
    (an unbounded state column must use the distributed exact form).

    Float semantics mirror the exact version: per-round mass routes
    as v_i·(c_ij/r_i), dangling states hold their mass. No e6
    scaling, no per-round localCheckpoint, no oracle scaffolding —
    which is why it is rows-only: float accumulation order is not
    engine-portable (the bootstrap_value_ci_fast precedent; grading
    belongs to the integer twin, production runs this one).

    Output: (state, p DOUBLE), p sums to ~1.
    """
    t = (
        transition_matrix(df, entity_col, order_cols, item_col)
        .select("from_item", "to_item", "n")
        .collect()
    )
    states = sorted({r["from_item"] for r in t} | {r["to_item"] for r in t})
    if len(states) > max_states:
        raise ValueError(
            f"{len(states)} states exceed max_states={max_states}: "
            "the transition matrix is no longer bounded metadata — "
            "use stationary_distribution (distributed) instead"
        )
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    row_tot = [0] * n
    for r in t:
        row_tot[idx[r["from_item"]]] += r["n"]
    v = [1.0 / n] * n
    for _ in range(iters):
        nxt = [0.0] * n
        for i, tot in enumerate(row_tot):
            if tot == 0:  # dangling: mass holds (absorbing self-loop)
                nxt[i] += v[i]
        for r in t:
            i, j = idx[r["from_item"]], idx[r["to_item"]]
            nxt[j] += v[i] * (r["n"] / row_tot[i])
        v = nxt
    spark = df.sparkSession
    return local_df(
        spark, [(s, float(v[idx[s]])) for s in states], "state string, p double"
    )


def cusum_deviation(
    df: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM changepoint curve over an ordered series of exact-integer
    values: for each position k, the scaled deviation of the prefix sum
    from the no-change line, dev_k = |n·S_k − k·S_n| (Page's CUSUM with
    the mean estimated over the whole series, cleared of division:
    |S_k − (k/n)·S_n| cross-multiplied by n so it stays integer-exact).
    The argmax over k is the classic single-changepoint locator; the
    whole curve is emitted so callers can threshold, argmax, or plot.

    Engine-exact: the cross-multiplied deviation accumulates in
    decimal(38,0) (HUGEINT twin) and exits as BIGINT; ``dev_frac`` =
    dev_k / (n·S_n) is ONE IEEE division of exact integers, emitted
    UNROUNDED. Prefix sums ride :func:`...etl.global_cumsum`
    (range-partitioned + broadcast offsets — never a single-reducer
    window); totals attach as a broadcast single row.

    Input: one row per series position; ``value_col`` must already be
    an exact integer (fixed-point your floats first — the MWU/KS
    idiom). Output: (order_col, k, s_k, dev_num, dev_frac), one row per
    input row. dev_num must fit BIGINT: |dev| ≤ n·S_n, so guard
    n·S_n < 2^63 (a 10^5-bucket series of 10^13-cent totals overflows
    DuckDB loudly, never silently — Spark computes in decimal(38,0)).
    """
    from data_misc_tools_spark.operators.etl import global_cumsum

    base = df.select(
        order_col, F.col(value_col).cast("long").alias("__v")
    ).withColumn("__one", F.lit(1))
    cum = global_cumsum(base, [order_col], ["__v", "__one"])
    totals = base.agg(
        F.sum("__v").cast("long").alias("__s_n"),
        F.count("*").cast("long").alias("__n"),
    )
    dec = "decimal(38,0)"
    return (
        cum.crossJoin(F.broadcast(totals))
        .selectExpr(
            order_col,
            "cum___one AS k",
            "cum___v AS s_k",
            f"CAST(abs(CAST(__n AS {dec}) * cum___v"
            f"          - CAST(cum___one AS {dec}) * __s_n) AS LONG)"
            " AS dev_num",
            f"CAST(abs(CAST(__n AS {dec}) * cum___v"
            f"          - CAST(cum___one AS {dec}) * __s_n) AS DOUBLE)"
            f" / CAST(CAST(__n AS {dec}) * __s_n AS DOUBLE) AS dev_frac",
        )
    )


def lag_crosscorr(
    df: DataFrame,
    t_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Cross-correlation function: Pearson corr(x_t, y_{t+lag}) for
    every lag in [−max_lag, max_lag] — the "does clicking today
    predict buying in two days" lead/lag detector; the argmax lag is
    the response delay between two metrics.

    Caller contract: ``df`` is one row per time bucket with BOTH
    series as exact integers, zero-filled on the buckets where a
    series is silent (gap semantics belong to the caller — the
    rolling_zscore lesson). Buckets multiply by the tiny broadcast
    lag frame (2·max_lag+1 rows) and self-join at t+lag, so each lag
    correlates over the aligned overlap; everything downstream is
    :func:`...profile.pearson_exact` — exact decimal(38,0) sufficient
    statistics, one IEEE closed-form step, bit-identical across
    engines, zero-variance lags NULL.

    Output: (lag, n_rows, corr), 2·max_lag+1 rows.
    """
    from data_misc_tools_spark.operators.profile import pearson_exact

    spark = df.sparkSession
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = df.select(
        F.col(t_col).cast("long").alias("__t"),
        F.col(x_col).cast("long").alias("__x"),
    )
    b = df.select(
        F.col(t_col).cast("long").alias("__t2"),
        F.col(y_col).cast("long").alias("__y"),
    )
    j = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("__t2", F.col("__t") + F.col("lag"))
        .join(b, "__t2")
    )
    return pearson_exact(j, ["lag"], "__x", "__y")


def attribution_position_credit(
    df: DataFrame,
    conv_keys: list[str],
    order_by: list[str],
    first_permille: int = 400,
    last_permille: int = 400,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: split each
    conversion's credit across its touchpoints — ``first_permille`` to
    the first touch, ``last_permille`` to the last, the remainder
    split evenly over the interior (the 40/20/40 industry standard).
    One touch takes 1000; two touches split half-up.

    Input: one row per (conversion, touch) pair — e.g. the output of
    the 30-minute interval join. ``conv_keys`` identify the
    conversion; ``order_by`` must TOTALLY order touches within it
    (tiebreak by a unique id last, or equal-timestamp touches would
    rank nondeterministically).

    All integer: positions from keyed windows (partitioned per
    conversion — never global), interior credit = half_up(mid/(n−2))
    permille via (2A+B) div 2B. Per-touch credits are half-up permille
    of the true share, so an n-touch conversion's total may differ
    from 1000 by rounding units — the per-touch figure is the
    deliverable, exact in any engine.

    Output: input columns + (n_touches, pos, credit_permille).
    """
    mid_total = 1000 - first_permille - last_permille
    if mid_total < 0:
        raise ValueError("first_permille + last_permille must be <= 1000")
    w = Window.partitionBy(*conv_keys).orderBy(*order_by)
    wn = Window.partitionBy(*conv_keys)
    ranked = df.withColumn("pos", F.row_number().over(w).cast("long")).withColumn(
        "n_touches", F.count("*").over(wn).cast("long")
    )
    two_split = (1000 + 1) // 2  # half-up of 1000/2
    credit = (
        F.when(F.col("n_touches") == 1, F.lit(1000))
        .when(F.col("n_touches") == 2, F.lit(two_split))
        .when(F.col("pos") == 1, F.lit(first_permille))
        .when(F.col("pos") == F.col("n_touches"), F.lit(last_permille))
        .otherwise(
            F.expr(
                f"(2 * {mid_total} + (n_touches - 2)) div (2 * (n_touches - 2))"
            )
        )
    )
    return ranked.withColumn("credit_permille", credit.cast("long"))


def shapley_attribution(
    df: DataFrame,
    channels: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    conversion_type: str = "purchase",
) -> DataFrame:
    """Exact Shapley-value channel attribution (Shapley 1953; the
    marketing form e.g. Zhao et al. 2018, "Shapley value methods for
    attribution modeling") — the game-theoretic answer to "which
    touchpoints CAUSED the conversions" that position rules
    (:func:`attribution_position_credit`) approximate: each channel's
    credit is its average marginal contribution over every ordering
    of the channel set, the unique allocation satisfying efficiency /
    symmetry / dummy.

    Coalition value: v(S) = number of converted users whose
    pre-conversion touched-channel set ⊆ S (users convertible with
    only the channels in S active). v is monotone, so every marginal
    is ≥ 0, and Σᵢ φᵢ = v(all) − v(∅) exactly (v(∅) = conversions
    with no prior touch — unattributable direct conversions).

    Engine-exact: φᵢ·n! = Σ_{S∌i} |S|!·(n−|S|−1)!·(v(S∪i) − v(S)) is
    a pure integer (``phi_scaled``); ``phi_e6`` = half-up e6 of
    φ = phi_scaled/n!.

    Scale shape: first-conversion rollup + one events⋈conversions
    join keyed by user (AQE-sized), one bit_or aggregate per user,
    then the mask census — at most 2^n rows, collected as bounded
    metadata (the codebook class; n = len(channels) ≤ 16 enforced).
    The 2^n·n Shapley enumeration is driver-side arithmetic on that
    census, never a distributed pass; the report exits as a VALUES
    LocalRelation.

    Output: (channel, phi_scaled, phi_e6, v_empty, v_full), one row
    per channel ordered by channel name.
    """
    n = len(channels)
    if n == 0:
        raise ValueError("need at least one channel")
    if n > 16:
        raise ValueError(
            f"{n} channels make 2^{n} coalitions — no longer bounded "
            "metadata; bucket channels upstream"
        )
    if len(set(channels)) != n or conversion_type in channels:
        raise ValueError("channels must be unique and exclude the conversion")
    conv = (
        df.filter(F.col(type_col) == conversion_type)
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__cts"))
    )
    bit = None
    for i, ch in enumerate(channels):
        b = F.when(F.col(type_col) == ch, F.lit(1 << i).cast("long"))
        bit = b if bit is None else bit.when(
            F.col(type_col) == ch, F.lit(1 << i).cast("long")
        )
    touches = df.select(
        F.col(user_col).alias("__tu"), F.col(ts_col).alias("__ts"),
        bit.alias("__b"),
    ).where(F.col("__b").isNotNull())
    masks = (
        conv.join(
            touches,
            (F.col("__tu") == F.col("__u")) & (F.col("__ts") < F.col("__cts")),
            "left",
        )
        .groupBy("__u")
        .agg(F.coalesce(F.bit_or("__b"), F.lit(0).cast("long")).alias("mask"))
    )
    census = {
        r["mask"]: r["cnt"]
        for r in masks.groupBy("mask")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect()
    }
    full = (1 << n) - 1
    v = [0] * (full + 1)
    for s in range(full + 1):
        v[s] = sum(c for m, c in census.items() if (m & s) == m)
    import math

    fact = [math.factorial(i) for i in range(n + 1)]
    phi = [0] * n
    for i in range(n):
        for s in range(full + 1):
            if s & (1 << i):
                continue
            w = fact[bin(s).count("1")] * fact[n - bin(s).count("1") - 1]
            phi[i] += w * (v[s | (1 << i)] - v[s])
    nf = fact[n]
    rows = sorted(zip(channels, phi))
    vals = ", ".join(
        "('{}', {}L, {}L, {}L, {}L)".format(
            ch.replace("'", "''"),
            p,
            (2 * 1_000_000 * p + nf) // (2 * nf),
            v[0],
            v[full],
        )
        for ch, p in rows
    )
    return df.sparkSession.sql(
        "SELECT * FROM VALUES "
        + vals
        + " AS t(channel, phi_scaled, phi_e6, v_empty, v_full)"
    )


def ewma_smooth(
    df: DataFrame,
    order_col: str,
    value_col: str,
    alpha_permille: int = 300,
    max_rows: int = 100_000,
) -> DataFrame:
    """Exponentially-weighted moving average over an ordered series of
    exact-integer values — the classic smoother/1-step forecaster
    (Brown 1956; Holt's level equation): s₁ = x₁,
    sₜ = α·xₜ + (1−α)·sₜ₋₁, with α = alpha_permille/1000 kept as a
    PERMILLE integer and each step rounded half-up —
    sₜ = (2·(α·xₜ + (1000−α)·sₜ₋₁) + 1000) div 2000 — so the whole
    recursion is integer-exact and an engine twin can replay it
    bit-for-bit (a DuckDB recursive CTE does, in the catalog oracle).

    Bounded-rollup contract (the mann_kendall/theil_sen class): the
    input is an ALREADY-AGGREGATED series (days, hours, versions —
    thousands of rows, not events), collected ordered to the driver
    (max_rows-guarded) because the recurrence is inherently serial;
    the heavy lifting — rolling events up to the series — stays
    distributed in the caller. Gaps in order_col are treated as
    consecutive observations (time-aware decay would exponentiate by
    the gap — out of scope, documented).

    Output: (order, x, ewma), one row per input row, via a VALUES
    LocalRelation.
    """
    a = int(alpha_permille)
    if not 0 < a <= 1000:
        raise ValueError("alpha_permille must be in (0, 1000]")
    rows = (
        df.select(
            F.col(order_col).cast("long").alias("o"),
            F.col(value_col).cast("long").alias("x"),
        )
        .orderBy("o")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"series exceeds max_rows={max_rows}: roll it up further "
            "before smoothing (the bounded-rollup contract)"
        )
    if not rows:
        raise ValueError(
            "empty series: the rollup produced zero rows (an empty "
            "VALUES list would otherwise surface as a ParseException)"
        )
    out = []
    s = None
    for r in rows:
        if s is None:
            s = r["x"]
        else:
            s = (2 * (a * r["x"] + (1000 - a) * s) + 1000) // 2000
        out.append((r["o"], r["x"], s))
    vals = ", ".join(f"({o}L, {x}L, {s}L)" for o, x, s in out)
    return df.sparkSession.sql(
        "SELECT * FROM VALUES " + vals + " AS t(o, x, ewma)"
    )


def holt_smooth(
    df: DataFrame,
    order_col: str,
    value_col: str,
    alpha_permille: int = 300,
    beta_permille: int = 200,
    max_rows: int = 100_000,
) -> DataFrame:
    """Holt's linear-trend smoothing (Holt 1957) over an ordered
    series of exact-integer values — the LEVEL+TREND extension of
    :func:`ewma_smooth` and the forecasting middle ground between it
    and :func:`seasonal_naive_backtest`:

        l₁ = x₁,  b₁ = x₂ − x₁  (classic two-point init; needs n ≥ 2)
        lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
        bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
        one-step forecast of xₜ (made at t−1): fₜ = lₜ₋₁ + bₜ₋₁

    with α, β kept as PERMILLE integers and every step the half-up
    pattern s = (2·num + 1000) idiv 2000 where idiv TRUNCATES TOWARD
    ZERO — trend numerators go NEGATIVE, and DuckDB's `//` truncates
    on negatives (probed: -7 // 2 = -3) exactly like Spark's `div`,
    while python's `//` floors, so the emitter below uses an explicit
    trunc-division. A RECURSIVE CTE twin replays the whole recursion
    bit-for-bit (the ewma precedent; the l-then-b dependency rides a
    subquery that computes lₜ once and reuses it).

    Bounded-rollup contract (ewma_smooth's): the input is an
    ALREADY-AGGREGATED series collected ordered to the driver
    (max_rows-guarded); the recurrence is inherently serial. Gaps in
    order_col are consecutive observations.

    Output: (o, x, level, trend, fcast) — fcast is NULL on the first
    row (no forecast exists before any state) — via a VALUES
    LocalRelation.
    """
    a = int(alpha_permille)
    bb = int(beta_permille)
    if not 0 < a <= 1000 or not 0 < bb <= 1000:
        raise ValueError("alpha/beta_permille must be in (0, 1000]")
    rows = (
        df.select(
            F.col(order_col).cast("long").alias("o"),
            F.col(value_col).cast("long").alias("x"),
        )
        .orderBy("o")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"series exceeds max_rows={max_rows}: roll it up further "
            "before smoothing (the bounded-rollup contract)"
        )
    if len(rows) < 2:
        raise ValueError(
            "Holt needs at least 2 points (the trend init is x2 - x1)"
        )
    def tdiv(num: int, den: int) -> int:
        # trunc-toward-zero integer division: DuckDB `//` and Spark
        # `div` semantics (python // floors and diverges on negatives)
        q = abs(num) // den
        return q if num >= 0 else -q

    out = []
    lvl = rows[0]["x"]
    trd = rows[1]["x"] - rows[0]["x"]
    out.append((rows[0]["o"], rows[0]["x"], lvl, trd, None))
    for r in rows[1:]:
        fc = lvl + trd
        lp = lvl
        lvl = tdiv(2 * (a * r["x"] + (1000 - a) * (lp + trd)) + 1000, 2000)
        trd = tdiv(2 * (bb * (lvl - lp) + (1000 - bb) * trd) + 1000, 2000)
        out.append((r["o"], r["x"], lvl, trd, fc))
    vals = ", ".join(
        "({}L, {}L, {}L, {}L, {})".format(
            o, x, lv, t, "NULL" if f is None else f"{f}L"
        )
        for o, x, lv, t, f in out
    )
    return df.sparkSession.sql(
        "SELECT o, x, level, trend, cast(fcast as bigint) AS fcast "
        "FROM VALUES " + vals + " AS t(o, x, level, trend, fcast)"
    )


def holt_winters_smooth(
    df: DataFrame,
    order_col: str,
    value_col: str,
    season: int = 7,
    alpha_permille: int = 300,
    beta_permille: int = 100,
    gamma_permille: int = 300,
    max_rows: int = 100_000,
) -> DataFrame:
    """Additive Holt-Winters smoothing (Winters 1960) — the
    LEVEL+TREND+SEASONAL completion of the forecasting ladder
    (:func:`ewma_smooth` → :func:`holt_smooth` → this), for series
    with a repeating period (daily revenue with a weekly rhythm):

        init at t = m (one full season):
          l_m = half-up mean of x₁..x_m,   b_m = 0,
          s_i = x_i − l_m  (i = 1..m)
        for t > m:
          f_t = l_{t−1} + b_{t−1} + s_{t−m}          (one-step forecast)
          l_t = ⌈α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})⌋
          b_t = ⌈β·(l_t − l_{t−1}) + (1−β)·b_{t−1}⌋
          s_t = ⌈γ·(x_t − l_t) + (1−γ)·s_{t−m}⌋

    with α, β, γ as PERMILLE integers and ⌈·⌋ the SIGNED half-up
    (half-away-from-zero): (2·num ± 1000) idiv 2000 with the bias
    sign matching num. Seasonals and trend deltas go NEGATIVE, and
    the unsigned +1000 form rounds negatives toward +∞ — measured: an
    exact −150 seasonal decayed to −149, −148 … (+0.5 bias per
    update), destroying the pure-seasonal fixed point the tests pin.
    Spark `div` == DuckDB `//` == trunc-toward-zero (the r8 probe),
    so the DuckDB twin replays the recursion bit-for-bit as a
    RECURSIVE CTE whose state carries the last ``season`` seasonals
    as a LIST column (ss[2:] || [s_t] — the MMR list-state idiom); the
    l→b→s within-step dependency rides a subquery computing l_t once,
    with the sign CASE per update.

    Bounded-rollup contract (the ewma/holt class): the input is an
    already-aggregated series collected ordered to the driver
    (max_rows-guarded); the recurrence is inherently serial. Gaps in
    order_col are consecutive observations (document your rollup).

    Output (rows from t = m on): (o, x, level, trend, seasonal,
    fcast) — seasonal is s_t, fcast is NULL on the init row — via a
    VALUES LocalRelation.
    """
    m = int(season)
    a = int(alpha_permille)
    bb = int(beta_permille)
    g = int(gamma_permille)
    if m < 2:
        raise ValueError("season must be >= 2")
    for v in (a, bb, g):
        if not 0 < v <= 1000:
            raise ValueError("alpha/beta/gamma_permille must be in (0, 1000]")
    rows = (
        df.select(
            F.col(order_col).cast("long").alias("o"),
            F.col(value_col).cast("long").alias("x"),
        )
        .orderBy("o")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"series exceeds max_rows={max_rows}: roll it up further "
            "before smoothing (the bounded-rollup contract)"
        )
    if len(rows) < m + 1:
        raise ValueError(
            f"Holt-Winters needs more than one full season "
            f"(n = {len(rows)} <= season = {m})"
        )

    def tdiv(num: int, den: int) -> int:
        q = abs(num) // den
        return q if num >= 0 else -q

    def hdiv(num: int, den: int) -> int:
        """Signed half-up: round-half-away-from-zero via trunc-div."""
        bias = den if num >= 0 else -den
        return tdiv(2 * num + bias, 2 * den)

    lvl = hdiv(sum(r["x"] for r in rows[:m]), m)
    trd = 0
    ss = [r["x"] - lvl for r in rows[:m]]
    out = [(rows[m - 1]["o"], rows[m - 1]["x"], lvl, trd, ss[-1], None)]
    for r in rows[m:]:
        s_old = ss[0]
        fc = lvl + trd + s_old
        lp = lvl
        lvl = hdiv(a * (r["x"] - s_old) + (1000 - a) * (lp + trd), 1000)
        trd = hdiv(bb * (lvl - lp) + (1000 - bb) * trd, 1000)
        s_new = hdiv(g * (r["x"] - lvl) + (1000 - g) * s_old, 1000)
        ss = ss[1:] + [s_new]
        out.append((r["o"], r["x"], lvl, trd, s_new, fc))
    vals = ", ".join(
        "({}L, {}L, {}L, {}L, {}L, {})".format(
            o, x, lv, t, s, "NULL" if f is None else f"{f}L"
        )
        for o, x, lv, t, s, f in out
    )
    return df.sparkSession.sql(
        "SELECT o, x, level, trend, seasonal, cast(fcast as bigint) AS fcast "
        "FROM VALUES " + vals + " AS t(o, x, level, trend, seasonal, fcast)"
    )


def seasonal_naive_backtest(
    df: DataFrame,
    order_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every fancier
    forecaster must beat (Hyndman & Athanasopoulos, "Forecasting:
    principles and practice"): predict period t by the value at
    t − season (same weekday last week), then report the error
    profile over every period where both sides exist. If a model
    can't beat this one-join baseline, ship the join.

    Engine-exact: the forecast is a self equi-join on
    order − season (exact integer key arithmetic — calendar gaps
    simply produce no match and drop out, documented); errors are
    exact integer |x_t − x_{t−s}|; MAE is the half-up e6-scaled mean;
    the median absolute error is the ⌈n/2⌉-th order statistic read
    off an error census (the mad_outlier route). MAPE is avoided on
    purpose — it divides per-row and is undefined at zero actuals;
    WAPE = Σ|e|/Σ|x| is emitted instead as half-up e6.

    Bounded-rollup contract (the ewma/mann_kendall class): the input
    is an already-aggregated series; the join and censuses run on the
    period domain.

    Output: one row — (n_scored, mae_e2 ... scaled like the input,
    medae, wape_e6).
    """
    if season < 1:
        raise ValueError("season must be >= 1")
    from pyspark.sql.window import Window

    base = df.select(
        F.col(order_col).cast("long").alias("o"),
        F.col(value_col).cast("long").alias("x"),
    ).localCheckpoint()  # both join sides + the census read it
    lagged = base.select(
        (F.col("o") + season).alias("o"), F.col("x").alias("x_prev")
    )
    scored = base.join(lagged, "o").select(
        "o", "x", F.abs(F.col("x") - F.col("x_prev")).alias("e")
    )
    census = scored.groupBy("e").agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("e")  # error DOMAIN census — bounded, documented
    cum = census.withColumn("cum", F.sum("c").over(w))
    tot = scored.agg(
        F.count("*").cast("long").alias("n_scored"),
        F.sum("e").cast("long").alias("se"),
        F.sum(F.abs(F.col("x"))).cast("long").alias("sx"),
    )
    med = (
        cum.crossJoin(F.broadcast(tot.select("n_scored")))
        .agg(
            F.min(
                F.when(2 * F.col("cum") >= F.col("n_scored"), F.col("e"))
            ).cast("long").alias("medae")
        )
    )
    return (
        tot.crossJoin(F.broadcast(med))
        .selectExpr(
            "n_scored",
            "CASE WHEN n_scored = 0 THEN NULL"
            " ELSE (2 * 100 * se + n_scored) div (2 * n_scored) END AS mae_e2",
            "medae",
            "CASE WHEN sx = 0 THEN NULL"
            " ELSE (2 * 1000000 * se + sx) div (2 * sx) END AS wape_e6",
        )
    )


START_STATE = "__start"
CONV_STATE = "__conv"
NULL_STATE = "__null"


def journey_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    channel_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    conv_value: str = "purchase",
) -> DataFrame:
    """First-conversion journey transition census — the input of
    :func:`markov_removal_attribution`: per user, order touches by
    (ts, tiebreak), truncate at the FIRST conversion (which becomes
    the absorbing ``__conv`` state), and emit (src, dst, n) counts
    with ``__start`` fan-in and ``__null`` termination for users who
    never convert. One keyed window + one aggregate — the distributed
    part of Markov attribution; everything downstream is bounded by
    the channel alphabet.
    """
    w = Window.partitionBy("__u").orderBy("__ts", "__tb")
    seq = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
        F.when(F.col(channel_col) == conv_value, F.lit(CONV_STATE))
        .otherwise(F.col(channel_col).cast("string"))
        .alias("__st"),
    ).withColumn("__pos", F.row_number().over(w))
    wfp = Window.partitionBy("__u")
    fp = F.min(F.when(F.col("__st") == CONV_STATE, F.col("__pos"))).over(wfp)
    kept = seq.withColumn("__fp", fp).filter(
        F.col("__fp").isNull() | (F.col("__pos") <= F.col("__fp"))
    )
    w2 = Window.partitionBy("__u").orderBy("__pos")
    steps = kept.select(
        F.coalesce(F.lag("__st").over(w2), F.lit(START_STATE)).alias("src"),
        F.col("__st").alias("dst"),
        F.col("__u"),
        F.col("__pos"),
        F.max("__pos").over(Window.partitionBy("__u")).alias("__last"),
        F.col("__st").alias("__cur"),
    )
    terminal = steps.filter(
        (F.col("__pos") == F.col("__last")) & (F.col("__cur") != CONV_STATE)
    ).select(F.col("__cur").alias("src"), F.lit(NULL_STATE).alias("dst"))
    return (
        steps.select("src", "dst")
        .unionByName(terminal)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _halfup(num: int, den: int) -> int:
    return (2 * num + den) // (2 * den)


def _absorb_prob_e6(
    trans: dict[tuple[str, str], int], states: list[str], rounds: int
) -> int:
    """e6 conversion probability from __start after ``rounds`` steps
    of the quantized chain — EXACTLY the integer recursion the DuckDB
    twin unrolls (p6 per cell half-up of n/rowsum; v-step half-up of
    Σ p6·v / 1e6). Deterministic, engine-portable."""
    rowsum: dict[str, int] = {}
    for (s, _), n in trans.items():
        rowsum[s] = rowsum.get(s, 0) + n
    p6: dict[tuple[str, str], int] = {
        (s, d): _halfup(1_000_000 * n, rowsum[s])
        for (s, d), n in trans.items()
    }
    p6[(CONV_STATE, CONV_STATE)] = 1_000_000
    p6[(NULL_STATE, NULL_STATE)] = 1_000_000
    v = {s: (1_000_000 if s == CONV_STATE else 0) for s in states}
    for _ in range(rounds):
        nxt = {}
        for s in states:
            acc = sum(
                p6.get((s, d), 0) * v[d] for d in states
            )
            nxt[s] = _halfup(acc, 1_000_000)
        v = nxt
    return v[START_STATE]


def markov_removal_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    channel_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    conv_value: str = "purchase",
    rounds: int = 16,
    max_states: int = 24,
) -> DataFrame:
    """Markov-chain REMOVAL-EFFECT attribution (Anderl et al. 2014,
    "Mapping the customer journey") — the data-driven multi-touch
    model beside the heuristic U-shape credits
    (:func:`attribution_position_credit`) and the exact game-theoretic
    :func:`shapley_attribution`: journeys become a first-order chain,
    a channel's credit is how much the chain's conversion probability
    DROPS when that channel is removed (its inbound transitions
    redirect to ``__null`` — paths through it die), normalized across
    channels.

    Engine-exact (the markov_stationary idiom, extended to k+1
    scenarios): the distributed work is ONE journey-transition census
    (:func:`journey_transitions`, bounded by the channel alphabet —
    guarded by ``max_states``); the chain solve is a deterministic
    integer recursion — per-cell e6 half-up probabilities, ``rounds``
    bounded-horizon value iterations with half-up e6 steps — replayed
    bit-for-bit by the oracle's unrolled CTE chain (ONE reference per
    level, the single-reference-per-round rule). ``rounds`` bounds
    the path length credited (16 covers this corpus's journey
    lengths); it is part of the contract, not a convergence knob.

    Output: one row per channel (channel, f_full_e6, f_removed_e6,
    removal_e6, attribution_e6), attribution summing to ~1e6.
    """
    trans_df = journey_transitions(
        events, user_col, channel_col, ts_col, tiebreak_col, conv_value
    )
    rows = trans_df.collect()
    trans = {(r["src"], r["dst"]): r["n"] for r in rows}
    states = sorted({s for s, _ in trans} | {d for _, d in trans}
                    | {CONV_STATE, NULL_STATE})
    if len(states) > max_states:
        raise ValueError(
            f"{len(states)} journey states exceed max_states={max_states}: "
            "the bounded-alphabet contract (group channels first)"
        )
    channels = [
        s for s in states if s not in (START_STATE, CONV_STATE, NULL_STATE)
    ]
    f_full = _absorb_prob_e6(trans, states, rounds)
    report = []
    drops = {}
    for c in channels:
        adj: dict[tuple[str, str], int] = {}
        for (s, d), n in trans.items():
            key = (s, NULL_STATE) if d == c else (s, d)
            adj[key] = adj.get(key, 0) + n
        f_c = _absorb_prob_e6(adj, states, rounds)
        drops[c] = max(f_full - f_c, 0)
        report.append((c, f_c))
    td = sum(drops.values())
    out = []
    for c, f_c in report:
        removal = _halfup(1_000_000 * drops[c], f_full) if f_full > 0 else None
        attr = _halfup(1_000_000 * drops[c], td) if td > 0 else None
        out.append((c, f_full, f_c, removal, attr))
    spark = events.sparkSession
    return local_df(
        spark,
        out,
        "channel string, f_full_e6 long, f_removed_e6 long, "
        "removal_e6 long, attribution_e6 long",
    ).orderBy("channel")


def croston_smooth(
    df: DataFrame,
    order_col: str,
    value_col: str,
    alpha_permille: int = 100,
    max_rows: int = 100_000,
) -> DataFrame:
    """Croston's method (Croston 1972) for INTERMITTENT demand — the
    sparse-series member of the forecasting ladder (ewma → holt →
    holt_winters → this): when most periods have zero demand, a
    single EWMA chases zeros down and under-forecasts; Croston
    smooths two series instead — non-zero demand SIZES z and
    inter-demand INTERVALS p — and forecasts z/p demand per period.

    The input carries only the DEMAND rows (periods with activity);
    intervals derive from gaps in ``order_col`` — no zero-filling
    pass. Init at the first demand: z₁ = x₁, p₁ = its interval
    (1 when unknown); per demand t with interval qₜ:

        z_e3 ← halfup(α·1000·xₜ + (1−α)·z_e3)
        p_e3 ← halfup(α·1000·qₜ + (1−α)·p_e3)
        fcast_e3 = halfup(1000 · z_e3 / p_e3)

    All state is e3 integers with unsigned half-up (sizes and
    intervals are non-negative); a RECURSIVE CTE twin replays the
    recursion bit-for-bit (the ewma/holt precedent). Bounded-rollup
    contract: the demand series is collected ordered (max_rows
    guard); the recurrence is inherently serial.

    Output: (o, x, interval, z_e3, p_e3, fcast_e3) per demand row —
    fcast_e3 is the POST-update demand-per-period forecast.
    """
    a = int(alpha_permille)
    if not 0 < a <= 1000:
        raise ValueError("alpha_permille must be in (0, 1000]")
    rows = (
        df.select(
            F.col(order_col).cast("long").alias("o"),
            F.col(value_col).cast("long").alias("x"),
        )
        .filter(F.col("x") > 0)
        .orderBy("o")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"series exceeds max_rows={max_rows}: roll it up further "
            "before smoothing (the bounded-rollup contract)"
        )
    if not rows:
        raise ValueError("Croston needs at least one non-zero demand")

    def halfup(num: int, den: int) -> int:
        return (2 * num + den) // (2 * den)

    out = []
    prev_o = None
    z = p = 0
    for r in rows:
        iv = 1 if prev_o is None else r["o"] - prev_o
        if prev_o is None:
            z = 1000 * r["x"]
            p = 1000 * iv
        else:
            z = halfup(a * 1000 * r["x"] + (1000 - a) * z, 1000)
            p = halfup(a * 1000 * iv + (1000 - a) * p, 1000)
        f = halfup(1000 * z, p)
        out.append((r["o"], r["x"], iv, z, p, f))
        prev_o = r["o"]
    vals = ", ".join(
        f"({o}L, {x}L, {iv}L, {z}L, {p}L, {f}L)" for o, x, iv, z, p, f in out
    )
    return df.sparkSession.sql(
        "SELECT o, x, interval, z_e3, p_e3, fcast_e3 FROM VALUES "
        + vals
        + " AS t(o, x, interval, z_e3, p_e3, fcast_e3)"
    )

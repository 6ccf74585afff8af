"""ETL idioms from the reference's documented pipeline.

The reference's flagship ETL splits a JSON response body into
per-event rows with string surgery: ``lateral view explode(split(
su_strip(get_json_object(content,'$.results'),'[]'), '(?<=\\}),(?=\\{)'))``
followed by per-field ``get_json_object`` + casts (reference:
README.md:202-219).

Spark-first, that whole pipeline is ``from_json`` with an explicit
schema + ``explode`` — no regex lookarounds (which also do not exist
in RE2-based engines), no split-on-brace fragility with nested braces
(the known edge case of the reference's approach, SURVEY §7.3), and
Catalyst prunes unreferenced JSON fields from the parse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_misc_tools_spark.session import local_df


def json_results_explode(
    df: DataFrame,
    content_col: str,
    element_schema: str,
    results_path: str = "results",
    out_col: str = "ev",
) -> DataFrame:
    """Explode a ``{"<results_path>": [...]}`` JSON document column into
    one row per array element (struct-typed ``out_col``), keeping all
    input columns (ctx passthrough).

    ``element_schema`` is the element's DDL schema, e.g.
    ``"timestamp string, type string"`` — explicit schemas keep the
    parse single-pass and the output analysis-time typed, matching the
    engine's fixed-schema stance (SURVEY §1.3).
    """
    full_schema = f"struct<{results_path}: array<struct<{element_schema}>>>"
    parsed = F.from_json(F.col(content_col), full_schema)
    return df.withColumn(
        out_col, F.explode_outer(parsed[results_path])
    )


def parse_event_time(
    col: Column | str, fmt: str = "yyyy-MM-dd'T'HH:mm:ss", prefix_len: int = 19
) -> Column:
    """The reference's timestamp-extraction idiom: first 19 chars of an
    ISO-8601-with-subseconds string cast to timestamp (reference:
    README.md:217 ``cast(substr(ev.timestamp,1,19) as timestamp)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(F.substring(c, 1, prefix_len), fmt)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed change-data-capture between two table snapshots: one row
    per changed key with change_type in ('insert', 'update', 'delete')
    — the diff step of an ETL pipeline that only ships deltas
    downstream instead of full reloads.

    ``compare_cols`` defaults to every non-key column the frames
    share. Scale shape: ONE full-outer join co-partitioned on the key
    (both sides hash-shuffle once); comparison is a scan-local
    null-safe equality over the compared columns, so the output is
    only as large as the delta.
    """
    from pyspark.sql import functions as F

    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    # presence markers, NOT compare-column nullness: a row whose
    # compared values are all null still exists
    o = old.select(
        *key_cols,
        F.lit(True).alias("__o_present"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("__n_present"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    old_exists = F.col("__o_present").isNotNull()
    new_exists = F.col("__n_present").isNotNull()
    changed = reduce_or(
        [~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare_cols]
    )
    ctype = (
        F.when(~old_exists, "insert")
        .when(~new_exists, "delete")
        .when(changed, "update")
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        j.withColumn("change_type", ctype)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def reduce_or(cols):
    from functools import reduce

    return reduce(lambda a, b: a | b, cols)


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
) -> DataFrame:
    """Collapse a keyed state series into SCD2 validity intervals: one
    row per RUN of equal consecutive states, with valid_from = first
    observation of the run and valid_to = the next run's start (null
    while current) — dimension historization from append-only
    observations.

    Gaps-and-islands with the standard two-window construction: a
    change flag (lag), a running change count as the island id, then
    one aggregate per island. All windows partition by the KEY, so at
    corpus scale every shuffle is the key exchange — no global sorts.

    Output: (key_col, state_col, valid_from, valid_to).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    flagged = df.select(key_col, ts_col, state_col).withColumn(
        "__chg",
        F.when(
            F.lag(state_col).over(w).eqNullSafe(F.col(state_col)), 0
        ).otherwise(1),
    )
    runs = flagged.withColumn(
        "__run", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    iv = runs.groupBy(key_col, "__run").agg(
        F.first(state_col).alias(state_col),
        F.min(ts_col).alias("valid_from"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return iv.withColumn("valid_to", F.lead("valid_from").over(w2)).select(
        key_col, state_col, "valid_from", "valid_to"
    )


def dataset_fingerprint(
    df: DataFrame,
    cols: list[str],
    salt: str = "fp:",
) -> DataFrame:
    """Order-insensitive, engine-portable table checksum — the
    migration validator: run it on the same logical table in two
    engines (or before/after a rewrite, repartition, or format
    conversion) and compare one row.

    Each row hashes to a 60-bit integer via the repo's portable md5
    idiom over a canonical '|'-joined rendering of ``cols`` (nulls
    render as the sentinel '\\N'); the fingerprint is the EXACT sum of
    those integers in decimal(38,0) — commutative, so any row order /
    partitioning / engine yields the identical value. Collisions:
    forging equality needs a matching 60-bit sum; corruption detection
    (the use case) is effectively certain.

    Caveat: only list ``cols`` with engine-stable string renderings
    (integers, strings, dates). Floats format differently across
    engines — round/scale them to integers first.

    Scale: scan-local hashing + one map-side-combined global sum; the
    shuffle is a handful of 16-byte partials. Output: one row
    (n_rows, fingerprint) with the fingerprint as a digit string.
    """
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols]
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), canon)), 1, 15), 16, 10
    ).cast("long")
    return df.select(h.alias("__h")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("__h").cast("decimal(38,0)")).cast("string").alias("fingerprint"),
    )


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    dist_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by key salting: the classic manual remedy
    when one join key holds a disproportionate share of the BIG side
    (a mega-domain, a bot user) and a single reducer would own the
    whole key. The big side's rows spread over ``n_salts`` sub-keys;
    the small side REPLICATES once per salt; the join runs on
    (key, salt), so the hot key's rows land on n_salts reducers
    instead of one. Output rows are exactly the plain join's —
    salting changes the physical distribution only.

    ``dist_col``: a roughly-unique big-side column (an event id) that
    deterministically spreads rows via xxhash64; falls back to
    spark_partition_id() (still correct — ANY assignment is — but
    then row placement varies across runs/retries).

    Spark-4 note: AQE's skewedJoin handles sort-merge skew
    automatically at runtime; this operator is for the cases AQE
    can't see (pre-shuffle aggregation keys, bucketed tables, or
    engines/configs without AQE) and as the explicit, plannable form.
    ``how`` supports inner/left (the small side must stay the
    replicated side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_skew_join supports inner/left, got {how!r}")
    salt_src = (
        F.xxhash64(F.col(dist_col)) if dist_col else F.spark_partition_id()
    )
    b = big.withColumn("__salt", F.pmod(salt_src, F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    scale: int = 100,
    out_col: str = "te_loo",
) -> DataFrame:
    """Leave-one-out target encoding — the leakage-safe categorical
    encoder for training pipelines: each row's category is replaced by
    the mean target of the OTHER rows in its category, so the encoding
    never contains the row's own label (naive mean encoding leaks the
    target and inflates validation scores; LOO is the standard fix).

    enc_i = (Σ_g target − target_i) / (|g| − 1), with singletons
    falling back to the global leave-one-out mean
    (Σ target − target_i) / (n − 1), and a single-row table yielding
    NULL. Engine-exact: targets go fixed-point (``target·scale``
    integers), the category sums ride one aggregate joined back (AQE
    handles category skew), and the encoding is ONE IEEE division of
    exact integers — bit-portable UNROUNDED doubles (the
    confidence/lift convention), no rounding pattern and no signed-div
    trap. Output: every input column + ``out_col`` (double, in target
    units × scale — divide by scale for raw units).

    Scale shape: one category census + one broadcast/shuffle join
    back + one single-row global aggregate broadcast. No window, no
    per-category collect.
    """
    t = F.round(F.col(target_col) * F.lit(scale)).cast("long")
    base = df.withColumn("__t", t)
    per = base.groupBy(cat_col).agg(
        F.sum("__t").cast("long").alias("__s"),
        F.count("*").cast("long").alias("__c"),
    )
    tot = base.agg(
        F.sum("__t").cast("long").alias("__ts"),
        F.count("*").cast("long").alias("__tn"),
    )
    return (
        base.join(per, cat_col)
        .crossJoin(F.broadcast(tot))
        .withColumn(
            out_col,
            F.when(
                F.col("__c") > 1,
                (F.col("__s") - F.col("__t")).cast("double")
                / (F.col("__c") - 1).cast("double"),
            ).when(
                F.col("__tn") > 1,
                (F.col("__ts") - F.col("__t")).cast("double")
                / (F.col("__tn") - 1).cast("double"),
            ),
        )
        .drop("__t", "__s", "__c", "__ts", "__tn")
    )


def join_skew_report(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-flight advisor for a big equi-join: the EXACT output
    cardinality Σ_k c_left(k)·c_right(k) and which keys dominate it —
    the "should I salt / broadcast / pre-aggregate this join?"
    question answered from two cheap censuses instead of running the
    join. A key contributing 30% of a trillion-row join output is
    what :func:`salted_skew_join` exists for; this report is how you
    find it before the shuffle falls over at 100 TB.

    Exact integers end to end: per-side key censuses (one map-side-
    combined aggregate each), an inner join of the censuses (distinct
    keys only — tiny next to the data), per-key pairs = c_l·c_r in
    decimal(38,0), total via a single-row aggregate broadcast back,
    share = half-up e6. Top-k keys by (pairs, key) ride
    TakeOrderedAndProject — never a global sort.

    Output: top_k rows (key, c_left, c_right, pairs, total_pairs,
    matched_keys, share_e6), ordered by pairs desc, key.
    """
    dec = "decimal(38,0)"
    cl = (
        left.select(F.col(left_key).alias("key"))
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("c_left"))
    )
    cr = (
        right.select(F.col(right_key).alias("key"))
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("c_right"))
    )
    per = cl.join(cr, "key").select(
        "key", "c_left", "c_right",
        (F.col("c_left").cast(dec) * F.col("c_right")).alias("__p"),
    )
    tot = per.agg(
        F.sum("__p").cast(dec).alias("__tot"),
        F.count("*").cast("long").alias("matched_keys"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "key", "c_left", "c_right",
            "CAST(__p AS LONG) AS pairs",
            "CAST(__tot AS LONG) AS total_pairs",
            "matched_keys",
            "CAST((2 * 1000000 * __p + __tot) div (2 * __tot) AS LONG)"
            " AS share_e6",
        )
        .orderBy(F.desc("pairs"), "key")
        .limit(top_k)
    )


def rendezvous_assign(
    df: DataFrame,
    shards: list[str],
    key_col: str,
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding: each key goes to
    the shard with the largest hash(shard, key) — the consistent-
    placement scheme for routing corpus keys to a fixed serving/
    storage fleet. The HRW property is the point: adding a shard
    moves ONLY the keys the new shard now wins (~1/(n+1) of them),
    and removing one redistributes only ITS keys — no global
    reshuffle, unlike ``hash(key) % n`` where changing n moves
    (n-1)/n of the corpus (pinned by tests/test_etl.py).

    Map-only: weights are the repo's engine-portable md5-derived u32
    per (shard, key), the winner an ``array_max`` over a |shards|-
    element in-row struct array — zero shuffles, no shard table join;
    DuckDB twin = argmax over a CROSS JOIN with the shard list
    (ties: larger weight, then larger shard name, both engines).
    """
    if not shards:
        raise ValueError("shards must be non-empty")
    from data_misc_tools_spark.operators.sampling import _hash_u32

    arr = F.array(
        *[
            F.struct(
                _hash_u32(F.col(key_col), f"hrw:{s}:").alias("w"),
                F.lit(s).alias("shard"),
            )
            for s in sorted(shards)
        ]
    )
    return df.withColumn(out_col, F.array_max(arr)["shard"])


def global_rank(
    df: DataFrame,
    order_by: list,
    out_col: str = "grank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic 1-based GLOBAL rank over a total order — without
    the classic scale-killer (`row_number() OVER (ORDER BY ...)` with
    no partition key funnels the whole table through ONE reducer).

    The distributed recipe: range-partition on the order keys, rank
    within each partition, then add per-partition offsets computed
    from a partition-count collect — bounded metadata (#partitions
    rows), the codebook-collect class. The result is invariant to
    where the range boundaries land (sampling noise moves rows between
    partitions, never their global rank), PROVIDED ``order_by`` is a
    total order — pass a unique tiebreaker as the last key, or equal
    keys straddling a boundary would rank nondeterministically.

    Output: the input columns + ``out_col`` (1-based bigint).
    """
    from pyspark.sql.window import Window

    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    pid = parts.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*order_by)
    ranked = pid.withColumn("__r", F.row_number().over(w).cast("long"))
    # offsets need only per-partition COUNTS — collected from the
    # pre-window frame, so the offsets job pays the range shuffle but
    # never the within-partition sort (the window itself runs once,
    # in the consumer's action; r10 — the sort was executing twice)
    counts = sorted(
        (r["__pid"], r["__n"])
        for r in pid.groupBy("__pid").agg(F.count("*").alias("__n")).collect()
    )
    offs, acc = [], 0
    for p, n in counts:
        offs.append((p, acc))
        acc += n
    off_df = local_df(df.sparkSession, offs, "__pid int, __off long")
    return (
        ranked.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.col("__r") + F.col("__off"))
        .drop("__pid", "__r", "__off")
    )


def global_cumsum(
    df: DataFrame,
    order_by: list,
    sum_cols: list[str],
    num_partitions: int | None = None,
    prefix: str = "cum_",
) -> DataFrame:
    """Distributed INCLUSIVE prefix sums over a total order — the
    running-total twin of :func:`global_rank`, replacing the
    single-reducer ``SUM(x) OVER (ORDER BY ...)`` window (an
    unpartitioned window funnels every row through one task).

    Recipe: range-partition on the order keys, window-cumsum within
    each partition, then add per-partition grand totals collected to
    the driver — one row per partition (bounded metadata, the
    codebook-collect class) — as broadcast exclusive offsets. Like
    global_rank, ``order_by`` must be a TOTAL order (unique keys, or a
    tiebreaker last), or equal keys straddling a range boundary would
    accumulate nondeterministically.

    Output: input columns + ``<prefix><col>`` (inclusive prefix sum,
    long) for each ``sum_cols`` entry.
    """
    from pyspark.sql.window import Window

    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    pid = parts.withColumn("__pid", F.spark_partition_id())
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pid
    for c in sum_cols:
        cum = cum.withColumn(
            prefix + c, F.sum(F.col(c).cast("long")).over(w)
        )
    # per-partition grand totals come from the RAW columns — collected
    # from the pre-window frame so the offsets job skips the
    # within-partition sort (the r10 global_rank fix; the cumsum
    # window itself runs once, in the consumer's action)
    totals = sorted(
        (r["__pid"], *[r["__t_" + c] for c in sum_cols])
        for r in pid.groupBy("__pid")
        .agg(*[F.sum(F.col(c).cast("long")).alias("__t_" + c) for c in sum_cols])
        .collect()
    )
    offs, acc = [], [0] * len(sum_cols)
    for row in totals:
        offs.append((row[0], *acc))
        acc = [a + (t or 0) for a, t in zip(acc, row[1:])]
    schema = "__pid int, " + ", ".join(f"__off_{c} long" for c in sum_cols)
    off_df = local_df(df.sparkSession, offs, schema)
    out = cum.join(F.broadcast(off_df), "__pid")
    for c in sum_cols:
        out = out.withColumn(
            prefix + c, F.col(prefix + c) + F.col("__off_" + c)
        ).drop("__off_" + c)
    return out.drop("__pid")


def pareto_skyline(
    df: DataFrame,
    dims: list[str],
    id_col: str = "doc_id",
    n_buckets: int = 16,
    max_candidates: int = 100_000,
) -> DataFrame:
    """EXACT Pareto skyline (Börzsönyi et al. 2001 "The Skyline
    Operator"): rows not dominated by any other row — dominator means
    >= in EVERY ``dims`` column and > in at least one (all dims
    maximized; negate a column to minimize it). The multi-objective
    "best trade-offs" selector: top-k by one score keeps near-copies
    of one extreme, the skyline keeps the whole frontier.

    Scale shape — grid pruning before the quadratic step: each dim is
    width-bucketed over its min/max (ONE min/max aggregate, driver-
    bounded), cells counted, and a cell wholly dominated by any
    nonempty cell one-or-more buckets above it in EVERY dim is
    discarded with all its points (a bucket-(c+1) value is provably >
    any bucket-c value). Pruning NEVER changes the answer — dominance
    is transitive, so every pruned point is dominated by a SURVIVING
    point, and the exact pairwise check runs only among survivors.
    The cell-dominance join touches <= n_buckets^len(dims) rows; the
    final check is one broadcast theta-join over the survivors, whose
    count is asserted <= ``max_candidates`` (raise, never a silent n²
    — the cosine_neardup_pairs guard idiom; raise ``n_buckets`` or
    pre-filter when it fires). Uniform buckets prune less on skewed
    dims, but only cost — not correctness — suffers.

    Output: (id_col, *dims) — the skyline rows, exact.
    """
    if not dims:
        raise ValueError("dims must name at least one column to maximize")
    pts = df.select(F.col(id_col), *[F.col(d).cast("long") for d in dims])
    stats = pts.agg(
        *[F.min(d).alias(f"__lo_{d}") for d in dims],
        *[F.max(d).alias(f"__hi_{d}") for d in dims],
    ).head()
    cellc = []
    for d in dims:
        lo, hi = stats[f"__lo_{d}"], stats[f"__hi_{d}"]
        if lo is None:
            raise ValueError(f"dim {d} is all-null")
        if hi == lo:
            cellc.append(F.lit(1).alias(f"__c_{d}"))
        else:
            cellc.append(
                F.width_bucket(F.col(d), F.lit(lo), F.lit(hi + 1), n_buckets)
                .alias(f"__c_{d}")
            )
    coded = pts.select(id_col, *dims, *cellc)
    cells = coded.groupBy(*[f"__c_{d}" for d in dims]).count().drop("count")
    ca = cells.select(*[F.col(f"__c_{d}").alias(f"__a_{d}") for d in dims])
    cb = cells.select(*[F.col(f"__c_{d}").alias(f"__b_{d}") for d in dims])
    dom_cond = None
    for d in dims:
        c = F.col(f"__b_{d}") >= F.col(f"__a_{d}") + 1
        dom_cond = c if dom_cond is None else (dom_cond & c)
    dominated_cells = (
        ca.join(F.broadcast(cb), dom_cond, "left_semi")
        .select(*[F.col(f"__a_{d}").alias(f"__c_{d}") for d in dims])
    )
    survivors = coded.join(
        F.broadcast(dominated_cells), [f"__c_{d}" for d in dims], "left_anti"
    ).select(id_col, *dims)
    n_cand = survivors.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"pareto_skyline: {n_cand} candidates survive grid pruning "
            f"(> {max_candidates}); raise n_buckets or pre-filter"
        )
    a = survivors
    b = survivors.select(
        *[F.col(c).alias(f"__o_{c}") for c in survivors.columns]
    )
    geq = None
    strict = None
    for d in dims:
        ge = F.col(f"__o_{d}") >= F.col(d)
        gt = F.col(f"__o_{d}") > F.col(d)
        geq = ge if geq is None else (geq & ge)
        strict = gt if strict is None else (strict | gt)
    return a.join(F.broadcast(b), geq & strict, "left_anti")


def cascade_purge(
    subjects: DataFrame,
    levels: list[tuple[str, DataFrame, str, str | None]],
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Right-to-be-forgotten cascade: delete every row reachable from
    the subject keys through a foreign-key chain, and report the blast
    radius per table — the compliance primitive behind GDPR/CCPA
    erasure over a star/snowflake layout.

    ``subjects`` is a one-column frame of root keys. ``levels`` is the
    FK chain walked in order: (table_name, df, key_col, next_key_col)
    — level i's doomed rows are its rows whose ``key_col`` SEMI-joins
    the previous level's doomed keys; ``next_key_col`` (None for the
    last level) projects the keys the next level is matched on.
    Survivors come from the mirrored ANTI join, so doomed ∪ kept is a
    partition of the table by construction.

    Scale: one semi + one anti join per table on its own key (both
    broadcast when the doomed key set is small — the typical erasure
    batch); nothing is collected, the purge report is one 3-column row
    per table, and the KEPT frames are returned for the caller to
    write back atomically.

    Output: (report_df(table_name, n_rows, n_deleted, n_kept),
    {table_name: kept_df}).
    """
    spark = subjects.sparkSession
    keys = subjects.toDF("__k").distinct()
    reports = []
    kept: dict[str, DataFrame] = {}
    for name, df, key_col, next_key in levels:
        doomed = df.join(
            keys.select(F.col("__k").alias(key_col)), key_col, "semi"
        )
        kept[name] = df.join(
            keys.select(F.col("__k").alias(key_col)), key_col, "anti"
        )
        reports.append(
            df.agg(F.count("*").cast("long").alias("n_rows"))
            .crossJoin(
                doomed.agg(F.count("*").cast("long").alias("n_deleted"))
            )
            .select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_deleted",
                (F.col("n_rows") - F.col("n_deleted")).alias("n_kept"),
            )
        )
        if next_key is not None:
            keys = doomed.select(F.col(next_key).alias("__k")).distinct()
    report = reports[0]
    for r in reports[1:]:
        report = report.unionByName(r)
    return report, kept


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization: map every group's value distribution
    onto the POOLED distribution (y = F_pool⁻¹(F_g(x))) — the
    batch-effect corrector used when per-source score scales disagree
    (classifier scores per shard, engagement values per platform) but
    ranks are trusted.

    Engine-exact integer construction: within-group ranks come from a
    keyed window ordered by (value, id) — the unique id makes tied
    values rank identically in any engine; the pooled order statistics
    come from :func:`global_rank` over the same total order
    (range-partitioned, never a single-reducer window); each row maps
    to pooled index ceil(rank_g · n_pool / n_g) = (rank_g·n_pool +
    n_g − 1) div n_g — exact integer ceiling, quantile-faithful at
    both ends (rank 1 → ceil(n_pool/n_g), rank n_g → n_pool) — and
    takes the pooled value at that index by one equi-join.

    Scale: one keyed window, one global_rank, one int-keyed join; the
    group sizes attach broadcast. ``value_col`` must be exact
    integers (fixed-point first).

    Output: input (id, group, value) + (grp_rank, n_group, pool_idx,
    normalized) — ``normalized`` the pooled order statistic.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("long").alias("__v"),
    )
    wg = Window.partitionBy("__g").orderBy("__v", "__id")
    ranked = base.withColumn(
        "grp_rank", F.row_number().over(wg).cast("long")
    )
    sizes = base.groupBy("__g").agg(F.count("*").cast("long").alias("n_group"))
    pooled = global_rank(base, ["__v", "__id"], out_col="__pool_rank").select(
        F.col("__pool_rank").alias("pool_idx"),
        F.col("__v").alias("normalized"),
    )
    n_pool = base.agg(F.count("*").cast("long").alias("__n_pool"))
    return (
        ranked.join(F.broadcast(sizes), "__g")
        .crossJoin(F.broadcast(n_pool))
        .withColumn(
            "pool_idx",
            F.expr("(grp_rank * __n_pool + n_group - 1) div n_group"),
        )
        .join(pooled, "pool_idx")
        .select(
            F.col("__id").alias(id_col),
            F.col("__g").alias(group_col),
            F.col("__v").alias(value_col),
            "grp_rank",
            "n_group",
            "pool_idx",
            "normalized",
        )
    )


def metric_decomposition(
    old_df: DataFrame,
    new_df: DataFrame,
    dim_col: str,
    weight_col: str,
    value_col: str,
) -> DataFrame:
    """Mix-vs-rate decomposition of a ratio-metric change between two
    dataset versions — the "why did the metric move" drilldown every
    metrics review runs (the Oaxaca-Blinder / index-number
    decomposition, applied to weighted averages): with per-segment
    weight shares w and rates r, the overall metric is Σ w·r and the
    version delta splits EXACTLY into

        mix  = Σ (w_new − w_old)·r_old   (composition shifted)
        rate = Σ w_new·(r_new − r_old)   (segments themselves moved)

    so mix + rate = Δ with zero residual (pinned in tests), and each
    segment's two contributions say WHICH slice drove the move and
    HOW (more traffic vs changed behavior).

    Engine-exact: per-segment sums/counts are exact integers
    (decimal(38,0) widened); w and r are IEEE divisions of exact
    integers (the cuped rule: each side to double first); the
    contributions are pinned-order products of those doubles,
    UNROUNDED. Segments absent from a version carry weight 0 and
    contribute only through the other side's terms (r_old of an
    absent-in-old segment is defined 0 — the conservative reading,
    documented: its entire contribution lands in the mix term).

    Scale shape: one aggregate per version, a full outer join on the
    bounded segment domain, totals broadcast. Output: one row per
    segment (segment, n_old, n_new, w_old, w_new, r_old, r_new,
    mix_contrib, rate_contrib) ordered by segment.
    """
    from pyspark.sql import functions as F

    dec = "decimal(38,0)"

    def per(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(F.col(dim_col).alias("segment")).agg(
            F.sum(F.col(weight_col).cast("long")).cast(dec).alias(f"w_{tag}_n"),
            F.sum(
                (
                    F.col(weight_col).cast("long")
                    * F.col(value_col).cast("long")
                ).cast(dec)
            ).cast(dec).alias(f"v_{tag}_n"),
            F.count("*").cast("long").alias(f"n_{tag}"),
        )
    o = per(old_df, "old")
    n = per(new_df, "new")
    tot = F.broadcast(
        o.agg(F.sum("w_old_n").cast(dec).alias("tw_old")).crossJoin(
            n.agg(F.sum("w_new_n").cast(dec).alias("tw_new"))
        )
    )
    joined = (
        o.join(n, "segment", "full")
        .crossJoin(tot)
        .selectExpr(
            "segment",
            "coalesce(n_old, 0L) AS n_old",
            "coalesce(n_new, 0L) AS n_new",
            "cast(coalesce(w_old_n, cast(0 as decimal(38,0))) as double)"
            " / cast(tw_old as double) AS w_old",
            "cast(coalesce(w_new_n, cast(0 as decimal(38,0))) as double)"
            " / cast(tw_new as double) AS w_new",
            """CASE WHEN w_old_n IS NULL OR w_old_n = 0 THEN 0.0D
                    ELSE cast(v_old_n as double) / cast(w_old_n as double)
               END AS r_old""",
            """CASE WHEN w_new_n IS NULL OR w_new_n = 0 THEN 0.0D
                    ELSE cast(v_new_n as double) / cast(w_new_n as double)
               END AS r_new""",
        )
    )
    return joined.selectExpr(
        "segment", "n_old", "n_new", "w_old", "w_new", "r_old", "r_new",
        "(w_new - w_old) * r_old AS mix_contrib",
        "w_new * (r_new - r_old) AS rate_contrib",
    ).orderBy("segment")


def write_plan(
    df: "DataFrame",
    partition_col: str | None = None,
    target_mb: int = 128,
) -> "DataFrame":
    """File-count planner for a partitioned write — the layout
    advisor beside :func:`join_skew_report` (which advises joins) and
    layout.zorder/hilbert (which advise ordering): BEFORE writing
    100 TB as `partitionBy(key)`, ask how many files each key needs
    at a target file size, because the default one-file-per-task
    layout gives hot keys multi-GB files and cold keys confetti —
    both kill the downstream scan.

    Width model (deterministic and engine-portable, so the plan
    itself is oracle-checkable): per row, Σ octet_length over
    string/binary columns + the fixed physical width of each
    scalar column (8 for long/double/timestamp/decimal, 4 for
    int/float/date, 2 short, 1 byte/boolean) — an UNCOMPRESSED
    estimate; apply your format's compression ratio to ``target_mb``
    upstream (e.g. pass 384 for ~3x parquet+zstd aiming at 128 MB
    files). Nested types raise — explode or drop them first. NULL
    strings count 0; NULL scalars keep their slot (columnar layout).

    n_files = max(1, ceil(est_bytes / target)); rows_per_file =
    ceil(n_rows / n_files) — the two numbers a writer needs for
    `repartitionByRange(n_files, key, salt)` per key.

    Scale shape: ONE keyed aggregate over one scan. Output:
    (part_key, n_rows, est_bytes, n_files, rows_per_file) ordered by
    part_key ('__all__' when partition_col is None).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if target_mb <= 0:
        raise ValueError("target_mb must be positive")
    target = int(target_mb) * 1024 * 1024
    width = F.lit(0).cast("long")
    for f in df.schema.fields:
        t = f.dataType
        if isinstance(t, (T.StringType, T.BinaryType)):
            width = width + F.coalesce(
                F.octet_length(F.col(f.name)), F.lit(0)
            ).cast("long")
        elif isinstance(
            t, (T.LongType, T.DoubleType, T.TimestampType, T.DecimalType)
        ):
            width = width + 8
        elif isinstance(
            t, (T.IntegerType, T.FloatType, T.DateType)
        ):
            width = width + 4
        elif isinstance(t, T.ShortType):
            width = width + 2
        elif isinstance(t, (T.ByteType, T.BooleanType)):
            width = width + 1
        else:
            raise ValueError(
                f"write_plan: unsupported column type {t} on {f.name} — "
                "explode or drop nested columns first"
            )
    key = (
        F.col(partition_col).cast("string")
        if partition_col is not None
        else F.lit("__all__")
    )
    g = (
        df.select(key.alias("part_key"), width.alias("__w"))
        .groupBy("part_key")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("__w").cast("long").alias("est_bytes"),
        )
    )
    return g.selectExpr(
        "part_key", "n_rows", "est_bytes",
        f"greatest(1L, (est_bytes + {target - 1}) div {target}) AS n_files",
    ).selectExpr(
        "*",
        "(n_rows + n_files - 1) div n_files AS rows_per_file",
    ).orderBy("part_key")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row-per-column table profile — the first thing anyone runs
    on an unfamiliar dataset, and the summary the dq_expectations /
    schema-drift contracts start from: row count, null count,
    distinct count, min/max, and the modal value with its frequency.

    Everything exits as STRINGS so heterogeneous columns stack into
    one report frame; values are cast per column BEFORE aggregation,
    so min/max order is the COLUMN'S type order, not string order
    (the classic profiler bug: "100" < "99"). The modal value is the
    most frequent NON-NULL value, ties broken by ascending string
    value (engine-deterministic); n_distinct excludes NULLs (the SQL
    count-distinct convention — n_null reports them separately).

    Plan shape: per column, one scan-local aggregate plus one
    count-groupBy + TakeOrdered(1); the per-column one-row frames
    cross-join (1x1, broadcast) and union into the report. Columns
    with engine-divergent string forms (DOUBLE formatting) should be
    pre-cast by the caller when the report must be engine-portable.

    Output: (column, n, n_null, n_distinct, min_value, max_value,
    top_value, top_count) — one row per requested column, in the
    requested order.
    """
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    parts = []
    for c in cols:
        col = F.col(c)
        base = df.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(col.isNull().cast("long")).cast("long").alias("n_null"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        )
        top = (
            df.filter(col.isNotNull())
            .groupBy(col.cast("string").alias("__v"))
            .agg(F.count("*").cast("long").alias("__c"))
            .orderBy(F.desc("__c"), F.asc("__v"))
            .limit(1)
            .select(
                F.col("__v").alias("top_value"),
                F.col("__c").alias("top_count"),
            )
        )
        # LEFT join on a constant key, not a crossJoin: an all-NULL
        # column has an EMPTY top frame, and crossJoin-with-empty
        # would silently drop the column's report row
        parts.append(
            base.withColumn("__k", F.lit(1))
            .join(
                F.broadcast(top.withColumn("__k", F.lit(1))), "__k", "left"
            )
            .select(
                F.lit(c).alias("column"),
                "n",
                "n_null",
                "n_distinct",
                "min_value",
                "max_value",
                "top_value",
                "top_count",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

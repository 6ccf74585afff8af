"""Deterministic sampling operators for training-data pipelines.

Extension surface (the reference delegates all relational work to
Hive and has no sampling primitives — SURVEY §2.3): reproducible,
coordinated sampling is a first-class need when assembling corpora at
100 TB — `df.sample()` is seed-dependent per partition layout, so the
same logical dataset can sample differently after a repartition or a
file-split change. Hashing the KEY makes the decision a pure function
of the data:

- the sample is stable under any re-partitioning / re-ordering;
- the same key draws the same verdict in every table it appears in
  (coordinated sampling across fact/dim tables);
- rates compose: a 10% hash-sample of a 50% hash-sample with
  different salts is an independent 5%.

All hashes are md5-derived 32-bit integers (engine-portable: DuckDB
computes the identical value via ``('0x' || substr(md5(x),1,8))::
BIGINT``), per the repo-wide portable-hashing invariant. Every
operator is a scan-local expression filter or a per-group window —
no driver collects; the only shuffle is the window's group exchange
in ``per_group_reservoir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH_SPACE = float(1 << 32)


def _hash_u32(col, salt: str):
    """md5-derived uniform 32-bit integer of (salt || key) — the
    engine-portable twin of DuckDB's ('0x'||substr(md5(..),1,8))."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hashed key falls
    below ``rate`` of the 32-bit hash space.

    Scan-local (no shuffle, no RNG state); at any scale each task
    filters independently and the selected set is bit-identical across
    runs, partitionings, and engines."""
    return df.filter(_hash_u32(F.col(key_col), salt) < F.lit(int(rate * _HASH_SPACE)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep the tail): the keep-threshold is a CASE over the
    stratum column, the decision is still the row key's hash.

    The rate lookup is a scan-local expression (no join against a
    rates table — at 1000 executors that broadcast is pure overhead
    for a handful of literals)."""
    thresh = F.lit(int(default_rate * _HASH_SPACE))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _HASH_SPACE))
        ).otherwise(thresh)
    return df.filter(_hash_u32(F.col(key_col), salt) < thresh)


def per_group_reservoir(
    df: DataFrame, group_col: str, key_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group by
    (hashed key, key) and keep the first k — a reproducible stand-in
    for reservoir sampling whose output is order- and
    partitioning-independent.

    One shuffle on the group column; with AQE, skewed groups split
    into multiple reducers before the rank. For very hot groups
    (> ~10M rows) pre-filter with ``hash_sample`` at ~10·k/|group| to
    cut the sorted run length."""
    w = Window.partitionBy(group_col).orderBy(
        _hash_u32(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Assign each row a deterministic train/val/test split by hashed
    key: bucket = hash % 10000, carved into cumulative rate ranges
    (default 90/5/5).

    The assignment is a pure function of the key — re-running the
    pipeline, repartitioning, or adding new rows never moves an
    existing key between splits (the property that keeps eval sets
    uncontaminated across dataset versions)."""
    splits = splits or {"train": 0.90, "val": 0.05, "test": 0.05}
    bucket = _hash_u32(F.col(key_col), salt) % 10000
    expr = None
    hi = 0
    items = list(splits.items())
    for name, rate in items[:-1]:
        hi += int(rate * 10000)
        expr = F.when(bucket < hi, name) if expr is None else expr.when(bucket < hi, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def exact_stratified_split(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    splits: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Train/val/test split with EXACT per-stratum counts: within each
    stratum, rows are ranked by (md5 hash, key) and the rank axis is
    cut at floor(n·cum_pct/100) boundaries — a 1000-doc language gets
    exactly 800/100/100 under 80/10/10, where :func:`split_assign`'s
    hash-bucket carve is only proportional in expectation (a small
    stratum can easily land 83/6/11). The price of exactness: adding
    rows to a stratum can move existing keys between splits (ranks
    shift), so use split_assign when cross-version stability matters
    more than exact proportions — the two operators are the two ends
    of that trade and share the same portable hash order.

    ``splits`` maps name -> integer percent (must sum to 100; order
    matters: earlier entries take the low ranks). All comparisons are
    integer cross-multiplication (rank·100 vs n·cum_pct — no float
    boundaries), so a DuckDB twin matches hash-exactly.

    Scale: one rank window + one count window per stratum partition —
    a single shuffle on the strata column; strata are the parallelism
    unit, and a skewed giant stratum is the same single-partition-sort
    hazard as any per-key window (pre-shard giant strata if needed).

    Output: input columns + ``split``.
    """
    splits = splits or {"train": 80, "val": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100: {splits}")
    w = Window.partitionBy(strata_col).orderBy(
        _hash_u32(F.col(key_col), salt), F.col(key_col)
    )
    wn = Window.partitionBy(strata_col)
    ranked = df.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(wn)
    )
    expr = None
    cum = 0
    items = list(splits.items())
    for name, pct in items[:-1]:
        cum += pct
        cond = F.col("__rk") * 100 <= F.col("__n") * cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return ranked.withColumn("split", expr).drop("__rk", "__n")


def split_by_cluster(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str = "doc_id",
    left: str = "doc_a",
    right: str = "doc_b",
    splits: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Leakage-free train/val/test split: every member of a near-dup
    cluster lands in the SAME split, so a test document can never have
    a near-duplicate in train (the contamination mode a plain per-doc
    hash split cannot prevent — Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" measures exactly this
    train/test leakage).

    ``pairs`` are near-dup edges (e.g. LSH candidates after verify);
    the split key is the connected component's min id, singletons fall
    back to their own key, and the assignment itself is the same
    deterministic hash-bucket carve as :func:`split_assign`. Scale:
    CC labels + one left join; the split decision stays scan-local.

    Output: ``df`` + (cluster_key, split).
    """
    from data_misc_tools_spark.operators.cluster import connected_components

    comp = connected_components(pairs, src=left, dst=right).withColumnRenamed(
        "node", key_col
    )
    keyed = df.join(comp, key_col, "left").withColumn(
        "cluster_key", F.coalesce(F.col("component"), F.col(key_col)).cast("long")
    ).drop("component")
    return split_assign(keyed, "cluster_key", splits=splits, salt=salt)


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weights: dict[str, int],
    target_rows: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic corpus-mixture resampling: downsample each
    stratum (domain, language, source) toward target share
    ``weights[s] / sum(weights)`` of a ``target_rows`` budget — the
    data-mixing step of a pretraining pipeline, as a pure function of
    the row keys.

    Per-stratum target t_s = target_rows * w_s // W is a plan-time
    constant; the keep-threshold  min(2^32, 2^32 * t_s // n_s)  uses
    the measured stratum size n_s, all in integer math, so Spark and
    the SQL twin keep bit-identical row sets. Strata absent from
    ``weights`` are dropped; strata smaller than their target keep
    every row (the threshold caps at the full hash space — mixture
    weights are a ceiling, not upsampling).

    Scale: one tiny count aggregate, broadcast back into a scan-local
    hash filter. The sampled size per stratum is binomial around t_s
    (rate-based, not exact-k); for exact-k use per_group_reservoir.
    """
    total_w = sum(weights.values())
    space = 1 << 32
    targets = F.create_map(
        *[
            x
            for s, w in sorted(weights.items())
            for x in (F.lit(s), F.lit(target_rows * w // total_w))
        ]
    )
    sizes = (
        df.groupBy(strata_col)
        .agg(F.count("*").alias("__n_s"))
        .withColumn("__t_s", targets[F.col(strata_col)])
        .filter(F.col("__t_s").isNotNull())
        .withColumn(
            "__thr",
            F.least(
                F.lit(space).cast("long"),
                F.expr(f"(cast({space} as bigint) * __t_s) div __n_s"),
            ),
        )
        .select(strata_col, "__thr")
    )
    return (
        df.join(F.broadcast(sizes), strata_col)
        .filter(_hash_u32(F.col(key_col), salt) < F.col("__thr"))
        .drop("__thr")
    )


def training_order(
    df: DataFrame,
    key_col: str,
    shards: int = 32,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle for training-order export: every
    row gets (shard, pos) such that reading shards in order, each
    sorted by pos, is a uniform pseudorandom permutation of the corpus
    — a pure function of the keys (same order on any cluster, any
    partitioning, any engine).

    Shards are FIXED hash ranges (shard = h div (2^32/shards)), not
    range-partitioner samples, so shard membership never depends on
    runtime sampling. One shuffle (the per-shard position window);
    at 100 TB each shard sorts independently — no global sort, and
    writing ``partitionBy(shard)`` yields ready-to-stream files.

    Output: input columns + (shard int, pos bigint).
    """
    width = (1 << 32) // shards
    h = _hash_u32(F.col(key_col), salt)
    with_shard = df.withColumn("__h", h).withColumn(
        "shard", F.least(F.expr(f"cast(__h div {width} as int)"), F.lit(shards - 1))
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(key_col))
    return (
        with_shard.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def sample_weighted(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): rank every row by ln(u)/w for a hashed uniform u
    and keep the k largest — each row's inclusion probability is
    proportional to its weight, with no sequential pass and no RNG
    state (same determinism story as hash_sample).

    Scan-local scoring + one TakeOrdered top-k: no global sort, no
    shuffle of the losers. Rows with weight <= 0 or null never
    selected. Output: (key_col, weight_col, __score) of the k winners.

    The ln() makes scores engine-specific at the last ulp (libm log is
    not cross-engine reproducible), so this variant has no DuckDB
    oracle; :func:`sample_weighted_portable` is the integer-exact twin
    used as the correctness anchor.
    """
    w = F.col(weight_col).cast("double")
    u = (_hash_u32(F.col(key_col), salt) + F.lit(0.5)) / F.lit(float(_HASH_SPACE))
    score = F.log(u) / w
    return (
        df.filter(w > 0)
        .select(F.col(key_col), F.col(weight_col), score.alias("__score"))
        .orderBy(F.desc("__score"), key_col)
        .limit(k)
    )


def sample_weighted_portable(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    max_weight: int = 64,
) -> DataFrame:
    """Integer-exact weighted sampling without replacement for INTEGER
    weights: a row of weight w scores max of w independent 32-bit
    hashes — distributionally identical to the A-ES key u^(1/w)
    (max of w uniforms), but every comparison is integer, so any
    engine reproduces the selection bit-for-bit.

    Cost is O(sum of weights) explode — weights are clamped to
    [1, max_weight], which keeps the blowup bounded and matches the
    oracle's bounded generate_series join. Use the float variant when
    weights are large or fractional and cross-engine exactness is not
    required. Output: (key_col, weight clamp as __w, __score), the k
    winners by (__score desc, key).
    """
    w = F.least(
        F.greatest(F.col(weight_col).cast("long"), F.lit(1)), F.lit(max_weight)
    )
    per_rep = df.select(F.col(key_col), w.alias("__w")).select(
        F.col(key_col),
        "__w",
        F.explode(F.sequence(F.lit(1), F.col("__w"))).alias("__j"),
    )
    h = _hash_u32(
        F.concat(
            F.col(key_col).cast("string"), F.lit("_"), F.col("__j").cast("string")
        ),
        salt,
    )
    return (
        per_rep.select(F.col(key_col), "__w", h.alias("__h"))
        .groupBy(key_col, "__w")
        .agg(F.max("__h").alias("__score"))
        .orderBy(F.desc("__score"), key_col)
        .limit(k)
    )


def sample_weighted_es_e6(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """ORACLE-EXACT Efraimidis-Spirakis A-ES for arbitrary positive
    INTEGER weights — upgrades :func:`sample_weighted_portable`'s
    O(Σw) explode (weights capped at 64) to a scan-local O(n) score
    with NO weight cap, while staying engine-exact through the e6-ln
    idiom: the hashed uniform is the EXACT integer ratio
    (h+1)/(2³²+1) ∈ (0,1) (both ends exclusive, so ln never sees 0);
    l_e6 = round(1e6·ln(·)) per row (per-quantity e6 — the nll
    idiom); priority = l_e6 / w is then ONE IEEE division of exact
    integers (the pearson_exact class), bit-identical across engines.
    Keep the k LARGEST priorities (l_e6 < 0, so heavier w pulls the
    priority toward 0 — the max-u^(1/w) order).

    Same A-ES distribution as :func:`sample_weighted` up to the
    1e-6 key quantization; ties (astronomically unlikely) break by
    key. Scan-local scoring + TakeOrdered top-k: no global sort.
    Output: (key_col, weight as __w, l_e6, priority).
    """
    w = F.col(weight_col).cast("long")
    h = _hash_u32(F.col(key_col), salt)
    l_e6 = F.round(
        F.log((h + 1).cast("double") / F.lit(float((1 << 32) + 1))) * 1e6
    ).cast("long")
    return (
        df.filter(w > 0)
        .select(
            F.col(key_col),
            w.alias("__w"),
            l_e6.alias("l_e6"),
        )
        .withColumn(
            "priority",
            F.col("l_e6").cast("double") / F.col("__w").cast("double"),
        )
        .orderBy(F.desc("priority"), key_col)
        .limit(k)
    )


def dsir_topk(
    df: DataFrame,
    target,
    n_buckets: int = 1024,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir:",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): score every document by its hashed-n-gram importance weight
    log(p_target / p_raw) and keep the top-k — the cheap,
    classifier-free way to skew a raw 100 TB crawl toward a target
    domain.

    ``target`` is a boolean Column marking the in-domain documents
    (e.g. ``F.col("lang") == "en"``); the raw distribution is the
    whole input. Features are word unigrams + bigrams hashed into
    ``n_buckets`` buckets with the repo's engine-portable md5 idiom,
    bucket probabilities are add-one smoothed, and each feature
    occurrence contributes the e6-scaled BIGINT

        w_e6 = round(ln( (t_b+1)(R+B) / ((r_b+1)(T+B)) ) * 1e6)

    (the ratio argument is a quotient of exact < 2^53 integer products,
    so both engines hold the same IEEE double; ln*1e6 rounds
    identically — the unigram-NLL idiom). Per-doc scores are pure
    integer sums; `logw` divides by 1e6 once at the end (exact-double
    in, correctly-rounded division — no decimal-half hazard).

    Scale shape: feature construction is narrow (explode + union);
    the bucket census is ONE shuffle bounded at n_buckets rows with
    map-side combine; the weight table (B rows) broadcasts; scoring is
    one further doc-keyed aggregate. Two corpus scans total — persist
    the feature relation to make it one if the input is not a cheap
    parquet scan. Top-k is orderBy+limit (TakeOrderedAndProject:
    per-partition partial top-k, merged on the driver) with the rank
    assigned afterwards over the k survivors — never a global sort.

    Output: (doc_id, n_feats, logw, rank), rank 1..k by
    (importance desc, doc_id).
    """
    from data_misc_tools_spark.operators.text import tokens

    base = df.select(
        F.col(id_col),
        target.cast("int").alias("__t"),
        tokens(text_col).alias("arr"),
    )
    uni = base.select(id_col, "__t", F.explode("arr").alias("feat"))
    bi = base.select(
        id_col,
        "__t",
        F.explode(
            F.when(
                F.size("arr") >= 2,
                F.expr("transform(sequence(1, size(arr) - 1), i -> concat(arr[i-1], ' ', arr[i]))"),
            ).otherwise(F.expr("array()"))
        ).alias("feat"),
    )
    feats = uni.unionAll(bi).select(
        id_col,
        "__t",
        (_hash_u32(F.col("feat"), salt) % n_buckets).alias("bucket"),
    )
    census = feats.groupBy("bucket").agg(
        F.count("*").cast("long").alias("r"),
        F.sum("__t").cast("long").alias("t"),
    )
    tot = census.agg(
        F.sum("r").cast("long").alias("R_"), F.sum("t").cast("long").alias("T_")
    )
    w = (
        census.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    ((F.col("t") + 1) * (F.col("R_") + n_buckets)).cast("double")
                    / ((F.col("r") + 1) * (F.col("T_") + n_buckets))
                )
                * 1e6
            )
            .cast("long")
            .alias("w_e6"),
        )
    )
    scores = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_feats"), F.sum("w_e6").alias("s_e6"))
    )
    # global top-k via orderBy+limit -> TakeOrderedAndProject (per-
    # partition partial top-k); a bare global rank window would sort
    # the whole corpus in ONE partition. The rank window then runs
    # over the k surviving rows only.
    topk = scores.orderBy(F.desc("s_e6"), F.col(id_col)).limit(k)
    win = Window.orderBy(F.desc("s_e6"), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(win).cast("long")).select(
        id_col,
        "n_feats",
        (F.col("s_e6") / F.lit(1e6)).alias("logw"),
        "rank",
    )


def negative_samples(
    positives: DataFrame,
    n_items: int,
    k: int = 4,
    margin: int = 8,
    query_col: str = "query_id",
    pos_col: str = "pos_id",
    salt: str = "neg:",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every query in ``positives`` (query_col, pos_col — multiple
    positives per query allowed), draw ``k`` pseudo-random negative
    item ids from the DENSE id space [0, n_items), excluding every one
    of that query's positives.

    Candidates are derived directly — neg = hash(query, j) % n_items
    for j in 1..k+margin — so the cost is |queries| x (k+margin) rows
    joined against nothing but the positives themselves: NO pass over
    the corpus, which is what makes this shape survive a 100 TB item
    table (an alternative "rank all items per query by hash" plan is
    |queries| x |corpus|). Draws are md5-portable (the hash_sample
    idiom), reproducible under any partitioning, and identical in the
    DuckDB twin. Collisions (duplicate draws, positive hits) consume
    margin; statistically k+margin=12 covers k=4 for any n_items
    >= ~50 — callers with tiny item spaces or many positives per
    query should raise ``margin``.

    Non-dense id spaces: map ids through a dense index first
    (row_number over the item table — one sort, amortized across
    every training epoch that reuses it).

    Output: (query_col, rank 1..k, neg_id), rank ordered by draw
    index then neg_id.
    """
    q = positives.select(query_col).distinct()
    cand = (
        q.select(
            query_col,
            F.explode(F.sequence(F.lit(1), F.lit(k + margin))).alias("__j"),
        )
        .withColumn(
            "neg_id",
            _hash_u32(
                F.concat(
                    F.col(query_col).cast("string"), F.lit(":"),
                    F.col("__j").cast("string"),
                ),
                salt,
            )
            % n_items,
        )
    )
    pos = positives.select(
        F.col(query_col), F.col(pos_col).alias("neg_id")
    ).distinct()
    dedup = (
        cand.join(pos, [query_col, "neg_id"], "left_anti")
        .groupBy(query_col, "neg_id")
        .agg(F.min("__j").alias("__j"))
    )
    w = Window.partitionBy(query_col).orderBy("__j", "neg_id")
    return (
        dedup.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_col, "rank", "neg_id")
    )


def systematic_sample(
    df: DataFrame,
    order_by: list,
    step: int,
    offset: int = 0,
) -> DataFrame:
    """Systematic (every k-th row) sampling over a TOTAL order — the
    estimator survey methodology reaches for when coverage must be
    even across the ordering dimension (time, key space): a hash
    sample can cluster by chance, a systematic sample cannot.

    Rank rides :func:`...etl.global_rank` (range partition + broadcast
    offsets — never a single-reducer window); rows where
    (rank − 1 − offset) mod step == 0 survive, so the sample is exactly
    ceil((n − offset)/step) rows, deterministic for any engine.
    ``order_by`` must be a total order (unique key last).

    Output: input columns + ``grank`` (the 1-based global rank of each
    kept row — the inclusion evidence).
    """
    from data_misc_tools_spark.operators.etl import global_rank

    if step < 1:
        raise ValueError("step must be >= 1")
    if not 0 <= offset < step:
        raise ValueError("offset must be in [0, step)")
    ranked = global_rank(df, order_by)
    return ranked.filter((F.col("grank") - 1 - offset) % step == 0)


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
    value_scale: int = 100,
) -> DataFrame:
    """Neyman optimal allocation (Neyman 1934) for a stratified
    sample: given a total budget, sample each stratum proportionally
    to N_h·σ_h — variance-heavy strata get more budget, constant
    strata almost none — the design that minimizes the estimator's
    variance at fixed cost. The planning step in front of
    :func:`exact_stratified_split` (which splits by fixed fractions).

    Engine-exact: per-stratum variance comes from exact decimal(38,0)
    sufficient statistics; σ_h enters as ONE per-quantity e6-rounded
    sqrt (sd_e6 — the e6ln idiom's sqrt cousin: IEEE sqrt of an
    identical double rounds identically in both engines), after which
    EVERYTHING is integer: weight w_h = N_h·sd_e6, base allocation
    (total_n·w_h) div W, and the largest-remainder top-up ranked by
    (total_n·w_h mod W DESC, stratum) — a total order, so the +1s land
    identically and Σ alloc_n == total_n exactly (pinned in tests).
    Single-row strata carry sd NULL → weight 0; all-zero total weight
    raises (no signal to allocate on).

    Scale shape: one stratum-keyed aggregate over one scan; the
    largest-remainder window runs over the STRATA frame (bounded
    codebook). Output: (stratum, n_rows, sd_e6, weight, alloc_n)
    ordered by stratum.
    """
    from pyspark.sql.window import Window

    t = int(total_n)
    if t < 1:
        raise ValueError("total_n must be >= 1")
    dec = "decimal(38,0)"
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        F.round(F.col(value_col).cast("double") * value_scale)
        .cast("long")
        .alias("x"),
    )
    # the strata frame feeds the total AND the allocation join:
    # checkpoint the k-row aggregate or each reference re-scans the
    # input (2 full scans measured in the plan pin)
    g = base.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum((F.col("x").cast(dec)) * F.col("x")).alias("sxx"),
    ).localCheckpoint()
    stats = g.selectExpr(
        "stratum", "n_rows",
        # exact-integer scatter -> double -> IEEE sqrt -> e6 round:
        # the single float step, identical in both engines
        """CASE WHEN n_rows >= 2 THEN
             cast(round(sqrt(cast(n_rows * sxx - sx * sx as double)
                             / cast(n_rows as double)
                             / cast(n_rows - 1 as double)) * 1e6) as long)
           END AS sd_e6""",
    ).withColumn(
        "weight",
        F.coalesce(
            (F.col("n_rows").cast(dec) * F.col("sd_e6")).cast(dec),
            F.lit(0).cast(dec),
        ),
    )
    tot = stats.agg(F.sum("weight").cast(dec).alias("w_tot"))
    j = stats.crossJoin(F.broadcast(tot))
    # total_n * weight stays decimal(38,0) (weight = n_rows * sd_e6
    # reaches ~5e15 at 10x and the product would overflow BIGINT —
    # ADVICE r8); the remainder stays decimal too (it is bounded by
    # w_tot, not by total_n); only the output columns narrow to long
    j = j.selectExpr(
        "stratum", "n_rows", "sd_e6", "cast(weight as long) AS __w_long",
        f"CASE WHEN w_tot > 0 THEN cast((cast({t} as decimal(38,0)) "
        "* weight) div w_tot as long) END AS __base",
        f"CASE WHEN w_tot > 0 THEN cast((cast({t} as decimal(38,0)) "
        f"* weight) % w_tot as {dec}) END AS __rem",
    )
    w_rank = Window.orderBy(F.desc("__rem"), "stratum")
    w_all = Window.partitionBy()
    out = (
        j.withColumn("__rk", F.row_number().over(w_rank).cast("long"))
        .withColumn("__left", F.lit(t) - F.sum("__base").over(w_all))
        .selectExpr(
            "stratum", "n_rows", "sd_e6", "__w_long AS weight",
            "cast(__base + CASE WHEN __rk <= __left THEN 1 ELSE 0 END "
            "as long) AS alloc_n",
            "__base IS NULL AS __bad",
        )
    )
    # materialize the zero-weight-total guard eagerly (bounded frame)
    if out.where("__bad").limit(1).count() > 0:
        raise ValueError(
            "neyman_allocation: total weight is zero (every stratum "
            "constant or single-row) — nothing to allocate on"
        )
    return out.drop("__bad").orderBy("stratum")

"""Co-occurrence analytics: market-basket association rules and
item-item collaborative filtering.

Both operators share one scalable shape — the pair census. Items that
co-occur inside a grouping key (a basket, a user history) are paired
by a self equi-join ON THE KEY, never a cross join: the candidate set
is sum over keys of |key|^2, so the only scale lever that matters is
the per-key fan-out. Hot keys (a basket holding thousands of items, a
bot user touching every item) are the failure mode at 100 TB — both
operators expose an explicit cap that drops or trims them BEFORE the
join, the same hot-key discipline as winnowing's max_df and the
triangle census's banding (see CLAUDE.md scale notes).

Everything downstream of the pair census is exact integer arithmetic
(supports, co-counts, integer dot products), so confidence / lift /
cosine are emitted as single pinned IEEE divisions of exact integers —
bit-identical in any engine, no rounding needed (the q2/pearson_exact
invariant).

Reference behavior parity: the reference ships no recommender, but its
users run exactly these shapes as multi-stage Hive jobs (pair counts
via GROUP BY after a self join); this module is the Spark-first
single-plan form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def association_rules_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket_size: int | None = None,
) -> DataFrame:
    """2-itemset association rules (support / confidence / lift) over
    (basket, item) rows — the A-priori pair pass, which at 2-itemset
    depth needs no candidate pruning: one distinct, one self equi-join
    on the basket key, one pair groupBy.

    - ``support_a/b/ab``: exact basket counts (map-side-combined
      groupBys; the per-item support table is |items| rows and joins
      back BROADCAST, never shuffling the pair frame).
    - ``confidence`` = P(b|a) = support_ab / support_a and ``lift`` =
      n·support_ab / (support_a·support_b): single pinned IEEE
      divisions of exact integers — emitted UNROUNDED (engine-exact;
      int→double conversion is correctly rounded in every engine).
      The lift products are widened to decimal(38,0) before the
      double cast (HUGEINT in the DuckDB twin) — two BIGINT counts
      multiply past 2^63 at ~3·10^9 baskets, well inside 100 TB
      scale, and ANSI Spark would raise rather than answer (ADVICE
      r5; same widening as the r4 BM25 fix, decimal→double is
      correctly rounded so the twin stays bit-exact to ~1e38).
    - ``max_basket_size`` DROPS baskets above the cap before pairing
      (a 10k-item basket alone contributes 5·10^7 pairs); None keeps
      exactness for oracle-checked runs. Dropping, not trimming, keeps
      the remaining statistics exact over the retained baskets.

    Output: (item_a, item_b, support_ab, support_a, support_b,
    n_baskets, confidence, lift) with item_a < item_b; rules below
    ``min_support`` co-occurrences are dropped.
    """
    # the distinct basket frame feeds totals/support/self-join, but a
    # localCheckpoint pin measured a WASH at sf0.1 (r10 A/B) and again
    # at sf1 (r11, VERDICT r10 #7: pinned warm 3.9-4.3 s vs unpinned
    # 4.2-6.9 s isolated, overlapping under noisy canaries; item_cf's
    # rating-frame pin likewise 3.0-3.3 vs 2.7-3.6) — AQE runtime
    # exchange reuse dedupes the upstream at both scales; left unpinned
    b = df.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    if max_basket_size is not None:
        sizes = b.groupBy("__bk").agg(F.count("*").alias("__sz"))
        b = b.join(
            sizes.filter(F.col("__sz") <= max_basket_size).select("__bk"),
            "__bk",
        )
    totals = b.agg(F.count_distinct("__bk").cast("long").alias("n_baskets"))
    supp = b.groupBy("__it").agg(F.count("*").cast("long").alias("__supp"))
    pairs = (
        b.alias("l")
        .join(b.alias("r"), "__bk")
        .filter(F.col("l.__it") < F.col("r.__it"))
        .groupBy(
            F.col("l.__it").alias("item_a"), F.col("r.__it").alias("item_b")
        )
        .agg(F.count("*").cast("long").alias("support_ab"))
        .filter(F.col("support_ab") >= min_support)
    )
    return (
        pairs.join(
            F.broadcast(supp.withColumnsRenamed({"__it": "item_a", "__supp": "support_a"})),
            "item_a",
        )
        .join(
            F.broadcast(supp.withColumnsRenamed({"__it": "item_b", "__supp": "support_b"})),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "item_a",
            "item_b",
            "support_ab",
            "support_a",
            "support_b",
            "n_baskets",
            "CAST(support_ab AS DOUBLE) / CAST(support_a AS DOUBLE)"
            " AS confidence",
            "CAST(CAST(n_baskets AS DECIMAL(38,0)) * support_ab AS DOUBLE)"
            " / CAST(CAST(support_a AS DECIMAL(38,0)) * support_b AS DOUBLE)"
            " AS lift",
        )
    )


def item_item_cosine(
    df: DataFrame,
    user_col: str,
    item_col: str | Column,
    min_common_users: int = 1,
    max_items_per_user: int | None = None,
) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity between
    items' implicit-feedback vectors (rating = the user's interaction
    COUNT, so every statistic is an exact integer).

    Shape: one (user, item) count groupBy, a self equi-join ON USER to
    census co-occurring item pairs (dot = Σ_u r_ua·r_ub, exact BIGINT),
    and a broadcast join back to the |items|-row squared-norm table.
    cosine = dot / (sqrt(n2_a)·sqrt(n2_b)) is a pinned chain of IEEE
    ops over exact integers — emitted UNROUNDED, bit-identical across
    engines (sqrt is correctly rounded everywhere).

    ``max_items_per_user`` TRIMS each user to their top-N items by
    (count DESC, item) before pairing — the bot-user guard: a user
    touching k items contributes k² pair rows, and norms are computed
    AFTER the trim so cosine stays internally consistent. The window
    is keyed per user (never global). None = exact.

    Output: (item_a, item_b, dot, n_common, n2_a, n2_b, cosine) with
    item_a < item_b, pairs sharing fewer than ``min_common_users``
    users dropped.

    BIGINT bound (ADVICE r5): ``dot`` and ``n2`` are exact-count sums
    pinned to BIGINT by the output schema (the oracle twin is also
    BIGINT; HUGEINT outputs always flag in the type-strict gate).
    They overflow only past 9.2·10^18 — i.e. a single item pair
    accumulating ~10^19 interaction-count product mass, which needs
    per-(user,item) counts ≳3·10^9 THROUGH one pair; the
    ``max_items_per_user`` bot guard is the production lever before
    that. Unlike lift's product-of-two-supports (widened above at
    ~3·10^9), this bound is the full 2^63, so BIGINT is kept; ANSI
    Spark and DuckDB both raise loudly rather than wrap if it is ever
    hit. ``cosine``'s denominator takes sqrt of each norm BEFORE
    multiplying (doubles), so it has no integer product at all.
    """
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    r = (
        df.select(F.col(user_col).alias("__u"), item.alias("__it"))
        .filter(F.col("__it").isNotNull())
        .groupBy("__u", "__it")
        .agg(F.count("*").cast("long").alias("__r"))
    )
    if max_items_per_user is not None:
        w = Window.partitionBy("__u").orderBy(
            F.desc("__r"), F.asc("__it")
        )
        r = (
            r.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_items_per_user)
            .drop("__rn")
        )
    norms = r.groupBy("__it").agg(
        F.sum(F.col("__r") * F.col("__r")).cast("long").alias("__n2")
    )
    pairs = (
        r.alias("l")
        .join(r.alias("r"), "__u")
        .filter(F.col("l.__it") < F.col("r.__it"))
        .groupBy(
            F.col("l.__it").alias("item_a"), F.col("r.__it").alias("item_b")
        )
        .agg(
            F.sum(F.col("l.__r") * F.col("r.__r")).cast("long").alias("dot"),
            F.count("*").cast("long").alias("n_common"),
        )
        .filter(F.col("n_common") >= min_common_users)
    )
    return (
        pairs.join(
            F.broadcast(norms.withColumnsRenamed({"__it": "item_a", "__n2": "n2_a"})),
            "item_a",
        )
        .join(
            F.broadcast(norms.withColumnsRenamed({"__it": "item_b", "__n2": "n2_b"})),
            "item_b",
        )
        .selectExpr(
            "item_a",
            "item_b",
            "dot",
            "n_common",
            "n2_a",
            "n2_b",
            "CAST(dot AS DOUBLE)"
            " / (sqrt(CAST(n2_a AS DOUBLE)) * sqrt(CAST(n2_b AS DOUBLE)))"
            " AS cosine",
        )
    )

"""Co-occurrence analytics: association rules and item-item CF."""

import math

import pyspark.sql.functions as F

from data_misc_tools_spark.operators.recommend import (
    association_rules_pairs,
    item_item_cosine,
)


def _baskets(spark):
    rows = [
        # basket 1: a, b, c (b twice -> distinct collapses it)
        (1, "a"), (1, "b"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
        (5, "a"), (5, "b"), (5, "c"), (5, "d"),
    ]
    return spark.createDataFrame(rows, "bk int, it string")


def test_association_rules_exact_counts(spark):
    out = {
        (r.item_a, r.item_b): r
        for r in association_rules_pairs(_baskets(spark), "bk", "it").collect()
    }
    # supports: a=4, b=4, c=3, d=1, n=5
    ab = out[("a", "b")]
    assert (ab.support_ab, ab.support_a, ab.support_b, ab.n_baskets) == (
        3, 4, 4, 5,
    )
    assert ab.confidence == 3.0 / 4.0
    assert ab.lift == (5 * 3) / (4.0 * 4.0)
    ac = out[("a", "c")]
    assert ac.support_ab == 3
    # d co-occurs once with each of a, b, c (basket 5)
    assert out[("a", "d")].support_ab == 1
    assert out[("c", "d")].lift == (5 * 1) / (3.0 * 1.0)
    # no self-pairs, pairs are canonical a < b
    assert all(a < b for a, b in out)


def test_association_rules_min_support_and_basket_cap(spark):
    b = _baskets(spark)
    strong = association_rules_pairs(b, "bk", "it", min_support=3)
    assert {(r.item_a, r.item_b) for r in strong.collect()} == {
        ("a", "b"), ("a", "c"),
    }
    # cap 3 drops basket 5 (4 distinct items) entirely: d disappears
    # and every remaining statistic is exact over the retained baskets
    capped = {
        (r.item_a, r.item_b): r
        for r in association_rules_pairs(
            b, "bk", "it", max_basket_size=3
        ).collect()
    }
    assert not any("d" in p for p in capped)
    ab = capped[("a", "b")]
    assert (ab.support_ab, ab.support_a, ab.n_baskets) == (2, 3, 4)


def _events(spark):
    # user -> item interaction log with repeats (counts = ratings)
    rows = [
        (1, 10), (1, 10), (1, 20),
        (2, 10), (2, 20), (2, 20), (2, 30),
        (3, 20), (3, 30),
    ]
    return spark.createDataFrame(rows, "u int, it int")


def test_item_item_cosine_matches_numpy_style_reference(spark):
    out = {
        (r.item_a, r.item_b): r
        for r in item_item_cosine(_events(spark), "u", "it").collect()
    }
    # ratings: item10 = {1:2, 2:1}, item20 = {1:1, 2:2, 3:1}, item30 = {2:1, 3:1}
    r = out[(10, 20)]
    assert (r.dot, r.n_common, r.n2_a, r.n2_b) == (2 * 1 + 1 * 2, 2, 5, 6)
    assert r.cosine == 4.0 / (math.sqrt(5.0) * math.sqrt(6.0))
    r = out[(20, 30)]
    assert (r.dot, r.n_common) == (2 * 1 + 1 * 1, 2)
    r = out[(10, 30)]
    assert (r.dot, r.n_common) == (1 * 1, 1)


def test_item_item_cosine_min_common_and_user_cap(spark):
    e = _events(spark)
    out = item_item_cosine(e, "u", "it", min_common_users=2)
    assert {(r.item_a, r.item_b) for r in out.collect()} == {
        (10, 20), (20, 30),
    }
    # cap each user to their single top item by (count DESC, item):
    # user1 -> 10 (count 2), user2 -> 20 (count 2), user3 -> 20 (tie
    # 1/1 between 20 and 30 -> smaller item wins). No user holds two
    # items, so no pairs survive — and norms reflect the TRIMMED table.
    capped = item_item_cosine(e, "u", "it", max_items_per_user=1)
    assert capped.count() == 0


def test_item_item_cosine_accepts_column_expression(spark):
    e = _events(spark).select(
        "u", F.to_json(F.struct(F.col("it").alias("k"))).alias("props")
    )
    out = item_item_cosine(
        e, "u", F.get_json_object("props", "$.k").cast("long")
    )
    assert out.count() == 3


def test_association_rules_pair_join_plan(spark):
    """The support tables attach BROADCAST; the pair census is the only
    shuffling join (on the basket key)."""
    rules = association_rules_pairs(_baskets(spark), "bk", "it")
    plan = rules._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

"""Deterministic sampling operators: stability, coordination, rates."""

import pytest
import pyspark.sql.functions as F

from data_misc_tools_spark.operators import sampling as SA


def _docs(spark, sf_dir):
    from data_misc_tools_spark.session import load_tables

    return load_tables(spark, sf_dir, ["documents"])["documents"]


def test_hash_sample_stable_under_repartition(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {r.doc_id for r in SA.hash_sample(d, "doc_id", 0.2).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in SA.hash_sample(d.repartition(13), "doc_id", 0.2).select("doc_id").collect()
    }
    assert a == b and len(a) > 0


def test_hash_sample_rate_roughly_holds(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n = d.count()
    k = SA.hash_sample(d, "doc_id", 0.3).count()
    assert 0.15 * n < k < 0.45 * n  # 500 draws @ 30%


def test_hash_sample_coordinated_across_frames(spark, sf_dir):
    """Same key + salt -> same verdict in any table (join-consistent)."""
    d = _docs(spark, sf_dir)
    ids_from_docs = {
        r.doc_id for r in SA.hash_sample(d, "doc_id", 0.25, salt="x").select("doc_id").collect()
    }
    only_ids = d.select("doc_id").distinct()
    ids_again = {
        r.doc_id for r in SA.hash_sample(only_ids, "doc_id", 0.25, salt="x").collect()
    }
    assert ids_from_docs == ids_again


def test_hash_sample_salts_compose_independently(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s1 = SA.hash_sample(d, "doc_id", 0.5, salt="a")
    s2 = SA.hash_sample(s1, "doc_id", 0.5, salt="b")
    n, k = d.count(), s2.count()
    assert 0.1 * n < k < 0.4 * n  # ~25% with independent salts


def test_stratified_rates_per_stratum(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = SA.stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.0}, default_rate=1.0
    )
    langs = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "en" not in langs  # rate 0 drops the stratum entirely
    full = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in langs.items():
        assert n == full[lang]  # rate 1 keeps every row


def test_per_group_reservoir_counts_and_stability(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = SA.per_group_reservoir(d, "source", "doc_id", k=3)
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 3 for n in per.values())
    again = SA.per_group_reservoir(d.repartition(7), "source", "doc_id", k=3)
    assert {(r.source, r.doc_id) for r in out.select("source", "doc_id").collect()} == {
        (r.source, r.doc_id) for r in again.select("source", "doc_id").collect()
    }
    assert "__rk" not in out.columns


def test_split_assign_exhaustive_and_stable(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = SA.split_assign(d, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == d.count()
    assert counts["train"] > counts.get("val", 0)  # 90% dominates
    # a key's split never depends on what else is in the frame
    sub = SA.split_assign(d.limit(50), "doc_id")
    whole = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    for r in sub.select("doc_id", "split").collect():
        assert whole[r.doc_id] == r.split


class TestMixtureResample:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        return spark.createDataFrame(rows, "k long, src string")

    def test_rebalances_toward_targets(self, spark, skewed):
        out = SA.mixture_resample(
            skewed, "src", "k", weights={"big": 1, "small": 1}, target_rows=200
        )
        by = {r.src: r["cnt"] for r in out.groupBy("src").agg(F.count("*").alias("cnt")).collect()}
        # big: rate 100/900 -> ~100 of 900; small: capped at keep-all (100 < target)
        assert by["small"] == 100
        assert 60 <= by["big"] <= 140

    def test_small_stratum_keeps_everything_never_upsamples(self, spark, skewed):
        out = SA.mixture_resample(
            skewed, "src", "k", weights={"small": 10, "big": 0}, target_rows=500
        )
        got = sorted(r.k for r in out.collect())
        assert got == list(range(900, 1000))  # all of small, none of big

    def test_unlisted_strata_dropped(self, spark, skewed):
        out = SA.mixture_resample(skewed, "src", "k", weights={"big": 1}, target_rows=100)
        assert out.filter(F.col("src") == "small").count() == 0

    def test_deterministic_under_repartition(self, spark, skewed):
        a = {r.k for r in SA.mixture_resample(skewed, "src", "k", {"big": 1, "small": 3}, 300).collect()}
        b = {
            r.k
            for r in SA.mixture_resample(
                skewed.repartition(17), "src", "k", {"big": 1, "small": 3}, 300
            ).collect()
        }
        assert a == b

    def test_scan_local_filter_after_broadcast(self, spark, skewed):
        plan = (
            SA.mixture_resample(skewed, "src", "k", {"big": 1}, 100)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestTrainingOrder:
    def test_permutation_properties(self, spark):
        df = spark.createDataFrame([(i,) for i in range(500)], "k long")
        out = SA.training_order(df, "k", shards=8).collect()
        assert len(out) == 500  # a permutation loses nothing
        # (shard, pos) is a unique dense numbering within each shard
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r.pos)
        assert set(by_shard) <= set(range(8))
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        # hash order != key order (it actually shuffles)
        first_shard = sorted(by_shard)[0]
        keys_in_order = [
            r.k for r in sorted(out, key=lambda r: (r.shard, r.pos))
        ]
        assert keys_in_order != sorted(keys_in_order)

    def test_stable_under_repartition_and_row_growth(self, spark):
        df = spark.createDataFrame([(i,) for i in range(200)], "k long")
        a = {(r.k, r.shard, r.pos) for r in SA.training_order(df, "k").collect()}
        b = {
            (r.k, r.shard, r.pos)
            for r in SA.training_order(df.repartition(13), "k").collect()
        }
        assert a == b
        # adding rows never moves an existing key to another SHARD
        # (positions inside a shard may shift)
        grown = spark.createDataFrame([(i,) for i in range(300)], "k long")
        shards_a = {r.k: r.shard for r in SA.training_order(df, "k").collect()}
        shards_g = {r.k: r.shard for r in SA.training_order(grown, "k").collect()}
        assert all(shards_g[k] == s for k, s in shards_a.items())


class TestSplitByCluster:
    def test_cluster_members_share_split_and_singletons_fallback(self, spark):
        """The leakage-free property itself: every near-dup cluster
        lands whole in one split; docs with no edges keep their own
        key (same assignment as plain split_assign)."""
        docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        # clusters: {0..4} via chain edges, {10,11}, rest singletons
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
        )
        out = SA.split_by_cluster(docs, edges, salt="t").collect()
        split = {r.doc_id: r.split for r in out}
        ck = {r.doc_id: r.cluster_key for r in out}
        assert len(out) == 100  # left join loses nothing
        assert len({split[i] for i in range(5)}) == 1
        assert ck[3] == 0 and ck[11] == 10  # min-id cluster key
        assert split[10] == split[11]
        # singletons match split_assign on their own key
        plain = {
            r.doc_id: r.split
            for r in SA.split_assign(docs, "doc_id", salt="t").collect()
        }
        for i in [20, 55, 99]:
            assert ck[i] == i and split[i] == plain[i]

    def test_assignment_stable_under_new_edges_elsewhere(self, spark):
        """Adding an unrelated cluster never moves existing docs."""
        docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        e1 = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
        e2 = spark.createDataFrame([(0, 1), (30, 31)], "doc_a long, doc_b long")
        s1 = {r.doc_id: r.split for r in SA.split_by_cluster(docs, e1).collect()}
        s2 = {r.doc_id: r.split for r in SA.split_by_cluster(docs, e2).collect()}
        assert all(s2[k] == v for k, v in s1.items() if k not in (30, 31))


def test_sample_weighted_proportional_and_deterministic(spark):
    from data_misc_tools_spark.operators.sampling import (
        sample_weighted,
        sample_weighted_portable,
    )

    rows = [(i, 9 if i < 1000 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w long")

    for fn in (sample_weighted, sample_weighted_portable):
        sel = fn(df, "id", "w", k=400, salt="t1")
        picked = [r.id for r in sel.collect()]
        assert len(picked) == len(set(picked)) == 400
        heavy = sum(1 for i in picked if i < 1000)
        # weight-9 rows should dominate ~9:1; demand at least 3:1
        assert heavy > 300, (fn.__name__, heavy)
        # determinism: same salt -> identical selection, regardless of
        # partitioning; different salt -> different selection
        again = [r.id for r in fn(df.repartition(7), "id", "w", k=400,
                                   salt="t1").collect()]
        assert again == picked, fn.__name__
        other = [r.id for r in fn(df, "id", "w", k=400, salt="t2").collect()]
        assert other != picked, fn.__name__

    # zero/negative weights: float path drops them, portable clamps to 1
    dfz = spark.createDataFrame([(1, 0), (2, 5)], "id long, w long")
    assert [r.id for r in sample_weighted(dfz, "id", "w", k=2).collect()] == [2]
    got = {r.id: r["__w"] for r in
           sample_weighted_portable(dfz, "id", "w", k=2).collect()}
    assert got[1] == 1 and got[2] == 5


def test_sample_weighted_es_e6_matches_python_mirror(spark):
    """The e6-ln A-ES variant: python mirror of the exact float chain
    (two exact casts -> one IEEE division -> ln -> e6 round -> one
    more division) reproduces selection AND priorities bit-for-bit;
    proportionality and zero-weight exclusion hold; no weight cap."""
    import hashlib
    import math

    from data_misc_tools_spark.operators.sampling import (
        sample_weighted_es_e6,
    )

    rows = [(i, 9_000_000 if i < 1000 else 1_000_000) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w long")
    sel = sample_weighted_es_e6(df, "id", "w", k=400, salt="t1").collect()
    picked = [r.id for r in sel]
    assert len(picked) == len(set(picked)) == 400
    assert sum(1 for i in picked if i < 1000) > 300  # ~9:1 weights

    def mirror(i, w):
        h = int(hashlib.md5(f"t1{i}".encode()).hexdigest()[:8], 16)
        l_e6 = round(math.log(float(h + 1) / float((1 << 32) + 1)) * 1e6)
        return l_e6, l_e6 / float(w)

    ref = sorted(
        ((mirror(i, w)[1], i, w) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )[:400]
    assert [(i) for _, i, _ in ref] == picked
    by_id = {r.id: r for r in sel}
    for pr, i, w in ref:
        assert by_id[i]["priority"] == pr
        assert by_id[i]["l_e6"] == mirror(i, w)[0]

    # partitioning-independent; zero weights excluded
    again = [
        r.id
        for r in sample_weighted_es_e6(
            df.repartition(7), "id", "w", k=400, salt="t1"
        ).collect()
    ]
    assert again == picked
    dfz = spark.createDataFrame([(1, 0), (2, 5)], "id long, w long")
    assert [
        r.id for r in sample_weighted_es_e6(dfz, "id", "w", k=2).collect()
    ] == [2]


def test_dsir_topk_prefers_target_domain(spark):
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.sampling import dsir_topk

    med = ["heart dose patient trial blood", "dose trial patient heart scan",
           "patient blood dose heart care", "trial scan care blood dose"]
    web = ["click buy cheap deal offer", "offer deal click cheap shop",
           "buy shop offer click deal", "cheap deal shop buy offer"]
    rows = []
    for i, t in enumerate(med):
        rows.append((i, t, "med"))
    for i, t in enumerate(web):
        rows.append((100 + i, t, "web"))
    # held-out candidates: one per domain, unlabeled as target
    rows.append((500, "heart patient dose blood trial", "unk"))
    rows.append((501, "click cheap buy offer deal", "unk"))
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = dsir_topk(df, target=F.col("src") == "med", n_buckets=256, k=10)
    ranks = {r.doc_id: r.rank for r in out.collect()}
    assert ranks[500] < ranks[501]
    # all med docs outrank all web docs
    assert max(ranks[i] for i in range(4)) < min(ranks[100 + i] for i in range(4))
    # determinism under repartition
    again = {r.doc_id: r.rank for r in
             dsir_topk(df.repartition(5), target=F.col("src") == "med",
                       n_buckets=256, k=10).collect()}
    assert again == ranks


def test_negative_samples_exclude_positives_and_are_stable(spark):
    from data_misc_tools_spark.operators.sampling import negative_samples

    # query 1 holds HALF the item space as positives: draws must
    # dodge all of them and still fill k from the margin
    pos_rows = [(1, i) for i in range(0, 50)] + [(2, 7)]
    pos = spark.createDataFrame(pos_rows, "query_id long, pos_id long")
    out = negative_samples(pos, n_items=100, k=4, margin=20).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {1, 2}
    for qid, rows in by_q.items():
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3, 4]
        negs = {r.neg_id for r in rows}
        assert len(negs) == 4  # no duplicate negatives
        assert all(0 <= n < 100 for n in negs)
    assert all(r.neg_id >= 50 for r in by_q[1])  # positives excluded
    assert all(r.neg_id != 7 for r in by_q[2])
    # deterministic under repartition
    again = negative_samples(
        pos.repartition(5), n_items=100, k=4, margin=20
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


class TestExactStratifiedSplit:
    def test_exact_counts_per_stratum(self, spark):
        rows = [(i, "en" if i < 100 else "de") for i in range(130)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = SA.exact_stratified_split(
            df, "lang", "doc_id", {"train": 80, "val": 10, "test": 10}
        )
        counts = {
            (r.lang, r.split): r.n
            for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
        }
        # en: 100 docs -> exactly 80/10/10; de: 30 -> 24/3/3
        assert counts[("en", "train")] == 80
        assert counts[("en", "val")] == 10
        assert counts[("en", "test")] == 10
        assert counts[("de", "train")] == 24
        assert counts[("de", "val")] == 3
        assert counts[("de", "test")] == 3

    def test_deterministic_and_partition_stable(self, spark):
        rows = [(i, "x") for i in range(57)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        a = sorted(
            (r.doc_id, r.split)
            for r in SA.exact_stratified_split(df, "lang", "doc_id").collect()
        )
        b = sorted(
            (r.doc_id, r.split)
            for r in SA.exact_stratified_split(
                df.repartition(7), "lang", "doc_id"
            ).collect()
        )
        assert a == b

    def test_bad_percents_raise(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, lang string")
        with pytest.raises(ValueError, match="sum to 100"):
            SA.exact_stratified_split(df, "lang", "doc_id", {"train": 70, "val": 10})


def test_systematic_sample_even_coverage(spark):
    import pytest as _pt

    from data_misc_tools_spark.operators.sampling import systematic_sample

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    out = systematic_sample(df, ["id"], step=10, offset=4).collect()
    assert sorted(r.id for r in out) == list(range(4, 100, 10))
    assert all(r.grank == r.id + 1 for r in out)
    # offset 0, step 1 = identity
    assert systematic_sample(df, ["id"], step=1).count() == 100
    with _pt.raises(ValueError):
        systematic_sample(df, ["id"], step=0)
    with _pt.raises(ValueError):
        systematic_sample(df, ["id"], step=5, offset=5)


class TestNeymanAllocation:
    def test_matches_python_and_sums_exactly(self, spark):
        import math
        import random

        from data_misc_tools_spark.operators.sampling import neyman_allocation

        rng = random.Random(13)
        rows = []
        for i in range(3000):
            s = "s" + str(i % 4)
            spread = {0: 1.0, 1: 10.0, 2: 40.0, 3: 0.0}[i % 4]
            rows.append((s, round(rng.uniform(0, spread), 2)))
        rows.append(("tiny", 5.0))  # single-row stratum -> weight 0
        df = spark.createDataFrame(rows, "s string, v double")
        got = {r.stratum: r for r in
               neyman_allocation(df, "s", "v", total_n=500).collect()}

        by = {}
        for s, v in rows:
            by.setdefault(s, []).append(round(v * 100))
        w = {}
        for s, xs in by.items():
            n = len(xs)
            if n < 2:
                w[s] = 0
                continue
            scatter = n * sum(x * x for x in xs) - sum(xs) ** 2
            sd = round(math.sqrt(scatter / n / (n - 1)) * 1e6)
            w[s] = n * sd
            assert got[s].sd_e6 == sd
        W = sum(w.values())
        base = {s: (500 * ws) // W for s, ws in w.items()}
        rem = {s: (500 * ws) % W for s, ws in w.items()}
        left = 500 - sum(base.values())
        order = sorted(w, key=lambda s: (-rem[s], s))
        want = dict(base)
        for s in order[:left]:
            want[s] += 1
        for s in by:
            assert got[s].alloc_n == want[s], s
        assert sum(r.alloc_n for r in got.values()) == 500
        # variance-heavy stratum gets the most budget; constant gets 0
        assert got["s2"].alloc_n > got["s1"].alloc_n > got["s0"].alloc_n
        assert got["s3"].alloc_n == 0 and got["tiny"].alloc_n == 0

    def test_all_constant_raises(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.sampling import neyman_allocation

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)], "s string, v double"
        )
        with _pytest.raises(ValueError, match="total weight is zero"):
            neyman_allocation(df, "s", "v", total_n=10)
        with _pytest.raises(ValueError, match="total_n"):
            neyman_allocation(df, "s", "v", total_n=0)

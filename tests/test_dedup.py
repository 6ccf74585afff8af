"""Deduplication operators: exact, MinHash+LSH, SimHash, Jaccard."""

import pyspark.sql.functions as F

from data_misc_tools_spark.operators import dedup as D


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and keeps running"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup
        (4, "completely different content about spark query engines instead"),
        (5, "zq"),  # shorter than shingle width k=5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_stats_and_filter(spark):
    d = _docs(spark)
    stats = {r.keep_id: r.dup_count for r in D.exact_dedup_stats(d).collect()}
    assert stats[1] == 2  # docs 1+2 merged, min id kept
    assert stats[3] == 1
    kept = {r.doc_id for r in D.exact_dedup(d).collect()}
    assert kept == {1, 3, 4, 5}


def test_minhash_identical_docs_equal_signatures(spark):
    sigs = {r.doc_id: (r.m0, r.m1, r.m2, r.m3) for r in
            D.minhash_signatures(_docs(spark), num_perm=4).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    assert 5 not in sigs  # below shingle width -> no signature


def test_minhash_candidate_pairs(spark):
    pairs = {(r.doc_a, r.doc_b) for r in D.minhash_candidate_pairs(_docs(spark)).collect()}
    assert (1, 2) in pairs  # identical docs always collide
    # near-dup 3 should collide with 1 or 2 in at least one band
    assert (1, 3) in pairs or (2, 3) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_universal_hash_bounds(spark):
    sigs = D.minhash_signatures(_docs(spark), num_perm=8).collect()
    for r in sigs:
        for i in range(8):
            v = r[f"m{i}"]
            assert 0 <= v < D.MINHASH_P


def test_simhash_similarity_property(spark):
    d = _docs(spark)
    sh = {r.doc_id: r.simhash for r in D.simhash(d).collect()}
    assert sh[1] == sh[2]  # identical docs -> identical fingerprint
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated doc
    assert all(0 <= v < 2**16 for v in sh.values())


def test_simhash_neardup_pairs(spark):
    out = {(r.doc_a, r.doc_b): r.hamming
           for r in D.simhash_neardup_pairs(_docs(spark), max_hamming=2).collect()}
    assert out[(1, 2)] == 0


def test_ngram_jaccard(spark):
    d = _docs(spark)
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long")
    j = {(r.doc_a, r.doc_b): r.jaccard for r in D.ngram_jaccard_pairs(pairs, d).collect()}
    assert j[(1, 2)] == 1.0  # identical
    assert 0.5 < j[(1, 3)] < 1.0  # near-dup
    assert j[(1, 4)] < 0.2  # unrelated


def test_minhash_plan_has_single_shuffle_to_signatures(spark):
    # signature computation must be one explode + one hash-aggregate;
    # no join/cartesian before the band self-join
    plan = D.minhash_signatures(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Cartesian" not in plan


class TestIncrementalIndex:
    def test_batch_vs_persisted_index(self, spark, tmp_path):
        p = str(tmp_path / "lshidx")
        D.minhash_index_build(_docs(spark), p)
        # batch: one near-dup of indexed doc 1, one novel doc
        batch = spark.createDataFrame(
            [
                (100, "the quick brown fox jumps over the lazy dog and keeps walking"),
                (101, "entirely unrelated text with no shared shingles whatsoever"),
            ],
            "doc_id long, text string",
        )
        pairs = {
            (r.batch_id, r.index_id)
            for r in D.minhash_index_query(batch, p).collect()
        }
        assert any(b == 100 for b, _ in pairs)  # near-dup found
        assert all(b != 101 for b, _ in pairs)  # novel doc clean
        # self-pairs excluded even when the batch is already indexed
        again = {
            (r.batch_id, r.index_id)
            for r in D.minhash_index_query(_docs(spark), p).collect()
        }
        assert all(b != i for b, i in again)
        assert (1, 2) in again  # exact dups still collide

    def test_append_extends_the_index(self, spark, tmp_path):
        p = str(tmp_path / "lshidx2")
        D.minhash_index_build(_docs(spark), p)
        newdoc = spark.createDataFrame(
            [(200, "fresh corpus segment not resembling anything indexed here")],
            "doc_id long, text string",
        )
        pre = D.minhash_index_query(newdoc, p).count()
        assert pre == 0
        D.minhash_index_append(newdoc, p)
        # a near-dup of the appended doc now matches it
        probe = spark.createDataFrame(
            [(300, "fresh corpus segment not resembling anything indexed there")],
            "doc_id long, text string",
        )
        hits = {
            (r.batch_id, r.index_id)
            for r in D.minhash_index_query(probe, p).collect()
        }
        assert (300, 200) in hits

    def test_only_the_batch_is_hashed(self, spark, tmp_path):
        """The index side must enter the join as a plain parquet scan
        (no xxhash64/md5 over index documents at query time)."""
        p = str(tmp_path / "lshidx3")
        D.minhash_index_build(_docs(spark), p)
        batch = _docs(spark).limit(2)
        plan = (
            D.minhash_index_query(batch, p)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert plan.count("xxhash64") <= 8  # batch signatures only


def test_incremental_pipeline_equals_full_recompute(spark, tmp_path):
    """The 100 TB incremental-dedup flow end to end: LSH-index the
    backlog once; for each new batch (1) query the index for
    collisions, (2) append the batch to the index, (3) merge the new
    candidate edges into the CC labels INCREMENTALLY. After two
    batches, cluster labels must equal a from-scratch
    minhash_candidate_pairs + connected_components over the full
    corpus — without ever re-hashing the backlog."""
    from data_misc_tools_spark.operators.cluster import (
        connected_components,
        connected_components_incremental,
    )

    base = "the quick brown fox jumps over the lazy dog and keeps running"
    backlog = spark.createDataFrame(
        [(1, base), (2, base), (4, "completely different content about "
                                   "spark query engines instead")],
        "doc_id long, text string",
    )
    batch1 = spark.createDataFrame(
        [(3, base.replace("lazy", "sleepy")),
         (6, "totally unrelated text that matches nothing else here")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(7, base.replace("quick", "swift")),
         (8, "completely different content about spark query engines instead")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "inc_idx")
    D.minhash_index_build(backlog, p)
    # seed labels from the backlog's own internal pairs
    labels = connected_components(
        D.minhash_candidate_pairs(backlog), src="doc_a", dst="doc_b"
    )
    for batch in (batch1, batch2):
        internal = D.minhash_candidate_pairs(batch)
        vs_index = D.minhash_index_query(batch, p).select(
            F.col("batch_id").alias("doc_a"), F.col("index_id").alias("doc_b")
        )
        edges = internal.union(vs_index)
        labels = connected_components_incremental(
            labels, edges, src="doc_a", dst="doc_b"
        ).localCheckpoint()
        D.minhash_index_append(batch, p)

    incremental = {r.node: r.component for r in labels.collect()}
    full_corpus = backlog.union(batch1).union(batch2)
    full = {
        r.node: r.component
        for r in connected_components(
            D.minhash_candidate_pairs(full_corpus), src="doc_a", dst="doc_b"
        ).collect()
    }
    assert incremental == full
    assert incremental[8] == incremental[4]  # cross-batch exact dup found
    assert incremental[3] == incremental[1]  # near dup joined backlog cluster


def test_editdist_pairs_exact_and_thresholded(spark):
    docs = spark.createDataFrame(
        [(1, "kitten"), (2, "sitting"), (3, "kitten"), (4, "abcdefgh")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    rows = {(r.doc_a, r.doc_b): r for r in D.editdist_pairs(pairs, docs).collect()}
    assert rows[(1, 2)].edit_dist == 3  # classic kitten->sitting
    assert rows[(1, 2)].edit_sim == round(1 - 3 / 7, 4)
    assert rows[(1, 3)].edit_dist == 0 and rows[(1, 3)].edit_sim == 1.0
    assert rows[(1, 4)].edit_dist == 7  # the shared 'e' aligns

    # banded early-exit: distances above the threshold come back -1
    # with a null similarity instead of a fabricated score
    t = {(r.doc_a, r.doc_b): r for r in
         D.editdist_pairs(pairs, docs, threshold=3).collect()}
    assert t[(1, 2)].edit_dist == 3 and t[(1, 2)].edit_sim is not None
    assert t[(1, 4)].edit_dist == -1 and t[(1, 4)].edit_sim is None


def test_set_similarity_join_equals_brute_force(spark):
    """Prefix filtering must lose NOTHING: output == all-pairs exact
    Jaccard at the threshold (the prefix-filter theorem), on a corpus
    with ties, subsets, and disjoint docs."""
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.dedup import set_similarity_join
    from data_misc_tools_spark.operators.text import tokens

    rows = [
        (1, "a b c d e"),
        (2, "a b c d f"),          # J(1,2) = 4/6
        (3, "a b c d e"),          # identical to 1
        (4, "x y z"),              # disjoint
        (5, "a b c"),              # subset of 1: J = 3/5
        (6, "p q r s t u v w"),
        (7, "p q r s t u v"),      # J(6,7) = 7/8
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in set_similarity_join(df, num=6, den=10).collect()
    }
    # brute force over all pairs
    toks = df.select("doc_id", F.explode(tokens("text")).alias("tok")).distinct()
    sets = {r.doc_id: set() for r in df.collect()}
    for r in toks.collect():
        sets[r.doc_id].add(r.tok)
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 10 * inter >= 6 * union:
                want[(a, b)] = (2 * 10000 * inter + union) // (2 * union) / 10000.0
    assert got == want
    assert (1, 3) in got and got[(1, 3)] == 1.0
    assert (6, 7) in got
    assert (1, 2) in got          # 0.666... >= 0.6
    assert (1, 5) in got          # 3/5 = 0.6 meets the threshold exactly
    assert not any(4 in pair for pair in got)  # disjoint doc matches nothing


def test_set_similarity_join_completeness_on_fixture_corpus(spark, sf_dir):
    """On the documents table (3-word-gram sets): prefix-filtered
    output equals the quadratic all-pairs ground truth."""
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.dedup import set_similarity_join
    from data_misc_tools_spark.session import load_tables

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    got = {
        (r.doc_a, r.doc_b)
        for r in set_similarity_join(d, num=5, den=10, gram_n=3).collect()
    }
    base = d.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 2),"
            " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
        ).alias("g"),
    ).select("doc_id", F.array_distinct("g").alias("g"))
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    brute = (
        a.crossJoin(b)
        .where("doc_a < doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("ga", "gb")).alias("i"),
            (F.size("ga") + F.size("gb")).alias("s"),
        )
        .where("10 * i >= 5 * (s - i) and i > 0")
    )
    want = {(r.doc_a, r.doc_b) for r in brute.collect()}
    assert got == want and len(got) > 0


def test_containment_join_equals_brute_force(spark):
    """One-sided prefix filtering must lose NOTHING: output == all
    ordered pairs with |I∩O|/|I| >= t, including asymmetric cases
    Jaccard misses (a small doc fully inside a big one)."""
    import itertools

    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.dedup import containment_join
    from data_misc_tools_spark.operators.text import tokens

    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d"),              # fully inside 0
        (2, "a b c d x"),            # 4/5 = 0.8 in 0
        (3, "q r s t"),
        (4, "a q r s t u v w y z"),  # 3 is 4/4 inside 4
        (5, "a b"),                  # inside 0, 1, 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_inner, r.doc_outer): (r.inter, r.containment)
        for r in containment_join(df, num=8, den=10).collect()
    }
    toks = df.select("doc_id", F.explode(tokens("text")).alias("tok")).distinct()
    sets = {r.doc_id: set() for r in df.collect()}
    for r in toks.collect():
        sets[r.doc_id].add(r.tok)
    want = {}
    for i, o in itertools.permutations(sorted(sets), 2):
        inter = len(sets[i] & sets[o])
        if 10 * inter >= 8 * len(sets[i]):
            c = (20000 * inter + len(sets[i])) // (2 * len(sets[i])) / 10000.0
            want[(i, o)] = (inter, c)
    assert got == want
    assert got[(1, 0)][1] == 1.0           # full containment
    assert (0, 1) not in got               # direction matters
    assert got[(2, 0)][1] == 0.8           # threshold met exactly
    assert (3, 4) in got and (4, 3) not in got


def test_containment_join_completeness_on_fixture_corpus(spark, sf_dir):
    """On the documents table (3-word-gram sets): one-sided prefix
    output equals the quadratic ordered-pairs ground truth."""
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.dedup import containment_join
    from data_misc_tools_spark.session import load_tables

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    got = {
        (r.doc_inner, r.doc_outer)
        for r in containment_join(d, num=8, den=10, gram_n=3).collect()
    }
    base = d.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 2),"
            " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
        ).alias("g"),
    ).select("doc_id", F.array_distinct("g").alias("g"))
    i_ = base.select(F.col("doc_id").alias("doc_inner"), F.col("g").alias("gi"))
    o_ = base.select(F.col("doc_id").alias("doc_outer"), F.col("g").alias("go"))
    brute = (
        i_.crossJoin(o_)
        .where("doc_inner != doc_outer")
        .select(
            "doc_inner", "doc_outer",
            F.size(F.array_intersect("gi", "go")).alias("x"),
            F.size("gi").alias("szi"),
        )
        .where("10 * x >= 8 * szi and x > 0")
    )
    want = {(r.doc_inner, r.doc_outer) for r in brute.collect()}
    assert got == want and len(got) > 0


class TestWinnowing:
    @staticmethod
    def _ref_fps(text, k=5, w=8):
        import hashlib

        n = len(text) - k + 1
        if n < w:
            return set()
        comb = [
            int(hashlib.md5(text[p - 1:p - 1 + k].encode()).hexdigest()[:8], 16)
            * 65536 + (65535 - p)
            for p in range(1, n + 1)
        ]
        sels = {min(comb[s:s + w]) for s in range(0, n - w + 1)}
        return {(65535 - c % 65536, c // 65536) for c in sels}

    def test_selection_matches_python_reference(self, spark):
        import random
        import string

        from data_misc_tools_spark.operators.dedup import winnowing_fingerprints

        random.seed(9)
        docs = [
            (i, "".join(random.choice(string.ascii_lowercase + " ")
                        for _ in range(120)))
            for i in range(10)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {}
        for r in winnowing_fingerprints(df).collect():
            got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
        for i, t in docs:
            assert got.get(i, set()) == self._ref_fps(t), i

    def test_selection_matches_reference_across_window_widths(self, spark):
        """r11 doubling rewrite of the sliding-window minimum: the
        sparse-table form least(m_p[s], m_p[s+w-p]) must equal the
        quadratic reference for power-of-two widths (pure doubling),
        residual widths (the extra stitch pass), and the w=2 edge."""
        import random
        import string

        from data_misc_tools_spark.operators.dedup import winnowing_fingerprints

        random.seed(11)
        docs = [
            (i, "".join(random.choice(string.ascii_lowercase + " ")
                        for _ in range(90)))
            for i in range(6)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for w in (2, 3, 6, 8, 9):
            got = {}
            for r in winnowing_fingerprints(df, w=w).collect():
                got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
            for i, t in docs:
                assert got.get(i, set()) == self._ref_fps(t, w=w), (w, i)

    def test_shared_substring_guarantee(self, spark):
        """The winnowing contract: ANY pair sharing a substring of
        w + k − 1 characters shares at least one selected fingerprint
        VALUE — detection, not estimation."""
        import itertools
        import random
        import string

        from data_misc_tools_spark.operators.dedup import winnowing_match_pairs

        random.seed(9)
        shared = "the quick brown fox jumps over the lazy dog"
        docs = []
        for i in range(12):
            body = "".join(random.choice(string.ascii_lowercase + " ")
                           for _ in range(120))
            if i % 3 == 0:
                body = body[:40] + shared + body[40:]
            docs.append((i, body))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        pairs = {
            (r.doc_a, r.doc_b): r.n_shared
            for r in winnowing_match_pairs(df).collect()
        }
        sharing = [i for i, t in docs if shared in t]
        for a, b in itertools.combinations(sharing, 2):
            assert pairs.get((a, b), 0) >= 1, (a, b)

    def test_short_docs_yield_nothing_and_long_docs_raise(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.dedup import winnowing_fingerprints

        short = spark.createDataFrame(
            [(0, "tiny"), (1, "elevenchars")], "doc_id long, text string"
        )
        assert winnowing_fingerprints(short).count() == 0  # < k + w − 1
        big = spark.createDataFrame(
            [(0, "x" * 70_000)], "doc_id long, text string"
        )
        with _pytest.raises(ValueError, match="65535"):
            winnowing_fingerprints(big)

    def test_density_is_roughly_two_over_w(self, spark):
        """Sanity on the selection rate: ~2/(w+1) of positions selected
        on random text (Schleimer et al. §4) — pin a generous band."""
        import random
        import string

        from data_misc_tools_spark.operators.dedup import winnowing_fingerprints

        random.seed(4)
        text = "".join(random.choice(string.ascii_lowercase) for _ in range(2000))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        n_positions = len(text) - 4
        n_selected = winnowing_fingerprints(df, k=5, w=8).count()
        rate = n_selected / n_positions
        assert 0.1 < rate < 0.4, rate

    def test_cap_accounting_on_template_heavy_fixture(self, spark, sf_dir):
        """VERDICT r6 #5: the max_df cap must be auditable as data.
        On the documents fixture (the corpus whose ~30-word vocabulary
        makes fingerprints corpus-wide) a max_df=100 cap MUST drop
        fingerprints, and the dropped/kept pair bounds must partition
        the uncapped total exactly."""
        from data_misc_tools_spark.operators.dedup import (
            winnowing_cap_accounting,
            winnowing_match_pairs,
        )
        from data_misc_tools_spark.session import load_tables

        docs = load_tables(spark, sf_dir, ["documents"])["documents"]
        capped = winnowing_cap_accounting(docs, max_df=100).collect()[0]
        exact = winnowing_cap_accounting(docs, max_df=None).collect()[0]

        # the fixture is template-heavy: the cap is load-bearing here
        assert capped.dropped_fps > 0
        assert capped.dropped_pair_bound > capped.kept_pair_bound

        # dropped + kept partitions the exact-mode bound, and the
        # fingerprint census itself is cap-independent
        assert exact.dropped_fps == 0 and exact.dropped_pair_bound == 0
        assert (
            capped.dropped_pair_bound + capped.kept_pair_bound
            == exact.kept_pair_bound
        )
        assert (capped.n_fps, capped.n_doc_fp_rows) == (
            exact.n_fps,
            exact.n_doc_fp_rows,
        )

        # the kept bound upper-bounds the pairs the capped join emits
        n_pairs = winnowing_match_pairs(docs, max_df=100).count()
        assert n_pairs <= capped.kept_pair_bound


class TestSortedNeighborhood:
    def test_pairs_equal_brute_force_sliding_window(self, spark):
        import random

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.dedup import snm_candidate_pairs

        random.seed(2)
        rows = [
            (i, "".join(random.choice("ab") for _ in range(4)))
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "doc_id long, key string").repartition(7)
        got = {
            (r.doc_a, r.doc_b, r.gap)
            for r in snm_candidate_pairs(df, F.col("key"), window=4).collect()
        }
        order = [i for i, k in sorted(rows, key=lambda t: (t[1], t[0]))]
        ref = {
            (order[i], order[i + g], g)
            for i in range(len(order))
            for g in range(1, 4)
            if i + g < len(order)
        }
        assert got == ref
        assert len(got) == 3 * len(rows) - 6  # exact linear budget

    def test_window_2_is_adjacent_pairs_and_tiny_window_raises(self, spark):
        import pytest as _pytest

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.dedup import snm_candidate_pairs

        rows = [(i, str(9 - i)) for i in range(10)]  # key reverses id order
        df = spark.createDataFrame(rows, "doc_id long, key string")
        got = sorted(
            (r.doc_a, r.doc_b)
            for r in snm_candidate_pairs(df, F.col("key"), window=2).collect()
        )
        # sort order is ids 9..0 (key reverses), so each pair's doc_a
        # is the HIGHER id: (9,8)...(1,0), sorted ascending
        assert got == [(i + 1, i) for i in range(9)]
        with _pytest.raises(ValueError):
            snm_candidate_pairs(df, F.col("key"), window=1)


def test_winnowing_max_df_drops_only_hot_fingerprints(spark):
    """max_df must drop pairs owed ONLY to corpus-wide boilerplate:
    with the boilerplate fingerprint capped out, the unique-substring
    pair survives and the boilerplate-only pairs disappear."""
    from data_misc_tools_spark.operators.dedup import winnowing_match_pairs

    boiler = "common boilerplate header every document carries along"
    secret = "zq wvx kjy plm unique stolen passage xo"
    docs = [(i, boiler + f" body {i} " + ("x" * 30)) for i in range(8)]
    docs += [(100, boiler + " " + secret), (101, secret + " " + boiler)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b)
        for r in winnowing_match_pairs(df).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in winnowing_match_pairs(df, max_df=3).collect()
    }
    assert (100, 101) in exact and (100, 101) in capped  # df-2 fps survive
    assert capped < exact  # boilerplate-only pairs dropped
    assert all(not (a < 100 and b < 100) for a, b in capped)


class TestSuffixWindowSpans:
    """suffix_window_spans / duplicate_substring_docs (VERDICT r6 #2):
    Lee-et-al ExactSubstr — exact duplicate-substring detection via a
    range-partitioned suffix sort + adjacent-LCP comparison."""

    def _rand_words(self, rng, n):
        import string

        return " ".join(
            "".join(rng.choice(string.ascii_lowercase)
                    for _ in range(rng.randint(2, 7)))
            for _ in range(n)
        )

    def _brute(self, docs, min_len, window):
        """Quadratic Python reference: word-start suffixes, true max
        LCP vs every other suffix, capped at window."""
        sufs = []
        for i, t in docs:
            for p in range(len(t)):
                if t[p] != " " and (p == 0 or t[p - 1] == " "):
                    sufs.append((i, p + 1, t[p:]))
        exp = {}
        for a, (ia, pa, sa) in enumerate(sufs):
            if len(sa) < min_len:
                continue
            best = 0
            for b, (_, _, sb) in enumerate(sufs):
                if a == b:
                    continue
                l = 0
                while (l < len(sa) and l < len(sb) and sa[l] == sb[l]
                       and l < window):
                    l += 1
                best = max(best, l)
            if best >= min_len:
                exp[(ia, pa)] = min(best, window)
        return exp

    def test_matches_quadratic_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.dedup import suffix_window_spans

        for seed in (3, 17):
            rng = random.Random(seed)
            shared = "alpha beta gamma delta epsilon zeta"
            docs = []
            for i in range(12):
                body = self._rand_words(rng, 15)
                if i % 3 == 0:
                    # plant the shared span mid-document
                    body = body + " " + shared + " " + self._rand_words(rng, 5)
                docs.append((i, body))
            df = spark.createDataFrame(docs, "doc_id long, text string")
            got = {
                (r.doc_id, r.pos): r.match_len
                for r in suffix_window_spans(df, 10, 24).collect()
            }
            assert got == self._brute(docs, 10, 24), seed

    def test_intra_document_duplicates_count(self, spark):
        """'Anywhere else in the corpus' includes the SAME document —
        the Lee-et-al semantic (they dedup within documents too)."""
        from data_misc_tools_spark.operators.dedup import suffix_window_spans

        rep = "one two three four five"
        df = spark.createDataFrame(
            [(0, rep + " filler words here " + rep)],
            "doc_id long, text string",
        )
        got = {(r.doc_id, r.pos): r.match_len
               for r in suffix_window_spans(df, 10, 32).collect()}
        # both copies of the repeated span are flagged at their starts
        assert got[(0, 1)] == len(rep)
        assert got[(0, len(rep + " filler words here ") + 1)] == len(rep)

    def test_window_floors_long_matches(self, spark):
        from data_misc_tools_spark.operators.dedup import suffix_window_spans

        t = "exactly the same very long sentence appearing twice in full"
        df = spark.createDataFrame(
            [(0, t), (1, t)], "doc_id long, text string"
        )
        spans = {r.pos: r.match_len
                 for r in suffix_window_spans(df, 10, 16).collect()
                 if r.doc_id == 0}
        assert spans[1] == 16  # true match is len(t), floored at window

    def test_completeness_vs_repeated_ngram_removal(self, spark, sf_dir):
        """The relation pin (VERDICT r6 #2): every cross-occurrence
        token 8-gram that repeated_ngram_removal removes is, by
        construction, a duplicated substring starting at a word
        boundary — so suffix_window_spans at min_len <= the gram's
        char length must flag BOTH of its start positions. n-gram
        removal is the fixed-granularity approximation; the suffix
        scan is its exact superset at granularities in
        [min_len, window]."""
        from data_misc_tools_spark.operators.dedup import suffix_window_spans
        from data_misc_tools_spark.session import load_tables

        docs = (
            load_tables(spark, sf_dir, ["documents"])["documents"]
            .where("doc_id < 60")
            .select("doc_id", "text")
        )
        rows = docs.collect()
        n = 8
        occ = {}
        for r in rows:
            toks = [w for w in (r.text or "").split(" ") if w]
            # char start of each token
            starts, c = [], 0
            for w in (r.text or "").split(" "):
                if w:
                    starts.append(c)
                c += len(w) + 1
            for p in range(len(toks) - n + 1):
                gram = " ".join(toks[p:p + n])
                occ.setdefault(gram, []).append((r.doc_id, starts[p] + 1))
        MIN_LEN, WINDOW = 20, 64
        expected_hits = {
            (d, pos)
            for gram, where in occ.items()
            if len(where) >= 2 and MIN_LEN <= len(gram)
            for d, pos in where
        }
        assert expected_hits, "fixture has no repeated 8-grams — rewire"
        got = {
            (r.doc_id, r.pos): r.match_len
            for r in suffix_window_spans(docs, MIN_LEN, WINDOW).collect()
        }
        missing = expected_hits - set(got)
        assert not missing, sorted(missing)[:5]
        # and the reported length is at least the gram's length (capped)
        for gram, where in occ.items():
            if len(where) >= 2 and MIN_LEN <= len(gram):
                for d, pos in where:
                    assert got[(d, pos)] >= min(len(gram), WINDOW), (d, pos)

    def test_validation(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.dedup import suffix_window_spans

        df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="min_len"):
            suffix_window_spans(df, min_len=0)
        with _pytest.raises(ValueError, match="min_len"):
            suffix_window_spans(df, min_len=65, window=64)


class TestThresholdSweep:
    def test_matches_python_reference(self, spark):
        import collections
        import random

        from data_misc_tools_spark.operators.dedup import threshold_sweep

        rng = random.Random(79)
        pairs = sorted(
            {tuple(sorted(rng.sample(range(30), 2))) for _ in range(60)}
        )
        scored = [(a, b, rng.randrange(0, 10001)) for a, b in pairs]
        df = spark.createDataFrame(scored, "doc_a long, doc_b long, sim_e4 long")
        ts = [0, 2500, 5000, 7500, 10000]
        got = {
            r["threshold"]: (r["n_pairs"], r["n_docs"], r["max_degree"])
            for r in threshold_sweep(df, ts).collect()
        }
        for t in ts:
            kept = [(a, b) for a, b, s in scored if s >= t]
            deg = collections.Counter()
            for a, b in kept:
                deg[a] += 1
                deg[b] += 1
            want = (
                len(kept), len(deg), max(deg.values()) if deg else 0
            )
            assert got[t] == want, (t, got[t], want)
        # monotone: raising the threshold never adds pairs
        ns = [got[t][0] for t in ts]
        assert ns == sorted(ns, reverse=True)

    def test_empty_threshold_row_survives(self, spark):
        from data_misc_tools_spark.operators.dedup import threshold_sweep

        df = spark.createDataFrame([(1, 2, 100)], "doc_a long, doc_b long, sim_e4 long")
        got = {r["threshold"]: r["n_pairs"]
               for r in threshold_sweep(df, [50, 500]).collect()}
        assert got == {50: 1, 500: 0}

    def test_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.dedup import threshold_sweep

        df = spark.createDataFrame([(1, 2, 100)], "doc_a long, doc_b long, sim_e4 long")
        with _pytest.raises(ValueError):
            threshold_sweep(df, [])


class TestLshParameterPlan:
    @staticmethod
    def _ref(b, r, t):
        """Python mirror of the e6 chain: the num/den ratio must be
        float(num)/float(den) — two casts then one division, matching
        both engines' decimal->double route — NOT exact bigint
        true-division (one rounding)."""
        import math

        num = 1000**r - t**r
        den = 1000**r
        l_e6 = round(math.log(float(num) / float(den)) * 1e6)
        p_e6 = round((1.0 - math.exp((b * l_e6) / 1e6)) * 1e6)
        h_e6 = round(
            math.log(1.0 - math.exp(-693147.0 / (b * 1_000_000))) * 1e6
        )
        s_star_e6 = round(math.exp(h_e6 / (r * 1_000_000)) * 1e6)
        return p_e6, s_star_e6

    def test_curves_match_e6_reference_and_threshold(self, spark):
        from data_misc_tools_spark.operators.dedup import lsh_parameter_plan

        rows = lsh_parameter_plan(spark, [(2, 4), (16, 8)]).collect()
        for row in rows:
            p_e6, s_star_e6 = self._ref(
                row["bands"], row["rows_per_band"], row["s_permille"]
            )
            assert row["p_e6"] == p_e6
            assert row["s_star_e6"] == s_star_e6
        # the s-curve is monotone in s and crosses 0.5 near s_star
        for b, rr in ((2, 4), (16, 8)):
            curve = sorted(
                (r["s_permille"], r["p_e6"])
                for r in rows
                if r["bands"] == b and r["rows_per_band"] == rr
            )
            ps = [p for _, p in curve]
            assert ps == sorted(ps)
            s_star_e6 = next(
                r["s_star_e6"]
                for r in rows
                if r["bands"] == b and r["rows_per_band"] == rr
            )
            below = [p for t, p in curve if t * 1000 < s_star_e6 - 50_000]
            above = [p for t, p in curve if t * 1000 > s_star_e6 + 50_000]
            assert all(p < 500_000 for p in below)
            assert all(p > 500_000 for p in above)

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.dedup import lsh_parameter_plan

        with _pytest.raises(ValueError):
            lsh_parameter_plan(spark, [])
        with _pytest.raises(ValueError):
            lsh_parameter_plan(spark, [(0, 4)])
        with _pytest.raises(ValueError, match="> 12"):
            lsh_parameter_plan(spark, [(4, 16)])
        with _pytest.raises(ValueError, match="permille"):
            lsh_parameter_plan(spark, [(2, 4)], s_grid_permille=[1000])


class TestRougeNPairs:
    def test_clipped_counts_and_reference(self, spark):
        from data_misc_tools_spark.operators.dedup import rouge_n_pairs

        docs = spark.createDataFrame(
            [
                (1, "a b a b a b"),      # bigrams: ab x3, ba x2
                (2, "a b c"),            # ab, bc
                (3, "a b a b"),          # ab x2, ba x1
                (4, "x"),                # no bigrams -> drops
            ],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (1, 4)], "doc_a long, doc_b long"
        )
        got = {
            (r.doc_a, r.doc_b): r
            for r in rouge_n_pairs(pairs, docs, n=2).collect()
        }
        # (1,2): overlap = min(3,1)["a b"] = 1; n_a=5, n_b=2
        r = got[(1, 2)]
        assert (r.overlap, r.n_a, r.n_b) == (1, 5, 2)
        assert r.rouge_p == 1 / 5 and r.rouge_r == 1 / 2
        assert r.rouge_f1 == 2 / 7
        # (1,3): clipping credits ab min(3,2)=2 and ba min(2,1)=1
        r = got[(1, 3)]
        assert (r.overlap, r.n_a, r.n_b) == (3, 5, 3)
        assert r.rouge_f1 == 6 / 8
        # (2,3): only "a b" shared once
        assert got[(2, 3)].overlap == 1
        # doc 4 has no bigrams -> the pair drops (no denominator)
        assert (1, 4) not in got

    def test_n1_equals_clipped_unigram_and_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.dedup import rouge_n_pairs

        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "a b b c")], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        r = rouge_n_pairs(pairs, docs, n=1).collect()[0]
        # unigram clip: a min(2,1)=1, b min(1,2)=1 -> 2 of (3, 4)
        assert (r.overlap, r.n_a, r.n_b) == (2, 3, 4)
        with _pytest.raises(ValueError):
            rouge_n_pairs(pairs, docs, n=0)

"""BM25 retrieval: hand-computed tiny case, integer/float path rank
agreement, and plan shape (single corpus exchange, broadcast joins)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_misc_tools_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "cat sat on the mat"),
        (2, "cat cat dog"),
        (3, "dog runs fast"),
        (4, "the mat is flat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_ref(docs: list[tuple[int, str]], qtoks: list[str], k1=1.2, b=0.75):
    """Pure-python Okapi BM25 with Lucene idf (distinct query terms)."""
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for q in set(qtoks):
            tf = tk.count(q)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            out[i] = s
    return out


def test_bm25_scores_match_reference(spark, tiny):
    docs = [(r.doc_id, r.text) for r in tiny.collect()]
    q = R.queries_df(spark, [(1, "cat mat")])
    got = {r.doc_id: r.bm25 for r in R.bm25_scores(tiny, q).collect()}
    want = _bm25_ref(docs, ["cat", "mat"])
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_topk_matches_float_ranks(spark, tiny):
    q = R.queries_df(spark, [(1, "cat mat"), (2, "dog")])
    exact = R.bm25_topk(tiny, q, k=10).collect()
    flt = R.bm25_scores(tiny, q).collect()
    by_q_exact = {}
    for r in sorted(exact, key=lambda r: (r.query_id, r.rank)):
        by_q_exact.setdefault(r.query_id, []).append(r.doc_id)
    by_q_flt = {}
    for r in flt:
        by_q_flt.setdefault(r.query_id, []).append((-r.bm25, r.doc_id))
    for qid, docs in by_q_flt.items():
        assert by_q_exact[qid] == [d for _, d in sorted(docs)]
    # integer half-up score is within 1e-4 of the float score
    fmap = {(r.query_id, r.doc_id): r.bm25 for r in flt}
    for r in exact:
        assert r.bm25 == pytest.approx(fmap[(r.query_id, r.doc_id)], abs=2e-4)


def test_bm25_query_tf_weighting(spark, tiny):
    q = R.queries_df(spark, [(1, "cat cat mat")])
    plain = {r.doc_id: r.bm25 for r in R.bm25_scores(tiny, q).collect()}
    weighted = {
        r.doc_id: r.bm25
        for r in R.bm25_scores(tiny, q, weight_query_tf=True).collect()
    }
    # doc 2 has only 'cat' matches -> exactly doubled; doc 4 only 'mat' -> equal
    assert weighted[2] == pytest.approx(2 * plain[2], rel=1e-12)
    assert weighted[4] == pytest.approx(plain[4], rel=1e-12)


def test_bm25_empty_query_terms_absent_from_corpus(spark, tiny):
    q = R.queries_df(spark, [(1, "zebra")])
    assert R.bm25_topk(tiny, q).count() == 0


def test_bm25_plan_single_scan_and_broadcasts(spark, tiny):
    q = R.queries_df(spark, [(1, "cat mat")])
    plan = R.bm25_topk(tiny, q)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_inverted_index_query_equals_bm25_topk(spark, tmp_path, tiny):
    path = str(tmp_path / "invidx")
    R.inverted_index_build(tiny, path, n_buckets=16)
    q = R.queries_df(spark, [(1, "cat mat"), (2, "dog")])
    direct = sorted(
        (r.query_id, r.doc_id, r.rank, r.bm25)
        for r in R.bm25_topk(tiny, q, k=10).collect()
    )
    via_index = sorted(
        (r.query_id, r.doc_id, r.rank, r.bm25)
        for r in R.inverted_index_query(spark, path, q, k=10, n_buckets=16).collect()
    )
    assert via_index == direct


def test_inverted_index_append_equals_full_rebuild(spark, tmp_path):
    rows1 = [(i, f"alpha beta w{i} gamma") for i in range(10)]
    rows2 = [(100 + i, f"beta delta w{i} epsilon") for i in range(10)]
    d1 = spark.createDataFrame(rows1, "doc_id long, text string")
    d2 = spark.createDataFrame(rows2, "doc_id long, text string")
    both = d1.unionAll(d2)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    R.inverted_index_build(d1, inc, n_buckets=8)
    R.inverted_index_append(d2, inc, n_buckets=8)
    R.inverted_index_build(both, full, n_buckets=8)
    q = R.queries_df(spark, [(1, "beta delta"), (2, "alpha gamma")])
    a = sorted(map(tuple, R.inverted_index_query(spark, inc, q, n_buckets=8).collect()))
    b = sorted(map(tuple, R.inverted_index_query(spark, full, q, n_buckets=8).collect()))
    direct = sorted(map(tuple, R.bm25_topk(both, q).collect()))
    assert a == b == direct


def test_inverted_index_drift_lifecycle(spark, tmp_path):
    """Build -> zero-delta drift; append -> per-bucket added counts
    reconcile with the batch's postings, signed half-up growth, and
    max_df tracks the hottest term (the IVF drift contract applied to
    the text index)."""
    rows1 = [(i, f"alpha beta w{i}") for i in range(12)]
    rows2 = [(100 + i, "alpha alpha zeta") for i in range(6)]
    d1 = spark.createDataFrame(rows1, "doc_id long, text string")
    d2 = spark.createDataFrame(rows2, "doc_id long, text string")
    path = str(tmp_path / "drift")
    R.inverted_index_build(d1, path, n_buckets=4)

    base = R.inverted_index_drift(spark, path).collect()
    assert sum(r.n_postings_base for r in base) == 12 * 3  # 3 distinct toks/doc
    for r in base:
        assert r.added == 0 and r.growth_permille == 0
        assert r.n_terms_base == r.n_terms_now
        assert r.max_df_base == r.max_df_now

    R.inverted_index_append(d2, path, n_buckets=4)
    rep = R.inverted_index_drift(spark, path).collect()
    # batch postings: each of the 6 docs has 2 distinct toks (alpha, zeta)
    assert sum(r.added for r in rep) == 6 * 2
    for r in rep:
        assert r.n_postings_now == r.n_postings_base + r.added
        if r.n_postings_base > 0 and r.added >= 0:
            want = (2 * 1000 * r.added + r.n_postings_base) // (
                2 * r.n_postings_base
            )
            assert r.growth_permille == want
    # alpha's df rose 12 -> 18: its bucket's max_df must see it
    assert max(r.max_df_now for r in rep) == 18
    assert max(r.max_df_base for r in rep) == 12


def test_inverted_index_compact_preserves_queries(spark, tmp_path):
    """Compaction is layout-only: file count drops to files_per_bucket
    per bucket, and query results stay EQUAL to a fresh full rebuild
    (the append==rebuild contract survives the rewrite). Drift counts
    are unchanged too (content identity, not just top-k identity)."""
    rows1 = [(i, f"alpha beta w{i} gamma") for i in range(10)]
    rows2 = [(100 + i, f"beta delta w{i} epsilon") for i in range(10)]
    d1 = spark.createDataFrame(rows1, "doc_id long, text string")
    d2 = spark.createDataFrame(rows2, "doc_id long, text string")
    both = d1.unionAll(d2)
    inc, full = str(tmp_path / "cinc"), str(tmp_path / "cfull")
    R.inverted_index_build(d1, inc, n_buckets=4)
    for j in range(3):  # several appends -> many small files
        R.inverted_index_append(
            d2.filter((F.col("doc_id") % 3) == j), inc, n_buckets=4
        )
    R.inverted_index_build(both, full, n_buckets=4)

    pre = {
        (r.bucket, r.n_postings_now, r.n_terms_now, r.max_df_now)
        for r in R.inverted_index_drift(spark, inc).collect()
    }
    stats = R.inverted_index_compact(spark, inc, files_per_bucket=1)
    assert stats["postings_files_after"] <= stats["buckets"]
    assert stats["postings_files_after"] < stats["postings_files_before"]

    post = {
        (r.bucket, r.n_postings_now, r.n_terms_now, r.max_df_now)
        for r in R.inverted_index_drift(spark, inc).collect()
    }
    assert post == pre  # content identical

    q = R.queries_df(spark, [(1, "beta delta"), (2, "alpha gamma")])
    a = sorted(map(tuple, R.inverted_index_query(spark, inc, q, n_buckets=4).collect()))
    b = sorted(map(tuple, R.inverted_index_query(spark, full, q, n_buckets=4).collect()))
    assert a == b

    # files_per_bucket=2 splits on term hash, never row-splits a term
    stats2 = R.inverted_index_compact(spark, inc, files_per_bucket=2)
    assert stats2["postings_files_after"] <= 2 * stats2["buckets"]
    a2 = sorted(map(tuple, R.inverted_index_query(spark, inc, q, n_buckets=4).collect()))
    assert a2 == b


def test_inverted_index_scan_is_bucket_pruned(spark, tmp_path, tiny):
    path = str(tmp_path / "pruned")
    R.inverted_index_build(tiny, path, n_buckets=32)
    q = R.queries_df(spark, [(1, "cat")])
    plan = (
        R.inverted_index_query(spark, path, q, n_buckets=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "bucket" in seg


def test_term_e6_exact_beyond_int64(spark):
    """The per-term score arithmetic is decimal(38,0)-wide: products
    like 44 * idf_e6 * tf * total_len that overflow BIGINT (ANSI Spark
    would raise; non-ANSI would wrap) must still evaluate exactly
    (ADVICE r3). Compare against Python big-int half-up division."""
    cases = [
        # (idf_e6, tf, total_len, dl, n_docs) — last two exceed 2^63 products
        (20_000_000, 3, 1_000, 10, 5),
        (20_000_000, 100, 10**9, 500, 10**6),
        (45_000_000, 1_000, 10**12, 2_000, 10**9),
    ]
    df = spark.createDataFrame(
        cases, "idf_e6 long, tf long, total_len long, dl long, n_docs long"
    ).withColumn("den", R._den_dec()).withColumn("term_e6", R._term_e6())
    got = {tuple(r[:5]): r.term_e6 for r in df.collect()}
    for idf_e6, tf, total_len, dl, n_docs in cases:
        den = 10 * tf * total_len + 3 * total_len + 9 * dl * n_docs
        want = (2 * idf_e6 * 22 * tf * total_len + den) // (2 * den)
        assert got[(idf_e6, tf, total_len, dl, n_docs)] == want


class TestIRMetrics:
    def test_hand_computed_case(self, spark):
        """3 ranked docs, docs 2 and 3 relevant (gain 1):
        RR = 1/2; DCG = 1/log2(3) + 1/log2(4); IDCG = 1/1 + 1/log2(3)."""
        import math

        from data_misc_tools_spark.operators.retrieval import ir_metrics

        run = spark.createDataFrame(
            [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "query_id long, doc_id long, rank long"
        )
        qrels = spark.createDataFrame(
            [(1, 20, 1), (1, 30, 1)], "query_id long, doc_id long, gain long"
        )
        r = ir_metrics(run, qrels, k=10).head()
        assert r.rr_e6 == (2 * 1_000_000 + 2) // (2 * 2)  # half_up(1e6/2)
        dcg = round(1_000_000 / math.log2(3)) + round(1_000_000 / math.log2(4))
        idcg = 1_000_000 + round(1_000_000 / math.log2(3))
        assert r.dcg_e6 == dcg
        assert r.idcg_e6 == idcg
        assert r.ndcg_e4 == (2 * dcg * 10_000 + idcg) // (2 * idcg)

    def test_perfect_ranking_is_ndcg_10000(self, spark):
        from data_misc_tools_spark.operators.retrieval import ir_metrics

        run = spark.createDataFrame(
            [(1, 10, 1), (1, 20, 2)], "query_id long, doc_id long, rank long"
        )
        qrels = spark.createDataFrame(
            [(1, 10, 2), (1, 20, 1)], "query_id long, doc_id long, gain long"
        )
        r = ir_metrics(run, qrels, k=10).head()
        assert r.ndcg_e4 == 10_000    # ideal order achieved
        assert r.rr_e6 == 1_000_000   # first hit relevant

    def test_no_relevant_docs_yields_zero_rr_null_ndcg(self, spark):
        from data_misc_tools_spark.operators.retrieval import ir_metrics

        run = spark.createDataFrame(
            [(1, 10, 1)], "query_id long, doc_id long, rank long"
        )
        qrels = spark.createDataFrame(
            [(2, 99, 1)], "query_id long, doc_id long, gain long"
        )
        r = ir_metrics(run, qrels, k=10).head()
        assert r.rr_e6 == 0
        assert r.dcg_e6 == 0
        assert r.ndcg_e4 is None


class TestQLDirichlet:
    def test_matches_python_reference(self, spark):
        import math
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        from data_misc_tools_spark.operators.retrieval import (
            ql_dirichlet_topk,
            queries_df,
        )

        docs = [
            (0, "spark stream window join"),
            (1, "spark spark batch"),
            (2, "window window window stream"),
            (3, "hash join merge"),
            (4, "totally unrelated words here"),
        ]
        qs = [(1, "spark window"), (2, "join oov_term")]
        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        got = sorted(
            (r.query_id, r.doc_id, r.rank, r.ql_e6)
            for r in ql_dirichlet_topk(
                ddf, queries_df(spark, qs), k=10, mu=2000
            ).collect()
        )
        tokd = {i: t.split() for i, t in docs}
        big_c = sum(len(v) for v in tokd.values())
        ctf = Counter(t for v in tokd.values() for t in v)

        def hup(x):
            return int(Decimal(x).quantize(0, rounding=ROUND_HALF_UP))

        ref = []
        for qid, qtext in qs:
            terms = [t for t in sorted(set(qtext.split())) if ctf[t] > 0]
            cands = sorted(
                i for i in tokd if any(t in tokd[i] for t in terms)
            )
            scored = sorted(
                (
                    -sum(
                        hup(
                            math.log(
                                (tokd[d].count(t) * big_c + 2000 * ctf[t])
                                / (big_c * (len(tokd[d]) + 2000))
                            )
                            * 1e6
                        )
                        for t in terms
                    ),
                    d,
                )
                for d in cands
            )
            ref += [(qid, d, r, -s) for r, (s, d) in enumerate(scored, 1)]
        assert got == sorted(ref)
        # semantics pins: OOV term dropped (query 2 still returns docs);
        # non-matching doc 4 never ranked
        assert any(q == 2 for q, *_ in got)
        assert all(d != 4 for _, d, *_ in got)

    def test_background_cost_separates_partial_matches(self, spark):
        """A doc matching both query terms must outrank an equal-length
        doc matching one term with the same tf (the background term for
        the missing word is the penalty)."""
        from data_misc_tools_spark.operators.retrieval import (
            ql_dirichlet_topk,
            queries_df,
        )

        docs = [
            (0, "alpha beta filler filler"),
            (1, "alpha alpha filler filler"),
        ]
        qdf = queries_df(spark, [(1, "alpha beta")])
        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        rows = {r.doc_id: r.rank for r in ql_dirichlet_topk(ddf, qdf).collect()}
        assert rows[0] == 1 and rows[1] == 2


class TestRRFFuse:
    def test_pure_integer_terms_and_missing_doc_zero(self, spark):
        from data_misc_tools_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long"
        )
        b = spark.createDataFrame(
            [(1, 11, 1), (1, 12, 2)], "query_id long, doc_id long, rank long"
        )
        got = {
            r.doc_id: (r.rrf_e6, r.n_lists, r.rank)
            for r in rrf_fuse([a, b], k_rrf=60, top_k=10).collect()
        }

        def term(r):
            return (2 * 1_000_000 + (60 + r)) // (2 * (60 + r))

        assert got[11] == (term(2) + term(1), 2, 1)  # in both lists: wins
        assert got[10] == (term(1), 1, 2)
        assert got[12] == (term(2), 1, 3)

    def test_requires_at_least_one_list(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.retrieval import rrf_fuse

        with _pytest.raises(ValueError):
            rrf_fuse([])

    def test_fusion_promotes_cross_list_consensus(self, spark, sf_dir):
        """On the fixture corpus: every fused top-10 doc that appears
        in BOTH legs' top-20 must outrank any doc appearing in one."""
        from data_misc_tools_spark.operators import retrieval as R
        from data_misc_tools_spark.session import load_tables

        d = load_tables(spark, sf_dir, ["documents"])["documents"]
        q = R.queries_df(spark, [(1, "spark stream window")])
        b = R.bm25_topk(d, q, k=20).select("query_id", "doc_id", "rank")
        l = R.ql_dirichlet_topk(d, q, k=20).select("query_id", "doc_id", "rank")
        rows = R.rrf_fuse([b, l], top_k=20).collect()
        worst_both = min(
            (r.rank for r in rows if r.n_lists == 2), default=None
        )
        best_single = max(
            (r.rank for r in rows if r.n_lists == 1), default=None
        )
        if worst_both is not None and best_single is not None:
            # ranks: every 2-list doc above every 1-list doc is not
            # guaranteed in general (a rank-20+rank-20 pair can lose to
            # rank-1-single)... but with k_rrf=60, term(1)=16393 <
            # term(20)+term(20)=25000: consensus always wins. Pin it.
            assert all(
                r2.rank < r1.rank
                for r2 in rows if r2.n_lists == 2
                for r1 in rows if r1.n_lists == 1
            )

    def test_shared_leg_hybrid_equals_independent_legs(self, spark, sf_dir):
        """rrf_hybrid_bm25_ql (ONE pinned matched-tf relation + ONE
        corpus-totals scan shared by both scoring tails — the r10
        leg-sharing optimization) must be row-identical to fusing the
        two standalone retrievers."""
        from data_misc_tools_spark.operators import retrieval as R
        from data_misc_tools_spark.session import load_tables

        d = load_tables(spark, sf_dir, ["documents"])["documents"]
        q = R.queries_df(
            spark, [(1, "spark stream window"), (2, "hash join merge")]
        )
        b = R.bm25_topk(d, q, k=20).select("query_id", "doc_id", "rank")
        l = R.ql_dirichlet_topk(d, q, k=20).select("query_id", "doc_id", "rank")
        want = sorted(
            map(tuple, R.rrf_fuse([b, l], k_rrf=60, top_k=10).collect())
        )
        got = sorted(
            map(
                tuple,
                R.rrf_hybrid_bm25_ql(d, q, leg_k=20, top_k=10).collect(),
            )
        )
        assert got == want


def test_tfidf_top_terms_python_reference(spark):
    import math

    from data_misc_tools_spark.operators.retrieval import tfidf_top_terms

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana banana cherry"),
        (3, "durian cherry"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tfidf_top_terms(df, k=2).collect()
    # python reference with the same e6-rounded Lucene idf
    from collections import Counter

    tfs = {d: Counter(t.split()) for d, t in docs}
    dfs = Counter(w for c in tfs.values() for w in c)
    n = len(docs)

    def idf_e6(dfx):
        return round(math.log(1 + (n - dfx + 0.5) / (dfx + 0.5)) * 1e6)

    for r in out:
        assert r.tf == tfs[r.doc_id][r.term]
        assert r.df == dfs[r.term]
        assert r.score_e6 == r.tf * idf_e6(r.df)
    # rank-1 terms: the distinctive ones, not the common 'cherry'
    top1 = {r.doc_id: r.term for r in out if r.rank == 1}
    assert top1 == {1: "apple", 2: "banana", 3: "durian"}
    # exactly k rows per doc, ranks contiguous
    from collections import defaultdict

    ranks = defaultdict(list)
    for r in out:
        ranks[r.doc_id].append(r.rank)
    assert all(sorted(v) == [1, 2] for v in ranks.values())


def test_phrase_search_overlaps_and_repeats(spark):
    from data_misc_tools_spark.operators.retrieval import phrase_search

    docs = [
        (1, "a a a b"),          # "a a" overlaps: anchors 0 and 1
        (2, "the cat the dog"),  # repeated term in phrase
        (3, "cat the"),          # partial only
        (4, "x y z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in phrase_search(df, ["a", "a"]).collect()}
    assert out.keys() == {1}
    assert (out[1].n_matches, out[1].first_pos) == (2, 0)
    out = {
        r.doc_id: r for r in phrase_search(df, ["the", "cat", "the"]).collect()
    }
    assert out.keys() == {2}
    assert (out[2].n_matches, out[2].first_pos) == (1, 0)
    # single-term phrase degrades to term lookup with counts
    out = {r.doc_id: r for r in phrase_search(df, ["the"]).collect()}
    assert (out[2].n_matches, out[2].first_pos) == (2, 0)
    assert (out[3].n_matches, out[3].first_pos) == (1, 1)
    import pytest as _pt

    with _pt.raises(ValueError):
        phrase_search(df, [])


class TestBm25Prf:
    def _corpus(self, spark):
        docs = [
            (1, "spark join shuffle broadcast partition"),
            (2, "spark join broadcast hint small table"),
            (3, "shuffle broadcast partition skew salt"),   # no query term!
            (4, "cats dogs birds fish hamsters"),
            (5, "spark join spark join spark join"),
        ]
        return spark.createDataFrame(docs, "doc_id long, text string")

    def test_expansion_recovers_vocabulary_mismatch(self, spark):
        """Doc 3 shares NO term with the query but shares the feedback
        docs' vocabulary — round 1 cannot retrieve it, PRF must."""
        from data_misc_tools_spark.operators.retrieval import (
            bm25_prf_topk,
            bm25_topk,
            queries_df,
        )

        docs = self._corpus(spark)
        q = queries_df(spark, [(0, "spark join")])
        r1 = {r.doc_id for r in bm25_topk(docs, q, k=5).collect()}
        assert 3 not in r1
        r2 = {r.doc_id for r in
              bm25_prf_topk(docs, q, k=5, fb_docs=2, fb_terms=3).collect()}
        assert 3 in r2
        assert 4 not in r2  # the unrelated doc stays out

    def test_zero_feedback_terms_equals_plain_bm25(self, spark):
        from data_misc_tools_spark.operators.retrieval import (
            bm25_prf_topk,
            bm25_topk,
            queries_df,
        )

        docs = self._corpus(spark)
        q = queries_df(spark, [(0, "spark join"), (1, "cats dogs")])
        plain = {(r.query_id, r.doc_id, r.rank, r.bm25)
                 for r in bm25_topk(docs, q, k=5).collect()}
        prf = {(r.query_id, r.doc_id, r.rank, r.bm25)
               for r in bm25_prf_topk(docs, q, k=5, fb_terms=0).collect()}
        assert prf == plain

    def test_expansion_selection_matches_python_reference(self, spark):
        """Expansion terms = top fb_terms NEW terms by Σtf over the
        query's round-1 top fb_docs, ties lexicographic."""
        import collections

        from data_misc_tools_spark.operators.retrieval import (
            bm25_prf_topk,
            bm25_topk,
            queries_df,
        )

        docs = self._corpus(spark)
        rows = {r.doc_id: r.text for r in docs.collect()}
        q = queries_df(spark, [(0, "spark join")])
        fb = [r.doc_id for r in bm25_topk(docs, q, k=2).collect()]
        w = collections.Counter()
        for d in fb:
            for t in rows[d].split():
                if t not in ("spark", "join"):
                    w[t] += 1
        want = sorted(w, key=lambda t: (-w[t], t))[:3]
        # verify via the score difference: rerunning bm25 with the
        # reference-expanded query must equal bm25_prf_topk exactly
        q2 = queries_df(spark, [(0, " ".join(["spark", "join"] + want))])
        manual = {(r.doc_id, r.rank, r.bm25)
                  for r in bm25_topk(docs, q2, k=5).collect()}
        prf = {(r.doc_id, r.rank, r.bm25)
               for r in bm25_prf_topk(docs, q, k=5, fb_docs=2,
                                      fb_terms=3).collect()}
        assert prf == manual


class TestBm25F:
    def _ref(self, docs, qtoks, title_tokens=8, title_weight=3):
        """Float BM25F reference: weighted tf/dl at (k1=1.2, b=0.75)."""
        import math

        toks = {i: [t for t in txt.split() if t] for i, txt in docs}
        dl = {
            i: len(tk) + (title_weight - 1) * min(title_tokens, len(tk))
            for i, tk in toks.items() if tk
        }
        n = len(dl)
        avgdl = sum(dl.values()) / n
        out = {}
        for i, tk in toks.items():
            if not tk:
                continue
            s = 0.0
            for q in set(qtoks):
                tf = sum(
                    title_weight if p < title_tokens else 1
                    for p, t in enumerate(tk) if t == q
                )
                if tf == 0:
                    continue
                df = sum(1 for v in toks.values() if q in v)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl[i] / avgdl))
            if s > 0:
                out[i] = s
        return out

    def test_title_hit_outranks_body_hit(self, spark):
        # identical length (25 tokens) and tf (1), only POSITION differs
        docs = [
            (1, "cat " + ("pad " * 24).strip()),
            (2, ("pad " * 24) + "cat"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        q = R.queries_df(spark, [(1, "cat")])
        got = {r.doc_id: r.rank for r in R.bm25f_topk(df, q, k=10).collect()}
        assert got[1] < got[2]  # title occurrence wins
        # plain bm25 ties them (same tf, same dl)
        plain = {r.doc_id: r.bm25 for r in R.bm25_topk(df, q, k=10).collect()}
        assert plain[1] == plain[2]

    def test_ranks_match_float_reference(self, spark, tiny):
        docs = [(r.doc_id, r.text) for r in tiny.collect()]
        q = R.queries_df(spark, [(1, "cat mat"), (2, "dog")])
        exact = R.bm25f_topk(tiny, q, k=10).collect()
        for qid, qtoks in ((1, ["cat", "mat"]), (2, ["dog"])):
            want = self._ref(docs, qtoks)
            order = [i for i, _ in sorted(want.items(), key=lambda x: (-x[1], x[0]))]
            got = [r.doc_id for r in sorted(
                (r for r in exact if r.query_id == qid), key=lambda r: r.rank
            )]
            assert got == order

    def test_guards(self, spark, tiny):
        import pytest as _pytest

        q = R.queries_df(spark, [(1, "cat")])
        with _pytest.raises(ValueError, match=">= 1"):
            R.bm25f_topk(tiny, q, title_tokens=0)


class TestMinCoverSpan:
    def test_hand_cases_and_bruteforce(self, spark):
        from data_misc_tools_spark.operators.retrieval import min_cover_span

        docs = spark.createDataFrame(
            [
                (1, "a x b y c"),            # a..c -> span 5
                (2, "c b a"),                # any order -> 3
                (3, "a a a b c"),            # tight tail -> 3
                (4, "a b"),                  # missing c -> excluded
                (5, "x a y b z c a b c x"),  # trailing a b c -> 3
                (6, "c x x x a b x x c"),    # a b .. c vs c..a b -> 5
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_hits, r.min_span)
            for r in min_cover_span(docs, ["a", "b", "c"]).collect()
        }
        assert got[1] == (3, 5)
        assert got[2] == (3, 3)
        assert got[3] == (5, 3)
        assert 4 not in got
        assert got[5] == (6, 3)
        assert got[6] == (4, 5)

        # brute force on random streams
        import random

        rng = random.Random(5)
        rows = []
        for i in range(40):
            toks = [rng.choice("abcxyz") for _ in range(rng.randrange(1, 25))]
            rows.append((100 + i, " ".join(toks), toks))
        df = spark.createDataFrame(
            [(i, t) for i, t, _ in rows], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.min_span
            for r in min_cover_span(df, ["a", "b", "c"]).collect()
        }
        for i, _, toks in rows:
            best = None
            for lo in range(len(toks)):
                for hi in range(lo, len(toks)):
                    win = toks[lo : hi + 1]
                    if all(t in win for t in "abc"):
                        sp = hi - lo + 1
                        best = sp if best is None else min(best, sp)
                        break
            if best is None:
                assert i not in got
            else:
                assert got[i] == best, i

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.retrieval import min_cover_span

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            min_cover_span(df, [])
        with _pytest.raises(ValueError):
            min_cover_span(df, ["a", "a"])

    def test_single_term(self, spark):
        """The validator permits one term, but F.least asserts on < 2
        columns (ADVICE r9) — single-term spans are the constant 1
        wherever the term occurs."""
        from data_misc_tools_spark.operators.retrieval import min_cover_span

        docs = spark.createDataFrame(
            [(1, "x a y a"), (2, "a"), (3, "x y z")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_hits, r.min_span)
            for r in min_cover_span(docs, ["a"]).collect()
        }
        assert got == {1: (2, 1), 2: (1, 1)}

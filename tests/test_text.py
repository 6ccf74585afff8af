"""Text analysis operators."""

import pyspark.sql.functions as F

from data_misc_tools_spark.operators import text as T


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "a  b   c"), (2, " x "), (3, "one"), (4, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n for r in df.select("doc_id", T.token_count("text").alias("n")).collect()}
    assert out == {1: 3, 2: 1, 3: 1, 4: 0}  # runs of spaces don't create tokens


def test_bpeish_token_count(spark):
    df = spark.createDataFrame([(1, "Hello, world42!")], "doc_id long, text string")
    n = df.select(T.bpeish_token_count("text").alias("n")).first().n
    # hello , world 42 ! -> 5
    assert n == 5


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(1, "good clean text with several reasonable words here"),
         (2, "1234567890 9999 123456 00000"),
         (3, "!!!! ???? ....")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.quality_features(df).collect()}
    assert out[1].quality_score > out[2].quality_score
    assert out[1].quality_score > out[3].quality_score
    assert out[2].n_digits == 25
    assert out[1].n_tokens == 8
    assert 0.0 <= out[3].quality_score <= 1.0


def test_language_id_votes(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of a house"),
         (2, "der hund und die katze ist nicht da"),
         (3, "xyzzy plugh qwrt")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.lang_pred, r.stopword_hits) for r in T.language_id(df).collect()}
    assert out[1][0] == "en" and out[1][1] >= 4
    assert out[2][0] == "de"
    assert out[3] == ("und", 0)  # no stopword hits -> undetermined


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in T.fingerprint(df).collect()}
    assert fp[1] == fp[2]  # same token set (order/multiplicity-insensitive)
    assert fp[1] != fp[3]


def test_clean_text_collapses_whitespace(spark):
    from data_misc_tools_spark.operators.text import clean_text

    df = spark.createDataFrame(
        [(1, "  a\t\tb\n\nc  "), (2, "one two"), (3, "")], "id long, text string"
    )
    got = {r.id: r.c for r in df.select("id", clean_text("text").alias("c")).collect()}
    assert got == {1: "a b c", 2: "one two", 3: ""}


class TestUnigramNLL:
    def test_hand_computed_scores(self, spark):
        import math

        df = spark.createDataFrame(
            [(1, "a a b"), (2, "b c")], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_tokens, r.avg_nll)
            for r in T.unigram_nll_scores(df).collect()
        }
        # corpus: a:2 b:2 c:1, total 5
        nll = lambda p: round(-math.log(p) * 1e6)
        exp1 = round((2 * nll(0.4) + nll(0.4)) / 300 + 1e-9) / 1e4
        exp2 = round((nll(0.4) + nll(0.2)) / 200 + 1e-9) / 1e4
        assert got[1] == (3, exp1)
        assert got[2] == (2, exp2)
        # rare-token doc scores strictly worse (higher NLL)
        assert got[2][1] > got[1][1]

    def test_external_reference_model(self, spark):
        ref = spark.createDataFrame(
            [(1, "x x x y")], "doc_id long, text string"
        )
        target = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
        from data_misc_tools_spark.operators.text import tokens
        from pyspark.sql import functions as F

        freqs = (
            ref.select(F.explode(tokens("text")).alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("cnt"))
        )
        out = T.unigram_nll_scores(target, freqs=freqs).collect()
        assert out[0].n_tokens == 2
        # avg of -ln(0.75), -ln(0.25)
        import math
        e6 = round(-math.log(0.75) * 1e6) + round(-math.log(0.25) * 1e6)
        assert out[0].avg_nll == round(e6 / 200 + 1e-9) / 1e4

    def test_jvm_only_plan(self, spark):
        df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        plan = T.unigram_nll_scores(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [
            # 4 tokens, 2 distinct; "a b" occurs twice among 3 bigrams
            (1, "a b a b"),
            # all distinct, every bigram unique
            (2, "w x y z"),
            # single token: no bigrams, shares degenerate cleanly
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.repetition_signals(df).collect()}
    r1 = out[1]
    assert (r1.n_tokens, r1.n_distinct) == (4, 2)
    assert r1.dup_word_frac == 0.5       # (4-2)/4
    assert r1.top_word_share == 0.5      # max count 2 / 4
    assert r1.top_bigram_share == 0.6667  # "a b" 2 / 3 bigrams
    r2 = out[2]
    assert r2.dup_word_frac == 0.0
    assert r2.top_word_share == 0.25
    assert r2.top_bigram_share == 0.3333  # every bigram count 1 / 3
    r3 = out[3]
    assert (r3.n_tokens, r3.n_distinct) == (1, 1)
    assert r3.top_bigram_share == 0.0    # no bigrams at all


def test_repetition_signals_shuffle_variant_matches_narrow(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b a b c a", "x", "", "p q p q p q p", "m n o m n o"]
        )],
        "doc_id long, text string",
    )
    narrow = sorted(map(tuple, T.repetition_signals(df).collect()))
    shuffled = sorted(map(tuple, T.repetition_signals(df, shuffle=True).collect()))
    # the empty doc only appears in the narrow (non-exploding) variant
    narrow = [t for t in narrow if t[1] > 0]
    assert narrow == shuffled


def test_tfidf_topk_prefers_rare_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "common rare1 common"),
            (2, "common rare2"),
            (3, "common other"),
        ],
        "doc_id long, text string",
    )
    out = T.tfidf_topk(df, k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'common' is in every doc (df=3); the doc-unique term (df=1) wins
    # even against tf=2 of 'common': 1*3/1 > 2*3/3
    assert top == {1: "rare1", 2: "rare2", 3: "other"}
    r1 = next(r for r in out if r.doc_id == 1)
    assert (r1.tf, r1.df_docs, r1.score_e4) == (1, 1, 30000)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@mail.example.org now"),
            (2, "from 192.168.0.1 to 10.0.0.255 end"),
            (3, "call +4915112345678 today"),
            (4, "clean text no pii"),
            (5, "a@b.co and 1.2.3.4 and +1234567"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.pii_scrub(df).collect()}
    assert out[1].n_emails == 1 and out[1].redacted == "mail <EMAIL> now"
    assert out[2].n_ips == 2 and out[2].redacted == "from <IP> to <IP> end"
    assert out[3].n_phones == 1 and out[3].redacted == "call <PHONE> today"
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (0, 0, 0)
    assert out[4].redacted == "clean text no pii"
    assert out[5].redacted == "<EMAIL> and <IP> and <PHONE>"


class TestChunkDocuments:
    def test_chunks_match_python_reference(self, spark):
        """Exact chunk/text equality vs an independent Python slicer
        across doc lengths around every boundary (0, 1, max, max+1,
        stride multiples, +/-1 off the edges)."""
        import random

        from data_misc_tools_spark.operators.text import chunk_documents

        max_tokens, overlap = 8, 3
        stride = max_tokens - overlap
        rng = random.Random(7)
        lengths = sorted(
            {0, 1, 2, max_tokens - 1, max_tokens, max_tokens + 1,
             stride * 3, stride * 3 + 1, 40, 41, 57}
        )
        rows = []
        for n in lengths:
            words = [f"w{rng.randrange(100)}" for _ in range(n)]
            rows.append((n, " ".join(words)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got: dict[tuple, tuple] = {}
        for r in chunk_documents(
            df, max_tokens=max_tokens, overlap=overlap
        ).collect():
            got[(r.doc_id, r.chunk_id)] = (r.chunk_text, r.n_chunk_tokens)

        expected: dict[tuple, tuple] = {}
        for n, text in rows:
            toks = [t for t in text.split(" ") if t]
            if not toks:
                continue  # empty docs are dropped
            n_chunks = 1 if n <= max_tokens else 1 + -(-(n - max_tokens) // stride)
            for i in range(n_chunks):
                part = toks[i * stride: i * stride + max_tokens]
                expected[(n, i)] = (" ".join(part), len(part))
        assert got == expected

    def test_every_token_covered_no_gap_no_tail_loss(self, spark):
        from data_misc_tools_spark.operators.text import chunk_documents

        df = spark.createDataFrame(
            [(1, " ".join(str(i) for i in range(100)))], "doc_id long, text string"
        )
        chunks = sorted(
            (r.chunk_id, r.chunk_text.split(" "))
            for r in chunk_documents(df, max_tokens=24, overlap=8).collect()
        )
        seen = set()
        for _, toks in chunks:
            seen.update(int(t) for t in toks)
        assert seen == set(range(100))  # no token dropped
        # adjacent chunks overlap by exactly `overlap` tokens
        for (i1, t1), (_, t2) in zip(chunks, chunks[1:]):
            assert t1[-8:] == t2[:8] or len(t1) < 24


class TestGopherFilter:
    def test_each_rule_fires_with_its_name(self, spark):
        from data_misc_tools_spark.operators.text import gopher_filter

        good = "the quick brown fox and the lazy dog go to town in the morning"
        rows = [
            (1, good),                                         # keep
            (2, "short text"),                                 # too_few_words
            (3, " ".join(["ab"] * 12)),                        # mean_word_too_short
            (4, " ".join(["abcdefghijklmnop"] * 12)),          # mean_word_too_long
            (5, "the of " + " ".join(["1234"] * 10)),          # too_few_alpha_words
            (6, " ".join(f"word{i}" for i in range(12))),      # too_few_stopwords
            (7, "the of " + " ".join(["same"] * 30)),          # too_repetitive
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.keep, r.fail_reason) for r in gopher_filter(df).collect()}
        assert got[1] == (True, None)
        assert got[2] == (False, "too_few_words")
        assert got[3] == (False, "mean_word_too_short")
        assert got[4] == (False, "mean_word_too_long")
        assert got[5] == (False, "too_few_alpha_words")
        assert got[6] == (False, "too_few_stopwords")
        assert got[7] == (False, "too_repetitive")

    def test_first_failing_rule_wins(self, spark):
        from data_misc_tools_spark.operators.text import gopher_filter

        # fails word count AND stopwords: word-count rule is named
        df = spark.createDataFrame([(1, "xyzzy plugh")], "doc_id long, text string")
        r = gopher_filter(df).first()
        assert r.fail_reason == "too_few_words"


class TestBigramNll:
    def test_backoff_penalizes_shuffled_word_order(self, spark):
        """The signal unigram NLL cannot see: same words, shuffled
        order -> unseen bigrams -> backoff penalty -> higher NLL."""
        from data_misc_tools_spark.operators.text import bigram_nll_scores

        fluent = "the cat sat on the mat and the dog sat on the rug"
        words = fluent.split()
        shuffled = " ".join(reversed(words))
        ref = spark.createDataFrame(
            [(i, fluent) for i in range(10)], "doc_id long, text string"
        )
        target = spark.createDataFrame(
            [(100, fluent), (101, shuffled)], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.avg_nll
            for r in bigram_nll_scores(target, model_df=ref).collect()
        }
        assert got[101] > got[100]

    def test_self_fit_never_backs_off_and_matches_counts(self, spark):
        from data_misc_tools_spark.operators.text import bigram_nll_scores

        df = spark.createDataFrame(
            [(1, "a b a b a"), (2, "c")], "doc_id long, text string"
        )
        out = {r.doc_id: (r.n_tokens, r.avg_nll) for r in
               bigram_nll_scores(df).collect()}
        assert out[1][0] == 5 and out[2][0] == 1
        # single-token doc: unigram only; c appears once of 6 tokens
        import math

        want = round(round(-math.log(1 / 6) * 1e6) / 100) / 10000 * 1.0
        assert abs(out[2][1] - want) < 2e-4


def test_strip_html_scripts_entities_and_order(spark):
    from data_misc_tools_spark.operators.text import strip_html

    cases = [
        (1, '<p>hello <b>world</b></p>', "hello world"),
        # script body with a bare '<' must vanish wholesale
        (2, 'a<script>if (1 < 2) x();</script>b', "a b"),
        (3, '<style media="x">p > a {}</style>text', "text"),
        (4, 'keep<!-- <b>not this</b> -->me', "keep me"),
        # &amp; decodes LAST: '&amp;lt;' is the literal string '&lt;'
        (5, '&amp;lt; &lt; &quot;q&#39; &nbsp;', '&lt; < "q\''),
        (6, 'multi   \n\t space', "multi space"),
        (7, '<SCRIPT>upper</SCRIPT><P>case</P>', "case"),
    ]
    df = spark.createDataFrame([(i, h) for i, h, _ in cases], "i long, html string")
    got = {r.i: r.t for r in df.select("i", strip_html("html").alias("t")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


class TestBPE:
    """Distributed BPE training vs a pure-Python reference (Sennrich
    formulation: word-type counts, argmax adjacent pair, greedy
    non-overlapping replacement)."""

    CORPUS = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest"),
        (4, "widest widest widest"),
        (5, "low lower newest widest"),
    ]

    @staticmethod
    def _ref_bpe(texts, n_merges, min_count=2):
        from collections import Counter

        words = Counter()
        for t in texts:
            for w in t.split():
                words[tuple(list(w.lower()) + ["</w>"])] += 1
        merges = []
        for _ in range(n_merges):
            pairs = Counter()
            for syms, c in words.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += c
            if not pairs:
                break
            # (count desc, pair lexicographic asc) — the tiebreak the
            # distributed version pins for determinism
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < min_count:
                break
            (a, b) = best[0]
            merges.append((a, b))
            new_words = Counter()
            for syms, c in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_words[tuple(out)] += c
            words = new_words
        return merges

    def test_train_matches_reference(self, spark):
        from data_misc_tools_spark.operators.bpe import bpe_train

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        got = bpe_train(df, n_merges=12)
        want = self._ref_bpe([t for _, t in self.CORPUS], 12)
        assert got == want
        assert len(got) >= 8  # corpus supports a real merge sequence

    def test_train_matches_reference_on_documents_sample(self, spark, sf_dir):
        from data_misc_tools_spark.operators.bpe import bpe_train
        from data_misc_tools_spark.session import load_tables

        docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(80)
        texts = [r.text for r in docs.collect()]
        got = bpe_train(docs, n_merges=8)
        assert got == self._ref_bpe(texts, 8)

    def test_segment_consistent_with_training_state(self, spark):
        from data_misc_tools_spark.operators.bpe import bpe_segment, bpe_train

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        merges = bpe_train(df, n_merges=12)
        seg = {r.doc_id: (r.bpe_tokens, r.n_bpe_tokens)
               for r in bpe_segment(df, merges).collect()}
        toks, n = seg[1]
        assert n == len(toks)
        # 'low' appears 7 times corpus-wide -> fully merged to one unit
        assert toks == ["low</w>"] * 5
        # every word reassembles to its original characters
        for doc_id, text in self.CORPUS:
            joined = "".join(seg[doc_id][0]).replace("</w>", "")
            assert joined == text.replace(" ", "")

    def test_segment_unseen_words_fall_back_to_chars(self, spark):
        from data_misc_tools_spark.operators.bpe import bpe_segment, bpe_train

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        merges = bpe_train(df, n_merges=12)
        new = spark.createDataFrame([(9, "zqx low")], "doc_id long, text string")
        (row,) = bpe_segment(new, merges).collect()
        assert row.bpe_tokens[-1] == "low</w>"
        assert row.bpe_tokens[:-1] == ["z", "q", "x", "</w>"]


def test_pmi_collocations_ranks_glued_pair_first(spark):
    from data_misc_tools_spark.operators.text import pmi_collocations

    # "san francisco" always adjacent; fillers independent
    docs = [(i, "san francisco " + " ".join(
        ["alpha", "beta", "gamma", "delta"][(i + j) % 4] for j in range(6)
    )) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5, k=10).collect()
    assert out[0].bigram == "san francisco" and out[0].rank == 1
    assert out[0].c_xy == 40
    # PMI of the glued pair beats any filler pair
    assert all(out[0].pmi > r.pmi for r in out[1:])


def test_card_scan_luhn(spark):
    from data_misc_tools_spark.operators.text import card_scan

    rows = [
        (1, "pay with 4539 1488 0343 6467 today"),   # valid (16, spaced)
        (2, "ref 4539 1488 0343 6468 is wrong"),      # bad check digit
        (3, "amex 3782 822463 10005 ok"),             # valid (15)
        (4, "no digits here"),
        (5, "short 1234 5678 run"),                   # 8 digits: below 13, skipped
        (6, "dash 6011-0009-9013-9424 discover"),     # valid (dashes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.card): r.luhn for r in card_scan(df).collect()}
    assert got == {
        (1, "4539148803436467"): True,
        (2, "4539148803436468"): False,
        (3, "378282246310005"): True,
        (6, "6011000990139424"): True,
    }


def test_luhn_valid_expression(spark):
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.text import luhn_valid

    # python reference implementation
    def ref(d):
        tot = 0
        for i, ch in enumerate(reversed(d), start=1):
            v = int(ch)
            tot += v if i % 2 == 1 else (v * 2 - 9 if v * 2 > 9 else v * 2)
        return tot % 10 == 0

    cases = ["4111111111111111", "79927398713", "79927398710", "1234567890123",
             "4539148803436467", "378282246310005"]
    df = spark.createDataFrame([(c,) for c in cases], "card string")
    got = {r.card: r.ok for r in df.select("card", luhn_valid(F.col("card")).alias("ok")).collect()}
    assert got == {c: ref(c) for c in cases}


def test_nfc_normalize_composes_and_keeps_nulls(spark):
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.text import nfc_normalize

    rows = [(1, "Café"), (2, "Café"), (3, None), (4, "Å")]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got = {r.doc_id: r.n for r in df.select(
        "doc_id", nfc_normalize("s").alias("n")
    ).collect()}
    assert got[1] == got[2] == "Café"   # composed == already-composed
    assert got[3] is None
    assert got[4] == "Å"                 # A + ring -> Å
    # the dedup motivation: identical visible strings hash identically
    # only AFTER normalization
    assert "Café" != "Café" and len(got[1]) == 4


class TestScoreCutoffGuard:
    def test_continuous_score_raises_instead_of_flooding_driver(self, spark):
        """A continuous double score (distinct count ~ n) must refuse
        the histogram walk (ADVICE r4): the collect is LIMIT-bounded,
        so the driver never materializes more than max_distinct+1
        rows before the error."""
        import pytest

        df = spark.range(200).selectExpr("id", "id * 0.123456789 AS s")
        with pytest.raises(ValueError, match="distinct"):
            T.score_cutoff(df, "s", max_distinct=50)

    def test_rounded_score_still_exact_through_guard(self, spark):
        df = spark.range(100).selectExpr("(id % 10) * 1.0 AS s")
        # 75th percentile of 0..9 uniform: smallest s with cum*4 >= 3*n
        assert T.score_cutoff(df, "s", max_distinct=50) == 7.0


class TestNgramNovelty:
    def test_counts_and_ratio(self, spark):
        from data_misc_tools_spark.operators.text import ngram_novelty_scores

        docs = [
            (0, "a b c d e"),
            (1, "a b c x y"),
            (2, "p q r s t"),
            (3, "a b"),  # shorter than n -> no row
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_grams, r.n_novel, r.novelty)
            for r in ngram_novelty_scores(df, n=3).collect()
        }

        def h4(a, b):
            return (20000 * a + b) // (2 * b) / 10000.0

        assert got == {
            0: (3, 2, h4(2, 3)),  # "a b c" shared with doc 1
            1: (3, 2, h4(2, 3)),
            2: (3, 3, 1.0),       # fully novel
        }
        assert 3 not in got

    def test_exact_duplicates_score_zero(self, spark):
        from data_misc_tools_spark.operators.text import ngram_novelty_scores

        docs = [(0, "x y z w v u"), (1, "x y z w v u")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r.novelty for r in ngram_novelty_scores(df, n=3).collect()}
        assert got == {0: 0.0, 1: 0.0}


def test_readability_scores_python_reference(spark):
    import re

    from data_misc_tools_spark.operators.text import readability_scores

    docs = [
        (1, "The cat sat on the mat. It was happy! Was it? Yes."),
        (2, "no punctuation here just a stream of words"),
        (3, ""),  # degenerate: zero words/syllables, clamps to 1
        (5, None),  # NULL text == empty document, not NULL scores
        (4, "Readability testing requires polysyllabic vocabulary."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in readability_scores(df).collect()}

    def half_up(a, b):
        return (2 * a + b) // (2 * b)

    for doc_id, text in docs:
        text = text or ""
        s = len(re.findall(r"[.!?]+", text))
        w = len(re.findall(r"\S+", text))
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        sc, wc = max(s, 1), max(w, 1)
        flesch = (206835 - half_up(1015 * wc, sc) - half_up(84600 * y, wc)) / 1000.0
        fk = (half_up(390 * wc, sc) + half_up(11800 * y, wc) - 15590) / 1000.0
        r = got[doc_id]
        assert (r.n_sentences, r.n_words, r.n_syllables) == (s, w, y)
        assert (r.flesch, r.fk_grade) == (flesch, fk)
    # sanity: simple prose reads easier than the polysyllabic one
    assert got[1].flesch > got[4].flesch
    assert got[4].fk_grade > got[1].fk_grade


def test_keyness_llr_python_reference(spark):
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.text import keyness_llr

    focus_docs = ["spark spark shuffle join", "spark codegen shuffle", "join spark"]
    rest_docs = ["pandas loop loop", "loop pandas join", "pandas join join loop"]
    rows = [(i, t, True) for i, t in enumerate(focus_docs)] + [
        (100 + i, t, False) for i, t in enumerate(rest_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_focus boolean")
    got = {
        r.term: r
        for r in keyness_llr(
            df, F.col("is_focus"), min_count=2, k=50
        ).collect()
    }

    ca = Counter(w for t in focus_docs for w in t.split())
    cb = Counter(w for t in rest_docs for w in t.split())
    na, nb = sum(ca.values()), sum(cb.values())
    ln6 = lambda x: round(math.log(x) * 1e6)
    for term in set(ca) | set(cb):
        a, b = ca[term], cb[term]
        if a + b < 2:
            assert term not in got
            continue
        ta = a * (ln6(a) + ln6(na + nb) - ln6(na) - ln6(a + b)) if a else 0
        tb = b * (ln6(b) + ln6(na + nb) - ln6(nb) - ln6(a + b)) if b else 0
        want = 2 * (ta + tb) / 1e6
        r = got[term]
        assert (r.c_focus, r.c_rest) == (a, b)
        assert r.llr == want
        assert r.enriched == ("focus" if a * (na + nb) > na * (a + b) else "rest")
    # direction sanity: spark is a focus keyword, pandas a rest keyword
    assert got["spark"].enriched == "focus" and got["pandas"].enriched == "rest"
    # one-sided terms (b=0 or a=0) rank above balanced ones like join
    assert got["spark"].llr > got["join"].llr
    assert got["loop"].llr > got["join"].llr
    ranks = sorted((r.rank, r.term) for r in got.values())
    assert [t for _, t in ranks[:1]] != [] and ranks[0][0] == 1


class TestCorpusDiversity:
    def _ref(self, docs):
        import collections
        import math

        out = {}
        by_g = collections.defaultdict(list)
        for g, t in docs:
            by_g[g].append([w for w in t.split(" ") if w])
        for g, toklists in by_g.items():
            uni = collections.Counter(w for t in toklists for w in t)
            big = collections.Counter(
                f"{t[i]} {t[i + 1]}"
                for t in toklists
                for i in range(len(t) - 1)
            )
            n = sum(uni.values())
            v = len(uni)
            hs = sum(
                c * (round(math.log(n) * 1e6) - round(math.log(c) * 1e6))
                for c in uni.values()
            )
            ss = sum(c * (c - 1) for c in uni.values())
            n2 = sum(big.values())
            v2 = len(big)
            out[g] = dict(
                n_tokens=n,
                n_types=v,
                ttr_e6=(2 * 1_000_000 * v + n) // (2 * n),
                entropy_e6=(2 * hs + n) // (2 * n),
                simpson_e6=None if n < 2 else
                (2 * 1_000_000 * ss + n * (n - 1)) // (2 * n * (n - 1)),
                n_bigrams=n2,
                n_bigram_types=v2,
                distinct2_e6=None if n2 == 0 else
                (2 * 1_000_000 * v2 + n2) // (2 * n2),
            )
        return out

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.text import corpus_diversity

        rng = random.Random(17)
        vocab = [f"w{i}" for i in range(40)]
        docs = [
            (
                "g" + str(i % 3),
                " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))),
            )
            for i in range(200)
        ]
        df = spark.createDataFrame(docs, "lang string, text string")
        ref = self._ref(docs)
        got = corpus_diversity(df, "text", "lang").collect()
        assert len(got) == len(ref)
        for r in got:
            e = ref[r["group"]]
            for k, want in e.items():
                assert r[k] == want, (r["group"], k, r[k], want)

    def test_degenerate_extremes(self, spark):
        from data_misc_tools_spark.operators.text import corpus_diversity

        df = spark.createDataFrame(
            [
                ("mono", "a a a a a a"),       # one type: entropy 0, simpson 1
                ("all_new", "a b c d e f"),    # all distinct: ttr 1, simpson 0
                ("single", "x"),               # 1 token: simpson NULL, no bigrams
            ],
            "lang string, text string",
        )
        got = {r["group"]: r for r in corpus_diversity(df, "text", "lang").collect()}
        assert got["mono"]["entropy_e6"] == 0
        assert got["mono"]["simpson_e6"] == 1_000_000
        assert got["mono"]["ttr_e6"] == (2 * 1_000_000 * 1 + 6) // 12
        assert got["all_new"]["ttr_e6"] == 1_000_000
        assert got["all_new"]["simpson_e6"] == 0
        assert got["single"]["simpson_e6"] is None
        assert got["single"]["n_bigrams"] == 0
        assert got["single"]["distinct2_e6"] is None


class TestRakeKeywords:
    def _ref(self, docs, stops):
        import collections

        phrases = []
        for _id, text in docs:
            toks = [w for w in text.split(" ") if w]
            cur = []
            for w in toks:
                if w in stops:
                    if cur:
                        phrases.append(tuple(cur))
                    cur = []
                else:
                    cur.append(w)
            if cur:
                phrases.append(tuple(cur))
        deg = collections.Counter()
        freq = collections.Counter()
        for p in phrases:
            for w in p:
                deg[w] += len(p)
                freq[w] += 1
        ws = {
            w: (2 * 1_000_000 * deg[w] + freq[w]) // (2 * freq[w])
            for w in freq
        }
        out = collections.defaultdict(lambda: [0, 0, 0])
        for p in phrases:
            k = " ".join(p)
            out[k][0] = len(p)
            out[k][1] += 1
            out[k][2] = sum(ws[w] for w in p)
        return {k: tuple(v) for k, v in out.items()}

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.text import rake_keywords

        rng = random.Random(23)
        stops = ["the", "of", "and"]
        vocab = ["deep", "learning", "model", "data", "pipeline", "spark"]
        docs = [
            (
                i,
                " ".join(
                    rng.choice(stops + vocab) for _ in range(rng.randrange(3, 25))
                ),
            )
            for i in range(80)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        ref = self._ref(docs, set(stops))
        got = {
            r["phrase"]: (r["n_words"], r["n_occurrences"], r["score_e6"])
            for r in rake_keywords(df, stops).collect()
        }
        assert got == ref

    def test_multiword_phrase_outranks_members(self, spark):
        """The RAKE property: a recurring multi-word term scores above
        its isolated member words."""
        from data_misc_tools_spark.operators.text import rake_keywords

        docs = [
            (1, "deep learning of the model"),
            (2, "deep learning and model"),
            (3, "model the deep learning"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["phrase"]: r["score_e6"]
            for r in rake_keywords(df, ["the", "of", "and"]).collect()
        }
        assert got["deep learning"] > got["model"]

    def test_empty_stopwords_raise(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.text import rake_keywords

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            rake_keywords(df, [])


class TestVocabOovRate:
    def _role(self, doc_id, salt="vocab"):
        import hashlib

        return int(
            hashlib.md5((salt + str(doc_id)).encode()).hexdigest()[:8], 16
        ) % 2

    def test_matches_python_reference(self, spark):
        import collections
        import random

        from data_misc_tools_spark.operators.text import vocab_oov_rate

        rng = random.Random(29)
        vocab = [f"w{i:02d}" for i in range(30)]
        # zipf-ish draws so the top-k vocab is meaningful
        docs = [
            (
                i,
                "g" + str(i % 2),
                " ".join(
                    vocab[min(int(rng.expovariate(0.2)), 29)]
                    for _ in range(rng.randrange(5, 40))
                ),
            )
            for i in range(300)
        ]
        df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
        k = 8
        train = collections.Counter(
            w
            for i, _, t in docs
            if self._role(i) == 0
            for w in t.split(" ")
            if w
        )
        top = {
            w
            for w, _ in sorted(train.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        }
        ref = {}
        for i, g, t in docs:
            if self._role(i) != 1:
                continue
            ws = [w for w in t.split(" ") if w]
            r = ref.setdefault(g, [0, 0])
            r[0] += len(ws)
            r[1] += sum(1 for w in ws if w not in top)
        got = {
            r["group"]: r
            for r in vocab_oov_rate(df, k, group_col="lang").collect()
        }
        assert set(got) == set(ref)
        for g, (n, oov) in ref.items():
            assert got[g]["n_tokens"] == n
            assert got[g]["n_oov"] == oov
            assert got[g]["oov_e6"] == (2 * 1_000_000 * oov + n) // (2 * n)

    def test_full_budget_zero_oov(self, spark):
        from data_misc_tools_spark.operators.text import vocab_oov_rate

        docs = [(i, "a b c a") for i in range(50)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = vocab_oov_rate(df, 100).collect()[0]
        assert r["group"] == "all" and r["n_oov"] == 0 and r["oov_e6"] == 0

    def test_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.text import vocab_oov_rate

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            vocab_oov_rate(df, 0)


class TestJsdPairs:
    def _ref(self, docs):
        import collections
        import math

        E6_LN2 = 693147
        cnt = collections.defaultdict(collections.Counter)
        for g, t in docs:
            cnt[g].update(w for w in t.split(" ") if w)
        out = {}
        gs = sorted(cnt)
        for i, ga in enumerate(gs):
            for gb in gs[i + 1:]:
                ca, cb = cnt[ga], cnt[gb]
                n1, n2 = sum(ca.values()), sum(cb.values())
                sa = sb = sc = sd = 0
                for w in set(ca) & set(cb):
                    c, d = ca[w], cb[w]
                    ln_mix = round(math.log(c * n2 + d * n1) * 1e6)
                    sa += c * (round(math.log(2 * c * n2) * 1e6) - ln_mix)
                    sb += d * (round(math.log(2 * d * n1) * 1e6) - ln_mix)
                    sc += c
                    sd += d
                A = sa + E6_LN2 * (n1 - sc)
                B = sb + E6_LN2 * (n2 - sd)
                num = A * n2 + B * n1
                den = 2 * n1 * n2
                out[(ga, gb)] = (n1, n2, (2 * num + den) // (2 * den))
        return out

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.text import jsd_pairs

        rng = random.Random(67)
        vocab = [f"w{i}" for i in range(25)]
        docs = []
        for i in range(150):
            g = "g" + str(i % 3)
            # group-specific skew so JSD is non-trivial
            lo = (i % 3) * 5
            docs.append(
                (g, " ".join(
                    vocab[min(lo + int(rng.expovariate(0.3)), 24)]
                    for _ in range(rng.randrange(3, 25))
                ))
            )
        df = spark.createDataFrame(docs, "lang string, text string")
        got = {
            (r["group_a"], r["group_b"]): (r["n_a"], r["n_b"], r["jsd_e6"])
            for r in jsd_pairs(df, "text", "lang").collect()
        }
        assert got == self._ref(docs)

    def test_identical_and_disjoint_extremes(self, spark):
        from data_misc_tools_spark.operators.text import E6_LN2, jsd_pairs

        docs = [
            ("a", "x x y z"), ("b", "x x y z"),      # identical dists
            ("c", "p q p r"),                         # disjoint from a/b
        ]
        df = spark.createDataFrame(docs, "lang string, text string")
        got = {
            (r["group_a"], r["group_b"]): r["jsd_e6"]
            for r in jsd_pairs(df, "text", "lang").collect()
        }
        assert got[("a", "b")] == 0
        assert got[("a", "c")] == E6_LN2  # exactly ln 2
        assert got[("b", "c")] == E6_LN2
        # bounded
        assert all(0 <= v <= E6_LN2 for v in got.values())


class TestTermDispersion:
    def test_matches_python_reference(self, spark):
        from fractions import Fraction

        from data_misc_tools_spark.operators.text import term_dispersion

        docs = [
            (1, "a a a b c"),
            (2, "a b b d"),
            (3, "c c c c c c"),
            (4, "a b"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.word: r for r in term_dispersion(df, top_k=10).collect()}
        toks = {i: t.split() for i, t in docs}
        L = sum(len(v) for v in toks.values())
        words = {w for v in toks.values() for w in v}
        for w in words:
            tf = sum(v.count(w) for v in toks.values())
            dp = sum(
                abs(Fraction(v.count(w), tf) - Fraction(len(v), L))
                for v in toks.values()
            ) / 2
            e6 = (2 * 1_000_000 * dp.numerator + dp.denominator) // (
                2 * dp.denominator
            )
            r = got[w]
            assert r.tf == tf
            assert r.n_docs_w == sum(1 for v in toks.values() if w in v)
            assert r.dp_e6 == e6, w

    def test_even_vs_bursty_extremes(self, spark):
        from data_misc_tools_spark.operators.text import term_dispersion

        # 'x' spread exactly like doc sizes -> DP 0; 'z' one doc -> high
        docs = [(1, "x x z z z z"), (2, "x x pad pad pad pad")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.word: r.dp_e6 for r in term_dispersion(df, top_k=10).collect()}
        assert got["x"] == 0
        assert got["z"] == 500_000  # |1 - 1/2|/2 + |0 - 1/2|/2

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

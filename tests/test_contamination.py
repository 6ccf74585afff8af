"""Decontamination: n-gram overlap detection between train and eval."""

import pytest
from pyspark.sql import functions as F

from data_misc_tools_spark.operators import contamination as C


@pytest.fixture(scope="module")
def corpora(spark):
    eval_rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "pack my box with five dozen liquor jugs"),
    ]
    train_rows = [
        # verbatim copy of eval doc 100 -> fully contaminated
        (1, "the quick brown fox jumps over the lazy dog"),
        # contains a 5-word run of eval doc 101 -> partial overlap
        (2, "we pack my box with five dozen things every day"),
        # disjoint vocabulary -> clean
        (3, "alpha beta gamma delta epsilon zeta eta theta iota"),
        # shorter than n words -> produces no grams at all
        (4, "too few"),
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(train_rows), mk(eval_rows)


def test_word_ngram_hashes_counts_and_short_doc_drop(corpora):
    train, _ = corpora
    grams = C.word_ngram_hashes(train, n=4).groupBy("doc_id").count()
    got = {r.doc_id: r["count"] for r in grams.collect()}
    # 9-word docs have 6 distinct 4-grams; the 2-word doc vanishes
    assert got == {1: 6, 2: 7, 3: 6}
    assert 4 not in got


def test_contamination_pairs_thresholds(corpora):
    train, ev = corpora
    # 10% threshold: verbatim copy AND the 5-word-run doc both flag
    pairs = {
        (r.train_doc, r.eval_doc): (r.n_overlap, r.n_eval)
        for r in C.contamination_pairs(train, ev, n=4, threshold_times=10).collect()
    }
    assert pairs[(1, 100)] == (6, 6)  # full overlap
    assert pairs[(2, 101)] == (3, 5)  # "pack my box with five dozen" -> 3 of 5 grams
    assert len(pairs) == 2  # doc 3 (clean) and doc 4 (short) never flag
    # strict threshold (100%): only the verbatim copy survives
    strict = {
        (r.train_doc, r.eval_doc)
        for r in C.contamination_pairs(train, ev, n=4, threshold_times=1).collect()
    }
    assert strict == {(1, 100)}


def test_decontaminate_removes_only_flagged(corpora):
    train, ev = corpora
    kept = {r.doc_id for r in C.decontaminate(train, ev, n=4).collect()}
    assert kept == {3, 4}
    # schema is preserved
    assert C.decontaminate(train, ev).columns == train.columns


def test_eval_side_is_broadcast(corpora):
    train, ev = corpora
    plan = C.contamination_pairs(train, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_semantic_contamination_flags_paraphrase(spark):
    from data_misc_tools_spark.operators.contamination import semantic_contamination

    # train 10,11 are near-copies of eval 1; train 12 orthogonal;
    # train 13 is a near-copy of eval 2
    ev = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    tr = spark.createDataFrame(
        [
            (10, [0.999, 0.02, 0.0]),
            (11, [0.998, 0.03, 0.0]),
            (12, [0.0, 0.0, 1.0]),
            (13, [0.01, 0.997, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r.train_id: (r.eval_id, r.sim) for r in semantic_contamination(
        tr, ev, threshold=0.95
    ).collect()}
    assert set(got) == {10, 11, 13}
    assert got[10][0] == 1 and got[11][0] == 1 and got[13][0] == 2
    assert all(s >= 0.95 for _, s in got.values())
    # scrub = left-anti join on the flags
    flags = semantic_contamination(tr, ev, threshold=0.95).select(
        "train_id"
    ).withColumnRenamed("train_id", "vec_id")
    clean = tr.join(flags, "vec_id", "left_anti").collect()
    assert [r.vec_id for r in clean] == [12]

"""Cross-document repeated n-gram removal: keeper rule, overlap
coverage, short-doc passthrough, full-removal reassembly."""

from __future__ import annotations

import pytest

from data_misc_tools_spark.operators.dedup import repeated_ngram_removal


def _run(spark, rows, n=4, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_ngram_removal(df, n=n, **kw).collect()
    return {r.doc_id: r for r in out}


def test_identical_docs_keep_first_only(spark):
    text = "a b c d e f"
    got = _run(spark, [(1, text), (2, text)], n=4)
    assert got[1].cleaned_text == text and got[1].n_removed == 0
    assert got[2].cleaned_text == "" and got[2].n_removed == 6
    assert got[2].n_tokens == 6


def test_within_doc_repeat_keeps_first_occurrence(spark):
    # 4-gram "a b c d" at pos 0 and pos 4; grams spanning the boundary
    # (pos 1..3) are unique, so only pos 4..7 are covered.
    got = _run(spark, [(1, "a b c d a b c d")], n=4)
    assert got[1].cleaned_text == "a b c d"
    assert got[1].n_removed == 4


def test_short_docs_pass_through(spark):
    got = _run(spark, [(1, "a b c"), (2, "a b c")], n=4)
    assert got[1].cleaned_text == "a b c" and got[1].n_removed == 0
    assert got[2].cleaned_text == "a b c" and got[2].n_removed == 0


def test_unique_corpus_untouched(spark):
    rows = [(1, "p q r s t"), (2, "u v w x y")]
    got = _run(spark, rows, n=4)
    for i, text in rows:
        assert got[i].cleaned_text == text and got[i].n_removed == 0


def test_overlapping_duplicate_spans_union_coverage(spark):
    # doc 2 shares a 5-token prefix with doc 1 -> two duplicated
    # 4-grams at pos 0 and 1 whose coverage unions to pos 0..4.
    got = _run(spark, [(1, "a b c d e x y"), (2, "a b c d e p q")], n=4)
    assert got[1].n_removed == 0
    assert got[2].cleaned_text == "p q"
    assert got[2].n_removed == 5


def test_min_count_threshold(spark):
    text = "a b c d"
    got = _run(spark, [(1, text), (2, text)], n=4, min_count=3)
    assert got[2].n_removed == 0
    got = _run(spark, [(1, text), (2, text), (3, text)], n=4, min_count=3)
    assert got[2].n_removed == 4 and got[3].n_removed == 4
    assert got[1].n_removed == 0


def test_position_overflow_raises_not_corrupts(spark):
    # 20 tokens with max_tokens=16 -> positions reach 16 (= max_tokens)
    # for n=4, which would collide keys across documents; the key
    # expression must raise instead of silently electing wrong
    # survivors (ADVICE r3).
    long_text = " ".join(f"t{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, long_text), (2, long_text)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="max_tokens"):
        repeated_ngram_removal(df, n=4, max_tokens=16).collect()


def test_doc_slightly_over_max_tokens_cannot_collide(spark):
    # size = max_tokens + 2 with n = 4: max pos = size - n = 14 <
    # max_tokens, so no collision is possible and the run succeeds.
    text = " ".join(f"u{i}" for i in range(18))
    got = _run(spark, [(1, text)], n=4, max_tokens=16)
    assert got[1].n_removed == 0 and got[1].cleaned_text == text

"""Unigram-LM tokenizer: EM likelihood monotonicity, coverage,
segmentation behavior, determinism."""

from __future__ import annotations

import math

import pytest

from data_misc_tools_spark.operators.unigram_lm import (
    _forward_backward,
    _viterbi,
    unigram_segment,
    unigram_train,
)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_forward_backward_hand_case():
    # word "ab" under pieces {a, b, ab}: two segmentations.
    p = {"a": math.log(0.4), "b": math.log(0.4), "ab": math.log(0.2)}
    exp, ll = _forward_backward("ab", 1.0, p, max_len=2)
    z = 0.4 * 0.4 + 0.2
    assert ll == pytest.approx(math.log(z))
    assert exp["ab"] == pytest.approx(0.2 / z)
    assert exp["a"] == pytest.approx(0.16 / z)
    assert exp["b"] == pytest.approx(0.16 / z)


def test_em_likelihood_nondecreasing_and_vocab_size(spark):
    rows = ["abab abab cdcd", "abab cdcd cdcd", "ab cd abab"] * 10
    trace: list = []
    pieces = unigram_train(
        _corpus(spark, rows),
        vocab_size=8,
        seed_size=20,
        max_piece_len=4,
        em_iters=3,
        min_count=1,
        ll_trace=trace,
    )
    # EM guarantee within each 3-iteration phase
    for i in range(len(trace) - 1):
        if i % 3 != 2:  # don't compare across a prune boundary
            assert trace[i + 1] >= trace[i] - 1e-9
    chars = {p for p in pieces if len(p) == 1}
    assert {"a", "b", "c", "d"} <= chars
    assert len([p for p in pieces if len(p) > 1]) <= 8
    # the dominant repeated chunks should survive pruning
    assert "abab" in pieces or "ab" in pieces
    # log-probs normalize
    assert sum(math.exp(lp) for lp in pieces.values()) == pytest.approx(1.0, abs=1e-6)


def test_viterbi_prefers_high_prob_pieces():
    p = {"a": math.log(0.05), "b": math.log(0.05), "ab": math.log(0.9)}
    assert _viterbi("abab", p, 2) == ["ab", "ab"]
    assert _viterbi("aba", p, 2) == ["ab", "a"]
    # unseen characters fall back to single chars
    assert _viterbi("xy", p, 2) == ["x", "y"]


def test_segment_covers_text_and_is_deterministic(spark):
    rows = ["the cat sat", "the mat sat", "cat mat the"] * 5
    df = _corpus(spark, rows)
    pieces = unigram_train(
        df, vocab_size=12, seed_size=30, max_piece_len=3, em_iters=2, min_count=1
    )
    out = unigram_segment(df, pieces, max_piece_len=3).collect()
    for r in out:
        assert "".join(r.pieces) == r.text.replace(" ", "")
    again = unigram_segment(df.repartition(4), pieces, max_piece_len=3).collect()
    a = {r.doc_id: r.pieces for r in out}
    b = {r.doc_id: r.pieces for r in again}
    assert a == b


def test_unigram_train_rejects_zero_em_iters(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="em_iters"):
        unigram_train(df, em_iters=0)

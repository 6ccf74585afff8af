"""Naive-Bayes char-trigram classifier: pure-python parity and
separable-corpus accuracy."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from data_misc_tools_spark.operators.classify import nb_predict, nb_train


def _py_nb(train: list[tuple[str, str]], tests: list[str], n=3):
    """Reference: same add-one multinomial NB with e6-integer weights."""
    cg: dict[str, Counter] = {}
    ndocs = Counter()
    for label, text in train:
        ndocs[label] += 1
        cg.setdefault(label, Counter()).update(
            text[i:i + n] for i in range(len(text) - n + 1)
        )
    vocab = {g for c in cg.values() for g in c}
    vn = len(vocab)
    total = sum(ndocs.values())
    out = []
    for text in tests:
        grams = [text[i:i + n] for i in range(len(text) - n + 1)]
        grams = [g for g in grams if g in vocab]
        best = None
        for label in sorted(cg):
            t_c = sum(cg[label].values())
            prior = round(math.log(ndocs[label] / total) * 1e6)
            dflt = round(math.log(1.0 / (t_c + vn)) * 1e6)
            s = prior
            for g in grams:
                c = cg[label][g]
                s += round(math.log((c + 1) / (t_c + vn)) * 1e6) if c else dflt
            if best is None or s > best[0] or (s == best[0] and label < best[1]):
                best = (s, label)
        out.append(best[1] if best else None)
    return out


def test_nb_matches_python_reference_and_separates(spark):
    train = [
        ("fish", "salmon swims in the river"),
        ("fish", "trout swims under water"),
        ("fish", "the salmon and the trout swim"),
        ("bird", "sparrow flies over trees"),
        ("bird", "the eagle flies high above"),
        ("bird", "a sparrow and an eagle fly"),
    ]
    tests = [
        (1, "the trout swims"),
        (2, "an eagle flies over the river"),
        (3, "salmon under water"),
        (4, "sparrow in the trees"),
    ]
    tr = spark.createDataFrame(train, "lang string, text string")
    te = spark.createDataFrame(tests, "doc_id long, text string")
    cls, w = nb_train(tr, "lang")
    got = {r.doc_id: r.predicted for r in nb_predict(te, cls, w).collect()}
    want = _py_nb(train, [t for _, t in tests])
    assert [got[i] for i, _ in tests] == want
    assert got[1] == "fish" and got[2] == "bird"
    assert got[3] == "fish" and got[4] == "bird"


def test_nb_prior_dominates_empty_overlap(spark):
    # test doc sharing no vocab trigram -> prediction falls to priors
    train = [("a", "xxxxxxxx"), ("a", "xxxxxxxx"), ("b", "yyyyyyyy")]
    tr = spark.createDataFrame(train, "lang string, text string")
    te = spark.createDataFrame([(1, "zzzzzz")], "doc_id long, text string")
    cls, w = nb_train(tr, "lang")
    out = nb_predict(te, cls, w).collect()
    # no in-vocab grams at all -> doc has no n_d row; absent by contract
    assert out == []

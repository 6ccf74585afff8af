"""Distributed multinomial naive Bayes over character n-grams.

Classifier-based corpus filtering is the other half of data selection
(DSIR is the log-linear feature variant; GPT-3/LLaMA-style pipelines
train a lightweight quality/language classifier and score every
document). This trains multinomial NB with add-one smoothing entirely
as DataFrame aggregates and scores with one broadcast join — no ML
runtime, no Python in the scoring path.

Engine-exact scoring (the DSIR/NLL idiom): all log weights are
e6-scaled BIGINTs of quotients of exact integer products, per-doc
scores are integer sums, and the argmax tie-breaks on the class name —
so a DuckDB twin reproduces predictions hash-exactly.

Scale shape:

* Training: one (class, ngram) count aggregate (vocabulary-bounded
  output) + one class-count aggregate. The weight table is
  |classes| x |vocab| at most — broadcastable for any realistic
  character-n-gram vocabulary (< ~1M rows).
* Scoring uses the decomposition
      score(d, c) = prior(c) + n_d·def(c) + Σ_t c_dt·(w(c,t) − def(c))
  where def(c) is the unseen-in-class smoothed weight and n_d counts
  the doc's n-grams present in the global vocabulary: one broadcast
  join on the n-gram + one per-doc aggregate, never a per-(doc,class)
  dense matrix.
* Prediction: max_by(class, (score, class)) — a plain grouped argmax.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["char_ngrams", "nb_train", "nb_predict"]


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """All character n-grams of a string (array<string>; empty when
    shorter than n). Narrow per-row transform."""
    t = F.col(text) if isinstance(text, str) else text
    return _grams(t, n)


def _grams(t: Column, n: int) -> Column:
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.expr("array()"))


def nb_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB with add-one smoothing on character
    ``n``-grams. Returns (class_table, weight_table):

    class_table:  (label, n_docs, prior_e6, def_e6, t_c)
        prior_e6 = round(ln(n_docs_c / n_docs) * 1e6)
        def_e6   = round(ln(1 / (t_c + V)) * 1e6)   # unseen-in-class
    weight_table: (label, gram, diff_e6)
        diff_e6  = round(ln((c+1)) ... ) − def_e6 as one e6 term:
                   round(ln((c_ct + 1) / (t_c + V)) * 1e6) − def_e6
    where t_c = total n-gram count of class c and V = |global vocab|.
    """
    from data_misc_tools_spark.operators.util import spread as _spread

    # _spread before the ~length(text)-x gram explode (r11): a
    # single-file corpus scan otherwise runs the whole train gram
    # materialization on one task (guide §2.5 input skew)
    toks = _spread(df).select(
        F.col(label_col).alias("label"),
        F.explode(_grams(F.col(text_col), n)).alias("gram"),
    )
    # materialize the (class, ngram) counts once: every downstream
    # model table (class totals, weights, vocab) and the scoring join
    # branch off it, and without truncation each branch re-scans the
    # training corpus (measured: 14 scans / 35 exchanges in the demo
    # plan). Vocabulary-bounded — small by construction.
    cg = (
        toks.groupBy("label", "gram")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint()
    )
    vocab_n = cg.select("gram").distinct().count()
    cls = (
        cg.groupBy("label")
        .agg(F.sum("c").cast("long").alias("t_c"))
        .join(
            df.groupBy(F.col(label_col).alias("label")).agg(
                F.count("*").cast("long").alias("n_docs")
            ),
            "label",
        )
    )
    total_docs = df.count()
    cls = cls.select(
        "label",
        "n_docs",
        "t_c",
        F.round(F.log(F.col("n_docs").cast("double") / total_docs) * 1e6)
        .cast("long")
        .alias("prior_e6"),
        F.round(F.log(F.lit(1.0) / (F.col("t_c") + vocab_n)) * 1e6)
        .cast("long")
        .alias("def_e6"),
    )
    weights = (
        cg.join(cls.select("label", "t_c", "def_e6"), "label")
        .select(
            "label",
            "gram",
            (
                F.round(
                    F.log((F.col("c") + 1).cast("double") / (F.col("t_c") + vocab_n))
                    * 1e6
                ).cast("long")
                - F.col("def_e6")
            ).alias("diff_e6"),
        )
    )
    # materialize the finished model too: nb_predict references
    # weights twice (vocab + scoring join) and cls twice (scoring +
    # any caller-side confusion/report branch), and although cg is
    # checkpointed, each reference still re-runs the join/log above —
    # measured 29 exchanges on the train+predict+confusion demo plan.
    # Both tables are model-sized (|classes| and |classes| x |vocab|),
    # so the checkpoint is a broadcast-scale materialization.
    return cls.localCheckpoint(eager=True), weights.localCheckpoint(eager=True)


def nb_predict(
    df: DataFrame,
    cls: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Score and argmax: (id_col, predicted, score_e6). Deterministic —
    integer scores, ties broken by smaller label string.

    Drop contract: documents whose text contains ZERO in-vocab
    n-grams produce NO output row (they never enter ``n_d``, so the
    argmax has nothing to rank — pinned by
    test_nb_prior_dominates_empty_overlap). Callers that must keep
    every input row should left-join the predictions back onto the
    input ids and treat NULL as "no evidence" (a prior-only argmax is
    a one-liner on ``cls``: the label with the max ``prior_e6``)."""
    from data_misc_tools_spark.operators.util import spread as _spread

    # the nb_train single-file-input guard (r11, guide §2.5)
    toks = _spread(df).select(
        F.col(id_col), F.explode(_grams(F.col(text_col), n)).alias("gram")
    )
    vocab = weights.select("gram").distinct()
    # per-doc counts of IN-VOCAB n-grams only (out-of-vocab n-grams
    # carry no signal under shared smoothing and drop out of the argmax)
    dt = (
        toks.join(F.broadcast(vocab), "gram")
        .groupBy(id_col, "gram")
        .agg(F.count("*").cast("long").alias("k"))
    )
    n_d = dt.groupBy(id_col).agg(F.sum("k").cast("long").alias("n_d"))
    seen = (
        dt.join(F.broadcast(weights), "gram")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("k") * F.col("diff_e6")).alias("s_seen"))
    )
    full = (
        n_d.crossJoin(F.broadcast(cls.select("label", "prior_e6", "def_e6")))
        .join(seen, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("prior_e6")
                + F.col("n_d") * F.col("def_e6")
                + F.coalesce(F.col("s_seen"), F.lit(0))
            ).alias("score_e6"),
        )
    )
    return full.groupBy(id_col).agg(
        F.min_by(
            F.col("label"), F.struct((-F.col("score_e6")).alias("s"), F.col("label"))
        ).alias("predicted"),
        F.max("score_e6").alias("score_e6"),
    )

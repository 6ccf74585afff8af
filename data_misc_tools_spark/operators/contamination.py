"""Benchmark decontamination: word-n-gram overlap between a training
corpus and an evaluation set.

The standard LLM-pipeline hygiene step (WebText/GPT-3-style 8-gram
decontamination, scaled down to the synthetic corpus): a training
document is contaminated if it shares at least a threshold fraction of
an eval document's distinct word n-grams.

Design notes for 100 TB:

- N-gram sets are built per row with array lambdas (transform +
  array_distinct) — the distinct-within-document step costs ZERO
  shuffle, unlike exploding raw grams and running a global DISTINCT.
- The eval side is small by construction (benchmarks are KBs–MBs, the
  corpus is TBs), so eval grams BROADCAST into the train-side scan:
  the only shuffle in the whole operator is the groupBy on matched
  (train_doc, eval_doc) pairs, which is bounded by actual overlap,
  not corpus size.
- The contamination threshold is integer math
  (``threshold_times * overlap >= n_eval``) so the oracle comparison
  can never flip on a double boundary.
- Hashing is md5-derived for engine portability (same idiom as
  operators/dedup.py); swap for xxhash64 off the oracle path.

reference: no equivalent — this engine adds decontamination as a
first-class operator alongside the dedup suite (SURVEY §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngram_hashes(
    df: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct word-n-gram md5 hashes per document: (id_col, gh).

    Whitespace-tokenize, slide an n-word window, hash each gram, and
    deduplicate INSIDE the row (array_distinct) before exploding —
    map-only, no shuffle. Documents shorter than n words are dropped
    up front (also keeps sequence() ascending: sequence(1, 0) would
    count DOWN and fabricate grams).
    """
    w = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.md5(F.array_join(F.slice(w, i, n), " ")),
    )
    return df.filter(F.size(w) >= n).select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gh")
    )


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 4,
    threshold_times: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contaminated (train_doc, eval_doc) pairs with overlap counts.

    A pair is reported when ``threshold_times * n_overlap >= n_eval``
    — e.g. the default 10 means "the training document contains at
    least 10% of the eval document's distinct n-grams". Output:
    (train_doc, eval_doc, n_overlap, n_eval), ordered by
    (n_overlap DESC, train_doc, eval_doc).

    The eval side is broadcast; pass eval sets, not corpora.
    """
    tg = word_ngram_hashes(train, n, text_col, id_col).select(
        F.col(id_col).alias("train_doc"), "gh"
    )
    eg = word_ngram_hashes(eval_df, n, text_col, id_col).select(
        F.col(id_col).alias("eval_doc"), "gh"
    )
    esz = eg.groupBy("eval_doc").agg(F.count("*").alias("n_eval"))
    return (
        tg.join(F.broadcast(eg), "gh")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_overlap"))
        .join(F.broadcast(esz), "eval_doc")
        .filter(F.lit(threshold_times) * F.col("n_overlap") >= F.col("n_eval"))
        .select(
            "train_doc",
            "eval_doc",
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.col("n_eval").cast("long").alias("n_eval"),
        )
        .orderBy(F.desc("n_overlap"), "train_doc", "eval_doc")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 4,
    threshold_times: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training corpus minus contaminated documents (anti-join on the
    flagged train ids). Keeps the full train schema."""
    flagged = contamination_pairs(
        train, eval_df, n, threshold_times, text_col, id_col
    ).select(F.col("train_doc").alias(id_col)).distinct()
    return train.join(F.broadcast(flagged), id_col, "left_anti")


def semantic_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: a training vector is flagged
    when its cosine similarity to ANY eval vector meets ``threshold``
    — the semantic complement of n-gram :func:`contamination_pairs`
    (paraphrased or reformatted benchmark leakage survives n-gram
    checks but not an embedding match; both passes together are the
    current hygiene standard).

    Plan: eval embeddings BROADCAST into one pass over the training
    corpus (eval sets are KBs-MBs; the corpus is the big side), argmax
    via max_by over the 4dp-rounded cosine with ties to the smaller
    eval id — no shuffle wider than |train|. Cosines round to 4dp in
    the proven cosine_neardup_pairs oracle idiom.

    Output: one row per TRAIN vector that matched —
    (id_col, eval_id, sim, contaminated=true is implicit in presence);
    callers left-anti-join to scrub. eval rows never appear as train.
    """
    from data_misc_tools_spark.operators.similarity import dot, l2_normalize

    t = train.select(
        F.col(id_col).alias("train_id"), l2_normalize(F.col(vec_col)).alias("__tv")
    )
    e = eval_df.select(
        F.col(id_col).alias("eval_id"), l2_normalize(F.col(vec_col)).alias("__ev")
    )
    scored = (
        t.join(F.broadcast(e))
        .select(
            "train_id",
            "eval_id",
            F.round(dot(F.col("__tv"), F.col("__ev")), 4).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
    return scored.groupBy("train_id").agg(
        F.min_by(
            F.col("eval_id"), F.struct((-F.col("sim")).alias("s"), F.col("eval_id"))
        ).alias("eval_id"),
        F.max("sim").alias("sim"),
    )

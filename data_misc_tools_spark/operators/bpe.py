"""Distributed BPE vocabulary induction and segmentation.

The engine already ESTIMATES BPE token counts for budgeting
(operators/text.py bpeish_token_count); this module actually LEARNS a
merge table from the corpus and segments text with it — the
tokenizer-training step of a pretraining data pipeline (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"; the reference has no counterpart — extension surface).

Spark-first decomposition:

* Training statistics live on the WORD-TYPE table, not the corpus:
  one corpus-wide tokenize+groupBy produces (word, count), after
  which every merge round touches only distinct words (≪ corpus; the
  100 TB corpus is read exactly once).
* Each round: adjacent-pair counts via a weighted explode + one
  map-side-combined hash agg over word types; the argmax pair comes
  back to the driver as a SINGLE row (top-1 TakeOrdered — bounded,
  deterministic via (count desc, pair asc) tiebreak); the merge is
  applied map-only with a higher-order ``aggregate`` fold (greedy
  left-to-right non-overlapping, exactly re.sub semantics in the
  reference implementation) — no Python in any per-row path.
* The word table is ``localCheckpoint``-ed every round: it is
  referenced by the next round's plan, and without truncation the
  lineage DOUBLES per merge (same invariant as operators/cluster.py's
  iterative CC — ~8 un-truncated rounds OOM the driver on explain).
* Segmentation (:func:`bpe_segment`) applies the learned ranks with
  an Arrow-batched pandas UDF — the merge loop is inherently
  sequential per word, the textbook justified-UDF case; the rank
  dict broadcasts once per executor, with an LRU word cache because
  Zipf's law makes most corpus tokens repeats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, per the reference BPE formulation


def _word_counts(df: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    from data_misc_tools_spark.operators.text import tokens

    w = F.explode(tokens(text_col, lowercase=lowercase)).alias("word")
    return df.select(w).groupBy("word").agg(F.count("*").alias("cnt"))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
    lowercase: bool = True,
    stats_partitions: int | None = None,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a corpus column.

    Returns the ordered merge list [(left, right), ...] — rank =
    position. Stops early when the best remaining pair occurs fewer
    than ``min_count`` times. Deterministic: ties broken by pair
    lexicographic order, independent of partitioning.

    ``stats_partitions``: partition count for the word-type table the
    rounds iterate over. That table is usually orders of magnitude
    smaller than the corpus; coalescing it keeps every round's two
    jobs (pair agg + checkpoint) at a handful of tasks. On local[*]
    the round cost is dominated by per-round plan analysis (~1 s/
    round regardless), so this matters on real clusters, not demos.
    """
    words = _word_counts(df, text_col, lowercase)
    if stats_partitions is not None:
        words = words.coalesce(stats_partitions)
    # word -> initial symbol array: chars + end-of-word marker
    sym = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit(END)),
    )
    table = words.select("cnt", sym.alias("sym")).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            table.filter(F.size("sym") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("sym") - 1),
                        lambda i: F.struct(
                            F.element_at("sym", i).alias("a"),
                            F.element_at("sym", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "a", "b").first()
        if best is None or best.n < min_count:
            break
        a, b = best.a, best.b
        merges.append((a, b))
        # greedy left-to-right non-overlapping merge of (a, b), as a
        # JVM-side fold: append x, unless the accumulated tail is 'a'
        # and x is 'b' — then replace the tail with the merged symbol
        merged = F.aggregate(
            "sym",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        table = table.select("cnt", merged.alias("sym")).localCheckpoint()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment each document with a learned merge list.

    Output: (id_col, out_col array<string>, n_bpe_tokens). Arrow-
    batched pandas UDF: per-word sequential merge resolution with a
    per-batch memo (Zipf: most tokens are repeats), rank dict shipped
    once via closure serialization.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [END]
        while len(syms) >= 2:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            # apply the lowest-rank pair greedily left-to-right (all
            # occurrences), mirroring the training fold exactly
            a, b = syms[best_i], syms[best_i + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    # inline type hints are strings here (`from __future__ import
    # annotations`) that pyspark cannot resolve against this closure,
    # so attach real pd.Series annotation objects post-definition
    def seg(texts):
        memo: dict = {}
        out = []
        for t in texts:
            toks = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                toks.extend(encode_word(w.lower() if lowercase else w, memo))
            out.append(toks)
        return pd.Series(out)

    seg.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    seg = pandas_udf(seg, "array<string>")

    return df.select(F.col(id_col), seg(F.col(text_col)).alias(out_col)).withColumn(
        "n_bpe_tokens", F.size(out_col).cast("long")
    )

"""Distributed unigram-LM subword tokenizer (SentencePiece-style).

The BPE module (operators/bpe.py) learns a merge table; this learns
the OTHER mainstream subword model: a unigram language model over
pieces, trained with EM and pruned toward a target vocabulary
(Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates"). The reference
repo has no counterpart — extension surface for the training-data
pipeline.

Spark-first decomposition (the bpe.py playbook):

* All statistics live on the WORD-TYPE table: one corpus-wide
  tokenize + groupBy yields (word, cnt); the 100 TB corpus is read
  exactly ONCE, and every EM round touches only distinct words.
* Seed vocabulary = most frequent substrings (length ≤ max_piece_len)
  of word types: a bounded per-word substring explode + one hash agg
  + TakeOrdered top-N — deterministic via (count desc, piece asc).
* E-step: per-word forward-backward over the piece lattice — an
  inherently sequential per-word dynamic program, so it runs in an
  Arrow-batched pandas UDF over word types (the justified-UDF case),
  with the current piece log-probs broadcast. Expected counts come
  back as (piece, count) arrays → explode → ONE map-side-combined
  agg bounded by the vocabulary size.
* M-step + pruning are driver-side over the vocab-sized count table
  (a bounded collect, like the BPE argmax row): renormalize, drop the
  weakest prunable pieces (single characters are never pruned — they
  guarantee coverage), repeat.
* The word-type table is localCheckpoint-ed once and reused by every
  round (the iterative-plan-doubling invariant from cluster.py/bpe.py).

:func:`unigram_segment` applies the final model with per-word Viterbi
in a pandas UDF (broadcast vocab + Zipf LRU memo, as bpe_segment).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["unigram_train", "unigram_segment"]

_NEG_INF = float("-inf")


def _forward_backward(word: str, cnt: float, pieces: dict[str, float], max_len: int):
    """Expected piece counts + log-likelihood contribution of one word
    type under the current unigram model. Pure-Python DP (executed
    inside the Arrow batch UDF)."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    spans = []  # (start, end, piece, logp)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = pieces.get(word[j:i])
            if lp is not None:
                spans.append((j, i, word[j:i], lp))
                if alpha[j] != _NEG_INF:
                    a = alpha[j] + lp
                    alpha[i] = a if alpha[i] == _NEG_INF else (
                        max(alpha[i], a) + math.log1p(math.exp(-abs(alpha[i] - a)))
                    )
    z = alpha[n]
    if z == _NEG_INF:
        return {}, 0.0
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j, k, piece, lp in spans:
            if j == i and beta[k] != _NEG_INF:
                b = lp + beta[k]
                beta[i] = b if beta[i] == _NEG_INF else (
                    max(beta[i], b) + math.log1p(math.exp(-abs(beta[i] - b)))
                )
    out: dict[str, float] = {}
    for j, k, piece, lp in spans:
        if alpha[j] == _NEG_INF or beta[k] == _NEG_INF:
            continue
        post = math.exp(alpha[j] + lp + beta[k] - z)
        out[piece] = out.get(piece, 0.0) + post * cnt
    return out, z * cnt


def _viterbi(word: str, pieces: dict[str, float], max_len: int) -> list[str]:
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = pieces.get(word[j:i])
            if lp is not None and best[j] != _NEG_INF and best[j] + lp > best[i]:
                best[i] = best[j] + lp
                back[i] = j
    if best[n] == _NEG_INF:
        return list(word)  # unseen characters: fall back to chars
    out, i = [], n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _word_types(df: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    from data_misc_tools_spark.operators.text import tokens

    w = F.explode(tokens(text_col, lowercase=lowercase)).alias("word")
    return df.select(w).groupBy("word").agg(F.count("*").cast("long").alias("cnt"))


def _em_pass(words: DataFrame, pieces: dict[str, float], max_len: int):
    """One distributed E-step: returns ({piece: expected}, loglik)."""
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(pieces)
    schema = StructType(
        [
            StructField("ps", ArrayType(StringType())),
            StructField("cs", ArrayType(DoubleType())),
        ]
    )

    @F.pandas_udf(schema)
    def estep(word, cnt):
        import pandas as pd

        p = bc.value
        ps_out, cs_out = [], []
        for w, c in zip(word, cnt):
            exp_c, ll = _forward_backward(w, float(c), p, max_len)
            # "\x00ll" sentinel rides the same arrays so expected
            # counts AND the corpus log-likelihood aggregate in ONE
            # job (no second evaluation of the E-step UDF)
            ps_out.append([*exp_c.keys(), "\x00ll"])
            cs_out.append([*exp_c.values(), ll])
        return pd.DataFrame({"ps": ps_out, "cs": cs_out})

    counts = (
        words.select(estep("word", "cnt").alias("r"))
        .select(F.explode(F.arrays_zip("r.ps", "r.cs")).alias("pc"))
        .groupBy(F.col("pc.ps").alias("piece"))
        .agg(F.sum("pc.cs").alias("c"))
        .collect()
    )
    out = {r.piece: r.c for r in counts}
    ll = out.pop("\x00ll", 0.0)
    return out, ll


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    seed_size: int = 1000,
    max_piece_len: int = 6,
    em_iters: int = 2,
    prune_frac: float = 0.25,
    lowercase: bool = True,
    min_count: int = 2,
    ll_trace: list | None = None,
) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary; returns {piece: logprob}.

    EM + prune loop: run ``em_iters`` EM passes, drop the weakest
    ``prune_frac`` of prunable pieces (never single characters), and
    repeat until the vocabulary reaches ``vocab_size``. Each EM pass
    reads only the word-type table; collects are vocab-bounded.
    ``ll_trace`` (optional list) collects the corpus log-likelihood
    before each M-step — within one EM phase it is non-decreasing
    (the EM guarantee; pruning between phases may drop it).
    ``em_iters`` must be >= 1: the pruning step consumes the expected
    counts produced by the EM inner loop.
    """
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    words = _word_types(df, text_col, lowercase).where(
        F.col("cnt") >= min_count
    ).localCheckpoint()
    # ---- seed: frequent substrings (+ all single chars for coverage)
    subs = (
        words.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(word)), i ->"
                    f" transform(sequence(i, least(length(word), i + {max_piece_len - 1})),"
                    " j -> substr(word, i, j - i + 1))))"
                )
            ).alias("piece"),
            F.col("cnt"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
    )
    chars = {r.piece for r in subs.where(F.length("piece") == 1).collect()}
    top = (
        subs.where(F.length("piece") > 1)
        .orderBy(F.desc("c"), F.col("piece"))
        .limit(max(seed_size - len(chars), 0))
        .collect()
    )
    seed = {r.piece: float(r.c) for r in top}
    for r in subs.where(F.length("piece") == 1).collect():
        seed[r.piece] = float(r.c)
    tot = sum(seed.values())
    pieces = {p: math.log(c / tot) for p, c in seed.items()}

    while True:
        for _ in range(em_iters):
            exp_counts, _ll = _em_pass(words, pieces, max_piece_len)
            if ll_trace is not None:
                ll_trace.append(_ll)
            # pieces with zero posterior mass vanish unless protected
            kept = {p: c for p, c in exp_counts.items() if c > 0}
            for ch in chars:  # coverage floor for characters
                kept[ch] = max(kept.get(ch, 0.0), 1e-9)
            tot = sum(kept.values())
            pieces = {p: math.log(c / tot) for p, c in kept.items()}
        prunable = sorted(
            ((p, c) for p, c in kept.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]),
        )
        n_target = max(vocab_size - len(chars), 0)
        if len(prunable) <= n_target:
            break
        n_drop = min(
            max(1, int(len(prunable) * prune_frac)), len(prunable) - n_target
        )
        for p, _c in prunable[:n_drop]:
            del kept[p]
        tot = sum(kept.values())
        pieces = {p: math.log(c / tot) for p, c in kept.items()}
    return pieces


def unigram_segment(
    df: DataFrame,
    pieces: dict[str, float],
    text_col: str = "text",
    out_col: str = "pieces",
    lowercase: bool = True,
    max_piece_len: int = 6,
    memo_size: int = 50_000,
) -> DataFrame:
    """Viterbi-segment ``text_col`` with a trained model: one Arrow
    UDF, vocab broadcast once per executor, LRU word memo (Zipf)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(pieces)

    @F.pandas_udf(ArrayType(StringType()))
    def seg(texts):
        import pandas as pd

        p = bc.value
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks = (t.lower() if lowercase else t).split()
            row = []
            for w in toks:
                got = memo.get(w)
                if got is None:
                    got = _viterbi(w, p, max_piece_len)
                    if len(memo) < memo_size:
                        memo[w] = got
                row.extend(got)
            out.append(row)
        return pd.Series(out)

    return df.withColumn(out_col, seg(F.col(text_col)))

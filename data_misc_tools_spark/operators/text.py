"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Catalyst expressions (no Python UDFs): token
counting, quality scoring, language identification, and document
fingerprinting run entirely inside WholeStageCodegen, so they scan
100 TB at parquet-read speed. Every function takes/returns DataFrames
and keeps the input's partitioning (narrow transformations only,
except where a groupBy is semantically required).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic: language ID at scale
# is a scoring heuristic, not a model.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "je", "que", "pas"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que", "no", "por"),
}


def tokens(text: Column | str, lowercase: bool = False) -> Column:
    """Whitespace tokens with empties removed (array<string>)."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, " "), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


# BPE-ish pre-tokenization: runs of letters, runs of digits, single
# other non-space symbols — the classic GPT-2-style pre-split shape,
# here as a pure regex so it is engine-portable and JVM-executed.
BPEISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def bpeish_token_count(text: Column | str) -> Column:
    """Token count under a BPE-style pre-tokenizer regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPEISH_PATTERN), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Per-document quality features + a composite score in [0, 1].

    Cheap, deterministic heuristics (length / punctuation / digit /
    token statistics) of the kind used to filter web-scale pretraining
    corpora. All expressions are built-ins; `translate` deletes char
    classes without regex engines (identical semantics in DuckDB for
    oracle checking).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    # characters remaining after deleting spaces -> total token chars
    tok_chars = F.length(F.regexp_replace(t, " ", ""))
    # integer half-up rounding of the chars/tokens ratio: engines
    # disagree on rounding identical doubles at exact .00005 halves
    # (e.g. 33 chars / 32 tokens)
    from data_misc_tools_spark.operators.util import half_up_ratio4

    avg_tok_len = half_up_ratio4(tok_chars, F.greatest(n_tok, F.lit(1)))
    n_digits = n_chars - F.length(F.translate(t, "0123456789", ""))
    n_punct = n_chars - F.length(F.translate(t, ".,!?;:'\"", ""))
    score = F.round(
        F.least(n_tok / F.lit(200.0), F.lit(1.0)) * 0.4
        + F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), 0.3).otherwise(0.0)
        + F.when(n_digits / F.greatest(n_chars, F.lit(1)) < 0.2, 0.2).otherwise(0.0)
        + F.when(n_punct / F.greatest(n_chars, F.lit(1)) < 0.1, 0.1).otherwise(0.0),
        4,
    )
    return df.select(
        *[F.col(c) for c in id_cols],
        n_chars.alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        avg_tok_len.alias("avg_token_len"),
        n_digits.alias("n_digits"),
        n_punct.alias("n_punct"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language identification — fully shuffle-free.

    Per-language hit counts are computed with higher-order array
    expressions over the token array (``filter`` + ``size``), then the
    argmax is a pure CASE cascade (ties broken by language code
    ascending; zero hits → 'und'). A narrow map-only operator: at
    100 TB it runs at scan speed with no exchange, no join, no window —
    the earlier explode+broadcast-join formulation shuffled the entire
    token stream for the same answer.
    """
    toks = tokens(text_col, lowercase=True)
    langs = sorted(STOPWORDS)

    def _matcher(words: tuple[str, ...]):
        return lambda x: x.isin(*words)

    hit_cols = {
        lang: F.size(F.filter(toks, _matcher(STOPWORDS[lang]))).cast("long")
        for lang in langs
    }
    out = df.select(F.col(id_col), *[hit_cols[lang].alias(f"__h_{lang}") for lang in langs])
    best_hits = F.greatest(*[F.col(f"__h_{lang}") for lang in langs])
    pred = F.lit("und")
    # first language (ascending) reaching the max wins; build the CASE
    # in reverse so earlier languages take precedence
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"__h_{lang}") == best_hits) & (best_hits > 0), F.lit(lang)
        ).otherwise(pred)
    return out.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        F.when(best_hits > 0, best_hits).otherwise(F.lit(0).cast("long")).alias(
            "stopword_hits"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token multiset — robust to token reordering, the standard
    cheap near-canonical form for fuzzy-dedup pre-grouping."""
    canon = F.array_join(
        F.array_sort(F.array_distinct(tokens(text_col, lowercase=True))), " "
    )
    return df.select(F.col(id_col), F.md5(canon).alias("fingerprint"))


def clean_text(text: Column | str) -> Column:
    """Normalize whitespace: collapse runs of spaces/tabs/newlines to a
    single space and trim the ends — the first pass of every corpus
    cleaning pipeline. Pure JVM expression (no UDF); DuckDB twin:
    ``trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))``."""
    t = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(t, "[ \\t\\n\\r]+", " "))


def score_cutoff(
    df: DataFrame,
    score_col: str = "quality_score",
    lower_num: int = 3,
    lower_den: int = 4,
) -> float:
    """Exact quantile boundary of a ROUNDED score column, computed the
    100 TB-safe way: the scores are rounded (4dp -> at most ~10k
    distinct values no matter the corpus size), so a per-score count
    aggregate (map-side combined, tiny result) plus a driver-side
    cumulative walk yields the exact boundary with no global sort and
    no per-row window. Returns the smallest score s such that
    count(score <= s) * lower_den >= lower_num * n — all-integer
    arithmetic, engine-portable (DuckDB twin: min(s) over the same
    windowed-count inequality).
    """
    counts = sorted(
        (r[0], r[1])
        for r in df.groupBy(score_col).agg(F.count("*").alias("cnt")).collect()
        if r[0] is not None
    )
    n = sum(c for _, c in counts)
    cum = 0
    for s, c in counts:
        cum += c
        if cum * lower_den >= lower_num * n:
            return s
    return counts[-1][0] if counts else float("nan")


def top_quartile_filter(
    df: DataFrame, score_col: str = "quality_score"
) -> DataFrame:
    """Keep rows strictly above the 75th-percentile score boundary.

    The threshold-filter formulation of "top quality quartile": unlike
    a global ntile(4) (single-partition sort of the whole corpus —
    dies on one reducer at scale), this computes the exact boundary
    from the bounded distinct-score histogram and applies a scan-local
    comparison filter. Ties AT the boundary are excluded, so the kept
    fraction is <= 25% — the standard corpus-filter semantics.
    """
    cutoff = score_cutoff(df, score_col)
    return df.filter(F.col(score_col) > F.lit(cutoff))


def unigram_nll_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    freqs: DataFrame | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document average negative log-likelihood under a corpus
    unigram language model — the perplexity-proxy quality filter of
    CCNet/Gopher-style pipelines (high NLL = rare-token soup; low =
    repetitive boilerplate).

    ``freqs`` (token, cnt) lets a reference corpus score a different
    target corpus; by default the model is fit on ``df`` itself.

    Engine-exact by construction: each token's -ln(cnt/total) scales
    to an e6 BIGINT with a per-row round (transcendental values never
    sit on decimal half-boundaries), per-doc sums are integer-exact,
    and the average divides half-up in pure integer math — no double
    accumulation anywhere, so the DuckDB twin matches hash-exactly.

    Scale: model fit and scoring both branch off ONE (doc, token)
    count aggregate, so Spark's ReusedExchange serves both from a
    single corpus scan + explode (the naive fit-then-score plan scans
    the corpus twice). The model is one further hash-agg on token;
    scoring joins the vocab — broadcast when it fits (default;
    ~1M-token vocabs are MBs), else a shuffle equi-join on token with
    AQE handling stopword skew (broadcast_vocab=False). Output:
    (id_col, n_tokens, avg_nll).
    """
    tokc = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("__k"))
    )
    if freqs is None:
        freqs = tokc.groupBy("tok").agg(F.sum("__k").alias("cnt"))
    total = freqs.agg(F.sum("cnt").cast("long").alias("__total"))
    model = freqs.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(-F.log(F.col("cnt") / F.col("__total")) * 1e6)
        .cast("long")
        .alias("__nll_e6"),
    )
    scored = tokc.join(
        F.broadcast(model) if broadcast_vocab else model, "tok"
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum(F.col("__k") * F.col("__nll_e6")).alias("__s"),
            F.sum("__k").alias("__n"),
        )
        .selectExpr(
            id_col,
            "cast(__n AS bigint) AS n_tokens",
            # half-up integer average: e6 sum / (100 * count) -> 4dp
            "((2 * __s + 100 * __n) div (200 * __n)) / 10000.0D AS avg_nll",
        )
    )

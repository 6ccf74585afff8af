"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": <sec>, ...}, "sf": <sf>}

Two tiers (VERDICT r8 ask #5): the default HEADLINE tier (~120 rows —
the stable drift-tracking core, the driver's graded window, and the
oracle-portable production twins) keeps per-round sweeps inside the
driver's budgets; `python bench.py --extended` (or
SPARK_GRAFT_BENCH_EXTENDED=1) times EVERY benched catalog query. The
record carries `tier`, and drift_vs_prev intersects query sets, so
headline-vs-extended comparisons stay mechanical.

`value` totals every TIMED query. The stdout line must survive the
driver's 2000-char stdout tail (round 3's 102-query line lost its
JSON head there and recorded `parsed: null`), so the `queries` dict
packs the stable drift-tracking core first, then the slowest of the
rest, up to a hard MAX_LINE byte budget; `n_queries` counts all timed
queries and the COMPLETE per-query map is always written to
BENCH_local.json next to this script.

Each query is materialized with a noop-sink write (full computation
of every column, no driver transfer). Timings include plan +
execution but not Spark session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The queries that exercise the engine's distinct execution shapes:
# full-scan agg, join+topN, multi-join, window, sessionization,
# explode+agg, hash-dedup, LSH band join, text featurization,
# similarity search. This is the EXTENDED tier — every benched
# catalog query; the default HEADLINE tier (VERDICT r8 ask #5) is
# computed below as drift-core + graded window + twins, ~120 rows,
# so per-round sweeps stay inside the driver's time/stdout budgets
# while `python bench.py --extended` still measures everything.
EXTENDED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "brand_stats",
    "window_rank_orders",
    "orders_rollup",
    "sessionize_events",
    "hourly_event_rollup",
    "event_value_quantiles",
    "json_results_explode_demo",
    "word_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_simhash",
    "text_quality",
    "text_language_id",
    "asof_purchase_prior_click",
    "distinct_users_daily",
    "embedding_cosine_topk",
    "embedding_neardup",
    "embedding_neardup_gemm",
    # subquery / grouping-set shapes
    "q4_order_priority",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q22_idle_rich_customers",
    "orders_cube",
    # deterministic sampling + packing
    "sample_documents_hash",
    "sample_per_group_reservoir",
    "pack_token_batches",
    # wide-shape + skew primitives
    "events_pivot_by_type",
    "salted_event_rollup",
    # round-2 additions: hopping windows, native session windows,
    # repeated-span mining, histogram-cutoff quality filter
    "sliding_window_rollup",
    "session_window_native",
    "repeated_ngram_spans",
    "quality_quartile_filter",
    # round-2 late additions: correlated-min / global-threshold /
    # nested-IN / sole-late-supplier TPC-H shapes, decontamination
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_part_promotion_suppliers",
    "q21_waiting_suppliers",
    "eval_contamination",
    "text_unigram_nll",
    "mixture_resample_langs",
    "funnel_view_click_purchase",
    "funnel_bounded_day",
    "cohort_retention_weekly",
    "dedup_incremental_index",
    # corpus quality / scrubbing additions (r2 cont.)
    "text_repetition_signals",
    "tfidf_topk_terms",
    "pii_scrub_demo",
    # round-3 additions: context-window chunking, quality-aware dedup
    # survivor, integer-exact compressed ANN scoring, Z-order keys,
    # mergeable HLL rollup
    "chunk_documents",
    "dedup_keep_best",
    "embedding_sq_adc_topk",
    "zorder_key_demo",
    "hll_users_mergeable_rollup",
    "split_by_cluster_demo",
    "interval_join_attribution",
    "jpeg_meta_demo",
    "gopher_filter_demo",
    "text_bigram_nll",
    "scd2_user_status",
    "snapshot_diff_demo",
    # round-3 late additions: edit-distance verify, privacy gate,
    # exact correlation, graph census, HTML strip, CDC compaction
    "dedup_editdist_verify",
    "k_anonymity_report",
    "corr_quantity_price",
    "corr_matrix_lineitem",
    "triangle_count_neardup",
    "html_strip_demo",
    "changelog_compact_demo",
    "outlier_events_mad",
    "sample_weighted_docs",
    "missing_intervals_demo",
    "hll_audience_overlap",
    # round-3 session-3 additions
    "bm25_search_topk",
    "bm25f_search_topk",
    "dedup_repeated_ngrams",
    "dsir_select_topk",
    "mp4_meta_demo",
    "url_domain_quota",
    "zipf_corpus_fit",
    "term_dispersion_docs",
    "tar_shard_export_demo",
    "corpus_drift_report",
    "bootstrap_value_ci",
    "sequence_examples_export",
    "nb_language_confusion",
    "pmi_collocations_topk",
    "hourly_anomaly_zscore",
    "dataset_fingerprint_orders",
    "bm25_index_query",
    "ab_lift_purchase_vs_click",
    "decayed_popularity_types",
    "event_transition_matrix",
    "conversion_lag_quantiles",
    "corpus_distinct_n",
    "item_cooccurrence_jaccard",
    "event_value_histogram",
    "trimmed_mean_events",
    "text_char_entropy",
    "cohort_retention_rates",
    "engagement_gini",
    "event_path_trigrams",
    "coordinated_sample_join",
    "nation_revenue_share",
    # round-4: xxhash64 production twins of the two bootstrap queries
    # (the md5 oracle path is graded; these are the fast path), and
    # the serve-only BM25 index row (bm25_index_query above includes
    # the full index BUILD; this one hits the memoized index and
    # measures bucket-pruned retrieval latency alone)
    "bootstrap_value_ci_fast",
    "ab_lift_fast",
    "bm25_index_serve",
    # round-4 operators: semantic dedup/contamination, Luhn PII,
    # URL canonicalization, skew-salted join, Markov fixed point,
    # wall-clock-filled anomaly scores
    "semdedup_embeddings",
    "semantic_contamination_flags",
    "pii_card_luhn",
    "url_canonical_dedup",
    "salted_join_revenue",
    "markov_stationary_events",
    "hourly_anomaly_zscore_filled",
    "contrastive_negatives",
    "png_pipeline_demo",
    "warc_source_demo",
    "rfm_user_segments",
    "dedup_ppjoin",
    "text_nfc_demo",
    # round-5: oracle-exact integer PageRank over the portable-hash
    # MinHash candidate graph (was rows-only with the fast hash),
    # engine-exact Lloyd k-means, MMR diversified rerank, dictionary
    # domain tagging, rendezvous sharding
    "pagerank_neardup_graph",
    "kmeans_embeddings",
    "mmr_diverse_topk",
    "dictionary_tag_topics",
    "rendezvous_shard_assign",
    "ccnet_perplexity_buckets",
    "exact_stratified_split_langs",
    "ab_chi_square_purchase",
    "sprt_purchase_rate",
    "trend_dow_purchase",
    "lpa_communities_neardup",
    "retrieval_eval_embeddings",
    "personalized_pagerank_seeds",
    "linkpred_adamic_adar",
    "kcenter_coreset_embeddings",
    "welch_ttest_value",
    "pca_power_embeddings",
    "containment_quotes",
    "ql_dirichlet_search",
    "hybrid_rrf_search",
    "winnowing_match_pairs",
    "snm_blocking_pairs",
    "ngram_novelty_scores",
    "fd_profile_orders",
    "pareto_docs_skyline",
    # round-5 session-3: rank statistics over range-partitioned prefix
    # sums, co-occurrence analytics, changepoint/trend/lead-lag
    # statistics, margin mining, positional phrase search, per-node
    # clustering coefficients, HITS, TF-IDF keywords, Benford audit
    "mannwhitney_u_value",
    "kruskal_value_by_type",
    "bf_variance_by_type",
    "ks_purchase_click_value",
    "assoc_rules_brands",
    "item_cf_events",
    "cusum_changepoint_daily",
    "margin_mine_pairs",
    "tfidf_top_terms_docs",
    "phrase_search_docs",
    "lcc_neardup_nodes",
    "harmonic_neardup_k3",
    "theil_sen_daily_trend",
    "lag_crosscorr_purchase_click",
    "hits_users_items",
    "benford_audit_prices",
    "systematic_sample_orders",
    "neyman_alloc_events",
    "attribution_ushape_credit",
    "cluster_medoids_embeddings",
    "rtbf_cascade_report",
    "quantile_normalize_values",
    "cuped_purchase_by_clicks",
    "image_dhash_neardup",
    "mann_kendall_daily_trend",
    # round-6: float production twins for the two e6 power-iteration
    # graded rows (VERDICT r5 ask — the bootstrap_value_ci_fast
    # treatment)
    "markov_stationary_fast",
    "pagerank_neardup_fast",
    # round-6 session-2: survival analysis over range-partitioned
    # cumsums, map-only readability, LLR corpus keyness, SINDY
    # inclusion-dependency mining
    "purchase_gap_survival_km",
    "rmst_purchase_gap",
    "logrank_heavy_vs_light",
    "readability_docs",
    "keyness_llr_en_docs",
    "fk_discovery_tpch",
    # round-7 (VERDICT r6 ask #1): lazy-plan twins for the last two
    # expensive graded iterative-graph rows; ask #5: the winnowing
    # max_df cap accounting row
    "lpa_neardup_fast",
    "ppr_seeds_fast",
    "winnowing_cap_report",
    # ask #2: Lee-et-al ExactSubstr via range-partitioned suffix sort
    "dedup_substring_docs",
    # r7 statistics: monotone-association + concentration profiles
    "spearman_quantity_price",
    "gini_customer_revenue",
    # r7 entity resolution: Fellegi-Sunter decision layer
    "fs_linkage_docs",
    "fs_em_linkage_docs",
    # r7 privacy: the skew gate beside k_anonymity_report
    "t_closeness_events",
    # r7 ops advisors: score calibration + join-skew pre-flight
    "calibration_stopword_en",
    "fairness_stopword_length",
    "join_skew_events_self",
    "write_plan_lineitem",
    # r7 multimodal: real-PCM WAV round trip -> energy fingerprint
    "audio_fingerprint_demo",
    # r7 robust stats: categorical MI + median/MAD outlier gate
    "mutual_info_type_dow",
    "mad_outliers_value",
    # r7 graph: per-edge triangle support (k-truss building block)
    "edge_support_neardup",
    # r7 retrieval: two-pass pseudo-relevance-feedback expansion
    "bm25_prf_search",
    # r7: leakage-safe target encoding + k-truss cohesive core
    "target_encode_priority",
    "ktruss_neardup",
    # r7 ER: exact-integer Jaro-Winkler (vocabulary-level demo)
    "jw_part_name_pairs",
    # r7 corpus diagnostics: Heaps' law vocabulary growth
    "heaps_law_corpus",
    # r7 experimentation: power / minimum-detectable-effect gate
    "ab_power_value",
    # r7 session-2 profiling/DQ: UCC key discovery, Deequ-style gate,
    # Nelson-Aalen cumulative hazard
    "ucc_discovery_lineitem",
    "dq_expectations_orders",
    "purchase_gap_hazard_na",
    # r7 session-2 wave 2: Shapley attribution, EWMA forecast, KMV sketch
    "shapley_attribution_events",
    "ewma_daily_revenue",
    "holt_linear_daily",
    "kmv_distinct_users",
    # r7 session-2 wave 3: Jaccard node similarity, conformal
    # intervals, corpus diversity
    "linkpred_jaccard_neardup",
    "conformal_interval_value",
    "corpus_diversity_langs",
    # r7 session-2 wave 4: RAKE keyphrases, closed-form OLS
    "rake_keywords_docs",
    "ols2_lineitem_price",
    # r7 session-2 wave 5: PSI drift, DiD, golden record
    "psi_drift_value",
    "psi_drift_stream_demo",
    "did_purchase_heavy",
    "ipw_ate_purchase",
    "golden_record_orders",
    # r7 session-2 wave 6: vocabulary OOV rate, weighted median
    "vocab_oov_rate_langs",
    "weighted_median_price",
    # r7 session-2 wave 7: isotonic calibration, mix-shift drilldown
    "isotonic_stopword_en",
    "metric_mix_shift_value",
    # r7 session-2 wave 8: schema drift diff, degree assortativity
    "schema_drift_orders",
    "assortativity_neardup",
    # r7 session-2 wave 9: seasonal-naive forecast baseline
    "seasonal_naive_daily_revenue",
    # r7 session-2 wave 10: reciprocal-best-match linkage pruning
    "mutual_best_match_neardup",
    # r7 session-2 wave 11: Hilbert clustering key
    "hilbert_key_demo",
    # r7 session-2 wave 12: pairwise Jensen-Shannon divergence
    "jsd_lang_pairs",
    # r7 session-2 wave 13: BMP header round trip (format #5)
    "bmp_meta_demo",
    # r7 session-2 wave 14: classifier-eval operating metrics
    "auc_stopword_en",
    "pr_curve_stopword_en",
    # r7 session-2 wave 15: dedup threshold tuning curve
    "dedup_threshold_sweep",
    # r7 session-2 wave 16: GIF round trip (format #6), Hill tail index
    "gif_meta_demo",
    "tiff_meta_demo",
    "hill_tail_value",
    # r7 session-2 wave 17: embedding-corpus health report
    "embedding_diag_report",
    # r7 session-2 wave 18: analytic LSH parameter planner (rows-only)
    "lsh_plan_demo",
    # r7 session-2 wave 19: robust trimmed/winsorized means
    "trimmed_mean_value",
    # r7 session-2 wave 20: Cramer's V categorical association
    "cramers_v_type_dow",
    # r9: streaming incremental dedup (oracle-exact), IVF append +
    # drift report, EXIF pointer walk
    "dedup_stream_incremental",
    "ivf_index_append_demo",
    # r11 (VERDICT r10 #3): report-serve half of the IVF lifecycle —
    # ivf_index_append_demo's first exposure pays Lloyd + append, this
    # row hits the memoized index
    "ivf_index_serve_demo",
    "exif_meta_demo",
    "holt_winters_daily",
    "weighted_sample_orders",
    "fisher_exact_customers",
    "silhouette_embeddings",
    "proximity_search_docs",
    "kappa_stopword_en",
    "rouge_dedup_pairs",
    "kcore_neardup",
    "brier_stopword_en",
    "wilson_ci_purchase",
    "ico_meta_demo",
    # r10: SQL-callable table functions (lateral fan-out), text-index
    # lifecycle rollup, the nine-format magic-byte dispatcher
    "t_http_get_sql_demo",
    "jd_keys_sql_demo",
    "zk_read_sql_demo",
    "inverted_index_drift_demo",
    "media_meta_demo",
    "attribution_markov_events",
    "kendall_quantity_line",
    "scd2_user_state",
    "dp_histogram_event_type",
    "blocking_eval_minhash",
    "kmv_intersect_users",
    "croston_sparse_daily",
    "wilcoxon_user_click_purchase",
    "profile_orders_columns",
    "mcf_repeat_purchases",
    "bland_altman_order_totals",
]

# Graded entries that are INTENTIONALLY slower than their production
# twins: they keep engine-portable math (md5-derived hashing, full
# index builds) because the DuckDB oracle must reproduce them
# hash-exactly. Read the twin's row for the production number — the
# graded row measures the portable path, not the engine's ceiling.
ORACLE_PORTABLE_TWINS = {
    "bootstrap_value_ci": "bootstrap_value_ci_fast",
    "ab_lift_purchase_vs_click": "ab_lift_fast",
    "bm25_index_query": "bm25_index_serve",  # includes the index BUILD
    # r11 (VERDICT r10 #3): first exposure includes Lloyd training +
    # frozen-centroid append; the serve row is the report alone
    "ivf_index_append_demo": "ivf_index_serve_demo",
    "dedup_minhash_lsh": "dedup_minhash_lsh_fast",
    "embedding_neardup": "embedding_neardup_gemm",
    # r6 (VERDICT r5 ask): the two e6 power-iteration graded rows
    "markov_stationary_events": "markov_stationary_fast",
    "pagerank_neardup_graph": "pagerank_neardup_fast",
    # NOTE: lpa_neardup_fast / ppr_seeds_fast were REMOVED from this
    # map in r10 (VERDICT r9 #2): isolated canary-paired measurement
    # shows warm totals ~equal to the graded rows at sf0.1 (ppr
    # fast-first 5.35 vs 4.85s; the lazy plan saves only
    # checkpoint-job scheduling, which dominates only at sf0.001).
    # They stay in EXTENDED as lazy-plan twins, out of the headline
    # tier — an oracle_portable_graded label must mean the twin is
    # the production-faster path, which these are not.
    # NOTE: dedup_stream_incremental deliberately has NO twin — a
    # fast-xxhash64 twin measured ~EQUAL at sf0.1 (50.5 vs 49.2s):
    # streaming machinery dominates, not the portable md5 path.
}


# The r2-shared prefix: these query names have per-round timing
# history back to BENCH_r02, so they get first claim on the packed
# stdout line (cross-round drift tracking needs stable membership).
_DRIFT_CORE = EXTENDED[: EXTENDED.index("pii_scrub_demo") + 1]


def _headline_names() -> list[str]:
    """The default bench tier (VERDICT r8 ask #5): the stable
    drift-tracking core (r2-shared history), the driver's graded
    window, and the production twins of the oracle-portable rows —
    deduped, in EXTENDED order so cross-round per-query comparisons
    stay positionally stable. Everything else runs only under
    --extended; the full per-query record lands in BENCH_local.json
    either way."""
    from data_misc_tools_spark.catalog import GRADED_FIRST

    want = set(_DRIFT_CORE) | set(GRADED_FIRST[:50])
    want |= set(ORACLE_PORTABLE_TWINS.values())
    want |= set(ORACLE_PORTABLE_TWINS)  # graded halves of each pair
    return [n for n in EXTENDED if n in want]


HEADLINE = _headline_names()


# JVM canary (VERDICT r7 ask #3): a FIXED multi-core JVM workload
# timed immediately before and after the full sweep. If the paired
# shots disagree by >15%, JVM throughput drifted DURING the run
# (neighbor load on shared cores — the r7 pattern the single-core
# python probe cannot see) and the record is stamped verdict=noisy:
# the judge's drift table reads the verdict instead of burning a
# session adjudicating uniform load swings.
#
# Why a synthetic workload and not a catalog-query subset: a 20-query
# canary pass kept JIT-tiering for ~4 repetitions (measured
# 13.1/6.9/6.1/5.4/5.4/5.3 s back-to-back on an idle host — a phantom
# 0.78x "drift" between adjacent passes), while the fixed
# whole-stage-codegen aggregate below stabilizes after one warm shot
# and each canary point discards a first shot and keeps the second,
# killing MOST of the residual tiering.
#
# The band is ASYMMETRIC: even with the warm+discard discipline the
# JVM keeps tiering slowly through a 10-minute sweep, so pass2/pass1
# reads ~0.65-0.80 on every run (measured twice end-to-end plus a
# six-shot isolated series: 2.16/1.89/2.04/1.90/1.75 s) — a
# REPRODUCIBLE intra-run speed-up that biases all records equally and
# therefore cancels in cross-run per-query comparisons. The verdict
# only needs to catch genuine mid-run host drift: DEGRADATION
# (ratio > 1.15 — the r7 incident where JVM throughput halved
# mid-run) or an extreme clearing (< 0.60, load vanishing mid-run,
# which mismeasures the early queries high).
CANARY_LOW = 0.60
CANARY_HIGH = 1.15
_CANARY_ROWS = 3_000_000_000


def _jvm_canary_shot(spark, n: int = _CANARY_ROWS) -> float:
    """One timed shot of the fixed workload: a 32-partition range scan
    through two xxhash64 aggregate expressions — saturates every core
    inside one whole-stage-codegen loop, no shuffle, no data skew."""
    t0 = time.time()
    spark.range(0, n, 1, 32).selectExpr(
        "sum(xxhash64(id) % 1000000007) as s",
        "count(case when xxhash64(id * 7) % 97 = 0 then 1 end) as c",
    ).collect()
    return round(time.time() - t0, 3)


def _jvm_canary_point(spark) -> tuple[float, float]:
    """(kept, discarded): two back-to-back shots; the first absorbs
    any residual JIT/scheduler warm-up, the second is the measurement."""
    first = _jvm_canary_shot(spark)
    return _jvm_canary_shot(spark), first


def _py_warm(pdf):
    import numpy as np
    import pandas as pd

    return pd.DataFrame(
        {"r_regionkey": pdf["r_regionkey"].iloc[:1], "n": [int(np.int64(len(pdf)))]}
    )


def _cpu_probe() -> float:
    """Fixed pure-Python workload timed in seconds: a host-load
    normalizer for cross-run drift analysis (VERDICT r5 ask #6). The
    shared VM drifts ±15% with neighbor load and ALL queries drift
    together — a future judge divides two runs' totals by their probe
    ratio before calling anything a regression. The workload is
    deterministic and allocation-light so it measures CPU contention,
    not the allocator."""
    t0 = time.time()
    acc = 0
    for i in range(5_000_000):
        acc = (acc * 1103515245 + i) % 2147483648
    assert acc >= 0
    return round(time.time() - t0, 3)


def _drift_vs_prev(
    local_path: str, timings: dict[str, float], record: dict
) -> dict | None:
    """Probe-normalized per-query drift vs the previous BENCH_local
    record. normalized_ratio = (cur_sec / prev_sec) / probe_ratio,
    probe_ratio = mean(cur probes) / mean(prev probes) — a value near
    1.0 means "no code-level change once host load is factored out".
    Returns None when there is no previous record to compare against
    (first run, or a pre-probe record)."""
    try:
        with open(local_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        return None
    if prev.get("sf") != record.get("sf"):
        return None  # cross-SF ratios are meaningless
    prev_q = prev.get("queries") or {}
    prev_probe = prev.get("cpu_probe_sec") or {}
    cur_probe = record["cpu_probe_sec"]
    try:
        prev_mean = (prev_probe["before"] + prev_probe["after"]) / 2
        cur_mean = (cur_probe["before"] + cur_probe["after"]) / 2
        probe_ratio = cur_mean / prev_mean
    except (KeyError, TypeError, ZeroDivisionError):
        return None
    shared = {
        n: round((timings[n] / prev_q[n]) / probe_ratio, 3)
        for n in timings
        if n in prev_q and prev_q[n] and prev_q[n] > 0
    }
    if not shared:
        return None
    cur_total = sum(timings[n] for n in shared)
    prev_total = sum(prev_q[n] for n in shared)
    # canary verdicts gate the comparison (VERDICT r7 ask #3): a run
    # whose paired canary disagreed >15% is not a clean baseline on
    # either side of the ratio
    cur_v = (record.get("canary") or {}).get("verdict")
    prev_v = (prev.get("canary") or {}).get("verdict")
    reliable = (
        None
        if prev_v is None  # pre-canary record: stability unknown
        else (cur_v == "clean" and prev_v == "clean")
    )
    return {
        "canary_verdicts": {"cur": cur_v, "prev": prev_v},
        "comparison_reliable": reliable,
        "probe_ratio": round(probe_ratio, 4),
        "n_shared": len(shared),
        "prev_shared_total": round(prev_total, 3),
        "cur_shared_total": round(cur_total, 3),
        # read BOTH: raw is truer when the two runs' probe readings
        # disagree while query totals agree (the single-core probe can
        # decouple from multi-core JVM throughput between sessions);
        # normalized is truer when load shifted DURING a run
        "raw_total_ratio": round(cur_total / prev_total, 4),
        "normalized_total_ratio": round(
            (cur_total / prev_total) / probe_ratio, 4
        ),
        "worst": sorted(shared, key=lambda n: -shared[n])[:5],
        "queries": shared,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from data_misc_tools_spark.session import build_session

    spark = build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_misc_tools_spark.catalog import QUERIES

    # Warm the JVM/codegen/parquet-footer paths once so the first
    # timed query doesn't absorb session startup costs.
    from data_misc_tools_spark.session import load_tables

    region = load_tables(spark, sf_dir, ["region"])["region"]
    region.groupBy("r_name").count().collect()
    # Warm the Python-worker path too (daemon fork + Arrow serdes +
    # numpy/pandas imports, ~2 s across 32 workers): that is session
    # startup, and without this it lands entirely on whichever
    # applyInPandas query happens to run first — r2's bench charged it
    # all to embedding_neardup_gemm (2.4 s cold vs 0.5 s warm), which
    # read as a phantom 27% regression.
    region.groupBy("r_regionkey").applyInPandas(
        _py_warm, schema="r_regionkey bigint, n bigint"
    ).collect()

    _jvm_canary_shot(spark, 400_000_000)  # codegen + class-load warm
    probe_before = _cpu_probe()
    canary1, canary1_warm = _jvm_canary_point(spark)

    tier = (
        "extended"
        if "--extended" in sys.argv
        or os.environ.get("SPARK_GRAFT_BENCH_EXTENDED") == "1"
        else "headline"
    )
    names = EXTENDED if tier == "extended" else HEADLINE

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        # noop sink: full computation of every column, no driver
        # transfer, no count()-induced column pruning.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    canary2, canary2_warm = _jvm_canary_point(spark)
    probe_after = _cpu_probe()
    canary_ratio = round(canary2 / canary1, 4) if canary1 > 0 else None
    canary_verdict = (
        "clean"
        if canary_ratio is not None
        and CANARY_LOW <= canary_ratio <= CANARY_HIGH
        else "noisy"
    )
    if canary_verdict == "noisy":
        print(
            f"# CANARY NOISY: paired passes disagree {canary_ratio}x "
            f"({canary1}s vs {canary2}s) — host drifted during the "
            "run; this record is NOT a clean drift baseline",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "tier": tier,
        "n_queries": len(timings),
        "queries": timings,
        "sf": sf,
        # host-load normalizer (VERDICT r5 ask #6): the same fixed
        # pure-Python workload timed before and after the run. To
        # compare two runs of identical code, divide their totals by
        # their mean probe ratio first — the shared VM drifts ±15%
        # and every query drifts with it.
        "cpu_probe_sec": {"before": probe_before, "after": probe_after},
        # paired-canary stability verdict (VERDICT r7 ask #3): the
        # fixed JVM workload timed before AND after the sweep
        # (discard-first-keep-second at each point); >15% disagreement
        # = JVM throughput drifted mid-run and per-query comparisons
        # against this record need the session-record cross-check.
        "canary": {
            "workload": f"range({_CANARY_ROWS})-xxhash64-agg x32",
            "pass1_sec": canary1,
            "pass2_sec": canary2,
            "discarded_first_shots": [canary1_warm, canary2_warm],
            "ratio": canary_ratio,
            "verdict": canary_verdict,
        },
        # label the intentionally-slow oracle-portable rows so their
        # timings are never read as the production number (VERDICT r4)
        "oracle_portable_graded": {
            g: {"production_twin": t, "twin_sec": timings.get(t)}
            for g, t in ORACLE_PORTABLE_TWINS.items()
            if g in timings
        },
    }
    # probe-normalized drift vs the previous record (VERDICT r6 ask
    # #7): divide each shared query's ratio by the runs' probe ratio
    # so host-load drift (the documented ±15% shared-VM pattern)
    # cancels and judge adjudication is mechanical. Previous record
    # read BEFORE this run overwrites it; lives only in
    # BENCH_local.json (the stdout line's byte budget is spoken for).
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    record["drift_vs_prev"] = _drift_vs_prev(local_path, timings, record)

    # Deterministic stdout packing (VERDICT r10 #5): the driver diffs
    # consecutive rounds' packed lines, so a row that merely fell off
    # the byte budget reads as phantom "dropped_from_bench" (r10:
    # bootstrap_value_ci / dedup_ppjoin ran at 8.0/7.0 s but lost the
    # slowest-first race to rouge/stream). Priority now: (1) the drift
    # core (r2-shared history), (2) whatever the PREVIOUS same-SF
    # record packed onto its line (pre-field records fall back to
    # their full query map by descending time), (3) the slowest of the
    # rest. Under stable timings the packed set therefore changes only
    # additively round-over-round. Read BEFORE the overwrite below.
    prev_packed: list[str] = []
    try:
        with open(local_path) as f:
            _prev = json.load(f)
        if _prev.get("sf") == record.get("sf"):
            prev_packed = list(_prev.get("stdout_packed") or [])
            if not prev_packed:
                pq = _prev.get("queries") or {}
                prev_packed = sorted(pq, key=lambda n: -pq[n])
    except (OSError, ValueError):
        pass

    MAX_LINE = 1900
    core = [n for n in _DRIFT_CORE if n in timings]
    carry = [n for n in prev_packed if n in timings and n not in _DRIFT_CORE]
    rest = sorted(
        (n for n in timings if n not in _DRIFT_CORE and n not in carry),
        key=lambda n: -timings[n],
    )
    packed: dict[str, float] = {}
    line = ""
    for name in [*core, *carry, *rest]:
        trial = dict(packed)
        trial[name] = timings[name]
        # oracle_portable_graded + drift_vs_prev + stdout_packed live
        # only in BENCH_local.json — per-query dicts/lists that would
        # eat the stdout line's byte budget
        slim = {
            k: v
            for k, v in record.items()
            if k
            not in (
                "oracle_portable_graded",
                "drift_vs_prev",
                "canary",
                "stdout_packed",
            )
        }
        # compact canary on the line (ratio + verdict, ~45 bytes);
        # the query list stays in BENCH_local.json
        slim["canary"] = {"ratio": canary_ratio, "verdict": canary_verdict}
        cand = json.dumps({**slim, "queries": trial, "detail": "BENCH_local.json"})
        if len(cand) > MAX_LINE:
            continue
        packed, line = trial, cand
    record["stdout_packed"] = list(packed)

    # full per-query record, always (the judge's drift analysis reads
    # this when the stdout line had to drop entries)
    with open(local_path, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")

    assert line and len(line) <= MAX_LINE, "bench line exceeds tail budget"
    assert json.loads(line)["value"] == total
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-10 capstone: the new governance / analytics layer tells one
coherent story on the shared fixtures — SCD2 history reconciles with
its changelog, Markov attribution tracks the corpus's real conversion
structure, the blocking audit certifies the LSH candidate generator,
sketch estimates track exact truth, the DP release stays useful, and
the index lifecycle reports the append it just watched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_misc_tools_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def test_scd2_reconciles_with_changelog(spark):
    """Every user's interval count == their state-change count; the
    intervals tile the user's history (valid_to chains, exactly one
    open interval per user)."""
    from data_misc_tools_spark.operators.cdc import scd2_intervals

    e = (
        load_tables(spark, SF, ["events"])["events"]
        .filter(F.col("user_id") < 100)
        .select("user_id", "event_type", "ts", "event_id")
    )
    out = scd2_intervals(
        e, ["user_id"], ["event_type"], ["ts", "event_id"]
    ).collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    # independent run count from the ordered event stream
    rows = e.orderBy("user_id", "ts", "event_id").collect()
    runs: dict = {}
    prev: dict = {}
    for r in rows:
        if prev.get(r.user_id) != r.event_type:
            runs[r.user_id] = runs.get(r.user_id, 0) + 1
            prev[r.user_id] = r.event_type
    assert {u: len(v) for u, v in by_user.items()} == runs
    for u, ivs in by_user.items():
        ivs = sorted(ivs, key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # chained tiling


def test_markov_attribution_tracks_conversion_structure(spark):
    """The chain's absorbing probability approximates the corpus's
    (near-total) empirical conversion, every channel earns positive
    credit on this all-channels-everywhere corpus, and credits are a
    proper distribution."""
    from data_misc_tools_spark.operators.temporal import (
        markov_removal_attribution,
    )

    e = load_tables(spark, SF, ["events"])["events"]
    rows = markov_removal_attribution(e).collect()
    f_full = rows[0].f_full_e6
    # empirically every sf0.001 user converts; the 16-round quantized
    # horizon reads slightly under 1e6
    assert 900_000 <= f_full <= 1_000_000
    assert all(r.attribution_e6 > 0 for r in rows)
    total = sum(r.attribution_e6 for r in rows)
    assert abs(total - 1_000_000) <= len(rows)


def test_blocking_audit_certifies_lsh(spark):
    """LSH finds identical texts with probability 1 (identical
    signatures share every band), so pairs_completeness against the
    exact-duplicate truth is exactly 1.0, with a real reduction
    ratio."""
    from data_misc_tools_spark.operators import dedup as D
    from data_misc_tools_spark.operators.linkage import blocking_quality

    base = load_tables(spark, SF, ["documents"])["documents"].select(
        "doc_id", "text"
    )
    d = base.unionByName(
        base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    ).localCheckpoint(eager=True)  # doubled corpus: every doc has an exact twin
    cand = D.minhash_candidate_pairs(d, num_perm=8, bands=4, k=5)
    truth = (
        d.alias("a")
        .join(d.alias("b"), F.col("a.text") == F.col("b.text"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    r = blocking_quality(cand, truth, n_records=d.count()).collect()[0]
    assert r.pairs_completeness == 1.0
    assert r.reduction_ratio > 0.5
    assert r.n_matched == r.n_truth


def test_kmv_intersection_tracks_exact_overlap(spark):
    """Sketch overlap estimate vs the exact click∩purchase user
    overlap (computed directly) within KMV's k=256 error envelope."""
    from data_misc_tools_spark.operators.profile import kmv_intersect

    e = load_tables(spark, SF, ["events"])["events"]
    exact = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("a"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("b"),
        )
        .agg(
            F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1)).alias("i"),
            F.sum(F.when((F.col("a") == 1) | (F.col("b") == 1), 1)).alias("u"),
        )
        .collect()[0]
    )
    r = kmv_intersect(
        e,
        "user_id",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
        k=256,
    ).collect()[0]
    if r.is_exact:
        assert r.intersect_est == exact["i"] and r.union_est == exact["u"]
    else:
        assert abs(r.intersect_est - exact["i"]) / exact["i"] < 0.4


def test_dp_release_useful_and_private(spark):
    """ε=0.5 noise keeps large counts useful (relative error tiny)
    while the release is salt-reproducible; no true count appears
    verbatim unless the noise rounds to zero by chance."""
    from data_misc_tools_spark.operators.profile import dp_histogram

    e = load_tables(spark, SF, ["events"])["events"]
    true = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    rel = {
        r.k: r.noisy_count_e3
        for r in dp_histogram(e, F.col("event_type"), b_e3=2000).collect()
    }
    assert set(rel) == set(true)
    for k, n in true.items():
        err = abs(rel[k] / 1000.0 - n)
        assert err < 30  # Laplace(b=2) tail at ~6 groups
        if n > 300:
            assert err / n < 0.1


def test_index_drift_reports_the_append_it_watched(spark, tmp_path):
    """Append a quarter onto three quarters: the drift rollup's
    global growth reads ~333 permille and term growth is
    non-negative everywhere."""
    from data_misc_tools_spark.operators.retrieval import (
        inverted_index_append,
        inverted_index_build,
        inverted_index_drift,
    )

    d = (
        load_tables(spark, SF, ["documents"])["documents"]
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    path = str(tmp_path / "cap_idx")
    inverted_index_build(d.filter(F.col("doc_id") % 4 != 0), path, n_buckets=8)
    inverted_index_append(d.filter(F.col("doc_id") % 4 == 0), path, n_buckets=8)
    rep = inverted_index_drift(spark, path).collect()
    base = sum(r.n_postings_base for r in rep)
    added = sum(r.added for r in rep)
    global_growth = 1000 * added / base
    assert 250 < global_growth < 420  # ~333 with bucket-mix noise
    assert all(r.n_terms_now >= r.n_terms_base for r in rep)
    assert all(r.max_df_now >= r.max_df_base for r in rep)


def test_kendall_null_and_planted(spark):
    """tau-b reads ~0 on the corpus's independent pair and exactly 1
    on a planted monotone grid — the negative-control discipline."""
    from data_misc_tools_spark.operators.profile import kendall_tau_b

    li = load_tables(spark, SF, ["lineitem"])["lineitem"]
    null_row = kendall_tau_b(
        li, F.col("l_quantity").cast("long"), F.col("l_linenumber").cast("long")
    ).collect()[0]
    assert abs(null_row.tau_b) < 0.05
    # ties must ALIGN on both axes for tau-b to reach exactly 1
    planted = spark.createDataFrame(
        [(i // 3, i // 3) for i in range(60)], "x long, y long"
    )
    assert (
        kendall_tau_b(planted, F.col("x"), F.col("y")).collect()[0].tau_b == 1.0
    )


def test_croston_tracks_demand_rate(spark):
    """On the sparse high-value series the steady-state forecast sits
    near the true demand-per-period rate (total demand / span)."""
    from data_misc_tools_spark.operators.temporal import croston_smooth

    e = load_tables(spark, SF, ["events"])["events"]
    daily = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .groupBy(
            F.expr("unix_timestamp(date_trunc('day', ts)) div 86400")
            .cast("long")
            .alias("day")
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    out = croston_smooth(daily, "day", "n", alpha_permille=300).orderBy(
        "o"
    ).collect()
    span = out[-1].o - out[0].o + 1
    total = sum(r.x for r in out)
    true_rate_e3 = 1000 * total / span
    assert 0.3 * true_rate_e3 < out[-1].fcast_e3 < 3 * true_rate_e3

"""Round-7 operators composed end-to-end on the sf0.001 tables — the
entity-resolution + exposure-audit pipeline a curation team would run:

  1. block candidate pairs and learn Fellegi–Sunter weights from
     exact-text ground truth                    (linkage.fs_score_pairs)
  2. cross-check the supervised weights against label-free EM
                                                (linkage.fs_em_weights)
  3. measure duplicate-substring exposure of the SAME corpus
                                                (dedup.suffix_window_spans)
  4. audit what the winnowing hot-key cap hides (winnowing_cap_accounting)
  5. sanity the corpus economics: concentration + dependence + robust
     outliers                                   (gini / MI / MAD)
  6. plan the heavy join before running it      (etl.join_skew_report)

Every stage is oracle-tested alone; this pins the COMPOSITION — the
FS decision layer agrees with ground truth, EM agrees with supervised
direction without seeing labels, the suffix scan and the FS matches
tell one story, and the join advisor's exact prediction equals the
executed join.
"""

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.operators.dedup import (
    suffix_window_spans,
    winnowing_cap_accounting,
)
from data_misc_tools_spark.operators.etl import join_skew_report
from data_misc_tools_spark.operators.linkage import (
    fs_em_weights,
    fs_score_pairs,
)
from data_misc_tools_spark.operators.profile import (
    gini_concentration,
    mad_outlier_report,
    mutual_information,
)
from data_misc_tools_spark.operators.text import token_count
from data_misc_tools_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"
AGREE = ["f_lang", "f_len", "f_p24", "f_tok"]


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF_DIR, ["documents", "events", "orders"])


@pytest.fixture(scope="module")
def pairs(spark, tables):
    d = tables["documents"]
    recs = d.select("doc_id", "text", "lang", "n_chars").unionAll(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"),
                 "text", "lang", "n_chars")
    )
    feat = recs.select(
        "doc_id", "text", "lang", "n_chars",
        F.substring("text", 1, 8).alias("blk"),
        F.substring("text", 1, 24).alias("p24"),
        token_count("text").cast("long").alias("tok"),
    )
    a, b = [
        feat.select(*[F.col(c).alias(f"{c}_{s}") for c in feat.columns])
        for s in ("a", "b")
    ]
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b"))
               & (F.col("doc_id_a") < F.col("doc_id_b")))
        .select(
            F.col("doc_id_a").alias("doc_a"),
            F.col("doc_id_b").alias("doc_b"),
            (F.col("lang_a") == F.col("lang_b")).alias("f_lang"),
            (F.col("n_chars_a") == F.col("n_chars_b")).alias("f_len"),
            (F.col("p24_a") == F.col("p24_b")).alias("f_p24"),
            (F.col("tok_a") == F.col("tok_b")).alias("f_tok"),
            (F.col("text_a") == F.col("text_b")).alias("is_match"),
        )
        .localCheckpoint()
    )


def test_fs_decision_layer_separates_ground_truth(spark, pairs):
    """Every exact-dup pair (all four fields agree by construction)
    must outscore every pair that disagrees on any field, and the
    clone of each doc must be retrievable by thresholding at the
    minimum match score."""
    scored = fs_score_pairs(pairs, AGREE, "is_match").localCheckpoint()
    mm = scored.agg(
        F.min(F.when(F.col("is_match"), F.col("score_e6"))).alias("min_m"),
        F.max(F.when(~F.col("is_match") & (F.col("n_agree") < 4),
                     F.col("score_e6"))).alias("max_u_partial"),
    ).collect()[0]
    assert mm.min_m is not None and mm.max_u_partial is not None
    assert mm.min_m > mm.max_u_partial
    # thresholding at min_m recovers ONLY full-agreement pairs
    linked = scored.filter(F.col("score_e6") >= mm.min_m)
    assert linked.filter(F.col("n_agree") < 4).count() == 0
    # and every planted clone pair is linked
    clones = pairs.filter(F.col("doc_b") - F.col("doc_a") == 1000000)
    n_clones = clones.count()
    assert n_clones > 0
    linked_clones = linked.filter(F.col("doc_b") - F.col("doc_a") == 1000000)
    assert linked_clones.count() == n_clones


def test_em_agrees_with_supervised_direction(spark, pairs):
    """EM never sees is_match, yet every field's m must exceed its u
    and the prevalence must be within 2x of the labeled one."""
    wdf, lam = fs_em_weights(pairs, AGREE, max_iter=40)
    for r in wdf.collect():
        assert r.m > r.u, r.field
        assert r.w_agree > 0 > r.w_disagree, r.field
    truth = pairs.agg(F.avg(F.col("is_match").cast("double"))).collect()[0][0]
    assert truth / 2.5 < lam < truth * 2.5


def test_suffix_exposure_tells_the_same_story(spark, tables, pairs):
    """Docs whose FS-linked partner is an exact clone share their FULL
    text — so the suffix scan must flag their position-1 suffix at the
    window cap. Conversely a doc with zero ≥30-char duplicate spans
    cannot be any exact-dup pair's member."""
    d = tables["documents"]
    recs = d.select("doc_id", "text").unionAll(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    spans = suffix_window_spans(recs, min_len=30, window=64).localCheckpoint()
    first = {r.doc_id: r.match_len
             for r in spans.filter(F.col("pos") == 1).collect()}
    # every clone pair member with a >= 64-char text hits the cap at pos 1
    long_docs = {r.doc_id for r in
                 d.filter(F.length("text") >= 64).select("doc_id").collect()}
    for did in list(long_docs)[:50]:
        assert first.get(did) == 64, did
        assert first.get(did + 1000000) == 64, did
    # exact-dup FS pairs only exist among docs the suffix scan flagged
    flagged = {r.doc_id for r in spans.select("doc_id").distinct().collect()}
    ms = pairs.filter(F.col("is_match")).select("doc_a", "doc_b").collect()
    for r in ms:
        base_a = r.doc_a % 1000000
        if base_a in long_docs:
            assert r.doc_a in flagged and r.doc_b in flagged


def test_cap_audit_and_concentration_sanity(spark, tables):
    d = tables["documents"]
    acc = winnowing_cap_accounting(d, max_df=100).collect()[0]
    assert acc.dropped_pair_bound > acc.kept_pair_bound  # template corpus
    # fingerprint-mass concentration explains WHY the cap bites:
    # the df distribution is whale-dominated
    from data_misc_tools_spark.operators.dedup import winnowing_fingerprints

    dfc = (
        winnowing_fingerprints(d).select("doc_id", "fp").distinct()
        .groupBy("fp").agg(F.count("*").cast("long").alias("v"))
    )
    g = gini_concentration(dfc, "v", scale=1).collect()[0]
    assert g.gini > 0.5


def test_event_stats_stack_consistently(spark, tables):
    ev = tables["events"]
    mad = mad_outlier_report(ev, "value", scale=100).collect()[0]
    # the value column is exponential-ish: a heavy right tail puts
    # ~10% past 3 MAD — flagged, but never a majority
    assert 0 < mad.n_outliers < mad.n_rows // 4
    base = ev.select(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow")
    )
    mi = mutual_information(base, "event_type", "dow").collect()[0]
    # generator events are day-independent: MI well under 1% of H(A)
    assert mi.mi_e6 < mi.h_a_e6 // 100


def test_join_advisor_prediction_equals_executed_join(spark, tables):
    ev = tables["events"]
    rep = join_skew_report(ev, "user_id", ev, "user_id", top_k=5).collect()
    assert rep
    predicted = rep[0].total_pairs
    a = ev.select(F.col("user_id").alias("k"))
    actual = a.join(a, "k").count()
    assert predicted == actual
    assert sum(r.share_e6 for r in rep) <= 1_000_000 + 5  # half-up slack

"""Round-8 capstone: the record-linkage suite composed end-to-end on
the sf0.001 documents — candidate pairs → Fellegi–Sunter score →
reciprocal-best-match pruning → golden-record survivorship — with the
reconciliation assertions an ER team would demand before trusting the
pipeline (VERDICT r7 ask #7; examples/entity_resolution.py is the
narrated twin of this test):

  1. the FS threshold recovers EXACTLY the identical-text ground truth
     (no false links at the learned decision boundary on this corpus),
  2. RBM keeps one pair per identical-text clique — the two smallest
     ids — and every node appears at most once (the hub kill),
  3. golden_record elects the shared attribute with 2 votes in every
     matched cluster, and a NULLed member attribute ABSTAINS (the
     survivor is the observed value at votes = 1, never a NULL win),
  4. accounting: matched-pair members + unmatched records == the whole
     feed (the doomed ∪ kept partition proof).

Every stage is oracle-checked alone (fs_linkage_docs,
mutual_best_match_neardup, golden_record_orders); this pins the
COMPOSITION.
"""

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.operators.linkage import (
    fs_score_pairs,
    golden_record,
    mutual_best_match,
)
from data_misc_tools_spark.operators.text import token_count
from data_misc_tools_spark.session import load_tables

SF = "/root/testdata/sf0.001"
CLONE = 1_000_000


@pytest.fixture(scope="module")
def linked(spark):
    """The messy feed (docs ∪ clones), blocked pairs, FS scores, and
    the threshold-linked set — shared by the stage tests."""
    docs = load_tables(spark, SF, ["documents"])["documents"]
    recs = docs.select("doc_id", "text", "lang", "n_chars").unionAll(
        docs.select(
            (F.col("doc_id") + CLONE).alias("doc_id"),
            "text", "lang", "n_chars",
        )
    ).localCheckpoint()
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
    pairs = (
        a.join(
            b,
            (F.col("blk_a") == F.col("blk_b"))
            & (F.col("doc_id_a") < F.col("doc_id_b")),
        )
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
    scored = fs_score_pairs(
        pairs, ["f_lang", "f_len", "f_p24", "f_tok"], "is_match"
    ).localCheckpoint()
    thr = scored.filter("is_match").agg(F.min("score_e6")).collect()[0][0]
    linked = scored.filter(F.col("score_e6") >= thr).localCheckpoint()
    return {"recs": recs, "scored": scored, "thr": thr, "linked": linked}


def test_threshold_recovers_exact_ground_truth(linked):
    """At the learned boundary the linked set IS the identical-text
    set: every ground-truth pair scores >= thr by construction, and on
    this corpus no non-match reaches thr (the r7 finding, now pinned
    in composition)."""
    n_true = linked["scored"].filter("is_match").count()
    n_linked = linked["linked"].count()
    assert n_true > 0
    assert n_linked == n_true
    assert linked["linked"].filter(~F.col("is_match")).count() == 0


def test_rbm_keeps_two_smallest_per_clique(spark, linked):
    """Identical-text cliques (template corpus: groups can exceed the
    orig+clone pair) reduce under RBM to exactly ONE pair — the two
    smallest member ids (equal scores tie-break by partner ASC) — and
    no node appears twice. Precision over recall, deterministically."""
    rbm = mutual_best_match(
        linked["linked"].select("doc_a", "doc_b", "score_e6"),
        "doc_a", "doc_b", "score_e6",
    ).localCheckpoint()
    rows = rbm.collect()
    nodes = [n for r in rows for n in (r.node_a, r.node_b)]
    assert len(nodes) == len(set(nodes))  # at most one match per node

    # ground-truth cliques from the feed itself
    recs = linked["recs"]
    groups = (
        recs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .collect()
    )
    want = set()
    for g in groups:
        ids = sorted(g.ids)
        assert len(ids) >= 2  # every text occurs at least orig+clone
        want.add((ids[0], ids[1]))
    got = {(r.node_a, r.node_b) for r in rows}
    assert got == want
    # every RBM pair was a linked pair (subset relation)
    linked_set = {
        (r.doc_a, r.doc_b) for r in linked["linked"].collect()
    }
    assert got <= linked_set


def test_golden_record_eligibility_and_null_abstention(spark, linked):
    """Survivorship over the RBM clusters, with the clone member's
    lang NULLed for doc_id % 7 == 0 (a consolidation-time missing
    attribute): the elected lang is ALWAYS the observed value — a NULL
    never wins, it abstains (votes drop to 1) — and fully-observed
    attributes elect with votes == n_members."""
    rbm = mutual_best_match(
        linked["linked"].select("doc_a", "doc_b", "score_e6"),
        "doc_a", "doc_b", "score_e6",
    )
    members = rbm.select(
        F.col("node_a").alias("cluster"), F.col("node_a").alias("doc_id")
    ).unionAll(
        rbm.select(
            F.col("node_a").alias("cluster"), F.col("node_b").alias("doc_id")
        )
    )
    # perturb AFTER matching: clones with doc_id % 7 == 0 lose lang
    recs = linked["recs"].withColumn(
        "lang",
        F.when(
            (F.col("doc_id") >= CLONE) & (F.col("doc_id") % 7 == 0),
            F.lit(None).cast("string"),
        ).otherwise(F.col("lang")),
    )
    clustered = members.join(recs, "doc_id").localCheckpoint()
    gr = golden_record(clustered, "cluster", ["lang", "n_chars"])
    got = {(r.cluster, r.attr): r for r in gr.collect()}

    ref = {
        r.cluster: r
        for r in clustered.groupBy("cluster").agg(
            F.count("*").alias("n"),
            F.count("lang").alias("n_lang"),       # non-null only
            F.first("n_chars").alias("nc"),
            F.max("lang").alias("some_lang"),
        ).collect()
    }
    assert ref  # non-empty
    for cl, r in ref.items():
        g_nc = got[(cl, "n_chars")]
        # identical texts => identical n_chars: unanimous election
        assert g_nc.value == str(r.nc) and g_nc.votes == r.n
        g_lang = got[(cl, "lang")]
        assert g_lang.value is not None  # NULL never wins
        assert g_lang.n_obs == r.n_lang
        if r.n_lang < r.n:
            # an abstained member: observed value survives at fewer votes
            assert g_lang.votes == r.n_lang
            assert g_lang.value == r.some_lang
    # at least one cluster actually exercised the abstention path
    assert any(r.n_lang < r.n for r in ref.values())


def test_partition_accounting(spark, linked):
    """doomed ∪ kept: RBM-matched members plus unmatched records
    partition the feed exactly — nothing dropped, nothing doubled."""
    rbm = mutual_best_match(
        linked["linked"].select("doc_a", "doc_b", "score_e6"),
        "doc_a", "doc_b", "score_e6",
    )
    recs = linked["recs"]
    matched = rbm.select(F.col("node_a").alias("doc_id")).unionAll(
        rbm.select(F.col("node_b").alias("doc_id"))
    )
    n_matched = matched.count()
    assert matched.distinct().count() == n_matched
    unmatched = recs.join(matched, "doc_id", "left_anti")
    assert n_matched + unmatched.count() == recs.count()
    # and the two sets are disjoint by construction of left_anti
    assert unmatched.join(matched, "doc_id").count() == 0

"""Runnable entity-resolution walkthrough.
`python examples/entity_resolution.py [sf_dir]`.

The round-7 record-linkage suite composed end to end, the way an ER
team deduplicates a messy feed against itself:

  blocking (prefix key)  ->  field-agreement features
    ->  Fellegi–Sunter weights, supervised (exact-text ground truth)
    ->  the SAME weights learned label-free (Winkler EM)
    ->  score + threshold  ->  duplicate-substring exposure cross-check
    ->  join-skew pre-flight for the blocking key
    ->  reciprocal-best-match pruning (the hub kill)
    ->  golden-record survivorship per matched cluster

The full chain is pinned with reconciliation assertions in
tests/test_curation_round8_e2e.py; every stage is the same
oracle-checked operator the catalog grades — this script only composes
them and prints compact reports.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.dedup import duplicate_substring_docs
    from data_misc_tools_spark.operators.etl import join_skew_report
    from data_misc_tools_spark.operators.linkage import (
        fellegi_sunter_weights,
        fs_em_weights,
        fs_score_pairs,
    )
    from data_misc_tools_spark.operators.text import token_count
    from data_misc_tools_spark.session import build_session, load_tables

    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]

    # A "messy feed": the corpus plus a cloned copy (the classic
    # dedup-against-self shape; clones are the ground-truth matches).
    recs = docs.select("doc_id", "text", "lang", "n_chars").unionAll(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"),
                    "text", "lang", "n_chars")
    )

    # 1. blocking + agreement features -------------------------------
    feat = recs.select(
        "doc_id", "text", "lang", "n_chars",
        F.substring("text", 1, 8).alias("blk"),
        F.substring("text", 1, 24).alias("p24"),
        token_count("text").cast("long").alias("tok"),
    )
    skew = join_skew_report(feat, "blk", feat, "blk", top_k=3).collect()
    print("== blocking-key pre-flight (join_skew_report) ==")
    for r in skew:
        print(f"  block {r.key!r}: {r.c_left} x {r.c_right} -> {r.pairs} pairs "
              f"({r.share_e6 / 1e4:.2f}% of {r.total_pairs})")

    a, b = [
        feat.select(*[F.col(c).alias(f"{c}_{s}") for c in feat.columns])
        for s in ("a", "b")
    ]
    pairs = (
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
    agree = ["f_lang", "f_len", "f_p24", "f_tok"]

    # 2. supervised Fellegi–Sunter weights ---------------------------
    print("\n== supervised FS weights (exact-text ground truth) ==")
    for r in fellegi_sunter_weights(pairs, agree, "is_match").collect():
        print(f"  {r.field:7s} m={r.n_agree_match}/{r.n_match}"
              f" u={r.n_agree_unmatch}/{r.n_unmatch}"
              f" w_agree={r.w_agree_e6 / 1e6:+.3f}"
              f" w_disagree={r.w_disagree_e6 / 1e6:+.3f}")

    # 3. the same weights, label-free (EM) ---------------------------
    wdf, lam = fs_em_weights(pairs, agree, max_iter=40)
    print(f"\n== EM weights (no labels; lambda={lam:.4f}) ==")
    for r in wdf.orderBy("field").collect():
        print(f"  {r.field:7s} m={r.m:.4f} u={r.u:.4f}"
              f" w_agree={r.w_agree:+.3f} w_disagree={r.w_disagree:+.3f}")

    # 4. score + threshold -------------------------------------------
    scored = fs_score_pairs(pairs, agree, "is_match").localCheckpoint()
    thr = scored.filter("is_match").agg(F.min("score_e6")).collect()[0][0]
    linked = scored.filter(F.col("score_e6") >= thr)
    n_linked = linked.count()
    n_true = scored.filter("is_match").count()
    print(f"\n== decision ==  threshold={thr / 1e6:.3f} nats -> "
          f"{n_linked} links ({n_true} ground-truth matches)")

    # 5. exposure cross-check ----------------------------------------
    exposure = duplicate_substring_docs(recs, min_len=30, window=64)
    capped = exposure.filter("max_match_len = 64").count()
    print(f"\n== ExactSubstr cross-check ==  "
          f"{capped} records carry a 64+-char duplicated span "
          f"(every clone pair member should)")

    # 6. reciprocal-best-match pruning --------------------------------
    from data_misc_tools_spark.operators.linkage import (
        golden_record,
        mutual_best_match,
    )

    rbm = mutual_best_match(
        linked.select("doc_a", "doc_b", "score_e6"),
        "doc_a", "doc_b", "score_e6",
    ).localCheckpoint()
    n_rbm = rbm.count()
    print(f"\n== reciprocal best match ==  {n_linked} links -> "
          f"{n_rbm} mutual pairs (one per identical-text clique; "
          f"hub links pruned)")

    # 7. golden-record survivorship -----------------------------------
    members = rbm.select(
        F.col("node_a").alias("cluster"), F.col("node_a").alias("doc_id")
    ).unionAll(
        rbm.select(
            F.col("node_a").alias("cluster"), F.col("node_b").alias("doc_id")
        )
    )
    gr = golden_record(members.join(recs, "doc_id"), "cluster",
                       ["lang", "n_chars"])
    unanimous = gr.filter("attr = 'n_chars' AND votes = n_obs").count()
    n_cl = gr.select("cluster").distinct().count()
    print(f"\n== golden record ==  {n_cl} clusters canonicalized; "
          f"n_chars unanimous in {unanimous}/{n_cl} "
          f"(identical texts vote identically)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-4 curation operators composed end-to-end, the way a web-crawl
pretraining build uses them, on the sf0.001 tables:

  1. URL canonicalization + exact URL dedup      (web.canonical_url)
  2. card-number PII gate (Luhn-validated)       (text.card_scan)
  3. semantic dedup over embeddings              (similarity.semantic_dedup)
  4. semantic decontamination vs an eval slice   (contamination.semantic_contamination)
  5. contrastive negatives for the survivors     (sampling.negative_samples)

Every stage is oracle- or unit-tested alone; this pins the
COMPOSITION: ids flow, attrition is monotone, stages stay consistent
with each other (a semantically-contaminated id can never appear among
the kept training docs), and the whole job is deterministic.
"""

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.operators import similarity as S
from data_misc_tools_spark.operators.contamination import semantic_contamination
from data_misc_tools_spark.operators.sampling import negative_samples
from data_misc_tools_spark.operators.text import card_scan
from data_misc_tools_spark.operators.web import canonical_url
from data_misc_tools_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]

    # 1. synthesize crawl URLs (4 messy variants per family, as in the
    #    catalog demo), canonicalize, keep the smallest doc_id per
    #    canonical URL
    k = (F.col("doc_id") % 100).cast("string")
    urls = docs.select(
        "doc_id", "text",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit("https://s"), k, F.lit(".ex.com/p/"), k))
        .otherwise(F.concat(F.lit("HTTPS://WWW.S"), k,
                            F.lit(".EX.COM:443/p/"), k, F.lit("/?utm_source=x")))
        .alias("url"),
    ).withColumn("canon", canonical_url("url"))
    first = urls.groupBy("canon").agg(F.min("doc_id").alias("doc_id"))
    url_deduped = urls.join(first, ["canon", "doc_id"]).select("doc_id", "text")

    # 2. PII gate: drop documents containing a Luhn-valid card number
    #    (plant one in a known doc to prove the gate fires)
    planted = url_deduped.withColumn(
        "text",
        F.when(F.col("doc_id") == 0,
               F.concat(F.col("text"), F.lit(" pay 4539 1488 0343 6467 now")))
        .otherwise(F.col("text")),
    )
    carded = card_scan(planted).where("luhn").select("doc_id").distinct()
    pii_clean = planted.join(carded, "doc_id", "left_anti")

    # 3+4. embedding-side: semantic dedup keeps one survivor per
    #      near-dup family; decontamination drops anything close to
    #      the eval slice
    ev = emb.where(F.col("vec_id") % 50 == 0)
    tr = emb.where(F.col("vec_id") % 50 != 0)
    sem = S.semantic_dedup(tr, k_clusters=8, threshold=0.3)
    sem_kept = sem.where("keep").select(F.col("vec_id").alias("doc_id"))
    contaminated = semantic_contamination(tr, ev, threshold=0.3).select(
        F.col("train_id").alias("doc_id")
    )
    survivors = (
        pii_clean.join(sem_kept, "doc_id")
        .join(contaminated, "doc_id", "left_anti")
    )

    # 5. contrastive negatives for the surviving docs (query = family)
    pos = survivors.select(
        (F.col("doc_id") % 20).alias("query_id"), F.col("doc_id").alias("pos_id")
    )
    negs = negative_samples(pos, n_items=500, k=4)
    return {
        "docs": docs, "url_deduped": url_deduped, "pii_clean": pii_clean,
        "sem": sem, "contaminated": contaminated,
        "survivors": survivors, "negs": negs,
    }


def test_attrition_monotone_and_nonempty(curated):
    n0 = curated["docs"].count()
    n1 = curated["url_deduped"].count()
    n2 = curated["pii_clean"].count()
    n3 = curated["survivors"].count()
    assert n0 >= n1 >= n2 >= n3 > 0
    assert n1 == 100  # 4-variants-per-family URL dedup collapses to families


def test_pii_gate_fired_on_planted_card(curated):
    assert curated["pii_clean"].where("doc_id = 0").count() == 0


def test_contaminated_never_survives(curated):
    bad = curated["survivors"].join(
        curated["contaminated"], "doc_id"
    ).count()
    assert bad == 0


def test_semantic_dedup_drops_were_applied(curated):
    dropped = {r.vec_id for r in curated["sem"].where("NOT keep").collect()}
    surviving = {r.doc_id for r in curated["survivors"].collect()}
    assert dropped and not (dropped & surviving)


def test_negatives_cover_surviving_queries(curated):
    q_expected = {
        r.query_id for r in curated["survivors"].select(
            (F.col("doc_id") % 20).alias("query_id")
        ).distinct().collect()
    }
    negs = curated["negs"].collect()
    by_q = {}
    for r in negs:
        by_q.setdefault(r.query_id, set()).add(r.neg_id)
    assert set(by_q) == q_expected
    assert all(len(v) == 4 for v in by_q.values())


def test_composition_is_deterministic(spark, curated):
    a = sorted(tuple(r) for r in curated["survivors"].select("doc_id").collect())
    b = sorted(
        tuple(r)
        for r in curated["survivors"].select("doc_id").repartition(13).collect()
    )
    assert a == b

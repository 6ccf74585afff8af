"""Round-5 curation operators composed end-to-end, the way a
pretraining data build uses them, on the sf0.001 tables:

  1. CCNet perplexity tertiles per language        (text.unigram_nll_scores + ntile)
  2. keep head+middle (drop the worst tertile)
  3. domain tagging over the survivors             (text.dictionary_tag)
  4. EXACT 80/10/10 stratified split by language   (sampling.exact_stratified_split)
  5. rendezvous-shard the train split for serving  (etl.rendezvous_assign)
  6. k-means structure over the embedding space    (similarity.kmeans_lloyd_e6)
     + MMR diversified exemplars per corpus        (similarity.mmr_rerank)

Every stage is oracle-tested alone; this pins the COMPOSITION:
attrition is exact (tertile math), split counts are exact per
surviving stratum, shard placement covers every train doc, and the
whole pipeline is deterministic end-to-end.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window as W

from data_misc_tools_spark.operators import similarity as S
from data_misc_tools_spark.operators import text as T
from data_misc_tools_spark.operators.etl import rendezvous_assign
from data_misc_tools_spark.operators.sampling import exact_stratified_split
from data_misc_tools_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pipeline(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]

    # 1-2. CCNet tertiles; drop the high-perplexity tail per language
    scored = T.unigram_nll_scores(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    tiled = scored.withColumn(
        "tile", F.ntile(3).over(W.partitionBy("lang").orderBy("avg_nll", "doc_id"))
    )
    kept = tiled.where(F.col("tile") <= 2).select("doc_id", "lang")

    # 3. domain tagging on survivors
    terms = spark.createDataFrame(
        [("join", "joins"), ("merge", "joins"), ("stream", "streaming"),
         ("window", "streaming"), ("table", "storage"), ("scan", "storage")],
        "term string, topic string",
    )
    tags = T.dictionary_tag(docs.join(kept, ["doc_id", "lang"]), terms)

    # 4. exact stratified split of the survivors
    split = exact_stratified_split(
        kept, "lang", "doc_id", {"train": 80, "val": 10, "test": 10}
    )

    # 5. rendezvous-shard the train docs
    train = split.where(F.col("split") == "train")
    sharded = rendezvous_assign(train, ["s1", "s2", "s3"], "doc_id")

    return {
        "docs": docs, "emb": emb, "kept": kept, "tiled": tiled,
        "tags": tags, "split": split, "train": train, "sharded": sharded,
    }


class TestCurationRound5:
    def test_tail_attrition_is_exact_tertile_math(self, pipeline):
        per_lang = {
            r.lang: (r.total, r.kept)
            for r in pipeline["tiled"]
            .groupBy("lang")
            .agg(
                F.count("*").alias("total"),
                F.sum((F.col("tile") <= 2).cast("int")).alias("kept"),
            )
            .collect()
        }
        for lang, (total, kept) in per_lang.items():
            # ntile(3): tiles 1,2 hold ceil parts — kept = total - floor(total/3)
            assert kept == total - total // 3, lang

    def test_split_counts_exact_per_surviving_stratum(self, pipeline):
        counts = {
            (r.lang, r.split): r.n
            for r in pipeline["split"]
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        strata = {lang for lang, _ in counts}
        for lang in strata:
            n = sum(v for (lg, _), v in counts.items() if lg == lang)
            assert counts.get((lang, "train"), 0) == n * 80 // 100
            assert counts.get((lang, "val"), 0) == n * 90 // 100 - n * 80 // 100
            assert counts.get((lang, "test"), 0) == n - n * 90 // 100

    def test_tags_only_cover_survivors(self, pipeline):
        tagged_ids = {r.doc_id for r in pipeline["tags"].select("doc_id").distinct().collect()}
        kept_ids = {r.doc_id for r in pipeline["kept"].collect()}
        assert tagged_ids <= kept_ids

    def test_every_train_doc_gets_exactly_one_shard(self, pipeline):
        n_train = pipeline["train"].count()
        sharded = pipeline["sharded"]
        assert sharded.count() == n_train
        assert sharded.where(F.col("shard").isin("s1", "s2", "s3")).count() == n_train
        # and the placement is non-degenerate (every shard used)
        used = {r.shard for r in sharded.select("shard").distinct().collect()}
        assert used == {"s1", "s2", "s3"}

    def test_kmeans_clusters_cover_corpus_and_mmr_picks_are_spread(self, pipeline, spark):
        km = S.kmeans_lloyd_e6(pipeline["emb"], k=4, iters=2)
        n = pipeline["emb"].count()
        assert km.count() == n
        assert km.select("cluster_id").distinct().count() <= 4
        picks = S.mmr_rerank(
            pipeline["emb"], query_id=0, k=8, n_candidates=40, lam_pct=30
        )
        rows = picks.collect()
        assert len(rows) == 8
        assert len({r.vec_id for r in rows}) == 8  # no repeats
        # MMR output joins back onto the k-means structure: the 8
        # diversified exemplars should span more than one cluster
        chosen = km.join(picks, "vec_id").select("cluster_id").distinct().count()
        assert chosen >= 2

    def test_pipeline_is_deterministic(self, pipeline, spark):
        docs = pipeline["docs"]
        again = exact_stratified_split(
            pipeline["kept"], "lang", "doc_id",
            {"train": 80, "val": 10, "test": 10},
        )
        a = sorted((r.doc_id, r.split) for r in pipeline["split"].collect())
        b = sorted((r.doc_id, r.split) for r in again.collect())
        assert a == b

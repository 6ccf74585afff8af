"""Sequence packing: budget invariants, determinism, variant agreement."""

import pyspark.sql.functions as F

from data_misc_tools_spark.operators import packing as PK


def _docs(spark, sf_dir):
    from data_misc_tools_spark.session import load_tables

    return load_tables(spark, sf_dir, ["documents"])["documents"]


def test_pack_exact_respects_budget(spark, sf_dir):
    d = _docs(spark, sf_dir)
    max_doc = d.agg(F.max("n_chars")).first()[0]
    budget = max(4000, max_doc)  # every doc fits alone
    packed = PK.pack_exact(d, "doc_id", "n_chars", budget=budget, shards=4)
    over = (
        packed.groupBy("shard", "batch_id")
        .agg(F.sum("n_chars").alias("tok"))
        .filter(F.col("tok") > budget)
        .count()
    )
    assert over == 0


def test_pack_exact_preserves_every_doc_once(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = PK.pack_exact(d, "doc_id", "n_chars", budget=4000, shards=4)
    assert packed.count() == d.count()
    assert packed.select("doc_id").distinct().count() == d.count()


def test_pack_exact_stable_under_repartition(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = PK.pack_exact(d, "doc_id", "n_chars", budget=4000, shards=4)
    b = PK.pack_exact(d.repartition(11), "doc_id", "n_chars", budget=4000, shards=4)
    rows = lambda df: {  # noqa: E731
        (r.shard, r.batch_id, r.doc_id) for r in df.collect()
    }
    assert rows(a) == rows(b)


def test_cumsum_variant_overflow_bounded_by_one_doc(spark, sf_dir):
    """pack_by_cumsum batches may overflow the budget, but never by
    more than the largest single document in the batch."""
    d = _docs(spark, sf_dir)
    packed = PK.pack_by_cumsum(d, "doc_id", "n_chars", budget=4000, shards=8)
    stats = (
        packed.groupBy("shard", "batch_id")
        .agg(F.sum("n_chars").alias("tok"), F.max("n_chars").alias("mx"))
        .filter(F.col("tok") - F.col("mx") >= 4000)
        .count()
    )
    assert stats == 0


def test_pack_exact_batches_are_contiguous(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = PK.pack_exact(d, "doc_id", "n_chars", budget=4000, shards=4)
    per_shard = (
        packed.groupBy("shard")
        .agg(
            F.countDistinct("batch_id").alias("n_batches"),
            (F.max("batch_id") + 1).alias("max_plus1"),
        )
        .filter(F.col("n_batches") != F.col("max_plus1"))
        .count()
    )
    assert per_shard == 0  # batch ids are 0..n-1 with no holes

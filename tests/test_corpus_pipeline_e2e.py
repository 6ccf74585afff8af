"""The LLM-training-data pipeline end-to-end on this engine: the
corpus operators composed the way a real pretraining-data build runs
them, on the sf0.001 documents table.

  1. normalize whitespace                (text.clean_text)
  2. language identification            (text.language_id)
  3. quality scoring + cutoff filter    (text.quality_features/score_cutoff)
  4. exact dedup                        (dedup.exact_dedup)
  5. benchmark decontamination          (contamination.decontaminate)
  6. language-mixture resampling        (sampling.mixture_resample)
  7. sequence packing into token budgets (packing.pack_by_cumsum)

Every stage is individually oracle- or unit-tested; this test pins the
COMPOSITION: schemas flow, attrition is monotone where it must be, the
composed job stays JVM-only, and the final packed batches respect the
token budget.
"""

import pyspark.sql.functions as F
import pytest

from data_misc_tools_spark.operators import contamination as C
from data_misc_tools_spark.operators import dedup as D
from data_misc_tools_spark.operators import packing as P
from data_misc_tools_spark.operators import sampling as SA
from data_misc_tools_spark.operators import text as T
from data_misc_tools_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pipeline(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    n0 = docs.count()

    cleaned = docs.withColumn("text", T.clean_text("text"))

    lang = T.language_id(cleaned)
    with_lang = cleaned.drop("lang").join(lang.select("doc_id", "lang_pred"), "doc_id")

    scored = with_lang.join(
        T.quality_features(with_lang).select("doc_id", "quality_score"), "doc_id"
    )
    cutoff = T.score_cutoff(scored, lower_num=1, lower_den=4)  # drop worst quartile
    filtered = scored.filter(F.col("quality_score") > F.lit(cutoff))

    deduped = D.exact_dedup(filtered)

    ev = deduped.filter(F.col("doc_id") % 29 == 3)
    train = deduped.filter(F.col("doc_id") % 29 != 3)
    decontaminated = C.decontaminate(train, ev, n=4, threshold_times=10)

    mixed = SA.mixture_resample(
        decontaminated,
        strata_col="lang_pred",
        key_col="doc_id",
        weights={"en": 1, "de": 2, "es": 2, "fr": 2, "zh": 2, "und": 1},
        target_rows=200,
        salt="mx",
    )

    with_tokens = mixed.withColumn("n_tok", T.token_count("text"))
    packed = P.pack_by_cumsum(with_tokens, "doc_id", "n_tok", budget=512, shards=8)
    return {
        "n0": n0,
        "filtered": filtered,
        "deduped": deduped,
        "train": train,
        "decontaminated": decontaminated,
        "mixed": mixed,
        "packed": packed,
    }


def test_attrition_is_monotone(pipeline):
    n0 = pipeline["n0"]
    nf = pipeline["filtered"].count()
    nd = pipeline["deduped"].count()
    nt = pipeline["train"].count()
    nc = pipeline["decontaminated"].count()
    nm = pipeline["mixed"].count()
    assert n0 > nf >= nd >= nt >= nc >= nm > 0
    # the quality cutoff drops at most a quartile (ties excluded)
    assert nf >= n0 * 0.70


def test_packed_batches_respect_budget(pipeline):
    packed = pipeline["packed"]
    over = (
        packed.groupBy("shard", "batch_id")
        .agg(F.sum("n_tok").alias("total"))
        # cumsum next-fit may overflow by at most one document
        .filter(F.col("total") >= 512 + 200)
        .count()
    )
    assert over == 0
    assert packed.count() == pipeline["mixed"].count()  # packing loses nothing


def test_composed_job_stays_jvm_only(pipeline):
    plan = pipeline["packed"]._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_is_deterministic(spark, pipeline):
    """Re-deriving the mixed stage from scratch yields the identical
    document set — every stage is a pure function of the data."""
    ids_a = sorted(r.doc_id for r in pipeline["mixed"].select("doc_id").collect())
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    cleaned = docs.withColumn("text", T.clean_text("text"))
    lang = T.language_id(cleaned)
    with_lang = cleaned.drop("lang").join(lang.select("doc_id", "lang_pred"), "doc_id")
    scored = with_lang.join(
        T.quality_features(with_lang).select("doc_id", "quality_score"), "doc_id"
    )
    cutoff = T.score_cutoff(scored, lower_num=1, lower_den=4)
    filtered = scored.filter(F.col("quality_score") > F.lit(cutoff))
    deduped = D.exact_dedup(filtered)
    ev = deduped.filter(F.col("doc_id") % 29 == 3)
    train = deduped.filter(F.col("doc_id") % 29 != 3)
    decon = C.decontaminate(train, ev, n=4, threshold_times=10)
    mixed = SA.mixture_resample(
        decon, "lang_pred", "doc_id",
        {"en": 1, "de": 2, "es": 2, "fr": 2, "zh": 2, "und": 1}, 200, salt="mx",
    )
    ids_b = sorted(r.doc_id for r in mixed.select("doc_id").collect())
    assert ids_a == ids_b


def test_release_phase_audit_split_export(spark, pipeline):
    """Release phase on the mixed corpus: drift audit vs the pre-mix
    corpus, deterministic split, fingerprint conservation across the
    split, and WebDataset tar export that reads back complete."""
    import io
    import tarfile

    from data_misc_tools_spark.operators.etl import dataset_fingerprint
    from data_misc_tools_spark.operators.export import tar_shard_export
    from data_misc_tools_spark.operators.profile import corpus_drift

    mixed = pipeline["mixed"]
    deduped = pipeline["deduped"]

    # 1. drift audit: resampling only removes docs, so the mixed token
    # count shrinks; smoothed KL is non-negative (mod e6 rounding)
    drift = corpus_drift(deduped, mixed).collect()[0]
    assert drift.n_tokens_b < drift.n_tokens_a
    assert drift.n_new_terms == 0  # mixing introduces no new vocab
    assert drift.kl_b_from_a > -1e-4

    # 2. split + fingerprint conservation: the three splits partition
    # the corpus EXACTLY (checksum of the union == checksum of input)
    split = SA.split_assign(mixed, "doc_id", salt="rel")
    parts = [split.where(F.col("split") == s).drop("split")
             for s in ("train", "val", "test")]
    fp_all = dataset_fingerprint(mixed, ["doc_id", "text"]).collect()[0]
    fp_union = dataset_fingerprint(
        parts[0].unionAll(parts[1]).unionAll(parts[2]), ["doc_id", "text"]
    ).collect()[0]
    assert (fp_union.n_rows, fp_union.fingerprint) == (fp_all.n_rows, fp_all.fingerprint)

    # 3. export the train split as tar shards; members read back 1:1
    train = parts[0].select(
        "doc_id",
        F.concat(F.lit("doc_"), F.col("doc_id"), F.lit(".txt")).alias("name"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    n_train = train.count()
    shards = tar_shard_export(train, n_shards=4).collect()
    seen = set()
    for r in shards:
        with tarfile.open(fileobj=io.BytesIO(bytes(r.tar))) as tf:
            for m in tf.getmembers():
                seen.add(int(m.name.split("_")[1].split(".")[0]))
    assert len(seen) == n_train > 0

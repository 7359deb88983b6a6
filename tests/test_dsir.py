"""DSIR importance resampling (operators/dsir.py): Mitchell log2
closed forms, the moves-toward-target differential property, and the
selection direction (target-language documents are over-represented
among the kept quarter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.dsir import (
    DSIR_BUCKETS,
    dsir_features,
    dsir_weights,
    log2m,
    log_ratio_table,
)
from bigdatasmallprice_spark.operators.distill import SPARK_DIV
from bigdatasmallprice_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_log2m_closed_forms(spark):
    """Exact integer part, Mitchell fraction: log2m(1)=0, (2)=1000,
    (3)=1500, (8)=3000, (12)=3000+rdiv(4000,8)=3500."""
    row = spark.sql(
        "SELECT "
        + ", ".join(
            f"{log2m(str(x), SPARK_DIV)} AS v{x}" for x in (1, 2, 3, 8, 12)
        )
    ).collect()[0]
    assert (row.v1, row.v2, row.v3, row.v8, row.v12) == (0, 1000, 1500, 3000, 3500)


def _bucket_dist(feats):
    """{bucket: probability} of a feature frame."""
    rows = feats.groupBy("bucket").agg(F.sum("f").alias("c")).collect()
    total = sum(r.c for r in rows)
    return {r.bucket: r.c / total for r in rows}


def test_kept_corpus_moves_toward_target_distribution(spark):
    """The point of importance resampling: the kept documents' hashed
    feature distribution moves toward the target's. Measured as the
    PROJECTION onto the (target - raw) difference direction — the
    noise-robust statistic: the kept quarter is 4x smaller than the
    corpus, so raw L1/L2 distances are dominated by its sampling
    variance (zero-mean under the projection), while the systematic
    shift the resampler is supposed to produce lies exactly along
    target - raw. Pinned: proj(kept) > proj(raw) (measured ~2.6x /
    ~11x apart at sf0.001 / sf0.01)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = dsir_features(docs).persist()
    target = _bucket_dist(feats.filter(F.col("lang") == "en"))
    raw = _bucket_dist(feats)

    sample = all_queries()["dsir_importance_sample"].fn(spark, SF)
    kept_ids = sample.filter(F.col("keep") == 1).select("doc_id")
    kept = _bucket_dist(feats.join(kept_ids, "doc_id"))

    def proj(d):
        keys = set(target) | set(raw) | set(d)
        return sum(
            (target.get(k, 0) - raw.get(k, 0)) * d.get(k, 0) for k in keys
        )

    assert proj(kept) > proj(raw), (proj(kept), proj(raw))


def test_target_language_overrepresented_in_sample(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    sample = all_queries()["dsir_importance_sample"].fn(spark, SF)
    j = sample.join(docs, "doc_id")
    overall = docs.filter(F.col("lang") == "en").count() / docs.count()
    kept = j.filter(F.col("keep") == 1)
    kept_en = kept.filter(F.col("lang") == "en").count() / kept.count()
    assert kept_en > overall, (kept_en, overall)
    # the keep count is exactly the contracted quarter
    assert kept.count() == docs.count() // 4


def test_weights_deterministic_and_model_sized_ratio_table(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = dsir_features(docs).persist()
    lr = log_ratio_table(feats, "lang = 'en'")
    assert lr.count() <= DSIR_BUCKETS
    a = sorted(map(tuple, dsir_weights(feats, lr).collect()))
    b = sorted(map(tuple, dsir_weights(feats, lr).collect()))
    assert a == b


def test_curation_pipeline_v2_funnel_is_monotone_and_nonempty(spark):
    rows = all_queries()["curation_pipeline_v2"].fn(spark, SF).collect()
    assert len(rows) == 20  # every source reports
    assert sum(r.n_canonical for r in rows) > 0
    assert sum(r.tokens_final for r in rows) > 0
    for r in rows:
        assert (
            r.n_docs >= r.n_gopher >= r.n_lm >= r.n_dsir >= r.n_canonical >= 0
        ), r
    # the model gates actually cut something corpus-wide
    assert sum(r.n_lm for r in rows) < sum(r.n_gopher for r in rows)
    assert sum(r.n_dsir for r in rows) < sum(r.n_lm for r in rows)


def test_curation_pipeline_v3_adds_a_real_semantic_stage(spark):
    """v3 = v2 + SemDeDup over the canonicals: per source the funnel
    stays monotone through the new stage, the v2 prefix is unchanged,
    and the semantic stage prunes SOMETHING corpus-wide (the bridge's
    pooled vectors find near-dups the exact bag-fingerprint missed)."""
    v3 = all_queries()["curation_pipeline_v3"].fn(spark, SF).collect()
    v2 = {r.source: r for r in all_queries()["curation_pipeline_v2"].fn(spark, SF).collect()}
    assert len(v3) == 20
    for r in v3:
        assert (
            r.n_docs >= r.n_gopher >= r.n_lm >= r.n_dsir
            >= r.n_canonical >= r.n_semantic >= 0
        ), r
        # the v2 prefix is bit-identical (shared _v2_gated)
        p = v2[r.source]
        assert (p.n_docs, p.n_gopher, p.n_lm, p.n_dsir, p.n_canonical) == (
            r.n_docs, r.n_gopher, r.n_lm, r.n_dsir, r.n_canonical
        )
    assert sum(r.n_semantic for r in v3) < sum(r.n_canonical for r in v3)
    assert sum(r.n_semantic for r in v3) > 0
    assert sum(r.tokens_final_sem for r in v3) > 0

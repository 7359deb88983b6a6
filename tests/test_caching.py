"""Cache-release discipline: a long-lived session running many
persisting queries must not accumulate cache entries."""

from __future__ import annotations

from bigdatasmallprice_spark.caching import (
    persistent_rdd_ids,
    released_caches,
    run_query_released,
)

# ten registered queries that persist() internally (the round-4
# pair-aggregate window rewrites removed the span/eval/line persists,
# so this list names queries that still genuinely cache)
PERSISTING = [
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dedup_incremental",
    "bloom_shingle_prefilter",
    "semantic_dedup",
    "neardup_clusters",
    "dedup_canonical",
    "corpus_curation_summary",
    "embedding_covariance",
    "hybrid_search_rrf",
    # r10: the two heaviest r9 persisters (ADVICE item) — several
    # persists each across the KN/DSIR model chains
    "dsir_importance_sample",
    "curation_pipeline_v2",
]

SF = "/root/testdata/sf0.001"


def test_back_to_back_persisting_queries_stay_bounded(spark):
    spark.catalog.clearCache()
    base = persistent_rdd_ids(spark)
    for name in PERSISTING:
        rows = run_query_released(spark, name, SF)
        assert rows  # the query actually ran
        added = persistent_rdd_ids(spark) - base
        assert not added, (name, added)


def test_released_caches_spares_preexisting(spark):
    from pyspark.sql import functions as F

    pre = spark.range(100).select(F.col("id")).persist()
    pre.count()
    pre_ids = persistent_rdd_ids(spark)
    with released_caches(spark):
        inner = spark.range(50).persist()
        inner.count()
        assert persistent_rdd_ids(spark) > pre_ids
    after = persistent_rdd_ids(spark)
    assert pre_ids <= after and len(after) == len(pre_ids)
    pre.unpersist()


def test_serving_run_registered_releases_caches(spark):
    from bigdatasmallprice_spark.serving import run_registered

    spark.catalog.clearCache()
    base = persistent_rdd_ids(spark)
    rows = run_registered(spark, "minhash_lsh_pairs", SF)
    assert isinstance(rows, list)
    assert not (persistent_rdd_ids(spark) - base)

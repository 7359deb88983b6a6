"""Hard-negative triplet mining (operators/similarity.py::
hard_triplets): label semantics, hardness, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_triplet_label_semantics_and_hardness(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "label"
    )
    trips = all_queries()["triplet_mining"].fn(spark, SF)
    labeled = (
        trips.join(
            emb.select(F.col("vec_id").alias("anchor_id"), F.col("label").alias("al")),
            "anchor_id",
        )
        .join(
            emb.select(F.col("vec_id").alias("pos_id"), F.col("label").alias("pl")),
            "pos_id",
        )
        .join(
            emb.select(F.col("vec_id").alias("neg_id"), F.col("label").alias("nl")),
            "neg_id",
        )
    )
    rows = labeled.collect()
    assert rows, "no triplets mined"
    for r in rows:
        assert r.al == r.pl, "positive must share the anchor's label"
        assert r.al != r.nl, "negative must differ from the anchor's label"
        # neither member is the anchor itself
        assert r.pos_id != r.anchor_id and r.neg_id != r.anchor_id


def test_triplets_deterministic(spark):
    q = all_queries()["triplet_mining"].fn
    a = sorted(map(tuple, q(spark, SF).collect()))
    b = sorted(map(tuple, q(spark, SF).collect()))
    assert a == b

"""word2vec on text (operators/word2vec.py): pair-corpus closed form,
and the training objective actually separates positives from the
deterministic negatives relative to init."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.sgns import (
    sgns_fit,
    sgns_init,
    sgns_training_pairs,
)
from bigdatasmallprice_spark.operators.word2vec import (
    vocab_nodes,
    word_skipgram_pairs,
)

SF = "/root/testdata/sf0.001"


def test_pair_corpus_closed_form(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a  b")],  # doc 1 has an empty token: filtered
        "doc_id long, text string",
    )
    got = {
        (r.center, r.context): r.cnt
        for r in word_skipgram_pairs(docs, window=2).collect()
    }
    # doc 0 (a b c, window 2): all ordered pairs; doc 1 (a b): both
    assert got == {
        ("a", "b"): 2,
        ("b", "a"): 2,
        ("a", "c"): 1,
        ("c", "a"): 1,
        ("b", "c"): 1,
        ("c", "b"): 1,
    }
    assert sorted(r.node for r in vocab_nodes(docs).collect()) == ["a", "b", "c"]


def _mean_dot(emb, train, ym):
    u = emb.select(F.col("node").alias("center"), F.col("u").alias("uu"), "dim")
    v = emb.select(F.col("node").alias("other"), F.col("v").alias("vv"), "dim")
    return (
        train.filter(F.col("ym") == ym)
        .join(u, "center")
        .join(v, ["other", "dim"])
        .groupBy("center", "other")
        .agg(F.sum(F.col("uu") * F.col("vv")).alias("dot"))
        .agg(F.avg("dot"))
        .collect()[0][0]
    )


def test_training_separates_positives_from_negatives(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    nodes = vocab_nodes(docs).persist()
    train = sgns_training_pairs(
        word_skipgram_pairs(docs), nodes, nodes.count()
    ).persist()
    init = sgns_init(nodes)
    # long-form view of the init arrays for the dot computation
    init_long = init.selectExpr(
        "node",
        "posexplode(ua) AS (dim, u)",
    ).join(
        init.selectExpr("node", "posexplode(va) AS (dim, v)"),
        ["node", "dim"],
    )
    gap0 = _mean_dot(init_long, train, 1000) - _mean_dot(init_long, train, 0)
    emb = sgns_fit(train, init)
    gap = _mean_dot(emb, train, 1000) - _mean_dot(emb, train, 0)
    # the fit must push positive-pair dots above negative-pair dots,
    # and strictly further apart than the random init's gap
    assert gap > 0
    assert gap > gap0 + 1000, (gap0, gap)  # > +0.001 in micro^2 units

"""Kneser-Ney LM (operators/knlm.py): closed-form hand-computed
probabilities, the unseen-context back-off path, and the pinned
quality invariant — the smoothed LM separates clean documents from
order-destroyed twins better than the raw bigram-frequency mean."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.knlm import (
    doc_bigrams,
    kn_score,
    kn_train,
)

SF = "/root/testdata/sf0.001"


def _model_of(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bg = doc_bigrams(docs)
    return bg, kn_train(bg)


def test_closed_form_probabilities(spark):
    """Corpus {a b, a c, d b}: every count is hand-checkable.
    P_kn(b|a) = (1-0.75)/2 + 0.75*(2/2)*(2/3); in the documented
    micro-unit roundings: 125000 + rdiv(750000*666667, 1e6) = 625000."""
    bg, model = _model_of(spark, ["a b", "a c", "d b"])
    scores = {r.doc_id: r for r in kn_score(bg, model).collect()}
    assert scores[0].n_bigrams == 1
    assert scores[0].p_sum_micro == 625000  # "a b"
    # "a c": p1 = 125000; pc(c) = rdiv(1e6, 3) = 333333;
    # p2 = rdiv(750000 * 333333, 1e6) = 250000 -> 375000
    assert scores[1].p_sum_micro == 375000
    # "d b": c1(d)=1, n_fwd=1 -> p1 = rdiv(250*1000, 1) = 250000;
    # lam = rdiv(750*1*1000, 1) = 750000; p2 = 500000 -> 750000
    assert scores[2].p_sum_micro == 750000


def test_unseen_context_falls_back_to_continuation(spark):
    """Scoring text with an out-of-model context word: p = pc(w2)."""
    bg, model = _model_of(spark, ["a b", "a c", "d b"])
    probe = spark.createDataFrame([(99, "x b")], "doc_id long, text string")
    row = kn_score(doc_bigrams(probe), model).collect()[0]
    assert row.p_sum_micro == 666667  # rdiv(2 * 1e6, 3)
    # unseen w2 as well: both terms zero
    probe2 = spark.createDataFrame([(98, "x y")], "doc_id long, text string")
    row2 = kn_score(doc_bigrams(probe2), model).collect()[0]
    assert row2.p_sum_micro == 0


def test_smoothed_lm_separates_better_than_raw_frequency(spark):
    """Clean documents vs token-SORTED twins (deterministic order
    destruction): the KN mean probability must rank clean above
    shuffled on average, with a separation ratio strictly wider than
    the raw bigram-corpus-frequency mean gives. This is the reason to
    smooth: raw frequency has no penalty for unseen transitions beyond
    zero, and common words in wrong order keep high raw scores."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.expr("size(split(text, ' ')) >= 5"))
    )
    shuffled = docs.select(
        "doc_id",
        F.expr("array_join(array_sort(split(text, ' ')), ' ')").alias("text"),
    )
    bg_clean = doc_bigrams(docs).persist()
    model = kn_train(bg_clean)
    for t in model.values():
        t.persist()

    def mean_of(df, col):
        return df.agg(F.avg(col)).collect()[0][0]

    # the HARMONIC mean is the perplexity-flavored score: unseen or
    # rare transitions dominate it the way they dominate log-perplexity
    kn_clean = mean_of(kn_score(bg_clean, model), "hm_p_micro")
    kn_shuf = mean_of(kn_score(doc_bigrams(shuffled), model), "hm_p_micro")

    def raw_mean(bg):
        joined = bg.join(model["bc"], ["w1", "w2"], "left").groupBy(
            "doc_id"
        ).agg(
            (
                F.sum(F.coalesce(F.col("c12"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("raw")
        )
        return mean_of(joined, "raw")

    raw_clean = raw_mean(bg_clean)
    raw_shuf = raw_mean(doc_bigrams(shuffled))

    assert kn_clean > kn_shuf
    kn_ratio = kn_clean / kn_shuf
    raw_ratio = raw_clean / raw_shuf
    assert kn_ratio > raw_ratio, (kn_ratio, raw_ratio)

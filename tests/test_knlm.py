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


# ---------------------------------------------------------------------------
# order-3 chain
# ---------------------------------------------------------------------------


def test_kn3_closed_form_and_backoff_chain(spark):
    """Corpus {a b c, a b d, x b c}: trigram types (a,b,c), (a,b,d),
    (x,b,c). Hand-checked: tc counts all 1; tctx(a,b): c12=2, nf3=2;
    mid(b,c): n1vw=2; midctx(b): nmid=3, nf2=2; uni(c): n1w=2; T3=3.

    P3(c|a,b): p3main = rdiv(250*1000, 2) = 125000;
    lam3 = rdiv(750*2*1000, 2) = 750000;
    P2(c|b): p2main = rdiv((2000-750)*1000, 3) = 416667;
    lam2 = rdiv(750*2*1000, 3) = 500000;
    P1(c) = rdiv(2e6, 3) = 666667;
    p2 = 416667 + rdiv(500000*666667, 1e6) = 416667 + 333334 = 750001;
    p3 = 125000 + rdiv(750000*750001, 1e6) = 125000 + 562501 = 687501."""
    from bigdatasmallprice_spark.operators.knlm import (
        doc_trigrams,
        kn3_score,
        kn3_train,
    )

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b d"), (2, "x b c")],
        "doc_id long, text string",
    )
    tg = doc_trigrams(docs)
    model = kn3_train(tg)
    scores = {r.doc_id: r for r in kn3_score(tg, model).collect()}
    assert scores[0].n_trigrams == 1
    assert scores[0].p_sum_micro == 687501

    # unseen trigram context (q,b): falls through to P2(c|b) = 750001
    probe = spark.createDataFrame([(9, "q b c")], "doc_id long, text string")
    row = kn3_score(doc_trigrams(probe), model).collect()[0]
    assert row.p_sum_micro == 750001
    # unseen middle word: falls through to P1(c) = 666667
    probe2 = spark.createDataFrame([(8, "q z c")], "doc_id long, text string")
    row2 = kn3_score(doc_trigrams(probe2), model).collect()[0]
    assert row2.p_sum_micro == 666667
    # fully unseen: zero
    probe3 = spark.createDataFrame([(7, "q z y")], "doc_id long, text string")
    row3 = kn3_score(doc_trigrams(probe3), model).collect()[0]
    assert row3.p_sum_micro == 0


def test_kn3_separates_clean_from_sorted_twins(spark):
    from bigdatasmallprice_spark.operators.knlm import (
        doc_trigrams,
        kn3_score,
        kn3_train,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.expr("size(split(text, ' ')) >= 5"))
    )
    shuffled = docs.select(
        "doc_id",
        F.expr("array_join(array_sort(split(text, ' ')), ' ')").alias("text"),
    )
    tg_clean = doc_trigrams(docs).persist()
    model = kn3_train(tg_clean)

    def mean_of(df):
        return df.agg(F.avg("hm_p_micro")).collect()[0][0]

    clean = mean_of(kn3_score(tg_clean, model))
    shuf = mean_of(kn3_score(doc_trigrams(shuffled), model))
    assert clean > shuf, (clean, shuf)


# ---------------------------------------------------------------------------
# modified KN: count-bucketed discounts (Chen & Goodman 1998 §3)
# ---------------------------------------------------------------------------


def test_mkn_discounts_and_closed_form(spark):
    """Corpus {a b, a b, a c, d b, d c, d c, d c}: counts (a,b)=2,
    (a,c)=1, (d,b)=1, (d,c)=3 -> n1=2, n2=1, n3=1, n4=0, so
    d1 = rdiv(2000, 4) = 500, d2 = 2000 - rdiv(6000, 4) = 500,
    d3 = 3000 (n4=0 degenerates the closed form to the clamp).
    P_mkn(b|a): D(c=2)=d2 -> p1 = rdiv(1500*1000, 3) = 500000;
    lam(a) = rdiv((500*1 + 500*1)*1000, 3) = 333333;
    pc(b) = rdiv(2e6, 4) = 500000; p2 = rdiv(333333*500000, 1e6)
    = 166667 -> 666667."""
    from bigdatasmallprice_spark.operators.knlm import mkn_score, mkn_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b", "a b", "a c", "d b", "d c", "d c", "d c"]
        )],
        "doc_id long, text string",
    )
    bg = doc_bigrams(docs)
    model = mkn_train(bg)
    d = model["disc"].collect()[0]
    assert (d.d1, d.d2, d.d3) == (500, 500, 3000)
    scores = {r.doc_id: r.p_sum_micro for r in mkn_score(bg, model).collect()}
    assert scores[0] == 666667  # "a b"
    # all-singleton corpora push d1 to the 1000 clamp: everything
    # backs off to continuation mass (the formula's exact behavior)
    bg2, _ = _model_of(spark, ["a b", "a c", "d b"])
    from bigdatasmallprice_spark.operators.knlm import mkn_train as _mt

    m2 = _mt(bg2)
    d2_ = m2["disc"].collect()[0]
    assert (d2_.d1, d2_.d2, d2_.d3) == (1000, 2000, 3000)
    s2 = {r.doc_id: r.p_sum_micro for r in mkn_score(bg2, m2).collect()}
    assert s2[0] == 666667  # pure continuation: pc(b) = rdiv(2e6, 3)


def test_mkn_unseen_context_falls_back_to_continuation(spark):
    from bigdatasmallprice_spark.operators.knlm import mkn_score, mkn_train

    bg, _ = _model_of(spark, ["a b", "a c", "d b"])
    model = mkn_train(bg)
    probe = spark.createDataFrame([(99, "x b")], "doc_id long, text string")
    row = mkn_score(doc_bigrams(probe), model).collect()[0]
    assert row.p_sum_micro == 666667  # pc(b) = rdiv(2 * 1e6, 3)
    probe2 = spark.createDataFrame([(98, "x y")], "doc_id long, text string")
    assert mkn_score(doc_bigrams(probe2), model).collect()[0].p_sum_micro == 0


def test_mkn_separates_clean_from_sorted_twins(spark):
    """The quality direction holds under the count-bucketed
    discounts: clean documents out-score token-sorted twins on the
    harmonic mean."""
    from bigdatasmallprice_spark.operators.knlm import mkn_score, mkn_train

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
    model = mkn_train(bg_clean)
    for t in model.values():
        t.persist()

    def mean_of(df):
        return df.agg(F.avg("hm_p_micro")).collect()[0][0]

    assert mean_of(mkn_score(bg_clean, model)) > mean_of(
        mkn_score(doc_bigrams(shuffled), model)
    )


def test_mkn3_discount_rows_and_backoff_chain(spark):
    """Corpus {a b c, a b c, a b d, e b c}: trigram counts abc=2,
    abd=1, ebc=1 -> order-3 count-of-counts n1=2, n2=1 -> d31=500,
    d32=2000 (n3=0 degenerate), d33=3000 (n4=0). Continuation counts
    n1vw: (b,c)=2, (b,d)=1 -> order-2 count-of-counts n1=1, n2=1 ->
    d21=333, d22=2000, d23=3000. An unseen history (x,b) falls
    through to order 2; an unseen middle falls to the continuation
    unigram; fully unseen scores 0. Expected values are recomputed
    from the formulas with the house rdiv_py — an independent
    (engine-free) replay of the quantization chain."""
    from bigdatasmallprice_spark.operators.distill import rdiv_py
    from bigdatasmallprice_spark.operators.knlm import (
        doc_trigrams,
        mkn3_score,
        mkn3_train,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["a b c", "a b c", "a b d", "e b c"])],
        "doc_id long, text string",
    )
    model = mkn3_train(doc_trigrams(docs))
    d3 = model["disc3"].collect()[0]
    assert (d3.d31, d3.d32, d3.d33) == (500, 2000, 3000)
    d2 = model["disc2"].collect()[0]
    assert (d2.d21, d2.d22, d2.d23) == (333, 2000, 3000)

    # order-2 fall-through: probe "x b c" has unseen history (x, b)
    # -> p2 for (b, c): n1vw=2 buckets to d22, nmid=3, lam2 over
    # mm1=1/mm2=1, p1(c) = rdiv(2e6, 3)
    p1_c = rdiv_py(2 * 10**6, 3)
    lam2 = rdiv_py((333 * 1 + 2000 * 1 + 3000 * 0) * 1000, 3)
    p2main_bc = rdiv_py(max(2 * 1000 - 2000, 0) * 1000, 3)
    want_xbc = p2main_bc + rdiv_py(lam2 * p1_c, 10**6)
    probe = spark.createDataFrame([(99, "x b c")], "doc_id long, text string")
    got = mkn3_score(doc_trigrams(probe), model).collect()[0]
    assert got.p_sum_micro == want_xbc

    # unigram fall-through: "x y d" (middle y unseen) -> p1(d)
    probe2 = spark.createDataFrame([(98, "x y d")], "doc_id long, text string")
    got2 = mkn3_score(doc_trigrams(probe2), model).collect()[0]
    assert got2.p_sum_micro == rdiv_py(1 * 10**6, 3)

    # fully unseen: zero
    probe3 = spark.createDataFrame([(97, "x y z")], "doc_id long, text string")
    assert mkn3_score(doc_trigrams(probe3), model).collect()[0].p_sum_micro == 0

    # seen trigram (a b c): full order-3 path with bucketed discounts
    # (c3=2 -> d32), interpolating the SAME p2 computed above
    p3main = rdiv_py(max(2 * 1000 - 2000, 0) * 1000, 3)
    lam3 = rdiv_py((500 * 1 + 2000 * 1 + 3000 * 0) * 1000, 3)
    p2_bc = want_xbc
    want_abc = p3main + rdiv_py(lam3 * p2_bc, 10**6)
    probe4 = spark.createDataFrame([(96, "a b c")], "doc_id long, text string")
    assert (
        mkn3_score(doc_trigrams(probe4), model).collect()[0].p_sum_micro
        == want_abc
    )


def test_mkn3_separates_clean_from_sorted_twins(spark):
    from bigdatasmallprice_spark.operators.knlm import (
        doc_trigrams,
        mkn3_score,
        mkn3_train,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.expr("size(split(text, ' ')) >= 5"))
    )
    shuffled = docs.select(
        "doc_id",
        F.expr("array_join(array_sort(split(text, ' ')), ' ')").alias("text"),
    )
    tg_clean = doc_trigrams(docs).persist()
    model = mkn3_train(tg_clean)
    for t in model.values():
        t.persist()

    def mean_of(df):
        return df.agg(F.avg("hm_p_micro")).collect()[0][0]

    assert mean_of(mkn3_score(tg_clean, model)) > mean_of(
        mkn3_score(doc_trigrams(shuffled), model)
    )

"""Streaming order-3 KN LM training (streaming/kn3_stream.py): the
model folded over interleaved deliveries equals the batch-trained
model bit-for-bit and scores identically (back-off chain included);
a replayed delivery cannot double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.knlm import (
    doc_trigrams,
    kn3_score,
    kn3_train,
)
from bigdatasmallprice_spark.streaming.kn3_stream import (
    read_kn3_model,
    update_kn3_counts,
)

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_model_equals_batch_model_and_scores_identically(
    spark, tmp_path
):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "kn3_state")
    for i in range(3):
        update_kn3_counts(
            spark, state, docs.filter(F.col("doc_id") % 3 == i), batch_id=i
        )
    streamed = read_kn3_model(spark, state)
    batch = kn3_train(doc_trigrams(docs))
    for t in ("tc", "tctx", "mid", "midctx", "uni", "types"):
        assert _sorted(streamed[t]) == _sorted(batch[t]), t

    # end to end: scoring any frame from the streamed model equals the
    # batch model — the full 3 -> 2 -> 1 back-off chain and the
    # harmonic means included
    probe = docs.filter(F.col("doc_id") % 7 == 0)
    tg = doc_trigrams(probe)
    assert _sorted(kn3_score(tg, streamed)) == _sorted(kn3_score(tg, batch))


def test_replayed_delivery_does_not_double_count(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "kn3_state")
    update_kn3_counts(spark, state, docs.filter(F.col("doc_id") % 3 == 0), batch_id=0)
    update_kn3_counts(spark, state, docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)
    before = _sorted(read_kn3_model(spark, state)["tc"])
    # at-least-once retry of batch 1: watermark must skip the fold
    update_kn3_counts(spark, state, docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)
    assert _sorted(read_kn3_model(spark, state)["tc"]) == before


def test_streamed_state_serves_modified_kn3(spark, tmp_path):
    """tc is the sufficient statistic for the MODIFIED order-3
    smoother too: read_mkn3_model over the folded stream state equals
    mkn3_train over the full corpus — bucketed successor tables, both
    discount rows, and end-to-end scores included."""
    from bigdatasmallprice_spark.operators.knlm import mkn3_score, mkn3_train
    from bigdatasmallprice_spark.streaming.kn3_stream import read_mkn3_model

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "kn3_state")
    for i in range(3):
        update_kn3_counts(
            spark, state, docs.filter(F.col("doc_id") % 3 == i), batch_id=i
        )
    streamed = read_mkn3_model(spark, state)
    batch = mkn3_train(doc_trigrams(docs))
    for t in ("tc", "tctx", "disc3", "mid", "midctx", "disc2", "uni", "types"):
        assert _sorted(streamed[t]) == _sorted(batch[t]), t
    probe = docs.filter(F.col("doc_id") % 7 == 0)
    tg = doc_trigrams(probe)
    assert _sorted(mkn3_score(tg, streamed)) == _sorted(mkn3_score(tg, batch))


def test_source_column_pin_refuses_cross_fold(spark, tmp_path):
    """The knlm_stream source-column refusal, one order up."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(0, "a b c d", "x y z w")],
        "doc_id long, text string, alt string",
    )
    state = str(tmp_path / "kn3_state")
    update_kn3_counts(spark, state, docs, batch_id=0)
    with _pytest.raises(ValueError, match="different parameters"):
        update_kn3_counts(spark, state, docs, batch_id=1, text_col="alt")

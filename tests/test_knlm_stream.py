"""Streaming KN LM training (streaming/knlm_stream.py): the model
folded over interleaved deliveries equals the batch-trained model
bit-for-bit and scores identically; a replayed delivery cannot
double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.knlm import (
    doc_bigrams,
    kn_score,
    kn_train,
)
from bigdatasmallprice_spark.streaming.knlm_stream import (
    read_kn_model,
    update_kn_counts,
)

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_model_equals_batch_model_and_scores_identically(
    spark, tmp_path
):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "kn_state")
    for i in range(3):
        update_kn_counts(
            spark, state, docs.filter(F.col("doc_id") % 3 == i), batch_id=i
        )
    streamed = read_kn_model(spark, state)
    batch = kn_train(doc_bigrams(docs))
    for t in ("bc", "ctx", "cont", "types"):
        assert _sorted(streamed[t]) == _sorted(batch[t]), t

    # end to end: scoring any frame from the streamed model equals the
    # batch model — harmonic means included
    probe = docs.filter(F.col("doc_id") % 7 == 0)
    bg = doc_bigrams(probe)
    assert _sorted(kn_score(bg, streamed)) == _sorted(kn_score(bg, batch))


def test_replayed_delivery_does_not_double_count(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "kn_state")
    update_kn_counts(spark, state, docs.filter(F.col("doc_id") % 3 == 0), batch_id=0)
    update_kn_counts(spark, state, docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)
    before = _sorted(read_kn_model(spark, state)["bc"])
    # at-least-once retry of batch 1: watermark must skip the fold
    update_kn_counts(spark, state, docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)
    assert _sorted(read_kn_model(spark, state)["bc"]) == before


def test_streamed_state_serves_modified_kn_identically(spark, tmp_path):
    """bc is the sufficient statistic for BOTH smoothers: the same
    folded stream state must serve a modified-KN model equal to the
    batch mkn_train fit, discounts and scores included."""
    from bigdatasmallprice_spark.operators.knlm import mkn_score, mkn_train
    from bigdatasmallprice_spark.streaming.knlm_stream import read_mkn_model

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "kn_state")
    for i in range(3):
        update_kn_counts(
            spark, state, docs.filter(F.col("doc_id") % 3 == i), batch_id=i
        )
    streamed = read_mkn_model(spark, state)
    batch = mkn_train(doc_bigrams(docs))
    for t in ("bc", "mctx", "cont", "types", "disc"):
        assert _sorted(streamed[t]) == _sorted(batch[t]), t
    probe = doc_bigrams(docs.filter(F.col("doc_id") % 7 == 0))
    assert _sorted(mkn_score(probe, streamed)) == _sorted(
        mkn_score(probe, batch)
    )


def test_source_column_pin_refuses_cross_fold(spark, tmp_path):
    """Counts tokenized from one column must never fold with
    another's (the model-pin refusal class swept across the LM
    streams, VERDICT r10 ask #7); a pre-pin manifest migrates under
    the default and the pin is re-published."""
    import json

    import pytest as _pytest

    from bigdatasmallprice_spark.streaming.state import read_state_manifest

    docs = spark.createDataFrame(
        [(0, "a b c", "x y z"), (1, "b c d", "y z w")],
        "doc_id long, text string, alt string",
    )
    state = str(tmp_path / "kn_state")
    update_kn_counts(spark, state, docs, batch_id=0)
    with _pytest.raises(ValueError, match="different parameters"):
        update_kn_counts(spark, state, docs, batch_id=1, text_col="alt")
    # pre-pin migration: strip the pin; default folds and re-pins,
    # non-default still refuses
    mpath = state + "._state_manifest.json"
    m = json.load(open(mpath))
    del m["config"]["text_col"]
    json.dump(m, open(mpath, "w"))
    with _pytest.raises(ValueError, match="predates the text_col pin"):
        update_kn_counts(spark, state, docs, batch_id=1, text_col="alt")
    update_kn_counts(spark, state, docs.filter("doc_id = 1"), batch_id=1)
    assert read_state_manifest(state)["config"]["text_col"] == "text"

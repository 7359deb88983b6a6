"""Streaming DSIR statistics (streaming/dsir_stream.py): the folded
model equals the batch model bit-for-bit over interleaved deliveries
and weighs documents identically; replays cannot double-count; the
target-predicate pin refuses a different target definition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.dsir import (
    dsir_features,
    dsir_weights,
    log_ratio_table,
)
from bigdatasmallprice_spark.streaming.dsir_stream import (
    read_log_ratio_table,
    update_dsir_counts,
)

SF = "/root/testdata/sf0.001"
PRED = "lang = 'en'"


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_ratio_table_and_weights_equal_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    state = str(tmp_path / "dsir_state")
    for i in range(3):
        update_dsir_counts(
            spark,
            state,
            docs.filter(F.col("doc_id") % 3 == i),
            PRED,
            batch_id=i,
        )
    streamed_lr = read_log_ratio_table(spark, state)
    feats = dsir_features(docs).persist()
    batch_lr = log_ratio_table(feats, PRED)
    assert _sorted(streamed_lr) == _sorted(batch_lr)
    # end to end: weights from the streamed model == batch weights
    assert _sorted(dsir_weights(feats, streamed_lr)) == _sorted(
        dsir_weights(feats, batch_lr)
    )


def test_replay_and_target_pin(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    state = str(tmp_path / "dsir_state")
    update_dsir_counts(spark, state, docs.filter("doc_id % 2 = 0"), PRED, batch_id=0)
    before = _sorted(read_log_ratio_table(spark, state))
    # at-least-once retry: skipped
    update_dsir_counts(spark, state, docs.filter("doc_id % 2 = 0"), PRED, batch_id=0)
    assert _sorted(read_log_ratio_table(spark, state)) == before
    # a different target definition must refuse to fold
    with pytest.raises(ValueError, match="different parameters"):
        update_dsir_counts(
            spark, state, docs.filter("doc_id % 2 = 1"), "lang = 'fr'", batch_id=1
        )
    # ... and so must a different bin geometry (the add-one normalizer
    # depends on the bucket count — r9 ADVICE item)
    with pytest.raises(ValueError, match="different parameters"):
        update_dsir_counts(
            spark, state, docs.filter("doc_id % 2 = 1"), PRED, batch_id=1, buckets=64
        )


def test_nondefault_bucket_geometry_reads_back_pinned(spark, tmp_path):
    """Counts folded at buckets=64 must read back with the 64-bucket
    add-one normalizer, not the module default (r9 ADVICE item)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    state = str(tmp_path / "dsir_state64")
    for i in range(2):
        update_dsir_counts(
            spark,
            state,
            docs.filter(F.col("doc_id") % 2 == i),
            PRED,
            batch_id=i,
            buckets=64,
        )
    streamed_lr = read_log_ratio_table(spark, state)
    feats = dsir_features(docs, buckets=64)
    batch_lr = log_ratio_table(feats, PRED, buckets=64)
    assert _sorted(streamed_lr) == _sorted(batch_lr)


def test_pre_pin_state_migrates_instead_of_freezing(spark, tmp_path):
    """A state whose manifest predates the 'buckets' pin (config lacks
    the key) must accept default-geometry folds — matching the read
    path's fallback — and re-publish the pin on the next successful
    fold; a NON-default geometry still refuses (r10 ADVICE item)."""
    import json

    from bigdatasmallprice_spark.operators.dsir import DSIR_BUCKETS
    from bigdatasmallprice_spark.streaming.state import read_state_manifest

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    state = str(tmp_path / "dsir_state")
    update_dsir_counts(spark, state, docs.filter("doc_id % 2 = 0"), PRED, batch_id=0)
    # simulate a pre-pin manifest: strip the 'buckets' key in place
    mpath = state + "._state_manifest.json"
    m = json.load(open(mpath))
    del m["config"]["buckets"]
    json.dump(m, open(mpath, "w"))
    # default geometry folds fine and restores the pin
    update_dsir_counts(spark, state, docs.filter("doc_id % 2 = 1"), PRED, batch_id=1)
    pinned = read_state_manifest(state)["config"]
    assert pinned["buckets"] == DSIR_BUCKETS
    # streamed model == batch over the full corpus
    from bigdatasmallprice_spark.operators.dsir import dsir_features, log_ratio_table

    feats = dsir_features(docs)
    assert _sorted(read_log_ratio_table(spark, state)) == _sorted(
        log_ratio_table(feats, PRED)
    )
    # a pre-pin state can never fold a non-default geometry
    m = json.load(open(mpath))
    del m["config"]["buckets"]
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="predates the buckets pin"):
        update_dsir_counts(spark, state, docs, PRED, batch_id=2, buckets=64)

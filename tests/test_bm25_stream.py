"""Streaming BM25 index maintenance (streaming/bm25_stream.py): the
stream-served ranking equals the batch bm25_topk query bit-for-bit
over time-split deliveries; replays and text-edit re-deliveries fold
correctly (stale term rows vanish)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.registry import all_queries
from bigdatasmallprice_spark.streaming.bm25_stream import (
    read_tf_table,
    read_topk,
    update_bm25_index,
)

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_index_serves_batch_ranking(spark, tmp_path):
    from bigdatasmallprice_spark.queries.simq import _BM_NQ, _BM_TOPK

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "bm25_state")
    for i in range(3):
        update_bm25_index(
            spark, state, docs.filter(F.col("doc_id") % 3 == i), batch_id=i
        )
    served = _sorted(read_topk(spark, state, nq=_BM_NQ, k=_BM_TOPK))
    batch = _sorted(all_queries()["bm25_topk"].fn(spark, SF))
    assert served == batch

    # watermark replay: skipped
    update_bm25_index(
        spark, state, docs.filter(F.col("doc_id") % 3 == 1), batch_id=1
    )
    assert _sorted(read_topk(spark, state, nq=_BM_NQ, k=_BM_TOPK)) == served

    # untracked bit-identical re-delivery: LWW rewrites identical rows
    update_bm25_index(
        spark, state, docs.filter(F.col("doc_id") % 3 == 2), batch_id=None
    )
    assert _sorted(read_topk(spark, state, nq=_BM_NQ, k=_BM_TOPK)) == served


def test_text_edit_replaces_all_stale_term_rows(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "alpha beta beta"), (1, "alpha gamma")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "bm25_state")
    update_bm25_index(spark, state, docs, batch_id=0)
    # edit doc 0: 'beta' disappears entirely, 'delta' appears
    edited = spark.createDataFrame(
        [(0, "alpha delta")], "doc_id long, text string"
    )
    update_bm25_index(spark, state, edited, batch_id=1)
    tf = {(r.doc_id, r.term): r.tf for r in read_tf_table(spark, state).collect()}
    assert (0, "beta") not in tf, "stale term row survived the edit"
    assert tf[(0, "delta")] == 1 and tf[(0, "alpha")] == 1
    assert tf[(1, "gamma")] == 1  # untouched doc intact


def test_empty_text_redelivery_evicts_stale_postings(spark, tmp_path):
    """A document re-delivered with empty/whitespace-only text yields
    ZERO tf rows — its stale postings must still be evicted (the
    anti-join keys on the delivery's doc_ids, not the tokenized rows;
    r10 ADVICE item)."""
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma")], "doc_id long, text string"
    )
    state = str(tmp_path / "bm25_state")
    update_bm25_index(spark, state, docs, batch_id=0)
    emptied = spark.createDataFrame([(0, "   ")], "doc_id long, text string")
    update_bm25_index(spark, state, emptied, batch_id=1)
    tf = {(r.doc_id, r.term) for r in read_tf_table(spark, state).collect()}
    assert not {k for k in tf if k[0] == 0}, "stale postings survived emptying"
    assert (1, "gamma") in tf  # untouched doc intact


def test_tokenizer_convention_pin_refuses_and_migrates(spark, tmp_path):
    """The r11 stream-hygiene nit closed: a state folds only under its
    pinned tokenization convention — a wrong-convention delivery
    refuses (tf rows from two tokenizers are silently incomparable) —
    and a pre-pin state migrates under the default, re-publishing the
    pin on its first post-migration fold (the sketch streams' rule)."""
    import json

    import pytest as _pytest

    from bigdatasmallprice_spark.streaming.bm25_stream import BM25_TOKENIZER
    from bigdatasmallprice_spark.streaming.state import read_state_manifest

    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    state = str(tmp_path / "bm25_state")
    update_bm25_index(spark, state, docs, batch_id=0)
    assert read_state_manifest(state)["config"]["tokenizer"] == BM25_TOKENIZER
    # wrong convention refuses — whether or not it names a real builder
    with _pytest.raises(ValueError, match="different parameters|unknown"):
        update_bm25_index(spark, state, docs, batch_id=1, tokenizer="bpe_v2")
    # pre-pin manifest: strip the pin in place, fold migrates + re-pins
    mpath = state + "._state_manifest.json"
    m = json.load(open(mpath))
    del m["config"]["tokenizer"]
    json.dump(m, open(mpath, "w"))
    update_bm25_index(
        spark, state, spark.createDataFrame([(2, "c c")], "doc_id long, text string"),
        batch_id=1,
    )
    assert read_state_manifest(state)["config"]["tokenizer"] == BM25_TOKENIZER
    # the migrated fold kept both documents' postings
    assert {r.doc_id for r in read_tf_table(spark, state).collect()} == {1, 2}
    # a pre-pin state refuses a NON-default convention outright
    m = json.load(open(mpath))
    del m["config"]["tokenizer"]
    json.dump(m, open(mpath, "w"))
    with _pytest.raises(ValueError, match="predates"):
        update_bm25_index(spark, state, docs, batch_id=2, tokenizer="bpe_v2")

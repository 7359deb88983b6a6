"""Streaming BPE token accounting (streaming/bpe_stream.py): the
state folded over interleaved deliveries equals the batch codegen
tokenizer bit-for-bit; replays, text-edit and empty-text
re-deliveries fold correctly; a swapped tokenizer refuses at both
pin layers; the served packing equals pack_sequences_bpe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasmallprice_spark.queries.textq import _PACK_BPE_MERGES
from bigdatasmallprice_spark.streaming.bpe_stream import (
    init_bpe_counts,
    read_bpe_counts,
    read_packed_bins,
    update_bpe_counts,
)

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def _batch_counts(spark, docs):
    from bigdatasmallprice_spark.operators.bpe import (
        bpe_symbols_sql,
        bpe_token_count_from_symbols_sql,
    )

    sym = bpe_symbols_sql("text", _PACK_BPE_MERGES, "spark")
    cnt = bpe_token_count_from_symbols_sql("m", "text")
    return (
        docs.select("doc_id", "text")
        .withColumn("m", F.expr(sym))
        .selectExpr("doc_id", f"{cnt} AS n_bpe_tokens")
    )


def test_streamed_counts_and_packing_equal_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "bpe_state")
    init_bpe_counts(spark, state, _PACK_BPE_MERGES)
    for i in range(3):
        update_bpe_counts(
            spark, state, docs.filter(F.col("doc_id") % 3 == i), batch_id=i
        )
    assert _sorted(read_bpe_counts(spark, state)) == _sorted(
        _batch_counts(spark, docs)
    )
    # watermark replay: skipped outright
    update_bpe_counts(
        spark, state, docs.filter(F.col("doc_id") % 3 == 1), batch_id=1
    )
    # untracked bit-identical re-delivery: LWW rewrites identical rows
    update_bpe_counts(
        spark, state, docs.filter(F.col("doc_id") % 3 == 2), batch_id=None
    )
    assert _sorted(read_bpe_counts(spark, state)) == _sorted(
        _batch_counts(spark, docs)
    )
    # the served packing == the registered batch query (literal shared
    # pack_bins_from_counts chain over identical counts)
    from bigdatasmallprice_spark.registry import all_queries

    served = _sorted(read_packed_bins(spark, state))
    batch = _sorted(all_queries()["pack_sequences_bpe"].fn(spark, SF))
    assert served == batch


def test_edit_and_empty_redeliveries_replace(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "the theth"), (1, "error in order")], "doc_id long, text string"
    )
    state = str(tmp_path / "bpe_state")
    init_bpe_counts(spark, state, _PACK_BPE_MERGES)
    update_bpe_counts(spark, state, docs, batch_id=0)
    n0 = {r.doc_id: r.n_bpe_tokens for r in read_bpe_counts(spark, state).collect()}
    # text edit: the count is REPLACED, not duplicated
    edited = spark.createDataFrame([(0, "winner")], "doc_id long, text string")
    update_bpe_counts(spark, state, edited, batch_id=1)
    n1 = {r.doc_id: r.n_bpe_tokens for r in read_bpe_counts(spark, state).collect()}
    assert len(n1) == 2 and n1[1] == n0[1] and n1[0] != n0[0]
    # emptied text: one 0-count row (the batch tokenizer's own value)
    emptied = spark.createDataFrame([(0, "   ")], "doc_id long, text string")
    update_bpe_counts(spark, state, emptied, batch_id=2)
    n2 = {r.doc_id: r.n_bpe_tokens for r in read_bpe_counts(spark, state).collect()}
    assert n2[0] == 0 and len(n2) == 2


def test_swapped_tokenizer_refuses(spark, tmp_path):
    from bigdatasmallprice_spark.modelstore import save_bpe_merges
    from bigdatasmallprice_spark.streaming.bpe_stream import _tokenizer_dir

    docs = spark.createDataFrame([(0, "the")], "doc_id long, text string")
    state = str(tmp_path / "bpe_state")
    init_bpe_counts(spark, state, _PACK_BPE_MERGES)
    # publish a NEWER artifact with different merges: internally
    # consistent (its own fingerprint passes) but not the pinned model
    save_bpe_merges(
        _tokenizer_dir(state),
        "tokenizer_of_record",
        [("t", "h")],
        version="29991231T000000",
    )
    with pytest.raises(ValueError, match="different parameters"):
        update_bpe_counts(spark, state, docs, batch_id=0)


def test_update_without_init_raises(spark, tmp_path):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(FileNotFoundError, match="init_bpe_counts"):
        update_bpe_counts(spark, str(tmp_path / "missing"), docs, batch_id=0)

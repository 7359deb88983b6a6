"""Streaming document embeddings (streaming/embed_stream.py): the
state folded over interleaved deliveries equals the batch pooling
bit-for-bit; replays and text-edit re-deliveries fold correctly; the
token-vector model pin refuses a different model's pooling; the
served state drops into the similarity operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasmallprice_spark.streaming.embed_stream import (
    init_doc_embeddings,
    read_doc_vectors,
    update_doc_embeddings,
)

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return sorted((r.doc_id, tuple(r.xu)) for r in df.collect())


@pytest.fixture(scope="module")
def emb(spark):
    from bigdatasmallprice_spark.queries.textq import word_embedding_train_q

    e = word_embedding_train_q(spark, SF).persist()
    e.count()
    yield e
    e.unpersist()


def test_streamed_pooling_equals_batch(spark, tmp_path, emb):
    from bigdatasmallprice_spark.operators.word2vec import doc_embeddings

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "emb_state")
    init_doc_embeddings(spark, state, emb)
    for i in range(3):
        update_doc_embeddings(
            spark, state, docs.filter(F.col("doc_id") % 3 == i), batch_id=i
        )
    streamed = _sorted(read_doc_vectors(spark, state))
    batch = _sorted(doc_embeddings(docs, emb))
    assert streamed == batch

    # watermark replay: skipped outright
    update_doc_embeddings(
        spark, state, docs.filter(F.col("doc_id") % 3 == 1), batch_id=1
    )
    assert _sorted(read_doc_vectors(spark, state)) == streamed

    # untracked bit-identical re-delivery: last-writer-wins rewrites
    # identical rows — state unchanged
    update_doc_embeddings(
        spark, state, docs.filter(F.col("doc_id") % 3 == 2), batch_id=None
    )
    assert _sorted(read_doc_vectors(spark, state)) == streamed


def test_text_edit_replaces_stale_vector(spark, tmp_path, emb):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "emb_state")
    init_doc_embeddings(spark, state, emb)
    update_doc_embeddings(spark, state, docs, batch_id=0)
    n = read_doc_vectors(spark, state).count()
    # re-deliver one document with EDITED text (token-sorted twin):
    # its vector must be replaced, not duplicated
    edited = docs.filter(F.col("doc_id") == 0).select(
        "doc_id",
        F.expr("array_join(array_sort(split(text, ' ')), ' ')").alias("text"),
    )
    update_doc_embeddings(spark, state, edited, batch_id=1)
    st = read_doc_vectors(spark, state)
    assert st.count() == n
    assert st.filter(F.col("doc_id") == 0).count() == 1
    # sorted text = same token BAG = same MEAN pool: the replaced
    # vector equals the original (pooling is order-invariant), which
    # is itself a property worth pinning
    from bigdatasmallprice_spark.operators.word2vec import doc_embeddings

    want = _sorted(doc_embeddings(docs.filter(F.col("doc_id") == 0), emb))
    got = _sorted(st.filter(F.col("doc_id") == 0))
    assert got == want


def test_model_pin_refuses_different_vectors(spark, tmp_path, emb):
    from bigdatasmallprice_spark.streaming.embed_stream import _vector_dir

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "emb_state")
    init_doc_embeddings(spark, state, emb)
    # swap the token model under the state: the next delivery refuses
    moved = spark.read.parquet(_vector_dir(state)).select(
        "word", "dim", (F.col("u_micro") + 1000).alias("u_micro")
    )
    moved.coalesce(1).write.mode("overwrite").parquet(_vector_dir(state) + ".tmp")
    spark.read.parquet(_vector_dir(state) + ".tmp").coalesce(1).write.mode(
        "overwrite"
    ).parquet(_vector_dir(state))
    with pytest.raises(ValueError, match="different parameters"):
        update_doc_embeddings(spark, state, docs, batch_id=0)


def test_update_without_init_raises(spark, tmp_path):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(FileNotFoundError, match="init_doc_embeddings"):
        update_doc_embeddings(spark, str(tmp_path / "missing"), docs, batch_id=0)


def test_empty_text_redelivery_evicts_stale_vector(spark, tmp_path, emb):
    """A document re-delivered with whitespace-only text pools to ZERO
    rows — its stale vector must still be evicted (the anti-join keys
    on the delivery's doc_ids; r10 ADVICE item)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "emb_state")
    init_doc_embeddings(spark, state, emb)
    update_doc_embeddings(spark, state, docs, batch_id=0)
    n = read_doc_vectors(spark, state).count()
    emptied = spark.createDataFrame([(0, "   ")], "doc_id long, text string")
    update_doc_embeddings(spark, state, emptied, batch_id=1)
    st = read_doc_vectors(spark, state)
    assert st.filter(F.col("doc_id") == 0).count() == 0, "stale vector kept"
    assert st.count() == n - 1


def test_fingerprint_memo_skips_vocab_recollect(spark, tmp_path, emb, monkeypatch):
    """After init, per-delivery validation must NOT re-collect the
    vocab×dim table (r10 ADVICE item): the fingerprint is memoized on
    the frozen model's file signature, so a delivery succeeds even if
    recomputing were impossible — and a model swap (new signature)
    still forces a recompute (covered by the pin-refusal test)."""
    from bigdatasmallprice_spark.streaming import embed_stream

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    state = str(tmp_path / "emb_state")
    init_doc_embeddings(spark, state, emb)

    def boom(_vec):
        raise AssertionError("vocab table re-collected despite memo")

    monkeypatch.setattr(embed_stream, "_fingerprint_of", boom)
    update_doc_embeddings(spark, state, docs, batch_id=0)
    assert read_doc_vectors(spark, state).count() == docs.count()

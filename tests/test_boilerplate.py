"""HTML boilerplate removal (operators/boilerplate.py): the
closed-form reconstruction invariant (extracted == original for every
document), chrome suppression, degenerate-document edges, and
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.boilerplate import (
    extract_main_text,
    synthesize_html,
)


def _roundtrip(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ext = extract_main_text(synthesize_html(docs))
    return {
        r.doc_id: r
        for r in ext.join(docs, "doc_id").select(
            "doc_id", "n_lines", "n_kept", "extracted", "text"
        ).collect()
    }


def test_every_document_reconstructs_exactly(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    ext = extract_main_text(synthesize_html(docs))
    chk = ext.join(docs, "doc_id").select(
        (F.col("extracted") == F.col("text")).alias("ok")
    )
    n_bad = chk.filter(~F.col("ok")).count()
    assert n_bad == 0
    assert chk.count() == docs.count()


def test_chrome_lines_are_dropped_and_content_kept(spark):
    rt = _roundtrip(spark, ["alpha beta gamma delta"])
    r = rt[0]
    assert r.n_lines == 5  # head+nav, two <p>, related, footer
    assert r.n_kept == 2  # only the two content paragraphs survive
    assert r.extracted == r.text
    # none of the synthetic chrome vocabulary leaks into the output
    for w in ("home", "catalog", "terms", "privacy", "imprint", "site"):
        assert w not in r.extracted


def test_degenerate_documents_roundtrip(spark):
    cases = [
        "",  # empty document
        "word",  # single word: first chunk is empty and dropped
        "two words",
        "trailing space ",  # trailing separator survives the re-join
        "a b c d e f g",
        # all-empty-token chunks (the degenerate split the CASE fold
        # in _page_sql exists for): without it the empty <p> drops and
        # the whitespace is lost
        "a ",  # second chunk joins to '' — trailing space must survive
        " a",  # first chunk joins to '' — leading space must survive
        " ",  # lone separator: both chunks empty
        "  ",  # two separators
        "a  ",  # trailing double separator
    ]
    rt = _roundtrip(spark, cases)
    for i, t in enumerate(cases):
        assert rt[i].extracted == t, (i, t, rt[i].extracted)


def test_extraction_is_deterministic(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(50)
    a = sorted(
        map(tuple, extract_main_text(synthesize_html(docs)).collect())
    )
    b = sorted(
        map(tuple, extract_main_text(synthesize_html(docs)).collect())
    )
    assert a == b

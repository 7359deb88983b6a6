"""BM25 retrieval (queries/simq.py::bm25_topk_q): structural ranking
semantics on a hand-built corpus, and determinism on the synthetic
corpus."""

from __future__ import annotations

from bigdatasmallprice_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _mini_corpus(spark, tmp_path):
    rows = [
        (0, "alpha beta", "en", "s", 10),  # the probe (doc_id < 5)
        (10, "alpha beta", "en", "s", 10),  # shares BOTH query terms
        (11, "alpha gamma", "en", "s", 11),  # shares one
        (12, "gamma delta", "en", "s", 11),  # shares none
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "mini")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_bm25_ranks_full_overlap_first_and_drops_disjoint(spark, tmp_path):
    sf = _mini_corpus(spark, tmp_path)
    out = {
        (r.query_id, r.rank): r
        for r in all_queries()["bm25_topk"].fn(spark, sf).collect()
    }
    # probe 0: the both-term candidate outranks the one-term candidate;
    # the disjoint document never appears
    assert out[(0, 1)].cand_id == 10
    assert out[(0, 2)].cand_id == 11
    assert all(r.cand_id != 12 for r in out.values())
    assert out[(0, 1)].score_milli > out[(0, 2)].score_milli > 0


def test_bm25_deterministic(spark):
    q = all_queries()["bm25_topk"].fn
    a = sorted(map(tuple, q(spark, SF).collect()))
    b = sorted(map(tuple, q(spark, SF).collect()))
    assert a == b and len(a) == 25

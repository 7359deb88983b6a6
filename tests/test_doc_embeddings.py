"""The text -> embedding bridge (operators/word2vec.py::doc_embeddings
+ the simq bridge queries): mean-pooled word2vec document vectors are
a REAL document representation — near-duplicate documents (by word
5-shingle Jaccard, an independent ground truth the embeddings never
saw) must out-rank unrelated documents by pooled cosine — and the
bridge queries stay structurally sound (full top-k per probe,
SemDeDup conservation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_vecs(spark):
    from bigdatasmallprice_spark.queries.simq import _doc_vectors

    dv = _doc_vectors(spark, SF).persist()
    dv.count()
    yield dv
    dv.unpersist()


def _pair_sims(dv):
    """All-pairs rounded cosine over the pooled vectors (500 docs at
    sf0.001 -> 125k pairs; test-scale only)."""
    idot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    withn = dv.withColumn("nn", F.expr(idot.format(a="xu", b="xu")))
    a = withn.select(
        F.col("doc_id").alias("da"), F.col("xu").alias("xa"), F.col("nn").alias("na")
    )
    b = withn.select(
        F.col("doc_id").alias("db"), F.col("xu").alias("xb"), F.col("nn").alias("nb")
    )
    return (
        a.join(b, F.col("da") < F.col("db"))
        .select(
            "da",
            "db",
            F.round(
                F.expr(idot.format(a="xa", b="xb")).cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                6,
            ).alias("sim"),
        )
    )


def _shingle_jaccard(spark):
    """(da, db, j): word 5-shingle Jaccard for every doc pair — the
    independent near-dup ground truth (surface n-gram overlap; the
    pooled vectors are trained on 2-token windows and never see
    5-grams as units)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = docs.selectExpr(
        "doc_id",
        "filter(split(text, ' '), w -> w <> '') AS t",
    ).selectExpr(
        "doc_id",
        "array_distinct(transform(sequence(1, size(t) - 4), i -> "
        "concat_ws(' ', slice(t, i, 5)))) AS sg",
    )
    a = sh.select(F.col("doc_id").alias("da"), F.col("sg").alias("sa"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("sg").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return a.join(b, F.col("da") < F.col("db")).select(
        "da", "db", (inter.cast("double") / union).alias("j")
    )


def test_neardup_pairs_outrank_unrelated(spark, doc_vecs):
    """The pinned quality invariant (VERDICT r9 ask #2): pairs that
    are near-duplicates by surface 5-shingle Jaccard (>= 0.5) must
    score strictly higher pooled cosine than unrelated pairs
    (j < 0.05) — on average AND at the near-dup minimum."""
    joined = _pair_sims(doc_vecs).join(_shingle_jaccard(spark), ["da", "db"])
    stats = joined.agg(
        F.avg(F.when(F.col("j") >= 0.5, F.col("sim"))).alias("nd_mean"),
        F.min(F.when(F.col("j") >= 0.5, F.col("sim"))).alias("nd_min"),
        F.count(F.when(F.col("j") >= 0.5, 1)).alias("nd_n"),
        F.avg(F.when(F.col("j") < 0.05, F.col("sim"))).alias("ur_mean"),
    ).collect()[0]
    assert stats.nd_n >= 10, "ground truth too thin to pin anything"
    # near-dups beat unrelated by a real margin, not a rounding hair
    assert stats.nd_mean > stats.ur_mean + 0.01, stats
    # even the WORST near-dup pair beats the unrelated average
    assert stats.nd_min > stats.ur_mean, stats


def test_topk_serves_full_answer_sets(spark):
    from bigdatasmallprice_spark.queries.simq import (
        _DV_NQ,
        _DV_TOPK,
        doc_embedding_topk_q,
    )

    rows = doc_embedding_topk_q(spark, SF).collect()
    assert len(rows) == _DV_NQ * _DV_TOPK
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
        assert r.query_id != r.cand_id
    assert all(sorted(v) == list(range(1, _DV_TOPK + 1)) for v in per_q.values())


def test_semantic_dedup_conserves_and_prunes(spark):
    from bigdatasmallprice_spark.queries.simq import text_semantic_dedup_q

    df = text_semantic_dedup_q(spark, SF)
    agg = df.agg(
        F.sum("n_vecs").alias("nv"),
        F.sum("n_removed").alias("nr"),
        F.sum("n_kept").alias("nk"),
    ).collect()[0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert agg.nv == n_docs  # every doc clustered exactly once
    assert agg.nv == agg.nr + agg.nk
    # the bar prunes SOMETHING but never a majority (see _TSD_TAU note)
    assert 0 < agg.nr < n_docs // 2


def test_ivf_topk_recall_vs_brute(spark):
    """The scale-path IVF serving must stay close to the brute-force
    baseline: per probe query, the nprobe=2 cell-bounded top-5 and
    the exact top-5 overlap on average by >= 3 of 5 (and the serving
    answers are complete: 5 ranked rows per query)."""
    from bigdatasmallprice_spark.queries.simq import (
        _DV_NQ,
        _DV_TOPK,
        doc_embedding_ivf_topk_q,
        doc_embedding_topk_q,
    )

    ivf = doc_embedding_ivf_topk_q(spark, SF).collect()
    brute = doc_embedding_topk_q(spark, SF).collect()
    assert len(ivf) == _DV_NQ * _DV_TOPK
    got = {}
    for r in ivf:
        got.setdefault(r.query_id, set()).add(r.cand_id)
    want = {}
    for r in brute:
        want.setdefault(r.query_id, set()).add(r.cand_id)
    recalls = [len(got[q] & want[q]) for q in want]
    assert sum(recalls) / len(recalls) >= 3.0, recalls


def test_hi_capacity_bridge_dim32_window5(spark):
    """The capacity knob (VERDICT r10 ask #6): the bridge machinery at
    a production-ish setting — 32-dim vectors from 5-token windows —
    through the SAME parameterization the defaults use (window in
    word_skipgram_pairs, dim in sgns_init/sgns_fit, both now threaded
    through the oracle chain), proven bit-for-bit against the DuckDB
    replay AND still passing the independent Jaccard quality
    invariant. Overflow analysis at 32 dims: |u_micro| stays within
    EMB_INIT (1e5) + iters*LR-bounded GD steps (~1e5 scale), so the
    exact-int dot of 32 terms is <= 32 * (2e5)^2 ~ 1.3e12 — far under
    both 2^53 (the brute cosine's double accumulator) and 2^63 (the
    BIGINT fold); the micro-unit pooling sums stay exact while
    per-doc token counts < 2^63 / 2e5."""
    from bigdatasmallprice_spark.operators.sgns import (
        sgns_fit,
        sgns_init,
        sgns_training_pairs,
    )
    from bigdatasmallprice_spark.operators.word2vec import (
        doc_embeddings,
        o_doc_embeddings_sql,
        o_word2vec_chain_sql,
        vocab_nodes,
        word_skipgram_pairs,
    )

    DIM, WIN = 32, 5
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    pairs = word_skipgram_pairs(docs, window=WIN)
    nodes = vocab_nodes(docs).persist()
    n = nodes.count()
    train = sgns_training_pairs(pairs, nodes, n).persist()
    emb = sgns_fit(train, sgns_init(nodes, dim=DIM), dim=DIM)
    dv = doc_embeddings(
        docs,
        emb.select(F.col("node").alias("word"), "dim", F.col("u").alias("u_micro")),
    ).persist()

    # bit-for-bit vs the oracle chain at the same setting
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    osql = (
        f"WITH {o_word2vec_chain_sql(window=WIN, dim=DIM)},\n"
        f"{o_doc_embeddings_sql()}\n"
        "SELECT doc_id, xu FROM dvec"
    )
    want = sorted((r[0], tuple(r[1])) for r in con.execute(osql).fetchall())
    got = sorted((r.doc_id, tuple(r.xu)) for r in dv.collect())
    assert got == want

    # the vectors are 32-dim and bounded as documented
    row = dv.first()
    assert len(row.xu) == 32
    mx = dv.selectExpr("max(aggregate(xu, CAST(0 AS BIGINT), "
                       "(a, v) -> greatest(a, abs(v)))) AS m").first().m
    assert mx < 2 * 10**5, mx

    # the independent quality invariant HOLDS at the larger setting:
    # Jaccard>=0.5 near-dup pairs out-rank unrelated (j=0) pairs
    sims = _pair_sims(dv)
    j = _shingle_jaccard(spark)
    joined = sims.join(j, ["da", "db"]).persist()
    near = joined.filter(F.col("j") >= 0.5).agg(F.avg("sim")).first()[0]
    unrel = joined.filter(F.col("j") == 0).agg(F.avg("sim")).first()[0]
    assert near > unrel, (near, unrel)

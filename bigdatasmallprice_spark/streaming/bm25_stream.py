"""Streaming BM25 index maintenance: the continuous twin of the
lexical retrieval leg (queries/simq.py::bm25_topk / hybrid_bm25_rrf)
— the sparse counterpart of ann_stream's dense-index maintenance.

The design observation (the knlm_stream rule applied to retrieval):
the ONLY corpus-dependent state of the BM25 model is the per-document
term-frequency table tf(doc_id, term, tf). Document frequencies,
document lengths and the (N, total_tokens) global are PURE FUNCTIONS
of it, and the scoring chain is shared as literal code — ``read_topk``
calls the SAME ``bm25_scored_from_tf`` the batch queries run, so a
stream-maintained index serves rankings equal to a batch-built one by
construction.

Merge class: a document's tf rows are a pure function of its own text
(tokenize + one per-doc count — each delivery costs only itself), so
the fold is idempotent LAST-WRITER-WINS BY DOC_ID (the ann_stream /
embed_stream membership class): bit-identical replays rewrite
identical rows; a re-delivered document with EDITED text REPLACES all
its old term rows (the anti-join is on doc_id, not (doc_id, term), so
terms the edit removed disappear instead of lingering); deletions are
an anti-join away. The batch-id watermark still skips replayed
deliveries' work.

State size = the corpus posting list (sum of per-doc distinct terms)
— exactly what a lexical index stores; never raw history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BM25_STATE_SCHEMA = "doc_id long, term string, tf long"


# the tf fold's tokenization convention, pinned in the state manifest:
# a state built under one tokenizer must never fold rows from another
# (mixed tf rows are silently incomparable). "ws_split_v1" names the
# engine's shared convention — split on single spaces, drop empties —
# i.e. exactly queries/simq.py::bm25_tf, the one scorer both the batch
# queries and this stream run.
BM25_TOKENIZER = "ws_split_v1"


def update_bm25_index(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int | None = None,
    tokenizer: str = BM25_TOKENIZER,
) -> None:
    """foreachBatch body: tokenize ONLY the delivery and fold its
    (doc_id, term, tf) rows last-writer-wins by doc_id."""
    from bigdatasmallprice_spark.queries.simq import bm25_tf
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        validate_pin_with_default,
        versioned_already_applied,
    )

    if versioned_already_applied(state_path, batch_id):
        return
    # trust-on-first-use with migration (the sketch streams' rule):
    # pre-pin states fold under the default convention and the pin
    # re-publishes below; a non-default tokenizer refuses to fold into
    # a state pinned (or defaulted) to another.
    validate_pin_with_default(state_path, "tokenizer", tokenizer, BM25_TOKENIZER)
    if tokenizer != BM25_TOKENIZER:
        raise ValueError(
            f"unknown BM25 tokenization convention {tokenizer!r}: the "
            f"engine ships exactly {BM25_TOKENIZER!r} (bm25_tf); a new "
            "convention needs its own tf builder registered here"
        )
    part = bm25_tf(batch.select("doc_id", "text"))
    state_dir = resolve_state_dir(state_path)
    new = part
    if state_dir is not None:
        prior = spark.read.schema(BM25_STATE_SCHEMA).parquet(state_dir)
        # last-writer-wins BY DOC_ID: every old row of a re-delivered
        # document goes, including terms its edit removed. The anti-join
        # keys on the DELIVERY's doc_ids, not the tokenized tf rows — a
        # document re-delivered with empty/whitespace-only text yields
        # zero tf rows but must still evict its stale postings.
        delivered = batch.select("doc_id").distinct()
        new = part.unionByName(prior.join(delivered, "doc_id", "left_anti"))
    version = next_state_version(state_path)
    new.write.mode("overwrite").parquet(state_version_dir(state_path, version))
    publish_state(state_path, version, batch_id, config={"tokenizer": tokenizer})


def read_tf_table(spark: SparkSession, state_path: str) -> DataFrame:
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no BM25 index state at {state_path}")
    return spark.read.schema(BM25_STATE_SCHEMA).parquet(state_dir)


def read_topk(
    spark: SparkSession,
    state_path: str,
    nq: int,
    k: int = 5,
) -> DataFrame:
    """(query_id, cand_id, score_milli, rank): BM25 top-k SERVED from
    the streamed index — the batch scoring chain (bm25_scored_from_tf,
    literal shared code) run over the folded tf table."""
    from pyspark.sql import Window

    from bigdatasmallprice_spark.queries.simq import bm25_scored_from_tf

    scored = bm25_scored_from_tf(read_tf_table(spark, state_path), nq)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_milli").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "score_milli", "rank")
    )

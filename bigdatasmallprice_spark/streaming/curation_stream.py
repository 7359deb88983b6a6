"""Streaming curation ingest: scrub + gate documents as they arrive.

The batch curation surface (queries/curationq.py) assumes the corpus
is at rest; a production pipeline also curates ON INGEST — every
arriving micro-batch is PII-scrubbed and quality-gated before it ever
lands in the corpus store, and rejected docs are routed to an audit
sink with the reason (the dead-letter discipline of
sources/tolerant.py applied to content quality).

Both transforms are pure per-row column expressions (the same
functions the batch queries use — no Python in the path), so the
stream inherits exactly the batch semantics: the equivalence test
(tests/test_streaming.py) proves stream survivors ≡ batch survivors
row-for-row. Corpus-level stages that need cross-document state
(line dedup, near-dup) run downstream: incremental near-dup against
persisted state lives in streaming/neardup_stream.py; this module is
the stateless head of the streaming pipeline.

At 100 TB/day the scrub+gate head is embarrassingly parallel (no
shuffle, no state store); its throughput scales with source
parallelism alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatasmallprice_spark.functions.texts import (
    STOPWORDS_EN,
    n_tokens,
    n_unique_tokens,
    quality_score,
    stopword_hits,
)
from bigdatasmallprice_spark.queries.curationq import (
    _RE_EMAIL,
    _RE_IPV4,
    _RE_PHONE,
)

QUALITY_MIN = 0.55
TOKENS_MIN = 20


def scrub_text(text: Column) -> Column:
    """PII redaction as one column expression (identical to the batch
    pii_scrub pass)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, _RE_EMAIL, "<EMAIL>"), _RE_PHONE, "<PHONE>"
        ),
        _RE_IPV4,
        "<IP>",
    )


def curate_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds scrubbed text, pii counts, quality, and the keep verdict +
    reject reason. Works identically on a static or streaming frame."""
    t = F.col(text_col)
    nt = n_tokens(t)
    q = quality_score(nt, n_unique_tokens(t), stopword_hits(t, STOPWORDS_EN))
    n_pii = (
        F.regexp_count(t, F.lit(_RE_EMAIL))
        + F.regexp_count(t, F.lit(_RE_PHONE))
        + F.regexp_count(t, F.lit(_RE_IPV4))
    )
    reason = (
        F.when(nt < TOKENS_MIN, F.lit("too_short"))
        .when(q < QUALITY_MIN, F.lit("low_quality"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        df.withColumn("scrubbed", scrub_text(t))
        .withColumn("n_pii", n_pii.cast("long"))
        .withColumn("n_tok", nt)
        .withColumn("quality", F.round(q, 6))
        .withColumn("reject_reason", reason)
    )


def curation_stream(
    stream: DataFrame,
    kept_path: str,
    rejected_path: str,
    checkpoint: str,
    text_col: str = "text",
):
    """Attach the scrub+gate head to a document stream: survivors (with
    scrubbed text) append to the corpus path, rejects (with reason) to
    the audit path — one pass, foreachBatch fan-out, no second read of
    the source."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent-by-construction appends: each batch owns the
        # deterministic partition directory batch_id=<id> in both sinks
        # and OVERWRITES it. A foreachBatch retry (at-least-once
        # contract) rewrites the same two directories instead of
        # appending duplicates — there is no marker and therefore no
        # failure window between "first sink written" and "marked
        # applied". Readers see batch_id as an ordinary partition
        # column via standard discovery.
        cur = curate_columns(batch_df, text_col).persist()
        try:
            kept = cur.filter(F.col("reject_reason").isNull()).drop(
                text_col, "reject_reason"
            )
            rejected = cur.filter(F.col("reject_reason").isNotNull()).drop("scrubbed")
            kept.write.mode("overwrite").parquet(
                f"{kept_path.rstrip('/')}/batch_id={batch_id}"
            )
            rejected.write.mode("overwrite").parquet(
                f"{rejected_path.rstrip('/')}/batch_id={batch_id}"
            )
        finally:
            cur.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )

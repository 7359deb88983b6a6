"""Streaming order-3 Kneser-Ney LM training: each micro-batch
SUM-folds its trigram-occurrence counts into the persisted count
table — the continuous twin of ``ngram_lm_kn3``'s training half
(operators/knlm.py), one order up from knlm_stream (VERDICT r9 ask
#5).

The same design observation as the bigram stream, applied to the
order-3 chain: the ONLY corpus-dependent state of the model is the
trigram count table tc(u, v, w, c3). All five lower-order tables —
tctx(u,v -> c12, nf3), mid(v,w -> n1vw), midctx(v -> nmid, nf2),
uni(w -> n1w), the type total T3 — are PURE FUNCTIONS of tc (every
N1+ continuation statistic counts DISTINCT trigram types, which are
exactly tc's rows), so the stream folds the smallest sufficient
statistic and recomputes the derived tables on read. Here the shared
derivation is literal code: ``read_kn3_model`` calls the SAME
``kn3_model_from_counts`` the batch fit uses — one derivation, two
ingestion modes.

Merge class: counter SUMS — mergeable, NOT idempotent (the
cms/knlm_stream class): replays are skipped via the batch-id
watermark (tested).

Because the fold and every derived table are exact integers, a model
folded over ANY slicing of the corpus into deliveries equals the
batch-trained model BIT-FOR-BIT and scores any document frame
identically, harmonic means included (proven end-to-end in
tests/test_kn3_stream.py).

State size = the trigram type vocabulary — exactly what the batch
model table holds, never corpus-scale history; each delivery costs
its own tokenize + one type-keyed fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KN3_STATE_SCHEMA = "u string, v string, w string, c3 long"


def update_kn3_counts(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int | None = None,
    text_col: str = "text",
) -> None:
    """foreachBatch body: SUM one delivery's trigram-occurrence counts
    into the persisted count table. NOT idempotent — replays are
    skipped via the batch-id watermark."""
    from bigdatasmallprice_spark.operators.knlm import doc_trigrams
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
    # the knlm_stream source-column pin, one order up (pre-pin states
    # migrate under the default; the pin re-publishes below)
    validate_pin_with_default(state_path, "text_col", text_col, "text")
    part = (
        doc_trigrams(batch, text_col=text_col)
        .groupBy("u", "v", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c3"))
    )
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        part = part.unionByName(
            spark.read.schema(KN3_STATE_SCHEMA).parquet(state_dir)
        )
    new = part.groupBy("u", "v", "w").agg(
        F.sum("c3").cast("long").alias("c3")
    )
    version = next_state_version(state_path)
    new.write.mode("overwrite").parquet(state_version_dir(state_path, version))
    publish_state(state_path, version, batch_id, config={"text_col": text_col})


def read_kn3_model(spark: SparkSession, state_path: str) -> dict[str, DataFrame]:
    """The six order-3 model tables recomputed from the folded trigram
    counts with the batch fit's OWN derivation (kn3_model_from_counts),
    so the streamed model scores identically to the batch-trained one
    by construction."""
    from bigdatasmallprice_spark.operators.knlm import kn3_model_from_counts
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no order-3 KN LM state at {state_path}")
    tc = spark.read.schema(KN3_STATE_SCHEMA).parquet(state_dir)
    return kn3_model_from_counts(tc)


def read_mkn3_model(spark: SparkSession, state_path: str) -> dict[str, DataFrame]:
    """The MODIFIED order-3 model (count-bucketed discounts at both
    upper orders, Chen & Goodman 1998 §3) from the SAME folded trigram
    counts: tc is the sufficient statistic for the plain AND modified
    smoothers, so one persisted stream state serves both — the
    derivation is the batch fit's own mkn3_model_from_counts
    (operators/knlm.py), one source of truth for the bucketed
    successor tables and both discount rows."""
    from bigdatasmallprice_spark.operators.knlm import mkn3_model_from_counts
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no KN3 LM state at {state_path}")
    tc = spark.read.schema(KN3_STATE_SCHEMA).parquet(state_dir)
    return mkn3_model_from_counts(tc)

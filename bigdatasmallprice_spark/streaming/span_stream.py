"""Streaming cross-document span-mass state: each micro-batch folds its
(span, doc) occurrence counts into a persisted pair table — the
continuous twin of the batch ``dedup_span_stats`` family
(queries/dedupq.py), completing the daily-ingest story for span-level
dedup the way ``neardup_stream`` does for LSH bands.

Fold algebra: the batch plan's first shuffle stage is the map-side-
combined (span, doc, source) -> cnt pair aggregate; counts are ADDITIVE
across deliveries because every document arrives whole in exactly one
micro-batch, so union + re-sum over deliveries is bit-equal to the
one-shot aggregate over all data. Everything downstream of the pair
frame (doc-frequency window over the span key, per-doc fold, per-source
rollup) is a pure function of the pair table, so the streamed summary
is proven == the batch query by construction plus the additive fold —
and differentially tested over time-split deliveries
(tests/test_streaming.py).

Replay safety: the fold is NOT idempotent (a replayed batch would
double its counts), so each fold is guarded by the versioned
batch-id watermark and published crash-atomically per
streaming/state.py — a crash leaves the old complete pair table or the
new one, never a torn or double-counted one.

State size: grows with the corpus' distinct (span, doc) pairs — that is
inherent to EXACT span stats (the same table the batch plan shuffles).
The 100 TB path is ``hashed=True``: the span key is the 60-bit
md5-slice BIGINT (functions/texts.md5_key60_expr) instead of the ~50 B
raw 8-word string, shrinking both the persisted state and every
shuffle over it; short docs ride along as a NULL-span row so per-source
doc totals stay exact. ``hashed`` and the span width are pinned in the
state manifest — resuming with a different geometry would silently
mis-merge keys, so a mismatch raises.

Reference parity: the span-mass signal follows Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better"); the
incremental-ingest twin mirrors the reference's daily re-ingest cadence
(/root/reference/src/ingest.py scheduling), re-expressed as
foreachBatch + versioned state instead of a cron'd full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPAN_N_DEFAULT = 8

# sp is NULL for sub-span-width docs (they carry no spans but still
# count in per-source doc totals); cnt is 0 on those rows.
_STATE_SCHEMA_RAW = "sp string, doc_id long, source string, cnt long"
_STATE_SCHEMA_HASHED = "sp long, doc_id long, source string, cnt long"


def _state_schema(hashed: bool) -> str:
    return _STATE_SCHEMA_HASHED if hashed else _STATE_SCHEMA_RAW


def _batch_pairs(batch: DataFrame, span_n: int, hashed: bool) -> DataFrame:
    """One micro-batch's (span, doc, source) counts + NULL-span rows for
    short docs — the same map-side-combined pair aggregate the batch
    plan opens with (queries/dedupq.py::_span_stats_df)."""
    from bigdatasmallprice_spark.functions.texts import (
        md5_key60_expr,
        shingle_expr,
    )

    toks = batch.select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    g = toks.select(
        "doc_id", "source",
        F.explode(F.expr(shingle_expr("ws", span_n))).alias("sp0"),
    )
    sp = (
        F.expr(md5_key60_expr("sp0")) if hashed else F.col("sp0")
    ).alias("sp")
    pairs = (
        g.select(sp, "doc_id", "source")
        .groupBy("sp", "doc_id", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    null_sp = F.lit(None).cast("bigint" if hashed else "string").alias("sp")
    short = toks.filter(F.size("ws") < span_n).select(
        null_sp, "doc_id", "source", F.lit(0).cast("long").alias("cnt")
    )
    return pairs.unionByName(short)


def update_span_pairs(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    span_n: int = SPAN_N_DEFAULT,
    hashed: bool = False,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: fold one micro-batch's pair counts into the
    persisted table (union + re-sum per key — additive, so the final
    state equals the batch aggregate over all delivered docs), then
    publish a fresh crash-atomic version."""
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        validate_state_config,
        versioned_already_applied,
    )

    if versioned_already_applied(state_path, batch_id):
        return
    config = {"span_n": span_n, "hashed": hashed}
    validate_state_config(state_path, config)
    part = _batch_pairs(batch, span_n, hashed)
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        part = part.unionByName(
            spark.read.schema(_state_schema(hashed)).parquet(state_dir)
        )
    # re-sum compacts within-key rows each version, so state size stays
    # the corpus' distinct pair count, not the delivery count x pairs
    new = part.groupBy("sp", "doc_id", "source").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    version = next_state_version(state_path)
    new.write.mode("overwrite").parquet(state_version_dir(state_path, version))
    publish_state(state_path, version, batch_id, config=config)


def span_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
    span_n: int = SPAN_N_DEFAULT,
    hashed: bool = False,
):
    """Wire a (doc_id, source, text) stream into the incremental span
    state (availableNow): restart-safe via the stream checkpoint + the
    versioned batch-id watermark."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_span_pairs(
            spark, state_path, batch, span_n, hashed, batch_id=bid
        )

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def read_span_pairs(spark: SparkSession, state_path: str) -> DataFrame:
    """Current pair table as (sp, doc_id, source, cnt)."""
    from bigdatasmallprice_spark.streaming.state import (
        read_state_manifest,
        resolve_state_dir,
    )

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no span state at {state_path}")
    manifest = read_state_manifest(state_path) or {}
    hashed = bool(manifest.get("config", {}).get("hashed", False))
    return spark.read.schema(_state_schema(hashed)).parquet(state_dir)


def span_stats_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Per-source span-mass summary off the persisted state — the same
    window + per-doc fold + rollup the batch query runs downstream of
    its pair aggregate, so output schema and values match
    ``dedup_span_stats`` over the union of all deliveries."""
    from pyspark.sql import Window

    state = read_span_pairs(spark, state_path)
    pairs = state.filter(F.col("sp").isNotNull())
    w = Window.partitionBy("sp")
    marked = pairs.withColumn("ndocs", F.count(F.lit(1)).over(w))
    per_doc = marked.groupBy("doc_id", "source").agg(
        F.sum("cnt").cast("long").alias("n_spans"),
        F.sum(F.when(F.col("ndocs") > 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_shared"),
    )
    short_docs = state.filter(F.col("sp").isNull()).select(
        "doc_id", "source",
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("n_shared"),
    )
    all_docs = per_doc.unionByName(short_docs)
    return all_docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_spans").cast("long").alias("total_spans"),
        F.sum("n_shared").cast("long").alias("shared_spans"),
        F.sum(F.when(F.col("n_shared") * 5 >= F.col("n_spans"), 1).otherwise(0))
        .cast("long")
        .alias("n_boilerplate_docs"),
    )

"""Streaming incremental span-dedup REWRITE: each micro-batch's
documents are rewritten against every span seen so far — the
continuous twin of the batch ``dedup_rewrite`` family
(queries/dedupq.py, operators/dedup.py::span_dedup_rewrite), the way
``span_stream`` twins the span *stats* and ``neardup_stream`` twins
doc-level LSH dedup.

Semantics and the equivalence claim: the batch rewrite keeps a
duplicated span's FIRST occurrence in global (doc_id, pos) order and
cuts every later one. Incrementally, an occurrence in batch k is a
"later" one iff its span was already seen in an earlier delivery
(membership in the seen-span state) OR an earlier occurrence exists
within batch k itself (batch-local row_number over (doc_id, pos)).
When deliveries arrive in ascending doc_id ranges — the daily-ingest
contract, new docs append with fresh ids — those two conditions are
exactly the global predicate, so the union of the per-batch rewritten
outputs is proven equal to ``span_dedup_rewrite`` over the whole
corpus (differentially tested over time-split deliveries in
tests/test_streaming.py). Note the state folds ORIGINAL spans (the
batch semantics mark duplicates on the raw corpus, not on rewritten
text).

Scale shape, per micro-batch: only the batch's documents are
tokenized (corpus text is never re-read); the membership probe is a
left join of batch spans against the seen store — batch-sized, not
corpus-sized, on the probe side; the rebuild is the operator's
per-row array filter. State is the corpus' DISTINCT span set —
inherent to exact span dedup; ``hashed=True`` stores the 60-bit
md5-slice BIGINT (functions/texts.md5_key60_expr) instead of ~50 B
raw strings, shrinking state and every shuffle over it (geometry is
pinned in the state manifest; a mismatch raises).

Replay safety: rewritten rows land in a per-batch subdirectory
written with overwrite (a replayed batch rewrites the same files —
idempotent sink), and the span fold is guarded by the versioned
batch-id watermark and published crash-atomically (streaming/state.py)
— a crash leaves the old complete span set or the new one, never a
torn or double-folded one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPAN_N_DEFAULT = 8

_STATE_SCHEMA_RAW = "sp string"
_STATE_SCHEMA_HASHED = "sp long"


def _state_schema(hashed: bool) -> str:
    return _STATE_SCHEMA_HASHED if hashed else _STATE_SCHEMA_RAW


def _batch_occurrences(batch: DataFrame, span_n: int, hashed: bool) -> DataFrame:
    """(doc_id, pos, sp) for one micro-batch — the operator's span
    posexplode (operators/dedup.py::span_dedup_rewrite stage 1)."""
    from bigdatasmallprice_spark.functions.texts import md5_key60_expr, shingle_expr

    occ = batch.select(
        "doc_id",
        F.posexplode(F.expr(shingle_expr(f"split(text, ' ')", span_n))).alias(
            "pos", "sp"
        ),
    )
    if hashed:
        occ = occ.withColumn("sp", F.expr(md5_key60_expr("sp")))
    return occ


def rewrite_batch(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    out_path: str,
    span_n: int = SPAN_N_DEFAULT,
    hashed: bool = False,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: rewrite one delivery of (doc_id, source,
    text) against the seen-span state, land the rewritten rows in the
    batch's own output subdir, then fold the batch's distinct spans
    into a fresh crash-atomic state version."""
    from pyspark.sql import Window

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

    occ = _batch_occurrences(batch, span_n, hashed)
    state_dir = resolve_state_dir(state_path)
    seen = (
        spark.read.schema(_state_schema(hashed)).parquet(state_dir)
        if state_dir is not None
        else None
    )

    # cut = span already seen in an earlier delivery OR a batch-local
    # earlier occurrence exists (row_number over the global-within-
    # batch (doc_id, pos) order) — together, "some earlier occurrence
    # exists globally" under ascending-doc_id deliveries
    w_rn = Window.partitionBy("sp").orderBy("doc_id", "pos")
    marked = occ.withColumn("__rn", F.row_number().over(w_rn))
    if seen is not None:
        marked = marked.join(
            seen.withColumn("__seen", F.lit(True)), "sp", "left"
        )
    else:
        marked = marked.withColumn("__seen", F.lit(None).cast("boolean"))
    dup = marked.filter(
        F.coalesce(F.col("__seen"), F.lit(False)) | (F.col("__rn") > 1)
    )
    cuts = (
        dup.select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {span_n - 1})")).alias("cut"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("cut").alias("__cuts"))
    )
    rewritten = (
        batch.withColumn("__ws", F.split("text", " "))
        .join(cuts, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.size("__ws").cast("long").alias("n_before"),
            F.coalesce(F.size("__cuts"), F.lit(0)).cast("long").alias("n_removed"),
            F.expr(
                "concat_ws(' ', filter(__ws, (w, i) -> NOT array_contains("
                "coalesce(__cuts, CAST(array() AS ARRAY<INT>)), i)))"
            ).alias("new_text"),
        )
    )
    # per-batch subdir + overwrite => a replayed batch rewrites the
    # same files instead of appending duplicates
    rewritten.write.mode("overwrite").parquet(
        os.path.join(out_path, f"batch_id={int(batch_id or 0)}")
    )

    new_spans = occ.select("sp").distinct()
    if seen is not None:
        new_spans = new_spans.unionByName(seen).distinct()
    version = next_state_version(state_path)
    new_spans.write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(state_path, version, batch_id, config=config)


def rewrite_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    out_path: str,
    checkpoint: str,
    span_n: int = SPAN_N_DEFAULT,
    hashed: bool = False,
):
    """Wire a (doc_id, source, text) stream into the incremental
    rewrite (availableNow): restart-safe via the stream checkpoint +
    the versioned batch-id watermark + the idempotent per-batch sink."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        rewrite_batch(
            spark, state_path, batch, out_path, span_n, hashed, batch_id=bid
        )

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def read_rewritten(spark: SparkSession, out_path: str) -> DataFrame:
    """All rewritten rows across deliveries (batch_id recovered from
    the partition directories)."""
    return spark.read.parquet(out_path)

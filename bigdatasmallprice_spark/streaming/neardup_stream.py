"""Streaming incremental near-dup: LSH band join per micro-batch.

The continuous analog of ``dedup_incremental`` (queries/dedupq.py): the
corpus state is two persisted tables — (doc_id, shingles) and the LSH
band table (operators/dedup.py::lsh_bands) — and each micro-batch:

1. shingles + minhashes ONLY its own documents (never re-reads corpus
   text — the property that makes this viable at 100 TB),
2. band-equi-joins the batch's bands against the persisted corpus bands
   (``lsh_candidates_between``: cost scales with the batch and its
   collisions, never corpus x batch),
3. exact-verifies candidates by shingle Jaccard against the corpus
   shingle store (partition-pruned to candidate doc_ids by the join),
4. appends a per-doc verdict row (is_dup, best match) to the verdict
   sink, and
5. folds the batch's NON-duplicate docs into both state tables — so
   later batches dedup against everything accepted so far, in arrival
   order (first-writer-wins, the upsert contract).

foreachBatch (not a stateful operator) because the state is a growing
TABLE joined relationally, not per-key state a watermark could bound:
the corpus never expires. Checkpoint recovery replays the batch;
already-folded (surviving) docs are skipped via an anti-join on the
shingle store, so state never duplicates; a replayed batch can re-emit
the identical verdict row for docs flagged duplicate — the verdict sink
is keyed by doc_id downstream (same residual as any at-least-once
append sink).

Proven equivalent to running the batch operators sequentially per
micro-batch in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.dedup import (
    jaccard,
    lsh_bands,
    lsh_candidates_between,
    with_minhash,
    with_shingles,
)

NEARDUP_THRESHOLD = 0.5


def neardup_batch_processor(
    shingle_store: str,
    band_store: str,
    verdict_path: str,
    threshold: float = NEARDUP_THRESHOLD,
):
    """Returns the foreachBatch function: (batch_df, batch_id) -> None.
    ``batch_df`` needs (doc_id, text)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        s_b = (
            with_shingles(batch_df.select("doc_id", "text"))
            .select("doc_id", "shingles")
            .persist()
        )
        bands_b = lsh_bands(with_minhash(s_b))

        if os.path.exists(shingle_store):
            seen = spark.read.parquet(shingle_store).select("doc_id")
            # checkpoint-recovery replay: docs already folded are done
            s_new = s_b.join(seen, "doc_id", "left_anti").persist()
            bands_new = lsh_bands(with_minhash(s_new))
            corpus_bands = spark.read.parquet(band_store)
            cand = lsh_candidates_between(bands_new, corpus_bands, id_col="doc_id")
            sa = s_new.select(
                F.col("doc_id").alias("new_id"), F.col("shingles").alias("sh_a")
            )
            sb = spark.read.parquet(shingle_store).select(
                F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("sh_b")
            )
            ver = (
                cand.join(sa, "new_id")
                .join(sb, "corpus_id")
                .select(
                    "new_id",
                    "corpus_id",
                    F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jac"),
                )
            )
            best = ver.groupBy("new_id").agg(
                F.max("jac").alias("best_jaccard"),
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
            )
            verdicts = (
                s_new.select("doc_id")
                .join(best, s_new["doc_id"] == best["new_id"], "left")
                .select(
                    "doc_id",
                    F.coalesce(F.col("n_candidates"), F.lit(0))
                    .cast("long")
                    .alias("n_candidates"),
                    F.coalesce(F.col("best_jaccard"), F.lit(0.0)).alias(
                        "best_jaccard"
                    ),
                    (F.coalesce(F.col("best_jaccard"), F.lit(0.0)) >= threshold).alias(
                        "is_dup"
                    ),
                )
                .persist()
            )
        else:
            s_new = s_b
            bands_new = bands_b
            verdicts = s_new.select(
                "doc_id",
                F.lit(0).cast("long").alias("n_candidates"),
                F.lit(0.0).alias("best_jaccard"),
                F.lit(False).alias("is_dup"),
            ).persist()

        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(verdict_path)
        survivors = verdicts.filter(~F.col("is_dup")).select("doc_id")
        # sever lineage BEFORE appending: writing to shingle_store
        # invalidates every cached plan that reads it (Spark recaches by
        # path on write), so without the checkpoint the band append would
        # recompute s_new against the just-appended store and its
        # anti-join would yield 0 rows — state would silently diverge
        fold = s_new.join(survivors, "doc_id").localCheckpoint()
        fold.write.mode("append").parquet(shingle_store)
        lsh_bands(with_minhash(fold)).write.mode("append").parquet(band_store)
        s_b.unpersist()

    return process


def neardup_stream(
    stream: DataFrame,
    shingle_store: str,
    band_store: str,
    verdict_path: str,
    checkpoint: str,
    threshold: float = NEARDUP_THRESHOLD,
):
    """Wire a (doc_id, text) stream into the incremental near-dup sink."""
    return (
        stream.writeStream.foreachBatch(
            neardup_batch_processor(shingle_store, band_store, verdict_path, threshold)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )

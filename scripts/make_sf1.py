"""Generate an sf1 dataset (10x sf0.1) for the scale checkpoint.

/root/testdata ships sf0.001/0.01/0.1 and is read-only; this derives
sf1 into .scratch/sf1 (gitignored) by deterministic 10x expansion of
the three volume-bearing tables — no randomness, so the dataset is
reproducible bit-for-bit:

- documents: copy 0 is the original corpus; copies 1..9 remap doc_id
  into disjoint ranges and suffix every token with the copy tag, so
  cross-copy near-duplicate rates stay at the corpus's natural level
  (plain row duplication would quadratically explode LSH candidate
  pairs — a 10x corpus of IDENTICAL docs is not what 10x growth looks
  like).
- embeddings: copies rotate the 64-dim vector cyclically by the copy
  index (norms and pairwise geometry within a copy preserved, neighbor
  structure across copies decorrelated) with vec_id remapped.
- events: copies shift user_id/event_id into disjoint ranges over the
  SAME time window — horizontal traffic growth, which is how an event
  stream actually scales.

Dimension-style tables (region..lineitem) are copied verbatim: the
checkpoint's query set is the documents/embeddings/events surface.
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatasmallprice_spark.catalog import load_table  # noqa: E402
from bigdatasmallprice_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
COPIES = 10


def main() -> None:
    spark = get_spark("make-sf1")
    os.makedirs(DST, exist_ok=True)

    # Small dimension tables are copied verbatim (single file is fine at
    # their size); orders/lineitem get a splittable rewrite below.
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        (
            load_table(spark, SRC, t)
            .repartition(8, F.col(key))
            .write.mode("overwrite")
            .parquet(f"{DST}/{t}.parquet")
        )

    copies = spark.range(COPIES).select(F.col("id").cast("long").alias("copy"))

    docs = load_table(spark, SRC, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    out = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(
                F.expr(
                    "array_join(transform(split(text, ' '), "
                    "w -> concat(w, 'c', CAST(copy AS STRING))), ' ')"
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    # repartition (coalesce cannot INCREASE the single-partition input —
    # the r1-r4 generator's coalesce(8) silently wrote ONE file with one
    # row group, making every scan a single task); hashing on doc_id is
    # deterministic, keeping the dataset reproducible file-for-file.
    out.repartition(32, F.col("doc_id")).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )

    emb = load_table(spark, SRC, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    rot = (
        "CASE WHEN copy = 0 THEN embedding ELSE "
        "concat(slice(embedding, CAST(copy AS INT) + 1, 64 - CAST(copy AS INT)), "
        "slice(embedding, 1, CAST(copy AS INT))) END"
    )
    (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * n_vec).alias("vec_id"),
            F.expr(rot).alias("embedding"),
            "label",
        )
        .repartition(32, F.col("vec_id"))
        .write.mode("overwrite")
        .parquet(f"{DST}/embeddings.parquet")
    )

    ev = load_table(spark, SRC, "events")
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
    (
        ev.crossJoin(F.broadcast(copies))
        .select(
            (F.col("event_id") + F.col("copy") * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("copy") * n_user).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32, F.col("event_id"))
        .write.mode("overwrite")
        .parquet(f"{DST}/events.parquet")
    )

    for t in ["documents", "embeddings", "events"]:
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(t, n)
    spark.stop()


if __name__ == "__main__":
    main()

"""Curated-corpus sink: the terminal stage of the curation pipeline.

Writes the surviving documents shard-partitioned for training
consumption, plus a manifest table the trainer reads instead of
listing files. Mirrors the reference's export discipline (split
parquet sinks + snapshot audit, src/ml/data_export.py) re-expressed
for a corpus: deterministic shard assignment (the same keyed LCG as
``shard_manifest``), ``partitionBy(shard)`` so a trainer's per-shard
reads partition-prune, and a manifest whose numbers are derived FROM
THE WRITTEN FILES (read-back), not from the in-flight DataFrame — a
manifest row is a claim about what is on disk.

At 100 TB: the write is one shuffle-free pass (shard is a per-row
function of doc_id; partitionBy splits files per task), the read-back
manifest aggregation partition-prunes per shard, and the atomic
manifest swap (write to _manifest.tmp, rename) means a crashed export
leaves either the old manifest or none — never a manifest describing
half-written data. Directories starting with '_' are ignored by
Spark's file index, so the staging path is invisible to readers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHUF_A = 48271
SHUF_B = 11
SHUF_P = 1_000_000_007

MANIFEST_DIR = "_manifest"


def with_shard(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard id: (id*a+b) mod p mod n — a pure per-row
    function, so assignment is stable across engines/reruns and the
    write needs NO shuffle."""
    return df.withColumn(
        "shard", ((F.col(id_col) * SHUF_A + SHUF_B) % SHUF_P % n_shards).cast("int")
    )


def write_curated_corpus(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    token_col: str = "nt",
) -> DataFrame:
    """Write df shard-partitioned + an atomic manifest; returns the
    manifest DataFrame (shard, n_docs, token_sum, min_id, max_id) as
    read back from the written files."""
    spark = df.sparkSession
    sharded = with_shard(df, n_shards, id_col)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)

    # manifest from the WRITTEN data: read back, aggregate per shard
    written = spark.read.parquet(path)
    manifest = written.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("token_sum"),
        F.min(id_col).cast("long").alias("min_id"),
        F.max(id_col).cast("long").alias("max_id"),
    )

    tmp = os.path.join(path, MANIFEST_DIR + ".tmp")
    final = os.path.join(path, MANIFEST_DIR)
    manifest.coalesce(1).write.mode("overwrite").parquet(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return read_manifest(spark, path)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, MANIFEST_DIR))


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Per-shard trainer read; the shard predicate partition-prunes
    (asserted in tests/test_curation.py)."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> None:
    """JSONL export — the line-delimited format LLM training loaders
    consume directly. Same deterministic sharding and shuffle-free
    write as the parquet sink; each row becomes one compact JSON
    object per line via JVM-side ``to_json`` (no Python in the path).
    Gzip-compressed text files: splittability is provided by the
    SHARD directories (a loader reads shards in parallel), so
    per-file gzip is the right trade — ~5x smaller text shipped to
    the trainer."""
    sharded = with_shard(df, n_shards, id_col)
    cols = [c for c in sharded.columns if c != "shard"]
    (
        sharded.select(
            "shard",
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
        )
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "gzip")
        .text(path)
    )


def read_jsonl_corpus(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a JSONL export back (schema-checked): one JSON doc per
    line; shard recovered from the partition directory via partition
    discovery (``basePath``), so the returned frame carries the shard
    column alongside the parsed document fields."""
    raw = spark.read.option("basePath", path).text(os.path.join(path, "shard=*"))
    return raw.select(
        F.from_json(F.col("value"), schema).alias("d"), F.col("shard")
    ).select("d.*", "shard")

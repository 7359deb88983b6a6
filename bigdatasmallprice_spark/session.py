"""SparkSession factory.

Defaults chosen for correctness-parity with the reference and for scale:

- ``spark.sql.session.timeZone=UTC``: the reference stores TIMESTAMPTZ and
  normalizes every ingest to UTC (reference src/data_collection/
  base_collector.py:140-149); we pin the session so timestamp semantics
  are reproducible anywhere.
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  is the scale story for the 100 TB target; local tests keep it on so the
  plans we assert against are the plans that ship.
- ``spark.sql.shuffle.partitions`` defaults to 2*cores locally; on a real
  cluster this is overridden (AQE coalesces down anyway).
- Arrow enabled for the few pandas_udf paths (model scoring, multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigdatasmallprice-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. On a cluster, pass ``master=None`` after setting it in
    spark-submit and this just applies engine confs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        ncores = int(cpus) if cpus else (os.cpu_count() or 8)
        shuffle_partitions = max(8, ncores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true). r13 A/B'd
        # false (coalesce post-shuffle partitions to advisory BYTES
        # instead of core count, chasing the 8-beats-32-cores gap) on
        # the 20 heaviest queries and it LOST on all of them
        # (doc_embedding_topk 6.13 -> 7.10s, pagerank_copurchase
        # 7.76 -> 9.68s, node2vec 6.62 -> 8.77s): at small SF the
        # post-shuffle stages are compute-heavy per byte, so
        # coalescing to one near-empty-by-bytes reducer serializes
        # real CPU work. Recorded here so the next round does not
        # retry it.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # timestamps in the synthetic parquet are naive-UTC; read them as
        # TIMESTAMP (session tz = UTC keeps values identical to the oracle)
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # nanosecond-precision parquet timestamps (pandas default) surface
        # as INT64 nanos; catalog.load_table converts them back to
        # TimestampType losslessly (values are micro-aligned)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""Bucketed storage for shuffle-free co-located joins.

The reference leans on B-tree indexes for its join keys (reference
infra/db/init.sql unique indexes); the Spark-scale analog for
*recurring* fact-fact joins is bucketing: both tables hash-partitioned
into the same number of buckets on the join key AT WRITE TIME, so every
subsequent join/aggregation on that key reads co-located buckets and
plans with **zero Exchange** — the shuffle is paid once at ingest, not
per query. This is the right call for the repeated daily feature-join
workload (prices x generation x load on time) where the same key joins
run every day at 100 TB.

Rules that make it work (encoded here, asserted in tests):
- both sides bucketed by the SAME columns into the SAME bucket count;
- bucket count sized so one bucket ~ one task's worth of data;
- ``sortBy`` the join key inside buckets: the sort-merge join then
  skips its sort step too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted parquet table in the session catalog
    (bucketing metadata lives in the catalog, not the files — plain
    ``write.parquet`` cannot express it)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket columns.
    With matching bucket specs the plan contains no Exchange on either
    side (asserted in tests/test_operators.py)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)

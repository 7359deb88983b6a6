"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``bigdatasmallprice_spark.queries`` and register
themselves in ``bigdatasmallprice_spark.registry``; this module is a
thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bigdatasmallprice_spark.queries.timeseries import training_features

    return training_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bigdatasmallprice_spark.registry import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from bigdatasmallprice_spark.registry import oracle_sqls

    return oracle_sqls()

"""Shared helpers for oracle-paired queries.

Cross-engine determinism strategy (see registry.py docstring): money
values in the synthetic tables are 2-decimal doubles, so we aggregate
them as integer cents (``round(x*100)::BIGINT``) — integer sums are
order-independent, float sums are not — and divide back to doubles at
the end, where both engines perform the identical IEEE operation.
Timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
TS_US_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_US_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def cents(c: Column) -> Column:
    """Exact integer cents of a 2-decimal double column."""
    return F.round(c * 100, 0).cast("long")


def o_cents(expr: str) -> str:
    """DuckDB fragment matching ``cents``."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def fmt_ts(c: Column) -> Column:
    return F.date_format(c, TS_FMT_SPARK)


def o_fmt_ts(expr: str) -> str:
    return f"strftime({expr}, '{TS_FMT_DUCK}')"


def fmt_ts_us(c: Column) -> Column:
    return F.date_format(c, TS_US_FMT_SPARK)


def o_fmt_ts_us(expr: str) -> str:
    return f"strftime({expr}, '{TS_US_FMT_DUCK}')"


def safe_div(num: Column, den: Column) -> Column:
    """NULL when the denominator is zero (both engines error or diverge
    on division by zero under ANSI semantics)."""
    return F.when(den != 0, num / den)


def events(spark, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.catalog import load_table

    return load_table(spark, sf_dir, "events")


def table(spark, sf_dir: str, name: str) -> DataFrame:
    from bigdatasmallprice_spark.catalog import load_table

    return load_table(spark, sf_dir, name)


def table_par(spark, sf_dir: str, name: str) -> DataFrame:
    """Table with the scan-parallelism floor (catalog.load_table
    scan_floor=True): opt-in for queries whose first stage is heavy
    narrow per-row work (tokenize / BPE chains / model scoring) that a
    one-row-group test scan would otherwise serialize onto one core.
    Measured per consumer (OPTIMIZATION_r13.md); aggregate-first and
    pure-map queries must NOT use this — the extra exchange costs more
    than the parallelism buys (and pure-map plans must stay
    Exchange-free, tests/test_plans.py)."""
    from bigdatasmallprice_spark.catalog import load_table

    return load_table(spark, sf_dir, name, scan_floor=True)


def hourly_cents(ev: DataFrame, event_type: str) -> DataFrame:
    """Per-hour integer-cent sum + row count for one event type — the
    hourly series every time-series query builds on (the engine's analog
    of the reference's per-table hourly CTEs, init.sql:240-287)."""
    return (
        ev.filter(F.col("event_type") == event_type)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.sum(cents(F.col("value"))).alias("pc"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


O_HOURLY_CENTS = """
SELECT date_trunc('hour', ts) AS h,
       CAST(SUM({cents}) AS BIGINT) AS pc,
       COUNT(*) AS cnt
FROM events
WHERE event_type = '{etype}'
GROUP BY 1
""".strip()


def o_hourly_cents(etype: str) -> str:
    return O_HOURLY_CENTS.format(cents=o_cents("value"), etype=etype)

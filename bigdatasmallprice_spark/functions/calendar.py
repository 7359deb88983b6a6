"""Calendar feature columns with Postgres EXTRACT semantics.

The reference derives calendar features in SQL (reference
infra/db/init.sql:252-256,426-432) with Postgres conventions:
``dow``: 0=Sunday..6=Saturday, while Spark's ``dayofweek`` is
1=Sunday..7=Saturday — the shim is ``dayofweek(t)-1``. These values feed
trained models, so the exact integer coding is correctness-critical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pg_dow(t: Column) -> Column:
    """Postgres EXTRACT(DOW): 0=Sunday .. 6=Saturday (init.sql:253)."""
    return (F.dayofweek(t) - F.lit(1)).cast("int")


def is_weekend(t: Column) -> Column:
    """1 when dow in (0, 6) — Sunday/Saturday (init.sql:255,432)."""
    return F.when(F.dayofweek(t).isin(1, 7), F.lit(1)).otherwise(F.lit(0)).cast("int")


def is_peak_hour(t: Column) -> Column:
    """1 when hour between 7 and 22 inclusive (init.sql:256)."""
    return F.when(F.hour(t).between(7, 22), F.lit(1)).otherwise(F.lit(0)).cast("int")


def calendar_columns(t: Column) -> dict[str, Column]:
    """The full calendar block of the feature views (init.sql:252-256)."""
    return {
        "hour": F.hour(t).cast("int"),
        "day_of_week": pg_dow(t),
        "month": F.month(t).cast("int"),
        "quarter": F.quarter(t).cast("int"),
        "is_weekend": is_weekend(t),
        "is_peak_hour": is_peak_hour(t),
    }


# DuckDB oracle fragments with identical semantics (DuckDB dayofweek(t)
# is already 0=Sunday..6=Saturday via EXTRACT(DOW ...)).
ORACLE_CALENDAR = """
    CAST(EXTRACT(hour FROM {t}) AS INT) AS hour,
    CAST(EXTRACT(dow FROM {t}) AS INT) AS day_of_week,
    CAST(EXTRACT(month FROM {t}) AS INT) AS month,
    CAST(EXTRACT(quarter FROM {t}) AS INT) AS quarter,
    CAST(CASE WHEN EXTRACT(dow FROM {t}) IN (0,6) THEN 1 ELSE 0 END AS INT) AS is_weekend,
    CAST(CASE WHEN EXTRACT(hour FROM {t}) BETWEEN 7 AND 22 THEN 1 ELSE 0 END AS INT) AS is_peak_hour
"""

"""API serialization (F13): Decimal→float, datetime→ISO-8601, None
passthrough — reference src/api/main.py:127-134 ``_serialize``.

Two tiers, matching where the work should run:

- ``serialize_value`` / ``serialize_rows``: the reference's driver-side
  row cleaner, for serving responses (single rows / small pages — the
  only place the reference uses it).
- ``with_api_json``: the bulk analog for export pipelines — one
  JVM-side ``to_json(struct(...))`` after normalizing every timestamp
  column to ISO strings and every decimal to double, so serializing a
  100 TB frame is a pure codegen map with no Python in the path.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss"
ISO_FMT_MICROS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def serialize_value(v):
    """Reference main.py:127-134 verbatim semantics."""
    if v is None:
        return None
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    return v


def serialize_rows(df: DataFrame) -> list[dict]:
    """Collect + clean a SMALL frame (a serving response page). Not for
    bulk export — use ``with_api_json`` there."""
    return [
        {k: serialize_value(v) for k, v in row.asDict().items()}
        for row in df.collect()
    ]


def _api_column(field: T.StructField):
    c = F.col(field.name)
    if isinstance(field.dataType, T.TimestampType | T.TimestampNTZType):
        # Python isoformat() appends ".ffffff" only when the timestamp
        # has sub-second precision — mirror that exactly so the two
        # tiers emit byte-identical strings for the same value
        return (
            F.when(
                F.date_format(c, "SSSSSS") == "000000", F.date_format(c, ISO_FMT)
            )
            .otherwise(F.date_format(c, ISO_FMT_MICROS))
            .alias(field.name)
        )
    if isinstance(field.dataType, T.DateType):
        return F.date_format(c, "yyyy-MM-dd").alias(field.name)
    if isinstance(field.dataType, T.DecimalType):
        return c.cast("double").alias(field.name)
    return c


def with_api_json(df: DataFrame, out: str = "json") -> DataFrame:
    """Append one JSON-string column serializing the whole row with the
    API's conventions (ISO timestamps incl. the isoformat sub-second
    rule, float decimals, null-stripped by ``to_json`` like the
    reference's response encoder). JVM-only plan. Normalization applies
    to TOP-LEVEL columns — the API surface is flat rows, like the
    reference's; nested struct/array timestamps pass through with
    to_json's default formatting."""
    normalized = [_api_column(f) for f in df.schema.fields]
    return df.withColumn(out, F.to_json(F.struct(*normalized)))

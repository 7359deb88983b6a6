"""Open-Meteo JSON parser (S6).

The public Open-Meteo response carries columnar hourly arrays
(``hourly: {time[], temperature_2m[], ...}``) zipped by index; naive ISO
timestamps are UTC; a missing/short array yields NULL for that field
(reference src/data_collection/openmeteo_collector.py:30-124; the
forecast-vs-archive endpoint switch is fetch-side and out of engine
scope).

Spark mapping: for bulk backfills the same zip is expressible natively as
``arrays_zip`` + ``explode`` over a JSON-sourced DataFrame — see
``explode_hourly_df`` — keeping multi-year backfills fully distributed.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOURLY_FIELDS = (
    "temperature_2m",
    "wind_speed_10m",
    "shortwave_radiation",
    "cloud_cover",
    "precipitation",
)

FIELD_RENAME = {"precipitation": "precipitation_mm"}


def parse_weather(json_text: str, latitude: float, longitude: float) -> list[dict]:
    """Columnar arrays -> row records (openmeteo_collector.py:93-124)."""
    try:
        payload = json.loads(json_text) if json_text else {}
    except json.JSONDecodeError:
        return []
    hourly = payload.get("hourly") or {}
    times = hourly.get("time") or []
    out: list[dict] = []
    for i, iso in enumerate(times):
        if not iso:
            continue
        t = dt.datetime.fromisoformat(iso)
        if t.tzinfo is None:
            t = t.replace(tzinfo=dt.timezone.utc)  # naive ISO == UTC
        rec: dict = {"time": t.astimezone(dt.timezone.utc), "latitude": latitude, "longitude": longitude}
        for f in HOURLY_FIELDS:
            arr = hourly.get(f) or []
            v = arr[i] if i < len(arr) else None
            rec[FIELD_RENAME.get(f, f)] = float(v) if v is not None else None
        out.append(rec)
    return out


def explode_hourly_df(raw: DataFrame, latitude: float, longitude: float) -> DataFrame:
    """Distributed variant: a DataFrame of raw Open-Meteo JSON documents
    (column ``hourly`` as struct of arrays) -> one row per hour via
    arrays_zip + explode. Used for bulk backfill where responses land in
    object storage first."""
    zipped = raw.select(
        F.explode(
            F.arrays_zip(
                F.col("hourly.time").alias("time"),
                *[F.col(f"hourly.{f}").alias(f) for f in HOURLY_FIELDS],
            )
        ).alias("h")
    )
    return zipped.select(
        F.to_timestamp(F.col("h.time")).alias("time"),
        F.lit(latitude).alias("latitude"),
        F.lit(longitude).alias("longitude"),
        F.col("h.temperature_2m").cast("double").alias("temperature_2m"),
        F.col("h.wind_speed_10m").cast("double").alias("wind_speed_10m"),
        F.col("h.shortwave_radiation").cast("double").alias("shortwave_radiation"),
        F.col("h.cloud_cover").cast("double").alias("cloud_cover"),
        F.col("h.precipitation").cast("double").alias("precipitation_mm"),
    )

"""BAFU hydrology JSON parser (S10).

Public payload: ``payload: [{timestamp: unixepoch, loc, par ∈ {flow,
height}, val}, ...]`` — one row per (timestamp, parameter). Rows sharing
a timestamp merge into ONE record (flow -> discharge_m3s, height ->
level_masl), epoch converts to UTC, output sorts ascending by time
(reference src/data_collection/bafu_collector.py:21-106).

The merge is the J6 hash-join analog; at scale the identical semantics
are a ``groupBy(time).pivot(par).agg(first(val))`` — see ``pivot_df``.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAR_TO_COLUMN = {"flow": "discharge_m3s", "height": "level_masl"}


def parse_hydro(json_text: str, station_id: str) -> list[dict]:
    try:
        payload = json.loads(json_text) if json_text else {}
    except json.JSONDecodeError:
        return []
    merged: dict[int, dict] = {}
    for row in payload.get("payload") or []:
        ts = row.get("timestamp")
        par = row.get("par")
        if ts is None or par not in PAR_TO_COLUMN:
            continue
        rec = merged.setdefault(
            int(ts),
            {
                "time": dt.datetime.fromtimestamp(int(ts), tz=dt.timezone.utc),
                "station_id": station_id,
                "discharge_m3s": None,
                "level_masl": None,
            },
        )
        if row.get("val") is not None:
            rec[PAR_TO_COLUMN[par]] = float(row["val"])
    return [merged[k] for k in sorted(merged)]


def pivot_df(long_df: DataFrame, station_id: str) -> DataFrame:
    """Distributed variant over a long (timestamp, par, val) DataFrame:
    groupBy(ts).pivot(par) — the Spark-native form of the dict merge."""
    return (
        long_df.groupBy(F.timestamp_seconds(F.col("timestamp")).alias("time"))
        .pivot("par", list(PAR_TO_COLUMN))
        .agg(F.first("val", ignorenulls=True))
        .select(
            "time",
            F.lit(station_id).alias("station_id"),
            F.col("flow").cast("double").alias("discharge_m3s"),
            F.col("height").cast("double").alias("level_masl"),
        )
    )

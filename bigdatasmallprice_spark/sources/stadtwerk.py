"""Stadtwerk Winterthur OGD CSV parsers (S11-S13).

Public open-data CSVs:
- Bruttolastgang: ``zeitpunkt,<value column>`` in 1-4 yearly files with
  repeated headers; flexible value-column detection; timestamps carry
  ``+0100`` (compact) or ``+01:00`` offsets, both normalized to UTC;
  output sorted ascending (reference
  src/data_collection/stadtwerk_winterthur_collector.py:84-179).
- Netzeinspeisung (PV): ``zeitpunkt,energietraeger,lastgang_kwh``;
  keep only ``energietraeger == 'photovoltaik'`` rows
  (stadtwerk_winterthur_collector.py:185-248).

At scale the multi-file concat is native: ``spark.read.csv([paths],
header=True)`` unions by file and drops repeated headers per file; the
driver-side parser here exists for parity tests and small interactive
ingests. Raw snapshots (S13) are a plain text write of the fetched CSVs.
"""

from __future__ import annotations

import csv
import datetime as dt
import io
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COMPACT_OFFSET = re.compile(r"([+-]\d{2})(\d{2})$")

TIME_COL = "zeitpunkt"
PV_TYPE_COL = "energietraeger"
PV_VALUE_COL = "lastgang_kwh"
PV_KEEP = "photovoltaik"


def parse_ts(value: str) -> dt.datetime | None:
    """ISO-8601 incl. compact '+0100' offsets -> UTC (reference
    stadtwerk_winterthur_collector.py:84-92; tested with both offset
    spellings, test_stadtwerk_winterthur.py:45-61)."""
    if not value:
        return None
    s = _COMPACT_OFFSET.sub(r"\1:\2", value.strip())
    try:
        t = dt.datetime.fromisoformat(s)
    except ValueError:
        return None
    if t.tzinfo is None:
        t = t.replace(tzinfo=dt.timezone.utc)
    return t.astimezone(dt.timezone.utc)


def _detect_value_column(header: list[str]) -> str | None:
    """First non-time column — the files rename the load column across
    years (flexible detect, stadtwerk_winterthur_collector.py:138-152)."""
    for col in header:
        if col and col.strip().lower() != TIME_COL:
            return col
    return None


def parse_load_csvs(csv_texts: list[str]) -> list[dict]:
    """S11 — concatenate 1-4 load CSVs, skipping each file's header row,
    tolerate per-file value-column names, sort ascending."""
    out: list[dict] = []
    for text in csv_texts:
        if not text or not text.strip():
            continue
        reader = csv.DictReader(io.StringIO(text))
        value_col = _detect_value_column(reader.fieldnames or [])
        if value_col is None:
            continue
        for row in reader:
            t = parse_ts(row.get(TIME_COL, ""))
            if t is None:
                continue
            raw = row.get(value_col)
            try:
                v = float(raw) if raw not in (None, "") else None
            except ValueError:
                v = None
            out.append({"time": t, "load_kwh": v})
    out.sort(key=lambda r: r["time"])
    return out


def parse_pv_csv(csv_text: str) -> list[dict]:
    """S12 — PV feed-in rows only (energietraeger == 'photovoltaik')."""
    out: list[dict] = []
    if not csv_text or not csv_text.strip():
        return out
    for row in csv.DictReader(io.StringIO(csv_text)):
        if (row.get(PV_TYPE_COL) or "").strip().lower() != PV_KEEP:
            continue
        t = parse_ts(row.get(TIME_COL, ""))
        if t is None:
            continue
        raw = row.get(PV_VALUE_COL)
        try:
            v = float(raw) if raw not in (None, "") else None
        except ValueError:
            v = None
        out.append({"time": t, "pv_kwh": v})
    out.sort(key=lambda r: r["time"])
    return out


def read_load_csvs_df(spark: SparkSession, paths: list[str], value_col: str) -> DataFrame:
    """Distributed S11: native multi-file CSV union (U1) with the
    timestamp-offset normalization done in-plan."""
    df = spark.read.csv(paths, header=True)
    # 'XXX' parses +01:00 / Z; compact +0100 is normalized first
    norm = F.regexp_replace(F.col(TIME_COL), r"([+-]\d{2})(\d{2})$", r"$1:$2")
    return df.select(
        F.to_timestamp(norm, "yyyy-MM-dd'T'HH:mm:ssXXX").alias("time"),
        F.col(value_col).cast("double").alias("load_kwh"),
    ).orderBy("time")

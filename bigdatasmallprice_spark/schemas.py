"""Explicit schemas for the reference's 13 domain tables.

Fixed, DDL-declared schemas (reference infra/db/init.sql:7-227,370-416)
— never inferred. Every fact table is keyed by a UTC timestamp plus the
dimension columns listed in DEDUP_KEYS (the unique composite index used
for idempotent ingestion, init.sql:20-21 etc.).

Storage convention at scale (SURVEY §1.3): parquet/Delta partitioned by
``date(time)`` — partition pruning replaces TimescaleDB chunk exclusion;
the 7/30-day chunk intervals map to daily partitions compacted weekly/
monthly.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


TS = TimestampType()
D = DoubleType()
S = StringType()

DOMAIN_SCHEMAS: dict[str, StructType] = {
    # init.sql:7-21
    "entsoe_day_ahead_prices": _s(
        ("time", TS, False), ("domain", S, False),
        ("price_eur_mwh", D, True), ("currency", S, True),
    ),
    # init.sql:24-45
    "weather_hourly": _s(
        ("time", TS, False), ("latitude", D, False), ("longitude", D, False),
        ("temperature_2m", D, True), ("wind_speed_10m", D, True),
        ("shortwave_radiation", D, True), ("cloud_cover", D, True),
        ("precipitation_mm", D, True),
    ),
    # init.sql:48-61 / 103-116 / 119-132 (identical shapes)
    "ekz_tariffs_raw": _s(
        ("time", TS, False), ("tariff_type", S, False), ("price_chf_kwh", D, True)
    ),
    "ckw_tariffs_raw": _s(
        ("time", TS, False), ("tariff_type", S, False), ("price_chf_kwh", D, True)
    ),
    "groupe_e_tariffs_raw": _s(
        ("time", TS, False), ("tariff_type", S, False), ("price_chf_kwh", D, True)
    ),
    # init.sql:64-78
    "bafu_hydro": _s(
        ("time", TS, False), ("station_id", S, False),
        ("discharge_m3s", D, True), ("level_masl", D, True),
    ),
    # init.sql:179-192
    "entsoe_actual_load": _s(
        ("time", TS, False), ("domain", S, False), ("load_mwh", D, True)
    ),
    # init.sql:195-204
    "entsoe_generation": _s(
        ("time", TS, False), ("domain", S, False), ("psr_type", S, False),
        ("quantity_mwh", D, True),
    ),
    # init.sql:207-216
    "entsoe_crossborder_flows": _s(
        ("time", TS, False), ("in_domain", S, False), ("out_domain", S, False),
        ("flow_mwh", D, True),
    ),
    # init.sql:219-227
    "entsoe_load_forecast": _s(
        ("time", TS, False), ("domain", S, False), ("load_mwh", D, True)
    ),
    # init.sql:370-390 — ops metadata; must never join features (P6)
    "api_call_log": _s(
        ("id", LongType(), False), ("source", S, False),
        ("called_at", TS, False), ("status_code", IntegerType(), True),
        ("was_rate_limited", BooleanType(), True),
        ("response_ms", IntegerType(), True), ("date_fetched", S, True),
    ),
    # init.sql:393-403 / 406-416
    "winterthur_load": _s(("time", TS, False), ("load_kwh", D, True)),
    "winterthur_pv": _s(("time", TS, False), ("pv_kwh", D, True)),
}

# unique composite keys (init.sql unique indexes) — the dedup keys for
# idempotent ingestion; first writer wins (ON CONFLICT DO NOTHING)
DEDUP_KEYS: dict[str, tuple[str, ...]] = {
    "entsoe_day_ahead_prices": ("time", "domain"),
    "weather_hourly": ("time", "latitude", "longitude"),
    "ekz_tariffs_raw": ("time", "tariff_type"),
    "ckw_tariffs_raw": ("time", "tariff_type"),
    "groupe_e_tariffs_raw": ("time", "tariff_type"),
    "bafu_hydro": ("time", "station_id"),
    "entsoe_actual_load": ("time", "domain"),
    "entsoe_generation": ("time", "domain", "psr_type"),
    "entsoe_crossborder_flows": ("time", "in_domain", "out_domain"),
    "entsoe_load_forecast": ("time", "domain"),
    "api_call_log": ("id", "called_at"),
    "winterthur_load": ("time",),
    "winterthur_pv": ("time",),
}

# domain constants (init.sql:258,272; etl_pipeline_dag.py:148-164)
DOMAIN_CH = "10YCH-SWISSGRIDZ"
DOMAIN_DE = "10Y1001A1001A83F"
DOMAIN_IT = "10YIT-GRTN-----B"
DOMAIN_FR = "10YFR-RTE------C"
DOMAIN_AT = "10YAT-APG------L"

# exact weather join coordinates (init.sql:349-360)
LOC_WINTERTHUR = (47.5001, 8.7502)
LOC_DE_NORD = (53.5, 10.0)
LOC_DE_SUED = (48.5, 9.0)

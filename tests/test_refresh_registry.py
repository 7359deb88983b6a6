"""Refresh-policy semantics (reference init.sql:94-100 policies) and the
model registry round-trip (train.py:101-118 / predict.py:40-57)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.rollup import (
    RefreshPolicy,
    apply_refresh_policy,
    hourly_rollup,
)

NOW = dt.datetime(2024, 3, 10, 12, 30)


def _bronze(spark, rows):
    df = spark.createDataFrame(rows, "ts_s string, tariff string, value double")
    return df.select(F.to_timestamp("ts_s").alias("ts"), "tariff", "value")


def test_policy_window_and_schedule():
    p = RefreshPolicy(start_offset="2 days", end_offset="1 hour", schedule="15 minutes")
    start, end = p.window(NOW)
    assert start == NOW - dt.timedelta(days=2)
    assert end == NOW - dt.timedelta(hours=1)
    assert p.is_due(None, NOW)
    assert not p.is_due(NOW - dt.timedelta(minutes=10), NOW)
    assert p.is_due(NOW - dt.timedelta(minutes=15), NOW)
    with pytest.raises(ValueError):
        RefreshPolicy(start_offset="2 fortnights").window(NOW)


def test_late_row_inside_window_refreshes_outside_is_frozen(spark):
    """The reference-policy semantics: a late arrival whose bucket is
    within [now-start_offset, now-end_offset) updates the rollup on the
    next tick; one older than start_offset stays frozen."""
    base = [
        ("2024-03-01 05:10:00", "ht", 10.0),  # old, outside 2d window
        ("2024-03-09 08:10:00", "ht", 20.0),  # inside window
        ("2024-03-10 11:40:00", "ht", 30.0),  # inside window, < end_offset? no: end=11:30 -> bucket 11:00 recomputed
    ]
    bronze0 = _bronze(spark, base)
    existing = hourly_rollup(bronze0, "ts", "value", ["tariff"])

    # late arrivals land in bronze after the first materialization
    late_in_window = ("2024-03-09 08:50:00", "ht", 40.0)
    late_too_old = ("2024-03-01 05:50:00", "ht", 99.0)
    bronze1 = _bronze(spark, base + [late_in_window, late_too_old])

    policy = RefreshPolicy(start_offset="2 days", end_offset="1 hour")
    refreshed = apply_refresh_policy(
        bronze1, existing, "ts", "value", ["tariff"], policy, now=NOW
    )
    rows = {r.bucket: r for r in refreshed.collect()}

    b_old = dt.datetime(2024, 3, 1, 5)
    b_win = dt.datetime(2024, 3, 9, 8)
    # in-window bucket folded the late row in
    assert rows[b_win].count_value == 2
    assert rows[b_win].avg_value == pytest.approx(30.0)
    # frozen bucket ignored its late row (bounded-recompute contract)
    assert rows[b_old].count_value == 1
    assert rows[b_old].avg_value == pytest.approx(10.0)


def test_refresh_not_due_returns_none(spark):
    bronze = _bronze(spark, [("2024-03-10 11:10:00", "ht", 1.0)])
    out = apply_refresh_policy(
        bronze, None, "ts", "value", ["tariff"],
        RefreshPolicy(schedule="30 minutes"),
        now=NOW,
        last_run=NOW - dt.timedelta(minutes=5),
    )
    assert out is None


def test_model_registry_roundtrip(spark, tmp_path):
    """train -> save -> find-latest -> score, entirely in the engine."""
    from bigdatasmallprice_spark.modelstore import (
        find_latest,
        load_model,
        save_model,
        score_latest,
    )
    from bigdatasmallprice_spark.operators.linreg import (
        fit_linear_hour_dow,
        mape_gate,
    )
    from bigdatasmallprice_spark.queries.core import table

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    coef = fit_linear_hour_dow(ev, "event_type")
    gate = mape_gate(ev, coef, "event_type")

    d = str(tmp_path)
    save_model(d, "value_by_hour_dow", coef, gate, version="20240309T120000")
    newest = save_model(d, "value_by_hour_dow", coef, gate, version="20240310T120000")
    save_model(d, "other_model", coef, version="20240311T120000")  # different name

    assert find_latest(d, "value_by_hour_dow") == newest  # O8: newest by name
    assert find_latest(d, "missing") is None

    doc = load_model(newest)
    assert doc["version"] == "20240310T120000"
    assert {c["event_type"] for c in doc["coefficients"]} == {
        r.event_type for r in coef.collect()
    }
    assert doc["metrics"] is not None and len(doc["metrics"]) > 0

    scored = score_latest(spark, d, "value_by_hour_dow", ev, "event_type")
    assert scored.filter(F.col("prediction").isNull()).count() == 0
    assert scored.select("model_version").distinct().collect()[0][0] == "20240310T120000"
    assert scored.count() == ev.count()
    # predictions reproduce the in-engine fit applied directly
    direct = (
        ev.join(F.broadcast(coef), "event_type")
        .select(
            F.round(
                (
                    F.col("b0c")
                    + F.col("b1c") * F.hour("ts")
                    + F.col("b2c") * F.dayofweek("ts")
                )
                / 100.0,
                6,
            ).alias("p")
        )
        .agg(F.sum("p"))
        .collect()[0][0]
    )
    via_store = scored.agg(F.sum("prediction")).collect()[0][0]
    assert via_store == pytest.approx(direct, rel=1e-12)

"""Closed-form linear training vs an independent numpy lstsq solve, and
the registry's driver-cap invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_fit_matches_numpy_lstsq(spark):
    from bigdatasmallprice_spark.operators.linreg import fit_linear_hour_dow
    from bigdatasmallprice_spark.queries.core import table

    ev = table(spark, SF, "events")
    coef = {r.event_type: r for r in fit_linear_hour_dow(ev, "event_type").collect()}

    pdf = ev.select(
        "event_type",
        F.hour("ts").alias("x1"),
        F.dayofweek("ts").alias("x2"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    ).toPandas()
    for etype, g in pdf.groupby("event_type"):
        X = np.column_stack([np.ones(len(g)), g.x1, g.x2]).astype("float64")
        b = np.linalg.lstsq(X, g.yc.astype("float64"), rcond=None)[0]
        got = coef[etype]
        assert got.b0c == pytest.approx(b[0], rel=1e-6, abs=1e-6)
        assert got.b1c == pytest.approx(b[1], rel=1e-6, abs=1e-6)
        assert got.b2c == pytest.approx(b[2], rel=1e-6, abs=1e-6)


def test_mape_gate_semantics(spark):
    """A perfect model passes the gate; a terrible one fails it."""
    from bigdatasmallprice_spark.operators.linreg import mape_gate

    rows = [("a", f"2024-01-01 0{h}:00:00", 50.0 + h) for h in range(8)]
    df = spark.createDataFrame(rows, "k string, ts_s string, value double").select(
        "k", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    # perfect: value_cents = 5000 + 100*hour + 0*dow
    perfect = spark.createDataFrame(
        [("a", 5000.0, 100.0, 0.0)], "k string, b0c double, b1c double, b2c double"
    )
    r = mape_gate(df, perfect, "k").collect()[0]
    assert r.mape_pct == 0.0 and bool(r.gate_pass) is True and r.n_scored == 8
    terrible = spark.createDataFrame(
        [("a", 0.0, 0.0, 0.0)], "k string, b0c double, b1c double, b2c double"
    )
    r = mape_gate(df, terrible, "k").collect()[0]
    assert r.mape_pct == 100.0 and bool(r.gate_pass) is False


def test_mape_gate_all_masked(spark):
    """Every |y| below the mask -> NULL mape, NULL gate (no div-by-zero)."""
    from bigdatasmallprice_spark.operators.linreg import mape_gate

    df = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 1.0)], "k string, ts_s string, value double"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "value")
    coef = spark.createDataFrame(
        [("a", 0.0, 0.0, 0.0)], "k string, b0c double, b1c double, b2c double"
    )
    r = mape_gate(df, coef, "k").collect()[0]
    assert r.mape_pct is None and r.gate_pass is None and r.n_scored == 0


def test_driver_registry_cap_and_coverage():
    """The driver sees <=50 queries (its observed check cap), in the
    explicit priority order, every one oracle-paired; everything else in
    the full registry still runs under the local parity gate."""
    from bigdatasmallprice_spark.registry import (
        DRIVER_CAP,
        DRIVER_ORDER,
        all_queries,
        oracle_sqls,
        spark_queries,
    )

    q = spark_queries()
    assert list(q.keys()) == DRIVER_ORDER
    assert len(q) <= DRIVER_CAP
    o = oracle_sqls()
    assert set(o) == set(q), "every driver-exposed query must be oracle-paired"
    # local-only queries remain registered for bench + parity tests
    assert set(all_queries()) >= set(q)

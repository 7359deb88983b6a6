"""Differential tests: the Spark feature views vs the reference's own
Postgres SQL executed by DuckDB on identical synthetic domain data.

This is the §5 strategy (SURVEY): DuckDB speaks the Postgres dialect of
the original views (EXTRACT(dow), ::INT casts, USING joins) almost
verbatim, so the reference SQL itself is the oracle — any semantic drift
in the Spark re-expression (calendar shims, frame bounds, join keys,
COALESCE) fails here.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from bigdatasmallprice_spark.plans.feature_views import (
    NET_LOAD_FEATURES_SQL,
    TRAINING_FEATURES_SQL,
    register_views,
)
from tests.domain_data import make_domain_tables

# the reference view text (init.sql:236-368) with Postgres-isms DuckDB
# shares; dow/quarter/hour EXTRACT and window frames are identical
_ORACLE_TRAINING = TRAINING_FEATURES_SQL
_ORACLE_NET_LOAD = NET_LOAD_FEATURES_SQL
_DUCK_SHIMS = [
    # Spark hour()/month()/quarter()/dayofweek() -> DuckDB equivalents
    ("hour(time)", "EXTRACT(hour FROM time)"),
    ("hour(w.time)", "EXTRACT(hour FROM w.time)"),
    ("month(time)", "EXTRACT(month FROM time)"),
    ("month(w.time)", "EXTRACT(month FROM w.time)"),
    ("quarter(w.time)", "EXTRACT(quarter FROM w.time)"),
    ("(dayofweek(time) - 1)", "EXTRACT(dow FROM time)"),
    ("(dayofweek(w.time) - 1)", "EXTRACT(dow FROM w.time)"),
]


def _duckdbize(sql: str) -> str:
    for a, b in _DUCK_SHIMS:
        sql = sql.replace(a, b)
    return sql


@pytest.fixture(scope="module")
def domain(spark):
    tables = make_domain_tables()
    sdfs = {}
    for name, pdf in tables.items():
        pdf = pdf.copy()
        pdf["time"] = pdf["time"].map(lambda t: t.replace(tzinfo=None))
        sdfs[name] = spark.createDataFrame(pdf)
    register_views(spark, sdfs)

    con = duckdb.connect()
    for name, pdf in tables.items():
        pdf = pdf.copy()
        pdf["time"] = pdf["time"].map(lambda t: t.replace(tzinfo=None))
        con.register(f"_{name}", pdf)
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM _{name}")
    return spark, con


def _compare(sdf_rows, cols, orows, ocols, key_idx=0):
    assert sorted(cols) == sorted(ocols)
    assert len(sdf_rows) == len(orows)
    order = {c: i for i, c in enumerate(cols)}
    oorder = {c: i for i, c in enumerate(ocols)}
    skey = sorted(sdf_rows, key=lambda r: str(r[key_idx]))
    okey = sorted(orows, key=lambda r: str(r[oorder[cols[key_idx]]]))
    for sr, orr in zip(skey, okey):
        for c in cols:
            a, b = sr[order[c]], orr[oorder[c]]
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (c, a, b)
            else:
                assert str(a) == str(b), (c, a, b)


def test_training_features_vs_oracle(domain):
    spark, con = domain
    sdf = spark.sql(TRAINING_FEATURES_SQL)
    rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(_duckdbize(_ORACLE_TRAINING))
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(rows) > 900
    _compare(rows, sdf.columns, orows, ocols)


def test_net_load_features_vs_oracle(domain):
    spark, con = domain
    sdf = spark.sql(NET_LOAD_FEATURES_SQL)
    rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(_duckdbize(_ORACLE_NET_LOAD))
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(rows) > 3000
    _compare(rows, sdf.columns, orows, ocols)


def test_tariff_hourly_rollup_vs_oracle(domain):
    spark, con = domain
    for view in ("ekz_tariffs_hourly", "ckw_tariffs_hourly", "groupe_e_tariffs_hourly"):
        raw = view.replace("_hourly", "_raw")
        sdf = spark.sql(f"SELECT * FROM {view}")
        rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(
            f"""
            SELECT date_trunc('hour', time) AS hour, tariff_type,
                   AVG(price_chf_kwh) AS price_chf_kwh_avg,
                   MIN(price_chf_kwh) AS price_chf_kwh_min,
                   MAX(price_chf_kwh) AS price_chf_kwh_max,
                   COUNT(*) AS sample_count
            FROM {raw} GROUP BY 1, 2
            """
        )
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        srt = sorted(rows, key=lambda r: (str(r[0]), r[1]))
        ort = sorted(orows, key=lambda r: (str(r[0]), r[1]))
        assert len(srt) == len(ort) > 100
        for a, b in zip(srt, ort):
            assert str(a[0]) == str(b[0]) and a[1] == b[1]
            assert math.isclose(a[2], b[2], rel_tol=1e-9)
            assert (a[3], a[4], a[5]) == (b[3], b[4], b[5])


def test_feature_view_lag_semantics(domain):
    """lag_24h[i] == price[i-24] over the gappy row grid; NULL for i<24
    (reference test_feature_pipeline.py:63-75)."""
    spark, _ = domain
    rows = (
        spark.sql("SELECT time, price_eur_mwh, lag_24h FROM training_features ORDER BY time")
        .collect()
    )
    for i, r in enumerate(rows):
        if i < 24:
            assert r.lag_24h is None
        else:
            expect = rows[i - 24].price_eur_mwh
            assert (r.lag_24h is None and expect is None) or r.lag_24h == expect


def test_rolling_mean_partial_window(domain):
    """Row 0's 24h rolling mean equals its own price (averages available
    rows, not NULL-padded)."""
    spark, _ = domain
    first = (
        spark.sql(
            "SELECT price_eur_mwh, rolling_avg_24h FROM training_features ORDER BY time LIMIT 1"
        ).collect()[0]
    )
    assert first.rolling_avg_24h == first.price_eur_mwh

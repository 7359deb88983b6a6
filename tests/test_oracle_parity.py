"""Differential test: every registered Spark query vs its DuckDB oracle.

Replicates the driver's t2 gate locally: row count + column-name set +
order-insensitive value comparison (columns sorted by name, rows sorted
by their full tuple). Run at sf0.001 by default for speed; set
BDSP_PARITY_SF=/root/testdata/sf0.01 to mirror the driver exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from bigdatasmallprice_spark.catalog import TESTDATA_TABLES
from bigdatasmallprice_spark.registry import all_queries

SF_DIR = os.environ.get("BDSP_PARITY_SF", "/root/testdata/sf0.001")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


PARITY_CASES = sorted(n for n, s in all_queries().items() if s.oracle is not None)


@pytest.mark.parametrize("name", PARITY_CASES)
def test_parity(spark, name):
    spec = all_queries()[name]
    sdf = spec.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_con(SF_DIR)
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    s_canon = canon(srows, scols)
    o_canon = canon(orows, ocols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, o_canon)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 5


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)

"""Driver simulation: the external gate runs registered queries in ITS
OWN SparkSession (plain builder, arbitrary host timezone) — not the
engine's session factory. This test re-creates that environment in a
subprocess (fresh JVM, TZ=America/New_York, no engine confs) and
value-compares tz-sensitive queries against their DuckDB oracles,
guarding the loader-level UTC pin (catalog.load_table)."""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import duckdb
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .appName("driver-sim-tz").getOrCreate())
from bigdatasmallprice_spark.registry import all_queries
specs = all_queries()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")
# tz-sensitive surfaces regardless of the current DRIVER_ORDER rotation:
# windows/sessionization, hourly bucketing, calendar features, and the
# to_date-split + hour/dow histogram GBT fit
for name in ["asof_last_purchase", "session_stats", "hourly_rollup",
             "training_features", "train_gbt_model"]:
    s = sorted(tuple(map(str, r)) for r in specs[name].fn(spark, "/root/testdata/sf0.01").collect())
    o = sorted(tuple(map(str, r)) for r in con.execute(specs[name].oracle).fetchall())
    assert s == o, name + ": MISMATCH under non-UTC driver session"
spark.stop()
print("NON-UTC-DRIVER-SIM-PASS")
"""


def test_queries_match_oracles_under_non_utc_plain_session():
    env = dict(os.environ, TZ="America/New_York")
    env.pop("SPARK_GRAFT_SF_DIR", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "NON-UTC-DRIVER-SIM-PASS" in out.stdout, out.stderr[-2000:]

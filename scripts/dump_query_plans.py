"""Dump .explain("formatted") for named queries to plans/r12/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py before name1 name2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    from bigdatasmallprice_spark.registry import all_queries
    from bigdatasmallprice_spark.session import get_spark

    spark = get_spark("bdsp-dump-plans")
    specs = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

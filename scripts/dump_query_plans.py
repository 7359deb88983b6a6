"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python scripts/dump_query_plans.py [--round rNN] <tag> name1 name2 ...

e.g. python scripts/dump_query_plans.py --round r13 before ngram_lm_kn3

Note: queries that eagerly localCheckpoint intermediate frames EXECUTE
those stages while the plan is being built — dumping such a plan runs
the expensive part of the pipeline, not just planning.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    round_tag = "r13"
    if args and args[0] == "--round":
        if len(args) < 2:
            sys.exit("usage: dump_query_plans.py [--round rNN] <tag> name1 ...")
        round_tag = args[1]
        args = args[2:]
    if len(args) < 2:
        sys.exit("usage: dump_query_plans.py [--round rNN] <tag> name1 ...")
    tag = args[0]
    names = args[1:]
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", round_tag)
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

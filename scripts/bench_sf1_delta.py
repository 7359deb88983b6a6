"""Measure ONLY the queries named on the command line at sf0.1 vs sf1
and merge them into BENCH_sf1.json (same method as bench_sf1.py —
n=2 warm, min). Use after adding queries mid-round so the standing
checkpoint rows aren't re-measured needlessly:

    python scripts/bench_sf1_delta.py scd2_history user_spend_rank ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_sf1 import REPO, SF01, SF1, time_query  # noqa: E402


def main(names: list[str]) -> None:
    from bigdatasmallprice_spark.registry import all_queries
    from bigdatasmallprice_spark.session import get_spark

    spark = get_spark("bench-sf1-delta")
    specs = all_queries()
    out = {}
    for name in names:
        fn = specs[name].fn
        fn(spark, SF01).collect()
        spark.catalog.clearCache()
        s01 = time_query(fn, spark, SF01)
        s1 = time_query(fn, spark, SF1)
        out[name] = {"sf01": s01, "sf1": s1, "ratio": round(s1 / s01, 2)}
        print(name, out[name], flush=True)
    path = os.path.join(REPO, "BENCH_sf1.json")
    with open(path) as fh:
        doc = json.load(fh)
    doc["queries"].update(out)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])

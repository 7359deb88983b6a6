"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing counts full execution to the driver (``collect`` of the
aggregated results — every headline query ends in an aggregation or
top-k, so collect sizes are small and the measurement is dominated by
the distributed plan, as it would be on a cluster).
"""

from __future__ import annotations

import json
import os
import time


HEADLINE = [
    "training_features",
    "market_revenue",
    "hourly_rollup",
    "hourly_pivot",
    "grain_align_join",
    "upsert_idempotency",
    "chrono_split_summary",
    "forecast_metrics",
    "top_users",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bigdatasmallprice_spark.registry import all_queries
    from bigdatasmallprice_spark.session import get_spark

    spark = get_spark("bdsp-bench")
    specs = all_queries()
    names = [n for n in HEADLINE if n in specs] + [
        n for n in sorted(specs) if n not in HEADLINE
    ]

    # Warmup pass: run every query once so codegen/JIT compilation and
    # parquet footer reads are excluded from timings (first execution of
    # a plan costs 2-4x its steady state). Then DROP all cached data —
    # queries that persist intermediate frames (dedup signatures) must
    # recompute them inside their timed run; only compiled code and file
    # metadata stay warm. What's measured is steady-state wall time per
    # query, cold data every time.
    for name in names:
        specs[name].fn(spark, sf_dir).collect()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()  # each query's persists stay in ITS timing

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

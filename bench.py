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
    #
    # released_caches wraps every run because clearCache() only drops
    # SQL-cached relations — localCheckpoint RDD blocks (the curation /
    # doc-vector lineage truncations) survive it and would otherwise
    # accumulate corpus-sized executor storage across the 174-query
    # session (r13 measurement-hygiene fix; methodology — warmup,
    # min-of-2, collect-to-driver timing — unchanged, and the release
    # itself happens AFTER the wall-clock read so it never counts
    # against the query).
    from bigdatasmallprice_spark.caching import released_caches

    for name in names:
        with released_caches(spark):
            specs[name].fn(spark, sf_dir).collect()
        spark.catalog.clearCache()

    # min-of-2 for anything over a second: single-run wall times of the
    # big queries drift +-10% run-to-run from session/GC noise, which
    # used to force a manual re-measure section in every cross-round
    # comparison (BASELINE.md). The minimum of two runs is the standard
    # steady-state estimator; sub-second queries stay single-run (their
    # absolute drift is negligible in the total).
    timings: dict[str, float] = {}
    for name in names:
        with released_caches(spark):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            df.collect()
            wall = time.perf_counter() - t0
        spark.catalog.clearCache()  # each query's persists stay in ITS timing
        if wall > 1.0:
            with released_caches(spark):
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).collect()
                wall = min(wall, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(wall, 4)

    # the skew A/B pair is a synthetic experiment (hot key amplified,
    # AQE deliberately defeated), not a corpus query — reported under
    # its own key so it doesn't distort the headline total
    skew_evidence: dict[str, float] = {}
    bench_skew(spark, sf_dir, skew_evidence)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Carried-vs-new decomposition against the PREVIOUS artifact on
    # disk (VERDICT r9 ask #8): the ±20% host band dominates raw
    # round-over-round totals, so every cross-round comparison needed
    # manual forensics in BASELINE.md prose. The artifact now records
    # the like-for-like split itself: the HEADLINE subtotal, this
    # run's subtotal over the query set the previous artifact also
    # measured (carried), the previous artifact's subtotal over that
    # same set (prev_carried_subtotal — the direct like-for-like
    # comparand), and what's genuinely new.
    full_name = (
        "BENCH_FULL_local.json"
        if sf == "0.1"
        else f"BENCH_FULL_local_sf{sf}.json"
    )
    full_path = os.path.join(os.path.dirname(__file__) or ".", full_name)
    prev_q: dict[str, float] = {}
    prev_total = None
    try:
        with open(full_path) as fh:
            prev = json.load(fh)
        prev_q = prev.get("queries", {})
        prev_total = prev.get("value")
    except (OSError, ValueError):
        pass
    shared = sorted(set(timings) & set(prev_q))
    full = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "skew_evidence": skew_evidence,
        "headline_subtotal": round(
            sum(timings[n] for n in HEADLINE if n in timings), 4
        ),
        "carried_subtotal": round(sum(timings[n] for n in shared), 4),
        "prev_carried_subtotal": round(sum(prev_q[n] for n in shared), 4),
        "prev_total": prev_total,
        "new_queries": sorted(set(timings) - set(prev_q)),
        "new_subtotal": round(
            sum(v for n, v in timings.items() if n not in prev_q), 4
        ),
        # metric-composition flags: the headline total covers every
        # registered query and EXCLUDES the synthetic skew A/B pair
        # (moved to skew_evidence after round 1 — round-1 totals
        # included it, so cross-round comparisons should diff the
        # shared per-query timings, not raw totals)
        "metric_version": 3,
        "total_includes_skew": False,
        "n_queries": len(timings),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Complete record (all registered queries, 4-decimal timings) goes to
    # a file; the stdout line must stay parseable from the LAST 2000
    # CHARS of captured output (rounds 1-2 evidence: the harness stores
    # tail=2000 and its parse came back null because the full per-query
    # map overflowed that window). The printed line therefore carries the
    # driver-allowlist per-query timings at 2-decimal precision — the
    # total still covers every registered query — and points at the file.
    # sf-tagged filename: a run at another sf must not clobber the
    # committed sf0.1 evidence the stdout pointer names (full_name /
    # full_path resolved above, where the previous artifact is read
    # for the carried-vs-new decomposition)
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    from bigdatasmallprice_spark.registry import DRIVER_ORDER

    compact = dict(full)
    compact["skew_evidence"] = {k: round(v, 2) for k, v in skew_evidence.items()}
    compact["full_timings"] = full_name
    # stay inside the 2000-char tail window: start from the full driver
    # allowlist and shrink (slowest-first, stable key set) until it fits
    driver_names = [n for n in DRIVER_ORDER if n in timings]
    keep = len(driver_names)
    while True:
        chosen = sorted(driver_names, key=timings.get, reverse=True)[:keep]
        compact["queries"] = {n: round(timings[n], 2) for n in sorted(chosen)}
        line = json.dumps(compact)
        if len(line) <= 1990 or keep <= 10:
            break
        keep -= 5
    print(line)
    spark.stop()


def bench_skew(spark, sf_dir: str, timings: dict[str, float]) -> None:
    """Hot-key evidence for the salted-join operator (operators/skew.py):
    one user_id is remapped to carry ~30% of all events, the dim side is
    amplified 128x, broadcast and AQE's skew-join split are disabled so
    the sort-merge join actually exhibits the hot reducer — the scenario
    salting exists for (build side too big to broadcast, AQE defeated).
    Records salted-vs-unsalted wall times; asserts identical results via
    exact integer measures.
    """
    from pyspark.sql import functions as F

    from bigdatasmallprice_spark.catalog import load_table
    from bigdatasmallprice_spark.operators.skew import salted_join_left_hot

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # 80% of all rows collapse onto user 0 — one reducer's join output is
    # ~40M rows while the other 31 share the rest
    skewed = ev.withColumn(
        "user_id",
        F.when(F.pmod(F.hash("event_id"), 10) < 8, F.lit(0)).otherwise(
            F.col("user_id")
        ),
    )
    dim = (
        skewed.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(511))).alias("attr"),
        )
        .withColumn("w", F.pmod(F.hash("user_id", "attr"), F.lit(100)).cast("long"))
    )

    def measure(joined):
        return joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("w") * F.round(F.col("value") * 100).cast("long")).alias("s"),
        ).collect()[0]

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        r_plain = r_salt = None
        for _ in range(2):  # first run warms codegen; second is recorded
            t0 = time.perf_counter()
            r_plain = measure(skewed.join(dim, "user_id"))
            timings["skew_join_unsalted"] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            r_salt = measure(salted_join_left_hot(skewed, dim, ["user_id"], n_salts=8))
            timings["skew_join_salted"] = round(time.perf_counter() - t0, 4)
        assert (r_plain.n, r_plain.s) == (r_salt.n, r_salt.s), "salted join diverged"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


if __name__ == "__main__":
    main()

"""Profile one registered query: run it once (warm) then once timed with
event logging enabled, and print per-job wall times with descriptions,
plus the gap (driver-side planning/collect time) between jobs.

Usage: python scripts/profile_query.py <name> [--sf DIR]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = f"/tmp/sparklogs_{name}"
    os.makedirs(log_dir, exist_ok=True)
    for f in glob.glob(os.path.join(log_dir, "*")):
        os.remove(f)

    from bigdatasmallprice_spark.registry import all_queries
    from bigdatasmallprice_spark.session import get_spark

    spark = get_spark(
        f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    specs = all_queries()
    # warmup
    t0 = time.perf_counter()
    specs[name].fn(spark, sf_dir).collect()
    warm = time.perf_counter() - t0
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"TIMED::{name}")
    t0 = time.perf_counter()
    specs[name].fn(spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    print(f"WARMUP {warm:.2f}s  TIMED {wall:.2f}s")
    spark.stop()

    logs = [
        f
        for f in glob.glob(os.path.join(log_dir, "*"))
        if os.path.isfile(f) and not f.endswith(".inprogress")
    ]
    logs.sort(key=os.path.getmtime)
    jobs: dict[int, dict] = {}
    with open(logs[-1]) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties", {}) or {}
                infos = ev.get("Stage Infos", []) or []
                names = [si.get("Stage Name", "")[:60] for si in infos]
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:110],
                    "stages": len(ev.get("Stage IDs", [])),
                    "names": names,
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["end"] = ev["Completion Time"]

    done = [
        (jid, j) for jid, j in sorted(jobs.items()) if "end" in j
    ]
    # only report the timed (second) half: find the first job whose desc
    # starts with TIMED::
    first_timed = next(
        (i for i, (_, j) in enumerate(done) if j["desc"].startswith("TIMED::")),
        0,
    )
    sel = done[first_timed:]
    if not sel:
        sel = done
    prev_end = None
    total_job = 0
    total_gap = 0
    for jid, j in sel:
        dur = (j["end"] - j["start"]) / 1000.0
        gap = 0.0 if prev_end is None else (j["start"] - prev_end) / 1000.0
        prev_end = j["end"]
        total_job += dur
        total_gap += max(gap, 0)
        nm = "; ".join(j.get("names", [])[-2:])
        print(f"job {jid:4d}  {dur:7.2f}s  gap {gap:6.2f}s  st={j['stages']:3d}  {nm}")
    print(f"TOTAL job time {total_job:.2f}s, inter-job gap {total_gap:.2f}s")


if __name__ == "__main__":
    main()

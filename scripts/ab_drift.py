"""Interleaved A/B: current tree vs an older worktree, per query.

Usage:  python scripts/ab_drift.py <old_tree_path> <sf_dir> <query> [<query>...]

For each query, alternates subprocess measurements OLD,NEW,OLD,NEW,OLD,NEW
(three reps per side, each rep = fresh JVM, one warmup run then one timed
run) so slow machine drift over the session cancels out of the comparison.
Prints one JSON line per query with the per-rep timings and medians.

VERDICT r4 ask #5: attribute the r3->r4 bench drifts (drift vs real plan
regression) with controlled, same-session interleaved evidence.
"""
import json
import statistics
import subprocess
import sys

RUNNER = r"""
import sys, time
sys.path.insert(0, {tree!r})
from bigdatasmallprice_spark.session import get_spark
from bigdatasmallprice_spark.registry import all_queries
spark = get_spark("ab-drift")
q = all_queries()[{query!r}].fn
q(spark, {sf!r}).collect()          # warmup: JIT + file listing + broadcast
t0 = time.monotonic()
q(spark, {sf!r}).collect()
print("ABTIME", time.monotonic() - t0)
spark.stop()
"""


def measure(tree: str, query: str, sf: str) -> float:
    code = RUNNER.format(tree=tree, query=query, sf=sf)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, cwd=tree,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABTIME"):
            return float(line.split()[1])
    raise RuntimeError(f"{query} in {tree} failed:\n{out.stderr[-2000:]}")


def main() -> None:
    old_tree, sf = sys.argv[1], sys.argv[2]
    new_tree = "/root/repo"
    for query in sys.argv[3:]:
        reps = {"old": [], "new": []}
        for _ in range(3):
            reps["old"].append(measure(old_tree, query, sf))
            reps["new"].append(measure(new_tree, query, sf))
        print(json.dumps({
            "query": query, "sf_dir": sf,
            "old": [round(t, 3) for t in reps["old"]],
            "new": [round(t, 3) for t in reps["new"]],
            "old_median": round(statistics.median(reps["old"]), 3),
            "new_median": round(statistics.median(reps["new"]), 3),
        }), flush=True)


if __name__ == "__main__":
    main()

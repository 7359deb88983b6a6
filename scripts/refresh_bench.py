"""Quiet-machine bench refresh with commit-message hygiene (VERDICT r7
ask #7): the r7 refresh commit said 150.8s while the artifact it
committed read 152.0s — two separate runs. This script makes the
artifact and its commit message structurally unable to disagree: it
runs bench.py ONCE, reads the total back from the artifact that run
wrote, and prints (or executes with --commit) a `git commit` whose
message quotes exactly the committed value.

Usage:
    python scripts/refresh_bench.py            # run + print the command
    python scripts/refresh_bench.py --commit   # run + commit the artifact
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "BENCH_FULL_local.json")


def main() -> None:
    load1 = os.getloadavg()[0]
    if load1 > 2.0:
        print(
            f"WARNING: 1-min load average is {load1:.1f} — this is not "
            "a quiet machine; the refresh will read high.",
            file=sys.stderr,
        )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        check=True,
        cwd=REPO,
        stdout=subprocess.DEVNULL,
    )
    with open(ARTIFACT) as fh:
        full = json.load(fh)
    total = full["value"]
    nq = len(full["queries"])
    # the artifact self-reports the like-for-like decomposition
    # (bench.py, VERDICT r9 ask #8) — quote it so the trend reads
    # without BASELINE.md forensics
    decomp = ""
    if "carried_subtotal" in full:
        decomp = (
            f" Headline subtotal {full['headline_subtotal']}s; carried "
            f"set {full['carried_subtotal']}s vs "
            f"{full['prev_carried_subtotal']}s in the previous artifact "
            f"(like-for-like); {len(full['new_queries'])} new queries "
            f"add {full['new_subtotal']}s."
        )
    msg = (
        f"Refresh bench artifact from a quiet-machine run\n\n"
        f"BENCH_FULL_local.json reads {total}s / {nq} queries — the "
        f"total quoted here is read back from the committed artifact "
        f"itself (scripts/refresh_bench.py), so message and file "
        f"cannot disagree.{decomp}"
    )
    if "--commit" in sys.argv:
        subprocess.run(["git", "-C", REPO, "add", ARTIFACT], check=True)
        diff = subprocess.run(
            ["git", "-C", REPO, "diff", "--cached", "--quiet", "--", ARTIFACT]
        )
        if diff.returncode == 0:
            print(f"artifact unchanged at {total}s / {nq} queries — nothing to commit")
            return
        subprocess.run(
            ["git", "-C", REPO, "commit", "-m", msg, "--", ARTIFACT],
            check=True,
        )
    else:
        import shlex

        print(f"total={total}s n_queries={nq}")
        print("commit with:")
        print("  git add BENCH_FULL_local.json")
        print(
            f"  git commit -m {shlex.quote(msg)} -- BENCH_FULL_local.json"
        )


if __name__ == "__main__":
    main()

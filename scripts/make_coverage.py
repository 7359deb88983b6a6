"""Emit COVERAGE.json: per registered query, the rounds with a green
external CORRECTNESS row.

The rotation ledger in machine-readable form (VERDICT r3 ask #8): for
every name in the query registry, which CORRECTNESS_r*.json files on
disk contain a fully-green row (rows+schema+hash match, no err), plus
rows-only passes (no oracle) listed separately. A query with an empty
list has only local DuckDB-parity coverage (tests/test_oracle_parity.py)
— the driver has never checked it externally. tests/test_coverage.py
asserts the checked-in artifact matches the CORRECTNESS files on disk,
so the artifact cannot silently drift.

Run from the repo root:  python scripts/make_coverage.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(row: dict) -> bool:
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        # rows-only checks (no oracle SQL) have no hash; require it only
        # when the driver recorded one
        and row.get("hash_match") in (True, None)
    )


def build_coverage(rounds_filter: list[int] | None = None) -> dict:
    """Build the ledger from the CORRECTNESS files on disk.

    ``rounds_filter`` restricts the build to those round numbers — used
    by tests/test_coverage.py to re-derive the ledger as it stood before
    the newest driver artifact landed (the end-of-round snapshot race).
    """
    from bigdatasmallprice_spark.registry import all_queries

    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        if rounds_filter is not None and int(m.group(1)) not in rounds_filter:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)

    names = sorted(all_queries())
    cov = {
        name: sorted(
            r for r, rows in rounds.items() if name in rows and _green(rows[name])
        )
        for name in names
    }
    verified = [n for n, rs in cov.items() if rs]
    return {
        "rounds_on_disk": sorted(rounds),
        "registered": len(names),
        "driver_verified": len(verified),
        "driver_unverified": sorted(n for n in names if not cov[n]),
        "coverage": cov,
    }


if __name__ == "__main__":
    out = build_coverage()
    path = os.path.join(REPO, "COVERAGE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"{path}: {out['driver_verified']}/{out['registered']} driver-verified; "
        f"unverified: {out['driver_unverified']}"
    )

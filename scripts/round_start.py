"""Round-start ledger hygiene in one command (VERDICT r8 ask #2: the
COVERAGE.json / SURVEY §8 drift was the same class two rounds running
— make the round-start do both mechanically).

Run: python scripts/round_start.py

1. Regenerates COVERAGE.json from every CORRECTNESS_r*.json on disk
   (delegates to scripts/make_coverage.py).
2. Audits SURVEY.md §8's rotation ledger: any row still reading
   "| pending |" whose round already has a CORRECTNESS file on disk is
   flagged with the actual green count to fill in.
3. Prints the per-query staleness table (green-row count, last green
   round) the next DRIVER_ORDER rotation is built from.

Exit code 1 if the ledger needs a manual fill, so the round's first
commit cannot silently carry a stale "pending" cell.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def greens_by_round() -> dict[int, tuple[int, int]]:
    """{round: (green, total)} from the CORRECTNESS files on disk."""
    out: dict[int, tuple[int, int]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        rows = json.load(open(f))
        green = sum(
            1
            for v in rows.values()
            if v.get("rows_match")
            and v.get("schema_match", True)
            and v.get("hash_match", True)
        )
        out[int(m.group(1))] = (green, len(rows))
    return out


def staleness() -> list[tuple[str, int, int]]:
    """[(query, n_greens, last_green_round)] sorted stalest-first."""
    per: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", f)
        rows = json.load(open(f))
        for q, v in rows.items():
            if (
                v.get("rows_match")
                and v.get("schema_match", True)
                and v.get("hash_match", True)
            ):
                per.setdefault(q, []).append(int(m.group(1)))
    return sorted(
        ((q, len(rs), max(rs)) for q, rs in per.items()),
        key=lambda t: (t[1], t[2]),
    )


def main() -> int:
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_coverage.py")],
        check=True,
    )
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    byr = greens_by_round()
    stale_cells = []
    for m in re.finditer(r"^\| r(\d+) \|.*\| pending \|\s*$", survey, re.M):
        r = int(m.group(1))
        if r in byr:
            stale_cells.append((r, byr[r]))
    print("\nper-query staleness (greens, last-green, name) — head:")
    for q, n, last in staleness()[:30]:
        print(f"  {n} r{last} {q}")
    if stale_cells:
        for r, (g, t) in stale_cells:
            print(
                f"\nSURVEY §8: the r{r} row still reads 'pending' but "
                f"CORRECTNESS_r{r:02d}.json is on disk — fill it with "
                f"{g}/{t} green."
            )
        return 1
    print("\nledger clean: no pending SURVEY rows for rounds on disk")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

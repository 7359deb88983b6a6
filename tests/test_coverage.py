"""COVERAGE.json is the machine-readable rotation ledger — assert the
checked-in artifact matches the CORRECTNESS_r*.json files on disk and
that DRIVER_ORDER prioritizes never-driver-verified queries."""

from __future__ import annotations

import json
import os

from scripts.make_coverage import REPO, build_coverage


def test_coverage_artifact_matches_disk():
    with open(os.path.join(REPO, "COVERAGE.json")) as f:
        on_disk = json.load(f)
    assert on_disk == build_coverage(), (
        "COVERAGE.json is stale — regenerate with scripts/make_coverage.py"
    )


def test_driver_order_contains_all_unverified():
    """Every query without a green external row must be in the current
    driver allowlist (else the verification gap can silently persist)."""
    from bigdatasmallprice_spark.registry import DRIVER_ORDER

    cov = build_coverage()
    missing = [n for n in cov["driver_unverified"] if n not in DRIVER_ORDER]
    assert not missing, f"unverified queries not in DRIVER_ORDER: {missing}"

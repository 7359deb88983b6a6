"""Sketch-query guarantees beyond the oracle parity sweep: HLL error
bounds on both estimator branches and the Count-Min overestimate
guarantee (exact <= est <= exact + e/w * N)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.queries.sketchq import (
    _CMS_TOPK,
    _HLL_M,
    hll_estimate,
)
from bigdatasmallprice_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_hll_raw_branch_accuracy_on_documents(spark):
    """Per-source shingle cardinalities (~1.1k) sit far above the
    2.5m=640 small-range threshold, so the harmonic-mean path runs;
    the data is deterministic, so the observed max error is a fixed
    number (0.121 at sf0.001) — assert a small margin above it, still
    ~2 sigma of the 6.5% standard error."""
    rows = all_queries()["hll_distinct"].fn(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_exact_distinct > 2.5 * _HLL_M  # raw-branch regime
        assert abs(r.est_distinct / r.n_exact_distinct - 1) <= 0.15, r
        # register state is genuinely folded: nearly all registers hit
        assert r.n_registers >= _HLL_M - 8


def test_hll_small_range_branch_linear_counting(spark):
    """A 60-distinct synthetic frame lands in the small-range branch
    (raw estimate <= 2.5m with empty registers): the estimate must be
    the linear-counting formula and close to the truth."""
    words = spark.range(60).select(
        F.lit("s").alias("source"), F.concat(F.lit("w"), F.col("id")).alias("wd")
    )
    [r] = hll_estimate(words).collect()
    assert r.n_exact_distinct == 60
    assert r.v_zero > 0
    assert abs(r.est_distinct / 60 - 1) <= 0.12, r


def test_hll_register_fold_is_merge_invariant(spark):
    """MAX-mergeability: folding the same words twice (union of two
    identical halves) must not change a single output value — the
    property that lets shards/days merge at 100 TB."""
    words = spark.range(500).select(
        F.lit("s").alias("source"), F.concat(F.lit("w"), F.col("id")).alias("wd")
    )
    once = hll_estimate(words).collect()[0]
    twice = hll_estimate(words.union(words)).collect()[0]
    assert once.est_distinct == twice.est_distinct
    assert once.s_scaled == twice.s_scaled
    assert once.n_exact_distinct == twice.n_exact_distinct
    # only the instance count doubles
    assert twice.n_instances == 2 * once.n_instances


def test_count_min_guarantee(spark):
    rows = all_queries()["count_min_probe"].fn(spark, SF).collect()
    assert len(rows) == _CMS_TOPK
    for r in rows:
        assert r.est_cnt >= r.exact_cnt, r  # CMS never undercounts
        assert r.overcount == r.est_cnt - r.exact_cnt
        assert r.overcount <= r.err_bound, r  # e/w * N bound holds


def test_hll_union_estimates_within_bounds(spark):
    """Union estimate within 15% of the exact union for every source
    pair; the inclusion-exclusion overlap estimate within the standard
    HLL-intersection tolerance (error scales with the UNION size, not
    the overlap — small overlaps are noisy by design, Flajolet 2007)."""
    rows = all_queries()["hll_union_distinct"].fn(spark, SF).collect()
    assert len(rows) == 190  # 20 choose 2
    for r in rows:
        # deterministic data: observed max 17.6% (~2.7 sigma of the
        # 6.5% standard error across 190 pairs) — assert a margin above
        assert abs(r.est_union / r.exact_union - 1) <= 0.20, r
        assert abs(r.est_overlap - r.exact_overlap) <= 0.25 * r.exact_union, r
        # exact identities hold inside the result
        assert r.exact_union == r.exact_a + r.exact_b - r.exact_overlap


def test_hll_union_lean_matches_audited_estimates(spark):
    """The lean (audit-free) variant must produce BIT-IDENTICAL
    estimates to the audited twin for every pair: the register MAX-fold
    is idempotent, so skipping the (source, shingle) distinct cannot
    change a single register, and the downstream fold is the same
    expression tree."""
    full = {
        (r.src_a, r.src_b): (r.est_a, r.est_b, r.est_union, r.est_overlap)
        for r in all_queries()["hll_union_distinct"].fn(spark, SF).collect()
    }
    lean = {
        (r.src_a, r.src_b): (r.est_a, r.est_b, r.est_union, r.est_overlap)
        for r in all_queries()["hll_union_lean"].fn(spark, SF).collect()
    }
    assert lean == full

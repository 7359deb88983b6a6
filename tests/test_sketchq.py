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


def test_quantile_sketch_bound_and_mergeability(spark):
    """The histogram quantile sketch's guarantee: the estimate never
    undershoots the exact rank statistic and overshoots by less than
    one bin width — for every type and every percentile. Merge-order
    independence: the per-(type, bin) counters folded from two disjoint
    halves SUM to exactly the full-corpus histogram (integer sums
    commute), the property GK / t-digest summaries lack and the reason
    this sketch is engine-portable and replay-analyzable."""
    from pyspark.sql import functions as F

    from bigdatasmallprice_spark.queries.core import table
    from bigdatasmallprice_spark.queries.sketchq import _HQ_B, _HQ_W

    rows = all_queries()["quantile_sketch_by_type"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        for p in (50, 90, 99):
            err = r[f"err_p{p}_c"]
            assert 0 <= err < r.bin_width_c, (r.event_type, p, err)

    ev = table(spark, SF, "events")

    def hist(df):
        return {
            (r.event_type, r.bin): r.cnt
            for r in df.select(
                "event_type",
                F.expr(
                    f"greatest(least(CAST(round(value * 100) AS BIGINT), "
                    f"{_HQ_W * _HQ_B - 1}), 0) div {_HQ_W}"
                ).alias("bin"),
            )
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    full = hist(ev)
    h1 = hist(ev.filter("event_id % 2 = 0"))
    h2 = hist(ev.filter("event_id % 2 = 1"))
    merged = dict(h1)
    for k, v in h2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_quantile_sketch_lean_matches_audited_estimates(spark):
    """The audit-free variant's estimates must be IDENTICAL to the
    audited twin's est_* columns — same histogram, same cumulative
    rule, minus the corpus sort (the bloom/hll lean-split property)."""
    full = {
        r.event_type: (r.n, r.est_p50_c, r.est_p90_c, r.est_p99_c)
        for r in all_queries()["quantile_sketch_by_type"].fn(spark, SF).collect()
    }
    lean = {
        r.event_type: (r.n, r.est_p50_c, r.est_p90_c, r.est_p99_c)
        for r in all_queries()["quantile_sketch_lean"].fn(spark, SF).collect()
    }
    assert lean == full

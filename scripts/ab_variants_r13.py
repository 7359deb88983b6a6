"""Same-session A/B for the r13 BPE-trainer rewrite: the r12 loop
(3 collects + eager checkpoint per round) vs the single-collect loop
(unioned head + per-symbol bounds, lazy checkpoint) — both variants in
ONE session so machine and JVM state cancel out, and the merge
sequences asserted identical. Honors $SPARK_GRAFT_SF_DIR /
$SPARK_GRAFT_CPUS.

Measured (sf0.1, local[32], min-of-2): 6.91s -> 4.06s unfloored,
5.21s -> 3.10s floored; identical merges both times.

A KN-scorer fast path (probability per gram type + k-weighted per-doc
sums) was also A/B'd here and REJECTED: the (doc_id, gram...) hash
aggregate it needs costs more at sf0.1 than the occurrence-frame
joins it saves (kn 1.99 vs 3.01, kn3 4.76 vs 4.80, mkn3 5.62 vs 7.13
unfloored; floored no better) — see OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(spark, label, fn, runs=2):
    from bigdatasmallprice_spark.caching import released_caches

    fn()  # warmup
    spark.catalog.clearCache()
    best = float("inf")
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{label}#{i}")
        with released_caches(spark):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(f"AB {label}: {best:.3f}s", flush=True)
    return best


def old_bpe_train_batched(wc, n_merges, head_k=256):
    """The r12 loop verbatim (3 collects + eager checkpoint per round)."""
    from pyspark.sql import functions as F

    from bigdatasmallprice_spark.operators.bpe import select_exact_merge_batch

    seg = wc.select(
        "word", "c", F.regexp_replace("word", "(?s)(.)", "($1)").alias("m")
    ).localCheckpoint(eager=True)
    merges = []
    while len(merges) < n_merges:
        syms = F.expr(r"split(substring(m, 2, length(m) - 2), '\\)\\(')")
        pr = seg.select(F.col("c"), syms.alias("s")).filter(F.size("s") >= 2)
        pairs = pr.select(
            "c",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1),"
                    " i -> struct(s[i-1] AS a, s[i] AS b))"
                )
            ).alias("p"),
        ).select("c", "p.a", "p.b")
        pc = pairs.groupBy("a", "b").agg(
            F.sum("c").cast("long").alias("cnt")
        ).persist()
        head = [
            (r.a, r.b, r.cnt)
            for r in pc.orderBy(F.col("cnt").desc(), "a", "b")
            .limit(head_k)
            .collect()
        ]
        if not head:
            pc.unpersist()
            break
        head_syms = list({s for a, b, _ in head for s in (a, b)})
        max_ending = {
            r.b: r.mx
            for r in pc.filter(F.col("b").isin(head_syms))
            .groupBy("b").agg(F.max("cnt").alias("mx")).collect()
        }
        max_starting = {
            r.a: r.mx
            for r in pc.filter(F.col("a").isin(head_syms))
            .groupBy("a").agg(F.max("cnt").alias("mx")).collect()
        }
        pc.unpersist()
        batch = select_exact_merge_batch(head, max_ending, max_starting)
        batch = batch[: n_merges - len(merges)]
        col = F.col("m")
        for a, b, _ in batch:
            col = F.replace(col, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
        seg = seg.withColumn("m", col).localCheckpoint(eager=True)
        merges.extend(batch)
    return merges


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from bigdatasmallprice_spark.operators.bpe import bpe_train_batched
    from bigdatasmallprice_spark.queries.core import table
    from bigdatasmallprice_spark.queries.textq import _BPE_ITER_MERGES
    from bigdatasmallprice_spark.session import get_spark

    spark = get_spark("ab-variants-r13")
    docs = table(spark, sf_dir, "documents")

    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter("word <> ''")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = _BPE_ITER_MERGES

    r_old = r_new = None

    def run_bpe_old():
        nonlocal r_old
        r_old = old_bpe_train_batched(wc, n)

    def run_bpe_new():
        nonlocal r_new
        r_new = bpe_train_batched(wc, n)

    timeit(spark, "bpe_old", run_bpe_old)
    timeit(spark, "bpe_new", run_bpe_new)
    assert r_old == r_new, "BPE fold changed the merge sequence!"
    print("bpe merge sequences identical", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

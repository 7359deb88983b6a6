"""Production-vocab BPE (VERDICT r11 ask #3): the EXACT batched
trainer must equal the one-merge-per-round sequential loop bit-for-bit
(the registered bpe_train_iterative's oracle re-checks this on real
corpus data), and the apply side must hold char-exact between the
codegen replace-chain and the Arrow encode path at a large merge
table — with the measured feasibility crossover documented: the
expression chain (SQL parser AND Column API) stack-overflows near
~300-400 nested replaces, so the Arrow ``bpe_encode_tokens`` is the
production encode for real (1k-50k merge) vocabularies; the chain is
the zero-Python fast path for small pinned artifacts."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.bpe import (
    bpe_encode_tokens,
    bpe_symbols_sql,
    bpe_token_count_from_symbols_sql,
    bpe_train_batched,
    bpe_train_sequential_py,
    select_exact_merge_batch,
)

SF = "/root/testdata/sf0.001"


def _wc_df(spark, word_counts: dict[str, int]):
    return spark.createDataFrame(
        [(w, c) for w, c in word_counts.items()], "word string, c long"
    )


def test_batched_trainer_equals_sequential_random_vocabs(spark):
    """Differential over random vocabularies: the batched trainer's
    merge list (pairs AND counts AND order) equals the sequential
    reference — the equivalence proof exercised beyond natural text
    (runs, ties, multi-level resurrection shapes)."""
    rng = random.Random(712)
    for trial in range(3):
        vocab = {
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 9))): rng.randint(
                1, 40
            )
            for _ in range(60)
        }
        got = bpe_train_batched(_wc_df(spark, vocab), 15)
        want = bpe_train_sequential_py(vocab, 15)
        assert got == want, (trial, got, want)


def test_batched_trainer_small_head_still_exact(spark):
    """head_k only bounds how much of the ranked list the driver sees
    per round — a tiny head may shrink batches (more rounds), never
    change the merge sequence."""
    vocab = {"abab": 7, "abc": 5, "bc": 5, "aab": 3, "cc": 2}
    got = bpe_train_batched(_wc_df(spark, vocab), 8, head_k=2)
    assert got == bpe_train_sequential_py(vocab, 8)


def test_select_exact_merge_batch_bounds():
    """The two batch-ending rules, on the counterexamples that break
    naive top-m batching."""
    # new-pair bound: merging (a,b) in "xab"*100 creates (x,ab) with
    # count <= cnt(x,a) = 100 — the tied candidate (x,a) must NOT ride
    # along (sequential would pick the NEW pair next, not (c,d))
    head = [("a", "b", 100), ("x", "a", 100), ("c", "d", 50)]
    batch = select_exact_merge_batch(
        head, {"a": 100, "b": 100, "d": 50}, {"b": 0, "a": 100, "c": 50}
    )
    assert batch == [("a", "b", 100)]
    # symbol-disjoint pairs with no adjacent mass: both ride
    head = [("a", "b", 100), ("c", "d", 90)]
    batch = select_exact_merge_batch(head, {}, {})
    assert batch == [("a", "b", 100), ("c", "d", 90)]
    # shared symbol ends the batch even when counts allow it
    head = [("a", "b", 100), ("b", "c", 90)]
    assert select_exact_merge_batch(head, {}, {}) == [("a", "b", 100)]


def _big_merge_table(n: int) -> list[tuple[str, str]]:
    """Deterministic creation-ordered table: all 676 char pairs, then
    (2-char symbol, char) extensions — every symbol a char or an
    earlier output, so the chain's well-formedness check accepts it."""
    alpha = "abcdefghijklmnopqrstuvwxyz"
    merges = [(a, b) for a, b in itertools.product(alpha, alpha)]
    merges += [
        (a + b, c)
        for (a, b), c in itertools.product(
            [(x, y) for x, y in itertools.product(alpha[:6], alpha)], alpha
        )
    ]
    assert len(merges) >= n
    return merges[:n]


def test_arrow_encode_equals_chain_at_shared_prefix(spark):
    """Char-exact agreement of the two apply paths on real documents
    at a 200-merge table — the largest size the expression chain
    comfortably parses (measured: ~300-400 nested replaces overflow
    the SQL parser / Column-API converter stack, so 1k+ vocabularies
    are Arrow-only territory)."""
    merges = _big_merge_table(200)
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
        .cache()
    )
    sym = bpe_symbols_sql("text", merges, "spark")
    cnt = bpe_token_count_from_symbols_sql("m", "text")
    chain = {
        r.doc_id: r.n
        for r in docs.selectExpr("doc_id", f"{sym} AS m", "text")
        .selectExpr("doc_id", f"{cnt} AS n")
        .collect()
    }
    arrow = {
        r.doc_id: r.n_bpe_tokens for r in bpe_encode_tokens(docs, merges).collect()
    }
    assert arrow == chain


def test_pack_over_arrow_encode_at_production_vocab(spark):
    """The packing tail runs over the Arrow encode's counts at a
    1000-merge table (the production-vocab path the chain cannot
    reach): every bin accounted, totals preserved, and counts
    monotonically <= the 200-merge prefix's (more merges never add
    tokens)."""
    from bigdatasmallprice_spark.queries.textq import pack_bins_from_counts

    merges = _big_merge_table(1000)
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
        .cache()
    )
    enc = bpe_encode_tokens(docs, merges).cache()
    full = {r.doc_id: r.n_bpe_tokens for r in enc.collect()}
    prefix = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_encode_tokens(docs, _big_merge_table(200)).collect()
    }
    assert set(full) == set(prefix)
    assert all(full[d] <= prefix[d] for d in full)
    bins = pack_bins_from_counts(
        enc.select("doc_id", F.col("n_bpe_tokens").alias("nt"))
    ).collect()
    assert sum(r.token_sum for r in bins) == sum(full.values())
    assert sum(r.n_docs for r in bins) == len(full)


def test_approx_trainer_cap1_equals_sequential(spark):
    """The production approximation's differential anchor: with
    batch_cap=1 the disjoint-batch selection degenerates to the exact
    sequential argmax, so the approximate trainer must reproduce the
    sequential reference bit-for-bit."""
    from bigdatasmallprice_spark.operators.bpe import bpe_train_batched_approx

    rng = random.Random(31)
    vocab = {
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 8))): rng.randint(1, 30)
        for _ in range(50)
    }
    got = bpe_train_batched_approx(_wc_df(spark, vocab), 12, batch_cap=1)
    assert got == bpe_train_sequential_py(vocab, 12)


def test_approx_trainer_production_cap(spark):
    """At a production cap the approximate trainer reaches the vocab in
    ~n/cap rounds and still emits a VALID creation-ordered table (both
    apply paths accept it), its first merge is the exact argmax, and
    encoding through the Arrow path runs end-to-end."""
    from bigdatasmallprice_spark.operators.bpe import bpe_train_batched_approx

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    w = docs.selectExpr("explode(filter(split(text, ' '), w -> w <> '')) AS word")
    wc = w.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("c"))
    merges = bpe_train_batched_approx(wc, 40, batch_cap=8)
    assert len(merges) == 40
    exact_first = bpe_train_batched(wc, 1)[0]
    assert merges[0] == exact_first
    table = [(a, b) for a, b, _ in merges]
    # creation-ordered: bpe_symbols_sql's well-formedness check accepts
    bpe_symbols_sql("text", table[:40], "spark")
    enc = bpe_encode_tokens(docs.limit(50), table).collect()
    assert all(r.n_bpe_tokens <= r.n_chars for r in enc)

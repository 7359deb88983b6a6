"""BPE tokenizer APPLICATION: encode text with a trained merge table.

Completes the tokenizer loop whose training half is
``queries/textq.py::bpe_train_merges_q`` (corpus pair frequencies →
ranked merge list). Apply-side semantics are classic BPE (Sennrich et
al. 2016 / GPT-2 ``bpe()``): start from characters, repeatedly merge
the adjacent symbol pair with the LOWEST merge rank until no pair is
in the table. Rank-priority iterative merging is inherently
order-dependent per word, so this is a genuinely non-SQL-expressible
operator — correctness comes from differential tests against an
obviously-correct reference implementation plus hand-built multi-level
merge tables (tests/test_operators.py), not a DuckDB oracle.

Scale design: the merge table is vocabulary-sized (KBs–MBs; 20 entries
in the registered trainer, ~50k for a production tokenizer) and ships
to executors once inside the UDF closure (Spark broadcasts pickled
closures per task efficiently; for very large tables use
``SparkContext.broadcast`` explicitly). Encoding itself is per-row
work inside Arrow batches — embarrassingly parallel, no shuffle. A
per-word LRU cache exploits Zipf: the few thousand hot words cover
most of the token mass, so the merge loop runs rarely.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE: merge the lowest-rank adjacent pair until none
    applies. Merging a pair rewrites ALL its occurrences left-to-right
    (non-overlapping), matching the reference GPT-2 algorithm."""
    symbols = list(word)
    while len(symbols) >= 2:
        best_rank, best_pair = None, None
        for a, b in zip(symbols, symbols[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def make_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    """Merge list (rank order) → pair→rank lookup."""
    return {pair: i for i, pair in enumerate(merges)}


def bpe_encode_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE encode: (doc_id, n_words, n_chars, n_bpe_tokens)
    per document — the token-budget accounting a packing/pricing stage
    consumes. Whitespace pre-tokenization (the corpus convention),
    then per-word merge loop with an LRU word cache."""
    ranks = make_ranks(merges)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        @lru_cache(maxsize=65536)
        def n_toks(word: str) -> int:
            return len(bpe_segment(word, ranks))

        for pdf in batches:
            rows = []
            for d, text in zip(pdf[id_col].astype("int64"), pdf[text_col]):
                words = [w for w in (text or "").split(" ") if w]
                rows.append(
                    {
                        "doc_id": int(d),
                        "n_words": len(words),
                        "n_chars": sum(len(w) for w in words),
                        "n_bpe_tokens": sum(n_toks(w) for w in words),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select(id_col, text_col).mapInPandas(
        _encode, "doc_id long, n_words long, n_chars long, n_bpe_tokens long"
    )


def trained_merges(spark, sf_dir: str) -> list[tuple[str, str]]:
    """Collect the registered trainer's ranked 2-char pairs as an
    apply-ready merge list (the trainer's pairs are character-level, so
    each splits into its two single-char symbols). Collect is correct
    here: the merge table is the MODEL, bounded by vocabulary."""
    from bigdatasmallprice_spark.queries.textq import bpe_train_merges_q

    ranked = bpe_train_merges_q(spark, sf_dir).orderBy("merge_rank").collect()
    return [(r.pair[0], r.pair[1]) for r in ranked]


def bpe_symbols_sql(text_sql: str, merges: list[tuple[str, str]], dialect: str) -> str:
    """BPE APPLY as a pure string-expression chain — the codegen scale
    path for any WELL-FORMED (creation-ordered) merge table: each
    pair's two symbols must be single characters or outputs of
    earlier-ranked merges. Every table a BPE TRAINER emits has this
    shape by construction (a symbol is born at the rank that merges
    it), so this covers production multi-level tokenizers, not just
    the registered trainer's char-pair table.

    Equivalence argument: the classic priority loop (``bpe_segment``:
    merge the lowest-rank pair present, repeat) equals ONE
    left-to-right non-overlapping merge pass per rank in ascending
    rank order, because a rank-r merge can only create NEW adjacencies
    involving its output symbol — and in a creation-ordered table
    every pair containing that symbol has rank > r (the symbol did
    not exist earlier), while symbols on either side of the merged
    span were never made adjacent to each other. So no merge can ever
    resurrect a lower-or-equal rank, and processing ranks in order
    visits exactly the occurrences the priority loop merges. A
    left-to-right non-overlapping literal ``replace()`` IS that pass
    when each symbol is self-delimited: mark every character as
    ``(c)``, then ``replace(s, '(a)(b)', '(ab)')`` per merge in rank
    order. The parenthesis delimiters make false matches impossible
    (``(b)(c)`` cannot match inside ``(ab)(c)`` — multi-char symbols
    included) and adjacent matches share no characters (the aaaa run
    merges floor(n/2) times, exactly like ``bpe_segment``; a
    same-pair multi-char run ``(ab)(ab)(ab)`` likewise). Token count
    = count of '(' in the result.

    The same chain text runs on both engines (``replace`` is
    left-to-right non-overlapping in Spark and DuckDB); only the
    char-marking regexp differs per dialect ($1 vs \\1 backrefs).
    Delimiters are safe for the corpus alphabet (space + [a-z]); a
    general deployment would first map text through a 1:1 escape.

    At 100 TB this is the packing-stage tokenizer for SMALL pinned
    artifacts: ~R+1 linear scans of each row inside whole-stage
    codegen, zero shuffle, zero Python. MEASURED crossover
    (tests/test_bpe_train.py): both the SQL parser and the Column-API
    converter stack-overflow near ~300-400 nested replaces, and cost
    is O(merges) scans per row regardless — so a production (1k-50k
    merge) vocabulary runs the Arrow ``bpe_encode_tokens`` path
    (O(text) per row via the priority loop + Zipf LRU cache, which
    also accepts ill-formed tables), paying the Arrow batch transfer.
    The two paths are differential-tested char-exact on their shared
    (<=200-merge) prefix.
    """
    known = set()
    for a, b in merges:
        for sym in (a, b):
            if len(sym) != 1 and sym not in known:
                raise ValueError(
                    "codegen BPE apply requires a creation-ordered merge "
                    f"table: symbol {sym!r} is neither a character nor an "
                    "earlier merge's output"
                )
        known.add(a + b)
    # (?s): dot must match newline too — Java and RE2 dot both exclude
    # \n by default, so without it newline characters go unmarked and
    # the chain's token counts diverge from bpe_segment /
    # bpe_encode_tokens on documents containing newlines
    if dialect == "spark":
        chain = f"regexp_replace({text_sql}, '(?s)(.)', '($1)')"
    elif dialect == "duckdb":
        chain = f"regexp_replace({text_sql}, '(?s)(.)', '(\\1)', 'g')"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    for a, b in merges:
        chain = f"replace({chain}, '({a})({b})', '({a}{b})')"
    return chain


def bpe_token_count_from_symbols_sql(sym_col: str, text_sql: str) -> str:
    """Per-document BPE token count from a marked-symbol column: number
    of '(' symbols minus the space symbols (spaces are never in a merge
    pair, so each is its own symbol and a natural word barrier —
    whitespace pre-tokenization for free). Engine-shared SQL."""
    return (
        f"CAST(length({sym_col}) - length(replace({sym_col}, '(', ''))"
        f" - (length({text_sql}) - length(replace({text_sql}, ' ', '')))"
        " AS BIGINT)"
    )


def select_exact_merge_batch(
    head: list[tuple[str, str, int]],
    max_ending: dict[str, int],
    max_starting: dict[str, int],
) -> list[tuple[str, str, int]]:
    """The EXACT batched merge selection: the longest prefix of the
    ranked pair list ``head`` (sorted (cnt DESC, a ASC, b ASC) — the
    sequential trainer's argmax order) that is provably the same set,
    in the same order, a one-merge-at-a-time sequential trainer would
    pick. Driver-side over a bounded head; no corpus access.

    Why a prefix of the ranked list is safe (the equivalence proof the
    differential tests and the unrolled-sequential oracle check):

    - SYMBOL-DISJOINT: a merge (a,b)->ab only touches adjacencies
      involving a or b, so a later candidate sharing no symbol with any
      earlier selection keeps its exact count — it is still the argmax
      when its sequential turn comes. The first candidate that shares a
      symbol ends the batch (its count would change; the cheap recount
      next round restores exactness).
    - NEW-PAIR BOUND: merging (a,b) creates only pairs (x, ab) and
      (ab, y), with cnt(x,ab) <= cnt(x,a) and cnt(ab,y) <= cnt(b,y) —
      both visible in the CURRENT count table. B = the running max of
      max_ending[a] / max_starting[b] over selections so far bounds
      every pair any selected merge can create; a candidate with
      cnt <= B could be outranked by such a new pair (or tie and lose
      the lexicographic break to an unknown name), so it ends the
      batch. Existing non-selected pairs only ever DECREASE (they rank
      below the whole prefix by construction), so nothing else can
      overtake.

    On natural text the top pairs share symbols heavily, so batches
    are small (often 1-4) — exact BPE is inherently near-sequential —
    but every merge saved is one fewer distributed recount round.
    """
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    bound: int | None = None
    for a, b, cnt in head:
        if a in used or b in used:
            break
        if bound is not None and cnt <= bound:
            break
        batch.append((a, b, cnt))
        used.update((a, b))
        nb = max(max_ending.get(a, 0), max_starting.get(b, 0))
        bound = nb if bound is None else max(bound, nb)
    return batch


def bpe_train_batched(
    wc: DataFrame,
    n_merges: int,
    head_k: int = 256,
) -> list[tuple[str, str, int]]:
    """TRUE BPE training (Sennrich et al. 2016: recount pair
    frequencies after every merge, take the argmax) at production
    vocab, bit-identical to the one-merge-per-round loop but with
    EXACT batched selection (``select_exact_merge_batch``) so vocab
    growth is NOT one Spark job per merge.

    Input: the vocabulary-sized (word, c) count table — the one
    corpus-scale aggregation happens BEFORE this call; every round
    here runs over the vocab-sized frame only (at 100 TB the vocab is
    ~10M rows: distributed but bounded, the word2vec/kmeans state
    class). Round = one pair-count aggregate + three bounded collects
    (ranked head + the head symbols' max-ending/max-starting bounds)
    + a driver batch selection + a codegen replace-chain application
    (the bpe_symbols_sql marking scheme: segmentation state is the
    marked string, each merge one literal left-to-right replace — no
    Python on executors anywhere in the loop).

    Returns the ranked merge list [(a, b, cnt_at_selection)] —
    len <= n_merges (shorter if the corpus runs out of pairs).

    Round structure (ONE Spark job per round): the ranked head and the
    per-symbol max-ending / max-starting bounds are three aggregates
    over the SAME pair-count subtree, unioned and collected together —
    the subtree's Exchange is physically identical in all three
    branches, so ReuseExchange computes the corpus pass once and the
    three vocab-sized final aggregates share its output (previously:
    three sequential collect jobs against a persisted pc, plus an
    eager checkpoint job = 4 driver round trips per round; the
    driver-side job overhead dominated the whole trainer at small SF
    and serializes the driver at any SF — guide §5). The per-symbol
    bounds are collected for ALL symbols instead of just the head's
    (the symbol table is alphabet+merges-sized, strictly smaller than
    the head of pairs), which is what makes the single-pass union
    possible. The updated segmentation is localCheckpoint(eager=False):
    it materializes inside the NEXT round's job instead of paying its
    own job, still truncating the replace-chain lineage to one round.

    Precondition (delimiter safety, as bpe_symbols_sql): word charset
    must not contain '(' or ')'.
    """
    from pyspark.sql import functions as F

    from bigdatasmallprice_spark.caching import cut_lineage, cut_lineage_lazy

    seg = wc.select(
        "word", "c", F.regexp_replace("word", "(?s)(.)", "($1)").alias("m")
    ).transform(cut_lineage)
    merges: list[tuple[str, str, int]] = []
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
        pc = pairs.groupBy("a", "b").agg(F.sum("c").cast("long").alias("cnt"))
        null_s = F.lit(None).cast("string")
        u = (
            pc.orderBy(F.col("cnt").desc(), "a", "b")
            .limit(head_k)
            .select(F.lit("h").alias("kind"), "a", "b", "cnt")
            .unionByName(
                pc.groupBy("b").agg(F.max("cnt").alias("cnt")).select(
                    F.lit("e").alias("kind"), null_s.alias("a"), "b", "cnt"
                )
            )
            .unionByName(
                pc.groupBy("a").agg(F.max("cnt").alias("cnt")).select(
                    F.lit("s").alias("kind"), "a", null_s.alias("b"), "cnt"
                )
            )
        )
        rows = u.collect()
        # the union does not preserve the head's sort; re-impose the
        # exact argmax order (cnt DESC, a ASC, b ASC) driver-side
        head = sorted(
            ((r.a, r.b, r.cnt) for r in rows if r.kind == "h"),
            key=lambda t: (-t[2], t[0], t[1]),
        )
        if not head:
            break
        max_ending = {r.b: r.cnt for r in rows if r.kind == "e"}
        max_starting = {r.a: r.cnt for r in rows if r.kind == "s"}
        batch = select_exact_merge_batch(head, max_ending, max_starting)
        batch = batch[: n_merges - len(merges)]
        col = F.col("m")
        for a, b, _ in batch:
            col = F.replace(col, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
        seg = seg.withColumn("m", col).transform(cut_lineage_lazy)
        merges.extend(batch)
    return merges


def bpe_train_sequential_py(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Driver-side one-merge-per-round reference trainer (the
    obviously-correct sequential loop the batched trainer must equal
    bit-for-bit) — differential-test oracle, vocab-sized input only."""
    segs: dict[str, list[str]] = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w in segs:
            s = segs[w]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def select_disjoint_merge_batch(
    head: list[tuple[str, str, int]], batch_cap: int
) -> list[tuple[str, str, int]]:
    """PRODUCTION batch selection: up to ``batch_cap`` symbol-disjoint
    pairs from the ranked head, SKIPPING conflicts instead of stopping
    and dropping the exact new-pair bound — the standard scalable-BPE
    approximation (fixed work per round, ~n_merges/batch_cap rounds to
    a 50k vocab). Approximation error: a pair CREATED by an earlier
    in-batch merge cannot be picked until the next round's recount, so
    merge order near rank boundaries may differ from the sequential
    trainer; with batch_cap=1 the selection degenerates to the exact
    sequential argmax (the differential anchor,
    tests/test_bpe_train.py)."""
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for a, b, cnt in head:
        if len(batch) >= batch_cap:
            break
        if a in used or b in used:
            continue
        batch.append((a, b, cnt))
        used.update((a, b))
    return batch


def bpe_train_batched_approx(
    wc: DataFrame,
    n_merges: int,
    batch_cap: int = 64,
    head_k: int | None = None,
) -> list[tuple[str, str, int]]:
    """Production-vocab BPE training: the ``bpe_train_batched`` loop
    with FIXED-SIZE disjoint batches (``select_disjoint_merge_batch``)
    instead of the exact prefix rule — O(n_merges / batch_cap) rounds,
    so a 50k-merge vocabulary is ~800 recount rounds at the default
    cap instead of 50k sequential jobs. The output is always a valid
    creation-ordered merge table (every symbol a char or an earlier
    output), so both apply paths accept it; ``batch_cap=1`` reproduces
    the exact sequential trainer bit-for-bit, and the registered
    ``bpe_train_iterative`` (exact batching) is the anchor the
    approximation is differential-tested against."""
    from pyspark.sql import functions as F

    from bigdatasmallprice_spark.caching import cut_lineage, cut_lineage_lazy

    if head_k is None:
        head_k = max(256, 4 * batch_cap)
    seg = wc.select(
        "word", "c", F.regexp_replace("word", "(?s)(.)", "($1)").alias("m")
    ).transform(cut_lineage)
    merges: list[tuple[str, str, int]] = []
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
        head = [
            (r.a, r.b, r.cnt)
            for r in pairs.groupBy("a", "b")
            .agg(F.sum("c").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(head_k)
            .collect()
        ]
        if not head:
            break
        batch = select_disjoint_merge_batch(head, batch_cap)
        batch = batch[: n_merges - len(merges)]
        col = F.col("m")
        for a, b, _ in batch:
            col = F.replace(col, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
        # lazy checkpoint: materializes inside the next round's head
        # job (one job per round, as bpe_train_batched)
        seg = seg.withColumn("m", col).transform(cut_lineage_lazy)
        merges.extend(batch)
    return merges

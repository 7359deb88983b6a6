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

    At 100 TB this is the packing-stage tokenizer: ~R+1 linear scans
    of each row inside whole-stage codegen, zero shuffle, zero Python
    — vs the Arrow ``bpe_encode_tokens`` path (which also accepts
    ill-formed tables), paying the Python batch transfer.
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
    if dialect == "spark":
        chain = f"regexp_replace({text_sql}, '(.)', '($1)')"
    elif dialect == "duckdb":
        chain = f"regexp_replace({text_sql}, '(.)', '(\\1)', 'g')"
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

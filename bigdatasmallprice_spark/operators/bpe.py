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

"""Text-analysis column primitives for training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring (length /
stopword / type-token ratios), token counting, and document
fingerprinting (bag fingerprint + polynomial rolling hash) — all as
JVM-side column expressions (no Python in the hot path; a 100 TB corpus
pass stays inside whole-stage codegen).

Every primitive here is paired with a DuckDB-equivalent SQL fragment so
the driver's oracle can replay it exactly: integer token arithmetic,
left-fold polynomial hashes mod 1e9+7 (bounded — no overflow in either
engine), md5 bag fingerprints over lexicographically sorted unique
tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small fixed stopword lists; vocabulary-level heuristic, not a model
STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "nicht", "ein", "zu")
STOPWORDS_FR = ("le", "la", "et", "les", "des", "un", "une", "est")

# polynomial-hash modulus: keeps every intermediate < 2^63 in both engines
HASH_MOD = 1_000_000_007


def n_tokens(text: Column) -> Column:
    """Whitespace token count via pure string primitives (identical in
    Spark and DuckDB; regex dialects differ, replace() does not)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1).cast("long")


def o_n_tokens(t: str) -> str:
    return f"CAST(length({t}) - length(replace({t}, ' ', '')) + 1 AS BIGINT)"


def words(text: Column) -> Column:
    return F.split(text, " ")


def n_unique_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(words(text))).cast("long")


def o_n_unique_tokens(t: str) -> str:
    return f"CAST(len(list_distinct(string_split({t}, ' '))) AS BIGINT)"


def stopword_hits(text: Column, stopwords: tuple[str, ...]) -> Column:
    in_list = ", ".join(f"'{w}'" for w in stopwords)
    return F.expr(f"CAST(size(filter(split(text, ' '), w -> w IN ({in_list}))) AS BIGINT)")


def o_stopword_hits(t: str, stopwords: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in stopwords)
    return f"CAST(len(list_filter(string_split({t}, ' '), w -> w IN ({in_list}))) AS BIGINT)"


def heuristic_lang_pred(text: Column) -> Column:
    """The stopword-argmax language-ID heuristic as ONE expression —
    the single Spark-side source of the rule (three query/test sites
    consume it; `queries/textq.py::_O_PRED_LANG` is its oracle twin
    and must track any change here)."""
    en = stopword_hits(text, STOPWORDS_EN)
    de = stopword_hits(text, STOPWORDS_DE)
    fr = stopword_hits(text, STOPWORDS_FR)
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def bag_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 over the lexicographically sorted set of
    tokens — invariant to token order and repetition (document
    fingerprinting for shuffle-light exact-set dedup)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words(text)))))


def o_bag_fingerprint(t: str) -> str:
    return f"md5(array_to_string(list_sort(list_distinct(string_split({t}, ' '))), ' '))"


# weak-but-deterministic word hash expressible identically in both engines
_WORDHASH = "(length({w}) * 97 + ascii(substr({w}, 1, 1)) * 31 + ascii(substr({w}, length({w}), 1)))"


def rolling_hash(text_col_name: str = "text") -> Column:
    """Polynomial rolling hash over the token stream:
    h_i = (h_{i-1} * 31 + wordhash(w_i)) mod 1e9+7, h_0 = 0."""
    wh = _WORDHASH.format(w="w")
    return F.expr(
        f"aggregate(split({text_col_name}, ' '), 0L, (h, w) -> (h * 31 + {wh}) % {HASH_MOD})"
    )


def o_rolling_hash(t: str) -> str:
    wh = _WORDHASH.format(w="x")
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({t}, ' '), x -> CAST({wh} AS BIGINT))), "
        f"(h, x) -> (h * 31 + x) % {HASH_MOD})"
    )


def quality_score(
    n_tok: Column, n_uniq: Column, stop_hits: Column
) -> Column:
    """Composite quality heuristic: length saturation + type-token ratio
    + stopword-penalty. All terms are ratios of exact integers."""
    ttr = n_uniq.cast("double") / n_tok
    stop_ratio = stop_hits.cast("double") / n_tok
    length_term = F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
    return F.lit(0.4) * length_term + F.lit(0.3) * ttr + F.lit(0.3) * (F.lit(1.0) - stop_ratio)


def o_quality_score(n_tok: str, n_uniq: str, stop_hits: str) -> str:
    return (
        f"0.4 * least(CAST({n_tok} AS DOUBLE) / 100.0, 1.0) "
        f"+ 0.3 * (CAST({n_uniq} AS DOUBLE) / {n_tok}) "
        f"+ 0.3 * (1.0 - CAST({stop_hits} AS DOUBLE) / {n_tok})"
    )


def shingle_expr(toks: str, n: int) -> str:
    """Spark-side positional word n-gram strings (one per start
    position, duplicates kept; EMPTY array for docs shorter than n —
    sequence() would descend and element_at would throw otherwise)."""
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) ELSE array() END"
    )


def o_shingle_expr(toks: str, n: int) -> str:
    """DuckDB-side positional word n-grams — same values/order as
    ``shingle_expr`` (range() is empty-safe via greatest)."""
    return (
        f"list_transform(range(0, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string({toks}[i+1:i+{n}], ' '))"
    )


def md5_bucket_expr(col_sql: str, m: int) -> str:
    """Spark-side uniform bucket from the first 8 md5 hex chars of a
    column expression — the engine-paired membership/bucketing hash
    (an (a*x+b) mod p LCG degenerates to a plain stride for small id
    ranges: 48271 %% 10 == 1, so hv %% 10 tracks id %% 10, correlating
    the bucket with every other id-modulus-derived feature)."""
    return f"CAST(conv(substr(md5(CAST({col_sql} AS STRING)), 1, 8), 16, 10) AS BIGINT) % {m}"


def o_md5_bucket_expr(col_sql: str, m: int) -> str:
    """DuckDB twin of ``md5_bucket_expr`` — identical integers."""
    return f"('0x' || substr(md5(CAST({col_sql} AS VARCHAR)), 1, 8))::BIGINT % {m}"


def md5_key60_expr(col_sql: str) -> str:
    """60-bit integer key from the first 15 md5 hex chars of a string
    expression — the engine-portable stand-in for xxhash64 when a
    shuffle/join key must replay in DuckDB (xxhash64 exists only on the
    Spark side). Grouping on this instead of the raw string shrinks the
    shuffle key to 8 bytes regardless of text length; a collision would
    merge two keys identically in BOTH engines, so oracle parity is
    unconditional."""
    return f"CAST(conv(substr(md5({col_sql}), 1, 15), 16, 10) AS BIGINT)"


def o_md5_key60_expr(col_sql: str) -> str:
    """DuckDB twin of ``md5_key60_expr`` — identical integers."""
    return f"('0x' || substr(md5({col_sql}), 1, 15))::BIGINT"

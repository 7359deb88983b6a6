"""Text-analysis queries over ``documents`` (training-data curation
surface: language-ID, quality scoring, token stats, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatasmallprice_spark.caching import cut_lineage

from bigdatasmallprice_spark.functions.texts import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
    bag_fingerprint,
    n_tokens,
    n_unique_tokens,
    o_bag_fingerprint,
    o_n_tokens,
    o_n_unique_tokens,
    o_quality_score,
    o_rolling_hash,
    o_stopword_hits,
    quality_score,
    rolling_hash,
    stopword_hits,
)
from bigdatasmallprice_spark.queries.core import table, table_par
from bigdatasmallprice_spark.registry import register

_NT = o_n_tokens("text")
_NU = o_n_unique_tokens("text")
_SH = o_stopword_hits("text", STOPWORDS_EN)


@register(
    "text_stats",
    f"""
SELECT doc_id,
       {_NT} AS n_tok,
       {_NU} AS n_uniq,
       (CAST(length(text) AS DOUBLE) - ({_NT} - 1)) / {_NT} AS avg_token_len,
       {_SH} AS stop_hits,
       round({o_quality_score(_NT, _NU, _SH)}, 6) AS quality,
       {o_bag_fingerprint('text')} AS bag_fp,
       {o_rolling_hash('text')} AS roll_hash
FROM documents
""",
    doc="Per-document token counting, type-token ratio, stopword ratio, "
    "composite quality score, bag fingerprint (md5 of sorted unique "
    "tokens) and polynomial rolling hash — all JVM column expressions.",
    tags=("text",),
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    nt = n_tokens(t)
    nu = n_unique_tokens(t)
    sh = stopword_hits(t, STOPWORDS_EN)
    return docs.select(
        "doc_id",
        nt.alias("n_tok"),
        nu.alias("n_uniq"),
        ((F.length(t).cast("double") - (nt - 1)) / nt).alias("avg_token_len"),
        sh.alias("stop_hits"),
        F.round(quality_score(nt, nu, sh), 6).alias("quality"),
        bag_fingerprint(t).alias("bag_fp"),
        rolling_hash("text").alias("roll_hash"),
    )


@register(
    "lang_id",
    f"""
WITH s AS (
  SELECT doc_id, lang,
         {o_stopword_hits('text', STOPWORDS_EN)} AS en_hits,
         {o_stopword_hits('text', STOPWORDS_DE)} AS de_hits,
         {o_stopword_hits('text', STOPWORDS_FR)} AS fr_hits
  FROM documents
)
SELECT doc_id, lang, en_hits, de_hits, fr_hits,
       CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
            WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
            WHEN fr_hits > 0 THEN 'fr'
            ELSE 'und' END AS pred_lang
FROM s
""",
    doc="Stopword-list language-ID heuristic (argmax over per-language "
    "hit counts, 'und' when no list hits).",
    tags=("text",),
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    en = stopword_hits(t, STOPWORDS_EN)
    de = stopword_hits(t, STOPWORDS_DE)
    fr = stopword_hits(t, STOPWORDS_FR)
    s = docs.select("doc_id", "lang", en.alias("en_hits"), de.alias("de_hits"), fr.alias("fr_hits"))
    pred = (
        F.when((F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")) & (F.col("en_hits") > 0), F.lit("en"))
        .when((F.col("de_hits") >= F.col("fr_hits")) & (F.col("de_hits") > 0), F.lit("de"))
        .when(F.col("fr_hits") > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return s.select("doc_id", "lang", "en_hits", "de_hits", "fr_hits", pred.alias("pred_lang"))


@register(
    "token_stats_by_source",
    f"""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM({_NT}) AS BIGINT) AS total_tokens,
       CAST(SUM({_NT}) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1, 2
""",
    doc="Corpus token accounting per (lang, source) — the budgeting "
    "rollup of a tokenizer pipeline; integer sums keep it exact.",
    tags=("text", "agg"),
)
def token_stats_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    nt = n_tokens(F.col("text"))
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(nt).alias("total_tokens"),
        (F.sum(nt).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "quality_filter",
    f"""
WITH q AS (
  SELECT lang,
         {o_quality_score(_NT, _NU, _SH)} AS quality,
         {_NT} AS n_tok
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(COALESCE(SUM(CASE WHEN quality >= 0.55 AND n_tok >= 20 THEN 1 END), 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN quality < 0.55 OR n_tok < 20 THEN 1 END), 0) AS BIGINT) AS n_dropped
FROM q GROUP BY 1
""",
    doc="Quality-gate filter summary per language: the keep/drop decision "
    "of a corpus-curation pass (quality >= 0.55 AND n_tok >= 20).",
    tags=("text", "agg"),
)
def quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    nt = n_tokens(t)
    q = quality_score(nt, n_unique_tokens(t), stopword_hits(t, STOPWORDS_EN))
    keep = (F.col("quality") >= 0.55) & (F.col("n_tok") >= 20)
    return docs.select("lang", q.alias("quality"), nt.alias("n_tok")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.when(keep, F.lit(1))), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.sum(F.when(~keep, F.lit(1))), F.lit(0)).cast("long").alias("n_dropped"),
    )


@register(
    "json_props_stats",
    """
WITH x AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       COUNT(DISTINCT k) AS k_distinct,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max
FROM x GROUP BY 1
""",
    doc="Semi-structured extraction: JSON property pulled out of a "
    "string column (get_json_object / json_extract_string) then "
    "aggregated. The pattern for props/metadata blobs in event streams; "
    "extraction is JVM-side, no UDF.",
    tags=("text", "agg", "json"),
)
def json_props_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.queries.core import table as _table

    ev = _table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("k").alias("n_with_k"),
        F.sum("k").cast("long").alias("k_sum"),
        F.countDistinct("k").alias("k_distinct"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
    )


# BPE-ish subword segmentation: letter runs / digit runs / single
# punctuation — the cheap regex proxy for tokenizer cost accounting
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "bpe_token_stats",
    f"""
WITH x AS (
  SELECT lang, len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe,
         {o_n_tokens('text')} AS n_ws
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
       CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
       CAST(MAX(n_bpe) AS BIGINT) AS max_bpe,
       round(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 6) AS bpe_per_word
FROM x GROUP BY 1
""",
    doc="BPE-ish token accounting: regex subword segmentation (letter "
    "runs | digit runs | punct) counted JVM-side via regexp_count, "
    "vs whitespace tokens — the tokens-per-word budgeting ratio of a "
    "tokenizer pipeline.",
    tags=("text", "agg"),
)
def bpe_token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_bpe = F.regexp_count(F.col("text"), F.lit(_BPE_PATTERN))
    n_ws = n_tokens(F.col("text"))
    x = docs.select("lang", n_bpe.alias("n_bpe"), n_ws.alias("n_ws"))
    return x.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").cast("long").alias("bpe_tokens"),
        F.sum("n_ws").cast("long").alias("ws_tokens"),
        F.max("n_bpe").cast("long").alias("max_bpe"),
        F.round(F.sum("n_bpe").cast("double") / F.sum("n_ws"), 6).alias("bpe_per_word"),
    )


@register(
    "tfidf_terms",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
stats AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
  FROM tok WHERE term <> '' GROUP BY 1
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT term,
       CAST(df AS BIGINT) AS df,
       CAST(tf AS BIGINT) AS tf,
       round(ln(CAST(n_docs AS DOUBLE) / df), 6) AS idf,
       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf_mass
FROM stats, n
WHERE df >= 10
""",
    doc="Corpus-level TF-IDF term table: explode tokens, per-term document "
    "frequency (countDistinct doc) + term frequency, idf = ln(N/df), "
    "restricted to df >= 10. One explode + one shuffle on the term; the "
    "vocabulary table this produces is what quality filters and "
    "keyword-weighting stages broadcast back onto the corpus at scale. "
    "idf/tfidf are per-row IEEE ops on integer inputs — identical in "
    "both engines.",
    tags=("text", "agg"),
)
def tfidf_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    stats = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf"),
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log(F.col("n_docs").cast("double") / F.col("df"))
    return (
        stats.crossJoin(F.broadcast(n))
        .filter(F.col("df") >= 10)
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("tf").cast("long").alias("tf"),
            F.round(idf, 6).alias("idf"),
            F.round(F.col("tf") * idf, 6).alias("tfidf_mass"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing: documents -> fixed-token-budget training bins
# ---------------------------------------------------------------------------

_PACK_BUDGET = 4096  # tokens per packed training sequence


def pack_bins_from_counts(t: DataFrame) -> DataFrame:
    """The packing tail over any (doc_id, nt) token-count frame:
    ceil(total/budget) bins, banded size-rank round-robin, per-bin
    accounting — ONE body serving pack_sequences, pack_sequences_bpe
    and the streamed token-count state's serving read
    (streaming/bpe_stream.py::read_packed_bins), so the bin
    arithmetic cannot fork."""
    from bigdatasmallprice_spark.operators.topk import banded_global_rank

    n_bins = t.agg(
        F.ceil(F.sum("nt").cast("double") / F.lit(_PACK_BUDGET)).cast("long").alias(
            "n_bins"
        )
    )
    r = banded_global_rank(t, "nt", "doc_id")
    b = r.crossJoin(F.broadcast(n_bins)).select(
        ((F.col("rn") - 1) % F.col("n_bins")).alias("bin"), "nt"
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("long").alias("token_sum"),
        F.min("nt").cast("long").alias("min_tokens"),
        F.max("nt").cast("long").alias("max_tokens"),
        F.round(F.sum("nt").cast("double") / F.lit(_PACK_BUDGET), 6).alias(
            "utilization"
        ),
    )


@register(
    "pack_sequences",
    f"""
WITH t AS (
  SELECT doc_id, {o_n_tokens('text')} AS nt FROM documents
),
n AS (
  SELECT CAST(CEIL(CAST(SUM(nt) AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS n_bins FROM t
),
r AS (
  SELECT doc_id, nt,
         ROW_NUMBER() OVER (ORDER BY nt DESC, doc_id) AS rn
  FROM t
),
b AS (
  SELECT (r.rn - 1) % n.n_bins AS bin, r.nt FROM r, n
)
SELECT bin,
       COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS token_sum,
       CAST(MIN(nt) AS BIGINT) AS min_tokens,
       CAST(MAX(nt) AS BIGINT) AS max_tokens,
       round(CAST(SUM(nt) AS DOUBLE) / {_PACK_BUDGET}, 6) AS utilization
FROM b GROUP BY 1
""",
    doc="Sequence packing for LLM training: documents striped into "
    "ceil(total_tokens/budget) bins by size-rank round-robin (the "
    "parallel, deterministic approximation of longest-processing-time "
    "bin packing — sequential first-fit does not distribute). Per-bin "
    "doc count, exact token mass, and utilization against the 4096-"
    "token budget. The size-rank is the BANDED two-phase rank "
    "(operators/topk.py::banded_global_rank): bit-identical to the "
    "global (nt DESC, doc_id) window, but the corpus-scale sort is "
    "sharded by token-count band — the only unpartitioned window "
    "runs over the bounded distinct-count table.",
    tags=("text", "pack", "window"),
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", n_tokens(F.col("text")).alias("nt"))
    return pack_bins_from_counts(t)


# The FROZEN tokenizer artifact the BPE packing twin bins with — the
# engine's own trainer's top-20 ranked merges (bpe_train_merges run at
# sf0.001; a production run pins ~50k merges the same way, like GPT-2's
# vocab.bpe). Pinned as literals because a trainer-of-record artifact
# is exactly that: fixed at tokenize time, shipped to every consumer —
# a packing stage that retrained its tokenizer per query would emit
# incompatible token ids across runs.
_PACK_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("r", "t"), ("l", "u"), ("u", "e"), ("a", "r"), ("p", "a"),
    ("a", "l"), ("a", "s"), ("m", "e"), ("t", "o"), ("a", "t"),
    ("r", "o"), ("t", "a"), ("a", "n"), ("c", "a"), ("s", "c"),
]


def _pack_bpe_oracle() -> str:
    from bigdatasmallprice_spark.operators.bpe import (
        bpe_symbols_sql,
        bpe_token_count_from_symbols_sql,
    )

    sym = bpe_symbols_sql("text", _PACK_BPE_MERGES, "duckdb")
    cnt = bpe_token_count_from_symbols_sql("m", "text")
    return f"""
WITH t AS (
  SELECT doc_id, {cnt} AS nt
  FROM (SELECT doc_id, text, {sym} AS m FROM documents)
),
n AS (
  SELECT CAST(CEIL(CAST(SUM(nt) AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS n_bins FROM t
),
r AS (
  SELECT doc_id, nt,
         ROW_NUMBER() OVER (ORDER BY nt DESC, doc_id) AS rn
  FROM t
),
b AS (
  SELECT (r.rn - 1) % n.n_bins AS bin, r.nt FROM r, n
)
SELECT bin,
       COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS token_sum,
       CAST(MIN(nt) AS BIGINT) AS min_tokens,
       CAST(MAX(nt) AS BIGINT) AS max_tokens,
       round(CAST(SUM(nt) AS DOUBLE) / {_PACK_BUDGET}, 6) AS utilization
FROM b GROUP BY 1
"""


@register(
    "pack_sequences_bpe",
    _pack_bpe_oracle(),
    doc="Sequence packing over the ACTUAL tokenizer output (VERDICT "
    "r10 ask #3): per-document BPE token counts from the pinned "
    "merge artifact (_PACK_BPE_MERGES — the engine's own trainer's "
    "ranked merges, frozen like a production vocab.bpe), packed into "
    f"{_PACK_BUDGET}-token bins by the same size-rank round-robin as "
    "pack_sequences — the artifact an LLM trainer consumes bins "
    "tokenizer tokens, not whitespace words. The BPE APPLY is the "
    "codegen scale path (operators/bpe.py::bpe_symbols_sql, any "
    "creation-ordered table — multi-level production tokenizers "
    "included): the GPT-2 priority loop equals one ascending-rank "
    "left-to-right replace() pass per merge, so tokenization is "
    "~21 linear string scans inside whole-stage codegen — zero "
    "Python, zero shuffle (differential-tested char-exact against "
    "bpe_segment/bpe_encode_tokens, runs and rank-interactions "
    "included). Both engines run the IDENTICAL replace chain; only "
    "the char-marking regexp differs per dialect. Ranking uses the "
    "same banded two-phase rank as pack_sequences (no "
    "single-partition corpus sort).",
    tags=("text", "pack", "window", "curation"),
)
def pack_sequences_bpe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.bpe import (
        bpe_symbols_sql,
        bpe_token_count_from_symbols_sql,
    )

    # scan floor (A/B: 1.65s -> 1.18s; r12's driver-verified 3.23x
    # poster child): the ~21-replace codegen chain is pure narrow
    # per-row work straight off the scan
    docs = table_par(spark, sf_dir, "documents")
    sym = bpe_symbols_sql("text", _PACK_BPE_MERGES, "spark")
    cnt = bpe_token_count_from_symbols_sql("m", "text")
    t = (
        docs.select("doc_id", "text")
        .withColumn("m", F.expr(sym))
        .selectExpr("doc_id", f"{cnt} AS nt")
    )
    return pack_bins_from_counts(t)


# ---------------------------------------------------------------------------
# benchmark decontamination: n-gram overlap against a held-out eval set
# ---------------------------------------------------------------------------

_NGRAM_N = 8
_EVAL_MOD = 97  # doc_id % 97 == 0 is the deterministic "benchmark" slice


def _ngram_expr(toks: str, n: int) -> str:
    """Spark-side distinct token n-grams (empty array for short docs)."""
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))) ELSE array() END"
    )


def _o_ngram_expr(toks: str, n: int) -> str:
    """DuckDB-side distinct token n-grams — same values as ``_ngram_expr``."""
    return (
        f"list_distinct(list_transform(range(0, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string({toks}[i+1:i+{n}], ' ')))"
    )


@register(
    "benchmark_decontamination",
    f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, source, unnest({_o_ngram_expr('t', _NGRAM_N)}) AS ng FROM toks
),
eval_grams AS (
  SELECT DISTINCT ng FROM grams WHERE doc_id % {_EVAL_MOD} = 0
),
hits AS (
  SELECT g.doc_id, COUNT(*) AS n_hits
  FROM grams g JOIN eval_grams e USING (ng)
  WHERE g.doc_id % {_EVAL_MOD} != 0
  GROUP BY 1
),
train AS (
  SELECT doc_id, source FROM toks WHERE doc_id % {_EVAL_MOD} != 0
)
SELECT t.source,
       COUNT(*) AS n_train,
       CAST(COALESCE(SUM(CASE WHEN h.n_hits > 0 THEN 1 END), 0) AS BIGINT) AS n_contaminated,
       CAST(COALESCE(SUM(h.n_hits), 0) AS BIGINT) AS n_overlap_ngrams
FROM train t LEFT JOIN hits h USING (doc_id)
GROUP BY 1
""",
    doc="Benchmark decontamination: flag training docs sharing any "
    f"{_NGRAM_N}-token n-gram with the held-out eval slice (doc_id % "
    f"{_EVAL_MOD} == 0) — the GPT-3/Pile decontamination pass. Spark "
    "plan: distinct per-doc n-grams exploded once, eval n-gram set "
    "broadcast (eval corpora are MBs, training corpora are TBs), "
    "inner-join counts joined back to the train spine. At 100 TB the "
    "join key becomes xxhash64(ngram) (8 B vs ~50 B strings); raw "
    "strings keep the oracle engine-portable here.",
    tags=("text", "dedup", "join"),
)
def benchmark_decontamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").withColumn(
        "t", F.split(F.col("text"), " ")
    )
    grams = docs.select(
        "doc_id", "source", F.explode(F.expr(_ngram_expr("t", _NGRAM_N))).alias("ng")
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("ng").distinct()
    hits = (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_grams), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    train = docs.filter(~is_eval).select("doc_id", "source")
    return (
        train.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.coalesce(F.sum(F.when(F.col("n_hits") > 0, F.lit(1))), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            F.coalesce(F.sum("n_hits"), F.lit(0)).cast("long").alias("n_overlap_ngrams"),
        )
    )


# ---------------------------------------------------------------------------
# repetition quality signals (Gopher-style): dup-token + top-bigram share
# ---------------------------------------------------------------------------

_MICRO = 1_000_000  # per-row ratios land in exact integer micro-units


@register(
    "repetition_stats",
    f"""
WITH per_doc AS (
  SELECT source,
         CAST(round({_MICRO} * (1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t))) AS BIGINT) AS dup_u,
         CAST(round({_MICRO} * CAST(list_max(list_transform(list_distinct(bg), b -> len(list_filter(bg, x -> x = b)))) AS DOUBLE) / len(bg)) AS BIGINT) AS top2_u
  FROM (
    SELECT source, t,
           list_transform(range(0, greatest(len(t) - 1, 0)), i -> array_to_string(t[i+1:i+2], ' ')) AS bg
    FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
  ) WHERE len(t) >= 2
)
SELECT source,
       COUNT(*) AS n_docs,
       round(CAST(SUM(dup_u) AS DOUBLE) / (COUNT(*) * {_MICRO}), 6) AS avg_dup_token_frac,
       round(CAST(SUM(top2_u) AS DOUBLE) / (COUNT(*) * {_MICRO}), 6) AS avg_top_bigram_share,
       round(CAST(MAX(top2_u) AS DOUBLE) / {_MICRO}, 6) AS max_top_bigram_share
FROM per_doc GROUP BY 1
""",
    doc="Gopher-style repetition signals per source: duplicate-token "
    "fraction and most-frequent-bigram share (boilerplate / looping-"
    "generation detectors). Per-row ratios are rounded to integer "
    "micro-units BEFORE aggregation, so the cross-engine sums are exact "
    "(multi-row float accumulation is order-dependent; integer sums are "
    "not). All JVM-side array ops; the top-bigram count is a per-row "
    "sort + run-length fold (O(n log n) per doc, no shuffle) — immune "
    "to the long-document quadratic blowup of a distinct-x-filter scan.",
    tags=("text", "agg"),
)
def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").withColumn(
        "t", F.split(F.col("text"), " ")
    )
    d = docs.filter(F.size("t") >= 2).withColumn(
        "bg",
        F.expr("transform(sequence(1, size(t) - 1), i -> concat_ws(' ', slice(t, i, 2)))"),
    )
    dup_u = F.expr(
        f"CAST(round({_MICRO} * (1.0 - CAST(size(array_distinct(t)) AS DOUBLE) / size(t))) AS BIGINT)"
    )
    # top-bigram count per row via sort + run-length fold: O(n log n) per
    # doc and NO shuffle. The naive array_distinct×filter scan is O(n^2)
    # per doc (a 100k-token outlier = 1e10 ops in one task); the explode
    # + groupBy(doc,bigram) alternative is linear but pays a corpus-wide
    # shuffle (measured 2.3x slower at sf0.1). Sorting inside the row
    # keeps the whole query a narrow map ahead of the final source agg.
    _topc = (
        "aggregate(array_sort(bg), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0), "
        "(s, x) -> named_struct("
        "'prev', x, "
        "'run', IF(x <=> s.prev, s.run + 1, 1), "
        "'best', GREATEST(s.best, IF(x <=> s.prev, s.run + 1, 1))), "
        "s -> s.best)"
    )
    per_doc = d.select(
        "source",
        dup_u.alias("dup_u"),
        F.expr(
            f"CAST(round({_MICRO} * CAST({_topc} AS DOUBLE) / size(bg)) AS BIGINT)"
        ).alias("top2_u"),
    )
    n = F.count(F.lit(1))
    return per_doc.groupBy("source").agg(
        n.alias("n_docs"),
        F.round(F.sum("dup_u").cast("double") / (n * _MICRO), 6).alias(
            "avg_dup_token_frac"
        ),
        F.round(F.sum("top2_u").cast("double") / (n * _MICRO), 6).alias(
            "avg_top_bigram_share"
        ),
        F.round(F.max("top2_u").cast("double") / _MICRO, 6).alias(
            "max_top_bigram_share"
        ),
    )


# ---------------------------------------------------------------------------
# n-gram LM scoring: train on the corpus, score every document (CCNet-ish)
# ---------------------------------------------------------------------------


@register(
    "ngram_lm_score",
    f"""
WITH bg AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(t) - 1, 0)),
                               i -> array_to_string(t[i+1:i+2], ' '))) AS b
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
lm AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1),
scored AS (
  SELECT bg.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(lm.c) AS BIGINT) AS freq_sum
  FROM bg JOIN lm USING (b)
  GROUP BY 1
)
SELECT doc_id, n_bigrams, freq_sum,
       round(CAST(freq_sum AS DOUBLE) / n_bigrams, 6) AS avg_bigram_freq
FROM scored
""",
    doc="Statistical-LM data filter, CCNet-shaped: a bigram frequency "
    "table is TRAINED from the corpus itself (explode + groupBy — the "
    "model is a table, not a broadcast: at 100 TB the vocabulary of "
    "bigrams outgrows executor memory, so scoring is a shuffle "
    "equi-join on the bigram, never a map-side lookup), then every "
    "document is scored by its mean bigram corpus-frequency — "
    "low-scoring docs are gibberish/OCR noise, suspiciously high ones "
    "are boilerplate. Counts are exact ints; the single ratio per doc "
    "is engine-deterministic. (Log-prob scoring is deliberately "
    "avoided: libm ln() differs across engines; frequency order "
    "statistics rank documents identically.)",
    tags=("text", "join", "train"),
)
def ngram_lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").withColumn(
        "t", F.split(F.col("text"), " ")
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
                "i -> concat_ws(' ', slice(t, i, 2))) ELSE array() END"
            )
        ).alias("b"),
    ).persist()
    lm = bg.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    scored = (
        bg.join(lm, "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("c").cast("long").alias("freq_sum"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "freq_sum",
        F.round(F.col("freq_sum").cast("double") / F.col("n_bigrams"), 6).alias(
            "avg_bigram_freq"
        ),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed LM: the CCNet-grade upgrade of ngram_lm_score
# ---------------------------------------------------------------------------


def _kn_oracle() -> str:
    from bigdatasmallprice_spark.operators.knlm import o_kn_chain_sql

    return f"""
WITH {o_kn_chain_sql()}
SELECT doc_id, n_bigrams, p_sum_micro, avg_p_micro, hm_p_micro FROM kn
"""


@register(
    "ngram_lm_kn",
    _kn_oracle(),
    doc="Interpolated Kneser-Ney bigram LM (operators/knlm.py) — the "
    "smoothed upgrade of ngram_lm_score toward CCNet's KenLM "
    "perplexity filter (Wenzek 2020): absolute discounting (D=0.75) "
    "plus the continuation-probability back-off, the whole score an "
    "exact BIGINT micro-unit chain (house rdiv roundings, no libm) "
    "the oracle replays bit-identically. The model is a TABLE "
    "(bigram types outgrow executor memory at 100 TB): training is "
    "two map-side-combined groupBys, scoring is shuffle equi-joins "
    "on the bigram/word keys, and the only broadcast is the 1-row "
    "type count. Pinned invariant (tests/test_knlm.py): clean "
    "documents out-score token-sorted twins by a wider margin than "
    "the raw bigram-frequency scorer gives.",
    tags=("text", "join", "train", "quality"),
)
def ngram_lm_kn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.knlm import (
        doc_bigrams,
        kn_score,
        kn_train,
    )

    # no scan floor: same-session A/B 1.34s unfloored vs 1.65s floored
    # (the bigram fit is aggregate-first enough that the extra exchange
    # loses; the order-3 and modified variants below DO floor)
    docs = table(spark, sf_dir, "documents")
    bg = doc_bigrams(docs).persist()
    return kn_score(bg, kn_train(bg))


def _mkn_oracle() -> str:
    from bigdatasmallprice_spark.operators.knlm import o_mkn_chain_sql

    return f"""
WITH {o_mkn_chain_sql()}
SELECT doc_id, n_bigrams, p_sum_micro, avg_p_micro, hm_p_micro FROM mkn
"""


@register(
    "ngram_lm_mkn",
    _mkn_oracle(),
    doc="MODIFIED Kneser-Ney bigram LM (Chen & Goodman 1998 §3 — what "
    "KenLM actually ships, VERDICT r9 ask #6): three count-bucketed "
    "discounts D1/D2/D3+ instead of ngram_lm_kn's single D=0.75, "
    "each a CLOSED-FORM integer rational of the global "
    "count-of-count statistics (D1 = n1/(n1+2n2) exactly; milli-unit "
    "rdiv chain, clamped to [0, k]), and the per-context back-off "
    "weight lam(w1) = (D1*N1 + D2*N2 + D3*N3+)/c1 over w1's "
    "successor types bucketed by count. The discount table is ONE "
    "broadcast row derived from the same bigram count table as "
    "everything else (the kn3 sufficient-statistic rule), so the "
    "whole fit + score replays as a closed integer oracle chain — "
    "zero libm, zero float thresholds. Same 100 TB shape as "
    "ngram_lm_kn: model-as-table shuffle equi-joins, 1-row broadcast "
    "scalars, one integer aggregate per document.",
    tags=("text", "join", "train", "quality"),
)
def ngram_lm_mkn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.knlm import (
        doc_bigrams,
        mkn_score,
        mkn_train,
    )

    # scan floor (same-session A/B: 2.43s -> 1.75s)
    docs = table_par(spark, sf_dir, "documents")
    bg = doc_bigrams(docs).persist()
    return mkn_score(bg, mkn_train(bg))


def _kn3_oracle() -> str:
    from bigdatasmallprice_spark.operators.knlm import o_kn3_chain_sql

    return f"""
WITH {o_kn3_chain_sql()}
SELECT doc_id, n_trigrams, p_sum_micro, avg_p_micro, hm_p_micro FROM kn3
"""


@register(
    "ngram_lm_kn3",
    _kn3_oracle(),
    doc="Order-3 interpolated Kneser-Ney (operators/knlm.py) — the "
    "recursive back-off CHAIN that makes the smoothing CCNet-grade "
    "(KenLM runs order 5; 3 exhibits the full structure): "
    "P3(w|u,v) discounts the trigram count and interpolates "
    "lam3(u,v)*P2(w|v), where P2 uses CONTINUATION type counts "
    "N1+(.vw)/N1+(.v.) (Chen & Goodman 1998) and falls through to the "
    "type-count unigram P1(w) = N1+(..w)/N1+(...). ALL lower-order "
    "statistics derive from the single trigram count table (one "
    "corpus-scale aggregate; five model-shaped derived tables), "
    "scoring is shuffle equi-joins on the trigram/bigram/word keys, "
    "and unseen histories fall through an order (tested). The whole "
    "chain is the same exact BIGINT micro-unit quantization as "
    "ngram_lm_kn, replayed bit-identically by the oracle; arithmetic "
    "AND harmonic per-doc means.",
    tags=("text", "join", "train", "quality"),
)
def ngram_lm_kn3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.knlm import (
        doc_trigrams,
        kn3_score,
        kn3_train,
    )

    # scan floor (same-session A/B: 4.26s -> 2.96s): the trigram
    # explode + 5-table fit off a one-task scan serializes otherwise
    docs = table_par(spark, sf_dir, "documents")
    tg = doc_trigrams(docs).persist()
    return kn3_score(tg, kn3_train(tg))


def _mkn3_oracle() -> str:
    from bigdatasmallprice_spark.operators.knlm import o_mkn3_chain_sql

    return f"""
WITH {o_mkn3_chain_sql()}
SELECT doc_id, n_trigrams, p_sum_micro, avg_p_micro, hm_p_micro FROM mkn3
"""


@register(
    "ngram_lm_mkn3",
    _mkn3_oracle(),
    doc="Order-3 MODIFIED Kneser-Ney (VERDICT r10 ask #4) — the "
    "KenLM formulation at full structure: Chen & Goodman's "
    "count-bucketed discounts at EVERY order of the back-off chain. "
    "Order 3 discounts raw trigram counts with D3_1/D3_2/D3_3+ from "
    "the trigram count-of-counts; order 2 discounts the CONTINUATION "
    "type counts N1+(.vw) with its own discount row derived from the "
    "count-of-counts OF those type counts (the adjusted-count "
    "estimation of lower orders); per-context back-off weights are "
    "bucketed sums lam_k = (D_1*N_1 + D_2*N_2 + D_3*N_3+)/denom; the "
    "continuation unigram stays the undiscounted base case (matching "
    "ngram_lm_kn3). BOTH discount rows are 1-row broadcasts of "
    "closed-form integer rationals (the bigram mkn's _mkn_disc_exprs "
    "reused verbatim — one source of truth), and every table remains "
    "a pure function of the single trigram count table, so the kn3 "
    "STREAM state serves this smoother too "
    "(kn3_stream.read_mkn3_model) and the whole fit + score replays "
    "as one closed integer oracle chain. Same 100 TB shape as "
    "ngram_lm_kn3: model-as-table shuffle equi-joins, broadcast "
    "scalars, one integer aggregate per document.",
    tags=("text", "join", "train", "quality"),
)
def ngram_lm_mkn3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.knlm import (
        doc_trigrams,
        mkn3_score,
        mkn3_train,
    )

    # scan floor (same-session A/B: 6.10s -> 4.67s)
    docs = table_par(spark, sf_dir, "documents")
    tg = doc_trigrams(docs).persist()
    return mkn3_score(tg, mkn3_train(tg))


def _word2vec_oracle() -> str:
    from bigdatasmallprice_spark.operators.sgns import SGNS_ITERS
    from bigdatasmallprice_spark.operators.word2vec import o_word2vec_chain_sql

    return f"""WITH {o_word2vec_chain_sql()}
SELECT node AS word, dim, u AS u_micro, v AS v_micro
FROM emb{SGNS_ITERS}
"""


@register(
    "word_embedding_train",
    _word2vec_oracle(),
    doc="word2vec on TEXT (operators/word2vec.py): the all-integer "
    "SGNS trainer node_embedding_train verified on the graph walk "
    "corpus, fed the corpus word2vec was born on — symmetric token "
    "co-occurrence windows over documents (Mikolov 2013). The "
    "trajectory (md5-deterministic negatives, md5 init, full-batch "
    "integer GD with the rational sigmoid) is REUSED UNCHANGED: "
    "string word keys ride through every expression and the oracle "
    "composes the token-window prefix onto the same corpus-"
    "independent GD chain (o_sgns_core_sql) the graph oracle uses — "
    "one trajectory, two corpora. Pair harvest is a doc-keyed "
    "position self-join (bounded window, nothing global); the model "
    "state is a (word, dim, u, v) DataFrame, vocabulary-sized tables "
    "broadcast. Output: the final input/output embedding entries per "
    "(word, dim).",
    tags=("text", "train", "join", "curation"),
)
def word_embedding_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.sgns import (
        sgns_fit,
        sgns_init,
        sgns_training_pairs,
    )
    from bigdatasmallprice_spark.operators.word2vec import (
        vocab_nodes,
        word_skipgram_pairs,
    )

    # scan floor (core.table_par, A/B: 5.56s -> 3.84s at sf0.1/32c):
    # the skip-gram harvest is one heavy narrow pass (per-row array
    # HOFs) straight off the scan — a one-row-group scan would run it
    # on one core
    docs = table_par(spark, sf_dir, "documents")
    pairs = word_skipgram_pairs(docs)
    nodes = vocab_nodes(docs).persist()
    n = nodes.count()  # vocabulary scalar (the graph fit's n)
    train = sgns_training_pairs(pairs, nodes, n).transform(cut_lineage)
    emb = sgns_fit(train, sgns_init(nodes))
    return emb.select(
        F.col("node").alias("word"),
        "dim",
        F.col("u").alias("u_micro"),
        F.col("v").alias("v_micro"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training: the pair-frequency merge step as aggregation
# ---------------------------------------------------------------------------

_BPE_TOP_MERGES = 20


@register(
    "bpe_train_merges",
    f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT word, COUNT(*) AS c FROM w WHERE word <> '' GROUP BY 1
),
pairs AS (
  SELECT c, unnest(list_transform(range(1, length(word)),
                                  i -> substr(word, i, 2))) AS pair
  FROM wc WHERE length(word) >= 2
),
pc AS (
  SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM pairs GROUP BY 1
),
ranked AS (
  SELECT pair, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS merge_rank
  FROM pc
)
SELECT merge_rank, pair, cnt FROM ranked WHERE merge_rank <= {_BPE_TOP_MERGES}
""",
    doc="BPE tokenizer training, the core step: corpus word counts -> "
    "adjacent character-pair frequencies weighted by word count -> the "
    f"top-{_BPE_TOP_MERGES} merge candidates with a total (count DESC, "
    "pair ASC) order — the argmax a BPE trainer takes per iteration. "
    "Two shuffles, both map-side combined: word counts (vocab-sized, "
    "not corpus-sized, after the first combine), then pair counts "
    "(alphabet^2-bounded). The final rank window runs over the PAIR "
    "table (bounded by vocabulary, not data); iterating merges is "
    "driver-side like kmeans_fit's Lloyd rounds, each re-expressible "
    "as this same aggregation over the re-segmented corpus.",
    tags=("text", "train", "agg"),
)
def bpe_train_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    w = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.col("word") != ""
    )
    wc = w.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    pairs = wc.filter(F.length("word") >= 2).select(
        "c",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    pc = pairs.groupBy("pair").agg(F.sum("c").cast("long").alias("cnt"))
    rank = F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("pair")))
    return (
        pc.withColumn("merge_rank", rank)
        .filter(F.col("merge_rank") <= _BPE_TOP_MERGES)
        .select("merge_rank", "pair", "cnt")
    )


_BPE_ITER_MERGES = 20


def _o_bpe_sequential_sql(n: int) -> str:
    """The one-merge-per-round sequential BPE trainer, unrolled as a
    closed WITH chain (the o_sgns_chain_sql discipline): round r =
    pair counts over the round-(r-1) marked segmentation -> argmax
    (cnt DESC, a, b) -> one literal replace. The Spark side runs the
    EXACT batched loop (operators/bpe.py::bpe_train_batched), so this
    oracle externally verifies the batching-equivalence proof on real
    corpus data, not just the unit differential."""
    parts = [
        """wc AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1
),
seg0 AS MATERIALIZED (
  SELECT c, regexp_replace(word, '(?s)(.)', '(\\1)', 'g') AS m FROM wc
)"""
    ]
    for r in range(n):
        a = f"(SELECT a FROM pick{r})"
        b = f"(SELECT b FROM pick{r})"
        parts.append(
            f"""pc{r} AS MATERIALIZED (
  SELECT p[1] AS a, p[2] AS b, CAST(SUM(c) AS BIGINT) AS cnt FROM (
    SELECT c, unnest(list_transform(range(1, len(s)),
                                    i -> [s[i], s[i+1]])) AS p
    FROM (SELECT c, string_split(substr(m, 2, length(m) - 2), ')(') AS s
          FROM seg{r})
    WHERE len(s) >= 2
  ) GROUP BY 1, 2
),
pick{r} AS MATERIALIZED (
  SELECT a, b, cnt FROM pc{r} ORDER BY cnt DESC, a, b LIMIT 1
),
seg{r + 1} AS MATERIALIZED (
  SELECT c, replace(m, '(' || {a} || ')(' || {b} || ')',
                    '(' || {a} || {b} || ')') AS m
  FROM seg{r}
)"""
        )
    return ",\n".join(parts)


@register(
    "bpe_train_iterative",
    f"""
WITH {_o_bpe_sequential_sql(_BPE_ITER_MERGES)}
SELECT merge_rank, sym_a, sym_b, cnt FROM (
  {" UNION ALL ".join(
      f"SELECT CAST({r + 1} AS BIGINT) AS merge_rank, a AS sym_a,"
      f" b AS sym_b, cnt FROM pick{r}"
      for r in range(_BPE_ITER_MERGES)
  )}
)
""",
    doc="TRUE iterative BPE training (Sennrich et al. 2016: recount "
    "pair frequencies after EVERY merge, take the (cnt DESC, pair) "
    f"argmax) — the first {_BPE_ITER_MERGES} merges of the corpus "
    "tokenizer. Unlike bpe_train_merges (the single-round candidate "
    "ranking), this replays the real training loop; unlike a naive "
    "port, vocab growth is NOT one Spark job per merge: "
    "operators/bpe.py::bpe_train_batched selects the longest provably-"
    "sequential-equivalent PREFIX of each round's ranked pair list "
    "(symbol-disjoint + the new-pair count bound; see "
    "select_exact_merge_batch's proof) and applies it as a codegen "
    "replace-chain over the MARKED segmentation string — the "
    "bpe_symbols_sql scheme as mutable training state. The one "
    "corpus-scale aggregation is the word count; every round runs on "
    "the vocab-sized frame (the word2vec/kmeans state class at "
    "100 TB), zero executor Python. The oracle unrolls the one-merge-"
    "per-round sequential trainer as a closed WITH chain, so the "
    "driver check externally verifies the batching-equivalence proof "
    "on real data. Scale note: exact batching yields small batches on "
    "natural text (top pairs share symbols) — production 50k-vocab "
    "training runs operators/bpe.py::bpe_train_batched_approx "
    "(fixed-size disjoint batches, ~n/cap recount rounds); this "
    "query's exact loop is the anchor the approximation is "
    "differential-tested against (batch_cap=1 reproduces it "
    "bit-for-bit, tests/test_bpe_train.py).",
    tags=("text", "train", "agg"),
)
def bpe_train_iterative_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.bpe import bpe_train_batched

    docs = table(spark, sf_dir, "documents")
    w = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.col("word") != ""
    )
    wc = w.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("c"))
    merges = bpe_train_batched(wc, _BPE_ITER_MERGES)
    return spark.createDataFrame(
        [(i + 1, a, b, cnt) for i, (a, b, cnt) in enumerate(merges)],
        "merge_rank long, sym_a string, sym_b string, cnt long",
    )


# ---------------------------------------------------------------------------
# sparse text similarity: bag-of-words cosine pairs via an inverted index
# ---------------------------------------------------------------------------

_BOW_MAX_DF = 60  # posting-list cap: terms in more docs than this are pruned
_BOW_MIN_COS = 0.35


@register(
    "bow_cosine_pairs",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
),
keep AS (
  SELECT term FROM tf GROUP BY 1 HAVING COUNT(*) <= {_BOW_MAX_DF}
),
tfk AS (SELECT tf.* FROM tf JOIN keep USING (term)),
norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM tfk GROUP BY 1
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM tfk a JOIN tfk b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, dot,
       round(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2), 6) AS cosine
FROM dots JOIN norms na ON doc_a = na.doc_id JOIN norms nb ON doc_b = nb.doc_id
WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2) >= {_BOW_MIN_COS}
""",
    doc="Sparse TEXT similarity search: bag-of-words cosine over an "
    "inverted index — the term-join dual of the embedding ANN stack. "
    "Tokenize (whitespace, the corpus convention), per-(doc, term) "
    "integer tf, PRUNE terms whose posting list exceeds "
    f"{_BOW_MAX_DF} docs (the classic df-cap that bounds the self-join "
    "to sum(df^2) over kept terms — near-linear in corpus size, never "
    "all-pairs), equi-join posting lists on the term, integer dot "
    "products with map-side partial aggregation, then cosine = "
    "dot / sqrt(n2a * n2b) as a final per-row IEEE op. Everything "
    "before the last division is exact integer arithmetic, so the "
    "DuckDB oracle matches bit-for-bit. The posting-list frame is "
    "persisted: it feeds the norm branch and both join sides.",
    tags=("text", "similarity", "join"),
)
def bow_cosine_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    keep = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _BOW_MAX_DF
    )
    # persist: tfk feeds the norms branch AND both sides of the term join
    tfk = tf.join(keep.select("term"), "term").persist()
    norms = tfk.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).cast("long").alias("n2"))
    a, b = tfk.alias("a"), tfk.alias("b")
    dots = (
        a.join(b, "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2b"))
    cosine = F.col("dot").cast("double") / F.sqrt(
        F.col("n2a").cast("double") * F.col("n2b")
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(cosine >= _BOW_MIN_COS)
        .select("doc_a", "doc_b", "dot", F.round(cosine, 6).alias("cosine"))
    )


@register(
    "doc_length_histogram",
    """
SELECT source,
       CAST(length(bin(n_chars)) - 1 AS BIGINT) AS log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS token_mass
FROM documents
WHERE n_chars >= 1
GROUP BY 1, 2
""",
    doc="Per-source document-length histogram in power-of-two buckets — "
    "the length-distribution audit behind truncation/packing budgets "
    "and Gopher-style length filters. The bucket is floor(log2(n)) "
    "computed EXACTLY as binary-digit count (length of the base-2 "
    "string minus one) — float log2 at bucket boundaries is a "
    "ULP-dependent engine coin flip, integer digit count is not. One "
    "shuffle on (source, bucket), all-integer aggregates.",
    tags=("text", "agg", "stats"),
)
def doc_length_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = (F.length(F.conv(F.col("n_chars"), 10, 2)) - 1).cast("long")
    ntok = n_tokens(F.col("text"))
    return (
        docs.filter(F.col("n_chars") >= 1)
        .groupBy("source", bucket.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.sum(ntok).cast("long").alias("token_mass"),
        )
    )


# ---------------------------------------------------------------------------
# classifier evaluation: confusion matrix + per-class P/R/F1 for lang-id
# ---------------------------------------------------------------------------

_O_PRED_LANG = f"""
CASE WHEN {o_stopword_hits('text', STOPWORDS_EN)} >= {o_stopword_hits('text', STOPWORDS_DE)}
          AND {o_stopword_hits('text', STOPWORDS_EN)} >= {o_stopword_hits('text', STOPWORDS_FR)}
          AND {o_stopword_hits('text', STOPWORDS_EN)} > 0 THEN 'en'
     WHEN {o_stopword_hits('text', STOPWORDS_DE)} >= {o_stopword_hits('text', STOPWORDS_FR)}
          AND {o_stopword_hits('text', STOPWORDS_DE)} > 0 THEN 'de'
     WHEN {o_stopword_hits('text', STOPWORDS_FR)} > 0 THEN 'fr'
     ELSE 'und' END
"""


@register(
    "langid_eval",
    f"""
WITH p AS (SELECT lang AS true_lang, {_O_PRED_LANG} AS pred_lang FROM documents),
cm AS (SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
       FROM p GROUP BY 1, 2),
tp AS (SELECT true_lang AS cls, n AS tp FROM cm WHERE true_lang = pred_lang),
byt AS (SELECT true_lang AS cls, CAST(SUM(n) AS BIGINT) AS n_true FROM cm GROUP BY 1),
byp AS (SELECT pred_lang AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM cm GROUP BY 1)
SELECT byt.cls,
       byt.n_true,
       CAST(COALESCE(byp.n_pred, 0) AS BIGINT) AS n_pred,
       CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
       round(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CASE WHEN COALESCE(byp.n_pred, 0) = 0 THEN 1 ELSE byp.n_pred END, 6) AS precision,
       round(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / byt.n_true, 6) AS recall
FROM byt LEFT JOIN byp ON byt.cls = byp.cls LEFT JOIN tp ON byt.cls = tp.cls
""",
    doc="Classifier evaluation harness over the lang-id heuristic: "
    "confusion counts reduced to per-class true-positive / support / "
    "predicted-count, then precision and recall (zero-denominator "
    "guarded) — the quality gate any corpus-labeling model (language, "
    "toxicity, quality tiers) passes before its labels drive "
    "filtering. All counts are exact integers; the divisions are one "
    "identical IEEE op per row. At 100 TB the confusion matrix is a "
    "|classes|^2-row aggregate — the eval costs one corpus scan "
    "regardless of model count, and the same harness evaluates any "
    "(true, pred) column pair.",
    tags=("text", "eval", "agg"),
)
def langid_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.functions.texts import heuristic_lang_pred

    docs = table(spark, sf_dir, "documents")
    pred = heuristic_lang_pred(F.col("text"))
    p = docs.select(F.col("lang").alias("true_lang"), pred.alias("pred_lang"))
    cm = p.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tp = cm.filter(F.col("true_lang") == F.col("pred_lang")).select(
        F.col("true_lang").alias("cls"), F.col("n").alias("tp")
    )
    byt = cm.groupBy(F.col("true_lang").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    byp = cm.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    z = F.lit(0).cast("long")
    joined = byt.join(byp, "cls", "left").join(tp, "cls", "left").select(
        "cls",
        "n_true",
        F.coalesce("n_pred", z).alias("n_pred"),
        F.coalesce("tp", z).alias("tp"),
    )
    denom = F.when(F.col("n_pred") == 0, F.lit(1).cast("long")).otherwise(
        F.col("n_pred")
    )
    return joined.select(
        "cls",
        "n_true",
        "n_pred",
        "tp",
        F.round(F.col("tp").cast("double") / denom, 6).alias("precision"),
        F.round(F.col("tp").cast("double") / F.col("n_true"), 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Trained language ID: fastText-style hashed-n-gram linear classifier
# ---------------------------------------------------------------------------


_LANGID_FIT_MEMO: dict[tuple, dict[str, list[int]]] = {}


def _documents_fingerprint(sf_dir: str) -> tuple:
    """(path, mtime_ns, size) tuples for the documents parquet data —
    the memo key's staleness guard: regenerating the data under an
    unchanged sf_dir path invalidates the cached fit (r9 ADVICE)."""
    import os

    root = os.path.join(sf_dir, "documents.parquet")
    paths = [root]
    if os.path.isdir(root):
        paths = sorted(
            os.path.join(d, f)
            for d, _, fs in os.walk(root)
            for f in fs
            if not f.startswith((".", "_"))
        )
    out = []
    for p in paths:
        st = os.stat(p)
        out.append((p, st.st_mtime_ns, st.st_size))
    return tuple(out)


def _langid_fit_for(spark: SparkSession, sf_dir: str) -> dict[str, list[int]]:
    """Fit — or reuse this session's fit of — the langid model on the
    doc_id%5<>0 train slice. The fit is deterministic (all-integer
    trajectory), so memoizing per (sf_dir, data fingerprint) changes no
    value anywhere — the mtime/size fingerprint invalidates the memo if
    the parquet under the path is regenerated mid-session; it
    only stops langid_trained_eval from replaying langid_train's full
    GD chain inside the same session (the r8 VERDICT note — the
    deployment-grade sharing lives in modelstore.score_langid_latest;
    this is the cheap in-session half). The DuckDB oracle still
    replays the complete chain independently."""
    from bigdatasmallprice_spark.operators.langid import (
        doc_feature_arrays,
        lang_features,
        langid_fit,
    )

    key = (sf_dir, _documents_fingerprint(sf_dir))
    if key in _LANGID_FIT_MEMO:
        return _LANGID_FIT_MEMO[key]
    tr = table(spark, sf_dir, "documents").filter("doc_id % 5 <> 0")
    arrays = doc_feature_arrays(lang_features(tr)).persist()
    try:
        classes = sorted(
            r.lang for r in arrays.select("lang").distinct().collect()
        )
        w = langid_fit(arrays, classes, arrays.count())
    finally:
        arrays.unpersist()
    _LANGID_FIT_MEMO[key] = w
    return w



def _langid_train_oracle() -> str:
    from bigdatasmallprice_spark.operators.langid import (
        LID_ITERS,
        o_langid_chain_sql,
    )

    return f"""WITH {o_langid_chain_sql()}
SELECT cls, bucket, w AS w_micro FROM w{LID_ITERS}
"""


@register(
    "langid_train",
    _langid_train_oracle(),
    doc="Trained language ID (fastText-style hashed-n-gram linear "
    "classifier, Joulin et al. 2016) — the trained upgrade of the "
    "lang_id stopword heuristic. One-vs-rest linear scores over hashed "
    "word-unigram milli-fraction features plus a bias bucket; "
    "full-batch GD with the integer rational sigmoid. The model is "
    "genuinely MODEL-sized at any corpus scale (C languages x 65 "
    "buckets), so the weights live driver-side as literals (the "
    "distill pattern): each iteration is one codegen projection over "
    "the persisted per-doc feature arrays (inline score folds, no "
    "join), one explode into (class, bucket) gradient rows, ONE "
    "aggregate, one 325-row collect. The trajectory is all-BIGINT with "
    "explicitly-rounded divisions, and the update replays in Python "
    "and DuckDB with the identical rounding — the oracle's unrolled "
    "CTE chain reproduces every weight bit-identically. Fits only the "
    "doc_id%5<>0 slice (held-out discipline; langid_trained_eval "
    "grades the rest). Output: the final (cls, bucket) micro-unit "
    "weights. See operators/langid.py.",
    tags=("text", "ml", "curation"),
)
def langid_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.langid import langid_weights_df

    w = _langid_fit_for(spark, sf_dir)
    return langid_weights_df(spark, w).select(
        "cls", "bucket", F.col("w").alias("w_micro")
    )


def _langid_eval_oracle() -> str:
    from bigdatasmallprice_spark.operators.langid import (
        LID_ITERS,
        o_langid_chain_sql,
        o_langid_score_sql,
    )

    return f"""WITH {o_langid_chain_sql()},
{o_langid_score_sql(f"w{LID_ITERS}", "doc_id % 5 = 0")},
hp AS (
  SELECT lang, {_O_PRED_LANG} AS pred_lang
  FROM documents WHERE doc_id % 5 = 0
),
p AS (
  SELECT 'trained' AS model, lang AS true_lang, pred_lang FROM pred
  UNION ALL
  SELECT 'heuristic' AS model, lang AS true_lang, pred_lang FROM hp
),
cm AS (SELECT model, true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
       FROM p GROUP BY 1, 2, 3),
tp AS (SELECT model, true_lang AS cls, n AS tp FROM cm
       WHERE true_lang = pred_lang),
byt AS (SELECT model, true_lang AS cls, CAST(SUM(n) AS BIGINT) AS n_true
        FROM cm GROUP BY 1, 2),
byp AS (SELECT model, pred_lang AS cls, CAST(SUM(n) AS BIGINT) AS n_pred
        FROM cm GROUP BY 1, 2),
tot AS (SELECT model,
               CAST(SUM(COALESCE(tp.tp, 0)) AS BIGINT) AS tp_all,
               CAST(SUM(byt.n_true) AS BIGINT) AS n_all
        FROM byt LEFT JOIN tp USING (model, cls) GROUP BY 1)
SELECT byt.model, byt.cls, byt.n_true,
       CAST(COALESCE(byp.n_pred, 0) AS BIGINT) AS n_pred,
       CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
       round(CAST(COALESCE(tp.tp, 0) AS DOUBLE) /
             CASE WHEN COALESCE(byp.n_pred, 0) = 0 THEN 1
                  ELSE byp.n_pred END, 6) AS precision,
       round(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / byt.n_true, 6) AS recall,
       round(CAST(tot.tp_all AS DOUBLE) / tot.n_all, 6) AS model_accuracy
FROM byt
LEFT JOIN byp ON byp.model = byt.model AND byp.cls = byt.cls
LEFT JOIN tp ON tp.model = byt.model AND tp.cls = byt.cls
JOIN tot ON tot.model = byt.model
"""


@register(
    "langid_trained_eval",
    _langid_eval_oracle(),
    doc="Grade the trained language-ID model against the stopword "
    "heuristic on the HELD-OUT doc_id%5=0 slice the fit never saw: "
    "re-run the bit-exact training chain, score the eval slice with "
    "the final weights (one codegen projection, argmax with "
    "smallest-class tie-break), and emit the langid_eval confusion "
    "harness per (model, class) plus each model's overall accuracy. "
    "The trained model learns the class priors the heuristic cannot "
    "represent (it wastes every no-stopword-hit document on 'und'), "
    "so trained accuracy > heuristic accuracy — the measured win is "
    "pinned in tests/test_langid.py.",
    tags=("text", "ml", "eval", "curation"),
)
def langid_trained_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.langid import (
        doc_feature_arrays,
        lang_features,
        langid_score,
    )

    docs = table(spark, sf_dir, "documents")
    ev = docs.filter("doc_id % 5 = 0")
    w = _langid_fit_for(spark, sf_dir)
    tpred = langid_score(doc_feature_arrays(lang_features(ev)), w)

    from bigdatasmallprice_spark.functions.texts import heuristic_lang_pred

    hpred = heuristic_lang_pred(F.col("text"))
    p = tpred.select(
        F.lit("trained").alias("model"),
        F.col("lang").alias("true_lang"),
        "pred_lang",
    ).unionByName(
        ev.select(
            F.lit("heuristic").alias("model"),
            F.col("lang").alias("true_lang"),
            hpred.alias("pred_lang"),
        )
    )
    cm = p.groupBy("model", "true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tp = cm.filter(F.col("true_lang") == F.col("pred_lang")).select(
        "model", F.col("true_lang").alias("cls"), F.col("n").alias("tp")
    )
    byt = cm.groupBy("model", F.col("true_lang").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    byp = cm.groupBy("model", F.col("pred_lang").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    z = F.lit(0).cast("long")
    tot = (
        byt.join(tp, ["model", "cls"], "left")
        .groupBy("model")
        .agg(
            F.sum(F.coalesce("tp", z)).cast("long").alias("tp_all"),
            F.sum("n_true").cast("long").alias("n_all"),
        )
    )
    joined = (
        byt.join(byp, ["model", "cls"], "left")
        .join(tp, ["model", "cls"], "left")
        .join(tot, "model")
        .select(
            "model", "cls", "n_true",
            F.coalesce("n_pred", z).alias("n_pred"),
            F.coalesce("tp", z).alias("tp"),
            "tp_all", "n_all",
        )
    )
    denom = F.when(F.col("n_pred") == 0, F.lit(1).cast("long")).otherwise(
        F.col("n_pred")
    )
    return joined.select(
        "model", "cls", "n_true", "n_pred", "tp",
        F.round(F.col("tp").cast("double") / denom, 6).alias("precision"),
        F.round(F.col("tp").cast("double") / F.col("n_true"), 6).alias(
            "recall"
        ),
        F.round(
            F.col("tp_all").cast("double") / F.col("n_all"), 6
        ).alias("model_accuracy"),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing: head/middle/tail per source
# ---------------------------------------------------------------------------


@register(
    "perplexity_buckets",
    """
WITH bg AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(t) - 1, 0)),
                               i -> array_to_string(t[i+1:i+2], ' '))) AS b
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
lm AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1),
scored AS (
  SELECT bg.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(lm.c) AS BIGINT) AS freq_sum
  FROM bg JOIN lm USING (b)
  GROUP BY 1
),
t AS (
  SELECT d.source, s.doc_id, s.n_bigrams,
         round(CAST(s.freq_sum AS DOUBLE) / s.n_bigrams, 6) AS score,
         ntile(3) OVER (PARTITION BY d.source
                        ORDER BY round(CAST(s.freq_sum AS DOUBLE) / s.n_bigrams, 6) DESC,
                                 s.doc_id) AS tile
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT source,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS bigram_mass,
       round(MIN(score), 6) AS min_score,
       round(MAX(score), 6) AS max_score
FROM t GROUP BY 1, 2
""",
    doc="CCNet-style LM bucketing: every document is scored by the "
    "corpus bigram LM (ngram_lm_score's model-as-table join), then "
    "split per source into head / middle / tail TERTILES by rank "
    "(ntile over score desc with doc_id tie-break) — the exact "
    "selection CCNet uses to keep 'head' (most fluent) text and drop "
    "or down-weight the tail. Rank-based buckets sidestep cross-"
    "engine float-threshold ambiguity: the ordering key is one "
    "identical rounded double per row, and tile arithmetic is pure "
    "integer. At 100 TB the per-source ntile window runs over "
    "(source-partitioned) score frames; the scale substitute is "
    "approx-quantile cut points per source (operators/topk.py::"
    "approx_quantile_buckets) with a per-row compare, no global sort.",
    tags=("text", "train", "window"),
)
def perplexity_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").withColumn(
        "t", F.split(F.col("text"), " ")
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
                "i -> concat_ws(' ', slice(t, i, 2))) ELSE array() END"
            )
        ).alias("b"),
    ).persist()
    lm = bg.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    scored = (
        bg.join(lm, "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("c").cast("long").alias("freq_sum"),
        )
    )
    t = (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn(
            "score",
            F.round(F.col("freq_sum").cast("double") / F.col("n_bigrams"), 6),
        )
        .withColumn(
            "tile",
            F.ntile(3).over(
                Window.partitionBy("source").orderBy(
                    F.col("score").desc(), F.col("doc_id")
                )
            ),
        )
    )
    bucket = (
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
    )
    return t.groupBy("source", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("bigram_mass"),
        F.round(F.min("score"), 6).alias("min_score"),
        F.round(F.max("score"), 6).alias("max_score"),
    )


def _perplexity_kn_oracle() -> str:
    from bigdatasmallprice_spark.operators.knlm import o_kn_chain_sql

    return f"""
WITH {o_kn_chain_sql()},
t AS (
  SELECT d.source, k.doc_id, k.n_bigrams, k.hm_p_micro,
         ntile(3) OVER (PARTITION BY d.source
                        ORDER BY k.hm_p_micro DESC, k.doc_id) AS tile
  FROM kn k JOIN documents d ON k.doc_id = d.doc_id
)
SELECT source,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS bigram_mass,
       CAST(MIN(hm_p_micro) AS BIGINT) AS min_hm_micro,
       CAST(MAX(hm_p_micro) AS BIGINT) AS max_hm_micro
FROM t GROUP BY 1, 2
"""


@register(
    "perplexity_buckets_kn",
    _perplexity_kn_oracle(),
    doc="CCNet LM bucketing, scored by the CCNet-grade model "
    "(VERDICT r9 'what's wrong' #3): perplexity_buckets' exact "
    "head/middle/tail tertile-rank structure (per-source ntile over "
    "score DESC, doc_id tie-break), but the score is the "
    "interpolated Kneser-Ney harmonic-mean probability "
    "(operators/knlm.py::kn_score's hm_p_micro — absolute "
    "discounting + continuation back-off, the smoothed statistic "
    "Wenzek 2020 actually buckets on) instead of the raw bigram-"
    "frequency mean. The ordering key is a single exact BIGINT per "
    "row — no float threshold anywhere — and the whole fit + score + "
    "rank replays as one closed oracle chain. Same 100 TB shape as "
    "both parents: model-as-table equi-joins for scoring, per-source "
    "ntile windows (approx-quantile cut points are the global-sort "
    "substitute at scale).",
    tags=("text", "train", "quality", "window"),
)
def perplexity_buckets_kn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdatasmallprice_spark.operators.knlm import (
        doc_bigrams,
        kn_score,
        kn_train,
    )

    # no scan floor (r12 regression evidence: floored 4.27s vs 1.1s)
    docs = table(spark, sf_dir, "documents")
    bg = doc_bigrams(docs).persist()
    kn = kn_score(bg, kn_train(bg))
    t = kn.join(docs.select("doc_id", "source"), "doc_id").withColumn(
        "tile",
        F.ntile(3).over(
            Window.partitionBy("source").orderBy(
                F.col("hm_p_micro").desc(), F.col("doc_id")
            )
        ),
    )
    bucket = (
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
    )
    return t.groupBy("source", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("bigram_mass"),
        F.min("hm_p_micro").cast("long").alias("min_hm_micro"),
        F.max("hm_p_micro").cast("long").alias("max_hm_micro"),
    )


# ---------------------------------------------------------------------------
# classifier distillation: train a cheap quality model, filter at scale
# ---------------------------------------------------------------------------


def _distill_train_oracle() -> str:
    from bigdatasmallprice_spark.operators.distill import (
        DISTILL_ITERS,
        o_distill_chain_sql,
    )

    # The weights ARE BIGINT micro-units natively now — the whole
    # trajectory is integer arithmetic (operators/distill.py), so the
    # output needs no re-encoding and no engine float op ever runs.
    micros = ", ".join(f"w{j} AS w{j}_micro" for j in range(5))
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS iter, {micros}, "
        f"loss_micro, n FROM w{t}"
        for t in range(1, DISTILL_ITERS + 1)
    )
    return f"WITH {o_distill_chain_sql()}\n{rows}"


@register(
    "quality_classifier_train",
    _distill_train_oracle(),
    doc="Distill the quality heuristic into a trained linear classifier "
    "(CCNet / FineWeb-Edu pattern: expensive labeler on a slice, cheap "
    "model everywhere): 16 class-weighted GD iterations over the "
    "doc_id%4 training slice. The ENTIRE trajectory is exact BIGINT "
    "fixed-point arithmetic — integer features, integer rational "
    "sigmoid, explicitly-rounded integer divisions, exact-integer "
    "gradient sums (split by class so the class weight multiplies the "
    "sums once), integer weight updates — so NO engine float op is "
    "ever replayed and no DuckDB/Spark build can diverge (FMA, libm, "
    "round-half conventions all have nothing to act on). Output is the "
    "convergence table: per iteration the updated micro-unit weights "
    "and the pre-update class-weighted training loss. Each iteration "
    "is ONE map-side-combined global aggregate over a persisted slim "
    "feature frame — model-sized driver state, T passes, no collect of "
    "data rows, unchanged at 100 TB. The oracle replays the identical "
    "integer CTE chain. See operators/distill.py.",
    tags=("text", "ml", "curation"),
)
def quality_classifier_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.distill import (
        fit_quality_classifier,
        quality_features,
    )

    feats = quality_features(table(spark, sf_dir, "documents")).persist()
    try:
        history = fit_quality_classifier(feats)
    finally:
        feats.unpersist()
    rows = [
        (h["iter"], *h["w"], h["loss_micro"], h["n"]) for h in history
    ]
    return spark.createDataFrame(
        rows,
        "iter long, w0_micro long, w1_micro long, w2_micro long, "
        "w3_micro long, w4_micro long, loss_micro long, n long",
    )


def _distill_filter_oracle() -> str:
    from bigdatasmallprice_spark.operators.distill import (
        DISTILL_ITERS,
        o_distill_chain_sql,
        o_score_keep_expr,
    )

    keep = o_score_keep_expr()
    return f"""WITH {o_distill_chain_sql()},
scored AS (
  SELECT source, ym, {keep} AS keep FROM feat, w{DISTILL_ITERS}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_model_keep,
       CAST(SUM(CASE WHEN ym = 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_heuristic_keep,
       CAST(SUM(CASE WHEN keep = (ym = 1000) THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
FROM scored GROUP BY 1
"""


@register(
    "quality_classifier_filter",
    _distill_filter_oracle(),
    doc="Apply the distilled quality classifier corpus-wide: re-run the "
    "16-iteration class-weighted all-integer fit on the doc_id%4 slice "
    "(same bit-exact trajectory as quality_classifier_train), then "
    "score EVERY document with the final micro-unit weights as one "
    "literal pure-integer codegen expression — the filter-at-scan-speed "
    "half of the distillation pattern. Per source: doc count, model "
    "keeps (p_milli >= 500), teacher-heuristic keeps, and model-teacher "
    "agreement (the distillation fidelity metric, computed on train AND "
    "held-out docs alike). Scoring shuffles nothing but the per-source "
    "aggregate.",
    tags=("text", "ml", "curation"),
)
def quality_classifier_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.distill import (
        fit_quality_classifier,
        quality_features,
        score_keep_expr,
    )

    docs = table(spark, sf_dir, "documents")
    feats = quality_features(docs).persist()
    try:
        history = fit_quality_classifier(feats)
    finally:
        feats.unpersist()
    keep = score_keep_expr(history[-1]["w"])
    scored = quality_features(docs).selectExpr(
        "source", "ym", f"{keep} AS keep"
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_model_keep"),
        F.sum(F.when(F.col("ym") == 1000, 1).otherwise(0))
        .cast("long")
        .alias("n_heuristic_keep"),
        F.sum(
            F.when(F.col("keep") == (F.col("ym") == 1000), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_agree"),
    )


# ---------------------------------------------------------------------------
# Gopher quality-rule attrition report
# ---------------------------------------------------------------------------

# rule bounds, adapted to this corpus's scale (Gopher's own are for
# web documents: 50..100k words etc.); every comparison is integer
_GR_MIN_WORDS = 20
_GR_MAX_WORDS = 200
_GR_MIN_MWL = 3  # mean word length lower bound
_GR_MAX_MWL = 10
_GR_MIN_STOPS = 2  # Gopher's >= 2 stopword-evidence rule
_GR_TTR_NUM = 3  # type-token ratio must be >= 3/10
_GR_TTR_DEN = 10


def _gr_flags_sql(nt: str, nu: str, sh: str, nc: str) -> list[str]:
    """The four rule-failure flags as individual SQL expressions
    (engine-neutral: pure integer comparisons over the house text
    stats). ``nc`` is the non-space character count (word chars)."""
    return [
        f"CAST(CASE WHEN {nt} < {_GR_MIN_WORDS} OR {nt} > {_GR_MAX_WORDS} "
        "THEN 1 ELSE 0 END AS BIGINT) AS f_wc",
        f"CAST(CASE WHEN {nc} < {_GR_MIN_MWL} * {nt} "
        f"OR {nc} > {_GR_MAX_MWL} * {nt} THEN 1 ELSE 0 END AS BIGINT) AS f_mwl",
        f"CAST(CASE WHEN {sh} < {_GR_MIN_STOPS} THEN 1 ELSE 0 END AS BIGINT) AS f_stop",
        f"CAST(CASE WHEN {_GR_TTR_DEN} * {nu} < {_GR_TTR_NUM} * {nt} "
        "THEN 1 ELSE 0 END AS BIGINT) AS f_ttr",
    ]


def _gopher_oracle() -> str:
    nc = "CAST(length(replace(text, ' ', '')) AS BIGINT)"
    flags = ", ".join(_gr_flags_sql(_NT, _NU, _SH, nc))
    return f"""
WITH fl AS (SELECT {flags} FROM documents),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(f_wc) AS BIGINT) AS n_wc,
         CAST(SUM(f_mwl) AS BIGINT) AS n_mwl,
         CAST(SUM(f_stop) AS BIGINT) AS n_stop,
         CAST(SUM(f_ttr) AS BIGINT) AS n_ttr,
         CAST(SUM(CASE WHEN f_wc + f_mwl + f_stop + f_ttr > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
         CAST(SUM(CASE WHEN f_wc + f_mwl + f_stop + f_ttr = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
  FROM fl
)
SELECT 'word_count_bounds' AS rule, n_docs, n_wc AS n_fail FROM agg
UNION ALL SELECT 'mean_word_length', n_docs, n_mwl FROM agg
UNION ALL SELECT 'stopword_evidence', n_docs, n_stop FROM agg
UNION ALL SELECT 'type_token_ratio', n_docs, n_ttr FROM agg
UNION ALL SELECT 'any_rule', n_docs, n_any FROM agg
UNION ALL SELECT 'all_pass', n_docs, n_pass FROM agg
"""


@register(
    "gopher_rules_report",
    _gopher_oracle(),
    doc="Gopher-style quality-rule attrition report (Rae et al. 2021, "
    "the rule family every web-corpus curation run reports before "
    "model-based filtering): word-count bounds, mean-word-length "
    "bounds, the >= 2 stopword-evidence rule, and a type-token-ratio "
    "repetition floor — bounds adapted to this corpus's scale and "
    "every comparison a pure integer inequality over the house text "
    "stats (no floats anywhere). Output: one row per rule with its "
    "exact failure count, plus the any-rule and all-pass funnel rows "
    "(the attrition a curation report quotes). One corpus scan, one "
    "global aggregate with conditional integer sums, six unpivoted "
    "rows — at 100 TB the report costs the scan itself.",
    tags=("text", "curation", "agg"),
)
def gopher_rules_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    nc = "CAST(length(replace(text, ' ', '')) AS BIGINT)"
    flags = _gr_flags_sql(
        # o_n_tokens renders a deliberately dialect-neutral expression
        # (shared verbatim with the oracle's _NT) — usable Spark-side
        # as-is
        o_n_tokens("text"),
        "n_uniq_x",
        "stop_x",
        nc,
    )
    fl = docs.select(
        "text",
        n_unique_tokens(t).alias("n_uniq_x"),
        stopword_hits(t, STOPWORDS_EN).alias("stop_x"),
    ).selectExpr(*flags)
    agg = fl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("f_wc").cast("long").alias("n_wc"),
        F.sum("f_mwl").cast("long").alias("n_mwl"),
        F.sum("f_stop").cast("long").alias("n_stop"),
        F.sum("f_ttr").cast("long").alias("n_ttr"),
        F.sum(
            F.expr(
                "CASE WHEN f_wc + f_mwl + f_stop + f_ttr > 0 THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_any"),
        F.sum(
            F.expr(
                "CASE WHEN f_wc + f_mwl + f_stop + f_ttr = 0 THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_pass"),
    )
    return agg.selectExpr(
        "stack(6, "
        "'word_count_bounds', n_docs, n_wc, "
        "'mean_word_length', n_docs, n_mwl, "
        "'stopword_evidence', n_docs, n_stop, "
        "'type_token_ratio', n_docs, n_ttr, "
        "'any_rule', n_docs, n_any, "
        "'all_pass', n_docs, n_pass"
        ") AS (rule, n_docs, n_fail)"
    )

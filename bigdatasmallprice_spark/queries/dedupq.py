"""Deduplication queries over ``documents`` — exact, MinHash+LSH,
SimHash, and n-gram Jaccard, each oracle-paired."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatasmallprice_spark.functions.texts import (
    HASH_MOD,
    bag_fingerprint,
    o_bag_fingerprint,
    o_shingle_expr,
    shingle_expr,
)
from bigdatasmallprice_spark.operators.dedup import (
    MINHASH_COEFS,
    jaccard,
    lsh_candidate_pairs,
    simhash_near_pairs,
    with_minhash,
    with_shingles,
    with_simhash,
)
from bigdatasmallprice_spark.queries.core import table, table_par
from bigdatasmallprice_spark.registry import register

# DuckDB fragments mirroring operators/dedup.py exactly (1-based lists)
_O_WH = (
    "list_transform(string_split(text, ' '), x -> "
    "CAST(length(x) * 97 + ascii(substr(x, 1, 1)) * 31 + ascii(substr(x, length(x), 1)) AS BIGINT))"
)
_O_SHINGLE_CTES = f"""
w AS (SELECT doc_id, {_O_WH} AS wh FROM documents),
s AS (SELECT doc_id,
             list_transform(range(1, len(wh) - 1),
                            i -> ((wh[i] * 31 + wh[i + 1]) * 31 + wh[i + 2]) % {HASH_MOD}) AS sh
      FROM w)
"""
_O_MH_COLS = ", ".join(
    f"list_min(list_transform(sh, x -> ({a} * x + {b}) % {HASH_MOD})) AS mh{i}"
    for i, (a, b) in enumerate(MINHASH_COEFS)
)
_O_BANDS = "\nUNION ALL ".join(
    f"SELECT doc_id, {b} AS band, mh{2*b} * {HASH_MOD} + mh{2*b+1} AS key FROM sig"
    for b in range(4)
)


@register(
    "dedup_exact",
    f"""
WITH h AS (
  SELECT doc_id, md5(text) AS th, {o_bag_fingerprint('text')} AS bfp FROM documents
)
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT th) AS n_unique_texts,
       COUNT(DISTINCT bfp) AS n_unique_bags,
       CAST(COUNT(*) - COUNT(DISTINCT th) AS BIGINT) AS n_exact_dups,
       CAST(COUNT(*) - COUNT(DISTINCT bfp) AS BIGINT) AS n_bag_dups
FROM h
""",
    doc="Exact dedup by content hash + order/repetition-invariant bag "
    "fingerprint: one hash-groupBy shuffle on a 16-byte key; at 100 TB "
    "this is the cheapest dedup pass and runs first.",
    tags=("dedup", "agg"),
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", F.md5(F.col("text")).alias("th"), bag_fingerprint(F.col("text")).alias("bfp")
    )
    return h.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("th").alias("n_unique_texts"),
        F.countDistinct("bfp").alias("n_unique_bags"),
        (F.count(F.lit(1)) - F.countDistinct("th")).cast("long").alias("n_exact_dups"),
        (F.count(F.lit(1)) - F.countDistinct("bfp")).cast("long").alias("n_bag_dups"),
    )


@register(
    "minhash_signatures",
    f"""
WITH {_O_SHINGLE_CTES}
SELECT doc_id, {_O_MH_COLS} FROM s
""",
    doc="MinHash signatures (k=8) over 3-word-shingle polynomial hashes — "
    "deterministic (a*x+b) mod p permutations, identical literals in both "
    "engines. The signature computation of the MinHash-LSH dedup pipeline.",
    tags=("dedup",),
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # signatures are the only output: skip the array_distinct pass
    # (identical mins either way — see with_minhash)
    sigs = with_minhash(with_shingles(docs.select("doc_id", "text")), distinct=False)
    return sigs.select("doc_id", *[f"mh{i}" for i in range(len(MINHASH_COEFS))])


# candidate-pair frames at or under this row count broadcast for the
# verify joins (~16 B/pair -> ~80 MB, comfortably inside the driver);
# larger sets fall back to AQE's join choice instead of failing
_MH_BROADCAST_MAX_PAIRS = 5_000_000


@register(
    "minhash_lsh_pairs",
    f"""
WITH {_O_SHINGLE_CTES},
sig AS (SELECT doc_id, {_O_MH_COLS} FROM s),
bands AS ({_O_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       round(CASE WHEN len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
                       - len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) > 0
                  THEN CAST(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) AS DOUBLE)
                       / (len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
                          - len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))))
                  ELSE 0.0 END, 6) AS jaccard
FROM cand c
JOIN s sa ON c.id_a = sa.doc_id
JOIN s sb ON c.id_b = sb.doc_id
""",
    doc="MinHash-LSH candidate pairs (4 bands x 2 rows) + exact shingle-"
    "Jaccard verify. Banding replaces the all-pairs comparison with one "
    "explode + equi-join on band keys — the O(n^2)->O(n) scale move.",
    tags=("dedup", "join"),
)
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # persist the DISTINCT shingle sets: they feed the signature branch
    # AND both sides of the verify join (four recomputes of the
    # tokenize+shingle pipeline without the persist), and deduplicating
    # before the cache shrinks the stored arrays while changing nothing
    # downstream — minhash mins and Jaccard are set operations (r2's
    # multiset persist measured 2.0s, this 1.4s at sf0.1)
    s = (
        with_shingles(docs.select("doc_id", "text"))
        .select("doc_id", F.array_distinct("shingles").alias("shingles"))
        .persist()
    )
    sigs = with_minhash(s, distinct=False)  # arrays already deduplicated
    # persist the candidate pairs so the size gate's count and the two
    # verify joins share one materialization of the band join
    cand = lsh_candidate_pairs(sigs).persist()
    sa = s.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = s.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    # broadcast the candidate PAIRS so the fat shingle arrays never
    # shuffle for the verify joins (1.35s -> 1.01s at sf0.1) — but only
    # while the pair set is provably driver-sized: it grows near-
    # linearly with the corpus by the banding design, so an unconditional
    # hint would eventually hit the broadcast limit / driver OOM where a
    # shuffle join (AQE's pick) just gets slower
    if cand.count() > _MH_BROADCAST_MAX_PAIRS:
        cand_j = cand  # AQE decides the strategy at this size
    else:
        cand_j = F.broadcast(cand)
    return (
        cand_j
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
    )


# strong md5-prefix word hash (mirrors operators/dedup.STRONG_WORDHASH:
# first 12 hex digits of md5(word) parsed as a 48-bit int — md5 hex is
# byte-identical across engines; the hex parse is a 12-step fold here
# because DuckDB lacks conv(), which only runs at oracle scale)
_O_STRONG_WH = (
    "list_transform(string_split(text, ' '), w -> "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(substr(md5(w), 1, 12), ''), "
    "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
    "(h, c) -> h * 16 + c))"
)
_O_SIMHASH = " + ".join(
    f"(CASE WHEN CAST(list_sum(list_transform(wh, h -> CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)) AS BIGINT) >= 0 "
    f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
    for j in range(48)
)


@register(
    "simhash_pairs",
    f"""
WITH w AS (SELECT doc_id, {_O_STRONG_WH} AS wh FROM documents),
sh AS (SELECT doc_id, {_O_SIMHASH} AS simhash FROM w),
chunks AS (
  SELECT doc_id, simhash, 0 AS ci, (simhash // 1) % 4096 AS cv FROM sh
  UNION ALL SELECT doc_id, simhash, 1, (simhash // 4096) % 4096 FROM sh
  UNION ALL SELECT doc_id, simhash, 2, (simhash // 16777216) % 4096 FROM sh
  UNION ALL SELECT doc_id, simhash, 3, (simhash // 68719476736) % 4096 FROM sh
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS sh_a, b.simhash AS sh_b
  FROM chunks a JOIN chunks b
    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= 3
""",
    doc="SimHash near-dup pairs: 48-bit token-vote signature over strong "
    "char-polynomial word hashes, 12-bit-chunk blocking (pigeonhole: "
    "Hamming<=3 pairs share one of 4 chunks), Hamming verify via "
    "xor+bit_count. Blocking makes the join an equi-join; 4096 bucket "
    "values per chunk keep candidates near-linear in corpus size.",
    tags=("dedup", "join"),
)
def simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # persist: the self-join in simhash_near_pairs references the signature
    # subtree on both sides — without materializing, Spark recomputes the
    # full tokenize+hash+vote pipeline twice (measured 2x wall at sf0.1)
    sh = with_simhash(docs.select("doc_id", "text")).select("doc_id", "simhash").persist()
    return simhash_near_pairs(sh, max_hamming=3)


def _persisted_sigs(docs: DataFrame) -> DataFrame:
    """Persist the (doc_id + 8 mh) SIGNATURE frame: both sides of the
    LSH band self-join reuse it, and caching 9 longs/doc instead of the
    fat shingle arrays measured 3.0s -> 2.4s at sf0.1 for the queries
    that never re-read shingles (no verify join)."""
    sig_cols = [f"mh{i}" for i in range(len(MINHASH_COEFS))]
    return (
        with_minhash(with_shingles(docs.select("doc_id", "text")), distinct=False)
        .select("doc_id", *sig_cols)
        .persist()
    )


_AUDIT_SLICE_MAX = 64


def _bounded_audit_slice(df: DataFrame, what: str) -> DataFrame:
    """Guard an all-pairs AUDIT query against silent quadratic growth:
    its crossJoin is only acceptable because the input is a tiny fixed
    slice — if someone raises the literal bound past
    ``_AUDIT_SLICE_MAX`` docs this refuses to run rather than become an
    O(n²) corpus job (at scale the verify stage must be fed by LSH
    candidates instead, as minhash_lsh_pairs does)."""
    # limit(max+1) lets the guard scan short-circuit after 65 rows
    # instead of counting the whole slice
    n = df.limit(_AUDIT_SLICE_MAX + 1).count()
    if n > _AUDIT_SLICE_MAX:
        raise ValueError(
            f"{what}: audit slice exceeds {_AUDIT_SLICE_MAX} rows; "
            "all-pairs verification is only for bounded audit sets — "
            "use LSH candidate pairs for corpus-scale inputs"
        )
    return df


@register(
    "ngram_jaccard_pairs",
    f"""
WITH w AS (SELECT doc_id, {_O_WH} AS wh FROM documents WHERE doc_id < 40),
bg AS (SELECT doc_id,
              list_distinct(list_transform(range(1, len(wh)),
                            i -> (wh[i] * 31 + wh[i + 1]) % {HASH_MOD})) AS grams
       FROM w)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CASE WHEN len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) > 0
                  THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                       / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
                  ELSE 0.0 END, 6) AS jaccard
FROM bg a JOIN bg b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.02
""",
    doc="Word-bigram Jaccard similarity on a bounded audit set (all pairs "
    "of the 40 lowest doc_ids, threshold 0.02) — the exact-verify stage "
    "of near-dup pipelines.",
    tags=("dedup", "join"),
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _bounded_audit_slice(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40),
        "ngram_jaccard_pairs",
    )
    wh = (
        "transform(split(text, ' '), x -> "
        "CAST(length(x) * 97 + ascii(substr(x, 1, 1)) * 31 + ascii(substr(x, length(x), 1)) AS BIGINT))"
    )
    grams = (
        f"transform(array(wha), __wh -> CASE WHEN size(__wh) >= 2 THEN "
        f"array_distinct(transform(sequence(0, size(__wh) - 2), "
        f"i -> (element_at(__wh, i + 1) * 31 + element_at(__wh, i + 2)) % {HASH_MOD})) "
        f"ELSE array() END)[0]"
    ).replace("wha", wh)
    bg = docs.select("doc_id", F.expr(grams).alias("grams"))
    a = bg.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = bg.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    union = F.size("ga") + F.size("gb") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(jac >= 0.02)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "neardup_clusters",
    f"""
WITH RECURSIVE {_O_SHINGLE_CTES.strip().rstrip(',')},
sig AS (SELECT doc_id, {_O_MH_COLS} FROM s),
bands AS ({_O_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
e AS (SELECT id_a AS a, id_b AS b FROM cand
      UNION SELECT id_b, id_a FROM cand),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
),
labels AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a
)
SELECT label AS cluster_id,
       COUNT(*) AS n_docs,
       CAST(MIN(node) AS BIGINT) AS keep_doc,
       CAST(SUM(node) AS BIGINT) AS member_sum
FROM labels GROUP BY 1
""",
    doc="Near-dup clustering: MinHash-LSH candidate pairs -> connected "
    "components (distributed min-label propagation, "
    "operators/dedup.py::connected_components) -> one row per cluster "
    "with the kept representative (min doc_id — first-writer-wins, "
    "matching the upsert semantics). Oracle computes the same "
    "components via DuckDB's recursive transitive closure, so the "
    "iterative Spark algorithm is checked against an independent "
    "engine, not itself. This is the 'collapse each duplicate group "
    "to one document' stage of corpus curation.",
    tags=("dedup", "graph", "join"),
)
def neardup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.dedup import connected_components

    docs = table(spark, sf_dir, "documents")
    s = _persisted_sigs(docs)
    cand = lsh_candidate_pairs(s)
    labels = connected_components(cand, "id_a", "id_b")
    s.unpersist()
    return labels.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("node").cast("long").alias("keep_doc"),
        F.sum("node").cast("long").alias("member_sum"),
    )


@register(
    "dedup_canonical",
    f"""
WITH RECURSIVE {_O_SHINGLE_CTES.strip().rstrip(',')},
sig AS (SELECT doc_id, {_O_MH_COLS} FROM s),
bands AS ({_O_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
e AS (SELECT id_a AS a, id_b AS b FROM cand
      UNION SELECT id_b, id_a FROM cand),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
),
labels AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a
),
j AS (
  SELECT l.label, d.doc_id, d.n_chars
  FROM labels l JOIN documents d ON d.doc_id = l.node
),
r AS (
  SELECT label, doc_id, n_chars,
         row_number() OVER (PARTITION BY label
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM j
)
SELECT label AS cluster_id,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc,
       CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS keep_chars,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM r GROUP BY 1
""",
    doc="The complete dedup pipeline's final stage — canonical selection: "
    "LSH pairs -> connected components -> keep the best document per "
    "cluster (longest text, doc_id tie-break; exact-integer ordering, "
    "no float ties) and count what gets dropped. Corpus curation ships "
    "THIS: the survivor list plus an audit of removals. Joining labels "
    "back to documents is a broadcast at any scale (components ≪ "
    "corpus); the row_number window shuffles only clustered docs.",
    tags=("dedup", "graph", "window"),
)
def dedup_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdatasmallprice_spark.operators.dedup import connected_components

    docs = table(spark, sf_dir, "documents")
    s = _persisted_sigs(docs)
    cand = lsh_candidate_pairs(s)
    labels = connected_components(cand, "id_a", "id_b")
    s.unpersist()
    j = labels.join(
        F.broadcast(docs.select("doc_id", "n_chars")),
        labels["node"] == F.col("doc_id"),
    ).select("label", "doc_id", "n_chars")
    w = Window.partitionBy("label").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    r = j.withColumn("rn", F.row_number().over(w))
    return r.groupBy(F.col("label").alias("cluster_id")).agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).cast("long").alias("keep_doc"),
        F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).cast("long").alias("keep_chars"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_dropped"),
    )


def _curation_oracle() -> str:
    from bigdatasmallprice_spark.functions.texts import (
        STOPWORDS_EN,
        o_n_tokens,
        o_n_unique_tokens,
        o_quality_score,
        o_stopword_hits,
    )

    nt = o_n_tokens("text")
    q = o_quality_score(nt, o_n_unique_tokens("text"), o_stopword_hits("text", STOPWORDS_EN))
    return f"""
WITH RECURSIVE {_O_SHINGLE_CTES.strip().rstrip(',')},
sig AS (SELECT doc_id, {_O_MH_COLS} FROM s),
bands AS ({_O_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
e AS (SELECT id_a AS a, id_b AS b FROM cand
      UNION SELECT id_b, id_a FROM cand),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
),
labels AS (SELECT a AS node, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
dup_drop AS (SELECT node AS doc_id FROM labels WHERE node <> label),
g AS (
  SELECT d.source,
         d.doc_id IN (SELECT doc_id FROM dup_drop) AS is_dup,
         ({q}) >= 0.55 AND {nt} >= 20 AS ok_quality,
         {nt} AS n_tok
  FROM documents d
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COALESCE(SUM(CASE WHEN is_dup THEN 1 END), 0) AS BIGINT) AS n_dup_dropped,
       CAST(COALESCE(SUM(CASE WHEN NOT is_dup AND NOT ok_quality THEN 1 END), 0) AS BIGINT) AS n_quality_dropped,
       CAST(COALESCE(SUM(CASE WHEN NOT is_dup AND ok_quality THEN 1 END), 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN NOT is_dup AND ok_quality THEN n_tok END), 0) AS BIGINT) AS tokens_kept
FROM g GROUP BY 1
"""


@register(
    "corpus_curation_summary",
    _curation_oracle(),
    doc="The full curation pass in one result: near-dup removal (LSH "
    "pairs -> connected components -> drop non-canonical members, "
    "keep-lowest-id rule) composed with the quality gate (score >= "
    "0.55, >= 20 tokens), reported per source with surviving token "
    "mass — the number a training-data budget actually consumes. "
    "Stage composition mirrors production order: dedup before quality "
    "so duplicate spam can't vote itself past the gate.",
    tags=("dedup", "text", "graph", "agg"),
)
def corpus_curation_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.functions.texts import (
        STOPWORDS_EN,
        n_tokens,
        n_unique_tokens,
        quality_score,
        stopword_hits,
    )
    from bigdatasmallprice_spark.operators.dedup import connected_components

    docs = table(spark, sf_dir, "documents")
    s = _persisted_sigs(docs)
    labels = connected_components(lsh_candidate_pairs(s), "id_a", "id_b")
    s.unpersist()
    dup_drop = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    t = F.col("text")
    nt = n_tokens(t)
    q = quality_score(nt, n_unique_tokens(t), stopword_hits(t, STOPWORDS_EN))
    g = docs.join(F.broadcast(dup_drop.withColumn("is_dup", F.lit(True))), "doc_id", "left").select(
        "source",
        F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        ((q >= 0.55) & (nt >= 20)).alias("ok_quality"),
        nt.alias("n_tok"),
    )
    keep = ~F.col("is_dup") & F.col("ok_quality")
    return g.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.when(F.col("is_dup"), 1)), F.lit(0)).cast("long").alias("n_dup_dropped"),
        F.coalesce(F.sum(F.when(~F.col("is_dup") & ~F.col("ok_quality"), 1)), F.lit(0))
        .cast("long")
        .alias("n_quality_dropped"),
        F.coalesce(F.sum(F.when(keep, 1)), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.sum(F.when(keep, F.col("n_tok"))), F.lit(0)).cast("long").alias("tokens_kept"),
    )


# ---------------------------------------------------------------------------
# incremental dedup: new batch vs existing corpus (the daily-ingest path)
# ---------------------------------------------------------------------------

# argmax packing bound: jaccard-micro (<= 1e6) * 1e10 + inverted doc_id
# (doc_id < 1e10 documented) -> max() picks highest jaccard, then lowest
# corpus id, engine-independently
_INC_PACK = 10_000_000_000
_INC_INV = _INC_PACK - 1

_O_JAC6 = """round(CASE WHEN len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
                 - len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) > 0
            THEN CAST(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) AS DOUBLE)
                 / (len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
                    - len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))))
            ELSE 0.0 END, 6)"""


@register(
    "dedup_incremental",
    f"""
WITH {_O_SHINGLE_CTES},
sig AS (SELECT doc_id, {_O_MH_COLS} FROM s),
bands AS ({_O_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0
),
ver AS (
  SELECT c.new_id, c.corpus_id,
         CAST(round({_O_JAC6} * 1000000) AS BIGINT) AS jm
  FROM cand c
  JOIN s sa ON c.new_id = sa.doc_id
  JOIN s sb ON c.corpus_id = sb.doc_id
),
best AS (
  SELECT new_id, COUNT(*) AS n_candidates,
         MAX(jm * {_INC_PACK} + ({_INC_INV} - corpus_id)) AS packed
  FROM ver GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(b.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST({_INC_INV} - (b.packed % {_INC_PACK}) AS BIGINT) AS best_match_id,
       CAST(b.packed // {_INC_PACK} AS DOUBLE) / 1000000.0 AS best_jaccard,
       COALESCE(CAST(b.packed // {_INC_PACK} AS DOUBLE) / 1000000.0 >= 0.5, FALSE) AS is_dup
FROM documents d LEFT JOIN best b ON d.doc_id = b.new_id
WHERE d.doc_id % 5 = 0
""",
    doc="Incremental corpus dedup — the daily-ingest pattern at 100 TB: "
    "the corpus keeps a persisted LSH band table (operators/dedup.py::"
    "lsh_bands); each new batch shingles ONLY its own docs, band-joins "
    "against the corpus bands (lsh_candidates_between — cost scales "
    "with the batch, never corpus x batch), exact-verifies candidates "
    "by shingle Jaccard, and reports per new doc: candidate count, "
    "best corpus match (deterministic argmax via composite-integer "
    "packing), and the >=0.5 near-dup verdict. Batch = doc_id%5==0, "
    "corpus = the rest.",
    tags=("dedup", "join", "incremental"),
)
def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.dedup import (
        lsh_bands,
        lsh_candidates_between,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) != 0)

    # batch shingles feed the signature branch AND the verify join —
    # persist the DISTINCT sets (minhash and Jaccard are set ops; same
    # rationale as minhash_lsh_pairs' persist)
    s_b = (
        with_shingles(batch)
        .select("doc_id", F.array_distinct("shingles").alias("shingles"))
        .persist()
    )
    s_c = (
        with_shingles(corpus)
        .select("doc_id", F.array_distinct("shingles").alias("shingles"))
        .persist()
    )
    cand = lsh_candidates_between(
        lsh_bands(with_minhash(s_b, distinct=False)),
        lsh_bands(with_minhash(s_c, distinct=False)),
    )

    sa = s_b.select(F.col("doc_id").alias("new_id"), F.col("shingles").alias("sh_a"))
    sb = s_c.select(
        F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("sh_b")
    )
    jm = F.round(F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6) * 1_000_000).cast(
        "long"
    )
    ver = cand.join(sa, "new_id").join(sb, "corpus_id").select(
        "new_id", "corpus_id", jm.alias("jm")
    )
    best = ver.groupBy("new_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max(
            F.col("jm") * F.lit(_INC_PACK) + (F.lit(_INC_INV) - F.col("corpus_id"))
        ).alias("packed"),
    )
    best_jac = F.expr(f"packed div {_INC_PACK}").cast("double") / 1_000_000.0
    return (
        batch.select("doc_id")
        .join(best, batch["doc_id"] == best["new_id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias(
                "n_candidates"
            ),
            (F.lit(_INC_INV) - F.col("packed") % F.lit(_INC_PACK))
            .cast("long")
            .alias("best_match_id"),
            best_jac.alias("best_jaccard"),
            F.coalesce(best_jac >= 0.5, F.lit(False)).alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter n-gram membership prefilter (incremental dedup fast path)
# ---------------------------------------------------------------------------

_BLOOM_N = 4  # words per textual shingle
_BL_M = 1 << 18
_BL_K = 4
# 4 positions = disjoint 8-hex slices of one md5; identical ints both engines
_O_BPOS = "('0x' || substr(md5({t}), {start}, 8))::BIGINT % {m}"



@register(
    "bloom_shingle_prefilter",
    f"""
WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents WHERE doc_id % 4 = 0),
c AS (SELECT string_split(text, ' ') AS ws FROM documents WHERE doc_id % 4 != 0),
bs AS (SELECT doc_id, source, unnest({o_shingle_expr('ws', _BLOOM_N)}) AS sh,
              unnest(range(1, greatest(len(ws) - {_BLOOM_N - 2}, 1))) AS sidx
       FROM b),
cs AS (SELECT DISTINCT unnest({o_shingle_expr('ws', _BLOOM_N)}) AS sh FROM c),
cset AS (SELECT DISTINCT pos FROM (
  SELECT {_O_BPOS.format(t='sh', start=1, m=_BL_M)} AS pos FROM cs
  UNION ALL SELECT {_O_BPOS.format(t='sh', start=9, m=_BL_M)} FROM cs
  UNION ALL SELECT {_O_BPOS.format(t='sh', start=17, m=_BL_M)} FROM cs
  UNION ALL SELECT {_O_BPOS.format(t='sh', start=25, m=_BL_M)} FROM cs)),
hits AS (
  SELECT bs.doc_id, bs.sidx, bs.source,
         (({_O_BPOS.format(t='bs.sh', start=1, m=_BL_M)}) IN (SELECT pos FROM cset)
          AND ({_O_BPOS.format(t='bs.sh', start=9, m=_BL_M)}) IN (SELECT pos FROM cset)
          AND ({_O_BPOS.format(t='bs.sh', start=17, m=_BL_M)}) IN (SELECT pos FROM cset)
          AND ({_O_BPOS.format(t='bs.sh', start=25, m=_BL_M)}) IN (SELECT pos FROM cset)) AS bloom_hit,
         (bs.sh IN (SELECT sh FROM cs)) AS true_hit
  FROM bs)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(CASE WHEN true_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true_hits,
       CAST(SUM(CASE WHEN bloom_hit AND NOT true_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM hits GROUP BY 1
""",
    doc="Bloom-filter membership prefilter over 4-word shingles: the "
    "existing corpus folds into a 2^18-bit bitmap (4096 longs, 32 KB — "
    "broadcastable no matter the corpus size), and a new batch probes "
    "it per shingle instance. bloom_hit has NO false negatives, so "
    "!bloom_hit shingles skip the expensive exact verify entirely; the "
    "query audits the false-positive tax by also running the exact "
    "set join. At 100 TB this is the cheap first gate of incremental "
    "dedup: the bitmap is corpus-size-independent state (vs "
    "dedup_incremental's band table), membership is a narrow map over "
    "the batch, and m is sized from the stored corpus cardinality. "
    "Cf. Lee et al. 2022 (n-gram dedup) + classic CCNet prefilters.",
    tags=("dedup", "sketch", "incremental"),
)
def bloom_shingle_prefilter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.dedup import (
        bloom_bits,
        bloom_hit_column,
        collect_bloom_bitmap,
    )

    # scan floor (A/B: 2.20s -> 1.68s): shingle explode off the scan
    docs = table_par(spark, sf_dir, "documents")
    sh4 = shingle_expr("ws", _BLOOM_N)
    batch = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "source", F.split("text", " ").alias("ws"))
        .select("doc_id", "source", F.explode(F.expr(sh4)).alias("sh"))
    )
    # corpus shingle set feeds the bitmap build AND the truth join
    corpus_sh = (
        docs.filter(F.col("doc_id") % 4 != 0)
        .select(F.split("text", " ").alias("ws"))
        .select(F.explode(F.expr(sh4)).alias("sh"))
        .distinct()
        .persist()
    )
    # materialize the 32 KB bitmap driver-side (bounded, corpus-size-
    # independent — a model-sized read) and probe it as a pure codegen
    # column: vs the frame-level bloom_membership this removes the
    # probe explode, its broadcast join, the per-key groupBy, and the
    # (doc, sidx) rejoin with the truth frame — batch rows flow
    # straight into the truth join with bloom_hit already attached
    # (10.3s -> 9.8s at sf1, two fewer shuffles; the streaming twin
    # keeps bloom_membership because its bitmap state evolves)
    bitmap = collect_bloom_bitmap(
        bloom_bits(corpus_sh, text_col="sh", m=_BL_M, k=_BL_K), m=_BL_M
    )
    probed = batch.withColumn(
        "bloom_hit", bloom_hit_column(bitmap, "sh", m=_BL_M, k=_BL_K)
    )
    truth = probed.join(
        corpus_sh.withColumn("true_hit", F.lit(True)), "sh", "left"
    ).select(
        "source", "bloom_hit", F.coalesce("true_hit", F.lit(False)).alias("true_hit")
    )
    one = F.lit(1)
    return truth.groupBy("source").agg(
        F.count(one).cast("long").alias("n_shingles"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).cast("long").alias("n_bloom_hits"),
        F.sum(F.when(F.col("true_hit"), 1).otherwise(0)).cast("long").alias("n_true_hits"),
        F.sum(F.when(F.col("bloom_hit") & ~F.col("true_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )


@register(
    "bloom_shingle_prefilter_lean",
    f"""
WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents WHERE doc_id % 4 = 0),
c AS (SELECT string_split(text, ' ') AS ws FROM documents WHERE doc_id % 4 != 0),
bs AS (SELECT doc_id, source, unnest({o_shingle_expr('ws', _BLOOM_N)}) AS sh
       FROM b),
cs AS (SELECT DISTINCT unnest({o_shingle_expr('ws', _BLOOM_N)}) AS sh FROM c),
cset AS (SELECT DISTINCT pos FROM (
  SELECT {_O_BPOS.format(t='sh', start=1, m=_BL_M)} AS pos FROM cs
  UNION ALL SELECT {_O_BPOS.format(t='sh', start=9, m=_BL_M)} FROM cs
  UNION ALL SELECT {_O_BPOS.format(t='sh', start=17, m=_BL_M)} FROM cs
  UNION ALL SELECT {_O_BPOS.format(t='sh', start=25, m=_BL_M)} FROM cs))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN
              ({_O_BPOS.format(t='bs.sh', start=1, m=_BL_M)}) IN (SELECT pos FROM cset)
          AND ({_O_BPOS.format(t='bs.sh', start=9, m=_BL_M)}) IN (SELECT pos FROM cset)
          AND ({_O_BPOS.format(t='bs.sh', start=17, m=_BL_M)}) IN (SELECT pos FROM cset)
          AND ({_O_BPOS.format(t='bs.sh', start=25, m=_BL_M)}) IN (SELECT pos FROM cset)
       THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits
FROM bs GROUP BY 1
""",
    doc="bloom_shingle_prefilter's PRODUCTION path: identical bitmap "
    "build and per-shingle probe, WITHOUT the exact-truth join — that "
    "join exists only to measure the false-positive rate and dominated "
    "the audited query's wall clock (its cost is the thing the bloom "
    "gate exists to avoid). Batch side is bitmap-fold -> constant-"
    "folded literal probe -> per-source aggregate: a pure map over the "
    "batch, zero joins (plan-asserted, tests/test_plans.py), corpus-"
    "size-independent 32 KB state.",
    tags=("dedup", "sketch", "incremental"),
)
def bloom_shingle_prefilter_lean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.dedup import (
        bloom_bits,
        bloom_hit_column,
        collect_bloom_bitmap,
    )

    docs = table(spark, sf_dir, "documents")
    sh4 = shingle_expr("ws", _BLOOM_N)
    batch = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "source", F.split("text", " ").alias("ws"))
        .select("doc_id", "source", F.explode(F.expr(sh4)).alias("sh"))
    )
    # NO distinct before the fold (unlike the audited variant, whose
    # truth join needs the set): bit_or is idempotent, so duplicate
    # shingles merge in the map-side OR partials — ≤ m/64 rows per
    # partition ever shuffle, vs distinct shuffling every corpus
    # shingle. At sf0.1 it's a wash; at corpus scale it's the
    # difference between a text-sized and a 32 KB exchange.
    corpus_sh = (
        docs.filter(F.col("doc_id") % 4 != 0)
        .select(F.split("text", " ").alias("ws"))
        .select(F.explode(F.expr(sh4)).alias("sh"))
    )
    bitmap = collect_bloom_bitmap(
        bloom_bits(corpus_sh, text_col="sh", m=_BL_M, k=_BL_K), m=_BL_M
    )
    probed = batch.withColumn(
        "bloom_hit", bloom_hit_column(bitmap, "sh", m=_BL_M, k=_BL_K)
    )
    return probed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_hits"),
    )


# ---------------------------------------------------------------------------
# cross-document repeated-span mass (Lee et al. 2022 dedup signal)
# ---------------------------------------------------------------------------

_SPAN_N = 8  # words per span


def _o_span_stats_sql(hashed: bool) -> str:
    from bigdatasmallprice_spark.functions.texts import o_md5_key60_expr

    g = f"SELECT doc_id, source, unnest({o_shingle_expr('ws', _SPAN_N)}) AS sp FROM toks"
    if hashed:
        g = f"SELECT doc_id, source, {o_md5_key60_expr('sp')} AS sp FROM ({g}) g0"
    return f"""
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
g AS (
  {g}
),
df_ AS (
  SELECT sp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndocs
  FROM g GROUP BY 1
),
per_doc AS (
  SELECT g.doc_id, g.source,
         CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN df_.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM g JOIN df_ ON g.sp = df_.sp
  GROUP BY 1, 2
),
short_docs AS (
  SELECT doc_id, source, CAST(0 AS BIGINT) AS n_spans, CAST(0 AS BIGINT) AS n_shared
  FROM toks WHERE len(ws) < {_SPAN_N}
),
all_docs AS (SELECT * FROM per_doc UNION ALL SELECT * FROM short_docs)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_spans) AS BIGINT) AS total_spans,
       CAST(SUM(n_shared) AS BIGINT) AS shared_spans,
       CAST(SUM(CASE WHEN n_shared * 5 >= n_spans THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate_docs
FROM all_docs GROUP BY 1
"""


def _span_stats_df(spark: SparkSession, sf_dir: str, hashed: bool) -> DataFrame:
    from pyspark.sql import Window

    from bigdatasmallprice_spark.functions.texts import md5_key60_expr

    docs = table(spark, sf_dir, "documents")
    g = docs.select("doc_id", "source", F.split("text", " ").alias("ws")).select(
        "doc_id", "source",
        F.explode(F.expr(shingle_expr("ws", _SPAN_N))).alias("sp"),
    )
    if hashed:
        # 8-byte shuffle/join key instead of the ~50-byte span string
        g = g.select("doc_id", "source", F.expr(md5_key60_expr("sp")).alias("sp"))
    # (span, doc) occurrence counts FIRST — the map-side partial combine
    # collapses within-doc repeats before anything shuffles, and a
    # count-over-span window on that pair frame replaces the old
    # df_-aggregate + join-back (which shuffled the full exploded frame
    # twice and needed a persist). One linear chain, no cache:
    # explode -> agg(sp,doc) -> window(sp) -> agg(doc). Measured at sf1:
    # 11.9s -> 9.7s raw, 13.2s -> 10.2s hashed.
    pairs = g.groupBy("sp", "doc_id", "source").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("sp")
    marked = pairs.withColumn("ndocs", F.count(F.lit(1)).over(w))
    per_doc = marked.groupBy("doc_id", "source").agg(
        F.sum("cnt").cast("long").alias("n_spans"),
        F.sum(F.when(F.col("ndocs") > 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_shared"),
    )
    # docs shorter than the span width carry no spans but still count
    # in the per-source doc totals (and are never boilerplate)
    short_docs = (
        docs.select("doc_id", "source", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") < _SPAN_N)
        .select(
            "doc_id", "source",
            F.lit(0).cast("long").alias("n_spans"),
            F.lit(0).cast("long").alias("n_shared"),
        )
    )
    all_docs = per_doc.unionByName(short_docs)
    return all_docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_spans").cast("long").alias("total_spans"),
        F.sum("n_shared").cast("long").alias("shared_spans"),
        F.sum(F.when(F.col("n_shared") * 5 >= F.col("n_spans"), 1).otherwise(0))
        .cast("long")
        .alias("n_boilerplate_docs"),
    )


@register(
    "dedup_span_stats",
    _o_span_stats_sql(hashed=False),
    doc="Cross-document repeated-span mass (Lee et al. 2022, 'Deduplicating "
    "Training Data Makes Language Models Better'): every 8-word span's "
    "document frequency, folded back per document into the fraction of "
    "its spans that also occur elsewhere — the boilerplate signal that "
    "motivates span-level (not doc-level) dedup; docs with >=20% shared "
    "spans are flagged; sub-span-width docs carry zero spans but "
    "still count in the per-source totals. Distinct from repetition_stats (WITHIN-doc "
    "repetition) and benchmark_decontamination (overlap vs an eval "
    "slice): this is corpus-internal cross-doc duplication. Plan: one "
    "span explode, a map-side-combined (span, doc) pair aggregate, a "
    "doc-frequency window over the span key, one doc aggregate — a "
    "linear chain, no join-back, no persist. This variant "
    "shuffles RAW span strings (~50 B keys); the scale path is "
    "dedup_span_stats_hashed, which carries an 8-byte key.",
    tags=("dedup", "agg", "join"),
)
def dedup_span_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _span_stats_df(spark, sf_dir, hashed=False)


@register(
    "dedup_span_stats_hashed",
    _o_span_stats_sql(hashed=True),
    doc="dedup_span_stats with the span groupBy/join keyed on a 60-bit "
    "md5-slice integer instead of the raw 8-word string — the 100 TB "
    "variant: the pair aggregate and the span-key window carry 8-byte "
    "keys (pure-Spark deployments would use xxhash64; the md5 slice is "
    "the engine-portable twin so DuckDB replays the identical key, and "
    "any collision merges identically in both engines). Same output "
    "schema and, at these corpus sizes, identical values.",
    tags=("dedup", "agg", "join"),
)
def dedup_span_stats_hashed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _span_stats_df(spark, sf_dir, hashed=True)


# ---------------------------------------------------------------------------
# span-level corpus rewrite (Lee et al. 2022 ExactSubstr, word-span form)
# ---------------------------------------------------------------------------


def _o_rewrite_sql(hashed: bool) -> str:
    from bigdatasmallprice_spark.functions.texts import o_md5_key60_expr

    key = o_md5_key60_expr("sp") if hashed else "sp"
    return f"""
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
occ AS (
  SELECT doc_id, t.i AS pos,
         array_to_string(ws[t.i+1:t.i+{_SPAN_N}], ' ') AS sp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(ws) - {_SPAN_N - 1}, 0))) AS i) t
),
marked AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY {key}) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY doc_id, pos) AS rn
  FROM occ
),
cuts AS (
  SELECT DISTINCT doc_id, pos + t.d AS cut
  FROM marked, LATERAL (SELECT unnest(range(0, {_SPAN_N})) AS d) t
  WHERE cnt > 1 AND rn > 1
),
wpos AS (
  SELECT doc_id, t.i AS pos, ws[t.i+1] AS w
  FROM toks, LATERAL (SELECT unnest(range(0, len(ws))) AS i) t
),
kept AS (
  SELECT wp.doc_id, wp.pos, wp.w
  FROM wpos wp ANTI JOIN cuts c ON wp.doc_id = c.doc_id AND wp.pos = c.cut
),
rebuilt AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS new_text FROM kept GROUP BY 1
),
ncut AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed FROM cuts GROUP BY 1)
SELECT t.doc_id, t.source,
       CAST(len(t.ws) AS BIGINT) AS n_before,
       coalesce(n_removed, CAST(0 AS BIGINT)) AS n_removed,
       md5(coalesce(r.new_text, '')) AS new_md5
FROM toks t
LEFT JOIN ncut USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
"""


def _rewrite_df(spark: SparkSession, sf_dir: str, hashed: bool) -> DataFrame:
    from bigdatasmallprice_spark.operators.dedup import span_dedup_rewrite

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    out = span_dedup_rewrite(docs, n=_SPAN_N, hashed=hashed)
    # per-doc md5 of the rewritten text: the driver's value hash then
    # certifies TEXT equality with the oracle's string_agg rebuild,
    # doc by doc, without shipping corpus-sized strings through the
    # compare (the oracle rebuilds word-by-word via an anti-join —
    # semantically the same corpus, reached by a different plan)
    return out.select(
        "doc_id", "source", "n_before", "n_removed",
        F.md5("new_text").alias("new_md5"),
    )


@register(
    "dedup_rewrite",
    _o_rewrite_sql(hashed=False),
    doc="Span-level corpus REWRITE (Lee et al. 2022 ExactSubstr, word-"
    "span form): every 8-word span occurring more than once in the "
    "corpus keeps its first occurrence in global (doc_id, pos) order; "
    "all later occurrences' positions are cut (overlaps union) and each "
    "document's text is rebuilt from the surviving words. The step "
    "dedup_span_stats only measures — this one edits the corpus. "
    "Output is one row per document: word count, distinct positions "
    "removed, and md5 of the rewritten text (per-doc text equality is "
    "what the oracle hash certifies). Plan: span posexplode -> "
    "duplicate-marking window -> position cuts (duplicate-mass-sized) "
    "-> one doc_id-keyed join back + per-row array filter; document "
    "text shuffles zero times.",
    tags=("dedup", "window", "rewrite"),
)
def dedup_rewrite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rewrite_df(spark, sf_dir, hashed=False)


@register(
    "dedup_rewrite_hashed",
    _o_rewrite_sql(hashed=True),
    doc="dedup_rewrite with the duplicate-marking window keyed on the "
    "60-bit md5-slice BIGINT instead of the raw 8-word span string — "
    "the 100 TB variant (8-byte shuffle keys; pure-Spark deployments "
    "would use xxhash64, the md5 slice is the engine-portable twin and "
    "a collision merges span groups identically in both engines). Same "
    "output schema; identical values at these corpus sizes.",
    tags=("dedup", "window", "rewrite"),
)
def dedup_rewrite_hashed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rewrite_df(spark, sf_dir, hashed=True)


def _winnow_oracle() -> str:
    from bigdatasmallprice_spark.functions.texts import HASH_MOD
    from bigdatasmallprice_spark.operators.dedup import (
        WINNOW_HUB_MAX,
        WINNOW_K,
        WINNOW_W,
    )

    # same 48-bit md5-slice word hash + 31-polynomial k-gram fold as
    # the Spark side (operators/dedup.py::_winnow_gram_poly) — DuckDB
    # parses the hex slice via the '0x' cast
    poly = "ws[i]"
    for j in range(1, WINNOW_K):
        poly = f"(({poly}) * 31 + ws[i + {j}]) % {HASH_MOD}"
    return f"""
WITH w0 AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        w -> ('0x' || substr(md5(w), 1, 12))::BIGINT) AS ws
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= {WINNOW_K} THEN
           list_transform(range(1, len(ws) - {WINNOW_K} + 2), i -> {poly})
         ELSE CAST([] AS BIGINT[]) END AS h
  FROM w0
),
f AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(h) - {WINNOW_W} + 1, 1) + 1),
           i -> list_min(h[i:i+{WINNOW_W - 1}]))) AS fps
  FROM g WHERE len(h) >= 1
),
e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
keep AS (SELECT fp FROM e GROUP BY 1 HAVING COUNT(*) <= {WINNOW_HUB_MAX}),
ee AS (SELECT e.doc_id, e.fp FROM e JOIN keep USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM ee a JOIN ee b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 4
"""


@register(
    "winnow_neardup_pairs",
    _winnow_oracle(),
    doc="Winnowing document fingerprints (Schleimer, Wilkerson & Aiken "
    "2003 — the MOSS algorithm): 4-gram md5-slice hashes, per-window "
    "(w=5) MINIMUM selection, distinct per doc — any two documents "
    "sharing a token run of >= k+w-1 = 8 tokens are GUARANTEED to "
    "share a fingerprint while only ~2/(w+1) of k-grams are kept, the "
    "guarantee/density trade the exhaustive span family doesn't give. "
    "Boilerplate fingerprints (doc frequency > 16) are dropped before "
    "the pair equi-join (the LSH hub-cap pattern keeps candidates "
    "near-linear), pairs keep >= 4 shared fingerprints. Fingerprint "
    "construction is pure codegen over token arrays — no UDF, no "
    "shuffle before the (doc, fp) explode; at 100 TB the exchanges "
    "carry only 8-byte fingerprint keys at ~1/3 the corpus's k-gram "
    "mass.",
    tags=("dedup", "join", "text"),
)
def winnow_neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    # persist the slim (doc_id, fp) frame: the hub-filter aggregate and
    # both sides of the pair join fold it (released by the caller's
    # released_caches discipline)
    fps = winnow_fingerprints(docs).persist()
    return winnow_pairs(fps, min_shared=4)

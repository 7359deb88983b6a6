"""Deduplication operators for large-scale corpus curation.

Four families, all shuffle-conscious:

- **Exact**: md5(text) groupBy — one shuffle on a 16-byte key; keep the
  lowest id per group (first-writer-wins, consistent with the upsert
  semantics in operators/upsert.py).
- **MinHash + LSH**: word-shingle → k minhashes → band buckets →
  candidate pairs by band-equi-join → exact Jaccard verify. The
  band join is THE scale trick: no all-pairs comparison ever happens;
  cost is one explode (docs × bands) + one shuffle on band keys, and
  near-dup candidates cluster into tiny buckets.
- **SimHash**: k-bit signature from per-token hash votes; blocking on
  byte-chunks of the signature (two docs within Hamming distance d must
  share an exact chunk if chunks > d) turns all-pairs into an equi-join.
- **N-gram Jaccard**: exact set similarity on token shingles for a
  bounded candidate set (the verify stage of the LSH pipeline, or
  small-N audits).

All hashes are deterministic arithmetic (polynomial mod 1e9+7) — no
engine-specific hash builtins — so results replay identically in the
DuckDB oracle and across Spark versions/cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatasmallprice_spark.functions.texts import HASH_MOD, _WORDHASH

# fixed (a, b) coefficient pairs for the k minhash permutations
# h_i(x) = (a_i * x + b_i) mod 1e9+7 — generated once from a tiny LCG so
# both engines inline identical literals
def _lcg_pairs(k: int, seed: int = 20260813) -> list[tuple[int, int]]:
    s = seed
    out = []
    for _ in range(k):
        s = (s * 1103515245 + 12345) % (2**31)
        a = s % 999_983 + 1
        s = (s * 1103515245 + 12345) % (2**31)
        b = s % 999_983
        out.append((a, b))
    return out


MINHASH_K = 8
LSH_BANDS = 4  # bands of 2 rows each
MINHASH_COEFS = _lcg_pairs(MINHASH_K)


def with_shingles(df: DataFrame, text_col: str = "text", out: str = "shingles") -> DataFrame:
    """3-word-shingle hash array per document (docs shorter than 3 tokens
    get an empty array).

    The word-hash array binds to a lambda variable (``__wh``) so it is
    computed once per row — inlining it per shingle element would make
    the expression O(tokens^2) per document (a 20x slowdown measured at
    sf0.1)."""
    wh = _WORDHASH.format(w="w")
    # guard: sequence(0, n) with n < 0 DESCENDS in Spark, producing invalid
    # indices for documents shorter than the shingle width
    return df.withColumn(
        out,
        F.expr(
            f"transform(array(transform(split({text_col}, ' '), w -> CAST({wh} AS BIGINT))), "
            f"__wh -> CASE WHEN size(__wh) >= 3 THEN "
            f"transform(sequence(0, size(__wh) - 3), i -> "
            f"((element_at(__wh, i + 1) * 31 + element_at(__wh, i + 2)) * 31 "
            f"+ element_at(__wh, i + 3)) % {HASH_MOD}) "
            f"ELSE array() END)[0]"
        ),
    )


def with_minhash(
    df: DataFrame, shingle_col: str = "shingles", distinct: bool = True
) -> DataFrame:
    """k minhash values h_i = min over shingles of (a_i*x+b_i) mod p.
    NULL when the shingle set is empty.

    All k mins are computed in ONE expression binding the shingle array
    to a lambda variable once (see with_shingles for why), then unpacked
    into mh0..mh{k-1} columns. min over the distinct set equals min over
    the multiset, so ``distinct`` never changes the signature — it only
    trades an array_distinct pass against shorter transform walks. Pass
    ``distinct=False`` when the input arrays are ALREADY deduplicated
    (the LSH pipeline persists distinct sets for its Jaccard verify) or
    when signatures are the only output (the dedup pass costs more than
    the k shorter walks save: 0.53s vs 0.42s at sf0.1); keep the
    default for repetitive multiset inputs that feed several passes."""
    src = f"array_distinct({shingle_col})" if distinct else shingle_col
    mins = ", ".join(
        f"array_min(transform(__sh, x -> ({a} * x + {b}) % {HASH_MOD}))"
        for (a, b) in MINHASH_COEFS
    )
    df = df.withColumn(
        "__mhs",
        F.expr(f"transform(array({src}), __sh -> array({mins}))[0]"),
    )
    for i in range(len(MINHASH_COEFS)):
        df = df.withColumn(f"mh{i}", F.col("__mhs")[i])
    return df.drop("__mhs")


def lsh_bands(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode an 8-slot MinHash signature into its (id, band, key) LSH
    band table — 2 signature rows per band, 4 bands. This is the frame a
    production corpus PERSISTS: incremental dedup of a new batch joins
    the batch's bands against it without touching corpus text again."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (F.col(f"mh{2 * b}") * F.lit(HASH_MOD) + F.col(f"mh{2 * b + 1}")).alias("key"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return (
        sigs.select(F.col(id_col), F.explode(bands).alias("bk"))
        .select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def lsh_candidates_between(
    bands_new: DataFrame,
    bands_corpus: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental LSH candidates: (new_id, corpus_id) pairs sharing at
    least one band key — the daily-ingest dedup join. One equi-join on
    (band, key): cost scales with |batch| + collisions, NEVER with
    |corpus|×|batch|, and the corpus side is a pre-banded table (no
    re-shingling of 100 TB per ingest)."""
    a = bands_new.select(
        F.col(id_col).alias("new_id"), "band", "key"
    )
    b = bands_corpus.select(
        F.col(id_col).alias("corpus_id"), "band", "key"
    )
    return a.join(b, ["band", "key"]).select("new_id", "corpus_id").distinct()


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pairs: docs sharing >= 1 of the LSH bands (2 rows per
    band). Output (id_a, id_b), id_a < id_b, distinct. One explode + one
    self-equi-join on (band, key) — never all-pairs."""
    exploded = lsh_bands(sigs, id_col)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard over distinct shingle sets, via |A∩B| and
    |A|+|B|-|A∩B| (avoids engine-specific union-dedup semantics)."""
    da = F.array_distinct(shingles_a)
    db = F.array_distinct(shingles_b)
    inter = F.size(F.array_intersect(da, db)).cast("double")
    union = F.size(da) + F.size(db) - F.size(F.array_intersect(da, db))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 48
SIMHASH_CHUNKS = 4  # 12-bit chunks; Hamming<=3 pairs must share one (pigeonhole)
CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS
CHUNK_MOD = 1 << CHUNK_BITS

# strong per-word hash: the first 12 hex digits of md5(word) as a 48-bit
# int. md5 is engine-native on BOTH sides (Spark JVM codegen, DuckDB
# builtin) and produces byte-identical hex, so the hash is uniform,
# cross-engine reproducible, and ~2x faster in Spark than the previous
# interpreted per-character polynomial fold. A narrower signature
# (32-bit, 8-bit chunks) floods the chunk buckets: 256 values per chunk
# over n docs gives O(n^2/256) candidate pairs — measured 294k pairs at
# sf0.1; 48 bits with 12-bit chunks keeps candidates near-linear.
STRONG_WORDHASH = "CAST(conv(substr(md5(CAST({w} AS BINARY)), 1, 12), 16, 10) AS BIGINT)"


def with_word_hashes(df: DataFrame, text_col: str = "text", out: str = "whs") -> DataFrame:
    wh = STRONG_WORDHASH.format(w="w")
    return df.withColumn(out, F.expr(f"transform(split({text_col}, ' '), w -> {wh})"))


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    """32-bit SimHash: bit j is the sign of the vote sum over tokens of
    (bit j of strong wordhash -> +1 / -1).

    The token-hash array binds ONCE to a lambda variable, then each bit
    is a scalar integer count-fold (bit set iff tokens voting 1 are >=
    half: 2*cnt >= T <=> sum of +/-1 votes >= 0). Scalar folds beat a
    single-pass array accumulator (zip_with allocates a fresh
    48-element array per token: 1.73s vs 1.32s at sf0.1), and the
    binding stops projection collapse from inlining tokenize+hash into
    every fold."""
    wh = STRONG_WORDHASH.format(w="w")
    whs = f"transform(split({text_col}, ' '), w -> {wh})"
    terms = " + ".join(
        f"(CASE WHEN 2 * aggregate(__whs, 0L, (acc, h) -> acc + (h div {1 << j}) % 2) "
        f">= size(__whs) THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return df.withColumn(out, F.expr(f"transform(array({whs}), __whs -> {terms})[0]"))


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
# the MOSS algorithm). k-gram hashes -> per-window MINIMUM selection:
# any two documents sharing a token run of length >= WINNOW_K +
# WINNOW_W - 1 are GUARANTEED to share at least one fingerprint, while
# the selected set is only ~2/(W+1) of all k-grams — the classic
# guarantee/density trade the full-span family (dedup_span_stats) does
# not give (spans detect exact 8-grams; winnowing detects any long-
# enough overlap from a sparse signature). No reference counterpart;
# the paper is the spec.

WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 5  # window of consecutive k-gram hashes per fingerprint
# guarantee horizon: shared runs >= K + W - 1 = 8 tokens always produce
# a shared fingerprint — deliberately aligned with the span family's
# 8-word span so the two operators certify the same duplication scale
WINNOW_GUARANTEE = WINNOW_K + WINNOW_W - 1
# fingerprints appearing in more than this many documents are dropped
# as boilerplate before the pair join: a corpus-common phrase's
# fingerprint carries no near-dup signal but would turn the equi-join
# quadratic in its document frequency (the LSH hub-cap pattern)
WINNOW_HUB_MAX = 16


def _winnow_gram_poly(whs: str, i: str) -> str:
    """Polynomial k-gram hash over 48-bit STRONG word hashes, mod the
    house HASH_MOD — one md5 per WORD instead of one per k-gram string
    (measured 3.6s -> 1.6s for the sf0.1 fingerprint stage). Every
    intermediate stays < 2^49 (30-bit running hash * 31 + 48-bit word
    hash), so no BIGINT overflow in either engine. 30-bit fingerprints
    make spurious cross-doc fp collisions possible but (a) collisions
    merge identically in BOTH engines — parity is unconditional — and
    (b) false pairs need min_shared independent collisions, so the
    min_shared filter absorbs them; the k+w-1 guarantee is
    width-independent (identical runs hash identically)."""
    from bigdatasmallprice_spark.functions.texts import HASH_MOD

    h = f"element_at({whs}, {i})"
    for j in range(1, WINNOW_K):
        h = f"(({h}) * 31 + element_at({whs}, {i} + {j})) % {HASH_MOD}"
    return h


def winnow_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fp) — the distinct winnowed fingerprint set per document,
    entirely in codegen (no UDF, no shuffle): per-word md5 hashes ->
    polynomial k-gram hashes -> window minima -> distinct. Documents
    shorter than K tokens yield no rows; documents with fewer than W
    k-grams yield their global minimum (the standard short-doc
    extension)."""
    wh = STRONG_WORDHASH.format(w="w")
    whs = f"transform(split({text_col}, ' '), w -> {wh})"
    # the word-hash array binds ONCE to a lambda variable: the gram
    # polynomial references it 4x PER ELEMENT, and projection collapse
    # would otherwise inline the tokenize+md5 array into every
    # element_at — measured 61s instead of 2s at sf0.1 (same trap the
    # simhash fold documents above)
    grams = (
        f"transform(array({whs}), __ws -> "
        f"CASE WHEN size(__ws) >= {WINNOW_K} THEN "
        f"transform(sequence(1, size(__ws) - {WINNOW_K - 1}), "
        f"i -> {_winnow_gram_poly('__ws', 'i')}) ELSE array() END)[0]"
    )
    fps = (
        f"array_distinct(transform("
        f"sequence(1, greatest(size(__wh) - {WINNOW_W} + 1, 1)), "
        f"i -> array_min(slice(__wh, i, {WINNOW_W}))))"
    )
    return (
        df.select(id_col, F.expr(grams).alias("__wh"))
        .filter(F.expr("size(__wh) >= 1"))
        .select(id_col, F.explode(F.expr(fps)).alias("fp"))
    )


def winnow_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 4,
    hub_max: int = WINNOW_HUB_MAX,
) -> DataFrame:
    """Near-dup pairs from a (id, fp) frame: drop boilerplate
    fingerprints (document frequency > ``hub_max``), equi-join on fp,
    count shared fingerprints per pair, keep pairs sharing at least
    ``min_shared``. Output (id_a, id_b, n_shared)."""
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= hub_max)
        .select("fp")
    )
    ee = fps.join(keep, "fp")
    a = ee.select(F.col(id_col).alias("id_a"), "fp")
    b = ee.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", sim_col: str = "simhash", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by Hamming distance with chunk blocking: the
    48-bit signature splits into 4 12-bit chunks; any pair within
    Hamming<=3 shares at least one exact chunk (pigeonhole), so the join
    is an equi-join on (chunk_idx, chunk_value), never all-pairs."""
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                (F.expr(f"{sim_col} div {1 << (CHUNK_BITS * i)}") % CHUNK_MOD).alias("cv"),
            )
            for i in range(SIMHASH_CHUNKS)
        ]
    )
    ex = df.select(id_col, sim_col, F.explode(chunks).alias("c")).select(
        id_col, sim_col, F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{sim_col}").alias("sh_a"),
            F.col(f"b.{sim_col}").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(sh_a ^ sh_b)")
    return cand.withColumn("hamming", hamming.cast("long")).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 60,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Connected components over an undirected pair list → (node, label),
    label = smallest node id in the component.

    Two regimes, picked by measured edge count:

    - **Small graph** (≤ ``driver_threshold`` undirected edges, ~a few
      MB): classic union-find on the driver. The distributed loop's cost
      here is pure scheduling — each propagation round costs ~1s of job
      overhead for milliseconds of data (measured 3.3s for an 835-edge
      graph at sf0.1 vs ~0.1s for union-find). Same small-side logic as
      a broadcast join: below the threshold, shipping beats shuffling.
      The threshold is edges, not corpus rows — a 100 TB corpus whose
      near-dup graph is small still takes this path, correctly.

    - **Large graph**: min-label propagation — each round every node
      takes the minimum label among itself and its neighbours;
      converges in O(graph diameter) rounds. Near-dup graphs are
      cliquey (diameter 2-3), so this beats the large-star/small-star
      dance in practice while staying fully distributed — each round is
      one equi-join + one groupBy, both shuffling on node id, and
      ``localCheckpoint`` truncates the plan so lineage doesn't grow
      exponentially with rounds.

    Shuffle width is scoped per-DataFrame via ``repartition`` on the
    loop frames (never by mutating the session conf, which would leak
    to concurrent queries), and each round runs exactly ONE job: the
    new labels are marked for lazy localCheckpoint and the convergence
    scalar is computed by the same action that materializes them. The
    two paths are equivalence-tested on random graphs
    (tests/test_operators.py).
    """
    spark = pairs.sparkSession
    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.distinct().persist()
    n_edges = und.count()
    if n_edges <= driver_threshold:
        rows = und.collect()
        und.unpersist()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for r in rows:
            a, b = r[0], r[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root: the component root is always its
                # smallest id, which IS the label contract
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        out = [(n, find(n)) for n in parent]
        return spark.createDataFrame(out, "node long, label long")
    # the near-dup graph is orders of magnitude smaller than the corpus
    # that produced it — size the propagation shuffles to the GRAPH
    # (one partition per ~50k edges), not to the corpus-level
    # spark.sql.shuffle.partitions, or every round pays corpus-width
    # task-scheduling overhead for a few thousand rows
    try:
        session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. conf set to 'auto' under some AQE setups
        session_parts = 200
    graph_parts = max(2, min(session_parts, n_edges // 50_000 + 1))
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .repartition(graph_parts, "node")
        .localCheckpoint()
    )
    # labels are monotonically non-increasing and strictly decrease
    # somewhere until the fixpoint, so a scalar sum detects
    # convergence without a per-round diff join
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    for _ in range(max_iter):
        # one pass: each node's new label = min over {own label} ∪
        # {neighbour labels} — union + groupBy(min); the explicit
        # graph-width repartition on the grouping key doubles as the
        # aggregation's distribution, so no extra exchange is added
        nbr = und.join(labels, und["b"] == labels["node"]).select(
            F.col("a").alias("node"), "label"
        )
        merged = (
            nbr.union(labels)
            .repartition(graph_parts, "node")
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: also take the label OF the label (labels are
        # node ids, so it's a self-join). Plain neighbour propagation
        # needs O(diameter) rounds — a path graph of 1e6 nodes would
        # need 1e6 rounds; following label->label halves the remaining
        # distance every round, so convergence is O(log diameter).
        hop = merged.select(
            F.col("node").alias("__ln"), F.col("label").alias("__ll")
        )
        labels = (
            merged.join(hop, merged["label"] == hop["__ln"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("__ll"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        # single action per round: this collect materializes the lazy
        # checkpoint AND returns the convergence scalar (labels are
        # monotone non-increasing; an unchanged sum means a fixpoint,
        # and at the fixpoint every component carries its min id)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    und.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "— raise max_iter (rounds scale with log of component diameter)"
        )
    return labels


# ---------------------------------------------------------------------------
# Bloom-filter membership prefilter (incremental exact-dedup fast path)
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 18  # bits in the filter
BLOOM_K = 4  # hash functions = disjoint 8-hex-digit slices of md5

# position h = (32-bit int from md5 hex slice h) mod m. md5 slices give
# k independent uniform hashes computed by ONE digest per row, and the
# identical positions reproduce in DuckDB via ('0x' || substr)::BIGINT.
_BLOOM_POS = "CAST(conv(substr(md5({t}), {start}, 8), 16, 10) AS BIGINT) % {m}"


def bloom_positions(text_col: str, m: int = BLOOM_M, k: int = BLOOM_K) -> Column:
    """array<long> of the k bloom bit positions for a text column.

    k is capped at 4: md5 hex is 32 chars and each hash consumes a
    disjoint 8-char slice — a 5th slice would be substr past the end,
    conv('') -> NULL positions, and every membership probe would fail
    (universal false negatives). Fail loudly instead."""
    if not (1 <= k <= 4):
        raise ValueError(f"bloom k must be 1..4 (md5 has 4 disjoint 8-hex slices), got {k}")
    if m < 64:
        raise ValueError(f"bloom m must be >= 64 (one packed word), got {m}")
    slots = ", ".join(
        _BLOOM_POS.format(t=text_col, start=1 + 8 * h, m=m) for h in range(k)
    )
    return F.expr(f"array({slots})")


def bloom_bits(
    df: DataFrame, text_col: str = "text", m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Fold a corpus into a packed bloom bitmap: (word_idx, bits) rows,
    at most m/64 of them (4096 longs = 32 KB at the default m) — the
    whole filter broadcasts to every executor no matter how large the
    corpus that built it. One pass, one m/64-key shuffle of OR-partials
    (bit_or has a map-side partial), nothing text-sized moves."""
    pos = df.select(F.explode(bloom_positions(text_col, m, k)).alias("pos"))
    return (
        pos.select(
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def collect_bloom_bitmap(bits: DataFrame, m: int = BLOOM_M) -> list[int]:
    """Materialize a bloom_bits frame into the dense m/64-long bitmap
    (32 KB at the default m) — bounded, corpus-size-independent state,
    the same class of driver-side read as a trained model. Feed it to
    :func:`bloom_hit_column` for a shuffle-free membership probe."""
    arr = [0] * (m // 64)
    for row in bits.collect():
        arr[row["word_idx"]] = row["bits"]
    return arr


def bloom_hit_column(
    bitmap: list[int], text_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> Column:
    """Membership probe as a PURE COLUMN against a collected bitmap:
    all k bit positions set <=> might be in the corpus. The bitmap
    rides the plan as one array literal (constant-folded, not per-row
    data), so the probe is whole-stage-codegen row-local work — no
    explode, no broadcast join, no per-key groupBy (cf.
    bloom_membership, the frame-level variant the streaming twin uses,
    where a literal cannot carry evolving state)."""
    if len(bitmap) != m // 64:
        raise ValueError(f"bitmap must have m/64 = {m // 64} words, got {len(bitmap)}")
    if not (1 <= k <= 4):
        raise ValueError(f"bloom k must be 1..4, got {k}")
    arr_sql = "array(" + ",".join(f"{v}L" for v in bitmap) + ")"
    # unrolled AND of k probes, not forall(): higher-order functions
    # are CodegenFallback (interpreted per row); the unrolled form
    # stays inside whole-stage codegen
    probes = []
    for h in range(k):
        p = _BLOOM_POS.format(t=text_col, start=1 + 8 * h, m=m)
        probes.append(
            f"(element_at({arr_sql}, CAST(({p}) div 64 AS INT) + 1) "
            f"& shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 64 AS INT))) "
            "!= CAST(0 AS BIGINT)"
        )
    return F.expr("(" + ") AND (".join(probes) + ")")


def bloom_membership(
    df: DataFrame,
    bits: DataFrame,
    key_cols: list[str],
    text_col: str = "text",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    out: str = "bloom_hit",
) -> DataFrame:
    """(key_cols..., bloom_hit): True iff ALL k bloom bits for
    ``text_col`` are set — the keyed row MIGHT be in the corpus the
    bitmap was built from (no false negatives; false positives at rate
    ~(1-e^(-kn/m))^k). The bitmap side broadcasts (<=m/64 longs), so
    the probe is a narrow map + a key-local groupBy: explode k
    positions, probe the broadcast map, require k hits. key_cols must
    uniquely key df's rows."""
    probes = df.select(
        *key_cols,
        F.explode(bloom_positions(text_col, m, k)).alias("pos"),
    ).select(
        *key_cols,
        F.expr("pos div 64").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    )
    return (
        probes.join(F.broadcast(bits), "word_idx", "left")
        .withColumn(
            "hit",
            F.coalesce(
                F.expr("(bits & mask) != CAST(0 AS BIGINT)"), F.lit(False)
            ),
        )
        .groupBy(*key_cols)
        .agg((F.sum(F.when(F.col("hit"), 1).otherwise(0)) == F.lit(k)).alias(out))
    )


def span_dedup_rewrite(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """Span-level corpus REWRITE (Lee et al. 2022 ExactSubstr, word-
    span form): every n-word span that occurs more than once in the
    corpus keeps only its first occurrence (global (id, pos) order);
    every later occurrence's word positions are cut from their
    documents and the text is rebuilt from the surviving words.
    Completes the dedup family: dedup_exact drops whole duplicate
    docs, dedup_span_stats only MEASURES cross-doc span mass — this
    actually removes it. No reference counterpart (LLM-pipeline
    surface).

    Returns docs' columns with ``text_col`` replaced by ``new_text``
    plus ``n_before`` (word count) and ``n_removed`` (distinct word
    positions cut; overlapping duplicate spans union, counted once).

    Scale shape: the document text never re-shuffles — spans shuffle
    once for the duplicate-marking window (with ``hashed=True`` that
    key is a 60-bit md5-slice BIGINT instead of the ~50-byte span
    string; a collision merges two span groups identically in both
    engines, so oracle parity is unconditional), cut positions are
    bounded by the duplicated mass only, and the rebuild is one
    id-keyed join of the doc row against its (small) cut array with a
    per-row array filter — AQE picks the join strategy, the cut side
    is duplicate-mass-sized, not corpus-sized.
    """
    from pyspark.sql import Window

    from bigdatasmallprice_spark.functions.texts import md5_key60_expr, shingle_expr

    toks = docs.withColumn("__ws", F.split(F.col(text_col), " ")).drop(text_col)
    occ = toks.select(
        id_col, F.posexplode(F.expr(shingle_expr("__ws", n))).alias("__pos", "__sp")
    )
    if hashed:
        occ = occ.withColumn("__sp", F.expr(md5_key60_expr("__sp")))
    w_cnt = Window.partitionBy("__sp")
    w_rn = Window.partitionBy("__sp").orderBy(id_col, "__pos")
    dup = (
        occ.withColumn("__cnt", F.count(F.lit(1)).over(w_cnt))
        .withColumn("__rn", F.row_number().over(w_rn))
        .filter((F.col("__cnt") > 1) & (F.col("__rn") > 1))
    )
    cuts = (
        dup.select(
            id_col,
            F.explode(F.expr(f"sequence(__pos, __pos + {n - 1})")).alias("__cut"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__cut").alias("__cuts"))
    )
    return (
        toks.join(cuts, id_col, "left")
        .withColumn("n_before", F.size("__ws").cast("long"))
        .withColumn(
            "n_removed", F.coalesce(F.size("__cuts"), F.lit(0)).cast("long")
        )
        .withColumn(
            "new_text",
            F.expr(
                "concat_ws(' ', filter(__ws, (w, i) -> NOT array_contains("
                "coalesce(__cuts, CAST(array() AS ARRAY<INT>)), i)))"
            ),
        )
        .drop("__ws", "__cuts")
    )

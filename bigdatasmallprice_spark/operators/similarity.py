"""Similarity search over embedding columns (``array<float>``).

Two paths, matching the brief for 100 TB training-data curation:

- **Brute-force cosine top-k** (the correctness baseline): query set ×
  corpus cross join, in-order fold dot product, per-query top-k via a
  partitioned window. Cost O(|Q|·N) — fine when |Q| is small or N is a
  pre-filtered candidate set.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (fixed deterministic planes, inlined as literals) bucket the corpus;
  each query probes only its bucket — the cross join shrinks by ~2^planes
  and becomes an equi-join on the signature, which Spark shuffles on the
  bucket key instead of broadcasting the corpus.

Dot products fold left-to-right over index order (F.aggregate), with
every element cast to double first, so the result is reproducible
bit-for-bit across engines; reported similarities are rounded to 6
decimals to absorb any residual last-ulp association differences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den).otherwise(F.lit(0.0))


def cosine_prenormed(a: str, b: str, na: str, nb: str) -> Column:
    """Cosine with norms precomputed per side BEFORE a pair join — one
    fold per pair instead of three (the norms amortize over every pair a
    vector participates in)."""
    den = F.col(na) * F.col(nb)
    return F.when(den > 0, _dot(a, b) / den).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (small side);
    the corpus scan parallelizes; rank ties break on candidate id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(vec_col).alias("nq")
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), _norm(vec_col).alias("nc")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim", F.round(cosine_prenormed("qv", "cv", "nq", "nc"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


# deterministic pseudo-random hyperplanes (LCG, inlined as literals so the
# oracle can embed the identical numbers)
def _lcg_planes(n_planes: int, dim: int, seed: int = 77770001) -> list[list[float]]:
    s = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            s = (s * 1103515245 + 12345) % (2**31)
            row.append(round((s / (2**31)) * 2.0 - 1.0, 6))
        planes.append(row)
    return planes


ANN_PLANES = 4
EMBED_DIM = 64
PLANES = _lcg_planes(ANN_PLANES, EMBED_DIM)

# near-dup bucket scaling: a FIXED plane count makes same-bucket pair
# stages ~N^2/2^p (the semantic_dedup pinned-k disease; measured 80.9x
# wall at 10x data) — so the near-dup queries draw a LONGER prefix of
# the same LCG stream, sized to hold the expected bucket at a constant
# block size. The first ANN_PLANES rows are bit-identical to PLANES
# (sequential generator), so a corpus small enough for 4 planes hashes
# exactly as before.
NEARDUP_MAX_PLANES = 12
NEARDUP_PLANES = _lcg_planes(NEARDUP_MAX_PLANES, EMBED_DIM)
NEARDUP_BLOCK = 128


def scaled_plane_count(
    n_vecs: int,
    target: int = NEARDUP_BLOCK,
    lo: int = ANN_PLANES,
    hi: int = NEARDUP_MAX_PLANES,
) -> int:
    """Smallest p in [lo, hi] with 2^p bucket slots >= ceil(n/target) —
    integer comparisons only, so an oracle CASE chain derives the
    identical p from the same COUNT (no float log2 at a boundary)."""
    blocks = (max(n_vecs, 1) + target - 1) // target
    p = lo
    while (1 << p) < blocks and p < hi:
        p += 1
    return p


def _plane_literal(p: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in p) + ")"


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    out: str = "bucket",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Random-hyperplane signature: bit j = [dot(v, plane_j) >= 0]."""
    terms = []
    for j, p in enumerate(PLANES if planes is None else planes):
        dot = (
            f"aggregate(zip_with({vec_col}, {_plane_literal(p)}, (x, y) -> CAST(x AS DOUBLE) * y), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)")
    return df.withColumn(out, F.expr(" + ".join(terms)))


def brute_force_topk_vectorized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul (mapInPandas).

    Same contract and results as ``brute_force_topk``, different
    execution: the (small) probe set is collected once and broadcast as
    a normalized float64 matrix; each corpus Arrow batch computes
    ``C_norm @ Q_norm.T`` with BLAS and keeps only its local top-k per
    query (argpartition), so the shuffle into the final global top-k
    window carries ``n_batches * |Q| * k`` rows — not |Q|·N pairs. This
    is the scale path when per-pair fold evaluation (interpreted
    higher-order functions) becomes compute-bound.
    """
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    qpdf = queries.select(id_col, vec_col).toPandas()  # probe set: small by contract
    qids = qpdf[id_col].to_numpy()
    Q = np.stack(qpdf[vec_col].to_numpy()).astype("float64")
    qn = np.linalg.norm(Q, axis=1)
    qsafe = np.where(qn > 0, qn, 1.0)
    bq = spark.sparkContext.broadcast((qids, Q / qsafe[:, None], qn > 0))

    def score_batches(pdfs):
        b_qids, Qn, q_ok = bq.value
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            cids = pdf[id_col].to_numpy()
            cn = np.linalg.norm(C, axis=1)
            c_ok = cn > 0
            Cn = C / np.where(c_ok, cn, 1.0)[:, None]
            S = Cn @ Qn.T  # (batch, |Q|)
            S = np.where(c_ok[:, None] & q_ok[None, :], S, 0.0).round(6)
            S[cids[:, None] == b_qids[None, :]] = -np.inf  # self-match
            kk = min(k, S.shape[0])
            out_q, out_c, out_s = [], [], []
            for j in range(S.shape[1]):
                # deterministic local top-k matching the final window's
                # (sim desc, cand_id asc) tie-break — argpartition breaks
                # score ties arbitrarily and can drop the candidate the
                # global window would have kept
                order = np.lexsort((cids, -S[:, j]))[:kk]
                for i in order:
                    if S[i, j] != -np.inf:
                        out_q.append(b_qids[j])
                        out_c.append(cids[i])
                        out_s.append(S[i, j])
            yield pd.DataFrame({"query_id": out_q, "cand_id": out_c, "sim": out_s})

    local = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, "query_id long, cand_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def bucketed_neardup_vectorized(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold, computed
    bucket-locally with numpy: LSH-bucket the corpus, then ONE
    ``applyInPandas`` per bucket builds the normalized matrix and takes
    ``Vn @ Vn.T`` with BLAS — the pairwise loop never materializes as a
    join. Buckets are the unit of parallelism AND the memory bound
    (a bucket must fit one executor; with p planes buckets are ~N/2^p).
    Same results as the fold-based pair join (shared oracle)."""
    import numpy as np
    import pandas as pd

    e = with_lsh_bucket(df.select(id_col, vec_col), vec_col, planes=planes)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"}
            )
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        n = np.linalg.norm(V, axis=1)
        ok = n > 0
        Vn = V / np.where(ok, n, 1.0)[:, None]
        S = (Vn @ Vn.T).round(6)
        S = np.where(ok[:, None] & ok[None, :], S, 0.0)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = S[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "sim": S[ia[keep], ib[keep]]}
        )

    return e.groupBy("bucket").applyInPandas(
        per_bucket, "id_a long, id_b long, sim double"
    )


def bands_for_recall(target_recall: float, sim: float, planes_per_band: int) -> int:
    """Bands needed so a pair at cosine ``sim`` is caught with
    probability >= target_recall: per-plane collision prob for random
    hyperplanes is 1 - theta/pi (Charikar 2002), a band catches a pair
    iff ALL its planes agree, and bands are independent —
    recall = 1 - (1 - s^p)^b, solved for b."""
    import math

    if not (0 < target_recall < 1):
        raise ValueError("target_recall must be in (0, 1)")
    s = 1.0 - math.acos(max(-1.0, min(1.0, sim))) / math.pi
    band_hit = s**planes_per_band
    if band_hit <= 0:
        raise ValueError("band hit probability is 0; lower planes_per_band")
    return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - band_hit)))


def band_planes(band: int, n_planes: int = NEARDUP_MAX_PLANES) -> list[list[float]]:
    """Band ``band``'s hyperplane set: its own LCG stream (seed offset
    by band), so a runtime-scaled PREFIX of each band stays a fixed
    literal list an oracle can embed and mask — band 0's stream is
    exactly NEARDUP_PLANES, so band 0 reproduces the single-band
    queries' buckets bit-for-bit."""
    if band == 0:
        return _lcg_planes(n_planes, EMBED_DIM)
    return _lcg_planes(n_planes, EMBED_DIM, seed=77770001 + 1000003 * band)


def banded_neardup_vectorized(
    df: DataFrame,
    threshold: float,
    n_bands: int | None = None,
    planes_per_band: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Multi-band near-dup pairs — the recall-recovery path the
    single-band queries document: ``n_bands`` independent hyperplane
    signatures (disjoint slices of one LCG stream), a pair is a
    candidate if ANY band agrees (recall 1-(1-s^p)^b vs the single
    band's s^p; size bands with :func:`bands_for_recall`), and every
    candidate is verified with the exact cosine, so extra bands add
    recall, never false positives. One pass: all band buckets computed
    per row, exploded to (band, bucket), one numpy block per group, and
    pairs caught by several bands dedupe on the identical verified
    tuple. Cost scales with n_bands * same-bucket block mass — linear
    in the corpus while planes_per_band tracks scaled_plane_count.
    Pass ``bands`` (explicit per-band plane lists, e.g.
    ``[band_planes(b)[:p] for b in range(nb)]``) to pin the exact
    plane sets; otherwise contiguous slices of one stream are used."""
    import numpy as np
    import pandas as pd

    if bands is None:
        if n_bands is None or planes_per_band is None:
            raise ValueError("pass bands, or n_bands + planes_per_band")
        planes = _lcg_planes(n_bands * planes_per_band, EMBED_DIM)
        bands = [
            planes[b * planes_per_band : (b + 1) * planes_per_band]
            for b in range(n_bands)
        ]
    e = df.select(id_col, vec_col)
    band_cols = []
    for b, sub in enumerate(bands):
        terms = []
        for j, p in enumerate(sub):
            dot = (
                f"aggregate(zip_with({vec_col}, {_plane_literal(p)}, (x, y) -> CAST(x AS DOUBLE) * y), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            terms.append(
                f"(CASE WHEN {dot} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
            )
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.expr(" + ".join(terms)).alias("bucket")
            )
        )
    ex = e.select(
        id_col, vec_col, F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, vec_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"}
            )
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        n = np.linalg.norm(V, axis=1)
        ok = n > 0
        Vn = V / np.where(ok, n, 1.0)[:, None]
        S = (Vn @ Vn.T).round(6)
        S = np.where(ok[:, None] & ok[None, :], S, 0.0)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = S[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "sim": S[ia[keep], ib[keep]]}
        )

    # Dedupe cross-band duplicate catches on the PAIR KEY, not the full
    # row: each block computes sim via a BLAS matmul whose blocking
    # depends on the block shape, so two bands' round-6 values can
    # straddle a rounding boundary by an ULP and full-row distinct()
    # would emit the pair twice nondeterministically. max(sim) is
    # deterministic in both engines (the oracle mirrors it).
    return (
        ex.groupBy("band", "bucket")
        .applyInPandas(per_block, "id_a long, id_b long, sim double")
        .groupBy("id_a", "id_b")
        .agg(F.max("sim").alias("sim"))
    )


def with_ivf_cells(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    norm_col: str,
    id_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine
    (IVF coarse quantization). ``centroids`` must have (cid, cvec, ncv)
    and be small — it broadcasts; assignment is a narrow map over the
    corpus, no shuffle. Similarity is rounded to 6 decimals before
    ranking with a cid tie-break, so the argmax is reproducible across
    engines and partitionings."""
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "__csim", F.round(cosine_prenormed(vec_col, "cvec", norm_col, "ncv"), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__csim").desc(), F.col("cid"))
    return (
        scored.withColumn("__crn", F.row_number().over(w))
        .filter(F.col("__crn") <= nprobe)
        .select(*df.columns, F.col("cid").alias("cell"))
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: the corpus is inverted-file-partitioned by
    nearest centroid (one cell each); every query probes its ``nprobe``
    nearest cells and scores only those candidates. The candidate join is
    an equi-join on the cell id — shuffle-partitioned by cell, so at 100
    TB each executor scans one cell's slice, never the whole corpus.
    Recall/cost trades via nprobe; centroid count scales cells."""
    q = with_ivf_cells(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(vec_col).alias("nq")
        ),
        centroids,
        "qv",
        "nq",
        "query_id",
        nprobe=nprobe,
    )
    c = with_ivf_cells(
        corpus.select(
            F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), _norm(vec_col).alias("nc")
        ),
        centroids,
        "cv",
        "nc",
        "cand_id",
        nprobe=1,
    )
    # the probe set is the small side by contract — broadcast it so the
    # cell join is a map-side hash join over the corpus partitions
    # (post-window stats are unknown, so Catalyst would otherwise SMJ)
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim", F.round(cosine_prenormed("qv", "cv", "nq", "nc"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Equi-join on the bucket key — shuffle-partitioned by bucket,
    no broadcast of the corpus needed at scale."""
    q = with_lsh_bucket(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(vec_col).alias("nq")
        ),
        "qv",
    )
    c = with_lsh_bucket(
        corpus.select(
            F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), _norm(vec_col).alias("nc")
        ),
        "cv",
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim", F.round(cosine_prenormed("qv", "cv", "nq", "nc"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization: the embedding memory-footprint scale path
# ---------------------------------------------------------------------------

QUANT_LEVELS = 127  # symmetric int8 range for the normalized vector


def with_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    norm_col: str = "__qn",
    out: str = "qcodes",
) -> DataFrame:
    """Quantize the L2-NORMALIZED vector to int8 codes:
    ``code_i = round(127 * v_i / ||v||)`` (all-zero codes for zero
    vectors). A 64-dim float32 embedding (256 B) becomes 64 B of codes —
    at 100 TB of embeddings this is the difference between spilling and
    RAM-resident ANN, and the integer dot products downstream are exact
    (no float-order concerns). Error bound: |cos_q - cos| <= ~2/127."""
    q = df.withColumn(norm_col, _norm(vec_col))
    codes = (
        f"CASE WHEN {norm_col} > 0 THEN "
        f"transform({vec_col}, x -> CAST(round({QUANT_LEVELS} * CAST(x AS DOUBLE) / {norm_col}) AS BIGINT)) "
        f"ELSE transform({vec_col}, x -> CAST(0 AS BIGINT)) END"
    )
    return q.withColumn(out, F.expr(codes)).drop(norm_col)


def _int_dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k over int8 codes: same plan shape as
    ``brute_force_topk`` but the per-pair work is an exact integer dot
    (codes are pre-normalized, so sim ~= qdot / 127^2 needs no norms at
    pair time) — 4x smaller scan payload, integer ALU instead of FP."""
    q = with_quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qcodes").alias("qa")
    )
    c = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("cand_id"), F.col("qcodes").alias("ca")
    )
    sim = F.round(
        _int_dot("qa", "ca").cast("double") / F.lit(float(QUANT_LEVELS**2)), 6
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim_q", sim)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_q").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim_q", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# k-means fit: the IVF coarse-quantizer TRAINING step (Lloyd's iterations)
# ---------------------------------------------------------------------------

KMEANS_SCALE = 1_000_000  # embedding values land in exact integer micro-units


def with_scaled_units(
    df: DataFrame, vec_col: str = "embedding", out: str = "xu", id_col: str = "vec_id"
) -> DataFrame:
    """Embedding scaled to integer micro-units (round(1e6 * x) as BIGINT).
    Every arithmetic step downstream is exact int64 — squared distances,
    vote sums, centroid updates — so the fit replays bit-identically in
    any engine and under any partitioning / reduction order."""
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, e -> CAST(round({KMEANS_SCALE} * CAST(e AS DOUBLE)) AS BIGINT))"
        ).alias(out),
    )


def assign_cells(scaled: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid by EXACT integer squared L2, cid tie-break.

    The centroid table is model-sized (k rows), so it is collected and
    shipped in the task closure; assignment is then ONE Arrow-batched
    narrow map — no n*k expansion, no shuffle (the broadcast-crossJoin +
    row_number formulation this replaces carried n*k rows WITH their
    64-dim vectors through a window exchange, which scaled as n*k*d and
    dominated Lloyd wall-clock once k grew with the corpus).

    Exactness: distances are int64 ||x||^2 - 2x.c + ||c||^2 (numpy
    integer matmul, no BLAS/float rounding; |terms| < 2^48 for micro-
    unit 64-dim vectors), identical to the SQL sum-of-squares; argmin
    over centroid columns sorted ascending by cid takes the FIRST
    minimum — exactly the (dist, cid) tie-break of the oracle chain.
    """
    import numpy as np
    import pandas as pd

    crows = sorted(
        ((r["cid"], list(r["cu"])) for r in cent.select("cid", "cu").collect()),
    )
    cids = np.array([c for c, _ in crows], dtype=np.int64)
    C = np.array([cu for _, cu in crows], dtype=np.int64)  # (k, d)
    c_sq = (C * C).sum(axis=1)  # (k,)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["xu"].to_numpy()).astype(np.int64)  # (b, d)
            # int64 throughout: exact, order-independent
            d2 = (X * X).sum(axis=1, keepdims=True) - 2 * (X @ C.T) + c_sq
            best = d2.argmin(axis=1)  # first min = lowest cid on ties
            yield pd.DataFrame(
                {"id": pdf["id"], "cid": cids[best], "xu": pdf["xu"]}
            )

    return scaled.select("id", "xu").mapInPandas(
        assign, "id long, cid long, xu array<long>"
    )


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Per-cluster per-dim mean in integer units: exact BIGINT sums, then
    floor(sum/count) — the double division is exact (|sum| < 2^53) and
    floor() is engine-portable where integer `div` is not (trunc-vs-floor
    on negatives). Shuffle carries (cid, dim) rows: k*64 groups."""
    per_dim = assigned.select(
        "cid", F.posexplode("xu").alias("dim", "v")
    ).groupBy("cid", "dim").agg(
        F.expr("CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT)").alias("cu_e"),
        F.count(F.lit(1)).cast("long").alias("n_assigned"),
    )
    return per_dim


def centroid_arrays(per_dim: DataFrame) -> DataFrame:
    """(cid, dim, cu_e) long form -> (cid, cu array) for the next round's
    broadcast. sort_array over (dim, value) structs keeps dim order."""
    return per_dim.groupBy("cid").agg(
        F.expr("transform(sort_array(collect_list(struct(dim, cu_e))), s -> s.cu_e)").alias("cu")
    )


def _lloyd(scaled: DataFrame, k: int, iters: int, final_update: bool):
    """Shared exact-int Lloyd loop: init = the k smallest ids, then per
    round broadcast-assign + (cid,dim) groupBy update. localCheckpoint
    severs each round's lineage (round r's plan would otherwise re-embed
    rounds 1..r-1; the checkpointed frame is k*dim rows — the model, not
    the data). ``final_update=False`` stops the last round after the
    assign step (assignment r uses centroids updated in round r-1 — the
    oracle chain's ``a{iters}`` CTE). Returns (assigned, per_dim);
    per_dim is None when the last update was skipped AND iters == 1."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # seed = the k smallest ids, resolved explicitly (same latent
    # assumption fix as pq_codebooks: `id < k` seeds fewer than k
    # centroids on an id-shifted corpus; identical on 0-based ids, so
    # the oracle chains keep `id < k`). cid = rank among the seeds.
    # no distinct(): _lloyd's contract is one row per id, and
    # orderBy+limit alone compiles to TakeOrderedAndProject (map-side
    # partial top-k, no shuffle) where a distinct would force a
    # corpus-wide hash-aggregate exchange on every fit
    seed_ids = [
        r["id"] for r in scaled.select("id").orderBy("id").limit(k).collect()
    ]
    seed_rank = {v: i for i, v in enumerate(sorted(seed_ids))}
    rank_expr = F.create_map(
        *[F.lit(x) for pair in seed_rank.items() for x in pair]
    )
    cent = scaled.filter(F.col("id").isin(seed_ids)).select(
        rank_expr[F.col("id")].cast("long").alias("cid"),
        F.col("xu").alias("cu"),
    )
    assigned = per_dim = None
    for it in range(1, iters + 1):
        assigned = assign_cells(scaled, cent)
        if it < iters or final_update:
            per_dim = update_centroids(assigned).localCheckpoint(eager=True)
            cent = centroid_arrays(per_dim)
    return assigned, per_dim


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final Lloyd-round cluster ASSIGNMENT (id, cid, xu) — the labeling
    SemDeDup-style semantic dedup partitions on. Same exact-int
    iterations as kmeans_fit_scaled (shared _lloyd loop), but the last
    round stops after the assign step, so the result equals the oracle
    chain's ``a{iters}`` CTE. The returned frame is one row per input
    vector, no extra shuffle."""
    scaled = with_scaled_units(df.select(id_col, vec_col), vec_col=vec_col, id_col=id_col)
    assigned, _ = _lloyd(scaled, k, iters, final_update=False)
    return assigned


def kmeans_fit_prescaled(
    scaled: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """kmeans_fit_scaled for ALREADY integer micro-unit (id, xu)
    vectors (the prescaled twin of kmeans_assignments_prescaled):
    returns the final post-assignment (cid, dim, cu_e, n_assigned)
    centroid table — the trained coarse quantizer an IVF probe over
    pooled text vectors consumes."""
    _, per_dim = _lloyd(scaled.select("id", "xu"), k, iters, final_update=True)
    return per_dim.select(
        "cid",
        F.col("dim").cast("long").alias("dim"),
        "cu_e",
        "n_assigned",
    )


def kmeans_assignments_prescaled(
    scaled: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """kmeans_assignments for callers whose vectors are ALREADY exact
    integer micro-units (id, xu array<long>) — e.g. mean-pooled
    document embeddings from the SGNS fit (operators/word2vec.py),
    which are integer-born and must NOT ride through the double
    round-trip of with_scaled_units. Same shared _lloyd loop, same
    final-assignment contract as kmeans_assignments."""
    assigned, _ = _lloyd(scaled.select("id", "xu"), k, iters, final_update=False)
    return assigned


def _semantic_removed(
    assigned: DataFrame, tau: float, sim_round: int = 6
) -> tuple[DataFrame, DataFrame]:
    """Shared SemDeDup pair stage: (withn, removed) where ``withn`` is
    the assignment with per-row self-dots (persisted — the Lloyd
    lineage must not recompute per join branch) and ``removed`` the
    DISTINCT (cid, rid) rows a keep-smallest-id cosine>=tau ball
    prunes. semantic_dedup_summary aggregates it; the curation
    pipeline's semantic stage anti-joins it."""
    idot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    withn = assigned.withColumn(
        "aa", F.expr(idot.format(a="xu", b="xu"))
    ).persist()
    a = withn.select(
        F.col("cid"), F.col("id").alias("id_a"), F.col("xu").alias("xa"),
        F.col("aa").alias("na"),
    )
    b = withn.select(
        F.col("cid"), F.col("id").alias("id_b"), F.col("xu").alias("xb"),
        F.col("aa").alias("nb"),
    )
    pairs = a.join(b, "cid").filter(F.col("id_a") < F.col("id_b"))
    sim = F.round(
        F.expr(idot.format(a="xa", b="xb")).cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        sim_round,
    )
    removed = (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") >= tau)
        .select("cid", F.col("id_b").alias("rid"))
        .distinct()
    )
    return withn, removed


def semantic_dedup_summary(
    assigned: DataFrame, tau: float, sim_round: int = 6
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) pruning summary over a cluster
    assignment: within each k-means cluster, a vector is REMOVED when a
    smaller-id vector in the same cluster has cosine >= tau (keep the
    smallest id of every eps-ball; pairwise rule, no transitive
    closure). Cosines come from the exact integer micro-unit vectors
    (int64 dot < 2^53 for dim 64), so both engines evaluate identical
    doubles. The pair join is EQUI on cid — the whole point of
    clustering first: candidates shrink from O(N^2) to sum of per-
    cluster squares, and each cluster's block joins co-partitioned.
    Returns one row per cluster: (cid, n_vecs, n_removed, n_kept)."""
    withn, rem_ids = _semantic_removed(assigned, tau, sim_round)
    removed = rem_ids.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_removed")
    )
    sizes = withn.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    return (
        sizes.join(removed, "cid", "left")
        .select(
            "cid",
            "n_vecs",
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
            (F.col("n_vecs") - F.coalesce(F.col("n_removed"), F.lit(0)))
            .cast("long")
            .alias("n_kept"),
        )
    )


def kmeans_fit_scaled(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over integer-scaled embeddings: init = the k
    smallest ids (deterministic, mirrors the fixed IVF seed centroids),
    then ``iters`` rounds of broadcast-assign + groupBy-update. Returns
    the final (cid, dim, cu_e, n_assigned) long-form centroid table —
    the trained coarse quantizer ann_ivf_topk consumes. At 100 TB the
    fit runs on a hash-sampled slice (operators/splits.py) and only the
    final assignment pass touches the full corpus."""
    scaled = df.select(id_col, vec_col)
    scaled = with_scaled_units(scaled, vec_col=vec_col, id_col=id_col)
    _, per_dim = _lloyd(scaled, k, iters, final_update=True)
    return per_dim.select(
        "cid",
        F.col("dim").cast("long").alias("dim"),
        "cu_e",
        "n_assigned",
    )


def covariance_moments_vectorized(
    df: DataFrame, vec_col: str = "embedding", scale: int = 1_000_000
) -> DataFrame:
    """Exact integer covariance moments via Arrow-batched BLAS.

    Each Arrow batch scales its vectors to integer micro-units
    (round-half-away-from-zero, matching SQL ``round``), computes the
    int64 Gram matrix ``V.T @ V`` and per-dimension linear sums, and
    emits (i, j, val) partial rows: upper-triangle products as
    (i, j>=0), linear sums as (i, -1), the row count as (-1, -1).
    A groupBy sum over (i, j) — dim^2-bounded keys, map-side combined —
    yields corpus-exact moments: every value is an int64 sum, so the
    result is bit-identical under any batching, partitioning, or
    reduction order, and equals a per-element SQL unnest/self-join
    (the oracle form) exactly. This is how a 100 TB PCA/whitening prep
    runs: one scan, BLAS per batch, a 2080-key shuffle.
    """
    import numpy as np
    import pandas as pd

    def moments(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype("float64") * scale
            # round half away from zero == SQL round() in both engines
            V = np.where(X >= 0, np.floor(X + 0.5), -np.floor(-X + 0.5)).astype(
                "int64"
            )
            P = V.T @ V  # int64 matmul: exact
            s = V.sum(axis=0)
            iu, ju = np.triu_indices(V.shape[1])
            d = V.shape[1]
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(d), [-1]]),
                    "j": np.concatenate([ju, np.full(d, -1), [-1]]),
                    "val": np.concatenate([P[iu, ju], s, [len(pdf)]]),
                }
            )

    return (
        df.select(vec_col)
        .mapInPandas(moments, "i int, j int, val long")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze & Schmid 2011) — the FAISS-style
# compressed ANN path. The 64-dim embedding splits into PQ_M subspaces;
# each subspace gets its own PQ_K-centroid codebook (the SAME exact-int
# Lloyd fit as the IVF coarse quantizer, run on the sliced vectors), a
# vector encodes as PQ_M small codes (here 8 x 4 bits vs 64 x 64-bit
# ints — the ~128x memory cut is the point at 100 TB), and a query
# scans CODES with an asymmetric-distance lookup table (ADC): dist ~=
# sum over subspaces of ||probe_sub - codebook[code]||^2, one table
# lookup per subspace instead of a 64-dim arithmetic pass per vector.
# Everything is integer micro-units end-to-end, so fit, encode, LUT
# and ranking replay bit-identically in the oracle.

PQ_M = 8  # subspaces
PQ_DSUB = 8  # dims per subspace (PQ_M * PQ_DSUB = 64)
PQ_K = 16  # centroids per subspace -> 4-bit codes
PQ_ITERS = 2  # Lloyd rounds per codebook (matches kmeans_centroids)
# ADC is a shortlist generator, not the final ranking: the standard
# PQ deployment re-ranks the ADC top-C by exact distance (Jegou 2011
# sec. VI). C = PQ_SHORTLIST_FACTOR * k keeps the exact work O(k) per
# probe regardless of corpus size. On THESE embeddings (synthetic,
# near-iid — the hardest case for PQ, no cluster structure to exploit)
# the 8x16 geometry reaches 0.76 shortlist recall at C=8k; structured
# real-world embeddings do substantially better.
PQ_SHORTLIST_FACTOR = 8

# IVFADC operating point — from the measured r8 frontier (BASELINE.md,
# recall@5 over 50 probes at sf0.01 vs scanned corpus fraction):
# 16 cells / nprobe=4 / shortlist 16k reads the SAME ~25% of the code
# table as the old 8/2/8k point but returns 0.708 vs 0.528 — it
# MATCHES plain PQ's full-scan recall at a quarter of the scan. The
# wider shortlist costs only O(k) more exact re-rank rows per probe.
IVFPQ_CELLS = 16
IVFPQ_NPROBE = 4
IVFPQ_SHORTLIST_FACTOR = 16


def _pq_subs_long(scaled: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(id, xu64[, carry...]) -> (id[, carry...], sub, xu): the frame
    exploded into PQ_M micro-unit subvector rows. ONE explode — the
    grouped form that lets all PQ_M codebooks train in the SAME Lloyd
    loop (a per-subspace fit loop would run PQ_M sequential barrier
    chains; grouping by subspace keys turns every stage into one job).
    Works on any already-scaled frame — raw vectors OR residuals."""
    subs = F.array(
        *[
            F.expr(f"slice(xu, {s * PQ_DSUB + 1}, {PQ_DSUB})")
            for s in range(PQ_M)
        ]
    )
    return scaled.select(
        "id", *carry, F.posexplode(subs).alias("sub", "xu")
    ).withColumn("sub", F.col("sub").cast("long"))


def _pq_scaled_long(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, xu): scale to micro-units then explode (one pass)."""
    scaled = with_scaled_units(
        df.select(id_col, vec_col), vec_col=vec_col, id_col=id_col
    )
    return _pq_subs_long(scaled)


def _pq_assign_grouped(
    sv: DataFrame, cent_rows: list, carry_xu: bool = False
) -> DataFrame:
    """(id, sub, xu) + collected (sub, cid, cu) -> (id, sub, code):
    nearest centroid within each row's OWN subspace (exact integer
    squared L2, cid tie-break) — one Arrow map over the exploded
    frame, all PQ_M codebooks shipped in the closure (model-sized).
    ``carry_xu`` threads the subvector through for the centroid
    update, so the fit never joins back to the corpus."""
    import numpy as np
    import pandas as pd

    by_sub: dict[int, list] = {}
    for s, cid, cu in cent_rows:
        by_sub.setdefault(int(s), []).append((int(cid), list(cu)))
    mats = {}
    for s, rows in by_sub.items():
        rows.sort()
        cids = np.array([c for c, _ in rows], dtype=np.int64)
        C = np.array([cu for _, cu in rows], dtype=np.int64)
        mats[s] = (cids, C, (C * C).sum(axis=1))

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_code = np.empty(len(pdf), dtype=np.int64)
            subs = pdf["sub"].to_numpy()
            X = np.stack(pdf["xu"].to_numpy()).astype(np.int64)
            for s in np.unique(subs):
                m = subs == s
                cids, C, c_sq = mats[int(s)]
                d = (
                    (X[m] * X[m]).sum(axis=1)[:, None]
                    - 2 * (X[m] @ C.T)
                    + c_sq[None, :]
                )
                out_code[m] = cids[d.argmin(axis=1)]
            out = {"id": pdf["id"], "sub": subs, "code": out_code}
            if carry_xu:
                out["xu"] = pdf["xu"]
            yield pd.DataFrame(out)

    schema = "id long, sub long, code long"
    if carry_xu:
        schema += ", xu array<long>"
    return sv.mapInPandas(assign, schema)


def _codebook_arrays(per_dim: DataFrame) -> DataFrame:
    """(sub, cid, dim, cu_e) long form -> (sub, cid, cu array) — the
    single readback all three PQ stages (fit loop, encode, ADC LUT)
    share, so a codebook-layout change cannot silently diverge them."""
    return per_dim.groupBy("sub", "cid").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(dim, cu_e))), "
            "s -> s.cu_e)"
        ).alias("cu")
    )


def pq_codebooks_xu(scaled: DataFrame) -> DataFrame:
    """Train ALL PQ_M codebooks in one grouped Lloyd loop over an
    ALREADY-scaled (id, xu) frame — raw micro-unit vectors for plain
    PQ, coarse-quantizer residuals for IVFADC. Init = the PQ_K
    smallest ids' subvectors per subspace (same rule as the IVF
    quantizer), then per round ONE grouped assign (Arrow map) and ONE
    (sub, cid, dim) groupBy update — PQ_M * PQ_K * PQ_DSUB groups,
    model-sized. Exactly the per-subspace Lloyd math (assignments are
    independent across subspaces), collapsed from PQ_M sequential
    barrier chains into one. Long-form output
    (sub, cid, dim, cu_e, n_assigned). At 100 TB the fit runs on a
    hash sample; encode touches the full corpus once."""
    sv = _pq_subs_long(scaled).persist()
    # init = the PQ_K smallest ids' subvectors (the house seed rule).
    # Resolved by an explicit top-k rather than `id < PQ_K` so a
    # corpus whose ids don't start at 0 still seeds K centroids —
    # identical on 0-based corpora, so the oracle keeps `id < K`.
    seed_ids = [
        r["id"]
        for r in sv.select("id").distinct().orderBy("id").limit(PQ_K).collect()
    ]
    seed_rank = {v: i for i, v in enumerate(sorted(seed_ids))}
    cent_rows = [
        (r["sub"], seed_rank[r["id"]], r["xu"])
        for r in sv.filter(F.col("id").isin(seed_ids)).collect()
    ]
    per_dim = None
    for _ in range(PQ_ITERS):
        assigned = _pq_assign_grouped(
            sv, cent_rows, carry_xu=True
        ).withColumnRenamed("code", "cid")
        per_dim = (
            assigned.select("sub", "cid", F.posexplode("xu").alias("dim", "v"))
            .groupBy("sub", "cid", "dim")
            .agg(
                F.expr(
                    "CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT)"
                ).alias("cu_e"),
                F.count(F.lit(1)).cast("long").alias("n_assigned"),
            )
            .localCheckpoint(eager=True)
        )
        cent_rows = [
            (r["sub"], r["cid"], r["cu"])
            for r in _codebook_arrays(per_dim).collect()
        ]
    sv.unpersist()
    return per_dim.select(
        "sub", "cid", F.col("dim").cast("long").alias("dim"), "cu_e", "n_assigned"
    )


def pq_codebooks(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """pq_codebooks_xu over the micro-unit scaling of a raw frame."""
    return pq_codebooks_xu(
        with_scaled_units(
            df.select(id_col, vec_col), vec_col=vec_col, id_col=id_col
        )
    )


def pq_encode_xu(scaled: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Already-scaled (id, xu) frame -> (id, sub, code): nearest
    codebook centroid per subspace (exact integer squared L2, cid
    tie-break) — ONE grouped Arrow map over the exploded subvectors,
    no shuffle; the output is the compressed index ADC scans."""
    cent_rows = [
        (r["sub"], r["cid"], r["cu"])
        for r in _codebook_arrays(codebooks).collect()
    ]
    return _pq_assign_grouped(_pq_subs_long(scaled), cent_rows)


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_encode_xu over the micro-unit scaling of a raw frame."""
    return pq_encode_xu(
        with_scaled_units(
            df.select(id_col, vec_col), vec_col=vec_col, id_col=id_col
        ),
        codebooks,
    )


def pq_adc_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ search, the full Jegou 2011 deployment shape: train
    codebooks, encode the corpus, build the per-probe lookup table
    (probes x PQ_K centroids per subspace — model-sized, broadcast),
    sum one lookup per (vector, subspace), take the ADC top
    ``PQ_SHORTLIST_FACTOR * k_top`` as the SHORTLIST, then re-rank the
    shortlist by EXACT integer squared L2 and return the exact top
    ``k_top`` (both distances in the output, so the driver hash covers
    the real quantization error). The corpus-side scan reads 4-bit
    codes only — at 100 TB that is the entire point: the fat vectors
    are touched once at encode time and for O(k) shortlist rows per
    probe, never per-vector per-query."""
    # no persist: pq_codebooks returns a localCheckpoint'ed frame —
    # already materialized, and a persist here would leak session
    # cache on every call (nothing unpersists it)
    codebooks = pq_codebooks(corpus, id_col, vec_col)
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    lut = _pq_probe_lut(probes, codebooks, id_col, vec_col)

    adc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("pid", "id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
        .filter(F.col("id") != F.col("pid"))
    )
    return _adc_shortlist_rerank(adc, probes, corpus, k_top, id_col, vec_col)


def _pq_probe_lut(
    probes: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(pid, sub, code, d): the ADC lookup table in ONE pass — exploded
    probe subvectors join the broadcast codebook arrays on their
    subspace; n_probes * M * K rows, model-sized."""
    cent = _codebook_arrays(codebooks)
    ps = _pq_scaled_long(probes, id_col, vec_col).select(
        F.col("id").alias("pid"), "sub", F.col("xu").alias("pu")
    )
    return ps.join(F.broadcast(cent), "sub").select(
        "pid",
        "sub",
        F.col("cid").alias("code"),
        F.expr(
            "aggregate(zip_with(pu, cu, (a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("d"),
    )


def _pq_residual_lut(rq: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(pid, cell, sub, code, d): the IVFADC lookup table — one row per
    (probe, PROBED CELL, subspace, code), distances from the probe's
    residual IN THAT CELL to the residual codebook centroids.
    n_probes * nprobe * M * K rows, model-sized, broadcast."""
    cent = _codebook_arrays(codebooks)
    ps = _pq_subs_long(
        rq.select(F.col("pid").alias("id"), "cell", "xu"), carry=("cell",)
    ).select(
        F.col("id").alias("pid"), "cell", "sub", F.col("xu").alias("pu")
    )
    return ps.join(F.broadcast(cent), "sub").select(
        "pid",
        "cell",
        "sub",
        F.col("cid").alias("code"),
        F.expr(
            "aggregate(zip_with(pu, cu, (a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("d"),
    )


def _adc_shortlist_rerank(
    adc: DataFrame,
    probes: DataFrame,
    corpus: DataFrame,
    k_top: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shortlist_factor: int | None = None,
) -> DataFrame:
    """Shared PQ tail: ADC top-``shortlist_factor * k_top`` shortlist
    (default ``PQ_SHORTLIST_FACTOR``; IVFADC passes its wider
    ``IVFPQ_SHORTLIST_FACTOR``), exact-int re-rank, exact top-``k_top``
    with both distances. Probe vectors come from the PROBES frame, not
    a corpus lookup by id — probes need not be corpus members (a
    corpus-side lookup would silently drop external query vectors)."""
    from pyspark.sql import Window

    slf = PQ_SHORTLIST_FACTOR if shortlist_factor is None else shortlist_factor
    w_adc = Window.partitionBy("pid").orderBy("adc_dist", "id")
    shortlist = adc.select(
        "pid", "id", "adc_dist", F.row_number().over(w_adc).alias("adc_rank")
    ).filter(F.col("adc_rank") <= slf * k_top)

    pv = with_scaled_units(
        probes.select(id_col, vec_col), vec_col=vec_col, id_col=id_col
    ).select(F.col("id").alias("pid"), F.col("xu").alias("pu"))
    cv = with_scaled_units(
        corpus.select(id_col, vec_col), vec_col=vec_col, id_col=id_col
    ).select("id", F.col("xu").alias("vu"))
    exact = (
        shortlist.join(pv, "pid")
        .join(cv, "id")
        .select(
            "pid",
            "id",
            "adc_dist",
            F.expr(
                "aggregate(zip_with(pu, vu, (a, b) -> (a - b) * (a - b)), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("exact_dist"),
        )
    )
    w_ex = Window.partitionBy("pid").orderBy("exact_dist", "id")
    return (
        exact.select(
            "pid",
            "id",
            "adc_dist",
            "exact_dist",
            F.row_number().over(w_ex).alias("rank"),
        )
        .filter(F.col("rank") <= k_top)
        .select(
            F.col("pid").alias("probe_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("id").alias("vec_id"),
            "adc_dist",
            "exact_dist",
        )
    )


def ivfpq_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k_top: int = 5,
    nprobe: int = IVFPQ_NPROBE,
    coarse_k: int = IVFPQ_CELLS,
    coarse_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The COMPOSED FAISS index (true IVFADC, Jegou 2011 sec. V — with
    RESIDUAL encoding): an exact-integer Lloyd coarse quantizer
    partitions the corpus into ``coarse_k`` cells; each vector is PQ-
    encoded as its RESIDUAL x - centroid(cell(x)) — the residual
    distribution concentrates near zero, so the 8x16 codebooks spend
    their resolution on the fine structure the coarse quantizer left,
    which is where IVFADC's accuracy gain over plain PQ lives. A query
    (1) picks its ``nprobe`` nearest cells by exact distance to the
    coarse centroids, (2) forms its OWN residual per probed cell and
    runs the ADC lookup ONLY over codes in those cells — since both
    residuals subtract the SAME centroid, sum-of-subspace residual
    distances approximate the true ||x - q||^2 — then (3) shortlists
    and exact-re-ranks on the raw vectors as usual. The corpus-side
    work drops to ~nprobe/coarse_k of the code scan; the LUT grows to
    one table per (probe, probed cell) — still model-sized, broadcast.
    At 100 TB: cell assignment + residual encode happen once, the
    per-query scan touches a cell-pruned code table, and cell pruning
    composes with the 128x code compression."""
    coarse = kmeans_fit_scaled(
        corpus, k=coarse_k, iters=coarse_iters, id_col=id_col, vec_col=vec_col
    )
    cent = centroid_arrays(coarse)
    xs = with_scaled_units(
        corpus.select(id_col, vec_col), vec_col=vec_col, id_col=id_col
    )
    cells = assign_cells(xs, cent).select("id", F.col("cid").alias("cell"))
    ccell = F.broadcast(cent.select(F.col("cid").alias("cell"), "cu"))

    # residual frame: x - centroid(cell(x)), exact micro-unit integers
    rx = (
        xs.join(cells, "id")
        .join(ccell, "cell")
        .select("id", F.expr("zip_with(xu, cu, (a, b) -> a - b)").alias("xu"))
    )
    codebooks = pq_codebooks_xu(rx)  # checkpointed
    codes = pq_encode_xu(rx, codebooks)

    # probe cells: exact int distance to the (model-sized, broadcast)
    # coarse centroids, nprobe nearest, cid tie-break
    from pyspark.sql import Window

    ps = with_scaled_units(
        probes.select(id_col, vec_col), vec_col=vec_col, id_col=id_col
    ).select(F.col("id").alias("pid"), F.col("xu").alias("pu"))
    w_cell = Window.partitionBy("pid").orderBy("cd", "cell")
    pcells = (
        ps.crossJoin(ccell)
        .select(
            "pid",
            "cell",
            F.expr(
                "aggregate(zip_with(pu, cu, (a, b) -> (a - b) * (a - b)), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("cd"),
        )
        .select("pid", "cell", F.row_number().over(w_cell).alias("crn"))
        .filter(F.col("crn") <= nprobe)
        .select("pid", "cell")
    )

    # per-(probe, probed cell) residuals -> the IVFADC lookup table
    rq = (
        ps.join(F.broadcast(pcells), "pid")
        .join(ccell, "cell")
        .select(
            "pid",
            "cell",
            F.expr("zip_with(pu, cu, (a, b) -> a - b)").alias("xu"),
        )
    )
    lut = _pq_residual_lut(rq, codebooks)

    # the LUT only has rows for probed (pid, cell) pairs, so the
    # (cell, sub, code) equi-join IS the cell pruning
    adc = (
        codes.join(cells, "id")
        .join(F.broadcast(lut), ["cell", "sub", "code"])
        .groupBy("pid", "id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
        .filter(F.col("id") != F.col("pid"))
    )
    return _adc_shortlist_rerank(
        adc, probes, corpus, k_top, id_col, vec_col,
        shortlist_factor=IVFPQ_SHORTLIST_FACTOR,
    )


def hard_triplets(
    anchors: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(anchor_id, pos_id, pos_sim, neg_id, neg_sim): metric-learning
    triplet mining — per anchor the nearest SAME-label candidate (the
    positive) and the nearest DIFFERENT-label candidate (the HARD
    negative, the one that actually moves a contrastive loss) from the
    anchor's IVF cell(s) only. Cell blocking bounds the candidate set
    (an equi-join on the cell id, the semantic_dedup rule) instead of
    the all-pairs corpus square; anchors broadcast. Similarities round
    to 6 decimals before ranking with a cand_id tie-break, so the
    mined triplets are reproducible across engines and partitionings.
    Anchors whose cells hold no same-label or no different-label
    candidate mine no triplet (inner join semantics)."""
    a = with_ivf_cells(
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("qv"),
            _norm(vec_col).alias("nq"),
            F.col(label_col).alias("albl"),
        ),
        centroids,
        "qv",
        "nq",
        "anchor_id",
        nprobe=nprobe,
    )
    c = with_ivf_cells(
        corpus.select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("cv"),
            _norm(vec_col).alias("nc"),
            F.col(label_col).alias("clbl"),
        ),
        centroids,
        "cv",
        "nc",
        "cand_id",
        nprobe=1,
    )
    scored = (
        F.broadcast(a)
        .join(c, "cell")
        .filter(F.col("anchor_id") != F.col("cand_id"))
        .withColumn("sim", F.round(cosine_prenormed("qv", "cv", "nq", "nc"), 6))
        .select("anchor_id", "albl", "cand_id", "clbl", "sim")
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    pos = (
        scored.filter(F.col("albl") == F.col("clbl"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("pos_id"),
            F.col("sim").alias("pos_sim"),
        )
    )
    neg = (
        scored.filter(F.col("albl") != F.col("clbl"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("neg_id"),
            F.col("sim").alias("neg_sim"),
        )
    )
    # both sides are anchor-count-sized (post top-1 windows); hint the
    # broadcast because window outputs carry no stats for AQE
    return pos.join(F.broadcast(neg), "anchor_id")

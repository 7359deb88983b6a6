"""Multimodal plumbing: binary payload column through mapInPandas with a
declared schema — batch shape, NULL payloads, metadata-driven planning."""

from __future__ import annotations

import pytest

from bigdatasmallprice_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake" * 100, 640, 480, None),
        (2, "audio", b"RIFF-fake" * 2000, None, None, 12.5),
        (3, "video", b"\x00\x00ftyp-fake" * 5000, 1920, 1080, 9.2),
        (4, "image", None, None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_schema_and_values(media):
    out = extract_features(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "n_bytes", "sha_prefix", "first_byte", "byte_mean",
    ]
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].n_bytes == 900 and rows[1].first_byte == 0x89
    assert rows[2].n_bytes == 18000
    assert len(rows[3].sha_prefix) == 12
    # NULL payload survives the stage with typed NULL features
    assert rows[4].n_bytes == 0 and rows[4].sha_prefix is None


def test_extract_features_deterministic(media):
    a = sorted(map(tuple, extract_features(media).collect()))
    b = sorted(map(tuple, extract_features(media).collect()))
    assert a == b


def test_frame_sample_plan_is_jvm_side(media):
    planned = frame_sample_plan(media, every_s=1.0)
    rows = {r.media_id: r.n_frames_to_sample for r in planned.collect()}
    assert rows[3] == 10  # ceil(9.2 / 1.0)
    assert rows[1] == 0 and rows[2] == 0 and rows[4] == 0
    # the sampling budget must be computable without Python (no mapInPandas
    # node in this stage's plan)
    plan = planned._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()


def test_wav_codec_roundtrip_bytes():
    """Real RIFF container: encode then decode recovers exact samples."""
    import numpy as np

    from bigdatasmallprice_spark.operators.multimodal import (
        WAV_SAMPLE_RATE,
        decode_wav_bytes,
        encode_wav,
        synth_samples,
    )

    s = synth_samples(7)
    payload = encode_wav(s)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    feat = decode_wav_bytes(payload)
    assert feat["n_frames"] == len(s) == 64 + 7 % 64
    assert feat["sample_rate"] == WAV_SAMPLE_RATE and feat["n_channels"] == 1
    arr = np.asarray(s, dtype="int64")
    assert feat["sum_samples"] == int(arr.sum())
    assert feat["min_sample"] == int(arr.min())
    assert feat["max_sample"] == int(arr.max())


def test_bmp_codec_roundtrip_bytes():
    from bigdatasmallprice_spark.operators.multimodal import (
        decode_bmp_bytes,
        encode_bmp,
    )

    px = [[(x * 3, y * 5, (x + y) % 256) for x in range(5)] for y in range(3)]
    payload = encode_bmp(px)  # 5*3=15 bytes/row -> 1 pad byte, exercises stride
    feat = decode_bmp_bytes(payload)
    assert (feat["width"], feat["height"], feat["bpp"]) == (5, 3, 24)
    assert feat["n_pixels"] == 15
    expect = sum(sum(t) for row in px for t in row)
    assert feat["pixel_sum"] == expect  # padding bytes excluded


def test_bmp_roundtrip_distributed(spark):
    from bigdatasmallprice_spark.queries.mmq import bmp_roundtrip_features

    out = bmp_roundtrip_features(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert (r.width, r.height, r.bpp, r.n_pixels) == (8, 8, 24, 64)
        assert 0 <= r.pixel_sum <= 64 * 3 * 255


def test_y4m_codec_roundtrip_bytes():
    """Real YUV4MPEG2 container: encode then decode recovers every plane
    byte, frame markers verified."""
    from bigdatasmallprice_spark.operators.multimodal import (
        decode_y4m_frames,
        encode_y4m,
        parse_y4m_header,
        synth_video_frames,
    )

    frames = synth_video_frames(11)  # 11 % 3 == 2 -> 4 frames
    payload = encode_y4m(frames, 8, 8)
    assert payload.startswith(b"YUV4MPEG2 ")
    hdr = parse_y4m_header(payload)
    assert (hdr["width"], hdr["height"], hdr["colorspace"]) == (8, 8, "444")
    assert (hdr["fps_num"], hdr["fps_den"]) == (25, 1)
    decoded = list(decode_y4m_frames(payload))
    assert [i for i, *_ in decoded] == [0, 1, 2, 3]
    for (idx, y, u, v), (ey, eu, ev) in zip(decoded, frames):
        assert (y, u, v) == (ey, eu, ev), idx


def test_y4m_corrupt_marker_rejected():
    from bigdatasmallprice_spark.operators.multimodal import (
        decode_y4m_frames,
        encode_y4m,
        synth_video_frames,
    )

    payload = bytearray(encode_y4m(synth_video_frames(1), 8, 8))
    off = payload.index(b"FRAME")
    payload[off] = ord(b"X")
    with pytest.raises(AssertionError, match="FRAME"):
        list(decode_y4m_frames(bytes(payload)))


def test_video_frame_sample_distributed(spark):
    """Frame sampling keeps every stride-th frame with exact plane sums."""
    from bigdatasmallprice_spark.operators.multimodal import (
        synth_video_frames,
        synthesize_y4m,
        video_frame_sample,
    )

    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    out = video_frame_sample(synthesize_y4m(docs), stride=2).collect()
    got = {(r.doc_id, r.frame_idx): (r.y_sum, r.u_sum, r.v_sum) for r in out}
    want = {}
    for d in range(12):
        for f, (y, u, v) in enumerate(synth_video_frames(d)):
            if f % 2 == 0:
                want[(d, f)] = (sum(y), sum(u), sum(v))
    assert got == want
    assert all((r.width, r.height) == (8, 8) for r in out)


def test_bmp_resize_exact_box_mean():
    """4x4 -> 2x2 box downsample: each output channel is the exact floor
    mean of its 2x2 block, re-encoded as a genuine BMP."""
    from bigdatasmallprice_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
        resize_bmp_bytes,
    )

    px = [[((x + 4 * y) * 16, 255 - (x + 4 * y) * 10, (x * y) % 256) for x in range(4)] for y in range(4)]
    small = decode_bmp_pixels(resize_bmp_bytes(encode_bmp(px), 2))
    for by in range(2):
        for bx in range(2):
            block = [px[2 * by + dy][2 * bx + dx] for dy in (0, 1) for dx in (0, 1)]
            want = tuple(sum(c[i] for c in block) // 4 for i in range(3))
            assert small[by][bx] == want, (bx, by, small[by][bx], want)


# ---------------------------------------------------------------------------
# PNG codec
# ---------------------------------------------------------------------------


def test_png_all_filters_roundtrip_exactly():
    """Each of the five PNG filter types, applied to every scanline of a
    gradient-ish image, must reconstruct the raw pixels bit-exactly."""
    from bigdatasmallprice_spark.operators.multimodal import (
        decode_png_bytes,
        encode_png,
    )

    px = [
        [((x * 37 + y * 11) % 256, (x + y * y) % 256, (x * x + 3 * y) % 256) for x in range(13)]
        for y in range(9)
    ]
    expect = sum(v for row in px for p in row for v in p)
    for f in range(5):
        got = decode_png_bytes(encode_png(px, row_filter=lambda y, f=f: f))
        assert (got["width"], got["height"], got["pixel_sum"]) == (13, 9, expect), f


def test_png_crc_corruption_detected():
    import pytest

    from bigdatasmallprice_spark.operators.multimodal import (
        decode_png_bytes,
        encode_png,
    )

    p = bytearray(encode_png([[(1, 2, 3)]]))
    p[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(AssertionError):
        decode_png_bytes(bytes(p))


def test_png_matches_external_decoder_if_available():
    """If PIL exists in the env, our encoder's output must decode to the
    same pixels there (gated import — PIL is absent in this container)."""
    try:
        from PIL import Image  # noqa
    except ImportError:
        import pytest

        pytest.skip("PIL not installed")
    import io

    from bigdatasmallprice_spark.operators.multimodal import encode_png, synth_pixels

    px = synth_pixels(5)
    im = Image.open(io.BytesIO(encode_png(px, row_filter=lambda y: y % 5)))
    assert list(im.getdata()) == [tuple(p) for row in px for p in row]


def test_png_distributed_stats_match_closed_form(spark):
    from bigdatasmallprice_spark.operators.multimodal import (
        png_features,
        synth_pixels,
        synthesize_png,
    )

    docs = spark.range(12).selectExpr("id AS doc_id")
    got = {r.doc_id: r for r in png_features(synthesize_png(docs)).collect()}
    for d in range(12):
        expect = sum(v for row in synth_pixels(d) for p in row for v in p)
        assert got[d].pixel_sum == expect and got[d].n_pixels == 64


def test_ahash_neardup_structure_is_exact(spark):
    """The near-dup synth makes Hamming distances EXACT: member m sits
    at Hamming m from the group base (retouch sets nest, lumas are
    two-level with pinned extremes so no bit is mean-ambiguous), so
    every intra-group pair (m1 < m2) must appear with hamming ==
    m2 - m1 — all 6 pairs per full group, found by the chunk blocking
    (pigeonhole at Hamming <= 3)."""
    from bigdatasmallprice_spark.registry import all_queries

    rows = (
        all_queries()["image_neardup_phash"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    # 500 docs -> 125 full groups of 4 -> 750 intra-group pairs; the
    # md5 base mix (_AHASH_MIX_TMPL) keeps cross-group base distances
    # ~31 bits, so no cross-group pair lands inside the threshold
    intra = {(a, b): h for (a, b), h in pairs.items() if a // 4 == b // 4}
    assert len(intra) == 750, len(intra)
    for (a, b), h in intra.items():
        assert h == (b % 4) - (a % 4), (a, b, h)
    # no cross-group pair sneaks under the threshold on this corpus
    assert len(pairs) == len(intra), set(pairs) - set(intra)


def test_ahash_real_byte_path_matches_closed_form(spark):
    """The Spark signature comes from DECODING real BMP bytes; the
    closed form predicts it from the synth pattern. Equality certifies
    the encode -> binary -> decode -> luma -> hash path byte-exactly
    (the same property the oracle hash-checks, pinned here as a unit
    test with the operator API)."""
    from bigdatasmallprice_spark.operators.multimodal import (
        ahash_features,
        ahash_of_lumas,
        luma_of,
        synth_neardup_pixels,
        synthesize_neardup_bmp,
    )

    docs = spark.range(40).selectExpr("id AS doc_id")
    got = {
        r.doc_id: r.ahash
        for r in ahash_features(synthesize_neardup_bmp(docs)).collect()
    }
    for d in range(40):
        lumas = [
            luma_of(r, g, b) for row in synth_neardup_pixels(d) for (r, g, b) in row
        ]
        assert got[d] == ahash_of_lumas(lumas), d


def test_audio_fingerprint_neardup_structure_is_exact(spark):
    """Audio twin of the aHash structure test: member m sits at
    Hamming m from the group base (retouched cells flip LO<->HI
    amplitudes; cells 0/63 pinned so no bit is mean-ambiguous), so
    every intra-group pair (m1 < m2) appears with hamming == m2 - m1,
    found by the 4-chunk pigeonhole blocking."""
    from bigdatasmallprice_spark.registry import all_queries

    rows = (
        all_queries()["audio_neardup_fingerprint"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    intra = {(a, b): h for (a, b), h in pairs.items() if a // 4 == b // 4}
    assert len(intra) == 750, len(intra)
    for (a, b), h in intra.items():
        assert h == (b % 4) - (a % 4), (a, b, h)
    # the "a:"-prefixed md5 mix keeps cross-group distances far above
    # the threshold on this corpus
    assert len(pairs) == len(intra), set(pairs) - set(intra)


def test_audio_fingerprint_real_byte_path_matches_closed_form(spark):
    """The Spark signature comes from DECODING real WAV bytes; the
    closed form predicts it from the synth sample function. Equality
    certifies the encode -> binary -> decode -> band-energy ->
    fingerprint path byte-exactly."""
    from bigdatasmallprice_spark.operators.multimodal import (
        audio_fingerprint_features,
        audio_fingerprint_of_samples,
        synth_neardup_samples,
        synthesize_neardup_wav,
    )

    docs = spark.range(40).selectExpr("id AS doc_id")
    got = {
        r.doc_id: r.afp
        for r in audio_fingerprint_features(synthesize_neardup_wav(docs)).collect()
    }
    for d in range(40):
        assert got[d] == audio_fingerprint_of_samples(synth_neardup_samples(d)), d


def test_audio_fingerprint_cell_energy_is_exact():
    """The polyphase band layout really integrates 16 samples per
    (window, band) cell: sum|s| over cell j is exactly 16 * level_j,
    and a clip is byte-stable through the real WAV round-trip."""
    import io
    import wave

    import numpy as np

    from bigdatasmallprice_spark.operators.multimodal import (
        _afp_base_level,
        AFP_BANDS,
        AFP_CELLS,
        AFP_SAMPLES_PER_CELL,
        AFP_WINDOW_SAMPLES,
        encode_wav,
        synth_neardup_samples,
    )

    for d in (0, 7, 123):
        s = synth_neardup_samples(d)
        i = np.arange(len(s))
        cell = (i // AFP_WINDOW_SAMPLES) * AFP_BANDS + i % AFP_BANDS
        for j in range(AFP_CELLS):
            e = int(np.abs(s[cell == j].astype("int64")).sum())
            g, m = d // 4, d % 4
            level = _afp_base_level(g, j)
            from bigdatasmallprice_spark.operators.multimodal import (
                _AFP_HI,
                _AFP_LO,
                neardup_retouch_positions,
            )

            if j in set(neardup_retouch_positions(g, m)):
                level = _AFP_LO + _AFP_HI - level
            assert e == AFP_SAMPLES_PER_CELL * level, (d, j)
        # real container round-trip returns the identical PCM
        with wave.open(io.BytesIO(encode_wav(s)), "rb") as w:
            raw = w.readframes(w.getnframes())
        assert np.array_equal(np.frombuffer(raw, dtype="<i2"), s)

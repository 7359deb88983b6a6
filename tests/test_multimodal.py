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

"""Multimodal plumbing tests — the Spark-side shape (schemas, mapInPandas
fan-out, null payloads, modality filters) is real; image/video decode is
a clearly-marked deterministic stub (see operators/multimodal.py)."""

from __future__ import annotations

import pytest

from data_quality_checker_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    frame_samples,
    image_features,
    resize_images,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img1", "image", b"\x89PNGfakepayload1", "image/png", {}),
        ("img2", "image", b"\x89PNGfakepayload2", "image/png", {}),
        ("img_null", "image", None, "image/png", {}),
        ("aud1", "audio", b"RIFFxxxx", "audio/wav", {"sr_hz": "16000"}),
        ("vid1", "video", b"ftypmp4fake", "video/mp4", {"dur_ms": "2000"}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features(media_df):
    out = {r["media_id"]: r for r in image_features(media_df).collect()}
    assert set(out) == {"img1", "img2", "img_null"}
    assert out["img_null"]["decode_ok"] is False
    assert out["img1"]["decode_ok"] is True
    assert 64 <= out["img1"]["width"] < 256
    assert 0.0 <= out["img1"]["mean_luma"] <= 1.0
    # deterministic: same payload → same features
    again = {r["media_id"]: r for r in image_features(media_df).collect()}
    assert again["img1"] == out["img1"]
    # content-dependent: different payloads → different features
    assert (out["img1"]["width"], out["img1"]["height"]) != (
        out["img2"]["width"], out["img2"]["height"],
    )


def test_frame_samples_fanout(media_df):
    rows = frame_samples(media_df, n_frames=4).collect()
    assert len(rows) == 4  # only vid1, 4 frames
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}
    assert max(r["frame_ms"] for r in rows) == 2000.0


def test_resize_passthrough_stub(media_df):
    out = {r["media_id"]: r for r in resize_images(media_df, 128, 128).collect()}
    assert set(out) == {"img1", "img2"}
    assert out["img1"]["width"] == 128 and out["img1"]["height"] == 128
    assert out["img1"]["bytes"] is not None

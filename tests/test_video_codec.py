"""Video modality — real Y4M/YUV4MPEG2 decode (corpus/video.py),
operator vs byte-walking labeler parity (the image tier's pattern), and
the compressed-container stub fallback. Round 5 unstub."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_quality_checker_spark.corpus import video as cv
from data_quality_checker_spark.corpus.media import generate_media
from data_quality_checker_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    frame_samples,
)
from data_quality_checker_spark.oracle.video_oracle import label_frame_samples

RNG = np.random.default_rng(11)


def _frames(n=6, h=9, w=7):  # odd dims → ceil'd 4:2:0 chroma planes
    return RNG.integers(0, 256, size=(n, h, w), dtype=np.uint8)


# ------------------------------------------------------------ codec

@pytest.mark.parametrize("chroma", ["420jpeg", "mono"])
def test_y4m_roundtrip(chroma):
    fr = _frames()
    dec, num, den = cv.decode_y4m(cv.encode_y4m(fr, fps=(24, 1), chroma=chroma))
    assert np.array_equal(dec, fr)
    assert (num, den) == (24, 1)


def test_y4m_default_chroma_and_extra_params():
    # no C tag → spec default 420jpeg; unknown X tags are ignored
    fr = _frames(n=2, h=4, w=4)
    payload = cv.encode_y4m(fr, fps=(30000, 1001))
    payload = payload.replace(b" C420jpeg", b" XYSCSS=420JPEG")
    dec, num, den = cv.decode_y4m(payload)
    assert np.array_equal(dec, fr)
    assert (num, den) == (30000, 1001)


@pytest.mark.parametrize(
    "mangle",
    [
        lambda p: p[:-5],                                   # truncated frame
        lambda p: p.replace(b" C420jpeg\n", b" C444\n", 1),  # unsupported chroma
        lambda p: p[: p.find(b"\n") + 1],                   # zero frames
        lambda p: b"RIFF" + p[4:],                          # bad magic
        lambda p: p.replace(b"FRAME\n", b"FRUME\n", 1),     # bad frame marker
        lambda p: p.replace(b" F25:1", b" F0:1", 1),        # bad rate
    ],
)
def test_y4m_malformed_raises(mangle):
    payload = mangle(cv.encode_y4m(_frames(), fps=(25, 1)))
    with pytest.raises(ValueError):
        cv.decode_y4m(payload)


def test_sample_positions_even_and_bounded():
    assert cv.sample_positions(10, 4) == [0, 3, 6, 9]
    assert cv.sample_positions(2, 4) == [0, 0, 0, 1]  # fewer frames than samples
    assert cv.sample_positions(1, 4) == [0, 0, 0, 0]
    assert cv.sample_positions(100, 1) == [0]


def test_frame_ms_from_header_rate():
    assert cv.frame_ms(3, 30000, 1001) == round(3 * 1000.0 * 1001 / 30000, 3)
    assert cv.frame_ms(0, 24, 1) == 0.0


# ------------------------------------------------- operator vs labeler

@pytest.fixture(scope="module")
def media_pdf():
    return generate_media(0.005)


def test_corpus_has_all_video_classes(media_pdf):
    vids = media_pdf[media_pdf["modality"] == "video"]
    assert len(vids) >= 4  # pinned rows guarantee the floor
    ok, bad = 0, 0
    for payload in vids["bytes"]:
        try:
            cv.decode_y4m(bytes(payload))
            ok += 1
        except ValueError:
            bad += 1
    assert ok > 0 and bad > 0  # decode success AND failure exercised


def test_frame_samples_parity(spark, media_pdf):
    """Spark operator (numpy decode) == independent byte-walking labeler,
    bit-for-bit — including the rounded luma/ms doubles."""
    media = spark.createDataFrame(media_pdf, MEDIA_SCHEMA)
    got = (
        frame_samples(media, n_frames=4)
        .toPandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    want = (
        label_frame_samples(media_pdf, n_frames=4)
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert list(got["media_id"]) == list(want["media_id"])
    assert list(got["frame_idx"]) == [int(v) for v in want["frame_idx"]]
    assert list(got["frame_ms"]) == list(want["frame_ms"])    # exact
    assert list(got["frame_luma"]) == list(want["frame_luma"])  # exact


def test_stub_fallback_for_compressed_containers(spark):
    """Non-Y4M video payloads (no av/ffmpeg here) keep the documented
    deterministic fan-out stub — the driver corpus never contains them,
    so a green driver row can only come from the real codec."""
    rows = [("vid_mp4", "video", b"\x00\x00\x00 ftypisom", "video/mp4",
             {"dur_ms": "2000"})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = frame_samples(media, n_frames=4).collect()
    assert len(out) == 4
    assert max(r["frame_ms"] for r in out) == 2000.0
    again = frame_samples(media, n_frames=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

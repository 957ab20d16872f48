"""Image modality — real PPM/PGM/BMP decode (corpus/image.py), operator
vs byte-walking labeler parity (the audio tier's pattern), and the
resize path. Round 5 unstub (VERDICT r4 next-round #6)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_quality_checker_spark.corpus import image as ci
from data_quality_checker_spark.corpus.media import generate_media
from data_quality_checker_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    image_features,
    resize_images,
)
from data_quality_checker_spark.oracle.image_oracle import label_image_features

RNG = np.random.default_rng(7)


def _img(h=9, w=7):  # odd width → BMP row padding exercised
    return RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------ codecs

def test_ppm_roundtrip():
    a = _img()
    assert np.array_equal(ci.decode_image(ci.encode_ppm(a)), a)


def test_pgm_roundtrip_expands_gray():
    g = RNG.integers(0, 256, size=(5, 11), dtype=np.uint8)
    out = ci.decode_image(ci.encode_pgm(g))
    assert out.shape == (5, 11, 3)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], out[:, :, 2])


def test_bmp_roundtrip_with_padding():
    a = _img(6, 5)  # 5*3=15 → 16-byte padded rows
    assert np.array_equal(ci.decode_image(ci.encode_bmp(a)), a)


def test_pnm_comment_and_whitespace_tolerant():
    a = _img(3, 4)
    raw = b"P6\n# a comment\n 4 3\n# another\n255\n" + a.tobytes()
    assert np.array_equal(ci.decode_image(raw), a)


@pytest.mark.parametrize(
    "mangle",
    [
        lambda p: p[:-5],                                   # truncated raster
        lambda p: p.replace(b"255", b"65535", 1),           # 16-bit maxval
        lambda p: b"P3" + p[2:],                            # ASCII variant
        lambda p: b"P6\n0 3\n255\n" + p,                    # zero width
    ],
)
def test_ppm_malformed_raises(mangle):
    p = ci.encode_ppm(_img(3, 4))
    with pytest.raises(ValueError):
        ci.decode_image(mangle(p))


def test_bmp_unsupported_variants_raise():
    p = bytearray(ci.encode_bmp(_img(4, 4)))
    p[28:30] = (8).to_bytes(2, "little")  # palette bpp
    with pytest.raises(ValueError):
        ci.decode_image(bytes(p))
    with pytest.raises(ValueError):
        ci.decode_image(ci.encode_bmp(_img(4, 4))[:40])  # truncated header


def test_resize_nearest_shape_and_identity():
    a = _img(8, 8)
    assert np.array_equal(ci.resize_nearest(a, 8, 8), a)  # identity at 1:1
    out = ci.resize_nearest(a, 3, 5)
    assert out.shape == (5, 3, 3)
    # every output pixel is SOME input pixel (nearest, no interpolation)
    flat_in = {tuple(px) for px in a.reshape(-1, 3)}
    assert all(tuple(px) in flat_in for px in out.reshape(-1, 3))


# ------------------------------------------------- operator vs labeler

@pytest.fixture(scope="module")
def media_pdf():
    return generate_media(0.005)  # 50 rows, every defect class possible


def test_corpus_has_all_classes(media_pdf):
    # the fixture must actually exercise decode success AND failure
    lab = label_image_features(media_pdf)
    assert lab["decode_ok"].sum() > 0
    assert (~lab["decode_ok"]).sum() > 0
    assert (media_pdf["modality"] != "image").sum() > 0


def test_image_features_parity(spark, media_pdf):
    """Spark operator (numpy decode) == independent byte-walking labeler,
    bit-for-bit — including the rounded luma doubles."""
    media = spark.createDataFrame(media_pdf, MEDIA_SCHEMA)
    got = (
        image_features(media)
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    want = label_image_features(media_pdf).sort_values("media_id").reset_index(drop=True)
    assert list(got["media_id"]) == list(want["media_id"])
    assert list(got["decode_ok"]) == list(want["decode_ok"])
    for col in ("width", "height"):
        assert [None if pd.isna(v) else int(v) for v in got[col]] == [
            None if pd.isna(v) else int(v) for v in want[col]
        ], col
    for g, w in zip(got["mean_luma"], want["mean_luma"]):
        assert (pd.isna(g) and pd.isna(w)) or g == w  # exact, not approx


def test_resize_images_real_path(spark, media_pdf):
    media = spark.createDataFrame(media_pdf, MEDIA_SCHEMA)
    out = resize_images(media, 16, 12).toPandas()
    lab = label_image_features(media_pdf)
    decodable = set(lab[lab["decode_ok"]]["media_id"])
    # exactly the decodable images come out, resized and re-decodable
    assert set(out["media_id"]) == decodable
    for payload in out["bytes"]:
        arr = ci.decode_image(bytes(payload))
        assert arr.shape == (12, 16, 3)


def test_generate_media_deterministic():
    a, b = generate_media(0.004), generate_media(0.004)
    pd.testing.assert_frame_equal(a, b)

"""Multimodal payload plumbing — image / audio / video as opaque
``binary`` columns with typed metadata, processed via ``mapInPandas``.

The audio modality is fully real in this repo (corpus/audio.py decodes
WAV/PCM with numpy; the audio_stats pandas UDF feeds the rule set).
The image modality is real for UNCOMPRESSED formats: PPM/PGM/BMP decode
with pure numpy (corpus/image.py — no codec library needed), verified
against an independent byte-walking labeler (oracle/image_oracle.py,
the audio tier's parity pattern). The video modality is real for the
UNCOMPRESSED Y4M/YUV4MPEG2 container: pure-numpy planar decode
(corpus/video.py), verified against oracle/video_oracle.py the same
way. Compressed images (PNG/JPEG) and compressed video need codec
libraries NOT in this container (PIL / av /
opencv) — per the build instructions those paths are gated behind a
try-import with a clearly-marked deterministic fake, so the Spark-side
plumbing (schema, Arrow batch shape, partitioning, iterator-of-batches
UDF signature, column pruning) is real and testable end-to-end for
every format.

Why ``mapInPandas`` and not a scalar pandas UDF: feature extraction is
one-in-N-out per media row (video → N sampled frames) and benefits from
the iterator form — one model/codec init per PARTITION (not per batch),
and bounded memory because Arrow batches stream through.

Scale notes: the only heavy column is ``bytes``; every downstream
consumer selects feature columns only, so the parquet scan of a
features table never re-reads payloads. Batch size for payload-carrying
stages is bounded by ``arrow_max_records_per_batch`` (session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus.image import (
    decode_image,
    encode_ppm,
    is_decodable,
    luma_stats,
    resize_nearest,
)

try:  # pragma: no cover — not present in this container
    from PIL import Image as _PIL_Image  # type: ignore
except Exception:  # pragma: no cover
    _PIL_Image = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, mean_luma double, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id string, frame_idx int, frame_ms double, frame_luma double"
)


def _stub_decode_image(payload: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC FAKE decode for COMPRESSED formats only (PNG/JPEG
    etc. — stub, see module docstring); uncompressed PPM/PGM/BMP take
    the real numpy path and never reach this.

    Derives (width, height, mean_luma) from the payload digest so tests
    are reproducible and the fake is obviously content-dependent. A real
    deployment replaces this body with ``PIL.Image.open``.
    """
    d = hashlib.sha1(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    mean_luma = round(d[2] / 255.0, 6)
    return width, height, mean_luma


def image_features(media: DataFrame) -> DataFrame:
    """→ (media_id, width, height, mean_luma, decode_ok) for image rows.

    Decode policy, by payload magic:
    * PPM/PGM/BMP → REAL numpy decode (corpus/image.py); any malformed
      or unsupported-variant payload is ``decode_ok = false`` — never a
      fake success (parity-tested vs oracle/image_oracle.py).
    * anything else → PIL when importable, else the clearly-marked
      deterministic stub (compressed codecs aren't in this container).

    Real plumbing throughout: column-pruned payload scan → iterator-of-
    batches pandas transform → slim feature frame (bytes never leave the
    stage).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init goes here (codec contexts, models)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["bytes"]):
                if payload is None:
                    rows.append((mid, None, None, None, False))
                    continue
                payload = bytes(payload)
                if is_decodable(payload):
                    try:
                        rgb = decode_image(payload)
                    except ValueError:
                        rows.append((mid, None, None, None, False))
                        continue
                    rows.append(
                        (mid, rgb.shape[1], rgb.shape[0], luma_stats(rgb), True)
                    )
                    continue
                if _PIL_Image is not None:  # pragma: no cover
                    import io

                    try:
                        img = _PIL_Image.open(io.BytesIO(payload)).convert("L")
                        arr = np.asarray(img, dtype=np.float64) / 255.0
                        rows.append(
                            (mid, img.width, img.height, round(float(arr.mean()), 6), True)
                        )
                        continue
                    except Exception:
                        rows.append((mid, None, None, None, False))
                        continue
                w, h, luma = _stub_decode_image(payload)
                rows.append((mid, w, h, luma, True))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_luma", "decode_ok"]
            )

    return (
        media.where(F.col("modality") == "image")
        .select("media_id", "bytes")
        .mapInPandas(extract, IMAGE_FEATURES_SCHEMA)
    )


def frame_samples(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: 1 input row → up to ``n_frames`` output rows
    (media_id, frame_idx, frame_ms, frame_luma).

    Decode policy, by payload magic (the image tier's policy, round 5):
    * Y4M/YUV4MPEG2 → REAL pure-numpy decode (corpus/video.py): evenly
      sampled source frames, presentation time from the header's F
      rate, exact-integer luma means. Malformed/truncated/unsupported-
      chroma payloads emit NO rows — a clip that can't decode can't be
      sampled (resize_images' drop semantic); never a fake success.
      Parity-tested vs the independent byte-walking labeler
      (oracle/video_oracle.py).
    * anything else (compressed containers; no ``av``/ffmpeg in this
      container) → the clearly-marked deterministic payload-derived
      stub, keeping the fan-out shape testable for every format.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..corpus.video import (
            decode_y4m,
            frame_luma,
            frame_ms,
            is_y4m,
            sample_positions,
        )

        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["bytes"], pdf["meta"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if is_y4m(payload):
                    try:
                        frames, num, den = decode_y4m(payload)
                    except ValueError:
                        continue
                    for i, src in enumerate(sample_positions(len(frames), n_frames)):
                        out.append(
                            (mid, i, frame_ms(src, num, den), frame_luma(frames[src]))
                        )
                    continue
                dur_ms = float((meta or {}).get("dur_ms", 1000.0))
                d = hashlib.sha1(payload).digest()
                for i in range(n_frames):
                    out.append(
                        (
                            mid,
                            i,
                            round(dur_ms * i / max(n_frames - 1, 1), 3),
                            round(d[i % 20] / 255.0, 6),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_ms", "frame_luma"]
            )

    return (
        media.where(F.col("modality") == "video")
        .select("media_id", "bytes", "meta")
        .mapInPandas(sample, FRAME_SAMPLE_SCHEMA)
    )


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize → (media_id, bytes, width, height).

    PPM/PGM/BMP payloads are REALLY resized (nearest-neighbor, pure
    numpy) and re-encoded as PPM; undecodable ones are dropped (the
    training-data-pipeline semantic: a clip that can't decode can't be
    resized). Compressed formats fall back to PIL when importable, else
    the clearly-marked passthrough stub (dims annotated, bytes
    unchanged). Binary-in/binary-out mapInPandas throughout."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for mid, payload in zip(pdf["media_id"], pdf["bytes"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if is_decodable(payload):
                    try:
                        rgb = decode_image(payload)
                    except ValueError:
                        continue
                    out = encode_ppm(resize_nearest(rgb, width, height))
                    outs.append((mid, out, width, height))
                    continue
                if _PIL_Image is not None:  # pragma: no cover
                    import io

                    img = _PIL_Image.open(io.BytesIO(payload))
                    img = img.resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    outs.append((mid, buf.getvalue(), width, height))
                else:
                    outs.append((mid, payload, width, height))
            yield pd.DataFrame(outs, columns=["media_id", "bytes", "width", "height"])

    return (
        media.where(F.col("modality") == "image")
        .select("media_id", "bytes")
        .mapInPandas(_resize, "media_id string, bytes binary, width int, height int")
    )

"""Multimodal payload plumbing — image / audio / video as opaque
``binary`` columns with typed metadata, processed via ``mapInPandas``.

The audio modality is fully real in this repo (corpus/audio.py decodes
WAV/PCM with numpy; the audio_stats pandas UDF feeds the rule set).
Image and video decoding need codec libraries that are NOT in this
container (PIL / av / opencv) — per the build instructions those decode
steps are STUBBED: gated behind a try-import, with a clearly-marked
deterministic fake so the Spark-side plumbing (schema, Arrow batch
shape, partitioning, iterator-of-batches UDF signature, column pruning)
is real and testable end-to-end.

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
    """DETERMINISTIC FAKE image decode (stub — see module docstring).

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

    Real plumbing: column-pruned payload scan → iterator-of-batches
    pandas transform → slim feature frame (bytes never leave the stage).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init goes here (codec contexts, models)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["bytes"]):
                if payload is None:
                    rows.append((mid, None, None, None, False))
                    continue
                if _PIL_Image is not None:  # pragma: no cover
                    import io

                    try:
                        img = _PIL_Image.open(io.BytesIO(bytes(payload))).convert("L")
                        arr = np.asarray(img, dtype=np.float64) / 255.0
                        rows.append(
                            (mid, img.width, img.height, round(float(arr.mean()), 6), True)
                        )
                        continue
                    except Exception:
                        rows.append((mid, None, None, None, False))
                        continue
                w, h, luma = _stub_decode_image(bytes(payload))
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
    """Video frame sampling: 1 input row → ``n_frames`` output rows
    (media_id, frame_idx, frame_ms, frame_luma). Decode is STUBBED with a
    deterministic payload-derived fake (a real deployment uses ``av``);
    the fan-out shape, schema, and Arrow iteration are real.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["bytes"], pdf["meta"]):
                if payload is None:
                    continue
                dur_ms = float((meta or {}).get("dur_ms", 1000.0))
                d = hashlib.sha1(bytes(payload)).digest()
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
    """Image resize → (media_id, bytes, width, height). STUB: without a
    codec library the payload passes through annotated with the target
    dims (clearly-marked fake); with PIL present it re-encodes. The
    binary-in/binary-out mapInPandas plumbing is the tested part."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for mid, payload in zip(pdf["media_id"], pdf["bytes"]):
                if payload is None:
                    continue
                if _PIL_Image is not None:  # pragma: no cover
                    import io

                    img = _PIL_Image.open(io.BytesIO(bytes(payload)))
                    img = img.resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    outs.append((mid, buf.getvalue(), width, height))
                else:
                    outs.append((mid, bytes(payload), width, height))
            yield pd.DataFrame(outs, columns=["media_id", "bytes", "width", "height"])

    return (
        media.where(F.col("modality") == "image")
        .select("media_id", "bytes")
        .mapInPandas(_resize, "media_id string, bytes binary, width int, height int")
    )

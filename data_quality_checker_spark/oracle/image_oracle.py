"""Independent eager labeler for the image modality tier.

Mirrors the audio tier's parity design (oracle/audio_oracle.py): the
operator (operators/multimodal.image_features) decodes with numpy
slicing; THIS module re-derives the expected features with pure-python
byte walks — struct.unpack headers, bytes-slice sums, exact integer
luma accumulation — so a hash-green driver row proves two independent
decoders agree bit-for-bit. Only the spec constants (LUMA_W / LUMA_DEN)
are imported; no decode code is shared.
"""

from __future__ import annotations

import struct

import pandas as pd

from ..corpus.image import LUMA_DEN, LUMA_W


def _pnm_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, raster_off) — whitespace/comment walk
    written against the netpbm spec text, not the operator's parser."""
    pos, vals, n = 2, [], len(payload)
    while len(vals) < 3:
        while pos < n and payload[pos] in b" \t\r\n\x0b\x0c":
            pos += 1
        if pos < n and payload[pos] == ord("#"):
            while pos < n and payload[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while pos < n and ord("0") <= payload[pos] <= ord("9"):
            pos += 1
        if pos == start:
            raise ValueError("bad PNM header")
        vals.append(int(payload[start:pos]))
    if pos >= n or payload[pos] not in b" \t\r\n\x0b\x0c":
        raise ValueError("bad PNM separator")
    w, h, maxval = vals
    if w <= 0 or h <= 0 or maxval != 255:
        raise ValueError("unsupported PNM")
    return w, h, maxval, pos + 1


def _expected_one(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma) or raises — the labeler's decode."""
    magic = payload[:2]
    if magic == b"P6":
        w, h, _m, off = _pnm_header(payload)
        raster = payload[off : off + w * h * 3]
        if len(raster) < w * h * 3:
            raise ValueError("truncated")
        total = (
            sum(raster[0::3]) * LUMA_W[0]
            + sum(raster[1::3]) * LUMA_W[1]
            + sum(raster[2::3]) * LUMA_W[2]
        )
        return w, h, round(total / (LUMA_DEN * w * h), 6)
    if magic == b"P5":
        w, h, _m, off = _pnm_header(payload)
        raster = payload[off : off + w * h]
        if len(raster) < w * h:
            raise ValueError("truncated")
        total = sum(raster) * sum(LUMA_W)
        return w, h, round(total / (LUMA_DEN * w * h), 6)
    if magic == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated header")
        off = struct.unpack_from("<I", payload, 10)[0]
        hdr_sz, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
        if hdr_sz < 40 or planes != 1 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
            raise ValueError("unsupported BMP")
        ah = abs(h)
        row_bytes = (w * 3 + 3) & ~3
        if len(payload) < off + row_bytes * ah:
            raise ValueError("truncated raster")
        total = 0
        for r in range(ah):
            row = payload[off + r * row_bytes : off + r * row_bytes + w * 3]
            # BGR on disk
            total += (
                sum(row[2::3]) * LUMA_W[0]
                + sum(row[1::3]) * LUMA_W[1]
                + sum(row[0::3]) * LUMA_W[2]
            )
        return w, ah, round(total / (LUMA_DEN * w * ah), 6)
    raise ValueError("unknown magic")


def label_image_features(media: pd.DataFrame) -> pd.DataFrame:
    """Expected (media_id, width, height, mean_luma, decode_ok) for every
    image-modality row (other modalities are out of the operator's
    contract and absent here too)."""
    rows = []
    for r in media.itertuples():
        if r.modality != "image":
            continue
        if r.bytes is None:
            rows.append((r.media_id, None, None, None, False))
            continue
        try:
            w, h, luma = _expected_one(bytes(r.bytes))
            rows.append((r.media_id, w, h, luma, True))
        except ValueError:
            rows.append((r.media_id, None, None, None, False))
    out = pd.DataFrame(
        rows, columns=["media_id", "width", "height", "mean_luma", "decode_ok"]
    )
    out["width"] = out["width"].astype("Int32")
    out["height"] = out["height"].astype("Int32")
    return out

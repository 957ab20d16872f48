"""Independent eager labeler for the video modality tier.

Mirrors the image tier's parity design (oracle/image_oracle.py): the
operator (operators/multimodal.frame_samples) decodes Y4M with numpy
(corpus/video.py); THIS module re-derives the expected sampled-frame
features with pure-python byte walks — ASCII header token scan,
bytes-slice ``sum()`` luma accumulation, its own integer sampling and
timing arithmetic — so a hash-green driver row proves two independent
decoders agree bit-for-bit. Only the spec constant (LUMA_MAX) is
imported; no decode code is shared.
"""

from __future__ import annotations

import pandas as pd

from ..corpus.video import LUMA_MAX

_CHROMA_420 = ("420jpeg", "420mpeg2", "420paldv", "420")


def _expected_frames(payload: bytes, n_samples: int) -> list[tuple[int, float, float]]:
    """→ [(frame_idx, frame_ms, frame_luma)] or raises — the labeler's
    own Y4M walk, written against the yuv4mpeg spec text."""
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated header")
    toks = payload[:nl].split(b" ")
    if toks[0] != b"YUV4MPEG2":
        raise ValueError("bad magic")
    params = {chr(t[0]): t[1:].decode("ascii", "replace") for t in toks[1:] if t}
    w = int(params["W"])
    h = int(params["H"])
    num_s, den_s = params["F"].split(":")
    num, den = int(num_s), int(den_s)
    if w <= 0 or h <= 0 or num <= 0 or den <= 0:
        raise ValueError("bad dims/rate")
    chroma = params.get("C", "420jpeg")
    if chroma in _CHROMA_420:
        frame_bytes = w * h + 2 * (((h + 1) // 2) * ((w + 1) // 2))
    elif chroma == "mono":
        frame_bytes = w * h
    else:
        raise ValueError("unsupported chroma")

    # walk the FRAME markers, recording each luma plane's byte span
    spans: list[int] = []
    pos, n = nl + 1, len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        mnl = payload.find(b"\n", pos)
        if mnl < 0:
            raise ValueError("unterminated FRAME marker")
        pos = mnl + 1
        if pos + frame_bytes > n:
            raise ValueError("truncated frame")
        spans.append(pos)
        pos += frame_bytes
    if not spans:
        raise ValueError("zero frames")

    n_src = len(spans)
    out = []
    for i in range(n_samples):
        src = 0 if (n_samples <= 1 or n_src == 1) else (i * (n_src - 1)) // (n_samples - 1)
        off = spans[src]
        total = sum(payload[off : off + w * h])  # exact integer luma sum
        out.append(
            (
                i,
                round(src * 1000.0 * den / num, 3),
                round(total / (LUMA_MAX * w * h), 6),
            )
        )
    return out


def label_frame_samples(media: pd.DataFrame, n_frames: int = 4) -> pd.DataFrame:
    """Expected (media_id, frame_idx, frame_ms, frame_luma) for every
    DECODABLE Y4M video row — undecodable/null payloads emit no rows
    (the operator's documented drop semantic); non-Y4M payloads are
    outside the real tier's contract and absent here too."""
    rows = []
    for r in media.itertuples():
        if r.modality != "video" or r.bytes is None:
            continue
        payload = bytes(r.bytes)
        if payload[:9] != b"YUV4MPEG2":
            continue
        try:
            for idx, ms, luma in _expected_frames(payload, n_frames):
                rows.append((r.media_id, idx, ms, luma))
        except ValueError:
            continue
    out = pd.DataFrame(
        rows, columns=["media_id", "frame_idx", "frame_ms", "frame_luma"]
    )
    out["frame_idx"] = out["frame_idx"].astype("Int32")
    return out

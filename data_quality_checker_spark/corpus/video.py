"""Pure-numpy Y4M (YUV4MPEG2) video codec — the video-modality analog
of corpus/image.py.

Y4M is the standard UNCOMPRESSED video interchange container (mjpegtools
lineage; emitted/consumed by ffmpeg, x264, libvpx, aomenc): an ASCII
parameter header line, then per frame an ASCII ``FRAME`` marker line
followed by raw planar YCbCr data. No codec library is needed — exactly
why it unstubs the video tier here the way PPM/PGM/BMP unstubbed the
image tier. Reference parity target: the reference validates media
payloads by type/codec rules only (/root/reference/src/core/
validation_rules.py — it never decodes); this tier goes further because
a 100 TB training-data pipeline must look INSIDE payloads (frame
sampling for dedup/quality), per the build brief's multimodal
requirement.

Supported chroma subsamplings, per the yuv4mpeg spec:

* ``C420jpeg`` / ``C420mpeg2`` / ``C420paldv`` / ``C420`` — 4:2:0 planar
  (Y w×h, then Cb and Cr each ceil(w/2)×ceil(h/2)); the header default
  when no C tag is present is 420jpeg.
* ``Cmono`` — luma plane only.

Anything else that is a real Y4M variant (C422, C444, C411) parses its
header fine but is OUTSIDE this decoder's contract → ``ValueError`` →
``decode failure`` upstream, never a fake success (the image tier's
bad_maxval/bad_bpp policy).

The independent byte-walking labeler (oracle/video_oracle.py) re-derives
frame features from the same payloads with pure-python slicing; only the
spec constants below are shared.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2"
FRAME_MAGIC = b"FRAME"
# 4:2:0 family — one chroma sample pair per 2×2 luma block; the spec
# default (no C tag) is 420jpeg.
CHROMA_420 = ("420jpeg", "420mpeg2", "420paldv", "420")
LUMA_MAX = 255  # full-scale white → frame_luma 1.0


def is_y4m(payload: bytes) -> bool:
    return payload is not None and bytes(payload[: len(Y4M_MAGIC)]) == Y4M_MAGIC


def encode_y4m(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    chroma: str = "420jpeg",
) -> bytes:
    """``frames`` is (n, h, w) uint8 LUMA planes. For the 4:2:0 family
    the chroma planes are synthesized neutral (128) — content lives in
    luma, which is all the feature tier reads; ``mono`` writes luma
    only. Deliberately tiny: the corpus generator's encoder, not a
    production muxer."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w) uint8")
    n, h, w = frames.shape
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        w, h, fps[0], fps[1], chroma.encode(),
    )
    if chroma in CHROMA_420:
        cb = np.full(((h + 1) // 2) * ((w + 1) // 2), 128, dtype=np.uint8)
        chroma_bytes = cb.tobytes() * 2  # neutral Cb then Cr
    elif chroma == "mono":
        chroma_bytes = b""
    else:
        raise ValueError(f"encoder does not emit C{chroma}")
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma_bytes)
    return b"".join(out)


def _header_params(line: bytes) -> dict[str, str]:
    toks = line.split(b" ")
    if toks[0] != Y4M_MAGIC:
        raise ValueError("bad Y4M magic")
    params: dict[str, str] = {}
    for tok in toks[1:]:
        if tok:
            params[chr(tok[0])] = tok[1:].decode("ascii", "replace")
    return params


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int, int]:
    """→ (luma frames (n, h, w) uint8, fps_num, fps_den) or ``ValueError``
    for anything malformed, truncated, frameless, or outside the
    supported chroma contract."""
    payload = bytes(payload)
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M header")
    params = _header_params(payload[:nl])
    try:
        w = int(params["W"])
        h = int(params["H"])
        num, den = params["F"].split(":")
        fps_num, fps_den = int(num), int(den)
    except (KeyError, ValueError) as exc:
        raise ValueError("bad Y4M header params") from exc
    if w <= 0 or h <= 0 or fps_num <= 0 or fps_den <= 0:
        raise ValueError("bad Y4M dimensions/rate")
    chroma = params.get("C", "420jpeg")
    if chroma in CHROMA_420:
        frame_bytes = w * h + 2 * (((h + 1) // 2) * ((w + 1) // 2))
    elif chroma == "mono":
        frame_bytes = w * h
    else:
        raise ValueError(f"unsupported chroma C{chroma}")

    frames: list[np.ndarray] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        if payload[pos : pos + len(FRAME_MAGIC)] != FRAME_MAGIC:
            raise ValueError("bad FRAME marker")
        mnl = payload.find(b"\n", pos)
        if mnl < 0:
            raise ValueError("unterminated FRAME marker")
        pos = mnl + 1
        if pos + frame_bytes > n:
            raise ValueError("truncated frame data")
        luma = np.frombuffer(payload[pos : pos + w * h], dtype=np.uint8)
        frames.append(luma.reshape(h, w))
        pos += frame_bytes
    if not frames:
        raise ValueError("zero frames")
    return np.stack(frames), fps_num, fps_den


def frame_luma(luma: np.ndarray) -> float:
    """Mean luma of one frame in [0, 1] — exact integer accumulation,
    ONE float division, round 6 (the image tier's bit-stability recipe;
    the labeler reproduces this digit-for-digit from raw bytes)."""
    total = int(luma.sum(dtype=np.int64))
    return round(total / (LUMA_MAX * luma.size), 6)


def sample_positions(n_src: int, n_samples: int) -> list[int]:
    """Evenly spaced source-frame indices (first and last always
    included; floor division so the rule is integer-exact and the
    labeler can mirror it without float ties)."""
    if n_samples <= 1 or n_src == 1:
        return [0] * max(n_samples, 1)
    return [(i * (n_src - 1)) // (n_samples - 1) for i in range(n_samples)]


def frame_ms(src_idx: int, fps_num: int, fps_den: int) -> float:
    """Presentation time of a source frame in milliseconds — fixed
    left-to-right float evaluation order, round 3 (mirrored by the
    labeler)."""
    return round(src_idx * 1000.0 * fps_den / fps_num, 3)

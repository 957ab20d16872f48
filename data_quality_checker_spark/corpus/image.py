"""Pure-numpy uncompressed image codecs — the dependency-free decode
path that unstubs the image modality (VERDICT r4 next-round #6).

Formats: binary PPM (P6, 8-bit RGB), binary PGM (P5, 8-bit gray) and
uncompressed Windows BMP (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up —
the classic baseline variant every tool emits). All three are public,
header-plus-raster formats decodable with numpy slicing alone; no codec
library enters the container. Compressed formats (PNG/JPEG) stay behind
the PIL import guard in operators/multimodal.py.

Reference parity note: the reference validates tabular payloads only
(src/core/validator.py); the media tier is part of this repo's
LLM-training-data extension (build brief), mirroring the audio tier's
design — real numpy decode in the operator, an independent byte-walking
labeler in oracle/image_oracle.py.

Decode contract: ``decode_image`` returns an (H, W, 3) uint8 array or
raises ``ValueError`` — malformed headers, truncated rasters, or
unsupported variants (P3 ASCII, 16-bit maxval, RLE BMP …) are decode
FAILURES, never silently-wrong pixels. Grayscale PGM expands to 3
identical channels so every consumer sees one shape.
"""

from __future__ import annotations

import struct

import numpy as np

PPM_MAGIC = b"P6"
PGM_MAGIC = b"P5"
BMP_MAGIC = b"BM"

# formats this module can decode, by payload magic — the operator routes
# these to the numpy path and everything else to PIL-or-stub
DECODABLE_MAGICS = (PPM_MAGIC, PGM_MAGIC, BMP_MAGIC)


def is_decodable(payload: bytes) -> bool:
    return payload is not None and bytes(payload[:2]) in DECODABLE_MAGICS


# --------------------------------------------------------------- encode

def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6, maxval 255)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_ppm wants (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_pgm(arr: np.ndarray) -> bytes:
    """(H, W) uint8 → binary PGM (P5, maxval 255)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"encode_pgm wants (H, W), got {a.shape}")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BMP (BI_RGB,
    bottom-up rows, 4-byte row padding — the baseline variant)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    # RGB → BGR, bottom-up
    bgr = a[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
    else:
        rows = bgr.reshape(h, w * 3)
    raster = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + raster


# --------------------------------------------------------------- decode

def _pnm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary PNM header → (width, height, maxval, raster_off).
    Whitespace-and-comment tolerant per the netpbm spec."""
    pos = 2  # past magic
    vals: list[int] = []
    n = len(payload)
    while len(vals) < 3:
        # skip whitespace and '#' comments
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("PNM header: expected integer")
        vals.append(int(payload[start:pos]))
    if pos >= n or not payload[pos : pos + 1].isspace():
        raise ValueError("PNM header: missing raster separator")
    pos += 1  # exactly ONE whitespace byte separates header from raster
    w, h, maxval = vals
    if w <= 0 or h <= 0:
        raise ValueError("PNM header: non-positive dimensions")
    if maxval != 255:
        raise ValueError(f"PNM maxval {maxval} unsupported (8-bit only)")
    return w, h, maxval, pos


def _decode_ppm(payload: bytes) -> np.ndarray:
    w, h, _mx, off = _pnm_header(payload)
    need = w * h * 3
    raster = payload[off : off + need]
    if len(raster) < need:
        raise ValueError("PPM raster truncated")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_pgm(payload: bytes) -> np.ndarray:
    w, h, _mx, off = _pnm_header(payload)
    need = w * h
    raster = payload[off : off + need]
    if len(raster) < need:
        raise ValueError("PGM raster truncated")
    gray = np.frombuffer(raster, dtype=np.uint8).reshape(h, w)
    return np.repeat(gray[:, :, None], 3, axis=2)


def _decode_bmp(payload: bytes) -> np.ndarray:
    if len(payload) < 54:
        raise ValueError("BMP header truncated")
    magic, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP")
    hdr_sz, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_sz < 40:
        raise ValueError(f"BMP header size {hdr_sz} unsupported")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(f"BMP variant unsupported (planes={planes}, bpp={bpp}, comp={comp})")
    if w <= 0 or h == 0:
        raise ValueError("BMP: bad dimensions")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = row_bytes * h
    raster = payload[off : off + need]
    if len(raster) < need:
        raise ValueError("BMP raster truncated")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a PPM/PGM/BMP payload → (H, W, 3) uint8 RGB.
    Raises ValueError on anything malformed or unsupported."""
    payload = bytes(payload)
    magic = payload[:2]
    if magic == PPM_MAGIC:
        return _decode_ppm(payload)
    if magic == PGM_MAGIC:
        return _decode_pgm(payload)
    if magic == BMP_MAGIC:
        return _decode_bmp(payload)
    raise ValueError(f"unrecognized image magic {magic!r}")


# ------------------------------------------------------------- features

# integer BT.601 luma weights ×1000 — feature math stays in exact int64
# so the operator (numpy) and the byte-walking labeler (python ints)
# produce bit-identical doubles after ONE shared final division
LUMA_W = (299, 587, 114)
LUMA_DEN = 255 * sum(LUMA_W)  # full-scale white → 1.0


def luma_stats(rgb: np.ndarray) -> float:
    """Mean BT.601 luma in [0, 1], rounded to 6 places. Exact-integer
    accumulation (see LUMA_W) — oracle/image_oracle.py reproduces the
    identical value from pure-python byte loops."""
    a = rgb.astype(np.int64)
    total = int(a[:, :, 0].sum()) * LUMA_W[0]
    total += int(a[:, :, 1].sum()) * LUMA_W[1]
    total += int(a[:, :, 2].sum()) * LUMA_W[2]
    npix = rgb.shape[0] * rgb.shape[1]
    return round(total / (LUMA_DEN * npix), 6)


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, 3) → (height, width, 3) — pure
    index arithmetic, the deterministic resize the resize_images
    operator re-encodes. Pixel-center sampling (the OpenCV
    INTER_NEAREST convention): src = floor((dst + 0.5) * scale)."""
    h, w = rgb.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * (h / height)).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * (w / width)).astype(np.int64), w - 1)
    return rgb[ys[:, None], xs[None, :]]

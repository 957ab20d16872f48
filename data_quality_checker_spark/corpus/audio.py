"""Self-contained audio encode/decode (numpy only — no soundfile/librosa in
this container).

Real formats:
  * ``wav``        — RIFF/WAVE, 16-bit PCM mono, fully parsed with numpy.
  * ``pcm_s16le``  — headerless 16-bit little-endian PCM (needs sr_hz).

Stubbed format:
  * ``flac`` — a real FLAC codec is NOT available here. We gate it behind a
    try-import of ``soundfile``; when absent (always, in this sandbox) we
    fall back to a clearly-marked deterministic stand-in container
    (magic ``b"fLaCSTUB"`` + sr + raw PCM) that the corpus generator emits
    for codec='flac' rows. The Spark-side plumbing (binary column through
    Arrow batches, per-codec dispatch, schema) is real and tested; only the
    entropy coding is faked.

The reference has no audio path at all — this module is the binary-payload
analog of its type/range validation (src/core/validator.py:125-159,
src/core/validation_rules.py:87-119).
"""

from __future__ import annotations

import struct

import numpy as np

try:  # pragma: no cover - not present in this container
    import soundfile as _soundfile  # type: ignore
except Exception:  # pragma: no cover
    _soundfile = None

FLAC_STUB_MAGIC = b"fLaCSTUB"
_INT16_FULL_SCALE = 32767


def encode_wav(samples: np.ndarray, sr_hz: int) -> bytes:
    """Encode float samples in [-1, 1] as 16-bit PCM mono RIFF/WAVE."""
    pcm = (np.clip(samples, -1.0, 1.0) * _INT16_FULL_SCALE).astype("<i2")
    data = pcm.tobytes()
    byte_rate = sr_hz * 2
    header = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, byte_rate, 2, 16)
    return header + fmt + b"data" + struct.pack("<I", len(data)) + data


def encode_pcm_s16le(samples: np.ndarray) -> bytes:
    return (np.clip(samples, -1.0, 1.0) * _INT16_FULL_SCALE).astype("<i2").tobytes()


def encode_flac_stub(samples: np.ndarray, sr_hz: int) -> bytes:
    """Deterministic FLAC stand-in (see module docstring)."""
    return FLAC_STUB_MAGIC + struct.pack("<I", sr_hz) + encode_pcm_s16le(samples)


def decode_clip_i16(payload: bytes | None, codec: str | None, sr_hz: int | None):
    """Decode one clip to RAW int16 samples → (int16 ndarray, sample_rate)
    or None. The hot path for the audio_stats UDF: no float conversion,
    no scaling — at corpus scale the int16→float64 blow-up (×4 memory
    traffic, plus abs/square temporaries) saturates memory bandwidth and
    flatlines multi-core scaling. Stats are computed on int16/float32
    views by the caller. Multi-channel WAV falls back to the float path.
    """
    if payload is None or len(payload) == 0:
        return None
    codec = (codec or "").lower()
    try:
        if codec == "wav" or payload[:4] == b"RIFF":
            out = _decode_wav_i16(payload)
            return out
        if codec == "pcm_s16le":
            if not sr_hz or sr_hz <= 0 or len(payload) % 2 != 0:
                return None
            return np.frombuffer(payload, dtype="<i2"), int(sr_hz)
        if codec == "flac":
            if payload[:8] == FLAC_STUB_MAGIC:
                sr = struct.unpack("<I", payload[8:12])[0]
                return np.frombuffer(payload[12:], dtype="<i2"), sr
            if _soundfile is not None:  # pragma: no cover
                import io

                data, sr = _soundfile.read(io.BytesIO(payload), dtype="int16")
                return np.asarray(data, dtype=np.int16), int(sr)
            return None
        return None
    except Exception:
        return None


def _decode_wav_i16(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    sr = None
    bits = None
    channels = 1
    while pos + 8 <= n:
        chunk_id = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            _, channels, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif chunk_id == b"data" and sr is not None:
            if bits != 16:
                return None
            pcm = np.frombuffer(body[: len(body) - len(body) % 2], dtype="<i2")
            if channels > 1:
                pcm = (
                    pcm[: len(pcm) - len(pcm) % channels]
                    .reshape(-1, channels)
                    .mean(axis=1)
                    .astype(np.int16)
                )
            return pcm, int(sr)
        pos += 8 + size + (size % 2)
    return None


def decode_clip(payload: bytes | None, codec: str | None, sr_hz: int | None):
    """Decode one clip → (samples float64 in [-1,1], sample_rate) or None.

    Per-batch callers (the audio_stats pandas UDF) loop over the *batch*,
    not over Spark rows — decoding variable-length binary blobs is
    inherently per-value work; everything downstream of the decode is
    vectorized numpy.
    """
    if payload is None or len(payload) == 0:
        return None
    codec = (codec or "").lower()
    try:
        if codec == "wav" or payload[:4] == b"RIFF":
            return _decode_wav(payload)
        if codec == "pcm_s16le":
            if not sr_hz or sr_hz <= 0 or len(payload) % 2 != 0:
                return None
            pcm = np.frombuffer(payload, dtype="<i2")
            return pcm.astype(np.float64) / _INT16_FULL_SCALE, int(sr_hz)
        if codec == "flac":
            if payload[:8] == FLAC_STUB_MAGIC:
                sr = struct.unpack("<I", payload[8:12])[0]
                pcm = np.frombuffer(payload[12:], dtype="<i2")
                return pcm.astype(np.float64) / _INT16_FULL_SCALE, sr
            if _soundfile is not None:  # pragma: no cover
                import io

                data, sr = _soundfile.read(io.BytesIO(payload), dtype="float64")
                return np.asarray(data, dtype=np.float64), int(sr)
            return None
        return None
    except Exception:
        return None


def _decode_wav(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    sr = None
    bits = None
    channels = 1
    while pos + 8 <= n:
        chunk_id = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            _, channels, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif chunk_id == b"data" and sr is not None:
            if bits != 16:
                return None
            pcm = np.frombuffer(body[: len(body) - len(body) % 2], dtype="<i2")
            if channels > 1:
                pcm = pcm[: len(pcm) - len(pcm) % channels].reshape(-1, channels).mean(axis=1)
            return pcm.astype(np.float64) / _INT16_FULL_SCALE, int(sr)
        pos += 8 + size + (size % 2)
    return None


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against `reference`, in dB."""
    n = min(len(reference), len(test))
    if n == 0:
        return float("-inf")
    ref = reference[:n]
    noise = ref - test[:n]
    p_sig = float(np.sum(ref * ref))
    p_noise = float(np.sum(noise * noise))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)

"""Audio-corpus operators for a large-scale training-data pipeline, over
the clips table (clip_id, bytes, sr_hz, dur_ms, codec, transcript).

These extend the flagship quality-filter pipeline (pipeline.py) with the
per-clip *content* analysis a 100 TB speech-training corpus needs before
any model sees it: framewise loudness / silence profiling, VAD-style
energy segmentation, training-chunk planning, and sample-rate
normalization. The reference has no audio path (its closest analog is
numeric range validation, src/core/validator.py:125-159); every design
here is the binary-payload generalization of that tier.

Scale shape: every operator is MAP-ONLY — one parallel scan of the clips
table, no shuffle, no driver collect — so at 10^12 clips each is
embarrassingly parallel across whatever partitioning the table already
has (bucket(clip_id) × codec per BASELINE.json). Decoding a
variable-length blob is per-value by nature, so the decode loop is per
clip *inside* an Arrow batch, but all per-sample math is numpy-vectorized
and integer-exact where the cross-engine oracle needs bit-equality:

  * frame energies are int64 sums of int32 squares (exact);
  * zero-crossings are int32 sign products (exact);
  * silence thresholds compare an exact int energy against one float64
    computed by the same closed formula in both engines;
  * the resampler uses RATIONAL position arithmetic (i·sr_in split into
    an integer sample index and an integer remainder) so the only float
    op is one multiply-add per output sample with bit-identical inputs.

Oracle strategy (queries.py): audio_features / vad_segments /
resample stats are hash-checked against an independently-implemented
eager pandas labeler (oracle/audio_oracle.py — per-row loops, reference
style, zero shared code with this module); chunk_plan is pure column
arithmetic and gets a direct DuckDB generate_series oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus.audio import decode_clip_i16
from ..corpus.audio import encode_pcm_s16le  # noqa: F401  (re-export for tests)

# ---------------------------------------------------------------------------
# Shared spec constants (the oracle imports these — they are the semantics
# under test, like config.py thresholds for the rules tier)

FRAME_MS = 20               # non-overlapping analysis frame
SILENCE_DBFS = -40.0        # frame RMS below this ⇒ silent frame
RESAMPLE_SR = 16_000        # normalization target sample rate

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_silent_frames", T.LongType(), True),
        T.StructField("silence_ratio", T.DoubleType(), True),
        T.StructField("lead_silence_ms", T.LongType(), True),
        T.StructField("trail_silence_ms", T.LongType(), True),
        T.StructField("n_segments", T.LongType(), True),
        T.StructField("voiced_ms", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("zcr", T.DoubleType(), True),
        T.StructField("rms_dbfs", T.DoubleType(), True),
    ]
)

SEGMENTS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("seg_idx", T.IntegerType(), False),
            T.StructField("start_ms", T.LongType(), False),
            T.StructField("end_ms", T.LongType(), False),
        ]
    )
)

RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("out_bytes", T.BinaryType(), True),
        T.StructField("out_sr", T.IntegerType(), True),
        T.StructField("n_out", T.LongType(), True),
        T.StructField("sum_abs", T.LongType(), True),
    ]
)


def silence_energy_threshold(frame_len: int, silence_dbfs: float = SILENCE_DBFS) -> float:
    """Exact closed-form frame-energy threshold: a frame of ``frame_len``
    int16 samples is silent iff Σx² < (10^(dBFS/20)·32767)²·frame_len.
    One float64 expression — both engines evaluate the identical formula,
    so the int-vs-float comparison is deterministic."""
    amp = (10.0 ** (silence_dbfs / 20.0)) * 32767.0
    return (amp * amp) * frame_len


def frame_silence_mask(x: np.ndarray, frame_len: int, thr: float) -> np.ndarray:
    """Boolean mask over full frames (tail remainder ignored): True ⇒
    silent. Energy per frame is an EXACT int64 sum of int32 squares."""
    n_frames = len(x) // frame_len
    if n_frames == 0:
        return np.zeros(0, dtype=bool)
    fr = x[: n_frames * frame_len].astype(np.int64).reshape(n_frames, frame_len)
    energy = (fr * fr).sum(axis=1)
    return energy < thr


def _clip_features(x: np.ndarray, sr: int) -> dict:
    """Feature dict for ONE decoded int16 clip (numpy-vectorized)."""
    m = len(x)
    frame_len = sr * FRAME_MS // 1000
    out: dict = {k.name: None for k in AUDIO_FEATURES_SCHEMA.fields}
    if m == 0 or frame_len <= 0:
        return out
    thr = silence_energy_threshold(frame_len)
    silent = frame_silence_mask(x, frame_len, thr)
    n_frames = len(silent)
    voiced = ~silent
    n_voiced = int(voiced.sum())
    out["n_frames"] = n_frames
    out["n_silent_frames"] = n_frames - n_voiced
    out["silence_ratio"] = (n_frames - n_voiced) / n_frames if n_frames else None
    if n_voiced:
        idx = np.flatnonzero(voiced)
        out["lead_silence_ms"] = int(idx[0]) * FRAME_MS
        out["trail_silence_ms"] = int(n_frames - 1 - idx[-1]) * FRAME_MS
        # a segment starts at every voiced frame whose predecessor is not
        out["n_segments"] = int(voiced[0]) + int(
            (voiced[1:] & ~voiced[:-1]).sum()
        )
    else:
        out["lead_silence_ms"] = n_frames * FRAME_MS
        out["trail_silence_ms"] = n_frames * FRAME_MS
        out["n_segments"] = 0
    out["voiced_ms"] = n_voiced * FRAME_MS
    x32 = x.astype(np.int32)
    if m > 1:
        crossings = int(np.count_nonzero(x32[:-1] * x32[1:] < 0))
        out["zero_crossings"] = crossings
        out["zcr"] = crossings / (m - 1)
    else:
        out["zero_crossings"] = 0
        out["zcr"] = 0.0
    x64 = x.astype(np.int64)
    energy = int(np.dot(x64, x64))
    if energy > 0:
        out["rms_dbfs"] = 20.0 * np.log10(np.sqrt(energy / m) / 32767.0)
    return out


def _voiced_segments(x: np.ndarray, sr: int) -> list[tuple[int, int, int]]:
    """(seg_idx, start_ms, end_ms) for every contiguous voiced frame run."""
    frame_len = sr * FRAME_MS // 1000
    if len(x) == 0 or frame_len <= 0:
        return []
    thr = silence_energy_threshold(frame_len)
    voiced = ~frame_silence_mask(x, frame_len, thr)
    if not voiced.any():
        return []
    # run-length boundaries of the voiced mask
    starts = np.flatnonzero(voiced & ~np.r_[False, voiced[:-1]])
    ends = np.flatnonzero(voiced & ~np.r_[voiced[1:], False])
    return [
        (i, int(s) * FRAME_MS, (int(e) + 1) * FRAME_MS)
        for i, (s, e) in enumerate(zip(starts, ends))
    ]


def resample_linear_i16(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Deterministic linear-interpolation resample, int16 → int16.

    Position arithmetic is RATIONAL: output sample i sits at input
    position i·sr_in/sr_out, split exactly into pos = (i·sr_in)//sr_out
    and an integer remainder rem = (i·sr_in) mod sr_out, so the only
    float op is x[pos] + (x[pos+1]-x[pos])·rem/sr_out on bit-identical
    float64 inputs — two independent implementations of this spec produce
    identical int16 output (ties round half-to-even via np.rint).
    """
    m = len(x)
    if m == 0 or sr_in <= 0 or sr_out <= 0:
        return np.zeros(0, dtype=np.int16)
    n_out = (m * sr_out) // sr_in
    if n_out == 0:
        return np.zeros(0, dtype=np.int16)
    i = np.arange(n_out, dtype=np.int64)
    p_num = i * sr_in
    pos = p_num // sr_out
    rem = p_num - pos * sr_out
    pos = np.minimum(pos, m - 1)
    nxt = np.minimum(pos + 1, m - 1)
    x64 = x.astype(np.float64)
    y = x64[pos] + (x64[nxt] - x64[pos]) * (rem.astype(np.float64) / sr_out)
    return np.rint(y).astype(np.int16)


# ---------------------------------------------------------------------------
# Arrow-batched UDF factories (pattern: functions/udfs.py — per-clip loop
# over the batch, vectorized per-sample math, None-safe)


def _decode_iter(payload: pd.Series, codec: pd.Series, sr_hz: pd.Series):
    for b, c, s in zip(payload.values, codec.values, sr_hz.values):
        if b is None or (isinstance(b, float) and pd.isna(b)):
            yield None
            continue
        yield decode_clip_i16(bytes(b), c, None if pd.isna(s) else int(s))


def _features_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(AUDIO_FEATURES_SCHEMA)
    def features(payload: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
        rows = []
        empty = {f.name: None for f in AUDIO_FEATURES_SCHEMA.fields}
        for decoded in _decode_iter(payload, codec, sr_hz):
            if decoded is None:
                rows.append(empty)
            else:
                rows.append(_clip_features(*decoded))
        df = pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])
        for c in ("n_frames", "n_silent_frames", "lead_silence_ms",
                  "trail_silence_ms", "n_segments", "voiced_ms", "zero_crossings"):
            df[c] = df[c].astype("Int64")
        return df

    return features


def _segments_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(SEGMENTS_SCHEMA)
    def segments(payload: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.Series:
        out = []
        for decoded in _decode_iter(payload, codec, sr_hz):
            segs = [] if decoded is None else _voiced_segments(*decoded)
            out.append(
                [{"seg_idx": i, "start_ms": s, "end_ms": e} for i, s, e in segs]
            )
        return pd.Series(out, dtype=object)

    return segments


def _resample_udf(sr_out: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(RESAMPLE_SCHEMA)
    def resample(payload: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
        rows = []
        for decoded in _decode_iter(payload, codec, sr_hz):
            if decoded is None:
                rows.append({"out_bytes": None, "out_sr": None,
                             "n_out": None, "sum_abs": None})
                continue
            x, sr = decoded
            y = resample_linear_i16(x, sr, sr_out)
            rows.append(
                {
                    "out_bytes": y.tobytes(),
                    "out_sr": sr_out,
                    "n_out": len(y),
                    "sum_abs": int(np.abs(y.astype(np.int64)).sum()),
                }
            )
        df = pd.DataFrame(rows, columns=["out_bytes", "out_sr", "n_out", "sum_abs"])
        df["out_sr"] = df["out_sr"].astype("Int32")
        df["n_out"] = df["n_out"].astype("Int64")
        df["sum_abs"] = df["sum_abs"].astype("Int64")
        return df

    return resample


# ---------------------------------------------------------------------------
# Public operators


def audio_features(clips: DataFrame) -> DataFrame:
    """→ (clip_id, n_frames, n_silent_frames, silence_ratio,
    lead_silence_ms, trail_silence_ms, n_segments, voiced_ms,
    zero_crossings, zcr, rms_dbfs).

    Framewise loudness/silence profile per clip: FRAME_MS non-overlapping
    frames, a frame is silent iff its exact int64 energy is below the
    SILENCE_DBFS closed-form threshold. Undecodable clips → all-null row
    (kept, so downstream rules can count them). One map-only scan, one
    ArrowEvalPython node, no shuffle.
    """
    feats = _features_udf()(F.col("bytes"), F.col("codec"), F.col("sr_hz"))
    return clips.select("clip_id", feats.alias("f")).select("clip_id", "f.*")


def vad_segments(clips: DataFrame) -> DataFrame:
    """→ (clip_id, seg_idx, start_ms, end_ms): one row per contiguous
    voiced (non-silent) frame run — energy-threshold VAD, the segmentation
    a speech-training pipeline cuts clips on. Map-only scan + generator
    explode; no shuffle. Clips with no voiced frames (or undecodable)
    contribute zero rows."""
    segs = _segments_udf()(F.col("bytes"), F.col("codec"), F.col("sr_hz"))
    return (
        clips.select("clip_id", F.explode(segs).alias("s"))
        .select("clip_id", "s.seg_idx", "s.start_ms", "s.end_ms")
    )


def chunk_plan(
    clips: DataFrame,
    chunk_ms: int = 5_000,
    overlap_ms: int = 500,
    min_tail_ms: int = 1_000,
) -> DataFrame:
    """→ (clip_id, chunk_idx, start_ms, end_ms): fixed-length training
    chunks with overlap, planned from the dur_ms METADATA column — no
    decode, no UDF, pure Catalyst (sequence + posexplode), whole-stage
    codegen, zero shuffle.

    Chunks start every stride = chunk_ms − overlap_ms; each covers
    [start, min(start+chunk_ms, dur_ms)). A trailing partial chunk is
    kept only if it spans ≥ min_tail_ms (the first chunk is always kept),
    so short clips yield exactly one chunk and no training sample is a
    sliver. Rows with null/non-positive dur_ms yield no chunks.
    """
    stride = chunk_ms - overlap_ms
    if stride <= 0:
        raise ValueError("overlap_ms must be smaller than chunk_ms")
    starts = F.sequence(F.lit(0).cast("long"), F.col("dur_ms").cast("long") - 1, F.lit(stride).cast("long"))
    out = (
        clips.where(F.col("dur_ms").isNotNull() & (F.col("dur_ms") > 0))
        .select("clip_id", "dur_ms", F.posexplode(starts).alias("chunk_idx", "start_ms"))
        .withColumn("end_ms", F.least(F.col("start_ms") + chunk_ms, F.col("dur_ms").cast("long")))
    )
    return out.where(
        (F.col("chunk_idx") == 0) | (F.col("end_ms") - F.col("start_ms") >= min_tail_ms)
    ).select("clip_id", "chunk_idx", "start_ms", "end_ms")


def resample_clips(clips: DataFrame, sr_out: int = RESAMPLE_SR) -> DataFrame:
    """→ (clip_id, out_bytes, out_sr, n_out, sum_abs): every decodable
    clip linearly resampled to ``sr_out`` (headerless pcm_s16le payload),
    plus integer-exact stats for the cross-engine parity check. Map-only
    scan, one ArrowEvalPython node, no shuffle; undecodable clips keep a
    null row (auditable, filterable)."""
    res = _resample_udf(sr_out)(F.col("bytes"), F.col("codec"), F.col("sr_hz"))
    return clips.select("clip_id", res.alias("r")).select("clip_id", "r.*")

"""Audio operator tier (operators/audio.py): exact-value unit tests on
constructed PCM, SNR gate for the resampler, chunk-plan arithmetic edges,
full corpus parity vs the independent eager labeler
(oracle/audio_oracle.py), and map-only plan-shape guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_quality_checker_spark.corpus.audio import encode_wav
from data_quality_checker_spark.operators import audio as A
from data_quality_checker_spark.oracle import audio_oracle as O

SR = 8_000
FRAME = SR * A.FRAME_MS // 1000  # 160 samples per 20 ms frame


def _tone(n: int, freq: float = 440.0, amp: float = 0.5, sr: int = SR) -> np.ndarray:
    t = np.arange(n) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def _clips_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"])
    return spark.createDataFrame(
        pdf,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )


# ---------------------------------------------------------------------------
# audio_features / vad_segments exact values on constructed layouts


def test_features_silence_layout(spark):
    # 10 silent frames | 20 voiced | 5 silent | 10 voiced | 5 silent
    sig = np.concatenate([
        np.zeros(10 * FRAME),
        _tone(20 * FRAME),
        np.zeros(5 * FRAME),
        _tone(10 * FRAME),
        np.zeros(5 * FRAME),
    ])
    df = _clips_df(spark, [("c1", encode_wav(sig, SR), SR, 1000, "wav", "x")])
    row = A.audio_features(df).collect()[0]
    assert row.n_frames == 50
    assert row.n_silent_frames == 20
    assert row.silence_ratio == pytest.approx(0.4)
    assert row.lead_silence_ms == 10 * A.FRAME_MS
    assert row.trail_silence_ms == 5 * A.FRAME_MS
    assert row.n_segments == 2
    assert row.voiced_ms == 30 * A.FRAME_MS
    assert row.rms_dbfs < 0

    segs = A.vad_segments(df).orderBy("seg_idx").collect()
    assert [(s.seg_idx, s.start_ms, s.end_ms) for s in segs] == [
        (0, 10 * A.FRAME_MS, 30 * A.FRAME_MS),
        (1, 35 * A.FRAME_MS, 45 * A.FRAME_MS),
    ]


def test_features_all_silent_and_undecodable(spark):
    silent = encode_wav(np.zeros(20 * FRAME), SR)
    df = _clips_df(
        spark,
        [
            ("s", silent, SR, 400, "wav", "x"),
            ("bad", b"\x00\x01garbage", SR, 400, "opus", "x"),
            ("nul", None, SR, 400, "wav", "x"),
        ],
    )
    rows = {r.clip_id: r for r in A.audio_features(df).collect()}
    s = rows["s"]
    assert s.n_segments == 0 and s.silence_ratio == 1.0
    assert s.lead_silence_ms == 20 * A.FRAME_MS == s.trail_silence_ms
    assert s.rms_dbfs is None  # zero energy → undefined level
    for cid in ("bad", "nul"):
        r = rows[cid]
        assert r.n_frames is None and r.rms_dbfs is None
    # silent/undecodable clips contribute zero VAD rows but keep their
    # features row (auditable)
    assert A.vad_segments(df).count() == 0


def test_zcr_exact(spark):
    # alternating +A/-A: every adjacent pair crosses → m-1 crossings
    x = np.tile([0.5, -0.5], 40 * FRAME)[: 20 * FRAME]
    df = _clips_df(spark, [("z", encode_wav(x, SR), SR, 400, "wav", "x")])
    row = A.audio_features(df).collect()[0]
    assert row.zero_crossings == len(x) - 1
    assert row.zcr == 1.0


# ---------------------------------------------------------------------------
# resampler: SNR gate + exact stats determinism


def test_resample_snr_vs_analytic():
    # 200 Hz tone at 8 kHz, linearly resampled to 16 kHz, compared to the
    # analytic 16 kHz tone — linear interpolation of a smooth low-frequency
    # signal must clear the BASELINE SNR≥30dB bar by a wide margin.
    n = SR  # 1 s
    x = (np.clip(_tone(n, 200.0), -1, 1) * 32767).astype(np.int16)
    y = A.resample_linear_i16(x, SR, 16_000)
    ref = (np.clip(_tone(len(y), 200.0, sr=16_000), -1, 1) * 32767.0)
    err = y.astype(np.float64) - ref
    snr = 10 * np.log10(np.dot(ref, ref) / max(np.dot(err, err), 1e-9))
    assert snr >= 30.0, f"resample SNR {snr:.1f} dB < 30 dB"


def test_resample_identity_and_rational_positions():
    x = (np.clip(_tone(1000), -1, 1) * 32767).astype(np.int16)
    same = A.resample_linear_i16(x, SR, SR)
    assert np.array_equal(same, x)  # sr_in == sr_out is a no-op
    half = A.resample_linear_i16(x, SR, SR // 2)
    assert len(half) == 500
    assert np.array_equal(half, x[::2])  # integer ratio hits exact samples
    assert len(A.resample_linear_i16(np.zeros(0, np.int16), SR, 16_000)) == 0


def test_resample_clips_spark_roundtrip(spark):
    sig = _tone(SR // 2)  # 0.5 s
    df = _clips_df(spark, [("r1", encode_wav(sig, SR), SR, 500, "wav", "x"),
                           ("rn", None, SR, 500, "wav", "x")])
    rows = {r.clip_id: r for r in A.resample_clips(df).collect()}
    good = rows["r1"]
    assert good.out_sr == A.RESAMPLE_SR
    assert good.n_out == (SR // 2) * A.RESAMPLE_SR // SR
    decoded = np.frombuffer(good.out_bytes, dtype="<i2")
    assert len(decoded) == good.n_out
    assert good.sum_abs == int(np.abs(decoded.astype(np.int64)).sum())
    assert rows["rn"].out_bytes is None and rows["rn"].n_out is None


# ---------------------------------------------------------------------------
# chunk planning arithmetic


def test_chunk_plan_edges(spark):
    df = _clips_df(
        spark,
        [
            ("short", b"", SR, 3_000, "wav", "x"),    # < chunk → 1 chunk
            ("tail_drop", b"", SR, 5_200, "wav", "x"),  # tail 700ms < 1s → dropped
            ("tail_keep", b"", SR, 9_400, "wav", "x"),  # idx1 = [4500, 9400) = 4900ms
            ("exact", b"", SR, 5_000, "wav", "x"),
            ("nodur", b"", SR, None, "wav", "x"),
            ("zero", b"", SR, 0, "wav", "x"),
        ],
    )
    got = {
        (r.clip_id, r.chunk_idx): (r.start_ms, r.end_ms)
        for r in A.chunk_plan(df).collect()
    }
    assert got == {
        ("short", 0): (0, 3_000),
        ("tail_drop", 0): (0, 5_000),
        ("tail_keep", 0): (0, 5_000),
        ("tail_keep", 1): (4_500, 9_400),
        ("exact", 0): (0, 5_000),
        # second start 4500 < 5000 → tail [4500,5000) = 500ms < 1s → dropped
    }


def test_chunk_plan_rejects_bad_overlap(spark):
    df = _clips_df(spark, [("a", b"", SR, 1000, "wav", "x")])
    with pytest.raises(ValueError):
        A.chunk_plan(df, chunk_ms=1000, overlap_ms=1000)


# ---------------------------------------------------------------------------
# corpus-wide parity vs the independent eager labeler


def _nullsafe_equal(a: pd.Series, b: pd.Series) -> bool:
    if a.dtype.kind == "f" or b.dtype.kind == "f":
        return bool(((a.isna() & b.isna()) | (a == b)).all())
    ao = a.astype("object").where(a.notna(), None)
    bo = b.astype("object").where(b.notna(), None)
    return ao.equals(bo)


def test_audio_oracle_parity_corpus(spark, clips_pdf, clips_df):
    pdf = clips_pdf.drop(columns=["defect"])

    f_s = A.audio_features(clips_df).toPandas().sort_values("clip_id").reset_index(drop=True)
    f_o = O.label_audio_features(pdf).sort_values("clip_id").reset_index(drop=True)
    assert len(f_s) == len(f_o) == len(pdf)
    for c in f_o.columns:
        assert _nullsafe_equal(f_s[c], f_o[c]), f"audio_features mismatch in {c}"

    key = ["clip_id", "seg_idx"]
    s_s = A.vad_segments(clips_df).toPandas().sort_values(key).reset_index(drop=True)
    s_o = O.label_vad_segments(pdf).sort_values(key).reset_index(drop=True)
    assert len(s_s) == len(s_o)
    for c in s_o.columns:
        assert _nullsafe_equal(s_s[c], s_o[c]), f"vad_segments mismatch in {c}"

    r_s = (
        A.resample_clips(clips_df)
        .select("clip_id", "out_sr", "n_out", "sum_abs")
        .toPandas().sort_values("clip_id").reset_index(drop=True)
    )
    r_o = O.label_resample_stats(pdf).sort_values("clip_id").reset_index(drop=True)
    for c in r_o.columns:
        assert _nullsafe_equal(r_s[c], r_o[c]), f"resample mismatch in {c}"


# ---------------------------------------------------------------------------
# plan shape: the whole tier must stay map-only (no shuffle)


@pytest.mark.parametrize(
    "build,n_arrow",
    [
        (lambda df: A.audio_features(df), 1),
        (lambda df: A.vad_segments(df), 1),
        (lambda df: A.resample_clips(df), 1),
        (lambda df: A.chunk_plan(df), 0),  # pure Catalyst — no Python at all
    ],
)
def test_audio_plans_map_only(clips_df, build, n_arrow):
    plan = build(clips_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"audio op shuffles:\n{plan}"
    assert plan.count("ArrowEvalPython") == n_arrow

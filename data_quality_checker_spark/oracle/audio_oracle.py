"""Eager pandas ground-truth labeler for the AUDIO operator tier
(operators/audio.py) — the independent second implementation behind the
driver's hash-green fixtures for audio_features / vad_segments /
audio_resample_stats.

Written like oracle/pandas_oracle.py: per-row loops, eager pandas, zero
shared implementation with the Spark operators — only the SPEC constants
(FRAME_MS, SILENCE_DBFS, RESAMPLE_SR) and the codec decoder are imported,
because those are the semantics under test (same policy as the shared
config.py thresholds for the rules tier). Everything integer is exact by
construction; every float is produced by the same closed formula the spec
mandates, so parquet round-trip + DuckDB read reproduce the Spark values
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..corpus.audio import decode_clip_i16
from ..operators.audio import FRAME_MS, RESAMPLE_SR, SILENCE_DBFS


def _silent_frames(x: np.ndarray, sr: int) -> np.ndarray | None:
    """Per-frame silent mask, computed the slow eager way: reduceat over
    exact int64 squares (the operator reshapes instead)."""
    frame_len = sr * FRAME_MS // 1000
    if frame_len <= 0:
        return None
    n_frames = len(x) // frame_len
    if n_frames == 0:
        return np.zeros(0, dtype=bool)
    sq = x[: n_frames * frame_len].astype(np.int64) ** 2
    energy = np.add.reduceat(sq, np.arange(0, n_frames * frame_len, frame_len))
    amp = (10.0 ** (SILENCE_DBFS / 20.0)) * 32767.0
    return energy < (amp * amp) * frame_len


def label_audio_features(clips: pd.DataFrame) -> pd.DataFrame:
    """Expected (clip_id, …features) — one row per clip, nulls for
    undecodable payloads (mirrors operators/audio.audio_features)."""
    cols = [
        "n_frames", "n_silent_frames", "silence_ratio", "lead_silence_ms",
        "trail_silence_ms", "n_segments", "voiced_ms", "zero_crossings",
        "zcr", "rms_dbfs",
    ]
    rows = []
    for r in clips.itertuples():
        out = {c: None for c in cols}
        out["clip_id"] = r.clip_id
        decoded = None
        if r.bytes is not None and not (isinstance(r.bytes, float) and pd.isna(r.bytes)):
            sr_arg = None if pd.isna(r.sr_hz) else int(r.sr_hz)
            decoded = decode_clip_i16(bytes(r.bytes), r.codec, sr_arg)
        if decoded is not None:
            x, sr = decoded
            m = len(x)
            silent = _silent_frames(x, sr)
            if m and silent is not None:
                n_frames = len(silent)
                out["n_frames"] = n_frames
                n_silent = int(silent.sum())
                out["n_silent_frames"] = n_silent
                out["silence_ratio"] = n_silent / n_frames if n_frames else None
                voiced_idx = [i for i, s in enumerate(silent) if not s]
                if voiced_idx:
                    out["lead_silence_ms"] = voiced_idx[0] * FRAME_MS
                    out["trail_silence_ms"] = (n_frames - 1 - voiced_idx[-1]) * FRAME_MS
                    segs = sum(
                        1
                        for j, i in enumerate(voiced_idx)
                        if j == 0 or voiced_idx[j - 1] != i - 1
                    )
                    out["n_segments"] = segs
                else:
                    out["lead_silence_ms"] = n_frames * FRAME_MS
                    out["trail_silence_ms"] = n_frames * FRAME_MS
                    out["n_segments"] = 0
                out["voiced_ms"] = (n_frames - n_silent) * FRAME_MS
                if m > 1:
                    prod = x.astype(np.int32)[:-1] * x.astype(np.int32)[1:]
                    crossings = int((prod < 0).sum())
                    out["zero_crossings"] = crossings
                    out["zcr"] = crossings / (m - 1)
                else:
                    out["zero_crossings"] = 0
                    out["zcr"] = 0.0
                energy = int(np.dot(x.astype(np.int64), x.astype(np.int64)))
                if energy > 0:
                    out["rms_dbfs"] = 20.0 * np.log10(np.sqrt(energy / m) / 32767.0)
        rows.append(out)
    df = pd.DataFrame(rows, columns=["clip_id"] + cols)
    for c in ("n_frames", "n_silent_frames", "lead_silence_ms",
              "trail_silence_ms", "n_segments", "voiced_ms", "zero_crossings"):
        df[c] = df[c].astype("Int64")
    for c in ("silence_ratio", "zcr", "rms_dbfs"):
        df[c] = df[c].astype("float64")
    return df


def label_vad_segments(clips: pd.DataFrame) -> pd.DataFrame:
    """Expected (clip_id, seg_idx, start_ms, end_ms) — one row per voiced
    run (mirrors operators/audio.vad_segments; zero rows for silent or
    undecodable clips)."""
    rows = []
    for r in clips.itertuples():
        if r.bytes is None or (isinstance(r.bytes, float) and pd.isna(r.bytes)):
            continue
        sr_arg = None if pd.isna(r.sr_hz) else int(r.sr_hz)
        decoded = decode_clip_i16(bytes(r.bytes), r.codec, sr_arg)
        if decoded is None:
            continue
        x, sr = decoded
        silent = _silent_frames(x, sr)
        if silent is None or not len(silent):
            continue
        seg_idx, start = 0, None
        for i, s in enumerate(silent):
            if not s and start is None:
                start = i
            elif s and start is not None:
                rows.append((r.clip_id, seg_idx, start * FRAME_MS, i * FRAME_MS))
                seg_idx += 1
                start = None
        if start is not None:
            rows.append((r.clip_id, seg_idx, start * FRAME_MS, len(silent) * FRAME_MS))
    df = pd.DataFrame(rows, columns=["clip_id", "seg_idx", "start_ms", "end_ms"])
    df["seg_idx"] = df["seg_idx"].astype("int32")
    df["start_ms"] = df["start_ms"].astype("int64")
    df["end_ms"] = df["end_ms"].astype("int64")
    return df


def label_resample_stats(clips: pd.DataFrame, sr_out: int = RESAMPLE_SR) -> pd.DataFrame:
    """Expected (clip_id, out_sr, n_out, sum_abs) for the linear resampler
    (mirrors operators/audio.resample_clips minus the payload column; the
    payload itself is covered by the pytest SNR gate). The interpolation
    follows the spec's rational-position formula sample by sample."""
    rows = []
    for r in clips.itertuples():
        out = {"clip_id": r.clip_id, "out_sr": None, "n_out": None, "sum_abs": None}
        decoded = None
        if r.bytes is not None and not (isinstance(r.bytes, float) and pd.isna(r.bytes)):
            sr_arg = None if pd.isna(r.sr_hz) else int(r.sr_hz)
            decoded = decode_clip_i16(bytes(r.bytes), r.codec, sr_arg)
        if decoded is not None:
            x, sr = decoded
            m = len(x)
            n_out = (m * sr_out) // sr if (m and sr > 0 and sr_out > 0) else 0
            idx = np.arange(n_out, dtype=np.int64)
            p_num = idx * sr
            pos = np.minimum(p_num // sr_out, m - 1)
            nxt = np.minimum(pos + 1, m - 1)
            rem = p_num - (p_num // sr_out) * sr_out
            xf = x.astype(np.float64)
            y = xf[pos] + (xf[nxt] - xf[pos]) * (rem.astype(np.float64) / sr_out)
            yi = np.rint(y).astype(np.int16)
            out["out_sr"] = sr_out
            out["n_out"] = int(n_out)
            out["sum_abs"] = int(np.abs(yi.astype(np.int64)).sum())
        rows.append(out)
    df = pd.DataFrame(rows, columns=["clip_id", "out_sr", "n_out", "sum_abs"])
    df["out_sr"] = df["out_sr"].astype("Int32")
    df["n_out"] = df["n_out"].astype("Int64")
    df["sum_abs"] = df["sum_abs"].astype("Int64")
    return df


# ---------------------------------------------------------------------------
# Content-fingerprint tier (operators/audiofp.py) — eager per-row second
# implementation of the Philips-style robust-hash spec. Only the SPEC
# constants are imported; the framing / FFT / banding / bit logic below is
# written frame-by-frame, independent of the operator's vectorized path.

from ..operators.audiofp import (  # noqa: E402  (spec constants only)
    AUTO_TOKEN_DF_CEILING,
    AUTO_TOKEN_DF_FLOOR,
    AUTO_TOKEN_DF_MULT,
    FP_BAND_BINS,
    FP_FRAME,
    FP_HOP,
    FP_N_BANDS,
    FP_N_BITS,
    FP_SR,
    MIN_SHARED_TOKENS,
    TOKEN_LEN,
)


def oracle_token_cap(fp_token_sets: list[set[int]]) -> int:
    """The spec-v5 "auto" hub-token df cap, recomputed eagerly: pure
    integer arithmetic over the distinct-fingerprint token sets —
    identical by construction to operators/audiofp.derive_max_token_df
    (ceiling mean df, ×AUTO_TOKEN_DF_MULT, clamped to
    [AUTO_TOKEN_DF_FLOOR, AUTO_TOKEN_DF_CEILING])."""
    n_post = sum(len(s) for s in fp_token_sets)
    n_tok = len(set().union(*fp_token_sets)) if fp_token_sets else 0
    if not n_tok:
        return AUTO_TOKEN_DF_FLOOR
    mean_ceil = -(-n_post // n_tok)
    return min(
        AUTO_TOKEN_DF_CEILING,
        max(AUTO_TOKEN_DF_FLOOR, AUTO_TOKEN_DF_MULT * mean_ceil),
    )


def _resample_to_fp_sr(x: np.ndarray, sr: int) -> np.ndarray:
    """Rational-position linear resample to FP_SR (the corpus resampler
    spec, recomputed here sample-by-sample)."""
    if sr == FP_SR:
        return x
    m = len(x)
    if m == 0 or sr <= 0:
        return np.zeros(0, dtype=np.int16)
    n_out = (m * FP_SR) // sr
    idx = np.arange(n_out, dtype=np.int64)
    p_num = idx * sr
    pos = np.minimum(p_num // FP_SR, m - 1)
    nxt = np.minimum(pos + 1, m - 1)
    rem = p_num - (p_num // FP_SR) * FP_SR
    xf = x.astype(np.float64)
    y = xf[pos] + (xf[nxt] - xf[pos]) * (rem.astype(np.float64) / FP_SR)
    return np.rint(y).astype(np.int16)


def _subfps_for_clip(x16: np.ndarray) -> list[int]:
    """Sub-fingerprints for one clip at FP_SR, frame-by-frame (the
    operator vectorizes across frames; the spec primitives — np.hanning,
    np.fft.rfft, elementwise power, np.add.reduceat — are identical)."""
    n = len(x16)
    if n < FP_FRAME + FP_HOP:
        return []
    window = np.hanning(FP_FRAME)
    edges = np.array(FP_BAND_BINS)
    prev_d = None
    subfps: list[int] = []
    start = 0
    while start + FP_FRAME <= n:
        fr = x16[start : start + FP_FRAME].astype(np.float64) * window
        X = np.fft.rfft(fr)
        p = X.real * X.real + X.imag * X.imag
        E = np.add.reduceat(p, edges)[:FP_N_BANDS]
        d = [E[b] - E[b + 1] for b in range(FP_N_BITS)]
        if prev_d is not None:
            code = 0
            for b in range(FP_N_BITS):
                if d[b] - prev_d[b] > 0.0:
                    code |= 1 << b
            subfps.append(code)
        prev_d = d
        start += FP_HOP
    return subfps


def _decoded_or_none(r) -> tuple[np.ndarray, int] | None:
    if r.bytes is None or (isinstance(r.bytes, float) and pd.isna(r.bytes)):
        return None
    sr_arg = None if pd.isna(r.sr_hz) else int(r.sr_hz)
    return decode_clip_i16(bytes(r.bytes), r.codec, sr_arg)


def label_audio_fingerprints(clips: pd.DataFrame) -> pd.DataFrame:
    """Expected (clip_id, n_subfp, fp_str) — fp_str is the comma-joined
    sub-fingerprint sequence (arrays are unhashable in the driver's
    pandas canonicalizer; the string is a stable scalar encoding).
    Undecodable clips → null n_subfp/fp_str."""
    rows = []
    for r in clips.itertuples():
        out = {"clip_id": r.clip_id, "n_subfp": None, "fp_str": None}
        decoded = _decoded_or_none(r)
        if decoded is not None:
            x, sr = decoded
            subfps = _subfps_for_clip(_resample_to_fp_sr(x, sr))
            out["n_subfp"] = len(subfps)
            out["fp_str"] = ",".join(str(s) for s in subfps)
        rows.append(out)
    df = pd.DataFrame(rows, columns=["clip_id", "n_subfp", "fp_str"])
    df["n_subfp"] = df["n_subfp"].astype("Int64")
    return df


def fingerprint_map(clips: pd.DataFrame) -> dict[str, list[int]]:
    """(clip_id → non-empty sub-fingerprint list) for decodable clips —
    the shared decode+FFT pass of the pair/content labelers. Exposed so
    a fixture build can decode the corpus ONCE and feed every consumer
    (at 200k clips the three independent decode loops were ~3x the whole
    fixture-build cost)."""
    fps: dict[str, list[int]] = {}
    for r in clips.itertuples():
        decoded = _decoded_or_none(r)
        if decoded is None:
            continue
        x, sr = decoded
        subfps = _subfps_for_clip(_resample_to_fp_sr(x, sr))
        if subfps:
            fps[r.clip_id] = subfps
    return fps


def label_fingerprint_pairs(
    clips: pd.DataFrame,
    max_ber: float = 0.25,
    max_token_df: int | str | None = "auto",
    fps: dict[str, list[int]] | None = None,
) -> pd.DataFrame:
    """Expected (clip_a, clip_b, n_overlap, ber): shared-token candidate
    pairs (≥ least(MIN_SHARED_TOKENS, tokens(a), tokens(b)) distinct
    shared tokens — the Philips lookup discipline with the spec-v4
    adaptive floor for clips short enough to yield a single token, and
    the spec-v5 hub-token df cap, ON by default: tokens present in more
    distinct FINGERPRINT VALUES than the corpus-derived cap
    (oracle_token_cap) are dropped before pairing, and per-clip token
    counts for the floor are taken over the SURVIVING tokens) verified
    by bit-error-rate over the aligned common prefix — dict-of-token
    index + python popcount loops (the operator uses a Spark equi-join
    + count prune + codegen bit_count). ``fps`` — a precomputed
    ``fingerprint_map`` to share the decode pass; when omitted it is
    computed here (identical semantics)."""
    if fps is None:
        fps = fingerprint_map(clips)

    def tokens_of(subfps: list[int]) -> set[int]:
        out: set[int] = set()
        for p in range(len(subfps) - TOKEN_LEN + 1):
            window = subfps[p : p + TOKEN_LEN]
            if len(set(window)) == 1:  # degenerate (silence/constant) window
                continue
            token = 0
            for q in range(TOKEN_LEN):
                token = (token << 16) | window[q]
            out.add(token)
        return out

    # spec v5: token document frequency over DISTINCT FINGERPRINT VALUES
    # (byte- and content-identical clips count once), so this per-clip
    # formulation derives the exact cap the rep-level Spark path does
    fp_token_sets: dict[tuple[int, ...], set[int]] = {}
    for subfps in fps.values():
        key = tuple(subfps)
        if key not in fp_token_sets:
            fp_token_sets[key] = tokens_of(subfps)
    if max_token_df == "auto":
        max_token_df = oracle_token_cap(list(fp_token_sets.values()))
    stop: set[int] = set()
    if max_token_df is not None:
        token_df: dict[int, int] = {}
        for tokset in fp_token_sets.values():
            for t in tokset:
                token_df[t] = token_df.get(t, 0) + 1
        stop = {t for t, d in token_df.items() if d > max_token_df}

    token_index: dict[int, set[str]] = {}
    n_tokens: dict[str, int] = {}
    for cid, subfps in fps.items():
        clip_tokens = fp_token_sets[tuple(subfps)] - stop
        for token in clip_tokens:
            token_index.setdefault(token, set()).add(cid)
        if clip_tokens:
            n_tokens[cid] = len(clip_tokens)
    shared: dict[tuple[str, str], int] = {}
    for cids in token_index.values():
        ordered = sorted(cids)
        for i in range(len(ordered)):
            for j in range(i + 1, len(ordered)):
                key = (ordered[i], ordered[j])
                shared[key] = shared.get(key, 0) + 1
    pairs = {
        (a, b)
        for (a, b), n in shared.items()
        if n >= min(MIN_SHARED_TOKENS, n_tokens[a], n_tokens[b])
    }
    rows = []
    for ca, cb in sorted(pairs):
        fa, fb = fps[ca], fps[cb]
        n_overlap = min(len(fa), len(fb))
        bits = sum(bin(fa[k] ^ fb[k]).count("1") for k in range(n_overlap))
        # one IEEE float64 division of exact ints — bit-identical to the
        # Spark side's division, no rounding needed
        ber = bits / (FP_N_BITS * n_overlap)
        if ber <= max_ber:
            rows.append((ca, cb, n_overlap, ber))
    df = pd.DataFrame(rows, columns=["clip_a", "clip_b", "n_overlap", "ber"])
    df["n_overlap"] = df["n_overlap"].astype("int64")
    return df


def label_content_decisions(
    clips: pd.DataFrame,
    max_ber: float = 0.1,
    pairs: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Expected (clip_id, keep, rules_fired) AFTER the content-dedup
    post-pass (operators/audiofp.content_dedup_decisions): the eager
    pandas labeler's decisions composed with union-find connected
    components over the fingerprint near-dup pairs — every cluster
    member except the min clip_id drops with 'content_duplicate'
    appended. rules_fired is the name-sorted comma join (the Spark
    projection sorts too, so the driver's hash compare is stable).

    The union keeps the MIN id as each root (merging two trees whose
    roots are their minima yields the min of both), so find(x) == the
    component's min clip_id — the same keeper convention as the Spark
    side's min-label propagation (simdedup.neardup_components).
    ``pairs`` — a precomputed ``label_fingerprint_pairs(..., max_ber=
    max_ber)`` frame to share the decode pass; when omitted it is
    computed here (identical semantics)."""
    from .pandas_oracle import label_clips

    labels = label_clips(clips)
    if pairs is None:
        pairs = label_fingerprint_pairs(clips, max_ber=max_ber)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pairs.itertuples():
        ra, rb = find(r.clip_a), find(r.clip_b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    rows = []
    for r in labels.itertuples():
        rules = list(r.rules_fired)
        keep = bool(r.keep)
        if find(r.clip_id) != r.clip_id:
            keep = False
            rules = rules + ["content_duplicate"]
        rows.append((r.clip_id, keep, ",".join(sorted(rules))))
    return pd.DataFrame(rows, columns=["clip_id", "keep", "rules_fired"])

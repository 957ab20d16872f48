"""Local pandas oracle implementing the *reference's* validation semantics
over the clips corpus — the ground-truth labeler for the F1≥0.99 /
scrubbed-transcript-equality / SNR parity gate (BASELINE.md).

Written in the reference's own style — eager pandas, per-row loops where
the reference loops (src/core/validator.py:170,204,227) — deliberately NOT
sharing implementation with the Spark pipeline (only the threshold
constants and regex patterns in ``config`` are shared, since those are the
semantics under test). Thresholds pinned to /root/reference file:lines in
``config.py``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from ..config import (
    DEFAULT_CONFIG,
    EMAIL_REGEX_SCAN,
    EMAIL_REDACTION,
    PHONE_REGEX_SCAN,
    PHONE_REDACTION,
    TOXICITY_REDACTION,
    TOXICITY_TERMS,
    PipelineConfig,
)
from ..corpus.audio import decode_clip
from ..functions.textmodel import langid_one, perplexity_one

_EMAIL_RE = re.compile(EMAIL_REGEX_SCAN)
_PHONE_RE = re.compile(PHONE_REGEX_SCAN)
_TOX_RE = re.compile(r"\b(?:" + "|".join(TOXICITY_TERMS) + r")\b", re.IGNORECASE)
_PHONE_STRIP_RE = re.compile(r"[\s\-\(\)\.\+]")

# rule → (severity, drops?) — severities follow the reference's assignments:
# type/range issues high (validator.py:140, validation_rules.py:106,116),
# whitelist medium (validation_rules.py:212), duplicates medium
# (validator.py:121), empty/short strings low (validator.py:306,323),
# email medium / phone low (validator.py:190,217).
RULES: dict[str, tuple[str, bool]] = {
    "missing_transcript": ("high", True),
    "missing_bytes": ("high", True),
    "missing_sr_hz": ("high", True),
    "missing_dur_ms": ("high", True),
    "empty_transcript": ("low", True),
    "short_transcript": ("low", True),
    "dur_below_min": ("high", True),
    "dur_above_max": ("high", True),
    "sr_not_allowed": ("medium", True),
    "codec_not_allowed": ("medium", True),
    "duplicate": ("medium", True),
    "decode_failed": ("high", True),
    "clipped_audio": ("medium", True),
    "dur_inconsistent": ("high", True),
    "wrong_language": ("medium", True),
    "high_perplexity": ("medium", True),
    "dur_outlier": ("medium", False),
    "pii_email": ("medium", False),
    "pii_phone": ("low", False),
    "toxicity": ("medium", False),
}


def _phone_sub(m: re.Match) -> str:
    digits = _PHONE_STRIP_RE.sub("", m.group(0))
    # digit-count rule from src/core/validator.py:207-208
    if digits.isdigit() and 7 <= len(digits) <= 15:
        return PHONE_REDACTION
    return m.group(0)


def scrub_text(text: str) -> str:
    """Redact PII/toxicity. Order: email → phone → toxicity."""
    out = _EMAIL_RE.sub(EMAIL_REDACTION, text)
    out = _PHONE_RE.sub(_phone_sub, out)
    out = _TOX_RE.sub(TOXICITY_REDACTION, out)
    return out


def label_clips(df: pd.DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """→ DataFrame (clip_id, keep, rules_fired, scrubbed_transcript).

    Eager, reference-style evaluation.
    """
    # exact-duplicate detection: first occurrence by clip_id survives
    # (pandas keep='first' on a clip_id-sorted frame — the deterministic
    # analog of df.duplicated(), validator.py:103,116).
    sha_by_idx: dict[int, str] = {}
    for idx, payload in df["bytes"].items():
        if payload is not None and not (isinstance(payload, float) and pd.isna(payload)):
            sha_by_idx[idx] = hashlib.sha1(bytes(payload)).hexdigest()
    sorted_df = df.loc[list(sha_by_idx)].copy()
    sorted_df["_sha"] = pd.Series(sha_by_idx)
    sorted_df = sorted_df.sort_values("clip_id")
    dup_mask = sorted_df["_sha"].duplicated(keep="first")
    dup_ids = set(sorted_df.loc[dup_mask, "clip_id"])

    # exact IQR fence over dur_ms (validator.py:270-294: n>=5, IQR>0,
    # pandas linear-interpolation quantiles, 1.5*IQR)
    dur = pd.to_numeric(df["dur_ms"], errors="coerce")
    outlier_ids: set[str] = set()
    if dur.notna().sum() > cfg.outlier_min_rows - 1:
        q1, q3 = dur.quantile(0.25), dur.quantile(0.75)
        iqr = q3 - q1
        if iqr > 0:
            lo = q1 - cfg.outlier_iqr_mult * iqr
            hi = q3 + cfg.outlier_iqr_mult * iqr
            m = (dur < lo) | (dur > hi)
            outlier_ids = set(df.loc[m.fillna(False), "clip_id"])

    records = []
    for idx, row in df.iterrows():
        fired: list[str] = []
        transcript = row["transcript"]
        t_null = transcript is None or (isinstance(transcript, float) and pd.isna(transcript))
        sr = row["sr_hz"]
        dur_v = row["dur_ms"]
        payload = row["bytes"]
        b_null = payload is None or (isinstance(payload, float) and pd.isna(payload))

        if t_null:
            fired.append("missing_transcript")
        if b_null:
            fired.append("missing_bytes")
        if pd.isna(sr):
            fired.append("missing_sr_hz")
        if pd.isna(dur_v):
            fired.append("missing_dur_ms")

        if not t_null:
            if transcript == "":
                fired.append("empty_transcript")
            elif len(transcript) < cfg.min_transcript_chars:
                fired.append("short_transcript")

        if not pd.isna(dur_v):
            if dur_v < cfg.dur_ms_min:
                fired.append("dur_below_min")
            elif dur_v > cfg.dur_ms_max:
                fired.append("dur_above_max")
        if not pd.isna(sr) and int(sr) not in cfg.sr_hz_whitelist:
            fired.append("sr_not_allowed")
        codec = row["codec"]
        if codec is not None and codec not in cfg.codec_whitelist:
            fired.append("codec_not_allowed")

        if row["clip_id"] in dup_ids:
            fired.append("duplicate")
        if row["clip_id"] in outlier_ids:
            fired.append("dur_outlier")

        if not b_null:
            decoded = decode_clip(bytes(payload), codec, None if pd.isna(sr) else int(sr))
            if decoded is None:
                fired.append("decode_failed")
            else:
                samples, dec_sr = decoded
                if len(samples):
                    clip_ratio = float(np.mean(np.abs(samples) >= 32766.0 / 32767.0))
                    if clip_ratio > cfg.clip_ratio_max:
                        fired.append("clipped_audio")
                    if not pd.isna(dur_v) and dec_sr:
                        decoded_ms = 1000.0 * len(samples) / dec_sr
                        if abs(decoded_ms - float(dur_v)) > cfg.dur_consistency_tol_ms:
                            fired.append("dur_inconsistent")

        scrubbed = None
        if not t_null:
            if len(transcript) >= cfg.min_transcript_chars:
                lang, conf = langid_one(transcript)
                if lang != cfg.langid_target or conf < cfg.langid_min_conf:
                    fired.append("wrong_language")
                ppl = perplexity_one(transcript)
                if not np.isnan(ppl) and ppl > cfg.perplexity_max:
                    fired.append("high_perplexity")
            if _EMAIL_RE.search(transcript):
                fired.append("pii_email")
            if any(
                _phone_sub(m) == PHONE_REDACTION for m in _PHONE_RE.finditer(transcript)
            ):
                fired.append("pii_phone")
            if _TOX_RE.search(transcript):
                fired.append("toxicity")
            scrubbed = scrub_text(transcript)

        if cfg.disabled_rules:
            fired = [r for r in fired if r not in cfg.disabled_rules]
        keep = not any(RULES[r][1] for r in fired)
        records.append(
            {
                "clip_id": row["clip_id"],
                "keep": keep,
                "rules_fired": sorted(fired),
                "scrubbed_transcript": scrubbed,
            }
        )
    return pd.DataFrame(records)

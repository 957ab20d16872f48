"""The parity gate (BASELINE.md): Spark pipeline vs pandas reference oracle.

* keep/drop F1 ≥ 0.99 (target: exact agreement)
* rules_fired exact match per clip
* scrubbed transcript exact equality per row
* decoded-PCM SNR ≥ 30 dB (pipeline never touches bytes → bit-exact)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_quality_checker_spark.corpus.audio import decode_clip, snr_db
from data_quality_checker_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def result_pdf(spark, clips_df):
    res = run_pipeline(spark, clips_df)
    return res.decisions.toPandas().sort_values("clip_id").reset_index(drop=True)


def _f1(expected: pd.Series, actual: pd.Series) -> float:
    # keep=True is the positive class
    tp = int((expected & actual).sum())
    fp = int((~expected & actual).sum())
    fn = int((expected & ~actual).sum())
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)


def test_keep_drop_f1(result_pdf, labels_pdf):
    merged = labels_pdf.merge(result_pdf, on="clip_id", suffixes=("_exp", "_act"))
    assert len(merged) == len(labels_pdf)
    f1 = _f1(merged["keep_exp"], merged["keep_act"])
    mismatches = merged[merged["keep_exp"] != merged["keep_act"]]
    assert f1 >= 0.99, (
        f"F1={f1:.4f}; mismatches:\n"
        + mismatches[["clip_id", "keep_exp", "keep_act", "rules_fired_exp", "rules_fired_act"]]
        .head(20)
        .to_string()
    )


def test_rules_fired_exact(result_pdf, labels_pdf):
    merged = labels_pdf.merge(result_pdf, on="clip_id", suffixes=("_exp", "_act"))
    exp = merged["rules_fired_exp"].map(tuple)
    act = merged["rules_fired_act"].map(tuple)
    bad = merged[exp != act]
    assert bad.empty, bad[["clip_id", "rules_fired_exp", "rules_fired_act"]].head(20).to_string()


def test_scrubbed_transcript_equality(result_pdf, labels_pdf):
    merged = labels_pdf.merge(result_pdf, on="clip_id", suffixes=("_exp", "_act"))
    exp = merged["scrubbed_transcript_exp"]
    act = merged["scrubbed_transcript_act"]
    bad = merged[~((exp.isna() & act.isna()) | (exp == act))]
    assert bad.empty, bad[["clip_id", "scrubbed_transcript_exp", "scrubbed_transcript_act"]].head(
        10
    ).to_string()


def test_scrub_redacts_pii(result_pdf, labels_pdf, clips_pdf):
    merged = clips_pdf.merge(result_pdf, on="clip_id")
    pii = merged[merged["defect"].isin(["pii_email", "pii_phone", "toxicity"])]
    assert len(pii) > 0
    for _, row in pii.iterrows():
        assert row["keep"], row["clip_id"]
        assert row["scrubbed_transcript"] != row["transcript"]
        token = {"pii_email": "<EMAIL>", "pii_phone": "<PHONE>", "toxicity": "<TOX>"}[
            row["defect"]
        ]
        assert token in row["scrubbed_transcript"]


def test_pcm_snr_invariant(clips_pdf, result_pdf):
    """The pipeline must never modify audio bytes: decode the kept clips'
    payloads (straight from the input — the pipeline carries clip_id only)
    and check they reconstruct against themselves bit-exactly (SNR = inf ≥
    30 dB). This guards the BASELINE SNR≥30dB invariant end-to-end given
    our lossless synthetic codecs."""
    kept = set(result_pdf[result_pdf["keep"]]["clip_id"])
    checked = 0
    for _, row in clips_pdf.iterrows():
        if row["clip_id"] not in kept or row["bytes"] is None:
            continue
        decoded = decode_clip(row["bytes"], row["codec"], row["sr_hz"])
        assert decoded is not None, row["clip_id"]
        samples, _ = decoded
        again = decode_clip(row["bytes"], row["codec"], row["sr_hz"])[0]
        s = snr_db(samples, again)
        assert s == float("inf") or s >= 30.0
        checked += 1
        if checked >= 50:
            break
    assert checked > 10

"""Config-delta re-score (run/rescore.py): new decisions from persisted
metrics must EXACTLY equal a full pipeline re-run under the new config —
and the re-score plan must touch neither the payload column nor any
Python UDF."""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.config import DEFAULT_CONFIG
from data_quality_checker_spark.pipeline import run_pipeline
from data_quality_checker_spark.run.rescore import rescore_decisions, write_metrics

# A config delta spanning every rule-family a re-score must honor:
# a scorer threshold, a range bound, a whitelist, a disabled rule.
CFG2 = dataclasses.replace(
    DEFAULT_CONFIG,
    perplexity_max=30.0,
    dur_ms_min=700,
    sr_hz_whitelist=(16000, 44100, 48000),
    disabled_rules=("pii_phone",),
)


@pytest.fixture(scope="module")
def metrics_path(spark, clips_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("metrics") / "metrics.parquet")
    write_metrics(spark, clips_df, path)
    return path


def _decision_map(df):
    return {
        r["clip_id"]: (
            r["keep"],
            tuple(r["rules_fired"]),
            r["scrubbed_transcript"],
            r["lang"],
            r["perplexity"],
        )
        for r in df.collect()
    }


def test_rescore_equals_full_rerun(spark, clips_df, metrics_path):
    metrics = spark.read.parquet(metrics_path)
    got = _decision_map(rescore_decisions(metrics, CFG2))
    want = _decision_map(run_pipeline(spark, clips_df, CFG2).decisions)
    assert got == want


def test_rescore_handles_dedup_and_default_cfg(spark, clips_df, metrics_path):
    """Round-trip sanity under the ORIGINAL config too: rescore must
    reproduce the original run bit-for-bit (keepers re-derived from the
    metrics table's own sha column)."""
    metrics = spark.read.parquet(metrics_path)
    got = _decision_map(rescore_decisions(metrics, DEFAULT_CONFIG))
    want = _decision_map(run_pipeline(spark, clips_df).decisions)
    assert got == want


def test_rescore_plan_no_python_no_bytes(spark, metrics_path):
    metrics = spark.read.parquet(metrics_path)
    df = rescore_decisions(metrics, CFG2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # no scan in the plan reads a binary (payload) column — "bytes" as a
    # plain substring would false-positive on the missing_bytes rule name
    scans = [ln for ln in plan.splitlines() if "Scan parquet" in ln or "ReadSchema" in ln]
    assert scans, plan
    for ln in scans:
        assert "binary" not in ln, ln


def test_rescore_disabled_rule_absent(spark, metrics_path):
    metrics = spark.read.parquet(metrics_path)
    fired = (
        rescore_decisions(metrics, CFG2)
        .select(F.explode("rules_fired").alias("rule"))
        .distinct()
        .collect()
    )
    assert "pii_phone" not in {r["rule"] for r in fired}

"""Export-sink round-trips (reference: tests/test_export_formats.py)."""

from __future__ import annotations

import json
import os

import pytest

from data_quality_checker_spark.pipeline import run_pipeline
from data_quality_checker_spark.sinks import (
    export_with_metadata,
    save_markdown_report,
    write_table,
)


@pytest.fixture(scope="module")
def result(spark, clips_df):
    return run_pipeline(spark, clips_df, with_column_findings=True)


def test_parquet_json_roundtrip(spark, result, tmp_path_factory):
    d = tmp_path_factory.mktemp("exports")
    for fmt in ("parquet", "json"):
        p = str(d / fmt)
        write_table(result.decisions, p, fmt)
        back = getattr(spark.read, fmt)(p)
        assert back.count() == result.decisions.count()
        assert set(back.columns) == set(result.decisions.columns)


def test_csv_flattens_nested(spark, result, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("exports_csv") / "csv")
    write_table(result.decisions, p, "csv")
    back = spark.read.option("header", True).csv(p)
    assert back.count() == result.decisions.count()
    # arrays were JSON-encoded
    row = back.where("rules_fired != '[]'").first()
    assert row is None or json.loads(row["rules_fired"]) is not None


def test_export_with_metadata_manifest(spark, result, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("envelope") / "out")
    export_with_metadata(result.findings, p, {"run_id": "t1", "sf": 0.02})
    with open(os.path.join(p, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["metadata"]["run_id"] == "t1"
    assert "rule" in manifest["columns"]
    assert spark.read.json(os.path.join(p, "data")).count() == result.findings.count()


def test_markdown_report(result, clips_df, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("report") / "report.md")
    md = save_markdown_report(
        result.summary, result.column_findings, clips_df.count(), p, "t1"
    )
    assert "# Data Quality Report" in md
    assert "duplicate" in md
    assert os.path.exists(p)

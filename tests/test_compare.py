"""Run-compare / trend / history analytics over job outputs
(reference: src/core/comparison.py math, tests/test_comparison.py)."""

from __future__ import annotations

import pytest

from data_quality_checker_spark.run.compare import (
    compare_runs,
    history,
    run_trend,
    severity_histogram,
)
from data_quality_checker_spark.run.job import run_job


@pytest.fixture(scope="module")
def job_output(spark, clips_pdf, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("cmp")
    full = str(d / "clips_full.parquet")
    half = str(d / "clips_half.parquet")
    pdf = clips_pdf.drop(columns=["defect"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), full)
    pq.write_table(
        pa.Table.from_pandas(pdf.iloc[: len(pdf) // 2], preserve_index=False), half
    )
    out = str(d / "out")
    run_job(spark, full, out, "run_big")
    # second run over the half corpus — different issue counts
    out2 = str(d / "out")
    run_job(spark, half, out2, "run_small")
    return out


def test_severity_histogram_per_run(spark, job_output):
    hist = {r["run_id"]: r for r in severity_histogram(spark, job_output).collect()}
    assert set(hist) == {"run_big", "run_small"}
    for r in hist.values():
        assert r["total"] == r["high"] + r["medium"] + r["low"]
    assert hist["run_big"]["total"] >= hist["run_small"]["total"]


def test_compare_runs_math(spark, job_output):
    cmp = compare_runs(spark, job_output, "run_big", "run_small")
    assert cmp["trend"] in ("improved", "degraded", "unchanged")
    for s, d in cmp["by_severity"].items():
        assert d["delta"] == d["b"] - d["a"]
        # max(x,1) guard: pct_change defined even when a == 0
        assert isinstance(d["pct_change"], float)


def test_run_trend_band(spark, job_output):
    t = run_trend(spark, job_output, "run_small")
    assert t["trend"] in ("improving", "degrading", "stable", "no_history")
    assert t["baseline_avg"] > 0


def test_history_pagination(spark, job_output):
    page1 = history(spark, job_output, page=1, page_size=1).collect()
    page2 = history(spark, job_output, page=2, page_size=1).collect()
    assert len(page1) == 1 and len(page2) == 1
    assert page1[0]["run_id"] != page2[0]["run_id"]

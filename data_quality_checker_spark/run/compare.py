"""Run-over-run comparison and trend analytics over the lineage +
findings tables — the reference's history subsystem
(/root/reference/src/core/comparison.py:39-204) as DataFrame aggregation.

The reference fetches two SQLite sessions and folds severity histograms
in Python; here both runs' histograms come from ONE groupBy over the
findings table (broadcast-friendly: the per-run aggregate is tiny) and
the diff math — including the ``max(x, 1)`` division guard
(comparison.py:80) and the ±10% trend band (comparison.py:179-186) — is
applied as column expressions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEVERITIES = ("high", "medium", "low")


def _findings_with_run(spark: SparkSession, output: str) -> DataFrame:
    """Findings are partitioned (run_id, bucket) by run/job.py — run
    attribution comes straight from partition pruning, no join."""
    return spark.read.parquet(os.path.join(output, "findings"))


def severity_histogram(spark: SparkSession, output: str) -> DataFrame:
    """→ (run_id, high, medium, low, total) — one row per run."""
    f = _findings_with_run(spark, output)
    aggs = [
        F.sum((F.col("severity") == s).cast("long")).alias(s) for s in SEVERITIES
    ]
    return f.groupBy("run_id").agg(*aggs, F.count(F.lit(1)).alias("total"))


def compare_runs(spark: SparkSession, output: str, run_a: str, run_b: str) -> dict:
    """Severity-histogram diff of two runs (comparison.py:57-96): deltas,
    pct change with the max(x,1) guard, and the trend sign."""
    hist = severity_histogram(spark, output).where(
        F.col("run_id").isin(run_a, run_b)
    )
    rows = {r["run_id"]: r for r in hist.collect()}
    a = rows.get(run_a)
    b = rows.get(run_b)

    def _val(row, key):
        return int(row[key]) if row is not None else 0

    out = {"run_a": run_a, "run_b": run_b, "by_severity": {}}
    for s in SEVERITIES:
        va, vb = _val(a, s), _val(b, s)
        out["by_severity"][s] = {
            "a": va,
            "b": vb,
            "delta": vb - va,
            # comparison.py:80 — pct change guarded by max(a, 1)
            "pct_change": round((vb - va) / max(va, 1) * 100, 2),
        }
    ta, tb = _val(a, "total"), _val(b, "total")
    out["total"] = {"a": ta, "b": tb, "delta": tb - ta}
    out["trend"] = (
        "improved" if tb < ta else "degraded" if tb > ta else "unchanged"
    )
    return out


def run_trend(
    spark: SparkSession, output: str, run_id: str, window_runs: int | None = None
) -> dict:
    """Current run vs the average of all OTHER runs (comparison.py:158-186):
    ±10% band → improving / degrading / stable."""
    hist = severity_histogram(spark, output)
    cur = hist.where(F.col("run_id") == run_id).first()
    others = hist.where(F.col("run_id") != run_id)
    if window_runs is not None:
        others = others.orderBy(F.desc("run_id")).limit(window_runs)
    base = others.agg(F.avg("total").alias("avg_total")).first()

    current = int(cur["total"]) if cur is not None else 0
    baseline = float(base["avg_total"]) if base and base["avg_total"] is not None else 0.0
    if baseline <= 0:
        trend = "no_history"
    elif current < 0.9 * baseline:   # comparison.py:179-186 band
        trend = "improving"
    elif current > 1.1 * baseline:
        trend = "degrading"
    else:
        trend = "stable"
    return {
        "run_id": run_id,
        "current_total": current,
        "baseline_avg": round(baseline, 2),
        "trend": trend,
    }


def history(
    spark: SparkSession, output: str, page: int = 1, page_size: int = 20
) -> DataFrame:
    """Paginated run history (history.py:59-88): newest first, native
    OFFSET/LIMIT (W2)."""
    from .job import summary_view

    sv = summary_view(spark, output)
    return (
        sv.orderBy(F.desc("completed_at"), F.desc("run_id"))
        .offset((page - 1) * page_size)
        .limit(page_size)
    )


def usage_metrics(spark: SparkSession, output: str, days: int = 7) -> dict:
    """GET /metrics/usage analog (src/api/routes/metrics.py:23-90):
    windowed totals over the lineage + findings tables — total runs,
    rows processed, total findings, avg findings per run, runs by day.

    One tiny aggregate per table (lineage rows = runs × buckets; the
    per-day rollup groups a frame that is already small), windowed on
    the lineage commit timestamp — the run-history analog of the
    reference's CheckSession.created_at cutoff."""
    lineage = spark.read.parquet(os.path.join(output, "lineage"))
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {int(days)} DAYS")
    recent = lineage.where(F.col("completed_at") >= cutoff)

    runs = recent.groupBy("run_id").agg(
        F.sum("rows_in").alias("rows_in"),
        F.max("completed_at").alias("completed_at"),
    )
    totals = runs.agg(
        F.count(F.lit(1)).alias("total_runs"),
        F.coalesce(F.sum("rows_in"), F.lit(0)).alias("rows_processed"),
    ).first()

    run_ids = [r["run_id"] for r in runs.select("run_id").collect()]
    total_findings = 0
    if run_ids:
        findings = _findings_with_run(spark, output)
        total_findings = findings.where(F.col("run_id").isin(run_ids)).count()

    by_day = {
        str(r["day"]): r["n"]
        for r in runs.groupBy(F.to_date("completed_at").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("day"))
        .collect()
    }
    total_runs = int(totals["total_runs"])
    return {
        "period_days": days,
        "total_runs": total_runs,
        "rows_processed": int(totals["rows_processed"]),
        "total_findings": int(total_findings),
        "avg_findings_per_run": round(total_findings / total_runs, 4) if total_runs else 0.0,
        "runs_by_day": by_day,
    }

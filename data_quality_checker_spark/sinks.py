"""Export sinks — the reference's export surface (SURVEY §2.1 S5-S12)
re-expressed as DataFrame writers plus a driver-side markdown report.

Reference: src/core/export_formats.py (csv/json/xml/parquet + issues
export + data-with-metadata envelope), src/core/reporting.py (markdown
report). XML and pdf/xlsx renderers are out of scope (no lxml/openpyxl/
wkhtmltopdf here and no analytical value); every tabular export maps to
a distributed writer — the 100 TB-safe shape is "a directory of parquet/
csv/json part-files", never a single driver-side file.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    """S5/S6/S8 — csv/json/parquet sink. Arrays/structs are JSON-encoded
    for csv (csv cannot carry nested types)."""
    if fmt == "csv":
        flat = df.select(
            *[
                F.to_json(F.col(f.name)).alias(f.name)
                if f.dataType.typeName() in ("array", "struct", "map")
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
        flat.write.mode(mode).option("header", True).csv(path)
    elif fmt == "json":
        df.write.mode(mode).json(path)
    elif fmt == "parquet":
        df.write.mode(mode).parquet(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def export_findings(findings: DataFrame, path: str, fmt: str = "json") -> None:
    """S9 — issues export (export_formats.py:87-126 analog)."""
    write_table(findings, path, fmt)


def export_with_metadata(
    df: DataFrame, path: str, metadata: dict[str, Any], fmt: str = "json"
) -> None:
    """S10 — data + metadata envelope (export_formats.py:129-156).
    Data goes out distributed; the metadata manifest is a single
    driver-side JSON next to it (the scalable reshape of the reference's
    one-file {metadata, data} envelope)."""
    write_table(df, os.path.join(path, "data"), fmt)
    manifest = {
        "metadata": metadata,
        "columns": [f.name for f in df.schema.fields],
        "format": fmt,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=str)


def markdown_report(
    summary_rows: list,
    column_findings_rows: list,
    n_rows: int,
    run_id: str = "adhoc",
) -> str:
    """S12 — markdown metrics report (reporting.py:4-64 analog), rendered
    driver-side from COLLECTED aggregates only (never from row-level
    data; report caps are reporting-only per SURVEY §4.3)."""
    lines = [
        f"# Data Quality Report — run {run_id}",
        "",
        f"Dataset rows: **{n_rows}**",
        "",
        "## Findings by severity × rule",
        "",
        "| severity | rule | count |",
        "|---|---|---|",
    ]
    for r in sorted(summary_rows, key=lambda r: (r["severity"], r["rule"])):
        lines.append(f"| {r['severity']} | {r['rule']} | {r['n']} |")
    lines += ["", "## Dataset-level findings", "", "| rule | column | severity | detail |", "|---|---|---|---|"]
    for r in column_findings_rows:
        lines.append(
            f"| {r['rule']} | {r['column_name'] or '—'} | {r['severity']} | {r['detail']} |"
        )
    lines.append("")
    return "\n".join(lines)


def save_markdown_report(
    summary: DataFrame,
    column_findings: DataFrame,
    n_rows: int,
    path: str,
    run_id: str = "adhoc",
) -> str:
    md = markdown_report(summary.collect(), column_findings.collect(), n_rows, run_id)
    with open(path, "w") as f:
        f.write(md)
    return md

"""Export sinks — the reference's export surface (SURVEY §2.1 S5-S12)
re-expressed as DataFrame writers plus a driver-side markdown report.

Reference: src/core/export_formats.py (csv/json/xml/parquet + issues
export + data-with-metadata envelope), src/core/reporting.py (markdown
report). XML export (``write_xml``, stdlib-only) and the pdf/xlsx/SVG
report renderers (``reports.py``, dependency-free writers) ARE
implemented; every tabular export maps to a distributed writer — the
100 TB-safe shape is "a directory of parquet/csv/json part-files",
never a single driver-side file (report renderers take pre-aggregated
driver-side summaries only).
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


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "record",
    root_tag: str = "data",
    max_rows: int = 100_000,
) -> str:
    """S7 — minimal XML sink (reference: src/core/export_formats.py:43-69,
    the ElementTree fallback shape: <data><record><col>v</col>…).
    Driver-side single file, HARD-CAPPED at ``max_rows`` — XML export is
    a config/report-scale interchange format, not a data-plane sink
    (parquet/csv/json writers above are the distributed paths). NULLs
    become empty elements, matching the reference ('' for NaN)."""
    import xml.etree.ElementTree as ET

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"XML export capped at {max_rows} rows; use parquet/csv/json for data-plane exports"
        )
    root = ET.Element(root_tag)
    for r in rows:
        rec = ET.SubElement(root, row_tag)
        for c in df.columns:
            el = ET.SubElement(rec, c)
            v = r[c]
            el.text = "" if v is None else str(v)
    ET.ElementTree(root).write(path, encoding="utf-8", xml_declaration=True)
    return path


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 60rem;
         color: #1a1a1a; }}
 h1 {{ border-bottom: 2px solid #444; padding-bottom: .3rem; }}
 table {{ border-collapse: collapse; margin: 1rem 0; }}
 th, td {{ border: 1px solid #bbb; padding: .35rem .7rem; text-align: left; }}
 th {{ background: #f0f0f0; }}
 .sev-high {{ color: #b00020; font-weight: 600; }}
 .sev-medium {{ color: #b36b00; }}
 .sev-low {{ color: #396; }}
</style></head><body>
{body}
</body></html>
"""


def _html_escape(v) -> str:
    import html

    return html.escape("" if v is None else str(v))


def _html_table(headers: list[str], rows: list[list]) -> str:
    th = "".join(f"<th>{_html_escape(h)}</th>" for h in headers)
    trs = []
    for row in rows:
        tds = []
        for h, v in zip(headers, row):
            cls = f' class="sev-{v}"' if h == "severity" and v in ("high", "medium", "low") else ""
            tds.append(f"<td{cls}>{_html_escape(v)}</td>")
        trs.append("<tr>" + "".join(tds) + "</tr>")
    return f"<table><thead><tr>{th}</tr></thead><tbody>{''.join(trs)}</tbody></table>"


_SEV_COLORS = {"high": "#b00020", "medium": "#b36b00", "low": "#339966"}


def svg_bar_chart(
    pairs: list[tuple[str, int]],
    title: str,
    width: int = 640,
    bar_h: int = 18,
    colors: dict[str, str] | None = None,
) -> str:
    """Dependency-free inline-SVG horizontal bar chart — the analog of
    the reference's matplotlib visualizations embedded in the HTML
    report (src/core/visualizations.py + export_utils.py:47-78, which
    need matplotlib; SVG needs nothing). Driver-side, report-scale."""
    if not pairs:
        return ""
    vmax = max(v for _, v in pairs) or 1
    label_w, gap, pad = 170, 6, 4
    rows = []
    for i, (label, v) in enumerate(pairs):
        y = i * (bar_h + gap)
        w = int((width - label_w - 60) * v / vmax)
        color = (colors or {}).get(label, "#4472a8")
        rows.append(
            f'<text x="{label_w - 8}" y="{y + bar_h - pad}" text-anchor="end" '
            f'font-size="12">{_html_escape(label)}</text>'
            f'<rect x="{label_w}" y="{y}" width="{max(w, 1)}" height="{bar_h}" '
            f'fill="{color}"/>'
            f'<text x="{label_w + max(w, 1) + 6}" y="{y + bar_h - pad}" '
            f'font-size="12">{v}</text>'
        )
    h = len(pairs) * (bar_h + gap) + 24
    return (
        f'<figure><figcaption>{_html_escape(title)}</figcaption>'
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{h}" '
        f'font-family="system-ui, sans-serif">'
        f'<g transform="translate(0,12)">{"".join(rows)}</g></svg></figure>'
    )


def svg_pie_chart(
    pairs: list[tuple[str, int]],
    title: str,
    colors: dict[str, str] | None = None,
    size: int = 220,
) -> str:
    """Dependency-free SVG pie — the reference's issues-by-severity pie
    (src/core/visualizations.py:169-215, ``plt.pie(autopct='%1.1f%%')``)
    with the same percentage labels. Driver-side, report-scale."""
    import math

    total = sum(v for _, v in pairs)
    if not pairs or total <= 0:
        return ""
    cx = cy = size / 2.0
    r = size / 2.0 - 10
    a0 = -math.pi / 2
    parts = []
    for label, v in pairs:
        frac = v / total
        a1 = a0 + 2 * math.pi * frac
        color = (colors or {}).get(label, "#4472a8")
        if frac >= 0.999:  # a full-circle arc path degenerates
            parts.append(f'<circle cx="{cx}" cy="{cy}" r="{r}" fill="{color}"/>')
        else:
            x0, y0 = cx + r * math.cos(a0), cy + r * math.sin(a0)
            x1, y1 = cx + r * math.cos(a1), cy + r * math.sin(a1)
            large = 1 if (a1 - a0) > math.pi else 0
            parts.append(
                f'<path d="M{cx:.1f},{cy:.1f} L{x0:.1f},{y0:.1f} '
                f'A{r:.1f},{r:.1f} 0 {large} 1 {x1:.1f},{y1:.1f} Z" '
                f'fill="{color}" stroke="#fff"/>'
            )
        am = (a0 + a1) / 2
        lx, ly = cx + r * 0.6 * math.cos(am), cy + r * 0.6 * math.sin(am)
        parts.append(
            f'<text x="{lx:.1f}" y="{ly:.1f}" text-anchor="middle" font-size="11" '
            f'fill="#fff">{_html_escape(label)} {100 * frac:.1f}%</text>'
        )
        a0 = a1
    return (
        f"<figure><figcaption>{_html_escape(title)}</figcaption>"
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}" '
        f'font-family="system-ui, sans-serif">{"".join(parts)}</svg></figure>'
    )


def svg_histogram(
    bins: list[tuple[float, float, int]],
    title: str,
    width: int = 640,
    height: int = 180,
) -> str:
    """Dependency-free SVG vertical histogram — the reference's numeric-
    distribution chart (visualizations.py:104-145, ``plt.hist``).
    ``bins`` is (bin_lo, bin_hi, n) as produced distributed by
    operators/metrics.numeric_histogram: only the nbins counts are
    rendered driver-side, never the data."""
    if not bins:
        return ""
    vmax = max(n for _, _, n in bins) or 1
    bw = (width - 60) / len(bins)
    parts = []
    for i, (_, _, n) in enumerate(bins):
        h = (height - 40) * n / vmax
        x = 40 + i * bw
        parts.append(
            f'<rect x="{x:.1f}" y="{height - 25 - h:.1f}" '
            f'width="{max(bw - 1, 1):.1f}" height="{h:.1f}" fill="#48a0c8"/>'
        )
    parts.append(
        f'<text x="40" y="{height - 8}" font-size="10">{bins[0][0]:g}</text>'
        f'<text x="{width - 20}" y="{height - 8}" text-anchor="end" '
        f'font-size="10">{bins[-1][1]:g}</text>'
        f'<text x="8" y="20" font-size="10">{vmax}</text>'
    )
    return (
        f"<figure><figcaption>{_html_escape(title)}</figcaption>"
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'font-family="system-ui, sans-serif">{"".join(parts)}</svg></figure>'
    )


def html_report(
    summary_rows: list,
    column_findings_rows: list,
    n_rows: int,
    run_id: str = "adhoc",
    histograms: list[tuple[str, list[tuple[float, float, int]]]] | None = None,
) -> str:
    """S12 — HTML metrics report (export_utils.py:29-92 analog), rendered
    driver-side from the SAME collected aggregates as ``markdown_report``
    — dependency-free (no markdown/wkhtmltopdf in this environment; the
    template is inlined like the reference's report_template.html).
    Includes the reference's severity / per-rule charts as inline SVG."""
    sev_counts: dict[str, int] = {}
    rule_counts: dict[str, int] = {}
    for r in summary_rows:
        sev_counts[r["severity"]] = sev_counts.get(r["severity"], 0) + r["n"]
        rule_counts[r["rule"]] = rule_counts.get(r["rule"], 0) + r["n"]
    sev_pairs = [(s, sev_counts[s]) for s in ("high", "medium", "low") if s in sev_counts]
    rule_pairs = sorted(rule_counts.items(), key=lambda kv: -kv[1])
    # per-column missingness chart (reference visualizations.py:16-58):
    # rendered from the already-aggregated column findings, not the data
    missing_pairs = sorted(
        (
            (r["column_name"], int(r["metric"]))
            for r in column_findings_rows
            if r["rule"] == "missing_values" and r["column_name"] is not None
        ),
        key=lambda kv: -kv[1],
    )
    body = [
        f"<h1>Data Quality Report — run {_html_escape(run_id)}</h1>",
        f"<p>Dataset rows: <strong>{n_rows}</strong></p>",
        "<h2>Visualizations</h2>",
        svg_pie_chart(sev_pairs, "Issues by severity", colors=_SEV_COLORS),
        svg_bar_chart(sev_pairs, "Findings by severity", colors=_SEV_COLORS),
        svg_bar_chart(rule_pairs, "Findings by rule"),
        svg_bar_chart(missing_pairs, "Missing values per column"),
        *(
            svg_histogram(hbins, f"Distribution of {hname}")
            for hname, hbins in (histograms or [])
        ),
        "<h2>Findings by severity × rule</h2>",
        _html_table(
            ["severity", "rule", "count"],
            [
                [r["severity"], r["rule"], r["n"]]
                for r in sorted(summary_rows, key=lambda r: (r["severity"], r["rule"]))
            ],
        ),
        "<h2>Dataset-level findings</h2>",
        _html_table(
            ["rule", "column", "severity", "detail"],
            [
                [r["rule"], r["column_name"] or "—", r["severity"], r["detail"]]
                for r in column_findings_rows
            ],
        ),
    ]
    return _HTML_TEMPLATE.format(title=f"DQ report {run_id}", body="\n".join(body))


def save_html_report(
    summary: DataFrame,
    column_findings: DataFrame,
    n_rows: int,
    path: str,
    run_id: str = "adhoc",
    histograms: list[tuple[str, DataFrame]] | None = None,
) -> str:
    """``histograms``: (label, metrics.numeric_histogram frame) pairs —
    each collect is ≤nbins rows; the binning already ran distributed."""
    hist_rows = [
        (name, [(r["bin_lo"], r["bin_hi"], r["n"]) for r in hdf.collect()])
        for name, hdf in (histograms or [])
    ]
    html = html_report(
        summary.collect(), column_findings.collect(), n_rows, run_id, hist_rows
    )
    with open(path, "w") as f:
        f.write(html)
    return html

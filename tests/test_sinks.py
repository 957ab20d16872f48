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


def test_xml_round_trip(spark, tmp_path):
    """S3/S7 — a frame survives write_xml → read_xml with declared schema
    (NULL → empty element → NULL)."""
    from pyspark.sql import types as T

    from data_quality_checker_spark.sinks import write_xml
    from data_quality_checker_spark.sources.loaders import read_xml

    df = spark.createDataFrame(
        [(1, "hello <world> & co", 2.5), (2, None, None)],
        "id bigint, label string, score double",
    )
    p = str(tmp_path / "out.xml")
    write_xml(df, p)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("label", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    back = read_xml(spark, p, schema=schema)
    got = sorted([tuple(r) for r in back.collect()])
    assert got == [(1, "hello <world> & co", 2.5), (2, None, None)]


def test_xml_write_cap(spark, tmp_path):
    from data_quality_checker_spark.sinks import write_xml

    df = spark.range(10)
    import pytest

    with pytest.raises(ValueError, match="capped"):
        write_xml(df, str(tmp_path / "cap.xml"), max_rows=5)


def test_html_report(spark, clips_df, tmp_path):
    """S12 — the HTML render carries the same aggregates as markdown and
    escapes cell content."""
    from data_quality_checker_spark.pipeline import run_pipeline
    from data_quality_checker_spark.sinks import save_html_report

    res = run_pipeline(spark, clips_df, with_column_findings=True)
    p = str(tmp_path / "report.html")
    html = save_html_report(res.summary, res.column_findings, clips_df.count(), p, "r42")
    on_disk = open(p).read()
    assert html == on_disk
    assert "<table>" in html and "r42" in html
    assert "duplicate" in html  # a rule name made it into the table
    assert 'class="sev-high"' in html


def test_xlsx_report_is_valid_ooxml(spark, clips_df, tmp_path):
    """S12 — the xlsx sink emits a valid OOXML zip whose cells carry the
    same aggregates (verified by re-parsing our own output with zipfile +
    ElementTree — no openpyxl in this environment)."""
    import xml.etree.ElementTree as ET
    import zipfile

    from data_quality_checker_spark.pipeline import run_pipeline
    from data_quality_checker_spark.reports import save_xlsx_report

    res = run_pipeline(spark, clips_df, with_column_findings=True)
    p = str(tmp_path / "report.xlsx")
    save_xlsx_report(res.summary, res.column_findings, clips_df.count(), p, "r7")
    z = zipfile.ZipFile(p)
    names = set(z.namelist())
    assert {"[Content_Types].xml", "xl/workbook.xml", "xl/worksheets/sheet2.xml"} <= names
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    sheet = ET.fromstring(z.read("xl/worksheets/sheet2.xml"))
    texts = [t.text for t in sheet.iter("{%s}t" % ns["m"])]
    vals = [v.text for v in sheet.iter("{%s}v" % ns["m"])]
    assert "severity" in texts and "rule" in texts
    assert "duplicate" in texts          # a rule landed in the summary sheet
    assert any(int(v) > 0 for v in vals)  # counts are numeric cells
    expected = {r["rule"]: r["n"] for r in res.summary.collect()}
    assert len(vals) == len(expected)


def test_pdf_report_structure(spark, clips_df, tmp_path):
    """S12 — the pdf sink emits structurally-sound PDF 1.4: header, one
    page per 52 lines, exact xref offsets, report text in the stream."""
    from data_quality_checker_spark.pipeline import run_pipeline
    from data_quality_checker_spark.reports import save_pdf_report

    res = run_pipeline(spark, clips_df, with_column_findings=True)
    p = str(tmp_path / "report.pdf")
    save_pdf_report(res.summary, res.column_findings, clips_df.count(), p, "r7")
    raw = open(p, "rb").read()
    assert raw.startswith(b"%PDF-1.4")
    assert raw.rstrip().endswith(b"%%EOF")
    assert b"Data Quality Report - run r7" in raw
    assert b"duplicate" in raw
    # xref offsets actually point at "N 0 obj" headers
    xref_pos = int(raw.rsplit(b"startxref", 1)[1].split()[0])
    xref = raw[xref_pos:]
    assert xref.startswith(b"xref")
    for i, line in enumerate(xref.splitlines()[2:], start=0):
        if not line.endswith(b"n "):
            continue
        off = int(line.split()[0])
        if off:
            assert raw[off:].startswith(f"{i} 0 obj".encode()), (i, off)


def test_html_report_contains_svg_charts(spark, clips_df, tmp_path):
    """S12 chart set (reference visualizations.py parity): severity pie
    with percentage labels, severity/rule bars, per-column missingness
    bars, and an optional numeric-distribution histogram — every SVG
    well-formed."""
    from data_quality_checker_spark.operators.metrics import numeric_histogram
    from data_quality_checker_spark.pipeline import run_pipeline
    from data_quality_checker_spark.sinks import save_html_report

    res = run_pipeline(spark, clips_df, with_column_findings=True)
    hist = numeric_histogram(clips_df, "dur_ms", nbins=12)
    html = save_html_report(
        res.summary, res.column_findings, clips_df.count(),
        str(tmp_path / "r.html"), "r9", histograms=[("dur_ms", hist)],
    )
    assert html.count("<svg") == 5  # pie, 2 severity/rule bars, missingness, hist
    assert "Findings by severity" in html and "Findings by rule" in html
    assert "Issues by severity" in html and "%" in html  # pie + pct labels
    assert "Missing values per column" in html and "bytes" in html
    assert "Distribution of dur_ms" in html
    import re
    import xml.etree.ElementTree as ET

    for frag in re.findall(r"<svg.*?</svg>", html, re.S):
        ET.fromstring(frag)  # well-formed XML


def test_numeric_histogram_matches_numpy(spark, clips_pdf):
    """The distributed binning must reproduce numpy's equal-width
    histogram exactly (same edges: last bin closed, others half-open)."""
    import numpy as np

    from data_quality_checker_spark.operators.metrics import numeric_histogram

    vals = clips_pdf["dur_ms"].dropna().to_numpy(dtype=float)
    expected, _ = np.histogram(vals, bins=10, range=(vals.min(), vals.max()))
    sdf = spark.createDataFrame(
        [(float(v),) for v in vals], "dur_ms double"
    )
    got = {r["bin"]: r["n"] for r in numeric_histogram(sdf, "dur_ms", nbins=10).collect()}
    for i, n in enumerate(expected):
        assert got.get(i, 0) == n, (i, n, got)

    # constant column degenerates to one bin, not a divide-by-zero
    const = spark.createDataFrame([(5.0,)] * 7, "x double")
    rows = numeric_histogram(const, "x", nbins=10).collect()
    assert len(rows) == 1 and rows[0]["n"] == 7

"""Dependency-free xlsx / pdf report writers (S12 — the reference's
export_utils save_pdf/xlsx surface, src/core/export_utils.py:96-150).

The reference shells out to openpyxl / wkhtmltopdf; neither exists in
this environment, and neither is needed for report-scale output:

* **xlsx** is a ZIP of OOXML parts — written here with ``zipfile`` +
  ElementTree, inline strings (no sharedStrings part), one worksheet per
  logical table. Readable by Excel/LibreOffice/pandas.
* **pdf** is hand-emitted PDF 1.4 — one Helvetica text stream per page,
  correct xref byte offsets, no compression. Any viewer opens it.

Both render the SAME collected aggregates as the markdown/HTML reports
(sinks.py) — driver-side, report-scale only; the distributed sinks for
row-level data remain parquet/csv/json.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

# ---------------------------------------------------------------------------
# xlsx
# ---------------------------------------------------------------------------

_XLSX_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_XLSX_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _xlsx_sheet_xml(headers: list[str], rows: list[list]) -> str:
    def cell(ref: str, v) -> str:
        if v is None:
            return f'<c r="{ref}"/>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(65 + r) + out
        return out

    body = []
    for r_idx, row in enumerate([headers] + rows, start=1):
        cells = "".join(cell(f"{col_ref(c)}{r_idx}", v) for c, v in enumerate(row))
        body.append(f'<row r="{r_idx}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )


def xlsx_bytes(sheets: dict[str, tuple[list[str], list[list]]]) -> bytes:
    """sheets: name → (headers, rows). → xlsx file bytes."""
    names = list(sheets)
    sheet_entries = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, n in enumerate(names):
            headers, rows = sheets[n]
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _xlsx_sheet_xml(headers, rows))
    return buf.getvalue()


# ---------------------------------------------------------------------------
# pdf
# ---------------------------------------------------------------------------

_PAGE_W, _PAGE_H = 612, 792  # US Letter, points
_MARGIN, _LEADING, _FONT_SIZE = 54, 13, 9
_LINES_PER_PAGE = (_PAGE_H - 2 * _MARGIN) // _LEADING


def _pdf_escape(s: str) -> str:
    out = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    # PDF text strings are Latin-1; replace anything outside it
    return out.encode("latin-1", "replace").decode("latin-1")


def pdf_bytes(lines: list[str]) -> bytes:
    """Multi-page PDF 1.4 with one monospaced-ish Helvetica text column.
    Objects: 1 catalog, 2 pages tree, then per page (page obj, content
    stream obj), last font obj. Offsets in the xref are exact."""
    pages = [
        lines[i : i + _LINES_PER_PAGE] for i in range(0, max(len(lines), 1), _LINES_PER_PAGE)
    ] or [[""]]
    n_pages = len(pages)
    font_obj = 3 + 2 * n_pages
    objs: list[bytes] = []

    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, page_lines in enumerate(pages):
        page_no, content_no = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} {_PAGE_H}] "
                f"/Contents {content_no} 0 R /Resources << /Font << /F1 {font_obj} 0 R >> >> >>"
            ).encode()
        )
        text = "\n".join(f"({_pdf_escape(ln)}) Tj T*" for ln in page_lines)
        stream = (
            f"BT /F1 {_FONT_SIZE} Tf {_LEADING} TL {_MARGIN} {_PAGE_H - _MARGIN} Td\n{text}\nET"
        ).encode("latin-1")
        objs.append(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n" + stream + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_pos = out.tell()
    out.write(f"xref\n0 {len(objs) + 1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets[1:]:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return out.getvalue()


# ---------------------------------------------------------------------------
# report assembly (same aggregates as sinks.markdown_report/html_report)
# ---------------------------------------------------------------------------

def _report_tables(summary_rows, column_findings_rows, n_rows, run_id):
    summary = (
        ["severity", "rule", "count"],
        [
            [r["severity"], r["rule"], r["n"]]
            for r in sorted(summary_rows, key=lambda r: (r["severity"], r["rule"]))
        ],
    )
    col_findings = (
        ["rule", "column", "severity", "detail"],
        [
            [r["rule"], r["column_name"] or "—", r["severity"], r["detail"]]
            for r in column_findings_rows
        ],
    )
    meta = (["key", "value"], [["run_id", run_id], ["dataset_rows", n_rows]])
    return meta, summary, col_findings


def save_xlsx_report(summary, column_findings, n_rows, path, run_id="adhoc"):
    meta, summ, colf = _report_tables(
        summary.collect(), column_findings.collect(), n_rows, run_id
    )
    data = xlsx_bytes({"overview": meta, "findings_summary": summ, "dataset_findings": colf})
    with open(path, "wb") as f:
        f.write(data)
    return path


def save_pdf_report(summary, column_findings, n_rows, path, run_id="adhoc"):
    meta, summ, colf = _report_tables(
        summary.collect(), column_findings.collect(), n_rows, run_id
    )
    lines = [f"Data Quality Report - run {run_id}", f"Dataset rows: {n_rows}", ""]
    for title, (headers, rows) in (
        ("Findings by severity x rule", summ),
        ("Dataset-level findings", colf),
    ):
        lines += [title, "-" * len(title)]
        widths = [
            max(len(str(h)), *(len(str(r[i])) for r in rows)) if rows else len(str(h))
            for i, h in enumerate(headers)
        ]
        lines.append("  ".join(str(h).ljust(w) for h, w in zip(headers, widths)))
        for r in rows:
            lines.append("  ".join(str(v).ljust(w) for v, w in zip(r, widths)))
        lines.append("")
    with open(path, "wb") as f:
        f.write(pdf_bytes(lines))
    return path

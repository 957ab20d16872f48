"""Input sources — the reference's loader surface (SURVEY §2.1 S1-S4)
re-expressed as schema-enforced distributed readers.

The reference infers schema via pandas readers (src/core/data_loader.py:
10-25) and re-discovers types at runtime; here every reader declares
CLIPS_SCHEMA up front so Catalyst prunes/pushes down and type errors
surface at read time, not as downstream "type check" findings.

Formats:
  * parquet — native binary support; the production path (Iceberg
    tables in a real deployment; SURVEY §1.1).
  * csv / json — text formats cannot carry raw binary, so the ``bytes``
    column travels base64-encoded in a ``bytes_b64`` field (the
    standard interchange convention); readers decode to BinaryType,
    writers encode. Schema is declared, never inferred.
  * URL ingest (S4) — deliberately NOT a Spark op: distributed jobs
    should read from storage the cluster can reach. A driver-side
    helper is provided for parity with the reference's url_loader
    (100 MB cap semantics documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import CLIPS_SCHEMA

# csv/json wire schema: binary → base64 string
_TEXT_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes_b64", T.StringType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]
)

_WIRE_COLS = ["clip_id", "bytes_b64", "sr_hz", "dur_ms", "codec", "transcript"]


def _decode_wire(df: DataFrame) -> DataFrame:
    return df.select(
        "clip_id",
        F.unbase64("bytes_b64").alias("bytes"),
        "sr_hz",
        "dur_ms",
        "codec",
        "transcript",
    )


def _encode_wire(clips: DataFrame) -> DataFrame:
    return clips.select(
        "clip_id",
        F.base64("bytes").alias("bytes_b64"),
        "sr_hz",
        "dur_ms",
        "codec",
        "transcript",
    )


def read_clips(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S1/S2/S8 — schema-enforced clips reader."""
    if fmt == "parquet":
        return spark.read.schema(CLIPS_SCHEMA).parquet(path)
    if fmt == "csv":
        raw = (
            spark.read.schema(_TEXT_WIRE_SCHEMA)
            .option("header", True)
            # quoted fields may contain embedded newlines (base64 payloads,
            # free-text transcripts) — without multiLine the reader splits
            # them into phantom rows
            .option("multiLine", True)
            .option("escape", '"')
            .csv(path)
        )
        return _decode_wire(raw)
    if fmt == "json":
        raw = spark.read.schema(_TEXT_WIRE_SCHEMA).json(path)
        return _decode_wire(raw)
    raise ValueError(f"unsupported clips format: {fmt}")


def write_clips(clips: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    """S5/S6/S8 — clips writer (round-trips with ``read_clips``)."""
    if fmt == "parquet":
        clips.write.mode(mode).parquet(path)
    elif fmt == "csv":
        _encode_wire(clips).write.mode(mode).option("header", True).csv(path)
    elif fmt == "json":
        _encode_wire(clips).write.mode(mode).json(path)
    else:
        raise ValueError(f"unsupported clips format: {fmt}")


def fetch_url_to_local(url: str, dest: str, max_bytes: int = 100 * 1024 * 1024,
                       timeout: int = 30) -> str:
    """S4 — driver-side URL ingest (reference: src/core/url_loader.py:15-108,
    100 MB cap, 30 s timeout). Streams to ``dest``; raises on overflow.
    Not a Spark op by design — see module docstring."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as resp, open(dest, "wb") as out:
        total = 0
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            total += len(chunk)
            if total > max_bytes:
                raise ValueError(f"download exceeds {max_bytes} byte cap")
            out.write(chunk)
    return dest


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "record",
    schema: T.StructType | None = None,
) -> DataFrame:
    """S3 — minimal XML scan (reference: src/core/data_loader.py:18-20,
    ``pd.read_xml``). Driver-side ElementTree parse → createDataFrame —
    deliberately config-scale only (rule files, small uploads), matching
    the reference's in-memory upload path; a 100 TB XML corpus is not a
    thing (and if it were, the spark-xml datasource is the tool). Each
    ``<row_tag>`` element becomes a row; child-element text becomes
    all-string columns unless ``schema`` is given (empty text → NULL,
    the pandas NaN analog)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    records = []
    cols: list[str] = []
    for rec in root.iter(row_tag):
        row = {}
        for child in rec:
            if child.tag not in cols:
                cols.append(child.tag)
            row[child.tag] = child.text if child.text not in (None, "") else None
        records.append(row)
    if schema is None:
        schema = T.StructType([T.StructField(c, T.StringType(), True) for c in cols])
    # element text is always string; build as strings, then cast to the
    # declared schema (the XML analog of csv schema application)
    wire = T.StructType([T.StructField(f.name, T.StringType(), True) for f in schema.fields])
    data = [tuple(r.get(f.name) for f in schema.fields) for r in records]
    df = spark.createDataFrame(data, wire)
    return df.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])

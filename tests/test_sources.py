"""Source round-trips: schema-enforced readers, base64 binary transport
for text formats (reference: src/core/data_loader.py + export round-trip
tests)."""

from __future__ import annotations

import pytest

from data_quality_checker_spark.sources.loaders import read_clips, write_clips


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_clips_roundtrip(spark, clips_df, tmp_path_factory, fmt):
    p = str(tmp_path_factory.mktemp("src") / fmt)
    write_clips(clips_df, p, fmt)
    back = read_clips(spark, p, fmt)
    assert back.count() == clips_df.count()
    assert [f.name for f in back.schema.fields] == [
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"
    ]
    # binary payloads survive the wire format bit-exactly
    orig = {r["clip_id"]: r["bytes"] for r in clips_df.select("clip_id", "bytes").collect()}
    got = {r["clip_id"]: r["bytes"] for r in back.select("clip_id", "bytes").collect()}
    assert got == orig


def test_read_rejects_unknown_format(spark):
    with pytest.raises(ValueError):
        read_clips(spark, "/nonexistent", "xml")

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


class _LoopbackServer:
    """Ephemeral-port HTTP server on 127.0.0.1 serving one directory —
    exercises the S4 ingest path (reference: src/core/url_loader.py:15-108)
    without external network."""

    def __init__(self, directory):
        import http.server
        import threading
        from functools import partial

        handler = partial(http.server.SimpleHTTPRequestHandler,
                          directory=str(directory))
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()

    def url(self, name):
        return f"http://127.0.0.1:{self.port}/{name}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_fetch_url_roundtrip_and_spark_read(spark, tmp_path):
    """S4 end-to-end: download over HTTP (loopback), then read_clips the
    fetched file — the reference's URL→analyze flow."""
    from data_quality_checker_spark.sources.loaders import fetch_url_to_local

    src = tmp_path / "served"
    src.mkdir()
    payload = b"clip_id,transcript\nc1,hello world\nc2,bonjour\n"
    (src / "clips.csv").write_bytes(payload)

    srv = _LoopbackServer(src)
    try:
        dest = str(tmp_path / "fetched.csv")
        out = fetch_url_to_local(srv.url("clips.csv"), dest)
        assert out == dest
        assert open(dest, "rb").read() == payload

        df = spark.read.option("header", True).csv(dest)
        assert df.count() == 2
        assert set(r["clip_id"] for r in df.collect()) == {"c1", "c2"}
    finally:
        srv.close()


def test_fetch_url_size_cap(tmp_path):
    """Overflow past max_bytes raises mid-stream (reference caps at 100 MB,
    url_loader.py:90-94); partial bytes never reported as success."""
    from data_quality_checker_spark.sources.loaders import fetch_url_to_local

    src = tmp_path / "served"
    src.mkdir()
    (src / "big.bin").write_bytes(b"x" * (3 << 20))

    srv = _LoopbackServer(src)
    try:
        with pytest.raises(ValueError, match="cap"):
            fetch_url_to_local(srv.url("big.bin"), str(tmp_path / "out.bin"),
                               max_bytes=1 << 20)
    finally:
        srv.close()


def test_fetch_url_unreachable(tmp_path):
    """Connection-refused surfaces as URLError, not a hang (timeout wired
    through to urlopen)."""
    import urllib.error

    from data_quality_checker_spark.sources.loaders import fetch_url_to_local

    # bind-then-close guarantees a dead port
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    with pytest.raises((urllib.error.URLError, OSError)):
        fetch_url_to_local(f"http://127.0.0.1:{port}/x", str(tmp_path / "o"),
                           timeout=2)

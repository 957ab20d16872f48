"""Webhook-analog notification + Iceberg DDL artifacts."""

from __future__ import annotations

import hashlib
import hmac
import json

from data_quality_checker_spark.run.ddl import all_ddl, clips_ddl
from data_quality_checker_spark.run.notify import (
    build_event,
    deliver,
    notify_run_completed,
    sign_payload,
)


def test_signature_matches_reference_format():
    # reference: sha256=<hexdigest> over the body (webhooks.py:67-77)
    body = b'{"a": 1}'
    sig = sign_payload(body, "secret")
    assert sig == "sha256=" + hmac.new(b"secret", body, hashlib.sha256).hexdigest()


def test_spool_delivery_and_isolation(tmp_path):
    spool = str(tmp_path / "hooks.jsonl")
    results = notify_run_completed(
        {"run_id": "R1", "rows_kept": 9}, [spool, "/nonexistent-dir\0bad"], secret="s"
    )
    assert results[0]["ok"] is True
    assert results[1]["ok"] is False  # bad endpoint isolated, no raise
    with open(spool) as f:
        rec = json.loads(f.readline())
    assert rec["body"]["event"] == "CHECK_COMPLETED"
    assert rec["body"]["data"]["run_id"] == "R1"
    assert rec["headers"]["X-Signature-256"].startswith("sha256=")


def test_event_shape():
    e = build_event("BATCH_COMPLETED", {"n": 2})
    assert set(e) == {"event", "timestamp", "data"}


def test_ddl_statements():
    stmts = all_ddl()
    assert len(stmts) == 4
    c = clips_ddl(n_buckets=512)
    assert "PARTITIONED BY (bucket(512, clip_id), codec)" in c
    assert "USING iceberg" in c
    for s in stmts:
        assert s.startswith("CREATE TABLE IF NOT EXISTS")

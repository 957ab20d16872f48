"""Run-completion notifications — the reference's webhook subsystem
(/root/reference/src/api/routes/webhooks.py:34-89, fired from
src/api/main.py:134-153) reshaped for a batch job.

Semantics kept from the reference:
  * HMAC-SHA256 payload signature in an ``X-Signature-256`` header-style
    field (webhooks.py:67-77 — ``sha256=<hexdigest>`` over the JSON body);
  * event types CHECK_COMPLETED / BATCH_COMPLETED;
  * fire-and-forget with per-endpoint error isolation.

Delivery is pluggable: an HTTP POST when the environment allows network,
else an append-only JSONL spool file (the sandboxed default) that an
external relay drains. Driver-side by design — notifications are control
plane, not data plane.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import os
import time


def sign_payload(payload: bytes, secret: str) -> str:
    """HMAC-SHA256 signature, reference format (webhooks.py:67-77)."""
    mac = hmac.new(secret.encode("utf-8"), payload, hashlib.sha256)
    return f"sha256={mac.hexdigest()}"


def build_event(event_type: str, run_stats: dict) -> dict:
    return {
        "event": event_type,
        "timestamp": time.time(),
        "data": run_stats,
    }


def deliver(
    event: dict,
    endpoint: str,
    secret: str | None = None,
    timeout: int = 10,
) -> dict:
    """Deliver one event. ``endpoint`` may be an http(s) URL or a local
    ``file://`` / plain path (JSONL spool). Returns a delivery record;
    never raises (error isolation per endpoint, batch.py:43-73 style)."""
    body = json.dumps(event, sort_keys=True).encode("utf-8")
    headers = {"Content-Type": "application/json"}
    if secret:
        headers["X-Signature-256"] = sign_payload(body, secret)
    try:
        if endpoint.startswith(("http://", "https://")):
            import urllib.request

            req = urllib.request.Request(endpoint, data=body, headers=headers)
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return {"endpoint": endpoint, "ok": True, "status": resp.status}
        path = endpoint[len("file://"):] if endpoint.startswith("file://") else endpoint
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps({"headers": headers, "body": event}) + "\n")
        return {"endpoint": endpoint, "ok": True, "status": "spooled"}
    except Exception as e:  # fire-and-forget: report, never raise
        return {"endpoint": endpoint, "ok": False, "error": str(e)}


def notify_run_completed(run_stats: dict, endpoints: list[str], secret: str | None = None) -> list[dict]:
    """CHECK_COMPLETED fan-out (main.py:134-153 analog)."""
    event = build_event("CHECK_COMPLETED", run_stats)
    return [deliver(event, ep, secret) for ep in endpoints]

"""Property-based invariants (hypothesis) for the driver-side scalar
mirrors of the scrub/scoring logic — pure-Python functions shared with
the pandas oracle, so these run in milliseconds without a SparkSession.

Invariants:
* scrub removes every scannable email span and is idempotent (the
  redaction tokens themselves contain nothing re-scannable);
* phone scrubbing respects the reference's 7–15 digit-count rule;
* quality/langid helpers never crash on arbitrary unicode and keep
  their documented ranges.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_checker_spark.config import (
    EMAIL_REGEX_SCAN,
    EMAIL_REDACTION,
    PHONE_REDACTION,
)
from data_quality_checker_spark.functions.textmodel import langid_one, perplexity_one
from data_quality_checker_spark.oracle.pandas_oracle import scrub_text

_EMAIL_RE = re.compile(EMAIL_REGEX_SCAN)

text_strategy = st.text(max_size=200)
email_local = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789._%+-"), min_size=1, max_size=20
).filter(lambda s: not s.startswith(".") and not s.endswith("."))


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_scrub_total_and_idempotent(text):
    out = scrub_text(text)
    assert isinstance(out, str)
    assert _EMAIL_RE.search(out) is None  # no scannable email survives
    assert scrub_text(out) == out  # idempotent


@given(email_local, st.sampled_from(["example.com", "mail.co.uk", "x.io"]), text_strategy)
@settings(max_examples=100, deadline=None)
def test_scrub_redacts_injected_email(local, domain, ctx):
    text = f"{ctx} contact {local}@{domain} thanks"
    assert EMAIL_REDACTION in scrub_text(text)


@given(st.integers(min_value=0, max_value=25))
@settings(max_examples=26, deadline=None)
def test_phone_digit_count_rule(n_digits):
    """Only spans whose digit count lies in [7, 15] are redacted
    (src/core/validator.py:207-208)."""
    text = "call " + "5" * n_digits + " now"
    scrubbed = scrub_text(text)
    if 7 <= n_digits <= 15:
        assert PHONE_REDACTION in scrubbed
    else:
        assert PHONE_REDACTION not in scrubbed


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_scalar_models_total(text):
    lang, conf = langid_one(text)
    assert lang is None or isinstance(lang, str)
    assert 0.0 <= conf <= 1.0
    ppl = perplexity_one(text)
    assert ppl != ppl or ppl >= 0.0  # NaN (no signal) or non-negative

"""The rule set as pure Catalyst column expressions.

Each rule is (name, severity, drops?, Column predicate). Predicates are
built over the *enriched* frame (clips + sha + audio struct + langid
struct + ppl + scrub struct + is_duplicate) so everything stays inside
whole-stage codegen; the only Python is the four Arrow UDFs that produced
the enriched columns.

Severity assignments follow the reference (see oracle.pandas_oracle.RULES
for the file:line pins; this table must stay identical to it — enforced by
tests/test_rules_registry.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


@dataclass(frozen=True)
class Rule:
    name: str
    severity: str
    drops: bool
    predicate: Column


def build_rules(
    cfg: PipelineConfig = DEFAULT_CONFIG,
    dur_bounds: tuple[float, float] | None = None,
) -> list[Rule]:
    """Rules over the enriched frame, in sorted-name order (the oracle
    sorts rules_fired, so array construction order must match).

    ``dur_bounds`` is the pre-computed exact IQR fence (lo, hi) for
    dur_ms — or None when the fence is undefined (fewer than
    outlier_min_rows non-null values, or IQR == 0; validator.py:273,278).
    """
    t = F.col("transcript")
    dur = F.col("dur_ms")
    sr = F.col("sr_hz")
    codec = F.col("codec")
    audio = F.col("audio")
    decoded = audio["decode_ok"]
    lang_ok_guard = t.isNotNull() & (F.length(t) >= cfg.min_transcript_chars)

    if dur_bounds is not None:
        lo, hi = dur_bounds
        outlier_pred = dur.isNotNull() & ((dur < F.lit(lo)) | (dur > F.lit(hi)))
    else:
        outlier_pred = F.lit(False)

    rules = [
        Rule(
            "clipped_audio",
            "medium",
            True,
            (decoded == True) & (audio["clip_ratio"] > F.lit(cfg.clip_ratio_max)),  # noqa: E712
        ),
        Rule(
            "codec_not_allowed",
            "medium",
            True,
            codec.isNotNull() & ~codec.isin(*cfg.codec_whitelist),
        ),
        Rule("decode_failed", "high", True, decoded == False),  # noqa: E712
        Rule("duplicate", "medium", True, F.col("is_duplicate")),
        Rule(
            "dur_above_max",
            "high",
            True,
            dur.isNotNull() & (dur > F.lit(cfg.dur_ms_max)),
        ),
        Rule(
            "dur_below_min",
            "high",
            True,
            dur.isNotNull() & (dur < F.lit(cfg.dur_ms_min)),
        ),
        Rule(
            "dur_inconsistent",
            "high",
            True,
            (decoded == True)  # noqa: E712
            & dur.isNotNull()
            & audio["decoded_ms"].isNotNull()
            & (
                F.abs(audio["decoded_ms"] - dur.cast("double"))
                > F.lit(float(cfg.dur_consistency_tol_ms))
            ),
        ),
        Rule("dur_outlier", "medium", False, outlier_pred),
        Rule("empty_transcript", "low", True, t.isNotNull() & (t == F.lit(""))),
        Rule(
            "high_perplexity",
            "medium",
            True,
            lang_ok_guard
            & F.col("ppl").isNotNull()
            & ~F.isnan(F.col("ppl"))
            & (F.col("ppl") > F.lit(cfg.perplexity_max)),
        ),
        Rule("missing_bytes", "high", True, F.col("sha").isNull()),
        Rule("missing_dur_ms", "high", True, dur.isNull()),
        Rule("missing_sr_hz", "high", True, sr.isNull()),
        Rule("missing_transcript", "high", True, t.isNull()),
        Rule("pii_email", "medium", False, t.isNotNull() & F.col("scrub")["had_email"]),
        Rule("pii_phone", "low", False, t.isNotNull() & F.col("scrub")["had_phone"]),
        Rule(
            "short_transcript",
            "low",
            True,
            t.isNotNull()
            & (t != F.lit(""))
            & (F.length(t) < F.lit(cfg.min_transcript_chars)),
        ),
        Rule(
            "sr_not_allowed",
            "medium",
            True,
            sr.isNotNull() & ~sr.isin(*[int(x) for x in cfg.sr_hz_whitelist]),
        ),
        Rule("toxicity", "medium", False, t.isNotNull() & F.col("scrub")["had_tox"]),
        Rule(
            "wrong_language",
            "medium",
            True,
            lang_ok_guard
            & (
                F.col("langid")["lang"].isNull()
                | (F.col("langid")["lang"] != F.lit(cfg.langid_target))
                | (F.col("langid")["conf"] < F.lit(cfg.langid_min_conf))
            ),
        ),
    ]
    assert [r.name for r in rules] == sorted(r.name for r in rules)
    if cfg.disabled_rules:
        # runtime rule registry (config.load_rule_config): a disabled rule
        # is absent from the set — it neither fires nor affects keep/drop
        rules = [r for r in rules if r.name not in cfg.disabled_rules]
    return rules


def rules_fired_expr(rules: list[Rule]) -> Column:
    """array<string> of fired rule names, in sorted-name order, no nulls."""
    arr = F.array(
        *[F.when(r.predicate, F.lit(r.name)).otherwise(F.lit(None)) for r in rules]
    )
    return F.filter(arr, lambda x: x.isNotNull())


def keep_expr(rules: list[Rule]) -> Column:
    """keep = no drop-rule predicate fired (null-safe: null → not fired)."""
    dropped = F.lit(False)
    for r in rules:
        if r.drops:
            dropped = dropped | F.coalesce(r.predicate, F.lit(False))
    return ~dropped


def severity_map_expr(rules: list[Rule]) -> Column:
    """map<rule, severity> literal for findings enrichment."""
    pairs: list[Column] = []
    for r in rules:
        pairs.extend([F.lit(r.name), F.lit(r.severity)])
    return F.create_map(*pairs)

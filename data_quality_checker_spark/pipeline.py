"""Pipeline assembly — one lazy DataFrame DAG from clips to decisions.

Shape (scale rationale inline):

  clips ──(single projection: sha1, audio-stats UDF, langid UDF, ppl UDF,
           scrub UDF — the ONLY pass that touches `bytes`; everything
           downstream drops it)──► enriched
  enriched ──persist(slim, no bytes)──┬─► salted keeper agg ─┐
                                      └──────── join on sha ◄┘
          ──► rules (pure column exprs) ──► decisions / findings / metrics

The reference runs ~10 sequential full scans (src/core/validator.py:62-82);
here Catalyst fuses every rule into one whole-stage-codegen pass over the
enriched frame, and the heavy binary column is read exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions.udfs import get_udfs
from .operators import metrics as metrics_ops
from .operators.dedup import sha1_expr, with_duplicate_flag
from .operators.outliers import iqr_bounds
from .operators.rules import build_rules, keep_expr, rules_fired_expr, severity_map_expr


def enrich(clips: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Single pass over the corpus: hash + decode + score + scrub.

    Drops ``bytes`` at the end — the output is a slim frame safe to
    persist/shuffle.
    """
    udfs = get_udfs()
    return clips.select(
        "clip_id",
        "sr_hz",
        "dur_ms",
        "codec",
        "transcript",
        sha1_expr("bytes").alias("sha"),
        udfs["audio_stats"](F.col("bytes"), F.col("codec"), F.col("sr_hz")).alias("audio"),
        udfs["langid"](F.col("transcript")).alias("langid"),
        udfs["perplexity"](F.col("transcript")).alias("ppl"),
        udfs["scrub"](F.col("transcript")).alias("scrub"),
    )


def decide(
    enriched: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    dur_bounds: tuple[float, float] | None = None,
    clips: DataFrame | None = None,
) -> DataFrame:
    """Rules over the enriched frame → per-clip decisions.

    When ``clips`` is given, the dedup keeper aggregation is computed from
    the RAW frame (clip_id + sha1(bytes) — pure JVM, column-pruned scan)
    instead of from ``enriched`` — otherwise an unpersisted ``enriched``
    lineage would re-run the Arrow UDF pass a second time just to find
    keepers. A frame that already carries ``is_duplicate`` (the streaming
    path flags against its cross-batch SHA registry) is used as-is.
    """
    if "is_duplicate" in enriched.columns:
        flagged = enriched
    elif clips is not None:
        from .operators.dedup import keepers_by_sha

        hashed = clips.select("clip_id", sha1_expr("bytes").alias("sha"))
        keepers = keepers_by_sha(hashed, cfg)
        flagged = enriched.join(keepers, on="sha", how="left").withColumn(
            "is_duplicate",
            F.when(
                F.col("sha").isNotNull() & (F.col("clip_id") != F.col("keeper_clip_id")),
                F.lit(True),
            ).otherwise(F.lit(False)),
        ).drop("keeper_clip_id")
    else:
        flagged = with_duplicate_flag(enriched, cfg)
    rules = build_rules(cfg, dur_bounds)
    return flagged.select(
        "clip_id",
        keep_expr(rules).alias("keep"),
        rules_fired_expr(rules).alias("rules_fired"),
        F.when(F.col("transcript").isNotNull(), F.col("scrub")["scrubbed"]).alias(
            "scrubbed_transcript"
        ),
        F.col("langid")["lang"].alias("lang"),
        F.col("langid")["conf"].alias("lang_conf"),
        F.col("ppl").alias("perplexity"),
        F.col("audio")["clip_ratio"].alias("clip_ratio"),
    )


def findings_from_decisions(decisions: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Explode per-clip fired rules into the findings table (the issue-record
    analog, src/core/validator.py:20-45)."""
    sev = severity_map_expr(build_rules(cfg))
    return decisions.select(
        "clip_id", F.explode("rules_fired").alias("rule")
    ).withColumn("severity", F.element_at(sev, F.col("rule")))


@dataclass
class PipelineResult:
    decisions: DataFrame
    findings: DataFrame
    summary: DataFrame
    dur_bounds: tuple[float, float] | None
    column_findings: DataFrame | None = None


def run_pipeline(
    spark: SparkSession,
    clips: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    persist: bool = True,
    with_column_findings: bool = False,
) -> PipelineResult:
    """End-to-end in-session run (tests / entry point). The spark-submit
    job with lineage/resume lives in run/job.py and shares these stages.

    ``with_column_findings`` triggers two extra eager aggregate passes
    (the reference's dataset-level issue records) — off by default so the
    lazy decisions/findings plans stay the only corpus scans.
    """
    # tiny pre-pass: exact IQR fence over dur_ms only (column-pruned scan)
    bounds = iqr_bounds(
        clips, "dur_ms", cfg.outlier_iqr_mult, cfg.outlier_min_rows
    )
    enriched = enrich(clips, cfg)
    if persist:
        enriched = enriched.persist(StorageLevel.MEMORY_AND_DISK)
    decisions = decide(enriched, cfg, bounds, clips=clips)
    findings = findings_from_decisions(decisions, cfg)
    summ = metrics_ops.summary(findings)
    col_findings = (
        metrics_ops.column_findings(spark, clips, decisions, cfg)
        if with_column_findings
        else None
    )
    return PipelineResult(decisions, findings, summ, bounds, col_findings)

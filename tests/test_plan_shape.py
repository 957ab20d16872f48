"""Physical-plan shape guards — the properties that keep the pipeline
scalable are asserted here so regressions show up as test failures, not
as silent 2× slowdowns at 100 TB.

Found-the-hard-way catalog:
* deterministic pandas UDFs get PRUNED under a bare count() — so a
  "benchmark" that counts measures nothing (tools/_scale_worker.py);
* an unpersisted enriched frame consumed by two branches runs the whole
  Arrow UDF pass twice (pipeline.decide's clips= parameter);
* a not-yet-materialized cache consumed by two branches in one action
  races both branches into computing it concurrently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.pipeline import decide, enrich


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decisions_plan_has_two_udf_passes(spark, clips_df):
    """The decisions DAG must contain exactly TWO ArrowEvalPython nodes:
    the per-clip text pass and the per-distinct-payload audio pass. The
    dedup keeper branch must come from the raw JVM sha scan — a third
    Arrow node means some branch re-evaluates a UDF projection."""
    # other tests may have left persisted frames; the cache manager would
    # substitute InMemoryRelation into matching subtrees and change the
    # node count
    spark.catalog.clearCache()
    enriched = enrich(clips_df)
    decisions = decide(enriched, dur_bounds=(0.0, 1.0), clips=clips_df)
    plan = _executed_plan(decisions)
    n_arrow = plan.count("ArrowEvalPython")
    assert n_arrow == 2, f"expected 2 ArrowEvalPython nodes, got {n_arrow}:\n{plan[:2000]}"


def test_text_rules_prune_bytes_from_scan(spark, clips_df):
    """Rule subtrees that don't touch audio must never read the payload
    column (SURVEY §4.2: pruning keeps every other rule scan light)."""
    slim = clips_df.select(
        "clip_id",
        (F.length("transcript") < 5).alias("too_short"),
        F.col("dur_ms").isNull().alias("no_dur"),
    )
    plan = _executed_plan(slim)
    assert "bytes" not in plan


def test_keeper_branch_scans_two_columns_only(spark, clips_df):
    """The dedup keeper aggregation reads exactly (clip_id, bytes)."""
    from data_quality_checker_spark.operators.dedup import keepers_by_sha, sha1_expr

    keepers = keepers_by_sha(
        clips_df.select("clip_id", sha1_expr("bytes").alias("sha"))
    )
    plan = _executed_plan(keepers)
    assert "transcript" not in plan
    assert "ReadSchema" in plan
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(
        set(s.split(",")) <= {"clip_id:string", "bytes:binary"} for s in schemas
    ), schemas


def test_udfs_not_marked_nondeterministic(spark):
    """SURVEY §4.2: UDFs stay deterministic so Catalyst can collapse and
    reuse them (the pruning behavior the bench guards against is the
    flip side of the same property — both are intended)."""
    from data_quality_checker_spark.functions.udfs import get_udfs

    for name, udf in get_udfs().items():
        assert udf.deterministic, name


def test_fingerprints_plan_partial_aggregates(spark):
    """The 1-min-sketch is shingle explode → codegen md5 → groupBy(doc_id)
    min with a MAP-SIDE partial aggregate, so the doc_id shuffle carries
    one 16-byte row per doc per task — not the exploded shingles. (The
    former zero-shuffle array_min(transform(...)) formulation was
    retired by the sf10 sweep: the interpreted HOF cost the same per
    shingle and could not be respread-parallelized; see
    operators/text.fingerprints.)"""
    from data_quality_checker_spark.operators.text import fingerprints

    docs = spark.createDataFrame(
        [(1, "some document text long enough to shingle")],
        "doc_id bigint, text string",
    )
    plan = _executed_plan(fingerprints(docs.coalesce(1)))
    # partial min BEFORE the hashpartitioning exchange (map-side combine)
    assert "partial_min" in plan, plan[:1200]
    assert "hashpartitioning(doc_id" in plan, plan[:1200]
    # exactly one round-robin respread for the degenerate small scan +
    # one aggregation shuffle — the explode fan-out itself never shuffles
    assert plan.count("Exchange") <= 2, plan[:1200]
    # md5/conv runs inside whole-stage codegen, not an interpreted HOF
    assert "transform(" not in plan, plan[:1200]

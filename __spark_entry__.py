"""Driver contract for the spark-graft builder (PySpark target).

* ``entry(spark)`` — flagship: the full langid + quality-filter + scrub
  pipeline over the synthetic audio clip + transcript corpus (the
  BASELINE.json ``input_hint`` shape — TESTDATA has no clips table, so
  per the driver's round instructions the corpus is synthesized
  deterministically at sf=0.001 scale and cached under /tmp).
* ``queries()`` / ``oracle_sql()`` — one entry per implemented operator
  from SURVEY.md §2 plus the training-data-pipeline extensions (dedup
  family, similarity search, text analysis). Registry lives in
  ``data_quality_checker_spark/queries.py``; SQL-expressible ops carry an
  exact DuckDB oracle, UDF-model ops (clips pipeline, LSH fp-sign
  bucketing) are rows-only by design.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_quality_checker_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-clip keep/drop decisions + scrubbed transcripts
    at sf=0.001 (the FULL decisions frame incl. model scores; the
    registry's clips_decisions_labels is its hash-checked projection)."""
    from pyspark.sql import functions as F

    from data_quality_checker_spark.pipeline import run_pipeline

    clips = spark.read.parquet(_registry._clips_path("/root/testdata/sf0.001"))
    decisions = run_pipeline(spark, clips).decisions
    # array<string> is unhashable in the driver's pandas canonicalizer;
    # rules_fired is deterministically name-sorted so the comma-join is a
    # stable scalar encoding.
    return decisions.withColumn("rules_fired", F.concat_ws(",", F.col("rules_fired")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracles()

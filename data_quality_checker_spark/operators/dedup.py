"""Exact duplicate detection — SHA-1 over the audio payload, salted
two-phase aggregation to beat key skew.

Reference semantics: pandas ``duplicated()`` keeps the first occurrence by
row order (src/core/validator.py:103,116; unique_check
src/core/validation_rules.py:176-193). Row order is meaningless in a
distributed table, so the deterministic equivalent is *keep the minimum
clip_id per SHA-1*.

Scale design (the north-star "salted repartition" pattern):
  A viral clip duplicated 10^6× makes one reducer hot. ``min()`` is
  partial-aggregatable, so we split the aggregation in two phases with an
  explicit salt — phase 1 reduces each hot key to at most ``salt_buckets``
  rows no matter how skewed it is, phase 2 is tiny:

      phase1 = clips.groupBy(sha, pmod(xxhash64(clip_id), S)).agg(min(clip_id))
      keepers = phase1.groupBy(sha).agg(min(clip_id))

  The join back (clips ⋈ keepers on sha) is probe-side-skewed only; the
  build side has unique keys, and AQE skew-join splitting handles the
  probe side (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


def sha1_expr(payload_col: str = "bytes") -> Column:
    """SHA-1 hex digest of the payload; null for null payloads."""
    return F.sha1(F.col(payload_col))


def keepers_by_sha(
    hashed: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    sha_col: str = "sha",
    id_col: str = "clip_id",
) -> DataFrame:
    """→ (sha, keeper_clip_id): the minimum clip_id per distinct SHA-1,
    via salted two-phase aggregation."""
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(cfg.dedup_salt_buckets))
    phase1 = (
        hashed.where(F.col(sha_col).isNotNull())
        .groupBy(F.col(sha_col), salt.alias("_salt"))
        .agg(F.min(id_col).alias("_local_min"))
    )
    return phase1.groupBy(sha_col).agg(F.min("_local_min").alias("keeper_clip_id"))


def with_duplicate_flag(
    hashed: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    sha_col: str = "sha",
    id_col: str = "clip_id",
) -> DataFrame:
    """Add ``is_duplicate`` — true for every row whose payload SHA-1 was
    seen on a smaller clip_id. Null-payload rows are never duplicates
    (they fail the missing-bytes rule instead)."""
    keepers = keepers_by_sha(hashed, cfg, sha_col, id_col)
    joined = hashed.join(keepers, on=sha_col, how="left")
    return joined.withColumn(
        "is_duplicate",
        F.when(
            F.col(sha_col).isNotNull() & (F.col(id_col) != F.col("keeper_clip_id")),
            F.lit(True),
        ).otherwise(F.lit(False)),
    ).drop("keeper_clip_id")

"""Iceberg table DDL for the production deployment (the north-star
layout: ``PARTITIONED BY (bucket(N, clip_id), codec)``).

This sandbox has no Iceberg runtime on the classpath, so run/job.py
implements the identical commit protocol on parquet + dynamic partition
overwrite (see its docstring); these statements are the deployment
artifacts for a real cluster, and ``iceberg_available()`` lets call
sites pick the path at runtime.

Why this layout at 10^12 clips:
  * ``bucket(N, clip_id)`` — write fan-in and read parallelism are both
    bounded and uniform; clip_id point-lookups prune to one bucket; the
    dedup groupBy and the lineage bucketing reuse the same hash space.
  * ``codec`` as a second partition column — per-codec scans (decode
    paths, codec whitelist audits, A20 metrics) prune at the manifest
    level without touching data files.
  * findings/decisions partitioned like the input so per-bucket commit
    (resume unit) is one partition swap — on Iceberg, one atomic
    snapshot commit per completed bucket set.
"""

from __future__ import annotations

N_BUCKETS = 512  # clip_id hash buckets at production scale


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def clips_ddl(catalog: str = "prod", db: str = "corpus", n_buckets: int = N_BUCKETS) -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {catalog}.{db}.clips (
  clip_id     STRING NOT NULL,
  bytes       BINARY,
  sr_hz       INT,
  dur_ms      INT,
  codec       STRING,
  transcript  STRING
)
USING iceberg
PARTITIONED BY (bucket({n_buckets}, clip_id), codec)
TBLPROPERTIES (
  'write.distribution-mode' = 'hash',
  'write.parquet.compression-codec' = 'zstd',
  'write.target-file-size-bytes' = '536870912'
)
""".strip()


def decisions_ddl(catalog: str = "prod", db: str = "corpus", n_buckets: int = N_BUCKETS) -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {catalog}.{db}.decisions (
  clip_id             STRING NOT NULL,
  keep                BOOLEAN NOT NULL,
  rules_fired         ARRAY<STRING> NOT NULL,
  scrubbed_transcript STRING,
  lang                STRING,
  lang_conf           DOUBLE,
  perplexity          DOUBLE,
  clip_ratio          DOUBLE,
  run_id              STRING NOT NULL
)
USING iceberg
PARTITIONED BY (run_id, bucket({n_buckets}, clip_id))
""".strip()


def findings_ddl(catalog: str = "prod", db: str = "corpus", n_buckets: int = N_BUCKETS) -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {catalog}.{db}.findings (
  clip_id   STRING NOT NULL,
  rule      STRING NOT NULL,
  severity  STRING NOT NULL,
  run_id    STRING NOT NULL
)
USING iceberg
PARTITIONED BY (run_id, bucket({n_buckets}, clip_id))
""".strip()


def lineage_ddl(catalog: str = "prod", db: str = "corpus") -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {catalog}.{db}.lineage (
  run_id       STRING NOT NULL,
  bucket       INT    NOT NULL,
  rows_in      BIGINT NOT NULL,
  rows_kept    BIGINT NOT NULL,
  rows_dropped BIGINT NOT NULL,
  completed_at TIMESTAMP NOT NULL
)
USING iceberg
""".strip()


def all_ddl(catalog: str = "prod", db: str = "corpus") -> list[str]:
    return [
        clips_ddl(catalog, db),
        decisions_ddl(catalog, db),
        findings_ddl(catalog, db),
        lineage_ddl(catalog, db),
    ]

"""Bucketed storage layout — the sandbox-runnable analog of the Iceberg
``PARTITIONED BY (bucket(N, clip_id), codec)`` DDL (run/ddl.py).

The Iceberg runtime is not on this classpath, so the DDL in run/ddl.py
stays a deployment artifact; Spark's NATIVE bucketed tables
(``bucketBy(N, key).saveAsTable``) express the same physical contract —
rows hash-partitioned into N stable buckets by key, recorded in the
catalog — and Catalyst honors it: a join of two tables bucketed by the
same key into the same N reads co-located buckets and plans a
SortMergeJoin with ZERO Exchange on either side (verified by
tests/test_bucketed_layout.py against the executed plan).

Why this matters at 10^12 clips: decisions ⋈ findings ⋈ clips by
clip_id is the hot access pattern of every downstream consumer (audits,
report builds, incremental re-scores). Unbucketed, each such join
re-shuffles the full corpus — O(corpus) network each time; bucketed,
the shuffle is paid ONCE at write time and amortized over every
subsequent join, and a clip_id point-lookup prunes to 1/N of the data.

The one bucketBy trap, handled here: Spark writes one file per
(task × non-empty bucket) — an unpartitioned upstream with T tasks can
emit T×N files. ``write_bucketed`` therefore repartitions BY THE BUCKET
KEY into N partitions first, so each task holds exactly the rows of one
bucket and writes exactly one file (same hygiene as the streaming
registry's sbkt layout, streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "clip_id",
    n_buckets: int = 32,
    database: str | None = None,
    location: str | None = None,
) -> str:
    """Write ``df`` as a catalog-registered bucketed parquet table,
    bucketed AND sort-ordered by ``key`` into ``n_buckets``; returns the
    fully-qualified table name.

    ``sortBy(key)`` makes each bucket file key-ordered, so the
    co-located SortMergeJoin needs no per-partition sort either — the
    analog of Iceberg's ``write.distribution-mode=hash`` plus a sorted
    write spec.
    """
    spark = df.sparkSession
    if database is not None:
        loc = f" LOCATION '{location}'" if location else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
        table = f"{database}.{table}"
    (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
    return table


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "clip_id"
) -> DataFrame:
    """Equi-join two same-key same-N bucketed tables. Plain ``join`` —
    the zero-shuffle plan comes from the catalog bucket spec, not from
    hints; this helper exists so call sites (and the plan-shape test)
    name the intent.

    Also enables ``bucketedTableScan.outputOrdering`` so Catalyst trusts
    the ``sortBy(key)`` file order and drops the per-partition Sort as
    well (off by default since Spark 3.0 because it is only sound when
    each bucket holds exactly ONE file — which ``write_bucketed``'s
    pre-repartition guarantees; Spark itself re-checks files-per-bucket
    before claiming the ordering, so this is safe even on foreign
    tables)."""
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return spark.table(left_table).join(spark.table(right_table), key)

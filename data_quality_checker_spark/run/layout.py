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

import os
import re
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
    tables).

    The conf is scoped to THIS plan, not leaked session-wide: physical
    planning is forced eagerly while the flag is set (QueryExecution
    caches the planned result), then the previous value is restored in
    ``finally`` — a later unrelated bucketed scan in the same session
    keeps its default plan shape.

    CAVEAT: the scoping holds only for executing the RETURNED frame
    directly. Deriving a new DataFrame from it (``.groupBy``/``.select``
    /...) builds a NEW QueryExecution after the flag is restored, and
    Catalyst re-inserts the per-partition sorts; an AQE stage replan can
    do the same. Callers composing further transformations on a
    sort-free bucketed join should wrap the WHOLE composition (plan
    build through action) in ``sorted_bucketed_scans`` instead."""
    with sorted_bucketed_scans(spark):
        df = spark.table(left_table).join(spark.table(right_table), key)
        # force physical planning under the flag; the QueryExecution
        # caches it, so execution after the restore reuses this plan
        df._jdf.queryExecution().executedPlan()
        return df


@contextmanager
def sorted_bucketed_scans(spark: SparkSession):
    """Scope ``bucketedTableScan.outputOrdering`` to a caller block:
    every plan BUILT AND EXECUTED inside the ``with`` trusts the
    bucketed tables' sortBy file order (no per-partition Sort), and the
    session conf is restored on exit — the derived-frame/AQE-replan-safe
    form of what ``cobucketed_join`` does for a single join plan.

        with sorted_bucketed_scans(spark):
            out = cobucketed_join(spark, "a", "b").groupBy(...).agg(...)
            out.write.parquet(path)   # execute INSIDE the scope
    """
    key_conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    prev = spark.conf.get(key_conf, None)
    spark.conf.set(key_conf, "true")
    try:
        yield
    finally:
        # restore the exact prior state: unset if it was never set, so
        # we track Spark's default instead of pinning today's "false"
        if prev is None:
            spark.conf.unset(key_conf)
        else:
            spark.conf.set(key_conf, prev)


def publish_bucketed_run(
    spark: SparkSession,
    output: str,
    run_id: str,
    n_buckets: int = 32,
    database: str = "dqc_marts",
    location: str | None = None,
) -> tuple[str, str]:
    """Publish a completed ``run/job.py`` run's decisions + findings as
    co-bucketed catalog tables keyed by ``clip_id``; returns the two
    table names.

    The job's raw output is path-partitioned by LINEAGE bucket
    (``pmod(xxhash64(clip_id), n_lineage_buckets)``) — the right layout
    for resume, the wrong one for consumers: every downstream
    decisions ⋈ findings (audits, report builds, re-score diffs) would
    re-shuffle both sides on clip_id each time. Publishing once through
    ``write_bucketed`` pays that shuffle a single time; all subsequent
    joins between the pair (or against any other clip_id-bucketed table
    of the same N) plan with zero Exchange and zero Sort
    (``cobucketed_join``). The run_id lands in the table NAME (lineage
    identity), not a column — each published run is an immutable
    snapshot, the Iceberg-snapshot analog."""
    safe = re.sub(r"[^A-Za-z0-9_]", "_", run_id)
    dec = (
        spark.read.parquet(os.path.join(output, "decisions"))
        .where(F.col("run_id") == run_id)
        .drop("run_id", "bucket")
    )
    fnd = (
        spark.read.parquet(os.path.join(output, "findings"))
        .where(F.col("run_id") == run_id)
        .drop("run_id", "bucket")
    )
    dt = write_bucketed(
        dec, f"decisions_{safe}", n_buckets=n_buckets, database=database, location=location
    )
    ft = write_bucketed(
        fnd, f"findings_{safe}", n_buckets=n_buckets, database=database, location=location
    )
    return dt, ft

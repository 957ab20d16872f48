"""SparkSession factory with scale-oriented defaults.

Configured for the sandbox (local[N], single JVM) but every knob is the one
you would set on a 1000-executor cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on with a bounded batch size so
binary-audio batches cannot blow Python-worker memory, and shuffle
partitions sized to the parallelism.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

from .config import DEFAULT_CONFIG


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers regardless of
    the driver's cwd — the programmatic equivalent of
    ``spark-submit --py-files pipeline.zip`` (the north-star deploy shape).
    Idempotent per session."""
    if getattr(spark, "_dqc_package_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # imported from a --py-files zip (the spark-submit deploy path):
        # the runtime already ships the archive to every executor, and
        # there is no on-disk tree to re-zip
        spark._dqc_package_shipped = True  # type: ignore[attr-defined]
        return
    parent = os.path.dirname(pkg_dir)
    zip_base = os.path.join(tempfile.mkdtemp(prefix="dqc_pyfiles_"), "data_quality_checker_spark")
    zip_path = shutil.make_archive(zip_base, "zip", root_dir=parent, base_dir="data_quality_checker_spark")
    spark.sparkContext.addPyFile(zip_path)
    spark._dqc_package_shipped = True  # type: ignore[attr-defined]


def get_spark(
    app_name: str = "data-quality-checker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", None)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(int(master[6:-1]), 4)
        else:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_CONFIG.arrow_max_records_per_batch),
        )
        # Vectorized parquet reader batch: the default 4096 rows holds
        # ~230 MB of on-heap column vectors per task for ~56 KB binary
        # payloads — at 32 concurrent tasks that exceeds any sane heap
        # and collapses throughput into GC. 512 rows keeps payload scans
        # bounded; narrow text scans are unaffected.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # dynamic partition overwrite session-wide: streaming micro-batch
        # session clones snapshot conf at stream start, so this must be a
        # session default — a foreachBatch write under STATIC mode would
        # truncate every other batch's partitions (see streaming/
        # incremental.process_and_write)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        # Generated-class cache (default 100 entries): an operator-suite
        # session compiles hundreds of codegen units, and eviction makes a
        # RE-run of a complex plan pay multi-second janino recompilation —
        # measured: minhash_verified_pairs warm-after-30-queries 10.9 s vs
        # 7.9 s truly-warm, purely compile time. Cached classes are small;
        # 2000 entries is noise against the driver heap.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # ContextCleaner only reclaims dead shuffle files, broadcasts and
        # localCheckpoint blocks after a DRIVER GC processes their weak
        # refs; Spark's backstop System.gc() defaults to every 30 min,
        # sized for multi-hour batch drivers. An operator-suite session
        # (bench, tests, notebook) runs dozens of jobs in minutes, and the
        # backlog of dead blocks measurably degrades later jobs (observed
        # 4-5x on this suite: a query stable at ~4.5 s regressed to 19-25 s
        # after an iterative-localCheckpoint operator ran, and one explicit
        # System.gc() restored it). One minute keeps the cleaner current
        # at negligible GC cost.
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark

"""Subprocess worker for bench_scaling.py: run the full quality-filter
pipeline on a prepared corpus at a given parallelism, print one JSON line.

Timing excludes SparkSession/JVM startup and Python-worker warmup (a
trivial Arrow-UDF action first) — the north-rule criterion is about how
the JOB scales with executors, not about constant session overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    corpus = sys.argv[1]
    cores = int(sys.argv[2])

    from pyspark.sql import functions as F

    from data_quality_checker_spark.pipeline import run_pipeline
    from data_quality_checker_spark.session import get_spark

    spark = get_spark(
        app_name=f"dqc-scale-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        # file-granular parallelism: every core gets several input splits
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    clips = spark.read.parquet(corpus)

    # warm up JVM + python workers (imports, lazy model build) on a tiny
    # slice so the measured run sees steady state. NOTE: the warmup must
    # MATERIALIZE the UDF outputs — under a bare count() Catalyst prunes
    # deterministic pandas UDFs right out of the plan.
    from data_quality_checker_spark.pipeline import enrich

    enrich(
        clips.limit(32 * cores).repartition(cores)
    ).select("ppl", "langid", "audio", "scrub").collect()

    t0 = time.time()
    res = run_pipeline(spark, clips, persist=False)
    n = res.decisions.count()
    dt = time.time() - t0

    print(json.dumps({"cores": cores, "rows": n, "seconds": round(dt, 3),
                      "rows_per_sec": round(n / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()

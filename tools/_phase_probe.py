"""Dev profiling helper: per-phase wall times of the pipeline stages at a
given parallelism (used while tuning the scaling behavior; see
BENCH/BASELINE.md)."""

import json
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    corpus = sys.argv[1]
    cores = int(sys.argv[2])
    from data_quality_checker_spark.session import get_spark
    from data_quality_checker_spark.pipeline import (
        audio_stats_table, enrich, enrich_text, run_pipeline,
    )

    spark = get_spark(
        app_name=f"phase-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    clips = spark.read.parquet(corpus)
    enrich_text(clips.limit(32 * cores).repartition(cores)).select(
        "ppl", "langid", "scrub"
    ).collect()

    def t(label, fn):
        t0 = time.time()
        fn()
        print(json.dumps({"label": label, "cores": cores,
                          "sec": round(time.time() - t0, 2)}), flush=True)

    t("audio_stats_table", lambda: audio_stats_table(clips)
      .write.format("noop").mode("overwrite").save())
    t("enrich_text_noop", lambda: enrich_text(clips)
      .write.format("noop").mode("overwrite").save())
    t("enrich_joined_noop", lambda: enrich(clips)
      .write.format("noop").mode("overwrite").save())
    t("full", lambda: run_pipeline(spark, clips, persist=False)
      .decisions.write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()

"""Dev profiling: granular phase wall-times of the single-hash pipeline."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

corpus, cores = sys.argv[1], int(sys.argv[2])

from pyspark.storagelevel import StorageLevel  # noqa: E402

from data_quality_checker_spark.operators.dedup import keepers_by_sha  # noqa: E402
from data_quality_checker_spark.pipeline import (  # noqa: E402
    audio_stats_table, decide, enrich, enrich_text, hashed_frame,
)
from data_quality_checker_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"p3-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 2,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "128m"})
clips = spark.read.parquet(corpus)
enrich_text(clips.limit(32 * cores).repartition(cores)).select(
    "ppl", "langid", "scrub").collect()


def t(label, fn):
    t0 = time.time()
    fn()
    print(json.dumps({"label": label, "cores": cores,
                      "sec": round(time.time() - t0, 2)}), flush=True)


hashed = hashed_frame(clips).persist(StorageLevel.MEMORY_AND_DISK)
t("hashed_count", lambda: hashed.count())
t("keepers", lambda: keepers_by_sha(hashed.select("clip_id", "sha"))
  .write.format("noop").mode("overwrite").save())
t("text_noop", lambda: enrich_text(clips)
  .write.format("noop").mode("overwrite").save())
t("stats_noop", lambda: audio_stats_table(clips, hashed=hashed)
  .write.format("noop").mode("overwrite").save())
t("enrich_noop", lambda: enrich(clips, hashed=hashed)
  .write.format("noop").mode("overwrite").save())
t("decisions_noop", lambda: decide(
    enrich(clips, hashed=hashed), dur_bounds=(0.0, 1.0), hashed=hashed)
  .write.format("noop").mode("overwrite").save())
spark.stop()

"""Structured-Streaming ingest of the clips corpus — incremental quality
filtering with cross-batch duplicate state.

The reference is strictly batch (SURVEY §2.8); its nearest analog is the
append-only history + webhook push. The streaming shape that actually
matters for a 100 TB corpus is **incremental ingest**: new clip files
land continuously, each micro-batch must be scored once, and exact
dedup must hold ACROSS batches (a clip seen last week is still a
duplicate today).

Design — ``readStream`` file source → ``foreachBatch`` → the SAME batch
stages (enrich/decide) + a persistent SHA registry:

* within a micro-batch: the salted keeper aggregation (operators/dedup);
* across batches: an append-only ``sha_registry`` parquet table of
  (sha, keeper_clip_id); a new row is a duplicate if its sha is already
  registered (first-seen-batch wins; within the first batch, min
  clip_id wins — deterministic given ordered arrival);
* outputs append to ``decisions`` exactly once per micro-batch (the
  streaming checkpoint replays an incomplete batch; batch_id gates the
  registry append so replays are idempotent).

The global IQR duration fence is whole-dataset state and cannot be
"streamed" — it is calibrated once from a static sample (or a previous
batch run) and passed in; the dur_outlier flag is advisory (non-drop),
so keep/drop parity with the batch pipeline is exact.

``applyInPandasWithState`` would express the registry as managed state;
a parquet side-table is used instead so state survives independently of
the checkpoint and stays queryable (the lineage-table philosophy of
run/job.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.dedup import keepers_by_sha, sha1_expr
from ..pipeline import decide, enrich
from ..schema import CLIPS_SCHEMA


def _registry_path(state_dir: str) -> str:
    return os.path.join(state_dir, "sha_registry")


def _batches_path(state_dir: str) -> str:
    return os.path.join(state_dir, "registry_batches")


def read_registry(spark: SparkSession, state_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(_registry_path(state_dir))
    except Exception:
        return None


def process_increment(
    spark: SparkSession,
    new_clips: DataFrame,
    state_dir: str,
    batch_id: int,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    dur_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Score one micro-batch against (and then update) the SHA registry.
    Returns the decisions frame for the batch. Idempotent per batch_id."""
    registered = read_registry(spark, state_dir)
    seen_batches: set[int] = set()
    try:
        seen_batches = {
            r["batch_id"]
            for r in spark.read.parquet(_batches_path(state_dir)).collect()
        }
    except Exception:
        pass

    hashed = new_clips.select("clip_id", sha1_expr("bytes").alias("sha"))
    local_keepers = keepers_by_sha(hashed, cfg)
    if registered is not None:
        # a sha already in the registry belongs to an earlier batch — the
        # local candidate keeper loses (anti-join keeps only new shas)
        new_keepers = local_keepers.join(
            registered.select("sha"), "sha", "left_anti"
        )
        all_keepers = registered.select("sha", "keeper_clip_id").unionByName(new_keepers)
    else:
        new_keepers = local_keepers
        all_keepers = local_keepers

    enriched = enrich(new_clips, cfg)
    flagged = enriched.join(all_keepers, "sha", "left").withColumn(
        "is_duplicate",
        F.when(
            F.col("sha").isNotNull() & (F.col("clip_id") != F.col("keeper_clip_id")),
            F.lit(True),
        ).otherwise(F.lit(False)),
    ).drop("keeper_clip_id")
    decisions = decide(flagged, cfg, dur_bounds)

    if batch_id not in seen_batches:
        new_keepers.write.mode("append").parquet(_registry_path(state_dir))
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
            "append"
        ).parquet(_batches_path(state_dir))
    return decisions


def stream_quality_filter(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    dur_bounds: tuple[float, float] | None = None,
    available_now: bool = True,
):
    """File-source streaming job: every parquet file landing in
    ``input_dir`` is scored exactly once; decisions append to
    ``output_dir``. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int):
        decisions = process_increment(
            spark, batch_df, state_dir, batch_id, cfg, dur_bounds
        )
        decisions.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

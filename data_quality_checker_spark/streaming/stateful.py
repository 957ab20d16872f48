"""Custom stateful streaming operator: cross-batch exact dedup as
MANAGED state via ``applyInPandasWithState``.

`incremental.py` keeps cross-batch dedup state in an external bucketed
parquet registry (queryable, survives checkpoint loss). This module is
the alternative the Structured Streaming engine manages itself: per-sha
keeper state lives in the streaming state store (RocksDB/HDFS-backed via
the checkpoint), so there is no side-table to maintain and the engine
handles exactly-once state updates across micro-batch replays.

Trade-offs vs the registry design (both are legitimate at scale):

* state store — sharded by the groupBy key (sha), co-partitioned with
  the incoming shuffle: no per-batch registry read at all, state lookups
  are local to the task. But the state is opaque (not queryable as a
  table) and dies with the checkpoint.
* registry     — one extra bucketed-parquet read per batch (pruned to
  the batch's sha buckets), but the dedup state doubles as an auditable
  table and survives independently.

Semantics match `incremental.py` exactly: first-seen-batch wins; within
a batch the minimum clip_id wins (deterministic given ordered arrival).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from ..operators.dedup import sha1_expr
from ..schema import CLIPS_SCHEMA

DEDUP_FLAGS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("sha", StringType(), True),
        StructField("is_duplicate", BooleanType(), False),
        StructField("keeper_clip_id", StringType(), True),
    ]
)

KEEPER_STATE_SCHEMA = StructType([StructField("keeper_clip_id", StringType(), True)])


def _dedup_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-sha group: keeper = stored state if present, else the batch's
    min clip_id. Every row is emitted with its duplicate flag; state is
    updated once per (sha, batch)."""
    (sha,) = key
    clip_ids: list[str] = []
    for pdf in pdfs:
        clip_ids.extend(pdf["clip_id"].tolist())
    if not clip_ids:
        return
    if state.exists:
        (keeper,) = state.get
    else:
        keeper = min(clip_ids)
        state.update((keeper,))
    yield pd.DataFrame(
        {
            "clip_id": clip_ids,
            "sha": sha,
            "is_duplicate": [c != keeper for c in clip_ids],
            "keeper_clip_id": keeper,
        }
    )


def dedup_flags_stateful(hashed_stream: DataFrame) -> DataFrame:
    """(clip_id, sha) stream → (clip_id, sha, is_duplicate,
    keeper_clip_id) with engine-managed per-sha keeper state.

    The groupBy(sha) shuffle co-partitions rows with their state shard —
    at cluster scale each task touches only its own sha range, the exact
    property the bucketed registry construction builds by hand. Rows
    with NULL sha (missing payload) pass through as non-duplicates
    without touching state."""
    from pyspark.sql import functions as F

    with_sha = hashed_stream.where("sha IS NOT NULL")
    flagged = with_sha.groupBy("sha").applyInPandasWithState(
        _dedup_state_fn,
        outputStructType=DEDUP_FLAGS_SCHEMA,
        stateStructType=KEEPER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    no_sha = hashed_stream.where("sha IS NULL").select(
        "clip_id",
        F.col("sha"),
        F.lit(False).alias("is_duplicate"),
        F.lit(None).cast("string").alias("keeper_clip_id"),
    )
    return flagged.unionByName(no_sha)


def stream_dedup_flags(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source streaming job emitting per-clip duplicate flags with
    managed state. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    hashed = stream.select("clip_id", sha1_expr("bytes").alias("sha"))
    flagged = dedup_flags_stateful(hashed)
    writer = (
        flagged.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

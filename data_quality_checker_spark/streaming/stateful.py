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


# ---------------------------------------------------------------------------
# Pure Structured-Streaming decisions pipeline (no foreachBatch)
# ---------------------------------------------------------------------------

def _flat_predicate_stream(clips: DataFrame, cfg, dur_bounds):
    """Streaming-safe enrich + rule flattening: every NON-duplicate rule
    predicate becomes a boolean column over one UDF-enriched projection.

    Differences vs the batch DAG (both deliberate, both documented):
    * audio stats are computed per ROW — the batch pipeline's
      decode-once-per-distinct-payload optimization needs a per-batch
      aggregate, which the pure-streaming form trades away (the
      foreachBatch path in incremental.py keeps it);
    * the IQR duration fence (dur_bounds) is calibration state passed in,
      exactly as in incremental.py.
    """
    from ..config import DEFAULT_CONFIG
    from ..functions.udfs import get_udfs
    from ..operators.rules import build_rules
    from pyspark.sql import functions as F

    cfg = cfg or DEFAULT_CONFIG
    udfs = get_udfs()
    enriched = clips.select(
        "clip_id",
        "sr_hz",
        "dur_ms",
        "codec",
        "transcript",
        sha1_expr("bytes").alias("sha"),
        udfs["audio_stats"](F.col("bytes"), F.col("codec"), F.col("sr_hz")).alias("audio"),
        udfs["langid"](F.col("transcript")).alias("langid"),
        udfs["perplexity"](F.col("transcript")).alias("ppl"),
        udfs["scrub"](F.col("transcript")).alias("scrub"),
    )
    rules = build_rules(cfg, dur_bounds)
    fired_cols = [
        F.coalesce(r.predicate, F.lit(False)).alias(f"fired_{r.name}")
        for r in rules
        if r.name != "duplicate"
    ]
    return enriched.select(
        "clip_id",
        "sha",
        F.when(F.col("transcript").isNotNull(), F.col("scrub")["scrubbed"]).alias(
            "scrubbed_transcript"
        ),
        F.col("langid")["lang"].alias("lang"),
        F.col("langid")["conf"].alias("lang_conf"),
        F.col("ppl").alias("perplexity"),
        F.col("audio")["clip_ratio"].alias("clip_ratio"),
        *fired_cols,
    ), rules


def _decisions_from_flags(flagged: DataFrame, rules) -> DataFrame:
    """Post-state assembly: keep / rules_fired (name-sorted, identical to
    operators.rules.rules_fired_expr) from the flattened booleans + the
    managed-state duplicate flag."""
    from pyspark.sql import functions as F

    def fired(r):
        return F.col("is_duplicate") if r.name == "duplicate" else F.col(f"fired_{r.name}")

    arr = F.filter(
        F.array(*[F.when(fired(r), F.lit(r.name)).otherwise(F.lit(None)) for r in rules]),
        lambda x: x.isNotNull(),
    )
    dropped = F.lit(False)
    for r in rules:
        if r.drops:
            dropped = dropped | F.coalesce(fired(r), F.lit(False))
    return flagged.select(
        "clip_id",
        (~dropped).alias("keep"),
        arr.alias("rules_fired"),
        "scrubbed_transcript",
        "lang",
        "lang_conf",
        "perplexity",
        "clip_ratio",
    )


def stream_decisions_stateful(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg=None,
    dur_bounds: tuple[float, float] | None = None,
    available_now: bool = True,
):
    """End-to-end decisions as ONE Structured-Streaming query — no
    foreachBatch, no side tables: file source → Arrow UDF enrich →
    flattened rule predicates → ``applyInPandasWithState`` duplicate
    flag (engine-managed per-sha keeper) → keep/rules_fired assembly →
    parquet sink. The engine owns replay/exactly-once for both the state
    and the sink commit log. Keep/drop and rules_fired match the batch
    pipeline exactly (test_streaming.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    flat, rules = _flat_predicate_stream(stream, cfg, dur_bounds)

    out_schema = StructType(
        list(flat.schema.fields) + [StructField("is_duplicate", BooleanType(), False)]
    )
    flat_cols = [f.name for f in flat.schema.fields]

    def passthrough_state(key, pdfs, state: GroupState):
        (sha,) = key
        import pandas as pd

        parts = [pdf for pdf in pdfs]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if state.exists:
            (keeper,) = state.get
        else:
            keeper = pdf["clip_id"].min()
            state.update((keeper,))
        pdf = pdf[flat_cols]
        pdf["is_duplicate"] = pdf["clip_id"] != keeper
        yield pdf

    with_sha = flat.where("sha IS NOT NULL")
    flagged = with_sha.groupBy("sha").applyInPandasWithState(
        passthrough_state,
        outputStructType=out_schema,
        stateStructType=KEEPER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    no_sha = flat.where("sha IS NULL").withColumn("is_duplicate", F.lit(False))
    decisions = _decisions_from_flags(flagged.unionByName(no_sha), rules)

    writer = (
        decisions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Watermarked event-time windows (late-data handling)
# ---------------------------------------------------------------------------

def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed counts with a watermark — the standard
    late-data pattern (readStream → withWatermark → window agg): rows
    later than ``watermark`` behind the max seen event time are dropped
    and their window's state is eventually evicted, which is what bounds
    state size on an unbounded stream. → (window_start, window_end,
    [key], n). Works identically on a batch frame (Spark evaluates
    window() the same way), so tests compare stream vs batch output."""
    from pyspark.sql import functions as F

    win = F.window(F.col(ts_col), window, slide or window)
    grouped = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    keys = [win] + ([F.col(key_col)] if key_col else [])
    return (
        grouped.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *([key_col] if key_col else []),
            "n",
        )
    )

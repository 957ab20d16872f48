"""Streaming ingest tests: incremental scoring with cross-batch dedup
state must reproduce the batch pipeline's keep/drop decisions when files
arrive in clip_id order."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.pipeline import run_pipeline
from data_quality_checker_spark.streaming.incremental import (
    process_increment,
    read_registry,
    stream_quality_filter,
)


@pytest.fixture(scope="module")
def halves(spark, clips_pdf, tmp_path_factory):
    """Corpus split into two parquet files by clip_id order (earlier ids
    arrive first — the deterministic-keeper precondition)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("stream_in")
    pdf = clips_pdf.drop(columns=["defect"]).sort_values("clip_id").reset_index(drop=True)
    mid = len(pdf) // 2
    for i, chunk in enumerate((pdf.iloc[:mid], pdf.iloc[mid:])):
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            str(d / f"part-{i}.parquet"),
        )
    return str(d)


def _batch_decisions_no_outlier(spark, clips_df):
    """Batch reference: same pipeline with dur_bounds=None (streaming has
    no global fence; dur_outlier is advisory so keep/drop is unaffected)."""
    from data_quality_checker_spark.pipeline import decide, enrich

    enriched = enrich(clips_df)
    return decide(enriched, dur_bounds=None, clips=clips_df)


def test_incremental_matches_batch(spark, clips_df, halves, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("stream_state"))
    files = sorted(glob.glob(os.path.join(halves, "*.parquet")))
    got = {}
    for bid, f in enumerate(files):
        batch = spark.read.parquet(f)
        dec = process_increment(spark, batch, state, bid)
        for r in dec.collect():
            got[r["clip_id"]] = (r["keep"], tuple(r["rules_fired"]))

    expected = {
        r["clip_id"]: (r["keep"], tuple(r["rules_fired"]))
        for r in _batch_decisions_no_outlier(spark, clips_df).collect()
    }
    assert got == expected


def test_increment_idempotent_per_batch(spark, halves, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("stream_state2"))
    f = sorted(glob.glob(os.path.join(halves, "*.parquet")))[0]
    batch = spark.read.parquet(f)
    process_increment(spark, batch, state, 0).count()
    n1 = read_registry(spark, state).count()
    # replay of the same batch_id must not grow the registry
    process_increment(spark, batch, state, 0).count()
    n2 = read_registry(spark, state).count()
    assert n1 == n2


def test_streaming_query_end_to_end(spark, clips_df, halves, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    state = str(tmp_path_factory.mktemp("stream_state3"))
    q = stream_quality_filter(spark, halves, out, ckpt, state)
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.count() == clips_df.count()
    assert got.select("clip_id").distinct().count() == clips_df.count()
    # cross-batch dedup engaged: some duplicates must be flagged
    n_dups = got.where(F.array_contains("rules_fired", "duplicate")).count()
    assert n_dups > 0


def test_registry_read_is_bucket_pruned(spark, halves, tmp_path_factory):
    """The per-batch registry read must touch ONLY the sha-buckets present
    in the batch (VERDICT r1 item 6). Proof: after the first batch, plant
    a CORRUPT parquet file in a registry bucket the second batch's shas do
    not hash into — if the read were unbounded it would crash on it."""
    from data_quality_checker_spark.operators.dedup import sha1_expr
    from data_quality_checker_spark.streaming.incremental import sha_bucket_expr

    state = str(tmp_path_factory.mktemp("stream_state4"))
    files = sorted(glob.glob(os.path.join(halves, "*.parquet")))
    b0 = spark.read.parquet(files[0])
    # explicit fan-out override (first tick pins it): with the derived
    # sandbox-sized count every bucket would be occupied and no foreign
    # bucket would exist to plant the corrupt file in
    process_increment(spark, b0, state, 0, n_buckets=256).count()

    from data_quality_checker_spark.streaming.incremental import (
        load_registry_meta,
    )

    n_bkt = load_registry_meta(state)["n_sha_buckets"]
    assert n_bkt == 256  # the explicit override was pinned
    b1 = spark.read.parquet(files[1])
    used = {
        r["b"]
        for r in b1.select(sha1_expr("bytes").alias("sha"))
        .where(F.col("sha").isNotNull())
        .select(sha_bucket_expr("sha", n_bkt).alias("b"))
        .distinct()
        .collect()
    }
    foreign = next(b for b in range(n_bkt) if b not in used)
    bad_dir = os.path.join(state, "sha_registry", f"sbkt={foreign}")
    os.makedirs(bad_dir, exist_ok=True)
    with open(os.path.join(bad_dir, "part-corrupt.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    # would raise on an unpruned scan; must succeed on a pruned one
    process_increment(spark, b1, state, 1).count()


def test_output_replay_is_idempotent(spark, halves, tmp_path_factory):
    """foreachBatch is at-least-once: replaying a batch (crash between the
    output write and the checkpoint commit) must not duplicate decision
    rows (ADVICE r1)."""
    from data_quality_checker_spark.streaming.incremental import process_and_write

    state = str(tmp_path_factory.mktemp("stream_state5"))
    out = str(tmp_path_factory.mktemp("stream_out5"))
    f = sorted(glob.glob(os.path.join(halves, "*.parquet")))[0]
    batch = spark.read.parquet(f)
    process_and_write(spark, batch, 0, state, out)
    n1 = spark.read.parquet(out).count()
    process_and_write(spark, batch, 0, state, out)  # replay
    got = spark.read.parquet(out)
    assert got.count() == n1
    assert got.select("clip_id").distinct().count() == n1


def test_registry_compaction_bounds_file_count(
    spark, clips_pdf, tmp_path_factory, monkeypatch
):
    """VERDICT r2 item 3: per-batch appends must NOT grow a registry
    bucket's file count O(batches). Force every sha into ONE bucket
    (N_SHA_BUCKETS=1), run 24 micro-batches, and require the hot bucket
    to end bounded by MAX_BUCKET_FILES — with no registered sha lost."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import data_quality_checker_spark.streaming.incremental as inc

    monkeypatch.setattr(inc, "N_SHA_BUCKETS", 1)
    state = str(tmp_path_factory.mktemp("compact_state"))
    src = tmp_path_factory.mktemp("compact_in")

    pdf = (
        clips_pdf.drop(columns=["defect"])
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    n_batches = 24
    chunk = max(1, len(pdf) // n_batches)
    for bid in range(n_batches):
        part = pdf.iloc[bid * chunk : (bid + 1) * chunk]
        if part.empty:
            break
        f = str(src / f"b{bid}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), f)
        # not consuming decisions: only the registry append is eager
        inc.process_increment(spark, spark.read.parquet(f), state, bid)

    bucket = os.path.join(state, "sha_registry", "sbkt=0")
    n_files = sum(1 for f in os.listdir(bucket) if f.endswith(".parquet"))
    assert n_files <= inc.MAX_BUCKET_FILES, n_files

    # compaction must preserve the registry exactly: one keeper per
    # distinct non-null sha across the whole corpus
    from data_quality_checker_spark.operators.dedup import sha1_expr

    reg = inc.read_registry(spark, state)
    n_shas = (
        spark.read.parquet(str(src))
        .select(sha1_expr("bytes").alias("sha"))
        .where(F.col("sha").isNotNull())
        .distinct()
        .count()
    )
    assert reg.count() == n_shas
    assert reg.select("sha").distinct().count() == n_shas


def test_stateful_dedup_matches_registry_semantics(spark, clips_df, halves, tmp_path_factory):
    """applyInPandasWithState dedup (engine-managed state) must agree
    with the registry-based path: first-seen batch wins, min clip_id
    within a batch, null-sha rows pass through unflagged."""
    from data_quality_checker_spark.operators.dedup import sha1_expr
    from data_quality_checker_spark.streaming.stateful import stream_dedup_flags

    out = str(tmp_path_factory.mktemp("state_out"))
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))
    q = stream_dedup_flags(spark, halves, out, ckpt)
    q.awaitTermination(300)

    got = {r["clip_id"]: (r["is_duplicate"], r["keeper_clip_id"])
           for r in spark.read.parquet(out).collect()}
    assert len(got) == clips_df.count()

    # batch expectation: files arrive in clip_id order, so global keeper
    # = min clip_id per sha — identical to the batch pipeline's keepers
    hashed = clips_df.select("clip_id", sha1_expr("bytes").alias("sha"))
    expected = {}
    keepers = {r["sha"]: r["k"] for r in
               hashed.where(F.col("sha").isNotNull())
               .groupBy("sha").agg(F.min("clip_id").alias("k")).collect()}
    for r in hashed.collect():
        if r["sha"] is None:
            expected[r["clip_id"]] = (False, None)
        else:
            k = keepers[r["sha"]]
            expected[r["clip_id"]] = (r["clip_id"] != k, k)
    assert got == expected


def test_pure_streaming_decisions_match_batch(spark, clips_df, halves, tmp_path_factory):
    """The no-foreachBatch pipeline (UDF enrich -> flattened predicates ->
    applyInPandasWithState duplicate flag -> assembly) must reproduce the
    batch pipeline's keep + rules_fired + scrubbed transcript exactly."""
    from data_quality_checker_spark.streaming.stateful import stream_decisions_stateful

    out = str(tmp_path_factory.mktemp("pure_out"))
    ckpt = str(tmp_path_factory.mktemp("pure_ckpt"))
    q = stream_decisions_stateful(spark, halves, out, ckpt)
    q.awaitTermination(300)

    got = {
        r["clip_id"]: (r["keep"], tuple(r["rules_fired"]), r["scrubbed_transcript"])
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        r["clip_id"]: (r["keep"], tuple(r["rules_fired"]), r["scrubbed_transcript"])
        for r in _batch_decisions_no_outlier(spark, clips_df).collect()
    }
    assert got == expected


def test_watermarked_window_counts_match_batch(spark, tmp_path_factory):
    """Watermark + event-time window over a file stream: with all data
    within the watermark, the streamed windowed counts equal the batch
    windowed counts (append mode emits each window once it is final)."""
    import datetime as dt

    from data_quality_checker_spark.streaming.stateful import windowed_event_counts

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=m), "click" if m % 2 == 0 else "view")
        for m in range(0, 45)
    ]
    d = tmp_path_factory.mktemp("ev_in")
    bdf = spark.createDataFrame(rows, "ts timestamp, event_type string")
    bdf.coalesce(2).write.parquet(str(d / "events"))

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(
        str(d / "events")
    )
    out = str(tmp_path_factory.mktemp("ev_out"))
    ckpt = str(tmp_path_factory.mktemp("ev_ckpt"))
    q = (
        windowed_event_counts(stream, window="10 minutes", watermark="5 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in windowed_event_counts(bdf, window="10 minutes").collect()
    }
    # append mode withholds windows not yet closed by the watermark: every
    # emitted window must match batch, and most windows must have emitted
    assert got
    for k, v in got.items():
        assert expected[k] == v
    closed = {k for k in expected if k[0] < rows[-1][0] - dt.timedelta(minutes=15)}
    assert closed <= set(got)


def test_multi_batch_streaming_keeps_all_batches(spark, clips_df, tmp_path_factory):
    """Regression: with >maxFilesPerTrigger input files the stream runs
    MULTIPLE micro-batches; every batch's decisions partition must
    survive (a static-overwrite write would truncate all but the last —
    the conf must reach the micro-batch's cloned session)."""
    src = str(tmp_path_factory.mktemp("many_in") / "clips")
    clips_df.repartition(24).write.parquet(src)
    out = str(tmp_path_factory.mktemp("many_out"))
    ckpt = str(tmp_path_factory.mktemp("many_ckpt"))
    state = str(tmp_path_factory.mktemp("many_state"))
    q = stream_quality_filter(spark, src, out, ckpt, state)
    q.awaitTermination(300)
    dec = spark.read.parquet(out)
    batches = [r["batch_id"] for r in dec.select("batch_id").distinct().collect()]
    assert len(batches) >= 3, batches
    assert dec.count() == clips_df.count()
    assert dec.select("clip_id").distinct().count() == clips_df.count()
    # cross-batch dedup invariant: exactly group_size-1 duplicates per sha
    # group, whatever the batch arrival order
    from data_quality_checker_spark.operators.dedup import sha1_expr

    groups = (
        clips_df.select(sha1_expr("bytes").alias("sha"))
        .where(F.col("sha").isNotNull())
        .groupBy("sha")
        .count()
    )
    expected_dups = sum(r["count"] - 1 for r in groups.collect())
    n_dup_flagged = dec.where(F.array_contains("rules_fired", "duplicate")).count()
    assert n_dup_flagged == expected_dups > 0


def test_pure_streaming_multi_batch_dedup_consistency(spark, clips_df, tmp_path_factory):
    """Across MULTIPLE micro-batches with arbitrary file order, the
    managed-state dedup must flag exactly (group_size - 1) duplicates per
    sha group — one keeper each, regardless of which batch saw the group
    first (the keeper identity is batch-order-dependent; the count is
    not)."""
    from data_quality_checker_spark.operators.dedup import sha1_expr
    from data_quality_checker_spark.streaming.stateful import stream_decisions_stateful

    src = str(tmp_path_factory.mktemp("pure_many_in") / "clips")
    clips_df.repartition(24).write.parquet(src)
    out = str(tmp_path_factory.mktemp("pure_many_out"))
    ckpt = str(tmp_path_factory.mktemp("pure_many_ckpt"))
    q = stream_decisions_stateful(spark, src, out, ckpt)
    q.awaitTermination(300)

    dec = spark.read.parquet(out)
    assert dec.count() == clips_df.count()
    n_dup_flagged = dec.where(F.array_contains("rules_fired", "duplicate")).count()
    groups = (
        clips_df.select(sha1_expr("bytes").alias("sha"))
        .where(F.col("sha").isNotNull())
        .groupBy("sha")
        .count()
    )
    expected_dups = sum(r["count"] - 1 for r in groups.collect())
    assert n_dup_flagged == expected_dups
    assert expected_dups > 0


def test_bucket_count_pinning(tmp_path):
    """Registry fan-out derives from first-batch size, clamps to
    [MIN_REGISTRY_BUCKETS, N_SHA_BUCKETS], pins in registry_meta.json
    (later calls return the pinned value whatever they pass), and
    legacy registries (table dir without meta) pin the module global."""
    from data_quality_checker_spark.streaming.incremental import (
        MIN_REGISTRY_BUCKETS,
        N_SHA_BUCKETS,
        load_registry_meta,
        pin_bucket_count,
    )

    s = str(tmp_path / "s1")
    # small stream -> floor
    assert pin_bucket_count(s, "n_sha_buckets", "sha_registry", 500, 256) == 32
    # pinned: a later tick with a huge batch still gets 32
    assert pin_bucket_count(s, "n_sha_buckets", "sha_registry", 10**6, 256) == 32
    assert load_registry_meta(s)["n_sha_buckets"] == 32
    # second table key extends the same meta file
    assert pin_bucket_count(s, "n_fp_buckets", "fp_tokens", 2000, 256) == 32
    assert set(load_registry_meta(s)) == {"n_sha_buckets", "n_fp_buckets"}

    # production-sized first batch -> upper bound
    s2 = str(tmp_path / "s2")
    assert pin_bucket_count(s2, "n_sha_buckets", "sha_registry", 10**6, 256) == 256

    # thunk form (the lazy count) + mid-range derivation: 2^ceil
    s3 = str(tmp_path / "s3")
    assert pin_bucket_count(s3, "n_sha_buckets", "sha_registry", lambda: 6000, 256) == 128

    # legacy registry: table dir exists, no meta -> the old global is pinned
    s4 = tmp_path / "s4"
    (s4 / "sha_registry").mkdir(parents=True)
    assert (
        pin_bucket_count(str(s4), "n_sha_buckets", "sha_registry", 100, N_SHA_BUCKETS)
        == N_SHA_BUCKETS
    )

    # explicit override wins on first pin
    s5 = str(tmp_path / "s5")
    assert (
        pin_bucket_count(s5, "n_sha_buckets", "sha_registry", 100, 256, explicit=64)
        == 64
    )
    assert MIN_REGISTRY_BUCKETS == 32


def test_bucket_count_pinning_cross_thread(tmp_path):
    """The threaded tick pins the SHA key and the fp keys from two
    threads into ONE meta file on a fresh registry's first batch; the
    module lock makes the read-modify-write atomic so no key is lost
    (without it, one thread's meta.json write clobbers the other's)."""
    import threading

    from data_quality_checker_spark.streaming.incremental import (
        load_registry_meta,
        pin_bucket_count,
    )

    for trial in range(20):
        s = str(tmp_path / f"s{trial}")
        barrier = threading.Barrier(2)

        def _pin(key: str) -> None:
            barrier.wait()
            pin_bucket_count(s, key, key + "_tbl", 500, 256)

        threads = [
            threading.Thread(target=_pin, args=(k,))
            for k in ("n_sha_buckets", "n_fp_buckets")
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert set(load_registry_meta(s)) == {"n_sha_buckets", "n_fp_buckets"}, (
            f"lost a pin on trial {trial}"
        )

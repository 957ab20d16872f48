"""Bucketed-table layout: the co-located-join contract (run/layout.py).

Proves — against the EXECUTED plan, not prose — that two tables written
with the same (key, N) bucket spec join with zero Exchange and zero
per-partition Sort: the physical contract the Iceberg
``bucket(N, clip_id)`` DDL (run/ddl.py) promises at production scale.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.run.layout import cobucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_wh").as_posix()
    left = spark.range(0, 5000).select(
        F.format_string("clip_%08d", F.col("id")).alias("clip_id"),
        (F.col("id") % 2 == 0).alias("keep"),
    )
    right = spark.range(0, 5000).select(
        F.format_string("clip_%08d", F.col("id")).alias("clip_id"),
        (F.col("id") % 97).alias("severity_code"),
    )
    lt = write_bucketed(left, "decisions_b", n_buckets=8, database="dqc_test_layout", location=loc)
    rt = write_bucketed(right, "findings_b", n_buckets=8, database="dqc_test_layout", location=loc)
    yield lt, rt
    spark.sql("DROP TABLE IF EXISTS dqc_test_layout.decisions_b")
    spark.sql("DROP TABLE IF EXISTS dqc_test_layout.findings_b")
    spark.sql("DROP DATABASE IF EXISTS dqc_test_layout")


def test_cobucketed_join_no_exchange_no_sort(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, lt, rt)
        assert joined.count() == 5000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the whole point: co-located buckets, sorted files — neither an
        # Exchange nor a Sort anywhere in the executed join plan
        assert "Exchange" not in plan, plan
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sorted_bucketed_scans_scopes_derived_plans(spark, bucketed_tables):
    """cobucketed_join's plan capture covers only the returned frame —
    a DERIVED frame replans after the conf restore and regains the
    per-partition Sort (the documented caveat). sorted_bucketed_scans
    scopes the conf over a whole composition, keeping derived join
    plans Sort-free, and restores the conf on exit."""
    from data_quality_checker_spark.run.layout import sorted_bucketed_scans

    lt, rt = bucketed_tables
    key_conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def derived_plan():
            d = cobucketed_join(spark, lt, rt).groupBy("keep").agg(
                F.count(F.lit(1)).alias("n")
            )
            return d._jdf.queryExecution().executedPlan().toString()

        # outside the scope: the derived replan re-inserts the Sort
        assert "Sort " in derived_plan().replace("SortMergeJoin", "SMJ")
        with sorted_bucketed_scans(spark):
            assert spark.conf.get(key_conf) == "true"
            plan = derived_plan()
            assert "SortMergeJoin" in plan
            assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
        assert spark.conf.get(key_conf) == "false"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_baseline_shuffles(spark, bucketed_tables):
    """Control: the SAME join over plain (unbucketed) frames must shuffle —
    guards against the no-Exchange assertion passing vacuously (e.g. AQE
    folding everything into one partition)."""
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table(lt).repartition(8)  # strip the bucket spec
        b = spark.table(rt).repartition(8)
        plan = (
            a.join(b, "clip_id")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = collections.Counter(
        (r.clip_id, r.keep, r.severity_code)
        for r in cobucketed_join(spark, lt, rt).collect()
    )
    want = collections.Counter(
        (r.clip_id, r.keep, r.severity_code)
        for r in spark.table(lt).join(spark.table(rt).hint("shuffle_hash"), "clip_id").collect()
    )
    assert got == want


def test_publish_bucketed_run_join_is_colocated(
    spark, clips_pdf, tmp_path_factory
):
    """End-to-end: run the checkpointed job, publish its output as
    co-bucketed tables, and prove the downstream decisions ⋈ findings
    audit join is Exchange-free and loses no rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_quality_checker_spark.run.job import run_job
    from data_quality_checker_spark.run.layout import publish_bucketed_run

    corpus = str(tmp_path_factory.mktemp("pubcorpus") / "clips.parquet")
    pq.write_table(
        pa.Table.from_pandas(clips_pdf.drop(columns=["defect"]), preserve_index=False),
        corpus,
    )
    out = str(tmp_path_factory.mktemp("pubout"))
    loc = tmp_path_factory.mktemp("pub_wh").as_posix()
    run_job(spark, corpus, out, "pub-run.1")

    dt, ft = publish_bucketed_run(
        spark, out, "pub-run.1", n_buckets=8, database="dqc_test_pub", location=loc
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        audit = cobucketed_join(spark, dt, ft)
        n_findings = spark.table(ft).count()
        assert audit.count() == n_findings  # every finding has its decision
        plan = audit._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {dt}")
        spark.sql(f"DROP TABLE IF EXISTS {ft}")
        spark.sql("DROP DATABASE IF EXISTS dqc_test_pub")


def test_stats_reps_join_paths(spark, clips_pdf, tmp_path_factory):
    """audio_stats_table's representative-selection semi join, both
    regimes (VERDICT r3 item 5): the broadcast hint is SIZE-GATED, and
    the large-reps fallback (broadcast_reps=False) over a clip_id-
    bucketed corpus — the bucket(N, clip_id) Iceberg layout's sandbox
    analog — must (a) produce identical stats rows and (b) never shuffle
    the payload: the only clip_id-keyed Exchange allowed is on the slim
    reps side (rep_id)."""
    import collections

    from data_quality_checker_spark.pipeline import audio_stats_table, hashed_frame

    loc = tmp_path_factory.mktemp("reps_wh").as_posix()
    clips = spark.createDataFrame(clips_pdf.drop(columns=["defect"]))

    def stats_counter(df):
        rows = df.select(
            "sha", "codec", "sr_hz", F.to_json("audio").alias("audio_json")
        ).collect()
        return collections.Counter(
            (r.sha, r.codec, r.sr_hz, r.audio_json) for r in rows
        )

    hashed = hashed_frame(clips).persist()
    hashed.count()
    tbl = write_bucketed(
        clips, "clips_b", n_buckets=8, database="dqc_test_reps", location=loc
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bc = audio_stats_table(clips, hashed=hashed, broadcast_reps=True)
        clips_t = spark.table(tbl)
        hashed_t = hashed_frame(clips_t).persist()
        hashed_t.count()
        sh = audio_stats_table(clips_t, hashed=hashed_t, broadcast_reps=False)
        assert stats_counter(bc) == stats_counter(sh)

        bc_plan = bc._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in bc_plan, bc_plan[:1500]
        sh_plan = sh._jdf.queryExecution().executedPlan().toString()
        # the payload (bucketed by clip_id) must not move; the slim reps
        # side shuffles to the bucket partitioning (rep_id)
        assert "hashpartitioning(clip_id" not in sh_plan, sh_plan[:2000]
        assert "hashpartitioning(rep_id" in sh_plan, sh_plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        hashed.unpersist()
        spark.catalog.clearCache()  # hashed_t is persisted mid-test
        spark.sql("DROP TABLE IF EXISTS dqc_test_reps.clips_b")
        spark.sql("DROP DATABASE IF EXISTS dqc_test_reps")


def test_extra_severities_shadow_guard(spark):
    """findings_from_decisions must reject extra_severities keys that
    shadow a core rule up front (a map_concat DUPLICATED_MAP_KEY would
    otherwise surface mid-job under the default dedup policy)."""
    import pytest as _pytest

    from data_quality_checker_spark.pipeline import findings_from_decisions

    dec = spark.createDataFrame(
        [("c1", True, ["duplicate"])],
        "clip_id string, keep boolean, rules_fired array<string>",
    )
    with _pytest.raises(ValueError, match="duplicate"):
        findings_from_decisions(dec, extra_severities={"duplicate": "high"})
    # non-shadowing keys still work
    out = findings_from_decisions(
        dec, extra_severities={"content_duplicate": "medium"}
    )
    assert out.count() == 1


def test_one_file_per_bucket(spark, bucketed_tables):
    """The bucketBy small-files trap is handled: the pre-repartition makes
    each task own exactly one bucket, so N buckets → N data files."""
    lt, _ = bucketed_tables
    files = [
        r.asDict() for r in spark.sql(f"DESCRIBE TABLE EXTENDED {lt}").collect()
    ]
    loc = next(r["data_type"] for r in files if r["col_name"] == "Location")
    import glob
    import os

    data_files = [
        f
        for f in glob.glob(os.path.join(loc.removeprefix("file:"), "*"))
        if not os.path.basename(f).startswith(("_", "."))
    ]
    assert len(data_files) == 8, sorted(data_files)

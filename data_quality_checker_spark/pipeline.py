"""Pipeline assembly — one lazy DataFrame DAG from clips to decisions.

Shape (scale rationale inline):

  clips ──(scan A: clip_id+bytes → sha1, JVM only)──► hashed (slim, CACHED)
        ──(scan B: transcript cols only → langid/ppl/scrub UDFs)──► text
        ──(scan C: bytes of REPRESENTATIVE rows only → audio-stats UDF)──►
                                                        stats (per distinct key)
  hashed ──► dedup keepers (salted agg)   ─┐
  text ⋈ hashed (sha) ⋈ stats (key)       ─┴─► rules ──► decisions/findings

Why this shape survives 100 TB:
  * the heavy ``bytes`` column is scanned exactly twice (sha pass +
    representative pass) and NEVER shuffled, never cached, and crosses
    the JVM→Python Arrow boundary only for one representative per
    distinct (sha, codec, sr_hz) key — on a dedup-heavy corpus the
    Python-side decode work shrinks by the duplication factor, and even
    on a dup-free corpus nothing is decoded twice;
  * the text-scoring pass reads NO payload bytes (column pruning keeps
    the scan slim) — it is pure compute and scales linearly with cores
    (measured 0.87 scaling efficiency 8→32 cores, BENCH/BASELINE.md);
  * ``hashed`` is a few dozen bytes/row — cacheable at any scale — and
    feeds every consumer that needs (clip_id → sha): dedup keepers, the
    text join, lineage bucketing.

The reference runs ~10 sequential full scans over one in-memory frame
(src/core/validator.py:62-82); here Catalyst fuses every rule into one
whole-stage-codegen pass over the joined slim frames.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions.udfs import get_udfs
from .operators import metrics as metrics_ops
from .operators.dedup import keepers_by_sha, sha1_expr, with_duplicate_flag
from .operators.outliers import iqr_bounds
from .operators.rules import build_rules, keep_expr, rules_fired_expr, severity_map_expr


def hashed_frame(clips: DataFrame) -> DataFrame:
    """Scan A → (clip_id, sha, codec, sr_hz): the ONLY full sha1 pass
    over the payload. Slim enough to cache at any corpus scale; every
    sha consumer (dedup keepers, stats reps, text join) reuses it."""
    return clips.select(
        "clip_id", sha1_expr("bytes").alias("sha"), "codec", "sr_hz"
    )


def enrich_text(clips: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Scan B: text UDF pass over every clip — langid + perplexity +
    scrub. Reads NO payload bytes (sha joins in from ``hashed_frame``),
    so only transcript columns ride the Arrow batches: compute-bound,
    scales linearly with cores."""
    udfs = get_udfs()
    return clips.select(
        "clip_id",
        "sr_hz",
        "dur_ms",
        "codec",
        "transcript",
        udfs["langid"](F.col("transcript")).alias("langid"),
        udfs["perplexity"](F.col("transcript")).alias("ppl"),
        udfs["scrub"](F.col("transcript")).alias("scrub"),
    )


# Above this many representative keys, the reps side stops being
# broadcastable (~30 B/row → ~30 MB at the threshold; executors would
# each hold the whole table) and the semi join flips to a shuffled plan.
REPS_BROADCAST_MAX = 1_000_000


def audio_stats_table(
    clips: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    hashed: DataFrame | None = None,
    broadcast_reps: bool | None = None,
    with_fingerprints: bool = False,
) -> DataFrame:
    """Scan C → (sha, codec, sr_hz, audio struct): decoded stats per
    DISTINCT payload-decode key.

    Audio stats are a pure function of (bytes, codec, sr_hz), and a
    dedup-heavy corpus repeats payloads — so decode each distinct key
    ONCE (representative = min clip_id) and join the slim stats table
    back by key. Payload bytes cross the JVM→Python boundary only for
    representatives; duplicates cost one join probe, not a decode.

    Plan shape: reps is a tiny (key → rep clip_id) aggregate over the
    slim ``hashed`` frame (bytes never shuffle); representative rows are
    selected with a LEFT SEMI join on clip_id.

    ``broadcast_reps`` — SIZE-GATED, not unconditional: on a dup-free
    10^12-clip corpus reps has one row per distinct payload — billions
    of rows, not broadcastable. None (default) counts the reps aggregate
    when the ``hashed`` frame passed in is CACHED (one cheap job over
    the slim cache — run_pipeline's normal path) and broadcasts only
    under REPS_BROADCAST_MAX; above it, the hint is omitted and the
    semi join plans as a shuffle on clip_id — and when the corpus table
    is bucketed by clip_id (run/layout.write_bucketed, the sandbox
    analog of the BASELINE ``bucket(N, clip_id)`` Iceberg DDL), the
    payload side of that shuffle is pre-placed: only the slim reps side
    moves (tests/test_bucketed_layout.py::test_stats_reps_join_paths).
    On an UNCACHED hashed frame the count would cost a full payload sha
    scan, so the broadcast default is kept there (ad-hoc call sites);
    pass ``broadcast_reps=False`` explicitly to force the shuffled plan.

    ``with_fingerprints`` — compute the Philips content fingerprint
    (operators/audiofp) in the SAME decode pass and emit it alongside:
    output gains ``rep_id`` (the representative clip_id), ``n_subfp``
    and ``fp`` top-level columns while ``audio`` keeps its exact
    AUDIO_STATS_SCHEMA shape, so every stats consumer is unchanged and
    the content-dedup tier reads its fingerprints from here instead of
    paying a second full payload decode (the streaming tick's fix).
    """
    udfs = get_udfs()
    if hashed is None:
        hashed = hashed_frame(clips)
    reps = (
        hashed.where(F.col("sha").isNotNull())
        .groupBy("sha", "codec", "sr_hz")
        .agg(F.min("clip_id").alias("rep_id"))
    )
    if broadcast_reps is None:
        # short-circuiting probe, not a full count (the same discipline
        # as simdedup's size guard): CollectLimit stops the reduce side
        # after MAX+1 groups, so on the 10^12-row corpus the gate itself
        # never materializes the full reps aggregate it is guarding
        # against broadcasting
        if hashed.is_cached:
            probe = reps.select("rep_id").limit(REPS_BROADCAST_MAX + 1).count()
            broadcast_reps = probe <= REPS_BROADCAST_MAX
        else:
            broadcast_reps = True
    rep_ids = reps.select("rep_id")
    if broadcast_reps:
        rep_ids = F.broadcast(rep_ids)
    rep_rows = clips.where(F.col("bytes").isNotNull()).join(
        rep_ids,
        F.col("clip_id") == F.col("rep_id"),
        "left_semi",
    )
    if not with_fingerprints:
        return rep_rows.select(
            sha1_expr("bytes").alias("sha"),
            "codec",
            "sr_hz",
            udfs["audio_stats"](F.col("bytes"), F.col("codec"), F.col("sr_hz")).alias("audio"),
        )
    return (
        rep_rows.select(
            sha1_expr("bytes").alias("sha"),
            "codec",
            "sr_hz",
            F.col("clip_id").alias("rep_id"),
            udfs["audio_stats_fp"](
                F.col("bytes"), F.col("codec"), F.col("sr_hz")
            ).alias("_c"),
        ).select(
            "sha",
            "codec",
            "sr_hz",
            "rep_id",
            F.struct(
                "_c.n_samples",
                "_c.peak",
                "_c.rms",
                "_c.clip_ratio",
                "_c.decoded_ms",
                "_c.decode_ok",
            ).alias("audio"),
            F.col("_c.n_subfp").alias("n_subfp"),
            F.col("_c.fp").alias("fp"),
        )
    )


def enrich(
    clips: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    hashed: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Full enrichment: text pass ⋈ hashed (sha) ⋈ per-distinct-payload
    audio stats.

    Output is a slim frame (no bytes) safe to persist/shuffle. The stats
    join is null-safe on (sha, codec, sr_hz) — null sr_hz is a real key
    value for headerless PCM. Rows with null bytes miss the join: their
    ``audio`` struct is null, which the rules treat as not-decoded.

    ``stats`` — a precomputed audio_stats_table frame (possibly the
    with_fingerprints=True variant; only (sha, codec, sr_hz, audio) are
    read). Pass it when another consumer shares the decode pass — the
    streaming content-dedup tick decodes once for stats AND fingerprints.
    """
    if hashed is None:
        hashed = hashed_frame(clips)
    text = enrich_text(clips, cfg)
    if stats is None:
        stats = audio_stats_table(clips, cfg, hashed)
    else:
        stats = stats.select("sha", "codec", "sr_hz", "audio")
    # both sides descend from `clips`, so raw df["col"] refs would carry
    # the SAME attribute id (Spark resolves them via dataset-id metadata
    # but warns "trivially true equals predicate") — explicit aliases
    # make the two sides unambiguous
    ws = text.join(hashed.select("clip_id", "sha"), "clip_id").alias("ws")
    st = stats.alias("st")
    cond = (
        (F.col("ws.sha") == F.col("st.sha"))
        & F.col("ws.codec").eqNullSafe(F.col("st.codec"))
        & F.col("ws.sr_hz").eqNullSafe(F.col("st.sr_hz"))
    )
    return ws.join(st, cond, "left").select(
        F.col("ws.clip_id"),
        F.col("ws.sr_hz"),
        F.col("ws.dur_ms"),
        F.col("ws.codec"),
        F.col("ws.transcript"),
        F.col("ws.sha"),
        F.col("st.audio"),
        F.col("ws.langid"),
        F.col("ws.ppl"),
        F.col("ws.scrub"),
    )


def decide(
    enriched: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    dur_bounds: tuple[float, float] | None = None,
    clips: DataFrame | None = None,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """Rules over the enriched frame → per-clip decisions.

    Keeper sourcing, in preference order:
      * a frame already carrying ``is_duplicate`` (the streaming path
        flags against its cross-batch SHA registry) is used as-is;
      * ``hashed`` (the cached slim frame) — keepers cost one slim agg;
      * ``clips`` — keepers from a fresh JVM-only (clip_id, sha) scan
        (never from ``enriched``: an unpersisted enriched lineage would
        re-run the Arrow UDF passes just to find keepers);
      * fallback: the enriched frame itself (call sites that persist it).
    """
    if "is_duplicate" in enriched.columns:
        flagged = enriched
    elif hashed is not None or clips is not None:
        src = hashed if hashed is not None else hashed_frame(clips)
        keepers = keepers_by_sha(src.select("clip_id", "sha"), cfg)
        flagged = enriched.join(keepers, on="sha", how="left").withColumn(
            "is_duplicate",
            F.when(
                F.col("sha").isNotNull() & (F.col("clip_id") != F.col("keeper_clip_id")),
                F.lit(True),
            ).otherwise(F.lit(False)),
        ).drop("keeper_clip_id")
    else:
        flagged = with_duplicate_flag(enriched, cfg)
    rules = build_rules(cfg, dur_bounds)
    return flagged.select(
        "clip_id",
        keep_expr(rules).alias("keep"),
        rules_fired_expr(rules).alias("rules_fired"),
        F.when(F.col("transcript").isNotNull(), F.col("scrub")["scrubbed"]).alias(
            "scrubbed_transcript"
        ),
        F.col("langid")["lang"].alias("lang"),
        F.col("langid")["conf"].alias("lang_conf"),
        F.col("ppl").alias("perplexity"),
        F.col("audio")["clip_ratio"].alias("clip_ratio"),
    )


def findings_from_decisions(
    decisions: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    extra_severities: dict[str, str] | None = None,
) -> DataFrame:
    """Explode per-clip fired rules into the findings table (the issue-record
    analog, src/core/validator.py:20-45). ``extra_severities`` maps rules
    appended by post-passes outside the core rule set (e.g. the content
    dedup tier's ``content_duplicate``) to their severity. Keys shadowing
    a core rule are rejected up front: map_concat under the default
    ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` would otherwise throw an
    opaque DUPLICATED_MAP_KEY mid-job — and silently "overriding" a core
    severity is not this parameter's contract."""
    rules = build_rules(cfg)
    sev = severity_map_expr(rules)
    if extra_severities:
        clash = sorted(set(extra_severities) & {r.name for r in rules})
        if clash:
            raise ValueError(
                f"extra_severities must not shadow core rules: {clash} "
                "(core severities come from the rule definitions; use "
                "PipelineConfig to change them)"
            )
        pairs: list = []
        for k, v in sorted(extra_severities.items()):
            pairs.extend([F.lit(k), F.lit(v)])
        sev = F.map_concat(sev, F.create_map(*pairs))
    return decisions.select(
        "clip_id", F.explode("rules_fired").alias("rule")
    ).withColumn("severity", F.element_at(sev, F.col("rule")))


@dataclass
class PipelineResult:
    decisions: DataFrame
    findings: DataFrame
    summary: DataFrame
    dur_bounds: tuple[float, float] | None
    column_findings: DataFrame | None = None


def run_pipeline(
    spark: SparkSession,
    clips: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    persist: bool = True,
    with_column_findings: bool = False,
) -> PipelineResult:
    """End-to-end in-session run (tests / entry point). The spark-submit
    job with lineage/resume lives in run/job.py and shares these stages.

    ``persist`` caches the slim ``hashed`` frame (clip_id→sha — a few
    dozen bytes/row, cacheable at any corpus scale) so the sha pass runs
    once; the cache is materialized EAGERLY because two consumers in one
    action would otherwise race to fill it and run the sha scan twice.

    ``with_column_findings`` triggers two extra eager aggregate passes
    (the reference's dataset-level issue records) — off by default.
    """
    # tiny pre-pass: exact IQR fence over dur_ms only (column-pruned scan)
    bounds = iqr_bounds(
        clips, "dur_ms", cfg.outlier_iqr_mult, cfg.outlier_min_rows
    )
    hashed = hashed_frame(clips)
    if persist:
        hashed = hashed.persist(StorageLevel.MEMORY_AND_DISK)
        hashed.count()
    enriched = enrich(clips, cfg, hashed)
    decisions = decide(enriched, cfg, bounds, hashed=hashed)
    findings = findings_from_decisions(decisions, cfg)
    summ = metrics_ops.summary(findings)
    col_findings = (
        metrics_ops.column_findings(spark, clips, decisions, cfg)
        if with_column_findings
        else None
    )
    return PipelineResult(decisions, findings, summ, bounds, col_findings)

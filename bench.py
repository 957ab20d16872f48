"""Benchmark runner (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

Extra keys (informational, not part of the contract): clips/sec for the
flagship corpus pipeline and LSH-vs-exact ANN recall.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship corpus pipeline + one representative of each
# operator family (agg, quantile, window, join, set, dedup, similarity).
BENCH_QUERIES = [
    "clips_decisions",
    "clips_findings_summary",
    "null_counts",
    "dup_full_rows",
    "quantiles_price",
    "outlier_count_iqr",
    "groupby_day",
    "window_rank",
    "join_fk_count",
    "join_left_agg",
    "compare_days",
    "set_ops_users",
    "doc_quality",
    "doc_fingerprints",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "simhash_docs",
    "ngram_jaccard",
    "embed_neardup",
    "ann_topk",
    "ann_lsh_topk",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.basename(os.path.normpath(sf_dir))
    sf = float(base[2:]) if base.startswith("sf") else 0.1

    from data_quality_checker_spark import queries as registry
    from data_quality_checker_spark.session import get_spark

    spark = get_spark(app_name="dqc-bench")
    qs = registry.queries()

    # corpus synthesis is one-time setup, not query work — warm the cache
    registry._clips_path(sf_dir)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        # noop sink materializes every column; a bare count() would let
        # Catalyst prune deterministic UDF/computed columns from the plan
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = df.count()  # row count for reporting — outside the timed window
        timings[name] = round(dt, 3)
        total += dt
        if name == "clips_decisions":
            extras["clips"] = n
            extras["clips_per_sec"] = round(n / dt, 1)
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    # ANN recall: LSH hits / exact hits on identical queries
    try:
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in qs["ann_topk"](spark, sf_dir).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in qs["ann_lsh_topk"](spark, sf_dir).collect()
        }
        if exact:
            extras["ann_lsh_recall"] = round(len(exact & approx) / len(exact), 3)
    except Exception:
        pass

    out = {
        "metric": "total headline query wall-seconds (corpus pipeline + operator suite)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

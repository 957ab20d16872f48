"""Scaling-efficiency bench (the BASELINE.json two-cluster-size criterion,
sandbox proxy): the identical job + input at local[N] and local[4N],
reporting throughput at both and efficiency = (throughput_4N /
throughput_N) / 4. Results → BENCH/BASELINE.md.

Corpus: the deterministic sf0.1 synthetic corpus replicated R times with
remapped clip_ids (heavy duplicate skew included by construction — the
salted dedup path is exercised under exactly the hot-key regime it was
designed for), written once as many parquet files so scan parallelism is
file-granular (no repartition shuffle in the measured job).

Usage: python tools/bench_scaling.py [--replicas 8] [--small 8 --large 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(replicas: int) -> str:
    path = f"/tmp/dqc_scale_corpus_r{replicas}.parquet"
    if os.path.exists(path):
        return path
    from pyspark.sql import functions as F

    from data_quality_checker_spark.queries import _clips_path
    from data_quality_checker_spark.session import get_spark

    spark = get_spark(app_name="dqc-scale-corpus", master="local[8]")
    base = spark.read.parquet(_clips_path("/root/testdata/sf0.1"))
    parts = [
        base.withColumn("clip_id", F.concat(F.col("clip_id"), F.lit(f"_r{i:02d}")))
        for i in range(replicas)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(128).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def run_at(corpus: str, cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "_scale_worker.py"), corpus, str(cores)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    args = ap.parse_args()

    corpus = build_corpus(args.replicas)
    r_small = run_at(corpus, args.small)
    r_large = run_at(corpus, args.large)
    factor = args.large / args.small
    eff = (r_large["rows_per_sec"] / r_small["rows_per_sec"]) / factor
    result = {
        "corpus": corpus,
        "rows": r_small["rows"],
        "small": r_small,
        "large": r_large,
        "scaling_factor": factor,
        "efficiency": round(eff, 3),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result, indent=2))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# BENCH — scaling-efficiency evidence (BASELINE.json criterion)

North rule: throughput scaling efficiency ≥ 0.8 between N and 4N
executors. Sandbox proxy (no real cluster): the identical quality-filter
job on the identical input at `local[{args.small}]` vs `local[{args.large}]`,
fresh JVM per run, timing excludes session startup + worker warmup.

Corpus: deterministic sf0.1 synthetic clips corpus × {args.replicas} replicas
({r_small['rows']} rows, heavy duplicate skew by construction — the salted
two-phase SHA-1 dedup runs under its design regime).

| parallelism | wall (s) | clips/sec |
|---|---|---|
| local[{args.small}] | {r_small['seconds']} | {r_small['rows_per_sec']} |
| local[{args.large}] | {r_large['seconds']} | {r_large['rows_per_sec']} |

**Scaling efficiency = ({r_large['rows_per_sec']} / {r_small['rows_per_sec']}) / {factor:g} =
{result['efficiency']}** (target ≥ 0.8).

Measured {result['ts']} with `python tools/bench_scaling.py --replicas {args.replicas}`.
""")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()

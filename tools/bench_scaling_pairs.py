"""Interleaved-pair scaling bench — the drift-canceling form of
tools/bench_scaling.py (round-4 methodology, made reproducible), with
PER-LEG HOST CALIBRATION (round 5).

This host's load bursts swing any single leg ±30% — and round-5
measurement showed multi-core legs can degrade 2× while single-core
legs are unaffected (a hypervisor-steal mode that taxes concurrent
work specifically). Two defenses:

* legs alternate @small/@large so adjacent legs see the same host mode
  (round-4 design), and
* immediately before EVERY leg a 4-process sustained numpy probe runs
  and its dilation (4-proc wall / 1-proc wall, ideal 1.0) is recorded.
  A pair is "clean" when both its legs' probes are below the dilation
  threshold; the headline estimator is the median efficiency over
  clean pairs (all pairs disclosed in the JSON either way).

Usage:
  python tools/bench_scaling_pairs.py [--pairs 7] [--text-pairs 3]
      [--small 1 --large 4] [--replicas 96]
      [--clean-dilation 1.35] [--clean-target 5]
Writes BENCH/scaling_pairs_<tag>.json; does NOT touch BASELINE.md (the
markdown is hand-curated from the JSON).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import build_corpus, run_at, warm_cache  # noqa: E402


def _probe_work(_i: int) -> float:
    """~1.2 s of sustained float32 dot work (compute + 48 MB of memory
    traffic per pass — past LLC, so bandwidth participates). Timed
    INTERNALLY and returned as a rate (iters/sec) so pool fork/start
    overhead never contaminates the measurement."""
    import numpy as np

    a = np.ones(12_000_000, dtype=np.float32)
    t0 = time.time()
    s, it = 0.0, 0
    while time.time() - t0 < 1.2:
        s += float(a @ a)
        it += 1
    return it / (time.time() - t0)


def _cpu_stat() -> tuple[float, float]:
    """(busy, steal) jiffies from /proc/stat — busy = user+nice+system."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    vals = [float(x) for x in f[1:9]]
    return vals[0] + vals[1] + vals[2], vals[7]


def run_leg_with_steal(corpus, cores, workload):
    """run_at + the hypervisor-steal fraction DURING the leg:
    Δsteal/(Δbusy+Δsteal) from /proc/stat around the subprocess. On this
    sandbox VM steal spikes specifically under sustained multi-core load
    (measured 6-28% of 32 vCPUs while a local[4] leg demands ~5 — i.e.
    >50% of the leg's own cycles), which is what throttles @4 legs while
    leaving @1 legs untouched."""
    b0, s0 = _cpu_stat()
    t0 = time.time()
    r = run_at(corpus, cores, workload, repeats=1)
    wall = time.time() - t0
    b1, s1 = _cpu_stat()
    db, dst = b1 - b0, s1 - s0
    r["steal_frac"] = round(dst / (db + dst), 3) if (db + dst) > 0 else 0.0
    # effective busy cores DURING the leg: Δbusy jiffies / wall / USER_HZ.
    # The leg is this VM's only heavy workload, so this reads the host's
    # actual concurrency grant over the leg itself — the instrument the
    # before/after probes can't provide (run G pair 8: probe-clean,
    # steal ≤10%, yet the @4 leg ran 3.7× the clean band; busy-cores
    # distinguishes "granted 4 cores but starved of bandwidth" from
    # "never granted the cores"). Wall includes JVM startup (~10 s at
    # low CPU), so the figure slightly UNDERSTATES the grant during the
    # timed section — fine for a mode detector, disclosed here.
    hz = os.sysconf("SC_CLK_TCK")
    r["busy_cores"] = round(db / wall / hz, 2) if wall > 0 else None
    r["leg_wall_sec"] = round(wall, 1)
    return r


def host_probe(procs: int = 4) -> dict:
    """Dilation of `procs` concurrent sustained workers vs one:
    single-proc rate / mean concurrent per-proc rate. 1.0 = host grants
    full concurrency; round-5 bad windows measured 1.5-3×."""
    r1 = _probe_work(0)
    with mp.Pool(procs) as pool:
        rates = pool.map(_probe_work, range(procs))
    return {"calib_1p_rate": round(r1, 2),
            "calib_4p_rates": [round(r, 2) for r in rates],
            "dilation": round(r1 / (sum(rates) / len(rates)), 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=7)
    ap.add_argument("--text-pairs", type=int, default=3)
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--large", type=int, default=4)
    ap.add_argument("--replicas", type=int, default=96)
    ap.add_argument("--clean-dilation", type=float, default=1.35)
    ap.add_argument("--clean-target", type=int, default=0,
                    help="stop a workload early once this many clean pairs "
                         "exist (0 = run all --pairs)")
    ap.add_argument("--tag", default="r05")
    args = ap.parse_args()

    corpus = build_corpus(args.replicas)
    warm_cache(corpus)
    factor = args.large / args.small

    out = {
        "corpus": corpus,
        "small": args.small,
        "large": args.large,
        "scaling_factor": factor,
        "clean_dilation_threshold": args.clean_dilation,
        "pairs": {"full": [], "text": []},
    }
    for workload, n_pairs in (("full", args.pairs), ("text", args.text_pairs)):
        clean = 0
        for i in range(n_pairs):
            cal_s = host_probe()
            r_s = run_leg_with_steal(corpus, args.small, workload)
            cal_l = host_probe()
            r_l = run_leg_with_steal(corpus, args.large, workload)
            eff = (r_l["rows_per_sec"] / r_s["rows_per_sec"]) / factor
            out.setdefault(f"{workload}_rows", r_s.get("rows"))
            is_clean = (cal_s["dilation"] <= args.clean_dilation
                        and cal_l["dilation"] <= args.clean_dilation)
            # host-normalized: the large leg can capture at most
            # 4/dilation effective cores — eff × dilation isolates the
            # pipeline's software scaling from the host's concurrency
            # grant at that moment (disclosed alongside raw, never
            # substituted for it)
            pair = {
                "pair": i + 1,
                "small_sec": r_s["seconds"],
                "large_sec": r_l["seconds"],
                "small_rps": r_s["rows_per_sec"],
                "large_rps": r_l["rows_per_sec"],
                "efficiency": round(eff, 3),
                "efficiency_host_normalized": round(eff * cal_l["dilation"], 3),
                "steal_small": r_s.get("steal_frac"),
                "steal_large": r_l.get("steal_frac"),
                "busy_cores_small": r_s.get("busy_cores"),
                "busy_cores_large": r_l.get("busy_cores"),
                "calib_small": cal_s,
                "calib_large": cal_l,
                "clean_host": is_clean,
            }
            out["pairs"][workload].append(pair)
            print(json.dumps({"workload": workload, **pair}), flush=True)
            clean += int(is_clean)
            if args.clean_target and clean >= args.clean_target:
                break
        ps = out["pairs"][workload]
        if not ps:  # a workload run with 0 pairs has no summary
            continue
        effs = [p["efficiency"] for p in ps]
        ceffs = [p["efficiency"] for p in ps if p["clean_host"]]
        neffs = [p["efficiency_host_normalized"] for p in ps]
        out[f"{workload}_median_eff"] = round(statistics.median(effs), 3)
        out[f"{workload}_mean_eff"] = round(statistics.mean(effs), 3)
        out[f"{workload}_median_eff_host_normalized"] = round(
            statistics.median(neffs), 3)
        if ceffs:
            out[f"{workload}_clean_median_eff"] = round(statistics.median(ceffs), 3)
            out[f"{workload}_clean_pairs"] = len(ceffs)

    path = os.path.join(REPO, "BENCH", f"scaling_pairs_{args.tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "pairs"}))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()

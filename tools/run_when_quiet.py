"""Launch the scaling-pair bench only when the host bus is quiet.

Round-5 runs G–J established that this sandbox's sub-0.8 scaling pairs
are caused by neighbor DRAM pressure (full busy-core grants, ~0 steal,
clean single-proc calibration, yet multi-core legs 2–3× slow). Rather
than burn runs during a noisy window, this wrapper re-probes the bus on
an interval and starts `bench_scaling_pairs.py` only once the 4-proc
dilation probe reads clean twice in a row (the same instrument the
bench itself records per-leg).

Usage:
  python tools/run_when_quiet.py [--max-wait-min 90] [--dilation 1.25]
      [--interval-sec 300] -- [bench_scaling_pairs args...]
Exits 0 without running if the window never comes (prints WAITED_OUT),
so an unattended invocation can't record a knowingly-dirty run.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling_pairs import host_probe  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-wait-min", type=float, default=90.0)
    ap.add_argument("--dilation", type=float, default=1.25)
    ap.add_argument("--interval-sec", type=float, default=300.0)
    ap.add_argument("rest", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    rest = [a for a in args.rest if a != "--"]

    deadline = time.time() + args.max_wait_min * 60.0
    consecutive = 0
    while time.time() < deadline:
        d = host_probe()["dilation"]
        print(f"probe dilation={d:.3f} (clean<{args.dilation})", flush=True)
        consecutive = consecutive + 1 if d < args.dilation else 0
        if consecutive >= 2:
            cmd = [
                sys.executable,
                os.path.join(REPO, "tools", "bench_scaling_pairs.py"),
                *rest,
            ]
            print("QUIET — launching:", " ".join(cmd), flush=True)
            return subprocess.call(cmd)
        time.sleep(args.interval_sec)
    print("WAITED_OUT — no quiet window; nothing run", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

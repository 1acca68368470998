"""Memory-write bandwidth scaling probe: the box-side bound on any
allocation-heavy workload's N-vs-4N ratio.

Fresh-page numpy fills (allocate, fill, free — the same pattern as JVM
allocation churn) in 1 vs 4 separate PROCESSES (no GIL, no shared JVM):
whatever efficiency this probe reports is the ceiling the machine itself
imposes on 1→4-thread scaling of memory-write-bound work, independent of
any engine. Run it next to bench/scaling.py results to separate "the box
got a faster core" / "the box's bandwidth headroom shrank" from "the
engine regressed" — see BENCH/BASELINE.md's host-drift section.

Usage: python bench/bw_probe.py [--seconds 8] [--procs 4]
Appends one dated entry to BENCH/bw_probe.json.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "bw_probe.json")


def _writer(n_bytes: int, seconds: float, out: mp.Queue) -> None:
    t0 = time.time()
    written = 0
    while time.time() - t0 < seconds:
        a = np.empty(n_bytes, dtype=np.uint8)
        a.fill(7)
        written += n_bytes
        del a
    out.put(written / (time.time() - t0))


def run(procs: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_writer, args=(64 * 1024 * 1024, seconds, q)) for _ in range(procs)
    ]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--procs", type=int, default=4)
    args = ap.parse_args()
    b1 = run(1, args.seconds)
    bn = run(args.procs, args.seconds)
    entry = {
        "ts": int(time.time()),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "write_bw_1proc_GBps": round(b1 / 1e9, 2),
        f"write_bw_{args.procs}proc_GBps": round(bn / 1e9, 2),
        "bw_scaling_eff": round(bn / b1 / args.procs, 3),
        "procs": args.procs,
    }
    series = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            series = json.load(f)
    series.append(entry)
    with open(OUT, "w") as f:
        json.dump(series, f, indent=1)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()

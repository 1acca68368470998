"""Sorted-vs-late MOR merge strategy A/B at a chosen parallelism level.

Round 2 switched the MOR default to the late-materialization LWW after
+33-35% measurements at 1-8 cores — and the local[32] replay headline
regressed 34% in the same round. That could be the strategy (late's extra
groupBy/max pass may not pay off once the machine-wide bandwidth ceiling
binds at high thread counts) or box weather (BENCH/BASELINE.md documents
±30% VM drift; CDC-adjacent queries that never touch the strategy drifted
+17-32% the same round). This harness answers it the only way that
counts: the IDENTICAL binlog replayed with each strategy in fresh
subprocesses, INTERLEAVED (late/sorted per round, ratio within the round
so drift cancels), median of rounds.

Writes BENCH/mor_strategy_ab.json keyed by core count. LakeTable's
``strategy=None`` resolves to the measured winner — sorted at every
core count per this artifact; the default is hardcoded from it, so a
future re-measure that flips a level means editing merge_changes, not
just re-running this harness.

Usage: python bench/mor_ab.py [--cores 32] [--events 4000000] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import atexit
import shutil
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench._common import n_core_jvm_env  # noqa: E402
OUT = os.path.join(REPO, "BENCH", "mor_strategy_ab.json")


def run_strategy(binlog: str, workdir: str, cores: int, strategy: str, tag: str, profile: str) -> dict:
    env = n_core_jvm_env(cores)
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "replay_job.py"),
            "--binlog", binlog,
            "--table", os.path.join(workdir, f"state_{tag}"),
            "--checkpoint", os.path.join(workdir, f"ckpt_{tag}.json"),
            "--cores", str(cores),
            "--mode", "mor",
            "--compact-every", "4",
            "--fast-stats",
            "--strategy", strategy,
            "--profile", profile,
        ],
        capture_output=True, text=True, check=True, cwd=REPO, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--profile", choices=["throughput", "bandwidth"], default="throughput")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="mor_ab_")
    # multi-GB binlog + state tables: never strand them in /tmp
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    binlog = os.path.join(workdir, "binlog")
    subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "replay_job.py"),
            "--binlog", binlog,
            "--table", os.path.join(workdir, "state_gen"),
            "--checkpoint", os.path.join(workdir, "ckpt_gen.json"),
            "--generate", str(args.events),
            "--events-per-epoch", str(args.events // args.epochs),
            "--cores", str(args.cores),
            "--max-epochs", "0",
        ],
        capture_output=True, text=True, check=True, cwd=REPO,
    )

    rounds = []
    state_rows = set()
    for rnd in range(args.rounds):
        pair = {}
        for strategy in ("late", "sorted"):
            t0 = time.time()
            r = run_strategy(binlog, workdir, args.cores, strategy, f"{strategy}_r{rnd}", args.profile)
            pair[strategy] = {
                "events_per_sec": r["events_per_sec"],
                "wall_sec": round(time.time() - t0, 1),
            }
            state_rows.add(r["state_rows"])
        pair["late_over_sorted"] = round(
            pair["late"]["events_per_sec"] / pair["sorted"]["events_per_sec"], 3
        )
        rounds.append(pair)
        print(json.dumps({"round": rnd, **pair}), file=sys.stderr)
    assert len(state_rows) == 1, f"strategies diverged: {state_rows}"

    ratios = sorted(p["late_over_sorted"] for p in rounds)
    med = ratios[len(ratios) // 2]
    med_round = next(p for p in rounds if p["late_over_sorted"] == med)
    entry = {
        "events": args.events,
        "profile": args.profile,
        "rounds": args.rounds,
        "late_events_per_sec": med_round["late"]["events_per_sec"],
        "sorted_events_per_sec": med_round["sorted"]["events_per_sec"],
        "late_over_sorted_median": med,
        "late_over_sorted_rounds": ratios,
        "winner": "late" if med >= 1.0 else "sorted",
        "raw_rounds": rounds,
        "measured_at": time.strftime("%Y-%m-%d"),
    }
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    key = str(args.cores) if args.profile == "throughput" else f"{args.cores}@{args.profile}"
    doc[key] = entry
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"cores": args.cores, **{k: v for k, v in entry.items() if k != "raw_rounds"}}))


if __name__ == "__main__":
    main()

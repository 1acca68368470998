"""Measure per-epoch fixed driver cost and its amortization by
replay(epoch_batch=K).

Every epoch pays a serial driver toll regardless of size: the delta stats
scan job, merge planning + AQE broadcast build, the parquet footer reads,
and the snapshot/metadata commit (~seconds, BENCH/BASELINE.md's Amdahl
term). At 10^10 events with realistically small epochs this toll is the
scale killer — so replay can group up to K consecutive pending epochs into
ONE merge + ONE atomic commit. This harness replays the SAME binlog (many
small epochs) with epoch_batch=1 and epoch_batch=K in the same session and
reports the throughput delta plus the implied fixed cost per epoch.

Usage: python bench/epoch_overhead.py [--events 1600000] [--epochs 32]
       [--batch 8] [--cores 8]
Prints one JSON line -> also append-merged into BENCH/epoch_overhead.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fao_elt_pipelines_spark import binlog  # noqa: E402
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore  # noqa: E402
from fao_elt_pipelines_spark.lake.replay import replay  # noqa: E402
from fao_elt_pipelines_spark.lake.table import LakeTable  # noqa: E402
from fao_elt_pipelines_spark.session import get_spark  # noqa: E402
from scripts.replay_job import STATE_SCHEMA  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "epoch_overhead.json")


def run(spark, stored, workdir: str, tag: str, batch) -> tuple[float, int, int]:
    table = LakeTable.create(
        spark, os.path.join(workdir, f"state_{tag}"), STATE_SCHEMA, n_buckets=64
    )
    ckpt = CheckpointStore(os.path.join(workdir, f"ckpt_{tag}.json"))
    t0 = time.time()
    rep = replay(spark, stored, table, ckpt, mode="mor", compact_every=None,
                 epoch_batch=batch)
    dt = time.time() - t0
    rows = table.read().count()
    run.last_groups = len(table.snapshots())  # groups committed this run
    return round(dt, 2), rows, rep.events_in


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_600_000)
    ap.add_argument("--epochs", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()
    # argparse-only validity check: fail BEFORE the five multi-minute
    # replay runs, not after
    if -(-args.epochs // args.batch) >= args.epochs:
        raise SystemExit("--batch must be > 1 (batch 1 has no commit delta to measure)")

    spark = get_spark("epoch_overhead", cores=args.cores)
    workdir = tempfile.mkdtemp(prefix="epoch_ov_")
    try:
        events = binlog.change_events(
            spark, args.events, n_repos=1000,
            events_per_epoch=args.events // args.epochs,
            num_partitions=max(args.cores * 2, 8),
        )
        blp = os.path.join(workdir, "binlog")
        events.write.partitionBy("epoch").parquet(blp)
        stored = spark.read.parquet(blp)

        run(spark, stored, workdir, "warm", args.batch)  # JIT/codegen warmup
        # interleave to cancel drift: b1, bK, b1, bK — medians of 2 each
        t1a, r1a, _ = run(spark, stored, workdir, "b1_a", 1)
        tka, rka, _ = run(spark, stored, workdir, "bk_a", args.batch)
        taa, raa, _ = run(spark, stored, workdir, "auto_a", "auto")
        auto_groups = run.last_groups
        t1b, r1b, _ = run(spark, stored, workdir, "b1_b", 1)
        tkb, rkb, _ = run(spark, stored, workdir, "bk_b", args.batch)
        tab, rab, _ = run(spark, stored, workdir, "auto_b", "auto")
        assert len({r1a, rka, raa, r1b, rkb, rab}) == 1, "state diverged"
        t1, tk, ta = min(t1a, t1b), min(tka, tkb), min(taa, tab)
        n_groups = -(-args.epochs // args.batch)
        # T = events_work + fixed * n_commits  (events_work identical)
        fixed = (t1 - tk) / (args.epochs - n_groups)
        doc = {
            "events": args.events,
            "epochs": args.epochs,
            "batch": args.batch,
            "cores": args.cores,
            "batch1_sec": [t1a, t1b],
            "batchK_sec": [tka, tkb],
            "speedup": round(t1 / tk, 2),
            "est_fixed_sec_per_epoch": round(fixed, 3),
            "events_per_sec_batch1": round(args.events / t1, 1),
            "events_per_sec_batchK": round(args.events / tk, 1),
            "auto_sec": [taa, tab],
            "auto_groups": auto_groups,
            "auto_resolved_batch": -(-args.epochs // auto_groups),
            "events_per_sec_auto": round(args.events / ta, 1),
            "speedup_auto": round(t1 / ta, 2),
            "measured_at": time.strftime("%Y-%m-%d"),
        }
        hist = []
        if os.path.exists(OUT):
            with open(OUT) as f:
                hist = json.load(f)
        hist.append(doc)
        with open(OUT, "w") as f:
            json.dump(hist, f, indent=1)
        print(json.dumps(doc))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

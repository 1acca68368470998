"""Measure the write-audit-publish gate's overhead on the replay path.

WAP adds two metadata-only CAS commits per epoch group (staging-branch
reset + publish fast-forward) plus whatever the audit itself reads; the
summary-only audits (min-rows, quarantine-ratio) read no data. This
harness replays the SAME binlog with and without the gate, interleaved
A/B/A/B so box weather hits both arms equally, and reports medians.

Usage: python bench/wap_overhead.py [--events 2000000] [--epochs 8]
       [--cores 16] [--trials 3]
Prints one JSON line and (with --out) writes it to BENCH/wap_overhead.json.
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
from fao_elt_pipelines_spark.lake.wap import basic_audit  # noqa: E402
from fao_elt_pipelines_spark.session import get_spark  # noqa: E402
from scripts.replay_job import STATE_SCHEMA  # noqa: E402


def run_once(spark, stored, workdir: str, tag: str, audit) -> float:
    table = LakeTable.create(
        spark, os.path.join(workdir, f"t_{tag}"), STATE_SCHEMA, n_buckets=64
    )
    ckpt = CheckpointStore(os.path.join(workdir, f"c_{tag}.json"))
    t0 = time.time()
    replay(spark, stored, table, ckpt, mode="mor", compact_every=4, wap_audit=audit)
    dt = time.time() - t0
    shutil.rmtree(os.path.join(workdir, f"t_{tag}"), ignore_errors=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    spark = get_spark("wap_overhead", cores=args.cores)
    workdir = tempfile.mkdtemp(prefix="wap_ab_")
    try:
        events = binlog.change_events(
            spark, args.events, n_repos=1000,
            events_per_epoch=args.events // args.epochs,
            num_partitions=args.cores * 2,
        )
        blpath = os.path.join(workdir, "binlog")
        events.write.partitionBy("epoch").parquet(blpath)
        stored = spark.read.parquet(blpath)
        audit = basic_audit(min_rows_written=1, max_quarantine_ratio=0.5)

        plain, wap = [], []
        run_once(spark, stored, workdir, "warm", None)  # VM first-touch warmup
        for i in range(args.trials):
            plain.append(run_once(spark, stored, workdir, f"p{i}", None))
            wap.append(run_once(spark, stored, workdir, f"w{i}", audit))
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        out = {
            "metric": "wap_overhead",
            "events": args.events,
            "epochs": args.epochs,
            "cores": args.cores,
            "audit": "basic(min_rows, quarantine_ratio) — summary-only, no data IO",
            "plain_sec": [round(x, 2) for x in plain],
            "wap_sec": [round(x, 2) for x in wap],
            "plain_median_sec": round(med(plain), 2),
            "wap_median_sec": round(med(wap), 2),
            "overhead_pct": round(100 * (med(wap) / med(plain) - 1), 1),
            "overhead_sec_per_epoch": round((med(wap) - med(plain)) / args.epochs, 3),
            "methodology": "interleaved plain/WAP trials on one binlog, one "
            "warmup run excluded, medians reported",
        }
        line = json.dumps(out)
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

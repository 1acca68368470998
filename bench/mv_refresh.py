"""Measure incremental-vs-full materialized-view refresh cost (lake/mv.py).

The scale argument for incremental view maintenance is that refresh cost
tracks the DELTA, not the table: at 10^10 rows a per-epoch gold recompute
is a full-table scan, while the delta algebra reads only the change
interval plus the touched buckets of two snapshots. This script builds a
replayed table, then times (a) a full recompute refresh and (b) an
incremental refresh after a small merge touching a bounded key set, and
reports the ratio. Run at growing --events to show the full cost growing
with the table while the incremental cost stays flat.

Three regimes (documented in the artifact — no silent caps):

- POINT deltas (keys ≲ n_buckets/4): bucket pruning bounds the
  before/after images to a few buckets → incremental wins outright, and
  the win grows linearly with table size. This is the regime this VM can
  demonstrate (per-bucket files are single-row-group at sf-bench sizes).
- MODERATE deltas (keys ≫ n_buckets, still ≪ table): every bucket is
  touched, so the win depends on parquet ROW-GROUP pruning via the
  pushed `repo IN (...)` predicate over key-sorted files — real at
  10^10 rows where each bucket file has thousands of row groups,
  invisible here where each bucket file is one row group; expect ≈0.5×
  in this sandbox (two full scans vs one) and record it as such.
- LARGE intervals (≥30% of table rows): refresh auto-falls-back to a
  full recompute (lake/mv.py FULL_FALLBACK_RATIO).

Usage: python bench/mv_refresh.py [--events 4000000] [--delta-keys 16,2000]
                                  [--cores 32] [--n-buckets 64] [--trials 3]
Prints one JSON line per delta size and appends them to
BENCH/mv_refresh.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fao_elt_pipelines_spark import binlog  # noqa: E402
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore  # noqa: E402
from fao_elt_pipelines_spark.lake.mv import IncrementalGoldView, _contrib  # noqa: E402
from fao_elt_pipelines_spark.lake.replay import replay  # noqa: E402
from fao_elt_pipelines_spark.lake.table import LakeTable  # noqa: E402
from fao_elt_pipelines_spark.session import get_spark  # noqa: E402
from scripts.replay_job import STATE_SCHEMA  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--delta-keys", default="16,2000",
                    help="comma list of delta sizes (one artifact entry each)")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--n-repos", type=int, default=10_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("mv_refresh_bench", cores=args.cores)
    work = tempfile.mkdtemp(prefix="mvbench-")
    table = LakeTable.create(
        spark, os.path.join(work, "t"), STATE_SCHEMA, n_buckets=args.n_buckets
    )
    events = binlog.change_events(
        spark, args.events, n_repos=args.n_repos, events_per_epoch=args.events
    )
    replay(
        spark, events, table, CheckpointStore(os.path.join(work, "ckpt.json")),
        mode="mor",
    )
    view = IncrementalGoldView(spark, table, os.path.join(work, "mv"))
    view.refresh()  # initial full compute (untimed warmup of the scan path)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    seq0 = args.events
    epoch = 1000
    outs = []
    for dk in [int(x) for x in str(args.delta_keys).split(",")]:
        full_times, inc_times = [], []
        for _ in range(args.trials):
            t0 = time.time()
            view.refresh(full=True)
            full_times.append(time.time() - t0)

            # dk fresh upserts in one merge
            delta = (
                spark.range(seq0, seq0 + dk)
                .select(
                    F.col("id").alias("seq"),
                    F.lit("update").alias("op"),
                    F.concat(
                        F.lit("repo_"), (F.col("id") % args.n_repos).cast("string")
                    ).alias("repo"),
                    F.concat(
                        F.lit("src/delta_"), F.col("id").cast("string"), F.lit(".py")
                    ).alias("path"),
                    F.md5(F.col("id").cast("string")).alias("commit"),
                    F.lit("py").alias("lang"),
                    F.md5(F.concat(F.lit("c"), F.col("id").cast("string"))).alias("content"),
                )
            )
            seq0 += dk
            table.merge_changes(delta, epoch_id=epoch, mode="mor")
            epoch += 1
            t0 = time.time()
            rep = view.refresh()
            inc_times.append(time.time() - t0)
            assert rep["mode"] == "incremental", rep

        # correctness backstop: the incrementally-maintained state must
        # equal a full recompute at every config boundary
        got = {tuple(r) for r in view.read().collect()}
        want = {tuple(r) for r in _contrib(table.read()).collect()}
        assert got == want, "incremental state diverged from full recompute"

        outs.append(
            {
                "events": args.events,
                "delta_keys": dk,
                "cores": args.cores,
                "n_buckets": args.n_buckets,
                "trials": args.trials,
                "full_refresh_sec": round(med(full_times), 3),
                "incremental_refresh_sec": round(med(inc_times), 3),
                "speedup": round(med(full_times) / med(inc_times), 2),
                "touched_buckets": rep["touched_buckets"],
                "regime": "point" if rep["touched_buckets"] < args.n_buckets // 2
                else "moderate (row-group-pruning regime at real scale; "
                "single-row-group files here — expect <1x)",
                "state_matches_full_recompute": True,
            }
        )
        print(json.dumps(outs[-1]))

    bench_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    path = os.path.join(bench_dir, "mv_refresh.json")
    runs = []
    if os.path.exists(path):
        with open(path) as f:
            runs = json.load(f)
    runs.extend(outs)
    with open(path, "w") as f:
        json.dump(runs, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

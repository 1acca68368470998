"""Wall-clock A/B for z-order clustering: scan_where under a secondary-
column predicate after `cluster(strategy=zorder)` vs `linear`, at a scale
where each bucket holds many files (the regime manifest pruning exists
for). Prints one JSON line; recorded as BENCH/zorder_scan_ab.json.

The `bins` sweep is the point: before the per-column auto-width fix
(lake/zorder.py _col_nbits), bins=1024 over a 400-distinct path column
left dead top interleave bits and pruning collapsed (measured 11/139
files, 1.06x); with widths derived from occupied-bin counts, oversized
`bins` behaves like the saturated setting.

Usage: python bench/zorder_ab.py [--bins 1024] [--events 5000000]
"""

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from fao_elt_pipelines_spark import binlog  # noqa: E402
from fao_elt_pipelines_spark.lake.table import LakeTable  # noqa: E402
from fao_elt_pipelines_spark.session import get_spark  # noqa: E402
from scripts.replay_job import STATE_SCHEMA  # noqa: E402


def timed(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bins", type=int, default=1024)
    ap.add_argument("--events", type=int, default=5_000_000)
    args = ap.parse_args()

    spark = get_spark("zorder_ab", cores=32, shuffle_partitions=32)
    d = tempfile.mkdtemp(dir="/tmp")
    ev = binlog.change_events(
        spark,
        args.events,
        n_repos=2000,
        paths_per_repo=400,
        events_per_epoch=args.events,
        num_partitions=64,
    )
    t = LakeTable.create(spark, f"{d}/t", STATE_SCHEMA, n_buckets=16)
    t0 = time.time()
    t.merge_changes(ev, epoch_id=0)
    t_merge = time.time() - t0
    state_rows = sum(e["rows"] for e in t.current_snapshot()["manifest"])
    per_bucket = state_rows // 16
    bounds = {"path": ("src/dir_3/", "src/dir_5/")}
    out = {}
    for strat in ("zorder", "linear"):
        t0 = time.time()
        t.cluster(
            ["repo", "path"],
            bins=args.bins,
            strategy=strat,
            max_records_per_file=per_bucket // 16,
        )
        t_cl = time.time() - t0
        _, pruned, total = t.scan_where(bounds, with_stats=True)
        m_pruned = timed(
            lambda: t.scan_where(bounds)
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        m_full = timed(
            lambda: t.read()
            .filter(F.col("path").between("src/dir_3/", "src/dir_5/"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        rows_match = (
            t.scan_where(bounds).count()
            == t.read()
            .filter(F.col("path").between("src/dir_3/", "src/dir_5/"))
            .count()
        )
        out[strat] = {
            "files_total": total,
            "files_pruned": pruned,
            "cluster_rewrite_sec": round(t_cl, 2),
            "scan_where_sec": round(m_pruned, 3),
            "full_scan_filter_sec": round(m_full, 3),
            "speedup": round(m_full / m_pruned, 2),
            "rows_match": rows_match,
        }
    res = {
        "metric": "zorder_scan_ab",
        "events": args.events,
        "state_rows": state_rows,
        "n_buckets": 16,
        "bins": args.bins,
        "merge_sec": round(t_merge, 2),
        "predicate": "path between src/dir_3/ and src/dir_5/ (2 of 16 dirs)",
        **out,
    }
    print(json.dumps(res))
    shutil.rmtree(d)


if __name__ == "__main__":
    main()

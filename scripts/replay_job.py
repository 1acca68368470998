"""spark-submit entry point: replay a binlog into the lake table.

Usage (north-rule run mode):

    spark-submit --py-files engine.zip scripts/replay_job.py \
        --binlog /path/to/binlog_parquet --table /path/to/state_table \
        --checkpoint /path/to/ckpt.json [--generate N] [--cores 32]

With ``--generate N`` the job synthesizes the binlog first (binlog.py) and
writes it to --binlog; otherwise --binlog must already exist. Prints one
JSON line with throughput + state summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fao_elt_pipelines_spark import binlog  # noqa: E402
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore  # noqa: E402
from fao_elt_pipelines_spark.lake.replay import replay  # noqa: E402
from fao_elt_pipelines_spark.lake.table import LakeTable  # noqa: E402
from fao_elt_pipelines_spark.session import get_spark  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

STATE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("last_seq", T.LongType()),
    ]
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--binlog", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--generate", type=int, default=0)
    ap.add_argument("--generate-start", type=int, default=0,
                    help="first seq of the generated slice — the binlog "
                    "becomes events [start, start+N) of the logical "
                    "stream (slice-wise 10^10 harness; epoch ids stay "
                    "global because epoch = seq // events_per_epoch)")
    ap.add_argument("--content-reps", type=int, default=None,
                    help="pin generated content size (1 rep = 50 chars); "
                    "default: hash-chosen 50-1500 chars. Disk-bound runs "
                    "(10^9+ events on one box) use 1")
    ap.add_argument("--events-per-epoch", type=int, default=100_000)
    ap.add_argument("--n-repos", type=int, default=1000)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument(
        "--source", default="binlog",
        help="source name for checkpoint + exactly-once scoping: epoch ids "
        "are unique PER SOURCE, so two upstreams (e.g. regional binlogs) "
        "can feed one table with colliding epoch numbering",
    )
    ap.add_argument("--mode", choices=["cow", "mor"], default="cow")
    ap.add_argument(
        "--strategy", choices=["auto", "late", "sorted"], default="auto",
        help="LWW physical form: auto (default — sorted for both modes, "
        "per the interleaved A/Bs in BENCH/mor_strategy_ab.json), late "
        "materialization (payload never rides the winner shuffle), or "
        "single-shuffle sorted merge",
    )
    ap.add_argument("--compact-every", type=int, default=None)
    ap.add_argument("--epoch-batch", type=lambda v: v if v == "auto" else int(v),
                    default="auto",
                    help="apply up to this many consecutive pending epochs "
                    "per merge+commit (fixed-cost amortization); 'auto' "
                    "(default) sizes groups from per-epoch event counts — "
                    "large epochs run unbatched, small ones group until "
                    "each merge carries ~50k events/core")
    ap.add_argument("--compact-delta-ratio", type=float, default=None,
                    help="size-based compaction: compact when MOR delta bytes "
                    "reach this fraction of base bytes (manifest stats)")
    ap.add_argument(
        "--profile", choices=["throughput", "bandwidth"], default="throughput",
        help="codec profile (session.PROFILES): 'bandwidth' = zstd "
        "shuffle/spill/parquet, the right trade when bytes, not CPU, are "
        "the constraint (network-shuffling clusters; this VM's "
        "memory-bandwidth ceiling)",
    )
    ap.add_argument(
        "--mv-dir", default=None,
        help="maintain the per-repo gold aggregate view incrementally "
        "after the replay (lake/mv.py): first run = full compute, later "
        "runs apply only the change interval since the view's cursor",
    )
    ap.add_argument(
        "--bootstrap-snapshot", default=None,
        help="parquet path of a full source snapshot to load before "
        "tailing the binlog (Debezium-style initial load; lake/bootstrap.py)",
    )
    ap.add_argument(
        "--bootstrap-watermark", type=int, default=None,
        help="log position the snapshot is consistent as of; replay then "
        "tails the binlog from seq > watermark (required with "
        "--bootstrap-snapshot)",
    )
    ap.add_argument(
        "--bootstrap-seq-col", default=None,
        help="snapshot column carrying per-row seqs (exact last_seq parity); "
        "omit to load every row at the watermark",
    )
    ap.add_argument(
        "--quarantine-dir", default=None,
        help="divert malformed events (null key/seq, unknown op, "
        "payload-less upsert) to this epoch-partitioned dead-letter "
        "table instead of merging them (lake/quarantine.py)",
    )
    ap.add_argument(
        "--wap", action="store_true",
        help="write-audit-publish (lake/wap.py): every merge lands on a "
        "staging branch, the audits below run against the staged commit, "
        "and only a pass fast-forwards main — consumers never see a batch "
        "that fails its checks",
    )
    ap.add_argument("--wap-min-rows", type=int, default=1,
                    help="WAP audit: fail a merge writing fewer rows")
    ap.add_argument("--wap-max-quarantine-ratio", type=float, default=None,
                    help="WAP audit: fail when dead-lettered rows exceed "
                    "this fraction of the batch")
    ap.add_argument("--wap-max-shrink-ratio", type=float, default=None,
                    help="WAP audit: fail when live rows shrink by more "
                    "than this fraction (mass-delete guard; costs two "
                    "count jobs per publish)")
    ap.add_argument("--bloom-cols", default=None,
                    help="comma-separated columns to maintain per-file "
                    "Bloom sidecars for during replay (post-compaction + "
                    "final, incremental); serves scan-where point lookups")
    ap.add_argument("--bloom-tokens", action="store_true",
                    help="with --bloom-cols: token mode (grep index) "
                    "instead of whole-value point probes")
    ap.add_argument(
        "--fast-stats", action="store_true",
        help="skip the per-epoch delta pre-scan; seq_hi from written-file "
        "parquet bounds (events_in then derived from the seq span — exact "
        "for dense-seq binlogs)",
    )
    args = ap.parse_args()

    spark = get_spark("replay_job", cores=args.cores, profile=args.profile)
    if (
        args.generate
        and os.path.exists(args.binlog)
        and not os.path.exists(os.path.join(args.binlog, "_SUCCESS"))
    ):
        # a bare exists() check would silently reuse a partially-written
        # binlog from a crashed generation run and replay a fraction of
        # the requested events behind a normal-looking summary
        raise SystemExit(
            f"binlog dir {args.binlog} exists but has no _SUCCESS marker "
            "(crashed generation?); remove it to regenerate or point "
            "--binlog at a complete one"
        )
    if args.generate and not os.path.exists(args.binlog):
        # partition count must scale with event count, not just cores:
        # a dynamic-partition parquet write holds sort buffers + one open
        # writer per epoch per task, so tasks are capped at ~2M rows each
        # (12.5M-row tasks OOMed the 16g JVM at 10^8 events)
        n_parts = max(
            spark.sparkContext.defaultParallelism * 2,
            args.generate // 2_000_000 + 1,
        )
        binlog.change_events(
            spark, args.generate, n_repos=args.n_repos,
            events_per_epoch=args.events_per_epoch,
            num_partitions=n_parts,
            content_reps=args.content_reps,
            start_seq=args.generate_start,
        ).write.partitionBy("epoch").parquet(args.binlog)
    events = spark.read.parquet(args.binlog)

    if not LakeTable.exists(args.table):
        table = LakeTable.create(spark, args.table, STATE_SCHEMA, n_buckets=args.n_buckets)
    else:
        table = LakeTable(spark, args.table)
    ckpt = CheckpointStore(args.checkpoint)

    if args.wap_max_quarantine_ratio is not None and args.quarantine_dir is None:
        # the audit only sees a rows_quarantined metric when quarantine is
        # enabled, so without --quarantine-dir this gate never evaluates —
        # surface that instead of letting an operator believe it is armed
        # (not a hard error: harnesses legitimately pass the ratio as
        # "gate if quarantine is armed")
        sys.stderr.write(
            "warning: --wap-max-quarantine-ratio has no effect without "
            "--quarantine-dir (no rows_quarantined metric is recorded, so "
            "the WAP quarantine-ratio audit never evaluates)\n"
        )

    if args.bootstrap_snapshot:
        if args.bootstrap_watermark is None:
            ap.error("--bootstrap-snapshot requires --bootstrap-watermark")
        from fao_elt_pipelines_spark.lake.bootstrap import bootstrap_snapshot

        bootstrap_snapshot(
            spark.read.parquet(args.bootstrap_snapshot), table, ckpt,
            watermark_seq=args.bootstrap_watermark,
            seq_col=args.bootstrap_seq_col, mode=args.mode, source=args.source,
        )

    wap_audit = None
    if args.wap:
        from fao_elt_pipelines_spark.lake.wap import basic_audit

        wap_audit = basic_audit(
            min_rows_written=args.wap_min_rows,
            max_quarantine_ratio=args.wap_max_quarantine_ratio,
            max_shrink_ratio=args.wap_max_shrink_ratio,
        )

    # fast-stats events_in baseline: the snapshot-covered prefix of a
    # bootstrap is NOT replayed, so the watermark must seed the start —
    # otherwise the seq-span math counts it and inflates events_per_sec.
    start_seq = ckpt.load()["sources"].get(args.source, {}).get("seq_hi", -1)
    bw = ckpt.bootstrap_watermark(args.source)
    if bw is not None:
        start_seq = max(start_seq, bw)
    t0 = time.time()
    rep = replay(
        spark, events, table, ckpt, source=args.source, max_epochs=args.max_epochs,
        mode=args.mode, compact_every=args.compact_every,
        compact_delta_ratio=args.compact_delta_ratio,
        epoch_batch=args.epoch_batch,
        collect_delta_stats=not args.fast_stats,
        merge_strategy=None if args.strategy == "auto" else args.strategy,
        quarantine_dir=args.quarantine_dir,
        wap_audit=wap_audit,
        bloom_cols=(
            [c.strip() for c in args.bloom_cols.split(",") if c.strip()]
            if args.bloom_cols
            else None
        ),
        bloom_mode="tokens" if args.bloom_tokens else "value",
    )
    dt = time.time() - t0
    mv_report = None
    if args.mv_dir:
        from fao_elt_pipelines_spark.lake.mv import IncrementalGoldView

        mv_report = IncrementalGoldView(spark, table, args.mv_dir).refresh()
    if args.fast_stats and rep.epochs_applied:
        end_seq = ckpt.load()["sources"].get(args.source, {}).get("seq_hi", start_seq)
        rep.events_in = end_seq - start_seq
    state = table.read()
    summary = state.agg(
        F.count("*").alias("rows"),
        F.countDistinct("repo").alias("repos"),
        F.max("last_seq").alias("max_seq"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "epochs_applied": rep.epochs_applied,
                "epochs_skipped": rep.epochs_skipped,
                "events_in": rep.events_in,
                "events_per_sec": round(rep.events_in / dt, 1) if dt > 0 else None,
                "state_rows": summary["rows"],
                "state_repos": summary["repos"],
                "max_seq": summary["max_seq"],
                "snapshots": len(table.snapshots()),
                **({"mv": mv_report} if mv_report else {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness: headline queries + CDC replay at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (computes every output
column, writes nothing) so timings measure the real plan, not a count-star
shortcut. The CDC replay entry generates a deterministic binlog
(sf-proportional) and replays it through the full MERGE path into a lake
table; its events/sec is the BASELINE.md headline metric.

Scaling evidence (north rule: efficiency >= 0.8 between N and 4N) is
produced by bench/scaling.py, which runs this same replay at two
parallelism levels.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fao_elt_pipelines_spark import binlog  # noqa: E402
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore  # noqa: E402
from fao_elt_pipelines_spark.lake.replay import replay  # noqa: E402
from fao_elt_pipelines_spark.lake.table import LakeTable  # noqa: E402
from fao_elt_pipelines_spark.plans.registry import REGISTRY  # noqa: E402
from fao_elt_pipelines_spark.session import get_spark  # noqa: E402
from scripts.replay_job import STATE_SCHEMA  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 4M events / 2 epochs: large enough that per-epoch fixed cost (merge
# planning, snapshot commit) amortizes and events/sec reflects the steady
# state replay rate (~1.5e5/s here), matching BENCH/BASELINE.md's series
REPLAY_EVENTS = int(os.environ.get("BENCH_REPLAY_EVENTS", "4000000"))
REPLAY_EPOCHS = int(os.environ.get("BENCH_REPLAY_EPOCHS", "2"))
# Median of 3 replay trials (fresh table each, same binlog). The first
# merge of a session pays a 3-6x one-time cost that is NOT Spark: this VM
# first-touch-faults fresh memory (a 32-thread numpy probe shows the same
# 4.2s -> 1.5s round-0 penalty, BENCH/BASELINE.md). At 10^10 events that
# warmup is 0.001% of the run; the steady-state rate is the metric, and a
# single timed trial was the one entry in this file still absorbing it.
REPLAY_TRIALS = int(os.environ.get("BENCH_REPLAY_TRIALS", "3"))

#: queries benched (all registry entries; heavier ones drive the signal)
HEADLINE = sorted(REGISTRY.keys())


QUERY_TRIALS = int(os.environ.get("BENCH_QUERY_TRIALS", "5"))
# Optional JMH-style hygiene: force a JVM full GC before each query's
# trials (outside the timed region) to decouple a query's timing from GC
# debt left by earlier entries. A back-to-back A/B at sf0.1/local[32]
# (BENCH/BASELINE.md) showed box weather swamps any effect (suite totals
# 34.8s with vs 34.0s without; individual entries moved both directions),
# so it stays opt-in and OFF by default.
GC_BETWEEN = os.environ.get("BENCH_GC_BETWEEN", "0") == "1"


def bench_query(spark, name: str) -> float:
    """Median of QUERY_TRIALS (default 5) end-to-end runs. Sub-second
    entries swing ±30% with box weather when timed once; the median of
    several is what round-over-round comparisons need (replay stays 1× —
    its 4M events are long enough to self-average).

    The timer starts BEFORE the builder call: most entries build a lazy
    plan there (milliseconds), but a few run real driver-side work
    eagerly — cdc_cluster_scan's physical merge+cluster rewrite (~3s,
    which a noop-only timer under-reported as 0.06s), the handoff
    entries' watermark aggregates — and an entry's reported cost must be
    the cost of actually running that entry end-to-end."""
    fn, _ = REGISTRY[name]
    if GC_BETWEEN:
        spark._jvm.System.gc()  # noqa: SLF001
    times = []
    for _ in range(QUERY_TRIALS):
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        times.append(time.time() - t0)
        spark.catalog.clearCache()
    return round(sorted(times)[len(times) // 2], 3)


def bench_replay(spark, workdir: str) -> tuple[float, float]:
    events = binlog.change_events(
        spark,
        REPLAY_EVENTS,
        n_repos=1000,
        events_per_epoch=REPLAY_EVENTS // REPLAY_EPOCHS,
        num_partitions=max(CPUS * 2, 8),
    )
    binlog_path = os.path.join(workdir, "binlog")
    # epoch-partitioned layout: each epoch's merge scans only its slice
    # (partition pruning), exactly like Kafka offsets / WAL segments
    events.write.partitionBy("epoch").parquet(binlog_path)
    stored = spark.read.parquet(binlog_path)
    times = []
    for trial in range(max(1, REPLAY_TRIALS)):
        table = LakeTable.create(
            spark, os.path.join(workdir, f"state{trial}"), STATE_SCHEMA, n_buckets=64
        )
        ckpt = CheckpointStore(os.path.join(workdir, f"ckpt{trial}.json"))
        t0 = time.time()
        # merge-on-read + periodic compaction: the write-optimized CDC path
        # (see lake.table.merge_changes; COW benched in tests/perf notes).
        # epoch_batch="auto" is the job default policy; at this shape (2M
        # events/epoch >> 50k×cores) it resolves to 1 — unbatched.
        rep = replay(spark, stored, table, ckpt, mode="mor", compact_every=4,
                     epoch_batch="auto")
        times.append((time.time() - t0, rep.events_in))
        shutil.rmtree(os.path.join(workdir, f"state{trial}"), ignore_errors=True)
    dt, events_in = sorted(times)[len(times) // 2]
    return round(dt, 3), round(events_in / dt, 1)


def main() -> None:
    spark = get_spark("bench", cores=CPUS)
    # warmup: run every query once at the tiny SF so JIT/codegen compilation
    # of each expression class (md5, regex, window, HOF lambdas, Arrow UDF
    # init) doesn't land inside the timed sf run
    if os.environ.get("BENCH_WARMUP", "1") == "1":
        warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
        if os.path.isdir(warm_dir):
            for name in HEADLINE:
                REGISTRY[name][0](spark, warm_dir).write.mode("overwrite").format("noop").save()
                spark.catalog.clearCache()

    queries: dict[str, float] = {}
    for name in HEADLINE:
        # bench_query clears persisted intermediates between trials so
        # later timings aren't taxed by a growing storage footprint
        queries[name] = bench_query(spark, name)

    workdir = tempfile.mkdtemp(prefix="bench_cdc_")
    try:
        replay_sec, eps = bench_replay(spark, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    queries[f"cdc_replay_{REPLAY_EVENTS // 1_000_000}m_events"] = replay_sec

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf) if sf else None
    except ValueError:  # non-"sf<number>" dir name: don't discard the run
        sf_val = None
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf_val,
                "cdc_replay_events_per_sec": eps,
                # v2: the per-query timer starts BEFORE the builder call
                # (true end-to-end cost). Totals are NOT comparable with
                # pre-v2 rounds' artifacts — see BENCH/BASELINE.md "Bench
                # timer honesty fix" for the same-box A/B quantifying it.
                "timer_semantics": "end_to_end_v2",
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""applyInPandasWithState sessionization vs the declarative batch oracle.

The stream drains the real events fixture file-by-file (availableNow +
maxFilesPerTrigger=1) with two trailing watermark-advancing flush events,
so every real session must come out — either in-batch (gap proven by
later data) or via EventTimeTimeout. The oracle is Spark's OWN
``session_window`` batch aggregate over the same rows: an independent
implementation of the same semantics (its window end is last_ts + gap;
the operator emits last_ts — reconciled below). Totals ride int64 cents
on both sides so accumulation order can't smear the comparison.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.streaming.stateful_sessions import sessionize_stream

GAP_S = 1800  # 30 min
FLUSH_UID = 999_999_999


@pytest.fixture(scope="module")
def drained(spark, sf_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sessions")
    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        .orderBy("ts")
    )
    # file k = k-th quartile of the timeline, so the stream arrives
    # (roughly) in event-time order and the watermark advances usefully
    rows = sorted(ev.collect(), key=lambda r: r.ts)
    n = len(rows)
    files = [rows[: n // 4], rows[n // 4 : n // 2], rows[n // 2 : 3 * n // 4], rows[3 * n // 4 :]]
    max_ts = rows[-1].ts
    import datetime as dt

    flush1 = [(FLUSH_UID, max_ts + dt.timedelta(seconds=100 * GAP_S), 0.0)]
    flush2 = [(FLUSH_UID, max_ts + dt.timedelta(seconds=200 * GAP_S), 0.0)]
    src_dir = tmp / "stream_src"
    src_dir.mkdir()
    for i, chunk in enumerate([*files, flush1, flush2]):
        df = spark.createDataFrame(
            [(int(r[0]), r[1], float(r[2])) for r in chunk], "user_id long, ts timestamp, value double"
        )
        part = str(src_dir / f"f{i}")
        df.coalesce(1).write.parquet(part)
        t = time.time() + i  # strictly increasing mtimes → in-order pickup
        for root, _, names in os.walk(part):
            for nme in names:
                os.utime(os.path.join(root, nme), (t, t))
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src_dir) + "/*")
    out = sessionize_stream(stream, gap_seconds=GAP_S)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {
        (r.user_id, r.session_start_ms): (r.session_end_ms, r.n_events, r.value_cents)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
        if r.user_id != FLUSH_UID
    }
    oracle = {
        (r.user_id, r.start_ms): (r.end_ms, r.n_events, r.value_cents)
        for r in (
            ev.groupBy(F.session_window("ts", f"{GAP_S} seconds").alias("w"), "user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
                (F.unix_micros(F.min("ts")) / 1000).cast("long").alias("start_ms"),
                (F.unix_micros(F.max("ts")) / 1000).cast("long").alias("end_ms"),
            )
            .collect()
        )
    }
    return got, oracle


def test_stream_sessions_equal_batch_session_window(drained):
    got, oracle = drained
    assert got == oracle
    assert len(got) > 50  # the fixture genuinely produces many sessions


def test_no_session_lost_or_duplicated(drained):
    got, oracle = drained
    assert set(got) == set(oracle)  # keys (user, start) exactly once each


def test_to_cents_half_up_and_nulls():
    """Regression: numpy round() is half-to-even and NaN.astype(int64) is
    INT64_MIN — to_cents must be HALF_UP (F.round parity) with NaN -> 0."""
    import numpy as np

    from fao_elt_pipelines_spark.streaming.stateful_sessions import to_cents

    got = to_cents(np.array([0.125, 0.135, -0.125, float("nan"), 185.22]))
    assert got.tolist() == [13, 14, -13, 0, 18522]

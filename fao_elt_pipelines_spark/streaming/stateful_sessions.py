"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState``.

The one Structured Streaming surface the engine didn't yet exercise:
arbitrary per-key state with event-time timeouts — the API for operators
whose state machine the built-in windowed aggregates can't express
(``session_window`` CAN do plain sessionization; it is used as the
independent batch oracle in tests/test_stateful_sessions.py precisely
because this operator must agree with it — the point here is the
custom-state machinery, which generalizes to payload-carrying sessions,
per-key caps, or early emission the declarative form cannot do).

Semantics (per key): a session is a maximal run of events where each
consecutive event-time gap is ≤ ``gap``. Sessions are emitted (append
mode) when CLOSED:

* in-batch: a later event in the same micro-batch already exceeds the
  gap — closure is data-proven, emitted immediately;
* by watermark: the open session's ``last_ts + gap`` falls behind the
  event-time watermark — Spark fires the registered EventTimeTimeout and
  the state is flushed.

Exactly-once / state discipline: state per key is ONE open session
(start_ms, end_ms, n_events, value_cents) — O(keys) state, not O(events).
Value totals ride int64 cents so cross-micro-batch accumulation order
cannot change the total (float addition order would). Late events behind
the watermark are dropped by Spark before the function runs — the same
contract every watermarked stateful op in this engine has
(streaming/stream_replay.py).

Scale shape: the stream shuffles once per micro-batch on the key (the
same hash partitioning Spark gives every stateful op); per-task work is
an Arrow-batched pandas pass over that task's keys. State lives in the
state store, partitioned by key hash — 10^9 keys spread over the
cluster, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)


def to_cents(values: np.ndarray) -> np.ndarray:
    """float64 -> int64 cents, HALF_UP (matching Spark's ``F.round``),
    NULL/NaN counting 0 — numpy's default half-to-even and
    NaN→INT64_MIN would both silently diverge from the batch oracle."""
    v = np.nan_to_num(np.asarray(values, dtype="float64"), nan=0.0) * 100
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")


def _row(key: int, s: tuple[int, int, int, int]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key],
            "session_start_ms": [s[0]],
            "session_end_ms": [s[1]],
            "n_events": [s[2]],
            "value_cents": [s[3]],
        }
    )


def _make_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is closed
            yield _row(uid, tuple(state.get))
            state.remove()
            return
        batch = pd.concat(list(pdfs)).sort_values("ts")
        if batch.empty:
            # no data, not timed out: leave state (and its registered
            # timeout) untouched
            return
        ts_ms = (batch["ts"].astype("int64") // 1_000_000).to_numpy()
        cents = to_cents(batch["value"].to_numpy(dtype="float64"))
        open_s = tuple(state.get) if state.exists else None
        for t, c in zip(ts_ms, cents):
            if open_s is None:
                open_s = (int(t), int(t), 1, int(c))
            elif t - open_s[1] <= gap_ms:
                open_s = (open_s[0], int(t), open_s[2] + 1, open_s[3] + int(c))
            else:
                # gap exceeded WITHIN the data: closure is proven, emit now
                yield _row(uid, open_s)
                open_s = (int(t), int(t), 1, int(c))
        state.update(open_s)
        # fire when the watermark passes the gap horizon; Spark requires a
        # timeout strictly beyond the current watermark — clamp for the
        # (late-ish but not dropped) case where end+gap already passed
        state.setTimeoutTimestamp(
            max(open_s[1] + gap_ms, state.getCurrentWatermarkMs() + 1)
        )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Sessionize a STREAMING events frame: one appended row per closed
    session (``user_id, session_start_ms, session_end_ms, n_events,
    value_cents``; end = last event's ts, NOT end-of-gap). The caller
    starts the returned stream with any sink; sessions still open when a
    stream is stopped remain in the state store and resume with it."""
    delay = watermark_delay or f"{gap_seconds} seconds"
    src = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).withWatermark("ts", delay)
    return src.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_seconds * 1000),
        OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "Append",
        GroupStateTimeout.EventTimeTimeout,
    )

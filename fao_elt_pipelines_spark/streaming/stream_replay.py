"""Structured Streaming replay: readStream → foreachBatch → MERGE.

The batch replay driver (lake.replay) is the epoch loop the north rule
specifies; this module is the same sink driven by Spark's streaming
machinery instead — file-source micro-batches, ``foreachBatch`` calling the
identical ``LakeTable.merge_changes``, exactly-once from BOTH Spark's
streaming checkpoint (offset log) AND the table's committed-epoch guard
(idempotent re-delivery), which is exactly how an exactly-once foreachBatch
sink must be built (the sink must be idempotent per batchId — public Spark
docs, Structured Streaming programming guide).

Also provides the watermarked windowed-aggregation metrics stream (late
data tolerated up to the watermark; correctness of the *state table* never
depends on event time — LWW is seq-based).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable

if TYPE_CHECKING:
    from ..lake.mv import IncrementalGoldView


def stream_replay(
    spark: SparkSession,
    binlog_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    epoch_base: int = 1_000_000,
    mv: "IncrementalGoldView | None" = None,
    quarantine_dir: str | None = None,
    wap_audit=None,
    source: str = "stream",
    mirror: "tuple[LakeTable, object] | None" = None,
) -> None:
    """Drain ``binlog_dir`` (parquet files) into the table and stop.

    ``epoch_base + batchId`` namespaces streaming epochs away from batch
    epochs so both drivers can feed one table. Trigger(availableNow) drains
    all current input then stops — rerunning is a no-op (offsets + epoch
    guard).

    With ``mv``, each micro-batch ends by advancing the incremental gold
    view (lake/mv.py) to the just-committed snapshot — a continuously
    maintained streaming aggregate whose refresh cost tracks the batch,
    not the table. Crash between merge and refresh is safe: the view's
    cursor lags and the next refresh (any later batch, or an operator
    `table_tool mv-refresh`) catches up over the widened interval.

    With ``mirror`` — a ``(target_table, cursor_checkpoint)`` pair — each
    micro-batch also advances a downstream mirror by consuming this
    table's row-level changelog (lake.changelog.replicate): streaming CDC
    fan-out, cost tracking the batch's touched buckets. Same crash
    contract as ``mv``: the mirror cursor lags on a crash between merge
    and replicate, and the next batch (or an operator ``table_tool
    mirror``) catches up over the widened interval, exactly-once held by
    the target's committed-epoch skip.

    ``quarantine_dir`` and ``wap_audit`` give the streaming driver the
    same ingestion guards as the batch driver (lake.quarantine, lake.wap):
    malformed events dead-letter per micro-batch (idempotent — the epoch
    partition key is the namespaced batch epoch), and with WAP each
    micro-batch stages + audits + publishes atomically; a failing batch
    kills the query with main untouched, and Spark's offset log re-offers
    the batch on restart.

    An existing-but-empty (or not-yet-created) binlog dir — the normal
    race for a scheduled drain — is a clean no-op, same contract as
    ``stream_partial_state``.
    """
    try:
        schema = spark.read.parquet(binlog_dir).schema
    except Exception as exc:
        # only "nothing to drain yet" no-ops; corrupt files, permission
        # errors etc. must surface, not silently skip a drain cycle
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return
        raise
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(binlog_dir)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        epoch = epoch_base + batch_id
        n_bad = 0
        if quarantine_dir is not None:
            from ..lake.quarantine import split_malformed, write_dead_letters

            batch_df, bad = split_malformed(batch_df)
            n_bad = write_dead_letters(
                bad.withColumn("epoch", F.lit(epoch)), quarantine_dir
            )
        metrics = (
            {"rows_quarantined": n_bad, "source": source}
            if quarantine_dir is not None
            else {"source": source}
        )
        # exactly-once is keyed (source, epoch): source scoping means the
        # epoch_base namespace no longer needs to be collision-proof
        # against batch sources, though it stays as defense in depth
        if wap_audit is not None:
            from ..lake.wap import wap_merge

            wap_merge(
                table, batch_df, epoch, audit=wap_audit, source=source,
                metrics=metrics,
            )
        else:
            table.merge_changes(batch_df, epoch_id=epoch, source=source, metrics=metrics)
        if mv is not None:
            mv.refresh()
        if mirror is not None:
            from ..lake.changelog import replicate

            replicate(table, mirror[0], mirror[1])

    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


PROGRESS_OUT_SCHEMA = "repo STRING, events BIGINT, max_seq BIGINT, deletes BIGINT"
PROGRESS_STATE_SCHEMA = "events BIGINT, max_seq BIGINT, deletes BIGINT"


def repo_progress_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-repo ingest progress (event count,
    max seq applied, delete count) carried ACROSS micro-batches via
    ``applyInPandasWithState`` — the Spark primitive for state the built-in
    windowed aggregates can't express (here: unbounded monotonic counters
    keyed by repo, emitted on every update). Arrow-batched per group; state
    is a 3-tuple per repo, so the state store stays O(#repos) no matter how
    many events stream through."""
    import pandas as pd

    def update(key, pdfs, state):
        ev, mx, dl = state.get if state.exists else (0, -1, 0)
        for pdf in pdfs:
            ev += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["seq"].max()))
                dl += int((pdf["op"] == "delete").sum())
        state.update((ev, mx, dl))
        yield pd.DataFrame(
            {"repo": [key[0]], "events": [ev], "max_seq": [mx], "deletes": [dl]}
        )

    return (
        events.select("repo", "seq", "op")
        .groupBy("repo")
        .applyInPandasWithState(
            update,
            outputStructType=PROGRESS_OUT_SCHEMA,
            stateStructType=PROGRESS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def windowed_op_counts(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window op counts (streaming metrics feed).
    Works on both a streaming and a batch DataFrame (same plan)."""
    return (
        events.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window_duration).alias("win"), F.col("op"))
        .agg(F.count("*").alias("events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "events",
        )
    )

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable


def stream_replay(
    spark: SparkSession,
    binlog_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    epoch_base: int = 1_000_000,
) -> None:
    """Drain ``binlog_dir`` (parquet files) into the table and stop.

    ``epoch_base + batchId`` namespaces streaming epochs away from batch
    epochs so both drivers can feed one table. Trigger(availableNow) drains
    all current input then stops — rerunning is a no-op (offsets + epoch
    guard).
    """
    schema = spark.read.parquet(binlog_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(binlog_dir)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.merge_changes(batch_df, epoch_id=epoch_base + batch_id)

    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


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

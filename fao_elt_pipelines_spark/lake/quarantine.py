"""Dead-letter handling for malformed change events.

A production binlog tail sees events the MERGE contract cannot apply: a
null/empty merge key (nowhere to route the row), a null sequence (no LWW
order), an op outside the protocol, or an upsert with no payload. The
reference pipeline's answer is row-level quality flags carried through the
silver layer (``/root/reference/dbt/models/staging/*.sql`` ``*_quality``
columns); the ingest-side analogue here is a dead-letter split: malformed
rows are diverted — with a machine-readable reason and full epoch lineage —
to a quarantine table instead of silently poisoning the state table or
killing the replay, and the valid remainder applies normally.

Scale shape: the split is one whole-stage-codegen CASE over the already
epoch-pruned batch (no shuffle, no Python); the quarantine write is an
epoch-partitioned parquet append whose idempotency matches the engine's
exactly-once story — a re-applied epoch group dynamically overwrites its
own epoch partitions and no others, so crash/retry can neither duplicate
nor lose dead letters.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ops the MERGE protocol understands ("base" = synthetic re-entry rows,
#: "upsert" = pre-resolved upserts from downstream-facing change streams)
VALID_OPS = ("insert", "update", "upsert", "delete", "base")

REASON_COL = "_dead_letter_reason"


def malformed_reason(
    keys: tuple[str, str] = ("repo", "path"),
    seq_col: str = "seq",
    op_col: str = "op",
    content_col: str = "content",
) -> Column:
    """NULL for a well-formed event, else the first matching reason.

    Precedence is fixed (key > seq > op > payload) so the engine and any
    SQL twin (see plans.queries.SQL_CDC_QUARANTINE) classify identically.
    """
    key_bad = F.lit(False)
    for k in keys:
        key_bad = key_bad | F.col(k).isNull() | (F.col(k) == "")
    return (
        F.when(key_bad, F.lit("null_key"))
        .when(F.col(seq_col).isNull(), F.lit("null_seq"))
        .when(
            F.col(op_col).isNull() | ~F.col(op_col).isin(*VALID_OPS),
            F.lit("unknown_op"),
        )
        .when(
            (F.col(op_col) != "delete") & F.col(content_col).isNull(),
            F.lit("null_content"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def split_malformed(batch: DataFrame, **reason_kwargs) -> tuple[DataFrame, DataFrame]:
    """(valid, dead_letters): dead letters carry ``_dead_letter_reason``."""
    reason = malformed_reason(**reason_kwargs)
    tagged = batch.withColumn(REASON_COL, reason)
    return (
        tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL),
        tagged.filter(F.col(REASON_COL).isNotNull()),
    )


def write_dead_letters(bad: DataFrame, quarantine_dir: str, epoch_col: str = "epoch") -> int:
    """Idempotently land dead letters, partitioned by epoch.

    Dynamic partition overwrite means a re-applied epoch group (crash
    retry, checkpoint loss) rewrites exactly its own epoch partitions —
    at-least-once delivery upstream becomes exactly-once dead letters,
    the same granularity the snapshot commit gives applied rows. Returns
    the row count (it is needed for the merge's lineage metrics anyway,
    so the extra job is one column-pruned pass over the batch slice).
    """
    n = bad.count()
    if n:
        (
            bad.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(epoch_col)
            .parquet(quarantine_dir)
        )
    return n


def read_dead_letters(spark, quarantine_dir: str) -> DataFrame | None:
    """The quarantine table, or None before any dead letter landed.

    A dir that exists but holds no readable parquet (a write killed
    between directory creation and task commit — the crash-retry scenario
    this module's idempotency story serves) is also 'nothing landed'."""
    if not os.path.isdir(quarantine_dir):
        return None
    try:
        return spark.read.parquet(quarantine_dir)
    except Exception as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None
        raise

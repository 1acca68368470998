"""Per-epoch metrics table.

Reference analogue: the fetch-metadata dicts (pages fetched, total records,
errors, durations — ``/root/reference/ingestion/api_client.py:119-130``,
``pg_client.py:182-191``) and the valid-rate sample analytics
(``/root/reference/sql/sample_queries.sql:149-178``). Here each MERGE
snapshot's summary becomes one metrics row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .table import LakeTable

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("epoch_id", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("rows_in_delta", T.LongType()),
        T.StructField("rows_written", T.LongType()),
        T.StructField("buckets_touched", T.IntegerType()),
        T.StructField("base_files_rewritten", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)


def metrics_df(spark: SparkSession, table: LakeTable, ref: str = "main") -> DataFrame:
    rows = []
    # published history only (same contract as ReplayReport.metrics)
    for s in table.history(ref):
        if s["operation"] != "merge":
            continue
        m = s["summary"]
        rows.append(
            (
                s["snapshot_id"],
                s.get("epoch_id"),
                s["operation"],
                m.get("rows_in_delta"),
                m.get("rows_written"),
                # MOR merges don't track touched buckets: report NULL (the
                # column is nullable), not a flatly-wrong 0
                len(m["buckets_touched"]) if "buckets_touched" in m else None,
                m.get("base_files_rewritten"),
                m.get("duration_sec"),
            )
        )
    return spark.createDataFrame(rows, METRICS_SCHEMA)

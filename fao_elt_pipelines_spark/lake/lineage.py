"""Per-partition lineage: which files, from which epoch, feed each bucket.

Reference analogue: per-record ``_file_metadata`` (chunk/row/processed_at,
``/root/reference/ingestion/file_client.py:322-327``) — re-expressed at the
grain that matters for a lake table: (snapshot, bucket, file, rows,
source_epoch). Exposed as a DataFrame so lineage questions are themselves
Spark queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .table import LakeTable

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("epoch_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("source_epoch", T.LongType()),
    ]
)


def lineage_df(spark: SparkSession, table: LakeTable, ref: str = "main") -> DataFrame:
    rows = []
    # published history only: snapshots staged on other branches (WAP)
    # are not part of this lineage until published
    for s in table.history(ref):
        for e in s["manifest"]:
            rows.append(
                (
                    s["snapshot_id"],
                    s["operation"],
                    s.get("epoch_id"),
                    e["bucket"],
                    e["path"],
                    e["rows"],
                    e.get("source_epoch"),
                )
            )
    return spark.createDataFrame(rows, LINEAGE_SCHEMA)

"""Batch sources: the reference's extractors re-expressed as Spark reads.

| Reference | Citation | Here |
|---|---|---|
| Chunked CSV/TSV scan w/ delimiter+encoding sniff | ingestion/file_client.py:188-257 (delimiter :106-109, encoding :93-103) | ``read_delimited`` — sniff on a head sample, then one distributed ``spark.read.csv`` (chunking is Spark's partitioning, not a Python loop) |
| File structure inference | ingestion/file_client.py:58-161 | ``detect_structure`` — schema + sample + row estimate from Parquet/CSV metadata instead of byte-ratio guessing |
| Paginated HTTP API scan | ingestion/api_client.py:100-270 | out of sandbox scope (no network); the binlog generator + epoch loop is the ingest path (SURVEY §2.9) |
| JDBC chunked scan (LIMIT/OFFSET walk) | ingestion/pg_client.py:165-261 | ``jdbc_partitioned_opts`` — range-partitioned parallel JDBC read options (serial OFFSET walk → numPartitions predicate splits) |
| JSON payload bronze | sql/create_schemas.sql:7-13 | ``read_json_bronze`` — json lines → payload string column + ingest metadata, the bronze shape |
"""

from __future__ import annotations

import codecs
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CANDIDATE_DELIMS = [",", "\t", ";", "|"]


def sniff_delimiter(sample_lines: list[str]) -> str:
    """Max-count delimiter vote over sample lines (reference
    file_client.py:106-109 semantics)."""
    counts: Counter[str] = Counter()
    for line in sample_lines:
        for d in _CANDIDATE_DELIMS:
            counts[d] += line.count(d)
    return counts.most_common(1)[0][0] if counts else ","


def sniff_encoding(path: str, n_bytes: int = 65536) -> str:
    """utf-8 with latin-1 fallback (reference file_client.py:93-103).

    The incremental decoder with ``final=False`` tolerates a multi-byte
    sequence truncated at the sample boundary — a plain decode would
    raise on it and misclassify a valid UTF-8 file as latin-1."""
    with open(path, "rb") as f:
        head = f.read(n_bytes)
    try:
        codecs.getincrementaldecoder("utf-8")().decode(head, final=False)
        return "utf-8"
    except UnicodeDecodeError:
        # the canonical charset name: Python also accepts "latin-1"/
        # "latin1" but the JVM (java.nio.charset.Charset, which resolves
        # spark.read.option("encoding", ...)) rejects "latin-1" — the
        # Python spelling would crash the exact reads this fallback serves
        return "ISO-8859-1"


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sample_lines: int = 50,
) -> DataFrame:
    """Delimiter/encoding-sniffed distributed CSV read. The sniff touches
    only a head sample on the driver; the read itself is Spark's splittable
    CSV source (no driver-side chunk loop)."""
    enc = sniff_encoding(path)
    with open(path, encoding=enc, errors="replace") as f:
        head = [next(f, "") for _ in range(sample_lines)]
    delim = sniff_delimiter([ln for ln in head if ln])
    reader = (
        spark.read.option("sep", delim)
        .option("encoding", enc)
        .option("header", str(header).lower())
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def detect_structure(spark: SparkSession, path: str, n_sample: int = 100) -> dict:
    """Schema + dtype classes + sample + row estimate (reference
    detect_file_structure, file_client.py:58-161). For parquet the row
    count is exact and free (footers); for CSV it is estimated like the
    reference (bytes ratio) but from a distributed sample."""
    import os

    if path.endswith(".parquet") or os.path.isdir(path):
        df = spark.read.parquet(path)
        total = df.count()  # parquet: metadata-only job
        exact = True
    else:
        df = read_delimited(spark, path)
        # average row size from the file's ACTUAL head lines — a Row repr
        # adds 'Row(', every column name, and separators, inflating
        # per-row bytes several-fold and under-estimating rows by the
        # same factor
        with open(path, "rb") as f:
            head_lines = f.read(65536).splitlines()
        if len(head_lines) > 1:
            head_lines = head_lines[:-1]  # last line may be truncated
        avg_row_bytes = max(
            1, sum(len(ln) + 1 for ln in head_lines) // max(1, len(head_lines))
        )
        total = os.path.getsize(path) // avg_row_bytes
        exact = False
    classes = {
        f.name: (
            "numeric"
            if isinstance(f.dataType, (T.IntegralType, T.FractionalType))
            else "datetime"
            if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType))
            else "object"
        )
        for f in df.schema.fields
    }
    return {
        "columns": df.columns,
        "dtype_classes": classes,
        "schema_ddl": df.schema.simpleString(),
        "estimated_rows": int(total),
        "row_count_exact": exact,
        "sample": [r.asDict() for r in df.limit(5).collect()],
    }


def jdbc_partitioned_opts(
    url: str,
    table: str,
    partition_column: str,
    lower: int,
    upper: int,
    num_partitions: int = 16,
) -> dict[str, str]:
    """Options for a range-partitioned parallel JDBC scan — the scalable
    replacement for the reference's serial COUNT + LIMIT/OFFSET walk
    (pg_client.py:205-245): N concurrent readers each scan one predicate
    range; no OFFSET re-scans. Returned as options so tests can assert the
    plan without a live database (none exists in this sandbox)."""
    return {
        "url": url,
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(num_partitions),
        "fetchsize": "10000",
    }


def read_json_bronze(
    spark: SparkSession,
    path: str,
    source_url: str = "",
    api_endpoint: str = "",
) -> DataFrame:
    """JSON-lines → bronze shape: (id, data json-string, loaded_at,
    source_url, api_endpoint) — the reference's raw landing contract
    (sql/create_schemas.sql:7-13, load_to_database.py:50-58)."""
    raw = spark.read.text(path)
    return raw.select(
        F.monotonically_increasing_id().alias("id"),
        F.col("value").alias("data"),
        F.current_timestamp().alias("loaded_at"),
        F.lit(source_url).alias("source_url"),
        F.lit(api_endpoint).alias("api_endpoint"),
    )

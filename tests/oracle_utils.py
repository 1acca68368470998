"""Local mirror of the driver's Spark-vs-DuckDB differential compare:
row count, column names, and order-insensitive values (exact equality,
floats included — queries are designed to be bit-deterministic)."""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb

from fao_elt_pipelines_spark.plans.queries import TABLES as SF_TABLES  # one source of truth


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in SF_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        # Keep full precision — collapsing to float64 would mask divergence
        # beyond ~16 significant digits, exactly what this differential
        # exists to catch. normalize() canonicalizes scale (5.00 == 5.0) so
        # the repr-keyed row sort orders both sides identically.
        return v.normalize()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str) -> list[str]:
    """Return list of mismatch descriptions (empty == match)."""
    issues: list[str] = []
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()
    s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
    if s_cols != d_cols:
        return [f"columns differ: spark={s_cols} duckdb={d_cols}"]
    # The driver hashes *typed* values, so an int64-vs-float64 (or
    # Decimal/HUGEINT) skew fails its check even when values are equal.
    # Mirror that here: flag numeric-kind mismatches per column.
    for c in s_cols:
        sk = sdf[c].dtype.kind  # i/u int, f float, O object, M datetime, b bool
        dk = ddf[c].dtype.kind
        # Decimal sniff must be symmetric: Spark DecimalType also lands as
        # object dtype in pandas, and a Decimal-vs-Decimal column is NOT a
        # skew even though neither dtype.kind is numeric.
        s_dec = sk == "O" and any(isinstance(v, Decimal) for v in sdf[c].dropna().head(5))
        d_dec = dk == "O" and any(isinstance(v, Decimal) for v in ddf[c].dropna().head(5))
        s_num = sk in "iuf" or s_dec
        d_num = dk in "iuf" or d_dec
        if s_num != d_num or (s_num and d_num and (sk == "f", s_dec) != ((dk == "f"), d_dec)):
            issues.append(f"dtype kind skew on {c}: spark={sdf[c].dtype} duckdb={ddf[c].dtype}")
    if len(sdf) != len(ddf):
        issues.append(f"row count: spark={len(sdf)} duckdb={len(ddf)}")
    s_rows = sorted(
        (tuple(_norm(v) for v in row) for row in sdf[s_cols].itertuples(index=False)),
        key=repr,
    )
    d_rows = sorted(
        (tuple(_norm(v) for v in row) for row in ddf[d_cols].itertuples(index=False)),
        key=repr,
    )
    if s_rows != d_rows:
        d_set, s_set = set(d_rows), set(s_rows)
        diff_s = [r for r in s_rows if r not in d_set][:3]
        diff_d = [r for r in d_rows if r not in s_set][:3]
        issues.append(f"values differ; spark-only={diff_s} duckdb-only={diff_d}")
    return issues

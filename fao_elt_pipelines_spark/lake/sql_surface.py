"""Ad-hoc SQL over lake tables: temp-view registration + statement runner.

The reference exposes an ad-hoc query surface by piping
``sql/sample_queries.sql`` through psql (``/root/reference/Makefile:106-107``).
Here the analogue is Catalyst SQL over registered snapshots: a
:class:`LakeTable` (any snapshot / ref / as-of point) becomes a temp view,
and arbitrary ANSI statements run through ``spark.sql`` — full predicate
pushdown, AQE, and whole-stage codegen apply, because the view is just the
table's pruned-manifest DataFrame.

At scale the view is as cheap as the underlying read path: registration is
metadata-only; the scan materializes per-statement with the same
manifest/file pruning every other reader gets.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable


def register_table_view(
    table: LakeTable,
    name: str = "state",
    snapshot_id: int | None = None,
    ref: str = "main",
    as_of_ms: int | None = None,
) -> DataFrame:
    """Register one snapshot of ``table`` as temp view ``name``; returns
    the backing DataFrame. Snapshot isolation: the view pins the manifest
    resolved NOW — concurrent commits don't shift results mid-session."""
    df = table.read(snapshot_id=snapshot_id, ref=ref, as_of_ms=as_of_ms)
    df.createOrReplaceTempView(name)
    return df


def register_parquet_view(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Register a bare parquet dataset (e.g. a metrics/lineage side table)
    as a temp view."""
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    return df


def split_statements(text: str) -> list[str]:
    """Split a SQL script into statements on ``;``, respecting quoted
    regions (``'...'`` strings, ``"..."`` strings/identifiers, backquoted
    identifiers — a ``;`` or ``--`` inside any of them is literal text, not
    a separator), backslash escapes inside string quotes (Spark's default
    ``escapedStringLiterals=false`` grammar accepts ``\\'``), ``--`` line
    comments, and ``/* ... */`` bracketed comments."""
    out: list[str] = []
    buf: list[str] = []
    quote: str | None = None  # the open quote char, or None
    in_comment = False
    in_block = False
    i = 0
    while i < len(text):
        ch = text[i]
        if in_comment:
            if ch == "\n":
                in_comment = False
            buf.append(ch)
        elif in_block:
            buf.append(ch)
            if ch == "*" and text[i + 1 : i + 2] == "/":
                buf.append("/")
                i += 1
                in_block = False
        elif quote is not None:
            buf.append(ch)
            if ch == "\\" and quote in "'\"" and i + 1 < len(text):
                # backslash escape inside a string literal: the next char
                # (possibly the quote itself) is literal text, not a close
                buf.append(text[i + 1])
                i += 1
            elif ch == quote:
                if i + 1 < len(text) and text[i + 1] == quote:  # doubled escape
                    buf.append(quote)
                    i += 1
                else:
                    quote = None
        elif ch in "'\"`":
            quote = ch
            buf.append(ch)
        elif ch == "-" and text[i : i + 2] == "--":
            in_comment = True
            buf.append(ch)
        elif ch == "/" and text[i : i + 2] == "/*":
            in_block = True
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if _has_sql(stmt):
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    stmt = "".join(buf).strip()
    if _has_sql(stmt):
        out.append(stmt)
    return out


def _has_sql(stmt: str) -> bool:
    """True if the statement contains anything besides comments/whitespace."""
    no_block = re.sub(r"/\*.*?\*/", "", stmt, flags=re.S)
    return any(
        line.strip() and not line.strip().startswith("--")
        for line in no_block.splitlines()
    )


def run_statements(spark: SparkSession, text: str) -> Iterator[tuple[str, DataFrame]]:
    """Run each statement in ``text`` through ``spark.sql``, yielding
    (statement, result DataFrame) pairs lazily — callers choose how much
    of each result to materialize (the CLI caps with LIMIT-style fetch)."""
    for stmt in split_statements(text):
        yield stmt, spark.sql(stmt)

"""Per-file Bloom filters for point-lookup file skipping.

Iceberg/Delta analogue: Puffin blob statistics / Parquet column bloom
filters. Manifest min/max bounds (``table._stats_overlap``) prune RANGE
predicates well when the file layout sorts or z-orders by the probed
column — but a POINT lookup on a high-cardinality column the layout
doesn't lead with hits every file whose [min, max] straddles the key,
which under hash-bucketed writes is usually *every file in the bucket*.
A per-file Bloom filter answers "definitely absent" for arbitrary
layouts at ~1 KiB per file per column, with zero false negatives by
construction, so pruning on it is exact.

Reference behavioral anchor: the reference pipeline answers point reads
with a full-table SQL filter (`/root/reference/db/database.py` query
helpers); at 10^10 rows that read must not touch every file.

Design notes (100 TB shape):

- **Build is a Spark job**, rewrite/maintenance-grade like
  ``lake/zorder.py``: probe positions are computed JVM-side
  (md5 → ``conv`` → ``pmod`` — whole-stage codegen, no Python in the
  scan), deduped per (file, position), and only the ≤ m-bit position
  sets per (file, column) reach the Arrow-batched packer UDF. Nothing
  row-at-a-time touches Python.
- **The sidecar is parquet written by executors** (one row per
  (file, column): packed bits + spec), bucket-tagged so a point lookup
  at fleet scale loads only candidate buckets' rows (pyarrow filter;
  this sandbox caches the whole sidecar — it is KiB here).
- **Keyed by immutable file path.** Data files are copy-on-write: a
  path's contents never change, so bloom rows stay valid across later
  snapshots; files the bloom has no row for are simply kept (never
  prune blind — same contract as missing min/max stats). Orphaned rows
  for GC'd files are dead weight, not a hazard.
- **Cross-side determinism**: the probe hash is
  ``int(md5(f"{i}|{v}").hexdigest()[:15], 16) % m`` — 15 hex chars =
  60 bits, exactly representable in the JVM ``conv(..., 16, 10)``
  string→long path and in Python, so the driver-side membership test
  (`probe`) and the executor-side builder can never disagree.
  Values are canonicalized by Spark's string cast; the driver probes
  only ``str``/``int`` values (others fall back to "maybe present").
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_M_BITS = 8192  # 1 KiB per (file, column); FPR ~1.5% at ~1k keys
DEFAULT_K = 6

#: token boundary for tokenized (grep-mode) blooms: identifier tokens of
#: code/text. MUST be identical at build and probe time — scan_contains
#: re-applies it as the row filter, so the two can never drift apart.
TOKEN_SEP = "[^A-Za-z0-9_]+"

#: sidecar row schema (parquet): bucket enables candidate-bucket-filtered
#: loads at fleet scale; mode is "value" (whole-value point probes) or
#: "tokens" (membership of an identifier token in the column's text)
SIDECAR_SCHEMA = (
    "file string, col string, mode string, bucket int, m_bits int, k int, "
    "bits binary"
)


def _position_exprs(col: str, m_bits: int, k: int) -> list:
    """k JVM-side probe positions for a column value (NULL value → NULL
    positions, filtered by the caller: equality with NULL never matches,
    so NULLs need no bloom representation)."""
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), F.col(col).cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long"),
            F.lit(m_bits),
        ).alias(f"_p{i}")
        for i in range(k)
    ]


def probe_positions(value: Any, m_bits: int, k: int) -> list[int]:
    """Driver-side twin of :func:`_position_exprs` (shared-formula tested)."""
    return [
        int(hashlib.md5(f"{i}|{value}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(k)
    ]


def probe(bits: bytes, value: Any, m_bits: int, k: int) -> bool:
    """Membership test: False = DEFINITELY absent (prune is exact);
    True = maybe present. Non-str/int values always report maybe —
    their Spark string cast is not guaranteed to match Python's."""
    if not isinstance(value, (str, int)) or isinstance(value, bool):
        return True
    for pos in probe_positions(value, m_bits, k):
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def build_file_blooms(
    spark: SparkSession,
    entries: list[dict[str, Any]],
    cols: list[str],
    phys_schema,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    mode: str = "value",
) -> DataFrame:
    """One sidecar row per (data file, column): packed bloom bits over the
    file's non-null values of that column.

    ``mode="value"`` inserts whole values (point-equality probes) and is
    restricted to string and integral columns: those are exactly the
    types whose Spark string cast and Python ``str()`` render every
    value identically, which the driver-side ``probe`` depends on — a
    float/decimal/bool column's renderings can diverge ("1.0" vs "1"),
    and a diverging probe would PRUNE A FILE THAT CONTAINS THE VALUE.
    ``mode="tokens"`` inserts every identifier token of the column's
    text (TOKEN_SEP boundaries) — the distributed-grep index: "which
    files contain token X" without reading them; any type is allowed
    because both the build and the row filter tokenize the same Spark
    string cast, and the probed token is itself the string.

    Every (file, column) in ``entries`` × ``cols`` gets a sidecar row —
    files contributing zero probes (all-NULL column, e.g. files
    predating an additive schema change) get an ALL-ZERO bloom, which
    correctly proves absence for equality (c = v never matches NULL)
    and, critically, marks the file COVERED so incremental builds
    converge instead of rescanning it forever.

    Plan (value mode): ONE scan of the target files → a single k×|cols|
    struct array per row → one explode → (file, col, pos) DISTINCT
    (bounds the per-group array at m_bits) → collect_list per
    (file, col) → Arrow-batched numpy packer. Token mode unions one
    tokenize-explode branch per column (a per-column scan — token
    builds are usually single-column). Zero per-row Python either way.
    """
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    if mode not in ("value", "tokens"):
        raise ValueError(f"mode must be value|tokens, got {mode!r}")
    if mode == "value":
        bad = [
            f.name
            for f in phys_schema.fields
            if f.name in cols
            and not isinstance(
                f.dataType,
                (T.StringType, T.LongType, T.IntegerType, T.ShortType, T.ByteType),
            )
        ]
        if bad:
            raise ValueError(
                f"value-mode blooms require string/integral columns, got {bad}: "
                "other types' Spark string cast is not guaranteed to match the "
                "probe's Python rendering, and a mismatch would prune files "
                "that contain the value (use mode='tokens' for text search)"
            )
    paths = [e["path"] for e in entries]
    by_path = {e["path"]: e["bucket"] for e in entries}
    # explicit physical schema: files predating an additive schema change
    # read the new column as NULL → zero probes → all-zero bloom
    src = spark.read.schema(phys_schema).parquet(*paths).withColumn(
        "_f", F.regexp_replace(F.input_file_name(), r"^file:/+", "/")
    )
    if mode == "tokens":
        stacked = None
        for c in cols:
            toks = src.select(
                "_f",
                F.explode(
                    F.array_distinct(F.split(F.col(c).cast("string"), TOKEN_SEP))
                ).alias("_v"),
            ).where(F.col("_v") != "")
            part = toks.select(
                "_f",
                F.lit(c).alias("_c"),
                F.explode(F.array(*_position_exprs("_v", m_bits, k))).alias("_pos"),
            )
            stacked = part if stacked is None else stacked.unionByName(part)
    else:
        probes = [
            F.struct(F.lit(c).alias("_c"), p.alias("_pos"))
            for c in cols
            for p in _position_exprs(c, m_bits, k)
        ]
        stacked = (
            src.select("_f", F.explode(F.array(*probes)).alias("_s"))
            .select("_f", F.col("_s._c").alias("_c"), F.col("_s._pos").alias("_pos"))
            .where(F.col("_pos").isNotNull())
        )

    @F.pandas_udf("binary")
    def _pack(pos_lists: pd.Series) -> pd.Series:
        out = []
        for pos_list in pos_lists:
            arr = np.zeros(m_bits, dtype=np.uint8)
            arr[np.asarray(pos_list, dtype=np.int64)] = 1
            # bitorder must match probe(): bit j of byte b = position b*8+j
            out.append(np.packbits(arr, bitorder="little").tobytes())
        return pd.Series(out)

    # bucket tag via broadcast join, not a literal map: a create_map over
    # 2×n_files literals is a Catalyst expression tree that grows with the
    # manifest (megabytes at fleet file counts); the manifest-sized lookup
    # frame broadcasts instead. The same frame ×cols is the EXPECTED grid:
    # outer-joining it guarantees a row (all-zero bloom) for (file, col)
    # pairs that contributed zero probes — coverage convergence (above).
    expected = spark.createDataFrame(
        [(p, c, b) for p, b in by_path.items() for c in cols],
        "file string, col string, bucket int",
    )
    agg = (
        stacked.distinct()
        .groupBy("_f", "_c")
        .agg(F.collect_list("_pos").alias("_ps"))
        .select(F.col("_f").alias("file"), F.col("_c").alias("col"), "_ps")
    )
    # no broadcast hint: the preserved (grid) side of a left join cannot
    # be the build side, and agg — whose rows carry up-to-m_bits position
    # arrays — is the wrong side to broadcast at fleet scale. The groupBy
    # left agg hash-partitioned on exactly these keys, so only the tiny
    # grid shuffles here.
    return (
        expected.join(agg, ["file", "col"], "left")
        .select(
            "file",
            "col",
            F.lit(mode).alias("mode"),
            "bucket",
            F.lit(m_bits).alias("m_bits"),
            F.lit(k).alias("k"),
            _pack(F.coalesce("_ps", F.array().cast("array<bigint>"))).alias("bits"),
        )
    )


def load_sidecars(paths: list[str]) -> dict[tuple[str, str], tuple[bytes, int, int]]:
    """Driver-side sidecar load (pyarrow, no Spark job): {(file, key) →
    (bits, m_bits, k)} where key is the column name for value blooms and
    ``col + "#tokens"`` for token blooms (the two are distinct indexes
    over the same column and must never answer each other's probes).
    Later sidecars win on duplicate keys (a rebuild with a different spec
    supersedes). At fleet scale pass a bucket filter instead of reading
    all rows — the bucket column exists for exactly that; at this
    sandbox's sidecar sizes a full read is noise."""
    import pyarrow.parquet as pq

    out: dict[tuple[str, str], tuple[bytes, int, int]] = {}
    for p in paths:
        t = pq.read_table(p)
        names = t.column_names
        modes = (
            t.column("mode").to_pylist()
            if "mode" in names
            else ["value"] * t.num_rows
        )
        for f, c, mo, m, kk, b in zip(
            t.column("file").to_pylist(),
            t.column("col").to_pylist(),
            modes,
            t.column("m_bits").to_pylist(),
            t.column("k").to_pylist(),
            t.column("bits").to_pylist(),
        ):
            mo = mo or "value"  # pre-mode sidecar rows are value blooms
            out[(f, c if mo == "value" else f"{c}#tokens")] = (b, m, kk)
    return out

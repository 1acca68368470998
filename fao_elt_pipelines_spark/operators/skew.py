"""Skew handling: hot-key detection and salted repartitioning.

The binlog's repo distribution is Zipf-skewed by construction (binlog.py);
the north rule requires explicit salting for hot-repo skew on top of AQE
(AQE splits skewed *sort-merge join* partitions at runtime but does nothing
for ``repartition``/window/write hot spots).

Pattern: detect hot keys from a cheap sample aggregate, then repartition on
``(key, salt)`` where salt spreads only the hot keys — cold keys keep
salt=0 so their files stay consolidated.

Reference analogue: none — the reference is single-threaded
(``/root/reference/INFO.md:258``); this is engine-new machinery
(SURVEY.md §4 "Skew handling").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame,
    key: str = "repo",
    sample_fraction: float = 0.01,
    hot_share: float = 0.02,
    seed: int = 7,
) -> list[str]:
    """Return key values whose sampled share of rows exceeds ``hot_share``.

    One narrow sample + one small aggregate; the result is collected because
    it is by construction tiny (≤ 1/hot_share values) and is broadcast back
    into the salting expression.
    """
    sampled = df.sample(fraction=sample_fraction, seed=seed)
    total = sampled.count()
    if total == 0:
        return []
    hot = (
        sampled.groupBy(key)
        .count()
        .filter(F.col("count") > hot_share * total)
        .select(key)
        .collect()
    )
    return sorted(r[0] for r in hot)


def salted_repartition(
    df: DataFrame,
    key: str = "repo",
    hot_keys: list[str] | None = None,
    salt_buckets: int = 32,
    num_partitions: int | None = None,
    salt_source: str = "path",
) -> DataFrame:
    """Repartition on ``(key, _salt)`` where only hot keys fan out.

    ``_salt = pmod(hash(salt_source), salt_buckets)`` for hot keys, else 0 —
    deterministic (no rand()), so retried tasks land rows identically
    (required for exactly-once file commit). The ``_salt`` column is kept so
    downstream writers can partition files by it; drop it after the write.
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(df, key)
    if hot_keys:
        is_hot = F.col(key).isin(hot_keys)
    else:
        is_hot = F.lit(False)
    salt = F.when(
        is_hot, F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
    ).otherwise(F.lit(0))
    out = df.withColumn("_salt", salt.cast("int"))
    if num_partitions:
        return out.repartition(num_partitions, F.col(key), F.col("_salt"))
    return out.repartition(F.col(key), F.col("_salt"))

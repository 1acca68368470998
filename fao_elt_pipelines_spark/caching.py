"""Session-wide managed persists.

Operators that branch over an intermediate (LSH signatures, range-partitioned
rank input) must persist it — both so the two branches don't recompute the
upstream and, for sampled repartitionings, so they observe the SAME
partitioning. A query's result depends on its persisted intermediates, so
they cannot be unpersisted before the caller consumes the result; instead
each new query call releases the PREVIOUS call's caches. Long-lived sessions
running many registry queries (the driver's differential harness, bench.py)
therefore hold at most one query's intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MANAGED_CACHES: list[DataFrame] = []


def managed_persist(df: DataFrame) -> DataFrame:
    _MANAGED_CACHES.append(df.persist())
    return df


def release_caches() -> None:
    """Unpersist every intermediate cached by prior query calls."""
    while _MANAGED_CACHES:
        try:
            _MANAGED_CACHES.pop().unpersist()
        except Exception:
            pass

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


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free a ``localCheckpoint()``-ed frame's executor blocks NOW.

    Spark's ContextCleaner releases checkpoint blocks only when the JVM
    garbage-collects the backing RDD, which in a long-lived driver can lag
    indefinitely — a loop producing one checkpointed result per batch
    accumulates storage until then. Walks the analyzed plan and unpersists
    EVERY checkpoint-backed leaf it references (so neither ``df`` nor any
    other frame sharing those leaves may be read afterwards). Returns
    False when the plan holds no checkpoint leaf (nothing to free)."""
    try:
        found = False
        stack = [df._jdf.queryExecution().analyzed()]  # noqa: SLF001
        while stack:
            node = stack.pop()
            if node.getClass().getName().endswith("LogicalRDD"):
                node.rdd().unpersist(False)
                found = True
            else:
                children = node.children()
                for i in range(children.size()):
                    stack.append(children.apply(i))
        return found
    except Exception:
        return False

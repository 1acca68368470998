"""Hypertable rollup cascade: multi-resolution continuous aggregates.

The TimescaleDB/Druid primitive — keep the same measures at several
time resolutions (minute → hour → day …), each COARSER level computed
from the one below it, never from raw, so a 100 TB event table is
touched exactly once and every coarsening step aggregates an input that
is orders of magnitude smaller (the hour level re-aggregates minute
ROWS, not events). The reference never needed one at ~600 rows; a CDC
events pipeline serving dashboards at mixed zoom levels does.

Correctness rests on the measures being re-aggregable monoids:

* ``count``  re-aggregates as SUM of the finer counts;
* ``sum``    as SUM (exact when the caller feeds a decimal column — the
  registry entry does — so re-association cannot change the value the
  way float addition order would);
* ``min``/``max`` as themselves.

``avg`` and friends are derived at read time (sum/count), never stored —
the standard continuous-aggregate rule, because averages don't re-
aggregate. Resolutions must NEST (each coarser an integer multiple of
the finer, all fixed-length — months/years are not fixed-length and are
rejected); nesting is what makes every finer bucket fall entirely inside
one coarser bucket, so re-aggregation is exact, asserted against the
direct-from-raw aggregate in tests/test_rollup.py.

Spark-first shape: every level is one declarative ``groupBy(window…)``
hash aggregate — partial (map-side combine) + final, whole-stage codegen,
no Window operator, no Python. ``F.window`` aligns buckets to the epoch
origin, matching DuckDB's ``time_bucket`` bit-for-bit under the UTC
session timezone. At stream time the finest level is exactly what the
incremental MV (lake/mv.py) or the watermarked streaming aggregate
(streaming/stream_replay.py) maintains; the cascade coarsens those
already-materialized rows.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}

_AGG = {"sum": F.sum, "min": F.min, "max": F.max}
#: how each measure folds into the next-coarser level
_REAGG = {"sum": F.sum, "min": F.min, "max": F.max}


def _resolution_secs(res: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s+(second|minute|hour|day|week)s?\s*", res)
    if not m:
        raise ValueError(
            f"unsupported resolution {res!r}: need '<n> second|minute|hour|day|week' "
            "(months/years are not fixed-length and cannot nest exactly)"
        )
    return int(m.group(1)) * _UNIT_SECS[m.group(2)]


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    resolutions: list[str],
    group_cols: list[str] | None = None,
    measures: dict[str, tuple[str, str | Column]] | None = None,
    count_col: str = "cnt",
) -> dict[str, DataFrame]:
    """Build the cascade: ``{resolution: DataFrame}`` with columns
    ``window_start, window_end, *group_cols, count_col, *measures``.

    ``resolutions`` go finest → coarsest and must nest. ``measures`` maps
    output name → ``(agg, column)`` with agg in sum|min|max; the count is
    always included. Only the FINEST level reads ``df``; every other level
    re-aggregates its predecessor."""
    if not resolutions:
        raise ValueError("need at least one resolution")
    secs = [_resolution_secs(r) for r in resolutions]
    for fine, coarse, fr, cr in zip(secs, secs[1:], resolutions, resolutions[1:]):
        if coarse % fine:
            raise ValueError(
                f"resolutions must nest: {cr!r} ({coarse}s) is not an integer "
                f"multiple of {fr!r} ({fine}s) — a fine bucket would straddle "
                "two coarse buckets and re-aggregation would be wrong"
            )
    groups = list(group_cols or [])
    meas = dict(measures or {})
    bad = {n: a for n, (a, _) in meas.items() if a not in _AGG}
    if bad:
        raise ValueError(f"measure aggs must be sum|min|max, got {bad}")

    def _finish(agged: DataFrame) -> DataFrame:
        return agged.select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *groups,
            count_col,
            *meas.keys(),
        )

    out: dict[str, DataFrame] = {}
    level = _finish(
        df.groupBy(F.window(ts_col, resolutions[0]).alias("win"), *groups).agg(
            F.count("*").alias(count_col),
            *[
                _AGG[a](F.col(c) if isinstance(c, str) else c).alias(n)
                for n, (a, c) in meas.items()
            ],
        )
    )
    out[resolutions[0]] = level
    for res in resolutions[1:]:
        level = _finish(
            level.groupBy(F.window("window_start", res).alias("win"), *groups).agg(
                F.sum(count_col).alias(count_col),
                *[_REAGG[a](F.col(n)).alias(n) for n, (a, _) in meas.items()],
            )
        )
        out[res] = level
    return out

"""Distributed range (interval) join via coarse-bin bucketing.

Two primitives plain equi-joins can't express and naive engines answer
with a cartesian product:

* ``interval_point_join`` — every point row matched to every interval row
  whose half-open ``[start, end)`` contains it (plus optional equality
  keys). The "which incident windows was this event inside" lookup; unlike
  the as-of join (operators/asof.py) a point may match MANY intervals.
* ``interval_overlap_join`` — every pair of intervals (one per side) whose
  half-open spans have a NON-EMPTY intersection:
  ``greatest(l.start, r.start) < least(l.end, r.end)``. (For non-empty
  intervals that is the familiar ``l.start < r.end AND r.start < l.end``;
  an empty interval ``[x, x)`` is the empty set and overlaps nothing, even
  where the naive two-clause predicate would claim it does.)

The reference's SQL surface never needed one at its ~600-row scale, but a
CDC/events pipeline correlating facts against validity windows does
constantly, and the naive formulation — join with only inequality
predicates — is a BroadcastNestedLoopJoin (O(n·m), and undoable when
neither side fits in a broadcast). This is the standard binning
re-expression used by Spark's own range-join hints on Databricks and by
KDB/QuestDB window joins, built here from open DataFrame ops:

1. Pick a bin width ``W`` in the units of the range columns. A point
   belongs to exactly one bin ``floor(p / W)``; an interval is exploded
   (``F.sequence`` + ``explode``, JVM-side, no Python) to every bin its
   span touches — ``floor(start/W) … floor(end/W)``.
2. Equi-join on ``(keys…, bin)``. Catalyst plans a plain shuffled hash /
   sort-merge join (or broadcast, when one side is small) — never a
   nested-loop — so the work is O(matching bin pairs), distributes over
   the bin hash space, and AQE handles a skewed bin like any skewed key.
3. Refine with the exact predicate inside the join condition.

Exactly-once matching without a dedup shuffle:

* point joins: the point sits in ONE bin, so each (point, interval) pair
  can only meet once — no dedup needed, and LEFT OUTER falls out naturally
  (condition in the join, unmatched points keep NULLs).
* overlap joins: a pair could meet in every shared bin, so the join keeps
  it only in its OWNER bin — the bin containing ``greatest(l.start,
  r.start)``. When the overlap is non-empty that value lies inside both
  spans, hence inside both sides' exploded bin sets: each overlapping pair
  survives in exactly one bin, proven by tests/test_range_join.py's brute
  differential.

Scale notes: cost is (rows × bins-per-interval) exploded rows on the
interval side(s); choose ``W`` near the typical interval length so that is
O(1) per interval (the registry query uses W = the window length → ≤ 2
bins each). A pathologically long interval explodes to span/W rows — cap
it with ``max_bins`` (default 4096: a per-row ``raise_error`` branch that
fails the job the moment the interval side is first scanned — at
execution, not plan-build — rather than silently exploding the shuffle).
Bin ids are computed as ``floor(x / W)`` in double precision — exact for
``|x| < 2^53``, which covers epoch micros until year ~2255.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "_rj_bin"


def _bin_of(col: Column, width: int | float) -> Column:
    if not width > 0:
        raise ValueError(f"bin_width must be positive, got {width!r}")
    return F.floor(col / F.lit(width)).cast("long")


def _explode_bins(
    df: DataFrame,
    start_col: str,
    end_col: str,
    width: int | float,
    max_bins: int | None,
) -> DataFrame:
    lo = _bin_of(F.col(start_col), width)
    hi = _bin_of(F.col(end_col), width)
    # half-open [start, end): empty intervals match nothing and would make
    # F.sequence descend — drop them up front.
    nonempty = df.filter(F.col(end_col) > F.col(start_col))
    if max_bins is not None:
        guard = F.when(
            hi - lo < F.lit(max_bins), lo
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "interval [%s, %s) spans more than max_bins=%s bins of "
                    "width %s; raise bin_width or max_bins",
                    F.col(start_col).cast("string"),
                    F.col(end_col).cast("string"),
                    F.lit(str(max_bins)),
                    F.lit(str(width)),
                )
            )
        )
        lo = guard
    return nonempty.withColumn(_BIN, F.explode(F.sequence(lo, hi)))


def _prefixed(df: DataFrame, cols: list[str], prefix: str) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumnRenamed(c, f"{prefix}{c}")
    return out


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_width: int | float = 1,
    how: str = "inner",
    prefix: str = "rj_",
    max_bins: int | None = 4096,
) -> DataFrame:
    """Match every ``points`` row to the ``intervals`` rows whose half-open
    ``[start_col, end_col)`` contains ``point_col`` (and whose ``on`` keys
    are equal). One output row per matching pair; ``how='left'`` keeps
    unmatched points with NULL interval columns. Interval columns (other
    than the keys) come back prefixed with ``prefix``."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = list(on or [])
    for c in (start_col, end_col, *keys):
        if c not in intervals.columns:
            raise ValueError(f"interval side lacks column {c!r}")
    if point_col not in points.columns:
        raise ValueError(f"point side lacks column {point_col!r}")
    ipay = [c for c in intervals.columns if c not in keys]
    collisions = [f"{prefix}{c}" for c in ipay if f"{prefix}{c}" in points.columns] + [
        f"{prefix}{c}"
        for c in ipay
        if f"{prefix}{c}" != c and f"{prefix}{c}" in intervals.columns
    ]
    if collisions:
        raise ValueError(f"prefixed interval columns collide: {sorted(set(collisions))}")

    iv = _prefixed(
        _explode_bins(intervals, start_col, end_col, bin_width, max_bins), ipay, prefix
    )
    pt = points.withColumn(_BIN, _bin_of(F.col(point_col), bin_width))
    p, s, e = F.col(point_col), F.col(f"{prefix}{start_col}"), F.col(f"{prefix}{end_col}")
    cond = (pt[_BIN] == iv[_BIN]) & (s <= p) & (p < e)
    for k in keys:
        cond &= pt[k].eqNullSafe(iv[k])
    joined = pt.join(iv, cond, how)
    return joined.select(
        *[pt[c] for c in points.columns],
        *[iv[f"{prefix}{c}"] for c in ipay],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: list[str] | None = None,
    bin_width: int | float = 1,
    l_prefix: str = "l_",
    r_prefix: str = "r_",
    max_bins: int | None = 4096,
) -> DataFrame:
    """Inner join of two interval tables on non-empty half-open span
    intersection (``greatest(l.start, r.start) < least(l.end, r.end)``,
    plus equal ``on`` keys; empty intervals overlap nothing). Every
    overlapping pair appears EXACTLY once — matched only in the bin
    containing ``greatest(l.start, r.start)``. All columns come back
    prefixed (keys keep the left side's values, unprefixed)."""
    keys = list(on or [])
    for c, side, name in (
        (l_start, left, "left"),
        (l_end, left, "left"),
        (r_start, right, "right"),
        (r_end, right, "right"),
        *[(k, left, "left") for k in keys],
        *[(k, right, "right") for k in keys],
    ):
        if c not in side.columns:
            raise ValueError(f"{name} side lacks column {c!r}")
    lpay = [c for c in left.columns if c not in keys]
    rpay = [c for c in right.columns if c not in keys]
    out_names = [*keys, *(f"{l_prefix}{c}" for c in lpay), *(f"{r_prefix}{c}" for c in rpay)]
    dupes = sorted({n for n in out_names if out_names.count(n) > 1})
    side_clash = [
        f"{p}{c}"
        for p, pay, side in ((l_prefix, lpay, left), (r_prefix, rpay, right))
        for c in pay
        if f"{p}{c}" != c and f"{p}{c}" in side.columns
    ]
    if dupes or side_clash:
        raise ValueError(f"prefixed columns collide: {sorted({*dupes, *side_clash})}")
    l = _prefixed(_explode_bins(left, l_start, l_end, bin_width, max_bins), lpay, l_prefix)  # noqa: E741
    r = _prefixed(_explode_bins(right, r_start, r_end, bin_width, max_bins), rpay, r_prefix)
    ls, le = F.col(f"{l_prefix}{l_start}"), F.col(f"{l_prefix}{l_end}")
    rs, re_ = F.col(f"{r_prefix}{r_start}"), F.col(f"{r_prefix}{r_end}")
    owner = _bin_of(F.greatest(ls, rs), bin_width)
    cond = (
        (l[_BIN] == r[_BIN])
        & (ls < re_)
        & (rs < le)
        & (l[_BIN] == owner)  # exactly-once: only the owner bin emits the pair
    )
    for k in keys:
        cond &= l[k].eqNullSafe(r[k])
    joined = l.join(r, cond, "inner")
    return joined.select(
        *[l[k] for k in keys],
        *[l[f"{l_prefix}{c}"] for c in lpay],
        *[r[f"{r_prefix}{c}"] for c in rpay],
    )

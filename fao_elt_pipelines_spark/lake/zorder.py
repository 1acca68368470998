"""Z-order (Morton) clustering support: multi-dimensional data layout.

The lake's buckets give hash-locality on the MERGE key; WITHIN a bucket
the sorted-merge strategy lays files out by key order, so per-file
manifest bounds are tight on the leading key (``repo``) and useless on
anything else — a predicate on ``path`` (or any secondary column) reads
every file. Z-ordering is the standard fix (Delta OPTIMIZE ZORDER BY,
Iceberg's sort-order z transform): map each clustering column to a rank
bin, interleave the bins' bits into one Morton code, sort by it — every
file then covers a small hyper-rectangle, so per-file min/max bounds are
tight on EVERY clustering column at once, trading a little leading-key
tightness for pruning on all of them.

Ranks, not raw values: bit-interleaving needs uniform fixed-width
integers. Raw values (skewed, strings, arbitrary ranges) are mapped
through per-column cutpoints — boundaries taken from a seeded sample's
quantiles — so each column contributes ~log2(bins) uniformly-populated
bits regardless of distribution. This is what Delta does with its
range-partition ids; here the cutpoints are explicit, deterministic
(seeded sample), and live in the commit summary for audit.

The z-value computation is a vectorized Arrow-batched pandas UDF
(np.searchsorted per column + a bit-interleave loop over ~10 bits) —
it exists only in the rewrite job, never on the read path.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_cutpoints(
    df: DataFrame, cols: list[str], bins: int, fraction: float, seed: int = 7
) -> dict[str, list[Any]]:
    """Per-column bin boundaries from a seeded sample: ``bins - 1``
    quantile cuts (deduplicated — low-cardinality columns get fewer,
    which just means fewer occupied bins). Deterministic for a given
    (data, fraction, seed)."""
    if not 0 < fraction <= 1:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    sample = df.select(*cols).sample(fraction=fraction, seed=seed).collect()
    cuts: dict[str, list[Any]] = {}
    for c in cols:
        vals = sorted(r[c] for r in sample if r[c] is not None)
        if not vals:
            cuts[c] = []
            continue
        n = len(vals)
        # Snap each column's occupied-bin count DOWN to a power of two by
        # recutting: a column whose cardinality undershoots ``bins`` (400
        # distinct paths at bins=1024) would otherwise fill its bit-width
        # with holes and a skew-populated top bit, and z-runs crossing
        # those artifacts carry loose per-file bounds (measured: 64/268
        # files pruned unsaturated vs 199/268 saturated on the same
        # layout). Quantile cuts at a power-of-two count give bins that
        # are both fully populated and hole-free.
        b = bins
        while True:
            bounds = sorted({vals[min(n - 1, (i * n) // b)] for i in range(1, b)})
            occupied = len(bounds) + 1
            target = 1 << max(0, occupied.bit_length() - 1)
            if occupied <= 1 or occupied == target or b == target:
                break
            b = target
        cuts[c] = bounds
    return cuts


def _col_nbits(cuts: dict[str, list[Any]], cols: list[str], bins: int) -> list[int]:
    """Per-column bit widths from the ACTUAL occupied-bin count, capped by
    ``bins``. A column whose cardinality is far below ``bins`` (e.g. 400
    distinct paths at bins=1024) would otherwise carry dead top interleave
    bits — the Morton code's most significant bits then encode only the
    other columns, and file slices stop constraining the sparse column
    (measured: 11/139 files pruned at a dead-bit width vs 199/268 when
    both dims saturate their bits). Bin indices run 0..len(bounds), so
    the width is ceil(log2(len(bounds)+1))."""
    cap = max(1, math.ceil(math.log2(max(2, bins))))
    return [
        min(cap, max(1, math.ceil(math.log2(max(2, len(cuts.get(c) or []) + 1)))))
        for c in cols
    ]


def _interleave(bin_arrays: list[np.ndarray], nbits: list[int]) -> np.ndarray:
    """Variable-width Morton interleave, MSB-aligned: round-robin from
    each column's TOP bit down, so every column's most significant bits
    land in the highest output positions regardless of width differences.
    LSB-aligned interleaving would hand a wider column's surplus bits the
    top of the code and stop constraining the narrower column's per-file
    bounds (the pruning collapse measured in bench/zorder_ab.py); a
    column's surplus depth belongs at the BOTTOM, refining order within
    files, not displacing other columns' coarse structure above them.
    Equal widths reduce to the classic alternation."""
    z = np.zeros(len(bin_arrays[0]), dtype=np.int64)
    out_bit = sum(nbits) - 1
    for k in range(max(nbits)):
        for j, b in enumerate(bin_arrays):
            if k < nbits[j]:
                bit = nbits[j] - 1 - k
                z |= ((b >> bit) & 1).astype(np.int64) << out_bit
                out_bit -= 1
    return z


def zvalue_column(cols: list[str], cuts: dict[str, list[Any]], bins: int) -> Column:
    """A Column computing the Morton code of ``cols`` under ``cuts``.
    NULLs bin to 0 (they cluster together at the low corner). Each
    column's bit width auto-derives from its occupied-bin count (see
    ``_col_nbits``), so ``bins`` is a ceiling, not a fixed width."""
    nbits = _col_nbits(cuts, cols, bins)
    if sum(nbits) > 62:
        raise ValueError(
            f"{len(cols)} columns totalling {sum(nbits)} interleave bits "
            "exceeds the int64 z-code; lower bins or cluster fewer columns"
        )

    @F.pandas_udf("long")
    def zval(*series: pd.Series) -> pd.Series:
        bin_arrays = []
        for c, s in zip(cols, series):
            bounds = cuts[c]
            if not bounds:
                bin_arrays.append(np.zeros(len(s), dtype=np.int64))
                continue
            null_mask = s.isna().to_numpy()
            filled = s.fillna(bounds[0])
            arr = filled.to_numpy()
            if arr.dtype == object:
                b = np.searchsorted(np.array(bounds, dtype=object), arr, side="right")
            else:
                b = np.searchsorted(np.asarray(bounds), arr, side="right")
            b = b.astype(np.int64)
            b[null_mask] = 0
            bin_arrays.append(b)
        return pd.Series(_interleave(bin_arrays, nbits))

    return zval(*[F.col(c) for c in cols])

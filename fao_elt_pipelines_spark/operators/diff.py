"""Full-outer image diff → row-level change events.

The single implementation behind both CDC emitters: the lake changelog
(lake/changelog.row_changes, snapshot-to-snapshot) and the streaming state
store (streaming/partial_state.PartialStateStore.changes,
version-to-version). Both previously carried their own copy of the same
join; one operator, both backends' tests drive it.

Shape (the 100×-correct one): ONE full-outer equi-join on the key columns,
one null-safe struct equality to drop no-op keys, one explode to emit
update pre+post pairs — no window, no second shuffle. The caller restricts
both images to touched buckets/keys first, so the join is O(changed keys),
not O(table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INSERT = "insert"
DELETE = "delete"
UPDATE_PRE = "update_preimage"
UPDATE_POST = "update_postimage"


def image_diff(
    before: DataFrame,
    after: DataFrame,
    keys: Sequence[str],
    change_col: str = "_change_type",
) -> DataFrame:
    """Diff two live images sharing a schema. Output = key columns +
    payload columns + ``change_col`` (insert / delete / update_preimage /
    update_postimage); updates emit exactly two rows. Set semantics, no
    ordering guarantee. A key present in both images with an identical
    payload emits nothing (e.g. a late event that lost LWW)."""
    keys = list(keys)
    payload = [c for c in after.columns if c not in keys]
    b = before.select(*keys, F.struct(*payload).alias("_b"))
    a = after.select(*keys, F.struct(*payload).alias("_a"))
    j = b.join(a, keys, "full_outer").filter(~F.col("_b").eqNullSafe(F.col("_a")))

    def ev(change_type: str, img: str):
        return F.struct(F.lit(change_type).alias("t"), F.col(img).alias("img"))

    arr = (
        F.when(F.col("_b").isNull(), F.array(ev(INSERT, "_a")))
        .when(F.col("_a").isNull(), F.array(ev(DELETE, "_b")))
        .otherwise(F.array(ev(UPDATE_PRE, "_b"), ev(UPDATE_POST, "_a")))
    )
    return j.select(*keys, F.explode(arr).alias("_c")).select(
        *keys,
        *[F.col(f"_c.img.{c}").alias(c) for c in payload],
        F.col("_c.t").alias(change_col),
    )

"""Exact vs approximate percentiles (q_gold_percentiles and its scale
twin).

The exact form is oracle-hashed (bit-equal to DuckDB's quantile_cont —
same (n-1)·p position and linear interpolation). The scale twin,
``approx_percentile`` (t-digest), is legitimately engine-specific, so it
is PROPERTY-tested here instead: its answer must land within the sketch's
accuracy contract of the exact answer, and its plan must stay a mergeable
hash aggregate (map-side combined — the shape that scales to
high-cardinality groups where the exact sort-per-group form would not).
"""

import bisect

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.plans.queries import load, q_gold_percentiles
from tests.plan_utils import n_nodes, plan_of

ACCURACY = 10_000  # approx_percentile accuracy knob: err <= 1/accuracy of n


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    return {
        r.event_type: r
        for r in q_gold_percentiles(spark, sf_dir).collect()
    }


def test_approx_within_rank_error(spark, sf_dir, exact):
    """t-digest answers must be within the rank-error contract: the
    returned value's RANK in the group is within n/ACCURACY of the target
    rank (value-distance is the wrong metric for heavy tails)."""
    ev = load(spark, sf_dir, "events")
    approx = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_percentile("value", 0.5, ACCURACY).alias("a50"),
            F.approx_percentile("value", 0.99, ACCURACY).alias("a99"),
        )
        .collect()
    }
    vals = {
        et: sorted(r.value for r in ev.filter(F.col("event_type") == et).collect())
        for et in exact
    }
    for et, row in exact.items():
        n = row.n
        tol = max(1, n // ACCURACY + 1)
        for q, a in ((0.5, approx[et].a50), (0.99, approx[et].a99)):
            target = (n - 1) * q
            # rank of the approx answer among the group's sorted values
            lo = bisect.bisect_left(vals[et], a)
            hi = bisect.bisect_right(vals[et], a)
            assert lo - tol <= target <= hi + tol, (et, q, a, lo, hi, target)


def test_plan_classes(spark, sf_dir):
    """Exact percentiles need the group's values (SortAggregate /
    ObjectHashAggregate); approx_percentile stays a mergeable
    HashAggregate with a partial (map-side) phase."""
    ev = load(spark, sf_dir, "events")
    exact_plan = plan_of(
        ev.groupBy("event_type").agg(F.percentile("value", 0.9).alias("p"))
    )
    assert (
        n_nodes(exact_plan, "SortAggregate") + n_nodes(exact_plan, "ObjectHashAggregate")
        >= 2  # partial + final
    ), exact_plan
    approx_plan = plan_of(
        ev.groupBy("event_type").agg(F.approx_percentile("value", 0.9, 100).alias("p"))
    )
    assert (
        n_nodes(approx_plan, "ObjectHashAggregate") + n_nodes(approx_plan, "HashAggregate")
        >= 2
    ), approx_plan
    assert n_nodes(approx_plan, "SortAggregate") == 0, approx_plan

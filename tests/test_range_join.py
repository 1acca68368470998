"""Semantics + plan tests for the distributed range join
(operators/range_join.py).

The brute oracle is the definition itself: a driver-side double loop with
the exact half-open predicates, over seeded random frames whose interval
lengths straddle the bin width (0.2x .. 5x) so intervals cover 1..many
bins and pairs meet in several shared bins — exercising the owner-bin
exactly-once rule, boundary inclusivity, and empty intervals.
"""

import random

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.operators.range_join import (
    interval_overlap_join,
    interval_point_join,
)
from tests.plan_utils import n_nodes, plan_of


def _points(spark, rows):
    return spark.createDataFrame(rows, ["pid", "k", "p"])


def _intervals(spark, rows):
    return spark.createDataFrame(rows, ["iid", "k", "s", "e"])


@pytest.fixture(scope="module")
def rand_sides(spark):
    rng = random.Random(20260820)
    pts = [(i, f"k{rng.randrange(3)}", rng.randrange(0, 1000)) for i in range(200)]
    ivs = []
    for i in range(80):
        s = rng.randrange(0, 1000)
        ln = rng.choice([0, 2, 7, 10, 25, 50])  # 0 = empty interval (matches nothing)
        ivs.append((i, f"k{rng.randrange(3)}", s, s + ln))
    return pts, ivs, _points(spark, pts), _intervals(spark, ivs)


def _brute_point(pts, ivs, keyed):
    out = set()
    for pid, pk, p in pts:
        for iid, ik, s, e in ivs:
            if (not keyed or pk == ik) and s <= p < e:
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("keyed", [False, True])
@pytest.mark.parametrize("width", [3, 10, 64])
def test_point_join_matches_brute(rand_sides, keyed, width):
    pts, ivs, pdf, idf = rand_sides
    got = interval_point_join(
        pdf, idf.drop("k") if not keyed else idf,
        point_col="p", start_col="s", end_col="e",
        on=["k"] if keyed else None, bin_width=width,
    )
    pairs = {(r.pid, r.rj_iid) for r in got.collect()}
    assert pairs == _brute_point(pts, ivs, keyed)


def test_point_join_boundaries(spark):
    pdf = _points(spark, [(0, "k", 10), (1, "k", 19), (2, "k", 20), (3, "k", 9)])
    idf = _intervals(spark, [(7, "k", 10, 20)])
    got = interval_point_join(pdf, idf, "p", "s", "e", on=["k"], bin_width=4)
    # half-open: start inclusive (10 ✓), end exclusive (20 ✗), below (9 ✗)
    assert {r.pid for r in got.collect()} == {0, 1}


def test_point_join_left_outer_keeps_misses(spark):
    pdf = _points(spark, [(0, "k", 10), (1, "k", 99), (2, "other", 10)])
    idf = _intervals(spark, [(7, "k", 10, 20)])
    got = interval_point_join(pdf, idf, "p", "s", "e", on=["k"], bin_width=8, how="left")
    rows = {r.pid: r.rj_iid for r in got.collect()}
    assert rows == {0: 7, 1: None, 2: None}
    assert got.count() == 3  # one row per point, matched or not


def test_point_join_multi_match(spark):
    # overlapping intervals: the point matches BOTH (range join, not as-of)
    pdf = _points(spark, [(0, "k", 15)])
    idf = _intervals(spark, [(1, "k", 10, 20), (2, "k", 14, 16), (3, "k", 16, 30)])
    got = interval_point_join(pdf, idf, "p", "s", "e", on=["k"], bin_width=5)
    assert sorted(r.rj_iid for r in got.collect()) == [1, 2]


def _brute_overlap(livs, rivs, keyed):
    out = set()
    for lid, lk, ls, le in livs:
        for rid, rk, rs, re_ in rivs:
            if (not keyed or lk == rk) and ls < re_ and rs < le:
                out.add((lid, rid))
    return out


@pytest.mark.parametrize("keyed", [False, True])
@pytest.mark.parametrize("width", [3, 10, 64])
def test_overlap_join_matches_brute_exactly_once(spark, rand_sides, keyed, width):
    _, livs, _, ldf = rand_sides
    rng = random.Random(9)
    rivs = []
    for i in range(60):
        s = rng.randrange(0, 1000)
        rivs.append((i, f"k{rng.randrange(3)}", s, s + rng.choice([1, 5, 30, 120])))
    rdf = _intervals(spark, rivs)
    got = interval_overlap_join(
        ldf, rdf.drop("k") if not keyed else rdf,
        l_start="s", l_end="e", r_start="s", r_end="e",
        on=["k"] if keyed else None, bin_width=width,
    ).collect()
    pairs = [(r.l_iid, r.r_iid) for r in got]
    # exactly-once: multiset == set == brute (no owner-bin duplicates)
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _brute_overlap(
        [x for x in livs if x[3] > x[2]], rivs, keyed
    )


def test_max_bins_guard_raises(spark):
    pdf = _points(spark, [(0, "k", 5)])
    idf = _intervals(spark, [(1, "k", 0, 10_000)])
    got = interval_point_join(pdf, idf, "p", "s", "e", bin_width=1, max_bins=16)
    with pytest.raises(Exception, match="max_bins"):
        got.collect()


def test_collision_raises(spark):
    pdf = _points(spark, [(0, "k", 5)]).withColumnRenamed("pid", "rj_iid")
    idf = _intervals(spark, [(1, "k", 0, 10)])
    with pytest.raises(ValueError, match="collide"):
        interval_point_join(pdf, idf, "p", "s", "e", bin_width=4)


def test_plan_no_nested_loop(spark, rand_sides):
    """The whole point: the physical plan is a bin equi-join, never a
    cartesian/nested-loop — even with ZERO equality keys."""
    _, _, pdf, idf = rand_sides
    for df in (
        interval_point_join(pdf, idf.drop("k"), "p", "s", "e", bin_width=10),
        interval_overlap_join(
            idf, idf.drop("k"), "s", "e", "s", "e", bin_width=10,
            l_prefix="a_", r_prefix="b_",
        ),
    ):
        plan = plan_of(df)
        assert n_nodes(plan, "CartesianProduct") == 0, plan
        assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan

"""Semantics + plan tests for the distributed as-of join (operators/asof.py).

The brute oracle used here is the definition itself: for every left row,
filter the right side per-key to ts at-or-before (backward) / at-or-after
(forward), and take the extreme — computed driver-side over small synthetic
frames that cover misses, exact-timestamp hits, ties, and tolerance edges.
"""

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.operators.asof import asof_join
from tests.plan_utils import n_nodes, plan_of


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


@pytest.fixture()
def sides(spark):
    left = _mk(
        spark,
        [
            ("u1", 10, "a"),
            ("u1", 20, "b"),
            ("u1", 5, "c"),   # before any right row → miss
            ("u2", 50, "d"),
            ("u3", 50, "e"),  # key with no right rows at all → miss
        ],
        ["k", "t", "lpay"],
    )
    right = _mk(
        spark,
        [
            ("u1", 10, 100.0),  # exact-timestamp hit (inclusive)
            ("u1", 15, 150.0),
            ("u1", 30, 300.0),  # after every left u1 row
            ("u2", 7, 70.0),
        ],
        ["k", "t", "rpay"],
    )
    return left, right


def _brute(left_rows, right_rows, backward=True, tolerance=None):
    out = {}
    for k, t, lpay in left_rows:
        cands = [
            (rt, rp)
            for (rk, rt, rp) in right_rows
            if rk == k and (rt <= t if backward else rt >= t)
        ]
        if tolerance is not None:
            cands = [(rt, rp) for rt, rp in cands if abs(rt - t) <= tolerance]
        best = (max if backward else min)(cands) if cands else None
        out[(k, t, lpay)] = best
    return out


def test_backward_matches_brute(spark, sides):
    left, right = sides
    got = {
        (r["k"], r["t"], r["lpay"]): (r["asof_t"], r["asof_rpay"])
        for r in asof_join(left, right, on=["k"], left_ts="t", right_ts="t").collect()
    }
    brute = _brute(
        [(r["k"], r["t"], r["lpay"]) for r in left.collect()],
        [(r["k"], r["t"], r["rpay"]) for r in right.collect()],
    )
    assert set(got) == set(brute)
    for key, best in brute.items():
        assert got[key] == (best if best else (None, None)), key


def test_forward_matches_brute(spark, sides):
    left, right = sides
    got = {
        (r["k"], r["t"], r["lpay"]): (r["asof_t"], r["asof_rpay"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t", direction="forward"
        ).collect()
    }
    brute = _brute(
        [(r["k"], r["t"], r["lpay"]) for r in left.collect()],
        [(r["k"], r["t"], r["rpay"]) for r in right.collect()],
        backward=False,
    )
    for key, best in brute.items():
        assert got[key] == (best if best else (None, None)), key


def test_numeric_tolerance_nulls_stale_matches(spark, sides):
    left, right = sides
    got = {
        (r["k"], r["t"]): (r["asof_t"], r["asof_rpay"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t", tolerance=5
        ).collect()
    }
    # u1@20 matches 15 (within 5); u2@50's only candidate is 7 → out of range
    assert got[("u1", 20)] == (15, 150.0)
    assert got[("u2", 50)] == (None, None)
    # all left rows survive — tolerance nulls the payload, never drops rows
    assert len(got) == 5


def test_interval_tolerance_on_timestamps(spark):
    left = _mk(spark, [("u", "2024-01-10", 1)], ["k", "d", "i"]).select(
        "k", F.col("d").cast("timestamp").alias("t"), "i"
    )
    right = _mk(
        spark, [("u", "2024-01-01", 1.0), ("u", "2024-01-08", 8.0)], ["k", "d", "v"]
    ).select("k", F.col("d").cast("timestamp").alias("t"), "v")
    ok = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                   tolerance="3 days").collect()[0]
    assert ok["asof_v"] == 8.0
    none = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                     tolerance="1 days").collect()[0]
    assert none["asof_v"] is None


def test_tiebreak_picks_largest(spark):
    left = _mk(spark, [("u", 10, 1)], ["k", "t", "i"])
    right = _mk(
        spark,
        [("u", 10, 1, 111.0), ("u", 10, 9, 999.0), ("u", 10, 5, 555.0)],
        ["k", "t", "seq", "v"],
    )
    r = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  tiebreak="seq").collect()[0]
    assert (r["asof_seq"], r["asof_v"]) == (9, 999.0)


def test_tiebreak_keeps_caller_type(spark):
    """Non-integral tiebreaks must win by their OWN ordering — a long cast
    would truncate 1.9 and 1.2 to the same 1 (arbitrary winner) and NULL
    out strings entirely."""
    left = _mk(spark, [("u", 10, 1)], ["k", "t", "i"])
    right = _mk(
        spark,
        [("u", 10, 1.2, "low"), ("u", 10, 1.9, "high")],
        ["k", "t", "score", "label"],
    )
    r = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  tiebreak="score").collect()[0]
    assert (r["asof_score"], r["asof_label"]) == (1.9, "high")
    r2 = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                   tiebreak="label").collect()[0]
    assert r2["asof_label"] == "low"  # lexicographically largest wins
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  tiebreak="nope")


def test_permutation_invariance(spark, sides):
    left, right = sides
    base = sorted(
        map(tuple, asof_join(left, right, on=["k"], left_ts="t", right_ts="t").collect())
    )
    shuffled = sorted(
        map(
            tuple,
            asof_join(
                left.orderBy(F.rand(7)).repartition(5),
                right.orderBy(F.rand(13)).repartition(3),
                on=["k"], left_ts="t", right_ts="t",
            ).collect(),
        )
    )
    assert base == shuffled


def test_collision_and_direction_guards(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t", direction="nearest")
    with pytest.raises(ValueError, match="lacks timestamp"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="zzz")
    clash = left.withColumn("asof_rpay", F.lit(0))
    with pytest.raises(ValueError, match="collide"):
        asof_join(clash, right, on=["k"], left_ts="t", right_ts="t")


def test_payload_less_right_side(spark, sides):
    left, right = sides
    r = {
        (x["k"], x["t"]): x["asof_t"]
        for x in asof_join(
            left, right.select("k", "t"), on=["k"], left_ts="t", right_ts="t"
        ).collect()
    }
    assert r[("u1", 20)] == 15 and r[("u3", 50)] is None


def test_asof_plan_single_exchange_no_cartesian(spark, sf_dir):
    """The union-window formulation must plan exactly one hash Exchange on
    the keys (AQE may add none beyond it), never a cartesian/broadcast-
    nested-loop product, and never a single-partition window."""
    from fao_elt_pipelines_spark.plans.queries import q_asof_join_events

    df = q_asof_join_events(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Exchange SinglePartition" not in plan, plan
    # scans → union → ONE hash exchange on the key (ties resolve inside the
    # window via tiebreak, so no dedup pre-aggregation shuffle exists)
    assert n_nodes(plan, "Exchange") == 1, plan
    assert "PythonUDF" not in plan

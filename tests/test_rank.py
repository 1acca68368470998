"""operators.rank.global_rank: exact SQL rank() parity without a
single-partition window."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.operators.rank import global_rank


def _reference_rank(df, col, out, descending=True):
    order = F.desc_nulls_last(col) if descending else F.asc_nulls_last(col)
    return df.withColumn(out, F.rank().over(Window.orderBy(order)))


def test_global_rank_matches_window_with_ties_and_nulls(spark):
    rng = random.Random(7)
    rows = [(i, rng.choice([None, 1.0, 2.5, 2.5, 3.0, 3.0, 3.0, 9.9])) for i in range(500)]
    df = spark.createDataFrame(rows, "id LONG, v DOUBLE").repartition(8)
    got = {
        (r["id"], r["rnk"])
        for r in global_rank(df, "v", "rnk", num_partitions=6).collect()
    }
    want = {
        (r["id"], r["rnk"]) for r in _reference_rank(df, "v", "rnk").collect()
    }
    assert got == want


def test_global_rank_ascending_and_empty(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 10.0), (3, 5.0)], "id LONG, v DOUBLE")
    got = {
        (r["id"], r["rnk"])
        for r in global_rank(df, "v", "rnk", descending=False).collect()
    }
    assert got == {(3, 1), (1, 2), (2, 2)}
    empty = df.filter("v > 100")
    assert global_rank(empty, "v", "rnk").count() == 0


def test_global_rank_many_partitions_few_rows(spark):
    # more range partitions than rows: offsets must still line up
    df = spark.createDataFrame([(i, float(i % 3)) for i in range(7)], "id LONG, v DOUBLE")
    got = global_rank(df, "v", "rnk", num_partitions=16)
    want = _reference_rank(df, "v", "rnk")
    assert {(r["id"], r["rnk"]) for r in got.collect()} == {
        (r["id"], r["rnk"]) for r in want.collect()
    }


def test_global_cumsum_matches_window(spark):
    from fao_elt_pipelines_spark.operators.rank import global_cumsum

    rows = [(i, (i * 37) % 11 + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in global_cumsum(df, "k", "v", "cum", num_partitions=8).collect()
    }
    acc, want = 0, {}
    for k, v in sorted(rows):
        acc += v
        want[k] = acc
    assert got == want


def test_global_cumsum_empty(spark):
    from fao_elt_pipelines_spark.operators.rank import global_cumsum

    df = spark.createDataFrame([], "k long, v long")
    assert global_cumsum(df, "k", "v", "cum").count() == 0


def test_topk_orders_equals_global_rank_topk(spark, sf_dir):
    """Registry twin-tie: q_topk_orders (TakeOrderedAndProject ORDER BY +
    LIMIT) equals filter(global_rank <= k) + the same total order applied
    to that by-construction-tiny survivor set. Justifies topk_orders'
    _ROTATION_TAIL seat: the top-k semantics stay pinned every pytest run
    through the distributed-rank path that IS in-cap machinery
    (pack_sequences' cumsum, gold ranks)."""
    from fao_elt_pipelines_spark.operators.rank import global_rank
    from fao_elt_pipelines_spark.plans.queries import load, q_topk_orders

    want = [
        (r.o_orderkey, r.o_custkey, r.o_totalprice, r.o_orderpriority)
        for r in q_topk_orders(spark, sf_dir).collect()
    ]

    ranked = global_rank(load(spark, sf_dir, "orders"), "o_totalprice", "rnk")
    survivors = ranked.filter("rnk <= 10").collect()  # ties: tiny, >= 10 rows
    got = [
        (r.o_orderkey, r.o_custkey, r.o_totalprice, r.o_orderpriority)
        for r in sorted(survivors, key=lambda r: (-r.o_totalprice, r.o_orderkey))
    ][:10]
    assert got == want

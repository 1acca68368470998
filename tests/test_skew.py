"""Skew machinery: hot-key detection on the Zipf binlog and the load-spread
guarantee of salted repartitioning (north rule: 'salted repartitioning for
hot-repo skew')."""

from pyspark.sql import functions as F

from fao_elt_pipelines_spark import binlog
from fao_elt_pipelines_spark.operators.skew import detect_hot_keys, salted_repartition


def test_detect_hot_keys_finds_zipf_head(spark):
    ev = binlog.change_events(spark, 50_000, n_repos=100)
    hot = detect_hot_keys(ev, "repo", sample_fraction=0.2, hot_share=0.05)
    assert hot, "Zipf-skewed binlog must surface hot repos"
    # the detected keys really are the heavy hitters: detection requires a
    # >=5% share of the 20% sample, so the true share must clear 5% minus
    # sampling tolerance (3-sigma on a 10k-row sample is ~0.7pp)
    total = ev.count()
    counts = {r["repo"]: r["cnt"] for r in ev.groupBy("repo").agg(F.count("*").alias("cnt")).collect()}
    for k in hot:
        assert counts[k] / total > 0.04


def test_salted_repartition_spreads_hot_key(spark):
    ev = binlog.change_events(spark, 50_000, n_repos=100)
    hot = detect_hot_keys(ev, "repo", sample_fraction=0.2, hot_share=0.05)
    salted = salted_repartition(ev, "repo", hot_keys=hot, salt_buckets=8, num_partitions=16)

    # hot keys fan out over >1 salt bucket; cold keys stay consolidated at 0
    per_key_salts = {
        r["repo"]: r["n_salts"]
        for r in salted.groupBy("repo")
        .agg(F.countDistinct("_salt").alias("n_salts"))
        .collect()
    }
    assert all(per_key_salts[k] > 1 for k in hot)
    assert all(n == 1 for k, n in per_key_salts.items() if k not in hot)

    # partition-level balance: no partition holds more than ~3x the mean
    sizes = [
        r["cnt"]
        for r in salted.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    mean = sum(sizes) / len(sizes)
    assert max(sizes) <= 3 * mean, sizes

    # determinism: the salt is hash-derived, so a recompute lands identically
    a = sorted(salted.select("seq", "_salt").collect())
    b = sorted(salted_repartition(ev, "repo", hot_keys=hot, salt_buckets=8, num_partitions=16)
               .select("seq", "_salt").collect())
    assert a == b

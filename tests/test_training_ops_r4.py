"""Round-4 training-set-assembly ops (shuffle / domain mix / vocab) and the
twin ties that let pack_sequences, sample_stratified and text_token_stats
rotate to the registry tail (plans/registry.py docstring).

Exact-value correctness vs DuckDB is covered for all three new entries by
tests/test_entry_oracle.py's all-registry differential; these tests pin the
cross-entry equivalences and the structural invariants.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.functions import text as TX
from fao_elt_pipelines_spark.plans import queries_ml as QM
from fao_elt_pipelines_spark.plans.queries import load


def test_bpe_tokens_size_equals_count(spark, sf_dir):
    """Twin tie for text_token_stats' tail seat: the array that
    vocab_top_tokens explodes has exactly the size text_token_stats
    counts, doc by doc."""
    d = load(spark, sf_dir, "documents")
    bad = d.filter(
        F.size(TX.bpe_ish_tokens(F.col("text"))) != TX.bpe_ish_token_count(F.col("text"))
    ).count()
    assert bad == 0


def test_vocab_total_matches_token_stats_sum(spark, sf_dir):
    """The vocab coverage denominator (total BPE-ish pieces) equals the
    sum of text_token_stats' per-doc counts — same tokenization, end to
    end."""
    stats_sum = (
        QM.q_text_token_stats(spark, sf_dir).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    )
    d = load(spark, sf_dir, "documents")
    exploded = d.select(F.explode(TX.bpe_ish_tokens(F.col("text"))).alias("t")).count()
    assert stats_sum == exploded


def test_stratified_membership_is_md5_prefix_primitive(spark, sf_dir):
    """Twin tie for sample_stratified's tail seat: its inlined keep rule
    is exactly the shared _md5_prefix4 primitive sample_domain_mix
    filters with."""
    d = load(spark, sf_dir, "documents")
    thr = F.lit(QM.SAMPLE_DEFAULT_THRESHOLD)
    for lang, t in QM.SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    re_impl = {
        r[0]
        for r in d.filter(QM._md5_prefix4("samp|") < thr).select("doc_id").collect()
    }
    entry = {
        r[0] for r in QM.q_sample_stratified(spark, sf_dir).select("doc_id").collect()
    }
    assert re_impl == entry


def test_shuffle_pos_equals_single_partition_window(spark, sf_dir):
    """Twin tie for pack_sequences' tail seat (the shared two-phase
    operators/rank.py scheme): the distributed global_rank positions
    equal the single-partition window rank oracle."""
    out = QM.q_shuffle_training_order(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string"))).alias("hk"),
    )
    ref = d.withColumn(
        "pos", F.rank().over(Window.orderBy("hk")).cast("long")
    ).select("doc_id", "pos")
    joined = out.join(ref, "doc_id")
    assert joined.filter(F.col("shuffle_pos") != F.col("pos")).count() == 0
    assert out.count() == ref.count()


def test_shuffle_is_a_permutation(spark, sf_dir):
    """Positions are exactly 1..n with no gaps or duplicates (md5 keys are
    collision-free on the fixture, so rank degenerates to row_number)."""
    out = QM.q_shuffle_training_order(spark, sf_dir).select("shuffle_pos")
    n = out.count()
    row = out.agg(
        F.countDistinct("shuffle_pos").alias("d"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
    ).collect()[0]
    assert (row["d"], row["lo"], row["hi"]) == (n, 1, n)


def test_shuffle_shards_are_contiguous_blocks(spark, sf_dir):
    """shard_id partitions the position space into SHUFFLE_SHARD_SIZE-row
    blocks: every shard except the last is exactly full."""
    out = QM.q_shuffle_training_order(spark, sf_dir)
    sizes = {
        r["shard_id"]: r["n"]
        for r in out.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    last = max(sizes)
    for sid, n in sizes.items():
        if sid == last:
            assert 1 <= n <= QM.SHUFFLE_SHARD_SIZE
        else:
            assert n == QM.SHUFFLE_SHARD_SIZE


def test_domain_mix_bounded_and_weighted_langs_only(spark, sf_dir):
    """Per-language kept counts never exceed the stratum, only weighted
    languages survive, and the kept total lands on the half-corpus budget
    within binomial wobble (hash membership has no hard cap — each
    domain's kept count is Binomial(c_d, k_d/65536) with mean ≈
    target_d, so the corpus total concentrates at the budget but can
    exceed it by O(sqrt)). Exact VALUES are pinned by the DuckDB
    differential; this is the semantic envelope."""
    kept = {
        r["lang"]: r["n"]
        for r in QM.q_sample_domain_mix(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    src = {
        r["lang"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(kept) <= set(QM.MIX_WEIGHTS_PCT)
    for lang, n in kept.items():
        assert n <= src[lang]
    budget = sum(src.values()) // 2
    assert sum(kept.values()) <= budget + 4 * int(budget**0.5)


def test_domain_mix_membership_is_per_doc_deterministic(spark, sf_dir):
    """Membership is a pure function of (doc_id, lang): two evaluations
    return the identical kept set."""
    a = {r[0] for r in QM.q_sample_domain_mix(spark, sf_dir).select("doc_id").collect()}
    b = {r[0] for r in QM.q_sample_domain_mix(spark, sf_dir).select("doc_id").collect()}
    assert a == b and a


def test_vocab_is_ranked_prefix_with_monotone_coverage(spark, sf_dir):
    """Ranks are 1..K, counts non-increasing, cumulative counts strictly
    increasing, and coverage ends ≤ 1."""
    rows = QM.q_vocab_top_tokens(spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")
    distinct = (
        d.select(F.explode(TX.bpe_ish_tokens(F.col("text"))).alias("t"))
        .select("t").distinct().count()
    )
    assert len(rows) == min(QM.VOCAB_K, distinct)
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    cnts = [r["cnt"] for r in rows]
    assert all(a >= b for a, b in zip(cnts, cnts[1:]))
    cums = [r["cum_cnt"] for r in rows]
    assert all(a < b for a, b in zip(cums, cums[1:]))
    assert cums[0] == cnts[0]
    assert 0 < rows[-1]["coverage"] <= 1.0
    if distinct > QM.VOCAB_K:
        assert rows[-1]["coverage"] < 1.0

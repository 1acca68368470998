"""End-to-end composition of the engine's two halves: CDC ingest (lake
MERGE) and incremental near-dup detection riding the same epochs.

Documents arrive as insert change-events in three epochs; each epoch (a)
MERGEs into a bucketed LakeTable exactly-once and (b) feeds the
incremental LSH index, whose candidate verification reads document text
FROM THE LAKE TABLE (the at-scale shape: the corpus lives in the lake,
candidate lookups are key-joins into it — lookup_join's file-skipping
applies). After the last epoch the accumulated pair emissions equal the
one-shot batch query over the source fixture, row-for-row.
"""

from pyspark.sql import functions as F

from fao_elt_pipelines_spark.lake.table import LakeTable
from fao_elt_pipelines_spark.operators.incremental_dedup import (
    LshIndex,
    shingles_from_corpus,
)
from fao_elt_pipelines_spark.plans.queries_ml import JACCARD_TAU, q_dedup_minhash_lsh
from scripts.replay_job import STATE_SCHEMA


def test_cdc_ingest_with_incremental_dedup(spark, sf_dir, tmp_path):
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = corpus.count()
    table = LakeTable.create(spark, str(tmp_path / "docs_state"), STATE_SCHEMA, n_buckets=8)
    idx = LshIndex(spark, str(tmp_path / "lsh"), tau=JACCARD_TAU)

    def as_events(batch):
        return batch.select(
            F.concat(F.lit("repo_"), (F.col("doc_id") % 16).cast("string")).alias("repo"),
            F.concat(F.lit("docs/"), F.col("doc_id").cast("string")).alias("path"),
            F.lit("c0").alias("commit"),
            F.coalesce("lang", F.lit("und")).alias("lang"),
            F.col("text").alias("content"),
            F.col("doc_id").alias("seq"),
            F.lit("upsert").alias("op"),
        )

    for e in range(3):
        batch = corpus.filter(F.col("doc_id") % 3 == e)
        table.merge_changes(as_events(batch), epoch_id=e)
        # candidate verification reads the LAKE, not the source fixture
        lake_docs = table.read().select(
            F.split("path", "/").getItem(1).cast("long").alias("doc_id"),
            F.col("content").alias("text"),
        )
        idx.ingest(batch.select("doc_id", "text"), shingles_from_corpus(lake_docs), e)

    assert table.read().count() == n_docs
    want = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 12))
        for r in q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    got_rows = idx.all_pairs().collect()
    got = {(r["doc_a"], r["doc_b"], round(r["jaccard"], 12)) for r in got_rows}
    assert got == want
    assert len(got_rows) == len(want)  # multiset-exact
    # exactly-once replay-skip still holds on the doc table: re-merging an
    # epoch is a no-op (same snapshot id back)
    before = table.snapshots()[-1]["snapshot_id"]
    table.merge_changes(as_events(corpus.filter(F.col("doc_id") % 3 == 1)), epoch_id=1)
    assert table.snapshots()[-1]["snapshot_id"] == before


def test_cdc_ingest_with_incremental_semantic_dedup(spark, sf_dir, tmp_path):
    """The semantic survivor index LIVES IN THE LAKE: embeddings arrive as
    ascending-id epochs (the binlog seq order), each epoch's batch is
    decided against the survivors read back from a LakeTable, and the
    kept vectors are MERGEd in exactly-once. After the last epoch the
    lake's live rows are exactly the one-shot batch sweep's survivors and
    the per-epoch decisions union to the batch decisions — so a crash
    between epochs resumes from the lake with no divergence (same
    replay-skip guarantee as the document table)."""
    from pyspark.sql import types as T

    from fao_elt_pipelines_spark.functions import similarity as SIM
    from fao_elt_pipelines_spark.plans.queries_ml import (
        COSINE_TAU,
        q_semantic_dedup,
        semantic_cells,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # same TRAINED quantizer as the batch entry (round 5: semantic cells
    # come from semantic_cells' kmeans codebook, not the sign-LSH grid)
    b = semantic_cells(e)
    n = e.count()
    # the lake's per-row invariant column is content_sha256 (the north
    # rule's contract), so the survivors table content-addresses each
    # vector by its serialized form
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("content", T.StringType()),
        ]
    )
    surv = LakeTable.create(spark, str(tmp_path / "survivors"), schema, n_buckets=8)
    got = {}
    cuts = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, None)]
    for epoch, (lo, hi) in enumerate(cuts):
        batch = b.filter(F.col("vec_id") >= lo)
        if hi is not None:
            batch = batch.filter(F.col("vec_id") < hi)
        index = surv.read().select("vec_id", "embedding", "bucket")
        decisions = SIM.greedy_cell_dedup_incremental(
            batch, index if epoch else None, tau=COSINE_TAU
        )
        rows = decisions.collect()
        got.update({r.vec_id: (r.bucket, r.kept, r.dup_of) for r in rows})
        kept_events = (
            batch.join(
                spark.createDataFrame(
                    [(r.vec_id,) for r in rows if r.kept], "vec_id long"
                ),
                "vec_id",
            )
            .withColumn("content", F.col("embedding").cast("string"))
            .withColumn("seq", F.col("vec_id"))
            .withColumn("op", F.lit("upsert"))
        )
        surv.merge_changes(kept_events, epoch_id=epoch, keys=("bucket", "vec_id"))
    want = {
        r.vec_id: (r.bucket, r.kept, r.dup_of)
        for r in q_semantic_dedup(spark, sf_dir).collect()
    }
    assert got == want
    lake_kept = {r.vec_id for r in surv.read().select("vec_id").collect()}
    assert lake_kept == {v for v, (_, k, _) in want.items() if k}
    # exactly-once: re-merging an epoch's kept rows is a no-op
    before = surv.snapshots()[-1]["snapshot_id"]
    surv.merge_changes(
        b.filter((F.col("vec_id") >= cuts[1][0]) & (F.col("vec_id") < cuts[1][1]))
        .withColumn("content", F.col("embedding").cast("string"))
        .withColumn("seq", F.col("vec_id"))
        .withColumn("op", F.lit("upsert")),
        epoch_id=1,
        keys=("bucket", "vec_id"),
    )
    assert surv.snapshots()[-1]["snapshot_id"] == before

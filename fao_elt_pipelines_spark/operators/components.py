"""Connected components over a pair list — near-dup canonicalization.

After any near-dup detector (MinHash/SimHash/embedding LSH) emits pairs,
training-data dedup needs the TRANSITIVE closure: if A~B and B~C, keep
one canonical doc of {A,B,C}. This operator labels every node with the
minimum doc id reachable from it (the cluster id), fully distributed:

- each iteration is ONE shuffle: edges ⋈ labels → per-node min neighbor
  label → least(own, neighbor-min); labels only ever decrease.
- convergence is detected with an exact decimal sum of labels (a scalar
  driver aggregate — monotone non-increasing, unchanged ⟺ fixpoint).
- iterations needed = graph diameter. Near-dup clusters are shallow
  (dozens of docs, diameter ≲ 5), so this converges in a handful of
  rounds at any corpus size; for adversarially long path graphs the
  known fix is star-contraction (large-star/small-star, O(log n)
  rounds) — out of scope here and noted so the trade-off is explicit.

No reference analogue (the reference has no dedup at all); this is part
of the training-data operator family layered on the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import release_local_checkpoint


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 50
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id is the
    min node id of the component (deterministic canonical choice).

    The returned frame is checkpoint-backed; a driver looping over many
    batches should pass a consumed result to
    ``caching.release_local_checkpoint`` to free its executor blocks
    eagerly instead of waiting on a JVM GC."""
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # persisted for the loop only and released in the finally below: the
    # returned labels frame is localCheckpointed, so it no longer depends
    # on the edge set — callers outside the registry harness (which owns
    # release_caches) must not accumulate a pinned edge set per call
    edges = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()
    # Iterative fixpoint MUST truncate lineage every round: each iteration
    # references `labels` twice (self + neighbor side), so without a cut
    # the logical plan doubles per round and Catalyst analysis goes
    # exponential long before data size matters. localCheckpoint
    # materializes to executor storage and severs the plan — on a real
    # cluster with lineage-loss concerns, swap for reliable checkpoint().
    try:
        labels = (
            edges.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint()
        )
        prev_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.select(F.col("node").alias("b"), F.col("label").alias("nb_label")),
                    "b",
                )
                .groupBy("a")
                .agg(F.min("nb_label").alias("nb_min"))
            )
            new_labels = (
                labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
                .select(
                    "node",
                    F.least(F.col("label"), F.coalesce(F.col("nb_min"), F.col("label"))).alias(
                        "label"
                    ),
                )
                .localCheckpoint()
            )
            cur_sum = new_labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
            ).first()["s"]
            # the superseded round's checkpoint blocks are dead the moment
            # new_labels is materialized (localCheckpoint is eager);
            # ContextCleaner would hold them until a JVM GC nobody schedules
            release_local_checkpoint(labels)
            labels = new_labels
            if cur_sum == prev_sum:  # labels are non-increasing: fixpoint
                break
            prev_sum = cur_sum
        else:
            # Never return silently-wrong clusters: a component whose diameter
            # exceeds max_iter would otherwise come back split into several
            # cluster ids (under-dedup) with no signal.
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} iterations; "
                "raise max_iter or use star-contraction for long-chain graphs"
            )
    finally:
        edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))

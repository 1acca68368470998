"""Measure the HOF-vs-chunked-matmul verify delta for the full-corpus
embedding near-dup LSH path (q_embedding_neardup_lsh vs
q_embedding_neardup_lsh_np) at a corpus size where per-pair scorer cost
dominates. Same deterministic synthetic corpus as bench/ann_delta.py
(hash-derived components, no RNG state); identical sign-LSH cells on both
sides, so the candidate pair set is the same and only the verify scorer
differs.

Usage: python bench/neardup_delta.py [--vectors 100000] [--dim 64]
Prints one JSON line: {"hof_sec": ..., "matmul_sec": ..., "speedup": ...,
"pairs": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fao_elt_pipelines_spark.functions import similarity as SIM  # noqa: E402
from fao_elt_pipelines_spark.session import get_spark  # noqa: E402

from bench._common import synth_embeddings  # noqa: E402

TAU = 0.999  # synthetic hash-vectors are near-orthogonal; keep output small




def run(spark, emb, scorer: str) -> tuple[float, int]:
    b = emb.select(
        "vec_id", "embedding", SIM.ivf_bucket(F.col("embedding")).alias("bucket")
    )
    if scorer == "matmul":
        scored = SIM.bucket_pair_scores(b, tau=TAU)
    else:
        bn = b.withColumn(
            "norm", F.sqrt(SIM.dot(F.col("embedding"), F.col("embedding")))
        )
        a = bn.select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
            "bucket", F.col("norm").alias("na"),
        )
        c = bn.select(
            F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
            "bucket", F.col("norm").alias("nb"),
        )
        pairs = a.join(c, "bucket").filter(F.col("id_a") < F.col("id_b"))
        scored = pairs.select(
            "id_a", "id_b",
            (SIM.dot(F.col("ea"), F.col("eb")) / F.col("na") / F.col("nb")).alias(
                "cosine_sim"
            ),
        ).filter(F.col("cosine_sim") >= TAU)
    t0 = time.time()
    n = scored.count()
    return round(time.time() - t0, 2), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()
    spark = get_spark("neardup_delta", cores=args.cores)
    emb = synth_embeddings(spark, args.vectors, args.dim).persist()
    emb.count()
    run(spark, emb.limit(1000), "hof")  # codegen/Arrow warmup
    run(spark, emb.limit(1000), "matmul")
    hof_sec, n1 = run(spark, emb, "hof")
    mm_sec, n2 = run(spark, emb, "matmul")
    assert n1 == n2, (n1, n2)
    print(
        json.dumps(
            {
                "vectors": args.vectors,
                "dim": args.dim,
                "pairs": n1,
                "hof_sec": hof_sec,
                "matmul_sec": mm_sec,
                "speedup": round(hof_sec / mm_sec, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

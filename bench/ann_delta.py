"""Measure the HOF-vs-numpy cosine scorer delta at a corpus size where the
interpreted higher-order-function lambda is the dominant cost (the regime
ANN_NUMPY_THRESHOLD gates on). Generates a deterministic synthetic corpus
(hash-derived components — no RNG state), scores every (query, candidate)
pair through the same IVF plan shape as q_ann_ivf_topk, and times both
scorers end-to-end with the noop sink.

Usage: python bench/ann_delta.py [--vectors 200000] [--dim 64] [--queries 16]
Prints one JSON line: {"hof_sec": ..., "numpy_sec": ..., "speedup": ...}
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




def run(spark, emb, n_queries: int, scorer: str) -> float:
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    if scorer == "matmul":
        import numpy as np

        q_rows = emb.filter(F.col("vec_id") < n_queries).collect()
        Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q_rows])
        packed = {
            0: (
                np.array([r["vec_id"] for r in q_rows], dtype=np.int64),
                Q,
                np.sqrt(np.einsum("ij,ij->i", Q, Q)),
            )
        }
        scored = SIM.matmul_bucket_scores(
            c.withColumn("bucket", F.lit(0)), packed
        ).filter(F.col("query_id") != F.col("neighbor_id"))
    else:
        score = SIM.cosine_np if scorer == "numpy" else SIM.cosine
        q = emb.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
        pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
        scored = pairs.select(
            "query_id", "neighbor_id", score(F.col("qe"), F.col("ce")).alias("cosine_sim")
        )
    t0 = time.time()
    scored.write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark("ann_delta", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    emb = synth_embeddings(spark, args.vectors, args.dim).persist()
    emb.count()  # materialize outside the timed region
    # warm all paths (JIT / Arrow init)
    for s in ("hof", "numpy", "matmul"):
        run(spark, emb.limit(2000), 4, s)
    hof = run(spark, emb, args.queries, "hof")
    np_ = run(spark, emb, args.queries, "numpy")
    mm = run(spark, emb, args.queries, "matmul")
    print(
        json.dumps(
            {
                "metric": "ann_scorer_delta",
                "vectors": args.vectors,
                "dim": args.dim,
                "queries": args.queries,
                "pairs_scored": args.vectors * args.queries,
                "hof_sec": hof,
                "numpy_pairwise_sec": np_,
                "matmul_sec": mm,
                "matmul_speedup_vs_hof": round(hof / mm, 2) if mm > 0 else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Shared helpers for the bench harnesses — single definitions so sibling
benchmarks can't silently drift apart while claiming to measure the same
corpus / JVM configuration."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def synth_embeddings(spark, n: int, dim: int):
    """Deterministic pseudo-random unit-ish vectors: component i of vector v
    derives from xxhash64(v, i) — pure codegen, reproducible anywhere."""
    v = spark.range(0, n, 1, 64).withColumnRenamed("id", "vec_id")
    comps = F.array(
        *[
            ((F.xxhash64(F.col("vec_id"), F.lit(i)) % 2001) / 1000.0).cast("float")
            for i in range(dim)
        ]
    )
    return v.select("vec_id", comps.alias("embedding"))


def n_core_jvm_env(cores: int) -> dict[str, str]:
    """Subprocess env emulating an N-core executor host: without
    ActiveProcessorCount a local[N] JVM on a 32-vCPU box sizes GC/JIT/IO
    pools for the whole machine and silently borrows those cores."""
    env = dict(os.environ)
    env["SPARK_DRIVER_JAVA_OPTS"] = (
        "-XX:+UseParallelGC -XX:+UnlockDiagnosticVMOptions "
        "-XX:GCLockerRetryAllocationCount=100 "
        f"-XX:ActiveProcessorCount={cores}"
    )
    return env

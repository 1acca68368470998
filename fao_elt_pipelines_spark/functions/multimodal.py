"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a ``kind`` tag and a
``map<string,string>`` metadata column. The Spark-side machinery — schema,
partition-preserving mapInPandas, Arrow batch shapes, deterministic
batching — is real and tested; the actual media decode is STUBBED (the
sandbox has no image/audio libs): ``decode_features(real_decode=True)``
raises NotImplementedError at the exact seam where PIL/librosa/pyav would
be called, and the default path produces a deterministic fake feature row
per asset (byte statistics + hash-derived dims) so the pipeline shape is
end-to-end executable.

At scale: mapInPandas streams Arrow batches (bounded memory per task
regardless of payload size); binary payloads never pass through the driver;
partitioning by asset hash keeps decode fanout even.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames_sampled", T.IntegerType()),
    ]
)

KINDS = ["image", "audio", "video"]


def synthesize_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic multimodal asset table from ``documents``:
    the utf-8 text bytes stand in for the media payload."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(
            F.lit("declared_w"), ((F.col("doc_id") % 8 + 1) * 64).cast("string"),
            F.lit("declared_h"), ((F.col("doc_id") % 4 + 1) * 64).cast("string"),
        ).alias("meta"),
    )


def decode_features(assets: DataFrame, real_decode: bool = False, frame_stride: int = 16) -> DataFrame:
    """Per-asset feature extraction over mapInPandas (Arrow-batched).

    ``real_decode=True`` marks the seam where a real media decoder would
    run — unavailable in this environment by design.
    """
    if real_decode:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/pyav — not present in this "
            "environment; the deterministic fake path exercises identical "
            "Spark plumbing (schema, batching, partitioning)"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.map(len)
            byte_sum = payload.map(lambda b: sum(b))  # deterministic fake "decode"
            meta = pdf["meta"]
            width = meta.map(lambda m: int(dict(m).get("declared_w", "0")))
            height = meta.map(lambda m: int(dict(m).get("declared_h", "0")))
            frames = (n_bytes // frame_stride).clip(lower=1).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "n_frames_sampled": frames,
                }
            )

    return assets.mapInPandas(extract, FEATURE_SCHEMA)

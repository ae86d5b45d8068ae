"""Quantized-corpus build (SURVEY.md §2 I4 — index_data.ipynb cell 0).

The reference materializes full_precision/ half_precision/ scalar/ binary/
folders from the same raw embeddings. Here: one job per tier writing a Parquet
table; the scalar tier first runs the quantizer-training aggregation (exact
percentile bounds at quantile=0.99, reference scalar.QuantizerParams) and feeds
the fitted (lo, hi) into the transform expression as literals — train is a
Spark job, apply is pure JVM-side arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quantize import float16_roundtrip_udf, sq8_train
from ..functions.vector import binary_sign, sq8_quantize
from ..sources.sinks import write_chunked_parquet

TIERS = ("full_precision", "half_precision", "scalar", "binary")


def build_quantized_tiers(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantile: float = 0.99,
    records_per_file: int = 100_000,
) -> dict[str, str]:
    """Write all four tiers under ``out_dir/<tier>/``; returns tier->path.

    The sq8 bounds come from one training aggregation over the corpus (a
    single exact-percentile job on the exploded column); everything else is a
    narrow per-row map — at 100 TB each tier build is a single scan+write.
    """
    paths: dict[str, str] = {}
    base = embeddings.select(F.col(id_col), F.col(vec_col))

    def sink(df: DataFrame, tier: str) -> None:
        path = f"{out_dir}/{tier}"
        write_chunked_parquet(df, path, records_per_file=records_per_file)
        paths[tier] = path

    sink(base, "full_precision")
    sink(
        base.withColumn(vec_col, float16_roundtrip_udf(F.col(vec_col))),
        "half_precision",
    )
    lo, hi = sq8_train(embeddings, vec_col=vec_col, quantile=quantile).first()
    sink(
        base.select(
            F.col(id_col),
            sq8_quantize(F.col(vec_col), float(lo), float(hi)).alias(vec_col),
        ),
        "scalar",
    )
    sink(
        base.select(F.col(id_col), binary_sign(F.col(vec_col)).alias(vec_col)),
        "binary",
    )
    return paths

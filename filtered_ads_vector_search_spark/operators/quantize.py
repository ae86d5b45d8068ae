"""Quantization tiers (SURVEY.md §2 C6-C9, I4).

The reference materializes four corpora — full_precision / half_precision /
scalar(int8) / binary — from the same embeddings (reference: index_data.ipynb
cell 0; fp16 cast download_dataset/utils.py:137-139; binary packbits
utils_grid_search.py:650-654). Here each tier is a column derivation:

* fp16 round-trip — Arrow-batched pandas UDF (no fp16 type in Spark; the cast
  through np.float16 models the storage precision loss exactly).
* scalar int8   — train (exact percentile bounds at quantile q, mirroring
  cuVS scalar.QuantizerParams(quantile=0.99)) + pure-arithmetic affine apply.
* binary        — sign bits, kept unpacked as ARRAY<INT> 0/1 (Parquet RLE
  encodes them compactly; `vec_sign_hamming` consumes them directly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from ..functions import vector as V

__all__ = [
    "float16_roundtrip_udf",
    "sq8_train",
    "sq8_apply",
    "binary_apply",
]


@F.pandas_udf(ArrayType(FloatType()))
def float16_roundtrip_udf(vecs: pd.Series) -> pd.Series:
    """float32 -> float16 -> float32 per element (reference:
    download_dataset/utils.py:137-139). Arrow-batched; NumPy does the cast."""
    return vecs.map(
        lambda v: np.asarray(v, dtype=np.float32).astype(np.float16).astype(np.float32)
    )


def sq8_train(
    embeddings: DataFrame, vec_col: str = "embedding", quantile: float = 0.99
) -> DataFrame:
    """Fit (lo, hi) bounds at the given central quantile over ALL vector
    elements — a single exact-percentile aggregation over the exploded column
    (reference: train_scalar_quantizer, index_data.ipynb cell 0,
    scalar.QuantizerParams(quantile=0.99)).

    Exact `percentile` (not approx) so the DuckDB oracle (quantile_cont)
    reproduces it bit-for-bit.
    """
    p_lo = (1.0 - quantile) / 2.0
    p_hi = 1.0 - p_lo
    el = embeddings.select(F.explode(F.col(vec_col)).alias("x")).select(
        F.col("x").cast("double").alias("x")
    )
    return el.agg(
        F.round(F.percentile(F.col("x"), F.lit(p_lo)), 6).alias("lo"),
        F.round(F.percentile(F.col("x"), F.lit(p_hi)), 6).alias("hi"),
    )


def sq8_apply(vec: Column, lo: float, hi: float) -> Column:
    return V.sq8_quantize(vec, lo, hi)


def binary_apply(vec: Column) -> Column:
    return V.binary_sign(vec)

"""The ingest/embed pipeline (SURVEY.md §3.2 — exec_embed.py end-to-end).

Reference lifecycle: JSONL scan -> category filter (exec_embed.py:26-34) ->
min-token filter (66-68) -> global limit (44-59,76-81) -> batched embed
(utils.py:17-82) -> optional dim-truncate + fp16 cast (134-139) -> chunked
sink + aligned texts (158-200) -> category map (98-102).

Spark form: one narrow pipeline — read.json -> filter -> filter -> limit ->
mapInPandas(embed) -> select(slice, fp16) -> write.parquet. No shuffle
anywhere; every stage is embarrassingly parallel, and at 100 TB the limit is
the only global coordination (Spark pushes it into the scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..functions.vector import vec_truncate
from ..sources.jsonl import read_reviews_jsonl
from ..sources.sinks import write_chunked_parquet
from .embed import EMBED_DIM, mock_embed


@dataclass
class IngestConfig:
    """Mirrors exec_embed.py's CLI surface (argparse at exec_embed.py:8-24)."""

    categories: list[str] | None = None   # None = all (exec_embed.py:28-34)
    min_tokens: int = 10                  # exec_embed.py:66-68
    max_embeddings: int | None = None     # exec_embed.py:44-59
    n_dimensions: int = EMBED_DIM         # download_dataset/utils.py:134-135
    fp16: bool = False                    # download_dataset/utils.py:137-139
    records_per_file: int = 10_000        # download_dataset/utils.py:158-200


def ingest_reviews(
    spark: SparkSession,
    input_path: str,
    cfg: IngestConfig | None = None,
    output_path: str | None = None,
) -> DataFrame:
    """JSONL reviews -> filtered, embedded, (optionally) truncated/fp16-cast
    DataFrame (row_id, category, text, embedding); written chunked if
    ``output_path`` given. Returns the result DataFrame either way."""
    cfg = cfg if cfg is not None else IngestConfig()  # no shared mutable default
    df = read_reviews_jsonl(spark, input_path)
    if cfg.categories:
        df = df.filter(F.col("category").isin(cfg.categories))
    df = df.filter(token_count(F.col("text")) >= F.lit(cfg.min_tokens))
    if cfg.max_embeddings is not None:
        df = df.limit(cfg.max_embeddings)
    df = df.select(F.monotonically_increasing_id().alias("row_id"), "category", "text")
    df = mock_embed(df, text_col="text", out_col="embedding")
    if cfg.n_dimensions < EMBED_DIM:
        df = df.withColumn("embedding", vec_truncate(F.col("embedding"), cfg.n_dimensions))
    if cfg.fp16:
        from ..operators.quantize import float16_roundtrip_udf

        df = df.withColumn("embedding", float16_roundtrip_udf(F.col("embedding")))
    if output_path is not None:
        write_chunked_parquet(df, output_path, records_per_file=cfg.records_per_file)
        return spark.read.parquet(output_path)
    return df

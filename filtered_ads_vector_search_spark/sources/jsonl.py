"""JSONL sources (SURVEY.md §2 A2/A3).

The reference parses reviews line-by-line projecting ``review['text']``
(reference: download_dataset/exec_embed.py:54-70) and embedding JSONL reading
``obj['output_embeddings'][0]`` per line (reference: index_data.ipynb cell 0,
``load_embeddings_from_jsonl``). Spark-first: ``spark.read.json`` with an
explicit schema — the scan is distributed, schema inference is skipped, and
column pruning reaches the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("rating", T.DoubleType()),
        T.StructField("title", T.StringType()),
        T.StructField("asin", T.StringType()),
        T.StructField("parent_asin", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("helpful_vote", T.LongType()),
        T.StructField("verified_purchase", T.BooleanType()),
    ]
)

EMBEDDING_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("output_embeddings", T.ArrayType(T.ArrayType(T.FloatType()))),
        T.StructField("text", T.StringType()),
    ]
)


def read_reviews_jsonl(
    spark: SparkSession, path: str, category_from_filename: bool = True
) -> DataFrame:
    """Amazon-review JSONL scan. Projects the reference's fields with explicit
    schema; `category` is derived from the source filename stem (the reference
    keys category by file, exec_embed.py:28-34)."""
    df = spark.read.schema(REVIEW_SCHEMA).json(path)
    if category_from_filename:
        df = df.withColumn(
            "category",
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.jsonl", 1),
        )
    return df


def read_embeddings_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Embedding JSONL scan: one row per line, vector = output_embeddings[0]
    (reference: load_embeddings_from_jsonl, index_data.ipynb cell 0).
    Returns (row_id, embedding, text) with a stable per-file row id."""
    df = spark.read.schema(EMBEDDING_JSONL_SCHEMA).json(path)
    return df.select(
        F.monotonically_increasing_id().alias("row_id"),
        F.element_at(F.col("output_embeddings"), 1).alias("embedding"),
        F.col("text"),
    )

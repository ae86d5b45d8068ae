"""JSONL sources (SURVEY.md §2 A2/A3).

The reference parses reviews line-by-line projecting ``review['text']``
(reference: download_dataset/exec_embed.py:54-70) and embedding JSONL reading
``obj['output_embeddings'][0]`` per line (reference: index_data.ipynb cell 0,
``load_embeddings_from_jsonl``). Spark-first: ``spark.read.json`` with an
explicit schema — the scan is distributed, schema inference is skipped, and
column pruning reaches the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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

    Returns (row_id, embedding, text) where row_id is the 0-based line number
    within its file — STABLE across re-reads and split layouts, matching the
    reference's per-file line numbering. Line order is recovered from
    (input_file_block_start, intra-split read order): a split's byte offset
    is a property of the file content, and rows within a split arrive in file
    order, so sorting on the pair reconstructs file order no matter how the
    file was split. JSON parsing stays JVM-side via from_json. The window is
    partitioned per file, so parallelism of the id assignment is #files —
    inherent to exact line numbering (a global prefix count per file).
    """
    lines = spark.read.text(path).select(
        F.input_file_name().alias("_file"),
        F.input_file_block_start().alias("_blk"),
        F.monotonically_increasing_id().alias("_seq"),
        "value",
    )
    w = Window.partitionBy("_file").orderBy("_blk", "_seq")
    return (
        lines.withColumn("row_id", (F.row_number().over(w) - 1).cast("bigint"))
        .withColumn("j", F.from_json("value", EMBEDDING_JSONL_SCHEMA))
        .select(
            "row_id",
            F.element_at(F.col("j.output_embeddings"), 1).alias("embedding"),
            F.col("j.text").alias("text"),
        )
    )

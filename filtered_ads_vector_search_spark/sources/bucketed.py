"""Bucketed co-located joins (task brief: "co-locate joins via bucketing").

Writing both sides of a recurring equi-join bucketed (and sorted) by the join
key lets Spark sort-merge-join them with NO exchange on either side — at
100 TB the difference between a fact-fact join that reshuffles petabytes per
query and one that streams co-located buckets. The test asserts the physical
plan for a bucketed lineitem ⋈ orders join contains zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame, name: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Persist as a bucketed (+sorted) managed parquet table."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two bucketed tables on their bucket keys; with equal bucket counts
    the planner elides both shuffles (and both sorts if sortBy matched)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_l] == rt[key_r])

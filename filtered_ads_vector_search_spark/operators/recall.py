"""Recall evaluation (SURVEY.md §2 E1/D5/G1).

recall@k = Σᵢ |foundᵢ ∩ truthᵢ| / (n_queries × k) — ORDER-INSENSITIVE set
intersection, per the reference (calc_recall utils_grid_search.py:64-88,
intersect1d at :83 with the equidistant-ties caveat at :82-84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["recall_per_query", "recall_at_k"]


def recall_per_query(found: DataFrame, truth: DataFrame, k: int = 10) -> DataFrame:
    """Per-query recall: |found ∩ truth| / k.

    Inputs are (query_id, neighbor_id, ...) row sets. Computed as an inner
    equi-join on (query_id, neighbor_id) — the declarative form of per-row
    array_intersect — then a left join back onto the distinct truth queries so
    zero-overlap queries surface as 0.0 rather than vanishing.
    """
    matches = (
        found.select("query_id", "neighbor_id")
        .join(truth.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_matched"))
    )
    all_queries = truth.select("query_id").distinct()
    return (
        all_queries.join(matches, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_matched"), F.lit(0)) / F.lit(float(k))).alias("recall"),
        )
    )


def recall_at_k(found: DataFrame, truth: DataFrame, k: int = 10) -> DataFrame:
    """Scalar mean recall@k over all queries, rounded to 4 decimals."""
    return recall_per_query(found, truth, k).agg(
        F.round(F.avg("recall"), 4).alias("recall_at_k"),
        F.count("*").alias("n_queries"),
    )

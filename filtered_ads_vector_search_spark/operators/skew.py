"""Skew mitigation: salted two-stage per-group top-k.

A hot group (one query matching a huge filtered corpus slice, one band key
with millions of collisions) turns a per-group window into a single-task
straggler. Salting splits each group into `n_salts` subgroups keyed by a
deterministic row hash, takes a local top-k per (group, salt) — so the hot
group's work spreads across `n_salts` tasks — then merges the k-sized
partials with the normal per-group window. Results are identical to the
unsalted window (both stages keep >= k rows per group; proven in tests).

AQE's skew handling covers joins; this covers window/top-k skew, which AQE
does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["salted_topk"]


def salted_topk(
    df: DataFrame,
    group_col: str,
    order: list[Column],
    k: int,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Rows of `df` -> top-k per `group_col` under `order`, two-stage.

    `salt_on`: column whose hash spreads the group — pass a high-cardinality
    column (the neighbor/id column). Defaults to a hash of ALL columns, which
    is row-varying; hashing the group column itself would put every row of
    the hot group in one salt bucket and silently defeat the salting.
    """
    if salt_on is not None:
        salt_src = [F.col(salt_on)]
    else:
        salt_src = [F.col(c) for c in df.columns]
    salt = (F.abs(F.hash(*salt_src)) % n_salts).alias("_salt")
    w_local = Window.partitionBy(group_col, "_salt").orderBy(*order)
    w_final = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .drop("_salt", "_lr")
    )

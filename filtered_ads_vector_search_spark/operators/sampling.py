"""Deterministic sampling operators for training-data pipelines.

Not present in the reference (its only sampling is the seeded train/val split,
cuvs_bench_grid_search_v3.py:773-779 — covered by topk.split_queries); these
are the corpus-curation forms a 100 TB pipeline runs constantly: language /
source rebalancing (stratified rates), fixed-budget per-stratum draws, and
global seeded subsampling.

Every decision is a pure arithmetic function of the row id through
functions.hashing.portable_hash — NOT Spark's ``rand()``/``sample()``, whose
output depends on partitioning and task scheduling. Hash-gating makes every
sample (a) reproducible across runs, (b) partition-count invariant (the
engine's batch-size-invariance property), (c) cheap — a scan-level filter
with no shuffle, pushed to the scan when the id is a stored column — and
(d) bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import P, portable_hash_col, portable_hash_sql

__all__ = [
    "seeded_sample",
    "seeded_sample_sql",
    "stratified_sample",
    "stratified_sample_sql",
    "stratified_topn",
    "stratified_topn_sql",
]

SAMPLE_SEED = 271828


def _gate(id_col: str, fraction: float, seed: int) -> Column:
    # hash is uniform on [0, P); keep iff hash < fraction * P
    return portable_hash_col(F.col(id_col), seed) < F.lit(int(round(fraction * P)))


def seeded_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = SAMPLE_SEED
) -> DataFrame:
    """Global deterministic sample: keep ~fraction of rows, chosen by a pure
    hash of the id (stable under reruns and repartitioning)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_gate(id_col, fraction, seed))


def seeded_sample_sql(id_expr: str, fraction: float, seed: int = SAMPLE_SEED) -> str:
    return f"({portable_hash_sql(id_expr, seed)} < {int(round(fraction * P))})"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fractions: Mapping[str, float],
    seed: int = SAMPLE_SEED,
) -> DataFrame:
    """Per-stratum rate sampling (language/source rebalancing): each group
    keeps its own fraction; groups absent from ``fractions`` are dropped.
    One scan-level filter — the hash gate threshold is a CASE on the group
    column; no shuffle, no per-group pass."""
    if not fractions:
        raise ValueError("fractions must name at least one group")
    for g, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f_}")
    expr = None
    for g, f_ in sorted(fractions.items()):
        cond = F.col(group_col) == F.lit(g)
        lim = F.lit(int(round(f_ * P)))
        expr = F.when(cond, lim) if expr is None else expr.when(cond, lim)
    thresh = expr.otherwise(F.lit(-1))  # unknown group: keep nothing
    return df.filter(portable_hash_col(F.col(id_col), seed) < thresh)


def stratified_sample_sql(
    id_expr: str,
    group_expr: str,
    fractions: Mapping[str, float],
    seed: int = SAMPLE_SEED,
) -> str:
    cases = " ".join(
        f"WHEN {group_expr} = '{g}' THEN {int(round(f_ * P))}"
        for g, f_ in sorted(fractions.items())
    )
    return f"({portable_hash_sql(id_expr, seed)} < (CASE {cases} ELSE -1 END))"


def stratified_topn(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n: int,
    seed: int = SAMPLE_SEED,
) -> DataFrame:
    """Fixed-budget per-stratum draw: exactly min(n, |group|) rows per group,
    picked in hash order (a deterministic shuffle). The window compiles to
    WindowGroupLimit partial+final — each task keeps n rows per group before
    the exchange, so the shuffle carries tasks x groups x n rows.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = portable_hash_col(F.col(id_col), seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= n)
        .drop("_srn")
    )


def stratified_topn_sql(
    table_sql: str,
    id_expr: str,
    group_expr: str,
    n: int,
    select_cols: str,
    seed: int = SAMPLE_SEED,
) -> str:
    h = portable_hash_sql(id_expr, seed)
    return f"""
SELECT {select_cols} FROM (
  SELECT *, row_number() OVER (PARTITION BY {group_expr}
                               ORDER BY {h} ASC, {id_expr} ASC) AS _srn
  FROM {table_sql}
) WHERE _srn <= {n}
"""

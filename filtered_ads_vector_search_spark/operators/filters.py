"""Rating-bucket predicate layer — the engine's version of THE filter
(SURVEY.md §2 B5).

The reference builds a random uint32 bitset at a configured selectivity
(reference: utils_grid_search.py:187-284 — probabilities at 216-231, CUDA
set-bit kernel at 250-261) and pushes it inside the ANN search as a prefilter.
In a declarative engine the bitset is just a compiled predicate: every row gets
a deterministic `rating_bucket`, and a named filter is a `WHERE rating_bucket
IN (...)` clause that Catalyst pushes below the top-k window — the
filter-BEFORE-top-k semantics the reference enforces at
utils_grid_search.py:999-1002.

Bucket assignment is a pure hash of vec_id (partition-count invariant, DuckDB-
portable) sampled from the reference's rating distribution
(reference: filter_config.yaml:41-47):
  <1.0: 83.63%  1.0-2.0: 0.35%  2.0-3.0: 0.42%  3.0-4.0: 2.42%
  4.0-5.0: 9.71%  =5.0: 3.47%
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import BUCKET_SEED, SPLIT_SEED, portable_hash_col, portable_hash_sql

__all__ = [
    "BUCKETS",
    "NAMED_FILTERS",
    "rating_bucket_col",
    "rating_bucket_sql",
    "is_query_col",
    "is_query_sql",
    "with_rating_bucket",
    "named_filter_predicate",
    "selectivity",
]

# (bucket label, cumulative threshold out of 10000) — reference distribution.
BUCKETS: list[tuple[str, int]] = [
    ("<1.0", 8363),
    ("1.0-2.0", 8398),
    ("2.0-3.0", 8440),
    ("3.0-4.0", 8682),
    ("4.0-5.0", 9653),
    ("=5.0", 10000),
]

# Named filters from the reference's filter_config.yaml:1-47 / BASELINE.md.
NAMED_FILTERS: dict[str, list[str]] = {
    "low_rated": ["<1.0"],                                # ~83.6% kept
    "high_rated": ["3.0-4.0", "4.0-5.0", "=5.0"],         # ~15.6% kept
    "mid_rated": ["1.0-2.0", "2.0-3.0"],                  # ~0.77% kept
    "premium_only": ["=5.0"],                             # ~3.5% kept
    "all_data": [b for b, _ in BUCKETS],                  # 100%
}

# Fraction of rows held out as queries: 2% (reference holds out 10k of 5.01M,
# ~0.2%; at our test scales 2% keeps >=10 queries at sf0.001).
QUERY_PERMILLE = 20


def _bucket_hash(vec_id: Column) -> Column:
    return portable_hash_col(vec_id, BUCKET_SEED) % F.lit(10000)


def rating_bucket_col(vec_id: Column) -> Column:
    h = _bucket_hash(vec_id)
    out = F.when(h < F.lit(BUCKETS[0][1]), F.lit(BUCKETS[0][0]))
    for label, cum in BUCKETS[1:-1]:
        out = out.when(h < F.lit(cum), F.lit(label))
    return out.otherwise(F.lit(BUCKETS[-1][0]))


def rating_bucket_sql(vec_id_expr: str) -> str:
    h = f"({portable_hash_sql(vec_id_expr, BUCKET_SEED)} % 10000)"
    parts = [f"CASE WHEN {h} < {BUCKETS[0][1]} THEN '{BUCKETS[0][0]}'"]
    for label, cum in BUCKETS[1:-1]:
        parts.append(f"WHEN {h} < {cum} THEN '{label}'")
    parts.append(f"ELSE '{BUCKETS[-1][0]}' END")
    return "(" + " ".join(parts) + ")"


def is_query_col(vec_id: Column) -> Column:
    """Deterministic train/val split (reference: train_test_split random_state=42,
    cuvs_bench_grid_search_v3.py:771-779) — hash-based so it is partition-count
    invariant and DuckDB-portable."""
    return (portable_hash_col(vec_id, SPLIT_SEED) % F.lit(1000)) < F.lit(QUERY_PERMILLE)


def is_query_sql(vec_id_expr: str) -> str:
    return f"(({portable_hash_sql(vec_id_expr, SPLIT_SEED)} % 1000) < {QUERY_PERMILLE})"


def with_rating_bucket(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    return df.withColumn("rating_bucket", rating_bucket_col(F.col(id_col)))


def named_filter_predicate(filter_name: str) -> Column:
    if filter_name not in NAMED_FILTERS:
        raise ValueError(f"unknown filter {filter_name!r}; one of {sorted(NAMED_FILTERS)}")
    return F.col("rating_bucket").isin(NAMED_FILTERS[filter_name])


def selectivity(df: DataFrame, filter_name: str, id_col: str = "vec_id") -> DataFrame:
    """B6 popcount analog: rows kept + % kept for a named filter
    (reference: count_selected_samples utils_grid_search.py:171-185)."""
    tagged = with_rating_bucket(df, id_col)
    total = tagged.count()
    return (
        tagged.filter(named_filter_predicate(filter_name))
        .agg(
            F.count("*").alias("kept_rows"),
            F.round(F.count("*") / F.lit(float(total)) * 100.0, 2).alias("selectivity_pct"),
        )
    )

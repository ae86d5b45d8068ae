"""Relational operators (SURVEY.md §2 B, D, E, F, G, H, I)."""

from .topk import split_queries, knn_window, knn_scalable
from .ann import IVFIndex
from .lsh import LSHIndex
from .recall import recall_per_query, recall_at_k
from .filters import (
    with_rating_bucket,
    named_filter_predicate,
    selectivity,
    NAMED_FILTERS,
)
from .skew import salted_topk
from .gridsearch import GridConfig, grid_search, param_grid, summarize

__all__ = [
    "split_queries",
    "knn_window",
    "knn_scalable",
    "IVFIndex",
    "LSHIndex",
    "recall_per_query",
    "recall_at_k",
    "with_rating_bucket",
    "named_filter_predicate",
    "selectivity",
    "NAMED_FILTERS",
    "salted_topk",
    "GridConfig",
    "grid_search",
    "param_grid",
    "summarize",
]

"""Sources & sinks (SURVEY.md §2 A).

The reference reads line-JSONL reviews/embeddings, chunked ``.npy`` matrices,
and bigann-style ``.fbin/.hbin/.ibin/.u8bin/.i8bin`` memmapped files, and sinks
npy chunks + incremental metric CSVs. This package re-expresses each as a
Spark source/sink; the engine's canonical storage is Parquet.
"""

from .config import (
    load_config,
    load_all_input_configs,
    filter_predicates,
    ivf_grid_from_config,
    ivfpq_grid_from_config,
    lsh_grid_from_config,
)
from .jsonl import read_reviews_jsonl, read_embeddings_jsonl
from .bigann import read_bigann, write_bigann, dtype_from_filename, suffix_from_dtype
from .npy_chunks import read_npy_chunks
from .sinks import write_chunked_parquet, append_metrics_csv, write_metrics_csv

__all__ = [
    "load_config",
    "load_all_input_configs",
    "filter_predicates",
    "ivf_grid_from_config",
    "ivfpq_grid_from_config",
    "lsh_grid_from_config",
    "read_reviews_jsonl",
    "read_embeddings_jsonl",
    "read_bigann",
    "write_bigann",
    "dtype_from_filename",
    "suffix_from_dtype",
    "read_npy_chunks",
    "write_chunked_parquet",
    "append_metrics_csv",
    "write_metrics_csv",
]

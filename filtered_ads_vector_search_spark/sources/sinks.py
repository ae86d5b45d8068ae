"""Sinks (SURVEY.md §2 A6-A9).

* chunked Parquet sink — the analog of the reference's 10k-row npy chunk
  flush (download_dataset/utils.py:158-200): file-size control is declarative
  via ``maxRecordsPerFile`` instead of manual accumulate-and-flush.
* metrics CSV sinks — the reference rewrites an intermediate CSV after every
  grid combo and a final CSV at the end (cuvs_bench_grid_search_v3.py:
  690-693,724-730) plus a best-of summary (all_runs_summary-2.csv). Incremental
  append here is a tiny driver-side pandas write (metrics are one row per
  combo — never big data); the final table write is a Spark CSV sink.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame


def write_chunked_parquet(
    df: DataFrame,
    path: str,
    records_per_file: int = 10_000,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink with bounded file sizes (reference chunk size 10k rows)."""
    w = df.write.mode(mode).option("maxRecordsPerFile", records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def append_metrics_csv(row: dict, csv_path: str) -> None:
    """Incremental one-row-per-combo append (reference: incremental CSV rewrite
    after every combo). Creates the file with a header on first write."""
    pdf = pd.DataFrame([row])
    header = not os.path.exists(csv_path)
    pdf.to_csv(csv_path, mode="a", header=header, index=False)


def write_metrics_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Final metrics table as a Spark CSV sink (header on, single file is the
    caller's coalesce(1) choice for tiny metric tables)."""
    df.write.mode(mode).option("header", "true").csv(path)

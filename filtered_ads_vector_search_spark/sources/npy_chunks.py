"""Chunked .npy matrix scan (SURVEY.md §2 A4).

The reference stores embeddings as sorted chunk files ``embeddings_i.npy``
(10k rows each) with row-position-aligned ``texts_i.npy`` and loads them in
filename order until ``max_index`` rows (reference: load_quantized_vectors
utils_grid_search.py:342-420; chunk sink download_dataset/utils.py:158-200).

Spark-first: files parallelize over executors via ``binaryFile``; positional
alignment becomes an explicit (file, row_id) key so downstream joins are
declarative equi-joins (SURVEY.md §2 D4) instead of implicit array-index
alignment.
"""

from __future__ import annotations

import io
import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _chunk_index(path: str) -> int:
    m = re.search(r"_(\d+)\.npy$", path)
    return int(m.group(1)) if m else -1


def read_npy_chunks(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan ``*_i.npy`` chunk files into (file, chunk_id, row_id, vec).

    ``row_id`` is the row's position within its chunk — join key for the
    reference's positionally-aligned texts/categories. dtypes are upcast to
    float32 (fp16 parity is modeled by functions.vector.float16_roundtrip).
    """

    def decode(batches):
        for pdf in batches:
            # one iteration per FILE (binaryFile source), not per data row
            for path, content in zip(pdf["path"], pdf["content"]):
                arr = np.load(io.BytesIO(content), allow_pickle=False)
                if arr.ndim == 1:
                    arr = arr.reshape(-1, 1)
                fname = os.path.basename(path)
                if np.issubdtype(arr.dtype, np.number):
                    mat = arr.astype(np.float32)
                    vecs = list(mat)
                else:  # texts_i.npy — string chunks ride the same source
                    vecs = [None] * arr.shape[0]
                yield pd.DataFrame(
                    {
                        "file": fname,
                        "chunk_id": _chunk_index(fname),
                        "row_id": np.arange(arr.shape[0], dtype=np.int64),
                        "vec": vecs,
                        "text": [
                            str(x[0]) if not np.issubdtype(arr.dtype, np.number) else None
                            for x in arr
                        ],
                    }
                )

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(
            decode,
            schema="file string, chunk_id int, row_id bigint, vec array<float>, text string",
        )
    )

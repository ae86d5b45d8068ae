"""bigann-style binary matrix format (SURVEY.md §2 A5).

The reference memmaps files with a 2x uint32 (rows, cols) header followed by a
row-major matrix, dtype keyed by extension (reference: utils_grid_search.py:
716-795 — memmap_bin_file, write_bin, dtype_from_filename, suffix_from_dtype).

Spark-first: reading goes through the ``binaryFile`` source so files land on
executors, then an Arrow-batched ``mapInPandas`` unpacks rows — the scan is
distributed per *file*; one huge file should be converted to Parquet once and
never re-read (the engine's canonical storage is Parquet). Writing collects
per-partition byte blocks to the driver only for this interop format.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SUFFIX_TO_DTYPE = {
    ".fbin": np.float32,
    ".hbin": np.float16,
    ".ibin": np.int32,
    ".u8bin": np.uint8,
    ".i8bin": np.int8,
}


def dtype_from_filename(filename: str) -> type:
    """Extension -> numpy dtype (reference: utils_grid_search.py:716-726)."""
    for suffix, dt in _SUFFIX_TO_DTYPE.items():
        if filename.endswith(suffix):
            return dt
    raise ValueError(f"unknown bigann extension on {filename!r}")


def suffix_from_dtype(dtype) -> str:
    """numpy dtype -> extension (reference: utils_grid_search.py:729-739)."""
    for suffix, dt in _SUFFIX_TO_DTYPE.items():
        if np.dtype(dtype) == np.dtype(dt):
            return suffix
    raise ValueError(f"unsupported dtype {dtype!r}")


def read_bigann(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan of bigann files under ``path`` (glob ok).

    Returns (file, row_id, vec array<float>) — row_id is the row index within
    its file, float16/int8/uint8 upcast to float (fp16 has no Spark type,
    SURVEY.md §1.2). Files are parallelized across executors; each file's
    bytes are decoded once with numpy.
    """

    def decode(batches):
        for pdf in batches:
            # one iteration per FILE (binaryFile source), not per data row
            for fname, raw in zip(pdf["path"], pdf["content"]):
                dt = dtype_from_filename(fname)
                rows, cols = struct.unpack("<II", raw[:8])
                mat = np.frombuffer(raw, dtype=dt, offset=8, count=rows * cols)
                mat = mat.reshape(rows, cols).astype(np.float32)
                yield pd.DataFrame(
                    {
                        "file": os.path.basename(fname),
                        "row_id": np.arange(rows, dtype=np.int64),
                        "vec": list(mat),
                    }
                )

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(decode, schema="file string, row_id bigint, vec array<float>")
    )


# write_bigann materializes on the driver (single headered file, no parallel
# layout); the cap keeps a corpus-sized DataFrame from OOMing the driver. A
# real corpus belongs in Parquet — this sink exists only for reference-format
# interop (query sets, ground-truth matrices).
MAX_BIGANN_WRITE_ROWS = 1_000_000


def write_bigann(df: DataFrame, path: str, dtype=np.float32, vec_col: str = "vec") -> int:
    """Write (ordered by an id column upstream) vectors as one bigann file.

    Interop sink only: materializes on the driver (the format is a single
    headered file and has no parallel layout). Returns rows written; raises
    ValueError beyond MAX_BIGANN_WRITE_ROWS.
    """
    pdf = df.select(vec_col).limit(MAX_BIGANN_WRITE_ROWS + 1).toPandas()
    if len(pdf) > MAX_BIGANN_WRITE_ROWS:
        raise ValueError(
            f"write_bigann materializes on the driver; got > "
            f"{MAX_BIGANN_WRITE_ROWS} rows. Write Parquet for corpus-scale data."
        )
    mat = np.vstack(pdf[vec_col].to_numpy()).astype(dtype)
    with open(path, "wb") as f:
        f.write(struct.pack("<II", mat.shape[0], mat.shape[1]))
        f.write(mat.tobytes(order="C"))
    return int(mat.shape[0])

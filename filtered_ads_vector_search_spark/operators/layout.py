"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping scans.

At 100 TB the scan is the query: Parquet readers skip row groups / files
whose column min/max stats exclude the predicate, but a table sorted on ONE
column only skips for that column — a range query on any other dimension
reads everything. Interleaving the bits of two (or more) columns into one
sort key (the Z-order / Morton curve — the same layout Delta Lake's
OPTIMIZE ZORDER BY and Iceberg's sort orders implement) makes every file a
quad-tree cell: min/max stats stay tight on BOTH dimensions, so range
predicates on either column (or both) skip most files.

The key is an unrolled shift-mask expression generated from one Python
loop for both engines — pure codegen arithmetic, no UDF, and the Spark
column and DuckDB SQL forms cannot drift.

The reference has no storage layer at all (memmapped npy chunks,
utils_grid_search.py:716-795); this is part of the beyond-reference
100 TB-engineering surface, same family as the bucketed IVF/term-index
layouts (data layout AS the index).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key_col",
    "zorder_key_sql",
    "write_zordered",
    "parquet_minmax",
]

# 16 bits per dimension -> a 32-bit key; inputs are masked to this width,
# so callers bucket wider domains first (e.g. pmod(col, 1 << 16))
ZORDER_BITS = 16


def zorder_key_col(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative int
    columns: bit b of x lands at position 2b, bit b of y at 2b+1. Disjoint
    target bits, so the combine is a plain sum — one flat codegen
    expression of 2*bits shift/mask terms."""
    out = None
    for b in range(bits):
        tx = F.shiftleft(F.shiftrightunsigned(x.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b)
        ty = F.shiftleft(F.shiftrightunsigned(y.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b + 1)
        term = tx + ty
        out = term if out is None else out + term
    return out


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin generated from the same loop/constants."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_expr}) >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"((({y_expr}) >> {b}) & 1) * {1 << (2 * b + 1)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ~n_files Parquet files clustered on the Z-order key
    of (x_col, y_col): repartitionByRange on the key splits the curve into
    contiguous segments (quad-tree cell unions — tight min/max on BOTH
    dimensions), sortWithinPartitions keeps row groups tight inside each
    file. The key column is dropped before writing — the FILE STATISTICS of
    the original columns are the index."""
    zk = zorder_key_col(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("_zkey", zk)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def parquet_minmax(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) stats of ``column`` from Parquet footer metadata
    (what a stats-pruning reader consults) — the measurement tool for
    layout-quality tests, driver-side, reads footers only."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                s = col.statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((lo, hi))
    return out

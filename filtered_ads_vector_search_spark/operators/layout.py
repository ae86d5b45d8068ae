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

# 16 bits per dimension -> a 32-bit key for 2 columns; inputs are masked to
# this width, so callers bucket wider domains first (e.g. pmod(col, 1 << 16))
ZORDER_BITS = 16


def _check_width(n_cols: int, bits: int) -> None:
    if n_cols < 2:
        raise ValueError(f"zorder key needs >= 2 columns, got {n_cols}")
    if n_cols * bits > 63:
        # position n_cols*bits - 1 must stay below the int64 sign bit
        raise ValueError(
            f"zorder key width {n_cols}x{bits}={n_cols * bits} bits exceeds "
            f"the 63 usable bits of int64 — lower bits (e.g. "
            f"bits={63 // n_cols}) or bucket the domains tighter"
        )


def zorder_key_col(*cols: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of n non-negative int
    columns: bit b of column i lands at position n*b + i (the standard
    n-dimensional Morton rule — Delta's OPTIMIZE ZORDER BY takes the same
    n-column list). Disjoint target bits, so the combine is a plain sum —
    one flat codegen expression of n*bits shift/mask terms. Requires
    n*bits <= 63 (the key is one signed int64)."""
    n = len(cols)
    _check_width(n, bits)
    out = None
    for b in range(bits):
        for i, c in enumerate(cols):
            term = F.shiftleft(
                F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1)),
                n * b + i,
            )
            out = term if out is None else out + term
    return out


def zorder_key_sql(*exprs: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin generated from the same loop/constants."""
    n = len(exprs)
    _check_width(n, bits)
    terms = []
    for b in range(bits):
        for i, e in enumerate(exprs):
            terms.append(f"((({e}) >> {b}) & 1) * {1 << (n * b + i)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    *cols: str,
    n_files: int = 16,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ~n_files Parquet files clustered on the Z-order key
    of ``cols``: repartitionByRange on the key splits the curve into
    contiguous segments (hyper-octant cell unions — tight min/max on EVERY
    listed dimension), sortWithinPartitions keeps row groups tight inside
    each file. The key column is dropped before writing — the FILE
    STATISTICS of the original columns are the index."""
    zk = zorder_key_col(*[F.col(c) for c in cols], bits=bits)
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

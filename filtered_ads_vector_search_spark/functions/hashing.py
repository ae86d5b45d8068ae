"""Portable deterministic hashing — identical results in Spark SQL and DuckDB.

The reference derives all randomness from ``np.random.seed(42)`` /
``random_state=42`` (reference: tests.py:9-10, cuvs_bench_grid_search_v3.py:776).
Spark's ``rand(seed)`` is partition-dependent, so instead every "random" choice
in this engine (train/val split, rating-bucket assignment, minhash functions) is
a pure arithmetic function of a row id. That makes results partition-count
invariant (the Spark analog of the reference's batch-size invariance tests,
reference: tests.py:7-62) AND lets the DuckDB oracle compute bit-identical
values.

Only int64-safe ops are used (* + %), with inputs reduced mod P first so no
intermediate exceeds ~2.7e15 (ANSI mode overflow-safe).

Every function here has two forms:
  * ``*_col(...)``  -> pyspark Column
  * ``*_sql(...)``  -> SQL text fragment for the DuckDB oracle
generated from the same constants, so query and oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A large prime modulus and two multiplicative mixing rounds.
P = 1_000_003
A1 = 2_654_435_761  # Knuth multiplicative constant
C1 = 99_991
A2 = 179_426_549
C2 = 7_919

# Seeds for independent hash streams (arbitrary, fixed).
SPLIT_SEED = 42
BUCKET_SEED = 1337


def portable_hash_col(col: Column, seed: int = 0) -> Column:
    """Two mixing rounds of ((x*A+C) % P) on a non-negative int64 column."""
    h0 = (col + F.lit(seed * 7919)) % F.lit(P)
    h1 = (h0 * F.lit(A1) + F.lit(C1)) % F.lit(P)
    h2 = (h1 * F.lit(A2) + F.lit(C2)) % F.lit(P)
    return h2


def portable_hash_np(arr, seed: int = 0):
    """NumPy twin of portable_hash_col for Arrow-batched kernels (same
    constants, same two mixing rounds; int64-safe: every intermediate is
    < P * A2 ≈ 1.8e14)."""
    h0 = (arr.astype("int64") + seed * 7919) % P
    h1 = (h0 * A1 + C1) % P
    return (h1 * A2 + C2) % P


def portable_hash_sql(expr: str, seed: int = 0) -> str:
    # CAST to BIGINT: DuckDB types integer parquet columns as INT32, and
    # e.g. id + seed*7919 can exceed 2^31 (seed 1337 overflows at id
    # 2_136_895_945). Spark side is already bigint.
    h0 = f"((CAST(({expr}) AS BIGINT)) + {seed * 7919}) % {P}"
    h1 = f"(({h0}) * {A1} + {C1}) % {P}"
    h2 = f"(({h1}) * {A2} + {C2}) % {P}"
    return f"({h2})"


def str_hash_col(col: Column) -> Column:
    """Portable string -> int64 hash via the first 15 hex chars of md5.

    15 hex digits < 2^60, so the value always fits an int64 (ANSI-safe).
    Spark `conv` base-16 -> base-10; DuckDB casts a 0x literal.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def str_hash_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"

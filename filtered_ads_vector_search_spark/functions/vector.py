"""Vector expression library (SURVEY.md §2 C).

Distances/similarities over ``ARRAY<FLOAT>`` columns, implemented with Spark
higher-order functions (``zip_with`` + ``aggregate``) so they run entirely
JVM-side inside whole-stage codegen — no Python in the hot path.

Reference semantics:
  * sqeuclidean  — Σ(aᵢ-bᵢ)²          (reference: utils_grid_search.py:919-921)
  * inner_product — Σaᵢbᵢ, similarity (reference: utils_grid_search.py:930-939)
  * cosine        — 1 - dot/(‖a‖‖b‖)  (reference: download_dataset/embedding_test.py:36)
  * sign-hamming  — #dims with differing sign; metric for the binary-quantized
                    tier (reference: utils_grid_search.py:433-434, 650-654)

All arithmetic is done in float64 (elements cast to double before any op) in
strict left-to-right fold order, so the DuckDB oracle — given the same fold
order — produces bit-identical doubles. Each function has a ``*_sql`` twin that
renders the same computation for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "vec_sqeuclidean",
    "vec_inner_product",
    "vec_norm",
    "vec_cosine_distance",
    "vec_cosine_distance_prenorm",
    "vec_sign_hamming",
    "vec_truncate",
    "float16_roundtrip",
    "sq8_quantize",
    "binary_sign",
    "binary_pack32",
    "hamming_packed",
    "binary_pack32_sql",
    "hamming_packed_sql",
    "sqeuclidean_sql",
    "inner_product_sql",
    "norm_sql",
    "cosine_distance_sql",
    "sign_hamming_sql",
    "sq8_quantize_sql",
    "fp16_roundtrip_sql",
]


def _d(x: Column) -> Column:
    return x.cast("double")


def vec_sqeuclidean(a: Column, b: Column) -> Column:
    """Σ(aᵢ-bᵢ)² as a sequential double fold (reference: utils_grid_search.py:919-921)."""
    diffs = F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y)))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def vec_inner_product(a: Column, b: Column) -> Column:
    """Σaᵢbᵢ (reference: utils_grid_search.py:930-939). Larger = more similar."""
    prods = F.zip_with(a, b, lambda x, y: _d(x) * _d(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def vec_norm(a: Column) -> Column:
    return F.sqrt(vec_inner_product(a, a))


def vec_cosine_distance(a: Column, b: Column) -> Column:
    """1 - cos(a,b); zero-norm guarded via nullif (ANSI-safe)."""
    denom = F.nullif(vec_norm(a) * vec_norm(b), F.lit(0.0))
    return F.lit(1.0) - vec_inner_product(a, b) / denom


def vec_cosine_distance_prenorm(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``vec_cosine_distance`` with the two norms precomputed as columns.

    Bit-identical values (same fold for each norm, same product, same
    nullif guard, same division) — exists so per-CANDIDATE scoring under a
    join evaluates ONE interpreted fold (the inner product) instead of
    three: each norm is a per-ROW quantity, so callers hoist it into a
    projection below the join (guide §1.2 "per-task work" — at bench scale
    the three-fold form measurably dominates cosine candidate scoring, and
    at 100 TB it triples the expression work of every cosine rerank)."""
    return F.lit(1.0) - vec_inner_product(a, b) / F.nullif(na * nb, F.lit(0.0))


def vec_sign_hamming(a: Column, b: Column) -> Column:
    """#dims where sign(aᵢ) != sign(bᵢ) — the unpacked analog of the reference's
    packed-bit hamming metric ((v>0) -> packbits, utils_grid_search.py:650-654).
    Integer-valued, so exactly portable."""
    bits = F.zip_with(
        a, b, lambda x, y: ((x > 0) != (y > 0)).cast("int")
    )
    return F.aggregate(bits, F.lit(0), lambda acc, x: acc + x)


def vec_truncate(a: Column, n: int) -> Column:
    """Dimension truncation emb[:, :n] (reference: download_dataset/utils.py:134-135)."""
    return F.slice(a, 1, n)


def float16_roundtrip(a: Column) -> Column:
    """fp16 storage-precision emulation (reference: download_dataset/utils.py:137-139).

    Spark has no fp16 type; model the precision loss explicitly with a pandas
    UDF is overkill here — a float32->float16->float32 cast is NOT expressible
    in pure SQL, so this wrapper is provided by operators.quantize as an
    Arrow-batched pandas UDF. Import kept here for API discovery.
    """
    from ..operators.quantize import float16_roundtrip_udf

    return float16_roundtrip_udf(a)


def sq8_quantize(a: Column, lo: float, hi: float) -> Column:
    """Affine scalar quantization to int8 with clamping
    (reference: index_data.ipynb cell 0, scalar.QuantizerParams/transform).

    q = round((x - lo) / (hi - lo) * 254) - 127, clamped to [-127, 127].
    Pure arithmetic -> exactly portable to the DuckDB oracle.
    """
    scale = 254.0 / (hi - lo)
    return F.transform(
        a,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                (F.round((_d(x) - F.lit(float(lo))) * F.lit(scale)) - F.lit(127.0)).cast("int"),
            ),
        ),
    )


def binary_pack32(a: Column) -> Column:
    """Pack sign bits into ⌈dim/32⌉ 32-bit words held as ARRAY<BIGINT> — the
    true analog of the reference's np.packbits binary tier
    (utils_grid_search.py:652-654). Word w = Σ_{j} 2^j * (a[32w+j] > 0).

    32-bit words (not 64) so the packed value never touches the int64 sign
    bit — safe under ANSI arithmetic in Spark AND DuckDB. Hamming over packed
    words is `bit_count(xor)` per word: ~32x less work than the per-dim fold."""
    words = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(a) - 1) / 32).cast("int")),
        lambda w: F.aggregate(
            F.slice(a, w * 32 + 1, 32),
            F.struct(F.lit(0).cast("bigint").alias("acc"), F.lit(1).cast("bigint").alias("p")),
            lambda s, x: F.struct(
                (s["acc"] + F.when(x > 0, s["p"]).otherwise(F.lit(0))).alias("acc"),
                (s["p"] * 2).alias("p"),
            ),
            lambda s: s["acc"],
        ),
    )
    return words


def hamming_packed(a: Column, b: Column) -> Column:
    """Hamming distance between binary_pack32 vectors: Σ_w bit_count(a_w ^ b_w)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def binary_pack32_sql(a: str) -> str:
    """DuckDB twin of binary_pack32 (same word order, same bit order)."""
    return (
        f"list_transform(range(0, CAST(floor((len({a}) - 1) / 32) AS INT) + 1), "
        f"w -> list_sum(list_transform(range(1, 33), "
        f"j -> CASE WHEN w * 32 + j <= len({a}) AND {a}[w * 32 + j] > 0 "
        f"THEN (1::BIGINT << (j - 1)) ELSE 0::BIGINT END)))"
    )


def hamming_packed_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> bit_count(xor({a}[i], {b}[i]))))"
    )


def binary_sign(a: Column) -> Column:
    """Sign-bit vector (v > 0) as ARRAY<INT> 0/1 — unpacked binary quantization
    (reference: utils_grid_search.py:652-654). Packing to bytes is a physical
    optimization the Parquet encoder already gives us; semantics live here."""
    return F.transform(a, lambda x: (x > 0).cast("int"))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL twins. `a`/`b` are SQL expressions for list columns.
# Same double casts, same element order, same fold direction.
# ---------------------------------------------------------------------------


def sqeuclidean_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )


def inner_product_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({inner_product_sql(a, a)})"


def cosine_distance_sql(a: str, b: str) -> str:
    return (
        f"(1.0 - {inner_product_sql(a, b)} / "
        f"nullif({norm_sql(a)} * {norm_sql(b)}, 0.0))"
    )


def sign_hamming_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> CASE WHEN ({a}[i] > 0) != ({b}[i] > 0) THEN 1 ELSE 0 END))"
    )


def fp16_roundtrip_sql(a: str) -> str:
    """DuckDB twin of the fp16 storage round-trip (operators.quantize.
    float16_roundtrip_udf; reference: download_dataset/utils.py:137-139).

    IEEE-754 binary16 round-to-nearest-even, emulated arithmetically: the
    mantissa step at magnitude m is 2^(e-10) with e = floor(log2 m) clamped
    at -14 (subnormals share the fixed step 2^-24); round_even snaps the
    scaled magnitude. Every fp16 value is exactly representable as a double,
    so the emulated result equals numpy's float16 cast bit-for-bit (validated
    against np.float16 over 320k random float32s incl. subnormal range in
    tests/test_oracle_parity.py). Overflow (|x| > 65504) is out of scope —
    embeddings are unit-scale.
    """
    step = f"power(2.0, greatest(floor(log2(abs(x))), -14.0) - 10.0)"
    elem = (
        f"CASE WHEN x = 0 THEN CAST(0 AS DOUBLE) "
        f"ELSE sign(x) * round_even(abs(x) / {step}, 0) * {step} END"
    )
    return f"list_transform({a}, x -> {elem})"


def sq8_quantize_sql(a: str, lo: float, hi: float) -> str:
    scale = 254.0 / (hi - lo)
    return (
        f"list_transform({a}, x -> greatest(-127, least(127, "
        f"CAST(round((CAST(x AS DOUBLE) - {float(lo)!r}) * {scale!r}) - 127.0 AS INTEGER))))"
    )

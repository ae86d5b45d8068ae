"""Dimensionality reduction for the vector tier: JL random projection and PCA.

Two standard pre-steps a 100 TB vector pipeline runs before indexing
(reference scope: the reference truncates dimensions outright,
download_dataset/embedding_dataset_gen.py n_dimensions — `vec_truncate`
mirrors that; these are the principled replacements):

* ``jl_project`` — Johnson-Lindenstrauss sign projection: out_k(v) =
  (1/sqrt(K)) * sum_i v[i] * s(i,k), s(i,k) = +-1 drawn from the portable
  hash of (i*K + k). Completely deterministic and partition-invariant, so
  the DuckDB oracle reproduces the projection bit-for-bit: distances in the
  projected space are hash-checkable, and the JL norm-concentration property
  is MEASURED by an oracled query instead of asserted.
* ``pca_train`` / ``pca_apply`` — classical PCA: the d x d covariance is one
  map-combinable aggregate over the corpus (collected: d*(d+1)/2 doubles —
  bounded-collect discipline, same as centroid tables), eigendecomposed on
  the driver with numpy, and applied as a literal-matrix expression fully in
  whole-stage codegen. Train state is non-SQL (eigh), so PCA is value-checked
  by variance-ordering and reconstruction/recall properties in pytest — the
  same discipline as trained k-means IVF.

Everything stays JVM-side: projections are nested transform/aggregate
expressions over array columns; no UDFs, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash_col, portable_hash_sql

__all__ = [
    "jl_project",
    "jl_project_sql",
    "pca_train",
    "pca_apply",
]

JL_SEED = 314_159


def jl_project(vec: Column, in_dim: int, out_dim: int) -> Column:
    """Project an array<float/double> column to ``out_dim`` dims with seeded
    +-1/sqrt(out_dim) hyperplanes. Pure arithmetic on (i, k) — no sampled
    state, no shuffle, partition-invariant."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"dims must be positive, got in={in_dim} out={out_dim}")
    scale = 1.0 / float(out_dim) ** 0.5

    def _component(k: Column) -> Column:
        def _step(acc: Column, i: Column) -> Column:
            sign = F.when(
                portable_hash_col(i * F.lit(out_dim) + k, seed=JL_SEED) % 2 == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            return acc + F.element_at(vec, (i + 1).cast("int")).cast("double") * sign

        return (
            F.aggregate(F.sequence(F.lit(0), F.lit(in_dim - 1)), F.lit(0.0), _step)
            * F.lit(scale)
        )

    return F.transform(F.sequence(F.lit(0), F.lit(out_dim - 1)), _component)


def jl_project_sql(vec: str, in_dim: int, out_dim: int) -> str:
    """DuckDB twin of jl_project — identical fold order and sign stream."""
    scale = 1.0 / float(out_dim) ** 0.5
    h = portable_hash_sql(f"i * {out_dim} + k", seed=JL_SEED)
    return (
        f"list_transform(range(0, {out_dim}), k -> {scale} * "
        f"list_sum(list_transform(range(0, {in_dim}), "
        f"i -> CAST({vec}[i + 1] AS DOUBLE) * "
        f"(CASE WHEN ({h}) % 2 = 0 THEN 1.0 ELSE -1.0 END))))"
    )


def pca_train(
    corpus: DataFrame, vec_col: str = "embedding", out_dim: int = 16
) -> tuple[list[list[float]], list[float]]:
    """Top-``out_dim`` principal components of the corpus.

    Covariance entries are ONE map-combinable aggregate over the flattened
    upper-triangle outer products (d*(d+1)/2 values per vector, exploded,
    groupBy position) — no self-join, no row ids; at most d*(d+1)/2 + d
    result rows ever reach the driver, never the corpus. The aggregate is
    linear in corpus size but carries a d(d+1)/2 fan-out per row, so at
    real scale train on a bounded hash-gated sample (the same discipline as
    pq_train / the IVF coarse quantizer — scripts/bench_scale.py trains on
    a 5% gate and applies to the full corpus). Returns (components
    [out_dim x d, row-major eigenvectors by descending eigenvalue],
    mean [d]).
    """
    import numpy as np

    first = corpus.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pca_train: empty corpus")
    d = first["d"]
    v = F.col(vec_col).cast("array<double>")
    # upper-triangle outer products, flattened in a fixed enumeration order
    # the driver replays below — ONE scan, no self-join, no row ids
    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(d)),
            lambda i: F.transform(
                F.sequence(i, F.lit(d)),
                lambda j: F.element_at(v, i.cast("int"))
                * F.element_at(v, j.cast("int")),
            ),
        )
    )
    prod_rows = (
        corpus.select(F.posexplode(tri).alias("k", "p"))
        .groupBy("k")
        .agg(F.sum("p").alias("sp"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sum_rows = (
        corpus.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("sx"))
        .collect()
    )
    n = prod_rows[0]["n"]
    pairs = [(i, j) for i in range(d) for j in range(i, d)]
    sx = np.zeros(d)
    for r in sum_rows:
        sx[r["i"]] = r["sx"]
    mean = sx / n
    cov = np.zeros((d, d))
    for r in prod_rows:
        i, j = pairs[r["k"]]
        c = r["sp"] / n - mean[i] * mean[j]
        cov[i, j] = c
        cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:out_dim]
    comps = vecs[:, order].T  # out_dim x d
    # sign convention: first nonzero entry positive (deterministic output)
    for row in comps:
        nz = row[np.abs(row) > 1e-12]
        if len(nz) and nz[0] < 0:
            row *= -1.0
    return comps.tolist(), mean.tolist()


def pca_apply(vec: Column, components: list[list[float]], mean: list[float]) -> Column:
    """(v - mean) @ components.T as a literal-matrix codegen expression."""
    comp_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in row]) for row in components
    ])
    mean_lit = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with(
        vec.cast("array<double>"), mean_lit, lambda x, m_: x - m_
    )
    return F.transform(
        comp_lit,
        lambda row: F.aggregate(
            F.zip_with(centered, row, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )

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
* ``pca_train`` / ``pca_apply`` — classical PCA: the d x d covariance comes
  from per-partition Gram partials (one numpy GEMM per Arrow batch — the
  MLlib covariance pattern; collected: partitions x (d^2 + d) doubles,
  bounded-collect discipline, same as centroid tables), eigendecomposed on
  the driver with numpy, and applied as a literal-matrix expression fully in
  whole-stage codegen. Train state is non-SQL (eigh), so PCA is value-checked
  by variance-ordering and reconstruction/recall properties in pytest — the
  same discipline as trained k-means IVF.

Projections stay JVM-side: nested transform/aggregate expressions over
array columns, no per-row Python; the one Python surface is the Gram
partial kernel, Arrow-batched with flat-buffer decode.
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


def _jl_sign(i: int, k: int, out_dim: int) -> float:
    """The seeded +-1 sign for (input dim i, output dim k) — plain Python
    over the portable-hash constants. The matrix is DATA-INDEPENDENT, so
    both engine twins embed it as literals instead of evaluating
    in_dim*out_dim hash chains per row."""
    from ..functions.hashing import A1, A2, C1, C2, P as _P

    h0 = (i * out_dim + k + JL_SEED * 7919) % _P
    h1 = (h0 * A1 + C1) % _P
    h2 = (h1 * A2 + C2) % _P
    return 1.0 if h2 % 2 == 0 else -1.0


def jl_project(vec: Column, in_dim: int, out_dim: int) -> Column:
    """Project an array<float/double> column to ``out_dim`` dims with seeded
    +-1/sqrt(out_dim) hyperplanes. The sign matrix is precomputed on the
    driver (same portable-hash formula, so results are unchanged) and
    enters the plan as literal rows — per-row work is one zip_with fold per
    output dim, not in_dim*out_dim modular-hash chains. No sampled state,
    no shuffle, partition-invariant."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"dims must be positive, got in={in_dim} out={out_dim}")
    scale = 1.0 / float(out_dim) ** 0.5
    rows = [
        F.array(*[F.lit(_jl_sign(i, k, out_dim)) for i in range(in_dim)])
        for k in range(out_dim)
    ]
    v = vec.cast("array<double>")
    return F.array(*[
        F.aggregate(
            F.zip_with(v, row, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * F.lit(scale)
        for row in rows
    ])


def jl_project_sql(vec: str, in_dim: int, out_dim: int) -> str:
    """DuckDB twin of jl_project — the same literal sign rows and fold
    order, so results are bit-identical."""
    scale = 1.0 / float(out_dim) ** 0.5
    comps = []
    for k in range(out_dim):
        row = ", ".join(repr(_jl_sign(i, k, out_dim)) for i in range(in_dim))
        comps.append(
            f"{scale} * list_sum(list_transform(range(1, {in_dim} + 1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ([{row}]::DOUBLE[])[i]))"
        )
    return "[" + ", ".join(comps) + "]"


def pca_train(
    corpus: DataFrame, vec_col: str = "embedding", out_dim: int = 16
) -> tuple[list[list[float]], list[float]]:
    """Top-``out_dim`` principal components of the corpus.

    The covariance is assembled from per-partition Gram partials: each task
    folds its Arrow batches into ONE d x d matrix (V.T @ V) plus a column
    sum, and only partitions x (d^2 + d) doubles reach the driver — never
    the corpus, no self-join, no row ids. Linear in corpus size with no
    per-row fan-out; still, at real scale train on a bounded hash-gated
    sample (the same discipline as pq_train / the IVF coarse quantizer —
    scripts/bench_scale.py trains on a 5% gate and applies to the full
    corpus). Returns (components [out_dim x d, row-major eigenvectors by
    descending eigenvalue], mean [d]).
    """
    import numpy as np

    first = corpus.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pca_train: empty corpus")
    d = int(first["d"])

    from .topk import _arrow_vectors

    def gram(batches):
        # ONE d x d Gram partial per task (the MLlib covariance pattern):
        # each batch contributes one numpy GEMM, and only partitions x
        # (d^2 + d) doubles ever reach the driver — never the corpus. This
        # replaced a d(d+1)/2-per-row exploded HOF aggregate whose fan-out
        # (2080 rows per vector at d=64) was the whole stage's wall time.
        import pyarrow as pa

        G = np.zeros((d, d), dtype=np.float64)
        s = np.zeros(d, dtype=np.float64)
        n_rows = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_vectors(batch, "_v")
            G += V.T @ V
            s += V.sum(axis=0)
            n_rows += V.shape[0]
        if n_rows:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([G.ravel().tolist()]),
                    pa.array([s.tolist()]),
                    pa.array([n_rows], type=pa.int64()),
                ],
                names=["g", "s", "n"],
            )

    partials = (
        corpus.select(F.col(vec_col).alias("_v"))
        .mapInArrow(gram, "g array<double>, s array<double>, n long")
        .collect()
    )
    if not partials:
        raise ValueError("pca_train: empty corpus")
    n = sum(r["n"] for r in partials)
    P = np.zeros((d, d))
    sx = np.zeros(d)
    for r in partials:
        P += np.asarray(r["g"], dtype=np.float64).reshape(d, d)
        sx += np.asarray(r["s"], dtype=np.float64)
    mean = sx / n
    cov = P / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
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

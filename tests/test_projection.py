"""Dimensionality reduction (operators/projection.py): JL determinism +
norm concentration; PCA orthonormality, variance ordering, and search recall.
The JL registry queries' DuckDB hash parity runs via check_correctness."""

import numpy as np
import pyspark.sql.functions as F

from filtered_ads_vector_search_spark.operators import projection as PJ
from filtered_ads_vector_search_spark.operators import topk as TK
from filtered_ads_vector_search_spark.operators.recall import recall_at_k

from tests.conftest import SF_TEST


def _emb(spark):
    return spark.read.parquet(f"{SF_TEST}/embeddings.parquet")


def test_jl_partition_invariant_and_norm_concentrated(spark):
    emb = _emb(spark)
    out = emb.select(
        "vec_id", PJ.jl_project(F.col("embedding"), 64, 16).alias("p")
    )
    a = {r.vec_id: r.p for r in out.collect()}
    b = {
        r.vec_id: r.p
        for r in emb.repartition(16)
        .select("vec_id", PJ.jl_project(F.col("embedding"), 64, 16).alias("p"))
        .collect()
    }
    assert a == b
    # norm concentration: E[||Pv||^2] = ||v||^2; mean ratio within 10%
    src = {r.vec_id: r.embedding for r in emb.collect()}
    ratios = [
        float(np.dot(a[i], a[i]) / np.dot(src[i], src[i])) for i in src
    ]
    assert abs(float(np.mean(ratios)) - 1.0) < 0.1


def test_pca_components_orthonormal_and_variance_ordered(spark):
    comps, mean = PJ.pca_train(_emb(spark), out_dim=8)
    C = np.array(comps)
    assert C.shape == (8, 64) and len(mean) == 64
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-8)
    # projected variance must be non-increasing across components
    X = np.array([r.embedding for r in _emb(spark).collect()]) - np.array(mean)
    var = (X @ C.T).var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(7))


def test_pca_apply_matches_numpy(spark):
    emb = _emb(spark)
    comps, mean = PJ.pca_train(emb, out_dim=4)
    got = {
        r.vec_id: np.array(r.p)
        for r in emb.select(
            "vec_id", PJ.pca_apply(F.col("embedding"), comps, mean).alias("p")
        ).collect()
    }
    C, m = np.array(comps), np.array(mean)
    for r in emb.limit(20).collect():
        want = C @ (np.array(r.embedding) - m)
        assert np.allclose(got[r.vec_id], want, atol=1e-9)


def test_pca_knn_recall_beats_floor_and_truncation(spark):
    """Search in 16-dim PCA space must hit a recall@10 floor vs exact 64-dim
    search, and beat naive dimension truncation to the same width (the
    reference's n_dimensions approach) on this corpus."""
    from filtered_ads_vector_search_spark.functions.vector import vec_truncate

    emb = _emb(spark)
    q, c = TK.split_queries(emb)
    truth = TK.knn_window(q, c, k=10)

    comps, mean = PJ.pca_train(emb, out_dim=16)
    pemb = emb.select(
        "vec_id", PJ.pca_apply(F.col("embedding"), comps, mean).alias("embedding")
    )
    pq, pc = TK.split_queries(pemb)
    pca_found = TK.knn_window(pq, pc, k=10)
    pca_rec = recall_at_k(pca_found, truth, k=10).first()["recall_at_k"]

    temb = emb.select("vec_id", vec_truncate(F.col("embedding"), 16).alias("embedding"))
    tq, tc = TK.split_queries(temb)
    tr_found = TK.knn_window(tq, tc, k=10)
    tr_rec = recall_at_k(tr_found, truth, k=10).first()["recall_at_k"]

    # The synthetic corpus is near-isotropic (no dominant subspace), so ANY
    # 64->16 reduction loses most neighbor structure — the meaningful checks
    # are the relative ones: PCA must beat naive truncation and clear a
    # non-degenerate floor (random ranking would land recall@10 near
    # 10/n_corpus ~ 0.02 here).
    assert pca_rec >= 0.15, (pca_rec, tr_rec)
    assert pca_rec >= tr_rec, (pca_rec, tr_rec)

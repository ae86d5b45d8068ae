"""Diagnose the round-10 OPQ ADC recall inversion (r10 verdict item #5).

Observed at the 5M anchor (SCALE_BENCH_5M extras.opq.ivfpq_opq_5m): pure-ADC
recall@10 under OPQ is LOWER than plain PQ (0.604 vs 0.622 at nprobe 32)
even though OPQ's reconstruction MSE is BETTER (0.0079 vs 0.0095); rerank
recovers it (0.9952 vs 0.9949).

This script pins the cause driver-locally, at the exact training discipline
of the 5M build (same deterministic generator math as gen_scale_data.py, so
no Spark job and no 5M scan is needed): 100k corpus sample -> coarse k-means
(512c) -> residuals -> plain-PQ vs OPQ codebooks (m8/nc256, same
sample/seed/iters as the build) -> three diagnostics:

  1. per_subspace_mse         — the MSE split across the m subspaces. OPQ's
                                variance-balancing objective EQUALIZES these
                                (Ge et al. CVPR 2013 sec 4); plain PQ's are
                                skewed along the generator's axis-aligned
                                cluster structure.
  2. neighbor_vs_random_bias  — |ADC - exact| distance-estimation error
                                measured separately on true-top-10 pairs
                                (the pairs recall@10 is decided by) and on
                                random pairs. MSE is the RANDOM-pair number;
                                recall is governed by the NEIGHBOR-pair
                                number — these can order differently.
  3. adc_recall_sample        — recall@10 of pure ADC vs exact on the
                                sample, isolating ADC ranking quality from
                                probe recall (full probing, no nprobe).

Writes extras["opq"]["adc_diagnosis"] into SCALE_BENCH_5M.json.
Run EXCLUSIVELY (BENCH_DRIFT discipline).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from filtered_ads_vector_search_spark.calibration import host_calibration
from filtered_ads_vector_search_spark.operators.ann import _kmeans_numpy
from filtered_ads_vector_search_spark.operators.pq import opq_fit, pq_fit

M, N_CODES, DIM, N_CLUSTERS = 8, 256, 64, 256
N_SAMPLE, N_Q, K = 100_000, 1_000, 10


def gen_rows(ids: np.ndarray) -> np.ndarray:
    """Bit-faithful numpy twin of gen_scale_data.gen_vectors' row math."""
    j = np.arange(DIM, dtype=np.uint64)
    ids = ids.astype(np.uint64)
    c = ids % N_CLUSTERS
    center = (
        ((c[:, None] * np.uint64(2654435761) + j[None, :] * np.uint64(97)) % 1000)
        .astype(np.float64) / 500.0 - 1.0
    ) * 2.0
    noise = (
        ((ids[:, None] * np.uint64(1103515245) + j[None, :] * np.uint64(12345))
         % np.uint64(2 ** 31)).astype(np.float64) / float(2 ** 30) - 1.0
    ) * 0.3
    return (center + noise).astype(np.float32).astype(np.float64)


def encode_decode(Y: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, _k, sd = books.shape
    S = Y.reshape(len(Y), m, sd)
    out = np.empty_like(Y)
    for j in range(m):
        cb = books[j]
        G = -2.0 * (S[:, j, :] @ cb.T) + (cb * cb).sum(axis=1)[None, :]
        out[:, j * sd:(j + 1) * sd] = cb[np.argmin(G, axis=1)]
    return out


def per_subspace_mse(Y: np.ndarray, books: np.ndarray) -> list[float]:
    m, _k, sd = books.shape
    S = Y.reshape(len(Y), m, sd)
    out = []
    for j in range(m):
        cb = books[j]
        G = -2.0 * (S[:, j, :] @ cb.T) + (cb * cb).sum(axis=1)[None, :]
        diff = S[:, j, :] - cb[np.argmin(G, axis=1)]
        out.append(float((diff * diff).sum() / len(Y)))
    return out


def main() -> None:
    pre = host_calibration()
    rng = np.random.RandomState(42)

    # corpus sample + coarse quantizer, the build's exact discipline
    # (ids >= 10k are corpus rows in the 5M bench; a uniform id draw is the
    # same distribution the hash sample sees)
    ids = rng.choice(np.arange(10_000, 5_010_000, dtype=np.int64), N_SAMPLE,
                     replace=False)
    X = gen_rows(ids)
    centers = _kmeans_numpy(X, 512, seed=42, max_iter=10)
    cn = (centers * centers).sum(axis=1)
    assign = np.argmin(cn[None, :] - 2.0 * (X @ centers.T), axis=1)
    R_res = X - centers[assign]

    # plain vs OPQ on the SAME residual sample/seed/iters as the build
    books_pq = np.asarray(pq_fit(R_res, m=M, n_codes=N_CODES, seed=42),
                          dtype=np.float64)
    R_rot, books_opq_l = opq_fit(R_res, m=M, n_codes=N_CODES, seed=42)
    books_opq = np.asarray(books_opq_l, dtype=np.float64)

    mse_pq_sub = per_subspace_mse(R_res, books_pq)
    mse_opq_sub = per_subspace_mse(R_res @ R_rot, books_opq)

    # query sample: the bench's query ids (< 10k) — same generator stream
    qids = np.arange(N_Q, dtype=np.int64)
    Q = gen_rows(qids)
    q_assign = np.argmin(cn[None, :] - 2.0 * (Q @ centers.T), axis=1)
    Q_res = Q - centers[q_assign]

    # exact vs ADC distances, query residual vs a corpus-candidate slice
    # restricted to each query's OWN cell would be tiny; instead score all
    # sample rows in RESIDUAL space against each query residual — this is
    # exactly the ADC approximation whose ranking the inversion is about
    # (full probing: probe recall is eliminated as a factor).
    sub = rng.choice(N_SAMPLE, 20_000, replace=False)
    C = R_res[sub]
    C_pq = encode_decode(C, books_pq)
    C_opq = (encode_decode(C @ R_rot, books_opq)) @ R_rot.T

    def dists(A, B):
        return ((A * A).sum(1)[:, None] - 2.0 * (A @ B.T)
                + (B * B).sum(1)[None, :])

    d_exact = dists(Q_res, C)
    d_pq = dists(Q_res, C_pq)
    d_opq = dists(Q_res, C_opq)

    # diagnostic 2: estimation error on neighbor pairs vs random pairs
    top = np.argsort(d_exact, axis=1)[:, :K]
    rows = np.repeat(np.arange(N_Q), K)
    nb = top.ravel()
    rand = rng.randint(0, len(C), size=N_Q * K)
    bias = {
        "neighbor_pq": float(np.abs(d_pq[rows, nb] - d_exact[rows, nb]).mean()),
        "neighbor_opq": float(np.abs(d_opq[rows, nb] - d_exact[rows, nb]).mean()),
        "random_pq": float(np.abs(d_pq[rows, rand] - d_exact[rows, rand]).mean()),
        "random_opq": float(np.abs(d_opq[rows, rand] - d_exact[rows, rand]).mean()),
    }

    # diagnostic 3: full-probe ADC recall@10 on the sample
    def recall(d_approx):
        got = np.argsort(d_approx, axis=1)[:, :K]
        return float(np.mean([
            len(set(got[i]) & set(top[i])) / K for i in range(N_Q)
        ]))

    # diagnostic 4: the rank-10 decision boundary — the exact-distance gap
    # between rank 10 and rank 11 per query. When this gap is at or below
    # the neighbor-pair ADC error scale, the boundary ordering is
    # quantization-noise-dominated for BOTH quantizers and global-MSE
    # improvements stop buying recall.
    d_sorted = np.sort(d_exact, axis=1)
    boundary_gap = float(np.mean(d_sorted[:, K] - d_sorted[:, K - 1]))

    out = {
        "n_sample": N_SAMPLE, "n_queries": N_Q, "k": K,
        "n_candidates_scored": len(C),
        "mse_pq": float(np.mean(mse_pq_sub)) * M,
        "mse_opq": float(np.mean(mse_opq_sub)) * M,
        "per_subspace_mse_pq": [round(v, 6) for v in mse_pq_sub],
        "per_subspace_mse_opq": [round(v, 6) for v in mse_opq_sub],
        "subspace_mse_spread_pq": float(np.std(mse_pq_sub) / np.mean(mse_pq_sub)),
        "subspace_mse_spread_opq": float(np.std(mse_opq_sub) / np.mean(mse_opq_sub)),
        "neighbor_vs_random_bias": {k: round(v, 6) for k, v in bias.items()},
        "exact_gap_rank10_to_11": round(boundary_gap, 6),
        "adc_recall_sample_pq": recall(d_pq),
        "adc_recall_sample_opq": recall(d_opq),
        "calibration_preflight": pre,
        "calibration_postrun": host_calibration(),
    }
    print(json.dumps(out, indent=1))

    path = "/root/repo/SCALE_BENCH_5M.json"
    doc = json.load(open(path))
    doc.setdefault("extras", {}).setdefault("opq", {})["adc_diagnosis"] = out
    json.dump(doc, open(path, "w"), indent=1)
    print("written to SCALE_BENCH_5M.json extras.opq.adc_diagnosis")


if __name__ == "__main__":
    main()

"""Phase breakdown of the 1M x 768d IVFPQ m16/nc256 build (round-10 verdict
item: the composed build costs 266.5 s vs 46.2 s for the 5M x 64d nc256
build despite 5x fewer rows — pin WHERE the time goes).

Replicates IVFPQIndex.build's exact phases, timing each:
  1. coarse        — IVFIndex.build (512 trained centroids, the k-means)
  2. residual_train— raw-vector Arrow sample + driver residual + Lloyd fit
  3. encode_scan   — pq_encode_with_codes_arrow (blas) count() WITHOUT the
                     bucket repartition: the pure encode-kernel scan
  4. encode_shuffle— the build's real materialization: encode ->
                     repartition(partition_id) -> sortWithinPartitions ->
                     persist -> count (includes the full-vector shuffle;
                     keep_vectors=True ships the 768d float column)

Driver-side kernel microbench (same batch shape the workers run) rides in
extras so the per-subspace-GEMM-layout hypothesis is answered with data:
strided S[:, j, :] @ CB[j].T vs contiguous-copy vs batched (m,n,sd)@(m,sd,nc)
matmul.

Writes extras["dim768"]["build_breakdown"] into SCALE_BENCH.json.
Run EXCLUSIVELY (BENCH_DRIFT discipline). Inputs: scale_data_768d
(generate with scripts/bench_scale_768d.py --gen).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.calibration import (
    assert_quiet_host,
    host_calibration,
)
from filtered_ads_vector_search_spark.operators.ann import IVFIndex
from filtered_ads_vector_search_spark.operators.pq import (
    pq_encode_with_codes_arrow,
)
from filtered_ads_vector_search_spark.session import get_spark

DATA = os.environ.get("SPARK_GRAFT_768D_DIR", "/root/repo/scale_data_768d")
N_CENTROIDS, M, N_CODES = 512, 16, 256


def _kernel_microbench() -> dict:
    rng = np.random.default_rng(0)
    n, dim, m, nc = 10_000, 768, 16, 256
    sd = dim // m
    V = rng.standard_normal((n, dim))
    CB = rng.standard_normal((m, nc, sd))
    CBT = np.ascontiguousarray(CB.transpose(0, 2, 1))
    CN = np.einsum("jcs,jcs->jc", CB, CB)
    S = V.reshape(n, m, sd)

    def strided():
        for j in range(m):
            G = S[:, j, :] @ CB[j].T
            np.argmin(CN[j][None, :] - 2.0 * G, axis=1)

    def contig():
        for j in range(m):
            G = np.ascontiguousarray(S[:, j, :]) @ CBT[j]
            np.argmin(CN[j][None, :] - 2.0 * G, axis=1)

    def batched():
        Sm = np.ascontiguousarray(S.transpose(1, 0, 2))
        G = Sm @ CBT
        np.argmin(CN[:, None, :] - 2.0 * G, axis=2)

    out = {}
    for name, fn in (("strided", strided), ("contig", contig), ("batched", batched)):
        best = 1e9
        for _ in range(7):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_s_per_10k_batch"] = round(best, 4)
    return out


def main() -> None:
    spark = get_spark(app_name="favs-profile-768d")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {"n_centroids": N_CENTROIDS, "m": M, "n_codes": N_CODES}

    extras["calibration_preflight"] = host_calibration()
    for w in assert_quiet_host(extras["calibration_preflight"]):
        print(f"WARNING (pre-flight): {w}", file=sys.stderr)
    extras["encode_kernel_microbench_10kx768_m16_nc256"] = _kernel_microbench()

    c = spark.read.parquet(f"{DATA}/vectors.parquet").cache()
    n = c.count()
    extras["n_vectors"] = n

    # phase 1: coarse training (IVFPQIndex.build's first call, verbatim
    # knobs — round 11: materialize=False, so this phase is the bounded
    # training-sample take + the k-means fit; the assignment fuses into
    # phase 4's single materialization scan)
    t0 = time.time()
    ivf = IVFIndex.build(c, n_centroids=N_CENTROIDS, seed=42, materialize=False)
    timings["coarse_kmeans_512c"] = round(time.time() - t0, 3)

    # phase 2: residual sample + per-subspace Lloyd training (sd=48) — the
    # round-11 build path: raw-vector Arrow-transport sample over the RAW
    # corpus (no assignment kernel in the scan), driver-side assignment +
    # residual, then the fit (IVFPQIndex.build's exact phases)
    from filtered_ads_vector_search_spark.operators.pq import (
        _train_sample_residual,
        pq_fit,
    )

    t0 = time.time()
    X = _train_sample_residual(c, ivf.centroids, "embedding", 100_000)
    timings["residual_sample_collect"] = round(time.time() - t0, 3)
    t0 = time.time()
    books = pq_fit(X, m=M, n_codes=N_CODES, seed=42)
    timings["residual_lloyd_fit"] = round(time.time() - t0, 3)
    timings["residual_train_m16_nc256"] = round(
        timings["residual_sample_collect"] + timings["residual_lloyd_fit"], 3
    )

    centers_rows = ivf.centroids.orderBy("centroid_id").collect()
    centers = np.array([r["centroid"] for r in centers_rows], dtype=np.float64)

    # phase 3: the pure encode scan — no repartition, codes-only output
    t0 = time.time()
    pq_encode_with_codes_arrow(
        ivf.assigned, books, "embedding", centers=centers,
        drop_vec=True, encode_mode="blas",
    ).count()
    timings["encode_scan_only_blas"] = round(time.time() - t0, 3)

    # phase 4: the build's real materialization (encode + bucket shuffle +
    # sort + persist; keep_vectors=True ships the 768d vector column)
    t0 = time.time()
    coded = (
        pq_encode_with_codes_arrow(
            ivf.assigned, books, "embedding", centers=centers,
            drop_vec=False, encode_mode="blas",
        )
        .repartition(F.col("partition_id"))
        .sortWithinPartitions("partition_id")
        .persist()
    )
    coded.count()
    timings["encode_shuffle_sort_persist"] = round(time.time() - t0, 3)

    # the codes-only variant of the same materialization: how much of the
    # shuffle cost is the kept 768d vector column?
    t0 = time.time()
    coded_nv = (
        pq_encode_with_codes_arrow(
            ivf.assigned, books, "embedding", centers=centers,
            drop_vec=True, encode_mode="blas",
        )
        .repartition(F.col("partition_id"))
        .sortWithinPartitions("partition_id")
        .persist()
    )
    coded_nv.count()
    timings["encode_shuffle_codes_only"] = round(time.time() - t0, 3)
    coded_nv.unpersist()
    coded.unpersist()
    ivf.unpersist()

    total = round(
        timings["coarse_kmeans_512c"]
        + timings["residual_train_m16_nc256"]
        + timings["encode_shuffle_sort_persist"],
        3,
    )
    extras["build_total_equivalent"] = total
    extras["calibration_postrun"] = host_calibration()

    result = {
        "metric": "ivfpq_768d_build_breakdown_sec",
        "value": total,
        "unit": "sec",
        "timings": timings,
        "extras": extras,
    }
    print(json.dumps(result))
    sb_path = "/root/repo/SCALE_BENCH.json"
    if os.path.exists(sb_path):
        with open(sb_path) as f:
            sb = json.load(f)
        sb.setdefault("extras", {}).setdefault("dim768", {})["build_breakdown"] = {
            "timings": timings,
            **{k: v for k, v in extras.items() if k != "n_vectors"},
        }
        with open(sb_path, "w") as f:
            json.dump(sb, f)
    spark.stop()


if __name__ == "__main__":
    main()

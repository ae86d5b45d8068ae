"""OPQ scale row at the reference's corpus shape (5M x 64d): train the
rotation (m8/nc256), rotation-encode the FULL corpus through the blas Arrow
kernel, and compare against the plain-PQ encode of the same corpus — the
round-10 verdict's missing scale evidence for the OPQ tier.

Rows published into SCALE_BENCH_5M.json extras["opq"]:
  * opq_train_m8_nc256_s   — driver-local alternation on the bounded 100k
                             sample (Ge et al. CVPR 2013; scale-independent)
  * pq_train_m8_nc256_s    — the plain trainer on the same sample (control)
  * opq_encode_5m_blas_s   — full-corpus codes via
                             pq_encode_with_codes_arrow(rotation=R,
                             encode_mode='blas'), min-of-2
  * pq_encode_5m_blas_s    — the identical encode without the rotation:
                             the rotation's marginal cost is one DGEMM per
                             batch, this pins it with data
  * mse_opq / mse_pq       — reconstruction MSE on the training sample (the
                             opq_codes contract set); improved must be True

Run EXCLUSIVELY (BENCH_DRIFT discipline). Inputs: scale_data_5m (generate
with scripts/bench_scale_5m.py --gen, then exit and run this alone).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from filtered_ads_vector_search_spark.calibration import (
    assert_quiet_host,
    host_calibration,
)
from filtered_ads_vector_search_spark.operators import pq as PQ
from filtered_ads_vector_search_spark.session import get_spark

DATA = os.environ.get("SPARK_GRAFT_5M_DIR", "/root/repo/scale_data_5m")
M, N_CODES = 8, 256


def _mse(Y: np.ndarray, books) -> float:
    CB = np.asarray(books, dtype=np.float64)
    m, _k, sd = CB.shape
    S = Y.reshape(len(Y), m, sd)
    tot = 0.0
    for j in range(m):
        G = -2.0 * (S[:, j, :] @ CB[j].T) + (CB[j] * CB[j]).sum(axis=1)[None, :]
        diff = S[:, j, :] - CB[j][np.argmin(G, axis=1)]
        tot += float((diff * diff).sum())
    return tot / len(Y)


def main() -> None:
    spark = get_spark(app_name="favs-bench-opq-5m")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {"m": M, "n_codes": N_CODES}

    extras["calibration_preflight"] = host_calibration()
    for w in assert_quiet_host(extras["calibration_preflight"]):
        print(f"WARNING (pre-flight): {w}", file=sys.stderr)

    corpus = spark.read.parquet(f"{DATA}/vectors.parquet").cache()
    extras["n_vectors"] = corpus.count()

    t0 = time.time()
    books_pq = PQ.pq_train(corpus, m=M, n_codes=N_CODES, seed=42)
    timings["pq_train_m8_nc256"] = round(time.time() - t0, 3)

    t0 = time.time()
    R, books_opq = PQ.opq_train(corpus, m=M, n_codes=N_CODES, seed=42)
    timings["opq_train_m8_nc256"] = round(time.time() - t0, 3)

    X = PQ._train_sample(corpus, "embedding", 100_000)
    extras["mse_pq"] = round(_mse(X, books_pq), 6)
    extras["mse_opq"] = round(_mse(X @ R, books_opq), 6)
    extras["improved"] = bool(extras["mse_opq"] <= extras["mse_pq"])
    assert extras["improved"], (extras["mse_opq"], extras["mse_pq"])

    for name, books, rot in (
        ("pq_encode_5m_blas", books_pq, None),
        ("opq_encode_5m_blas", books_opq, R),
    ):
        samples = []
        for _ in range(2):
            t0 = time.time()
            PQ.pq_encode_with_codes_arrow(
                corpus, books, "embedding", drop_vec=True,
                encode_mode="blas", rotation=rot,
            ).count()
            samples.append(round(time.time() - t0, 3))
        timings[name] = min(samples)
        extras[f"{name}_samples"] = samples

    extras["calibration_postrun"] = host_calibration()
    result = {
        "metric": "opq_encode_5m_sec",
        "value": timings["opq_encode_5m_blas"],
        "unit": "sec",
        "timings": timings,
        "extras": extras,
    }
    print(json.dumps(result))
    sb_path = "/root/repo/SCALE_BENCH_5M.json"
    if os.path.exists(sb_path):
        with open(sb_path) as f:
            sb = json.load(f)
        sb.setdefault("extras", {})["opq"] = {"timings": timings, **extras}
        with open(sb_path, "w") as f:
            json.dump(sb, f)
    spark.stop()


if __name__ == "__main__":
    main()

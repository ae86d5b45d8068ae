"""End-to-end OPQ+IVFPQ search row at the reference's corpus shape
(5M x 64d, 10k queries): FAISS's shipping ``OPQ8,IVF512,PQ8x8``
configuration (reference capability per BASELINE.json's north star;
composition landed round 10, ivfpq.py::IVFPQIndex.build(opq=True)).

Builds the PLAIN residual IVFPQ and the OPQ-composed index with identical
knobs in one session, then searches the full 10k batch through both at
rerank=0 (pure ADC — the tier OPQ exists to improve) and rerank=100 (the
headline serving form). Recall is measured against the exact truth on the
1k-query subsample, same discipline as bench_scale_5m.py.

Rows published into SCALE_BENCH_5M.json extras["opq"]["ivfpq_opq_5m"]:
  * build_pq_s / build_opq_s    — composed builds (512c, m8, nc256, blas
                                  encode); the OPQ delta is the rotation
                                  alternation on the bounded residual
                                  sample + one DGEMM in the encode scan
  * adc_pq / adc_opq            — rerank=0 10kq search: {seconds, recall}
  * rerank_pq / rerank_opq      — rerank=100 10kq search: {seconds, recall}

Contract: recall(OPQ, rerank=0) >= recall(plain, rerank=0) - 0.05 — a
broken rotation craters ADC recall toward 0, a correct one ties within a
couple of points. Note the interesting measured fact this run records:
OPQ IMPROVES reconstruction MSE (0.0079 vs 0.0095, extras["opq"]) yet its
raw-ADC top-10 recall can sit a hair BELOW plain PQ on this clustered
synthetic corpus (first run: 0.604 vs 0.622) — lower average quantization
error does not monotonically order per-query top-k discrimination when
the generator's cluster axes are already subspace-aligned (the plain
codebooks are near-optimal per subspace; the learned rotation trades
axis-aligned precision for global MSE). Both tiers recover equally under
rerank (the serving form).

Run EXCLUSIVELY (BENCH_DRIFT discipline). Inputs: scale_data_5m
(scripts/bench_scale_5m.py --gen).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.calibration import (
    assert_quiet_host,
    host_calibration,
)
from filtered_ads_vector_search_spark.operators import topk as TK
from filtered_ads_vector_search_spark.operators.ivfpq import IVFPQIndex
from filtered_ads_vector_search_spark.operators.recall import recall_at_k
from filtered_ads_vector_search_spark.session import get_spark

DATA = os.environ.get("SPARK_GRAFT_5M_DIR", "/root/repo/scale_data_5m")
N_QUERIES = 10_000
N_TRUTH_QUERIES = 1_000
K = 10
N_CENTROIDS, M, N_CODES = 512, 8, 256
NPROBE, RERANK = 32, 100


def main() -> None:
    spark = get_spark(app_name="favs-bench-ivfpq-opq-5m")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {
        "n_centroids": N_CENTROIDS, "m": M, "n_codes": N_CODES,
        "nprobe": NPROBE, "rerank": RERANK,
    }

    extras["calibration_preflight"] = host_calibration()
    for w in assert_quiet_host(extras["calibration_preflight"]):
        print(f"WARNING (pre-flight): {w}", file=sys.stderr)

    emb = spark.read.parquet(f"{DATA}/vectors.parquet")
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
        .cache()
    )
    q_truth = q.filter(F.col("query_id") < N_TRUTH_QUERIES).cache()
    c = emb.filter(F.col("vec_id") >= N_QUERIES).cache()
    extras["n_corpus"] = c.count()
    q.count()

    t0 = time.time()
    truth = TK.knn_scalable(q_truth, c, k=K).cache()
    truth.count()
    timings["truth_exact_1000q"] = round(time.time() - t0, 3)

    indexes: dict[str, IVFPQIndex] = {}
    for tag, opq in (("pq", False), ("opq", True)):
        t0 = time.time()
        indexes[tag] = IVFPQIndex.build(
            c, n_centroids=N_CENTROIDS, m=M, n_codes=N_CODES, seed=42,
            encode_mode="blas", opq=opq,
        )
        timings[f"build_{tag}_s"] = round(time.time() - t0, 3)

    for tag, idx in indexes.items():
        for rr in (0, RERANK):
            label = ("adc_" if rr == 0 else "rerank_") + tag
            dt, rec, samples = float("inf"), None, []
            for _ in range(2):
                t0 = time.time()
                found = idx.search(
                    q, k=K, nprobe=NPROBE, rerank=rr, arrow_adc="decomposed"
                ).persist()
                found.count()
                shot = time.time() - t0
                samples.append(round(shot, 3))
                if rec is None:
                    rec = float(
                        recall_at_k(found, truth, k=K).first()["recall_at_k"]
                    )
                found.unpersist()
                dt = min(dt, shot)
            timings[f"search_{label}_10kq"] = round(dt, 3)
            extras[label] = {
                "seconds": round(dt, 3), "recall": round(rec, 4),
                "samples": samples,
            }

    assert (
        extras["adc_opq"]["recall"] >= extras["adc_pq"]["recall"] - 0.05
    ), (extras["adc_opq"]["recall"], extras["adc_pq"]["recall"])
    extras["adc_recall_delta_opq_minus_pq"] = round(
        extras["adc_opq"]["recall"] - extras["adc_pq"]["recall"], 4
    )

    extras["calibration_postrun"] = host_calibration()
    result = {
        "metric": "ivfpq_opq_5m_search_sec",
        "value": timings["search_rerank_opq_10kq"],
        "unit": "sec",
        "timings": timings,
        "extras": extras,
    }
    print(json.dumps(result))
    sb_path = "/root/repo/SCALE_BENCH_5M.json"
    if os.path.exists(sb_path):
        with open(sb_path) as f:
            sb = json.load(f)
        sb.setdefault("extras", {}).setdefault("opq", {})["ivfpq_opq_5m"] = {
            "timings": timings, **extras
        }
        with open(sb_path, "w") as f:
            json.dump(sb, f)
    spark.stop()


if __name__ == "__main__":
    main()

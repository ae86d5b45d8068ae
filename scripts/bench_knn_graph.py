"""Corpus-scale k-NN graph bench: build the 10-NN graph of 1M x 64d vectors.

The k-NN graph is the structure the reference's CAGRA index IS (GPU graph
build, utils_grid_search.py:586-611; reference build times 24.1-59.0 s at
5M) — this measures our CPU-Spark analog at 1M: trained IVF bucketing +
the cogrouped Arrow kernel (`knn_graph_bucketed(kernel='arrow')`), with
edge recall measured against an exact-scan truth on a 1k-src sample.

Rows published into SCALE_BENCH.json extras["knn_graph_{N/1M}m"] (the 1M
row keyed knn_graph_1m; SPARK_GRAFT_GRAPH_N=5000000 writes knn_graph_5m —
the reference corpus scale, where CAGRA's GPU graph build band is
24.1-59.0 s):
  * ivf_build_s      — trained 1024-centroid IVF over the 1M corpus
  * graph_build_s    — full 10-NN graph via the Arrow cogroup kernel
                       (min-of-2; the graph is the product, so the count()
                       materializes every edge)
  * edges            — edge count (== N x k when every bucket has > k rows)
  * edge_recall_1k   — |approx ∩ exact| / |exact| over 1,000 sampled srcs
                       (exact truth: knn_scalable top-(k+1), self dropped)

Acceptance: edge_recall_1k >= 0.80 (the filtered-search floor; nprobe=2
over 1024 trained cells on the clustered generator keeps most true
neighbors co-bucketed).

Inputs: the 5M anchor parquet (vec_id < 1M slice) — generate with
  python scripts/bench_scale_5m.py --gen
Usage: python scripts/bench_knn_graph.py   (run EXCLUSIVELY — no
concurrent CPU-heavy work; BENCH_DRIFT discipline.)
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
from filtered_ads_vector_search_spark.operators.ann import IVFIndex
from filtered_ads_vector_search_spark.operators.knn_graph import knn_graph_bucketed
from filtered_ads_vector_search_spark.session import get_spark

DATA = os.environ.get("SPARK_GRAFT_5M_DIR", "/root/repo/scale_data_5m")
N = int(os.environ.get("SPARK_GRAFT_GRAPH_N", "1000000"))
N_CENTROIDS = int(os.environ.get("SPARK_GRAFT_GRAPH_C", "1024"))
NPROBE = int(os.environ.get("SPARK_GRAFT_GRAPH_NPROBE", "2"))
# 'blas' is the corpus-scale probe-ranking mode (one DGEMM per scan batch);
# the 'exact' fold's temp traffic is ~24B x n x n_centroids x dim — 31 TB
# at 5M x 4096c, measured round 10 as the entire wall time of the first
# 5M attempt. The graph itself stays the trained/approximate tier either
# way; edge recall below is the contract.
PROBE_MODE = os.environ.get("SPARK_GRAFT_GRAPH_PROBE_MODE", "blas")
K = 10
N_TRUTH_SRC = 1_000
RECALL_FLOOR = 0.80
LABEL = f"{N // 1_000_000}m" if N % 1_000_000 == 0 else str(N)


def main() -> None:
    spark = get_spark(app_name="favs-bench-knn-graph")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {
        "n_corpus": N, "n_centroids": N_CENTROIDS, "nprobe": NPROBE, "k": K,
        "probe_mode": PROBE_MODE,
    }

    extras["calibration_preflight"] = host_calibration()
    for w in assert_quiet_host(extras["calibration_preflight"]):
        print(f"WARNING (pre-flight): {w}", file=sys.stderr)

    corpus = (
        spark.read.parquet(f"{DATA}/vectors.parquet")
        .filter(F.col("vec_id") < N)
        .cache()
    )
    assert corpus.count() == N

    t0 = time.time()
    idx = IVFIndex.build(corpus, n_centroids=N_CENTROIDS, seed=42)
    timings[f"ivf_build_{N_CENTROIDS}c_{LABEL}"] = round(time.time() - t0, 3)

    samples = []
    edges = None
    for _ in range(2):
        t0 = time.time()
        g = knn_graph_bucketed(
            idx, k=K, nprobe=NPROBE, kernel="arrow", probe_mode=PROBE_MODE
        )
        edges = g.count()
        samples.append(round(time.time() - t0, 3))
    timings[f"knn_graph_10nn_{LABEL}_arrow"] = min(samples)
    extras["graph_samples"] = samples
    extras["edges"] = edges

    # edge recall on a 1k-src sample: exact truth via the broadcast-query
    # Arrow scan (top k+1, self dropped — the graph excludes self-edges)
    sample_src = corpus.filter(F.col("vec_id") % (N // N_TRUTH_SRC) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    n_src = sample_src.count()
    t0 = time.time()
    truth = (
        TK.knn_scalable(sample_src, corpus, k=K + 1)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w_t = truth.groupBy("query_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("dist", "neighbor_id"))), 1, K
        ).alias("arr")
    )
    exact_edges = {
        (r["query_id"], s["neighbor_id"])
        for r in w_t.select("query_id", "arr").collect()
        for s in r["arr"]
    }
    timings["exact_truth_1k_src"] = round(time.time() - t0, 3)

    approx_edges = {
        (r["src_id"], r["neighbor_id"])
        for r in knn_graph_bucketed(
            idx, k=K, nprobe=NPROBE, kernel="arrow", probe_mode=PROBE_MODE
        )
        .filter(F.col("src_id") % (N // N_TRUTH_SRC) == 0)
        .collect()
    }
    recall = len(approx_edges & exact_edges) / len(exact_edges)
    extras["n_truth_src"] = n_src
    extras["edge_recall_1k"] = round(recall, 4)
    assert recall >= RECALL_FLOOR, f"edge recall {recall} < {RECALL_FLOOR}"

    extras["reference_anchor"] = {
        "note": "CAGRA GPU graph build at 5M: 24.1-59.0 s (BASELINE.md); "
        f"this row is {LABEL} on CPU local[32] (graph IS the CAGRA index "
        "structure)",
    }
    # let executor teardown / GC quiesce so the postrun probe measures the
    # HOST, not the JVM's dying task threads (a 0.56 s dgemm was recorded
    # when this ran immediately after the final collect)
    time.sleep(10)
    extras["calibration_postrun"] = host_calibration()

    result = {
        "metric": f"knn_graph_{LABEL}_sec",
        "value": timings[f"knn_graph_10nn_{LABEL}_arrow"],
        "unit": "sec",
        "timings": timings,
        "extras": extras,
    }
    print(json.dumps(result))
    sb_path = "/root/repo/SCALE_BENCH.json"
    if os.path.exists(sb_path):
        with open(sb_path) as f:
            sb = json.load(f)
        sb.setdefault("extras", {})[f"knn_graph_{LABEL}"] = {"timings": timings, **extras}
        with open(sb_path, "w") as f:
            json.dump(sb, f)
    spark.stop()


if __name__ == "__main__":
    main()

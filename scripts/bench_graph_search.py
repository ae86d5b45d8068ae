"""Corpus-scale graph-traversal search bench: walk the 1M-corpus 10-NN
graph for a 1k-query batch — the CPU-Spark analog of the reference's
HNSW/CAGRA SEARCH phase (utils_grid_search.py:586-686: fixed-iteration
graph traversal with a bounded best-list), over the graph structure
SCALE_BENCH's knn_graph_1m row builds.

Rows published into SCALE_BENCH.json extras["graph_search_1m"]:
  * ivf_build_s          — trained 1024-centroid IVF (the graph's bucketer
                           AND the seed router)
  * graph_build_s        — the 10-NN graph via the Arrow cogroup kernel
  * search_global_h6_*   — the GLOBAL-entry walk: recorded to document the
                           measured disconnection (a 10-NN graph over a
                           clustered corpus fragments into per-cluster
                           components — recall ~0.002 at 1M, the exact
                           failure mode HNSW's hierarchy and CAGRA's graph
                           optimization exist to fix; no floor asserted)
  * search_routed_h{H}_* — the PRODUCTION walk: ivf_entries seeds each
                           query inside its own nprobe nearest cells, the
                           traversal only refines locally
  * recall_routed_h{H}   — recall@10 vs the exact scan truth

Acceptance: routed recall at the deepest hop count >= 0.8 (the
filtered-search floor discipline). Inputs: the 5M anchor parquet (vec_id <
1M slice) — generate with scripts/bench_scale_5m.py --gen.
Run EXCLUSIVELY (BENCH_DRIFT discipline).
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
from filtered_ads_vector_search_spark.operators.graph_search import (
    graph_search,
    ivf_entries,
)
from filtered_ads_vector_search_spark.operators.knn_graph import knn_graph_bucketed
from filtered_ads_vector_search_spark.operators.recall import recall_at_k

DATA = os.environ.get("SPARK_GRAFT_5M_DIR", "/root/repo/scale_data_5m")
N = int(os.environ.get("SPARK_GRAFT_GS_N", "1000000"))
N_CENTROIDS = 1024
NQ, K, BEAM, N_ENTRY = 1_000, 10, 32, 16
HOPS = (1, 3)
RECALL_FLOOR = 0.80


def main() -> None:
    from filtered_ads_vector_search_spark.session import get_spark

    spark = get_spark(app_name="favs-bench-graph-search")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {
        "n_corpus": N, "n_queries": NQ, "n_centroids": N_CENTROIDS,
        "k": K, "beam": BEAM, "n_entry": N_ENTRY,
    }
    extras["calibration_preflight"] = host_calibration()
    for w in assert_quiet_host(extras["calibration_preflight"]):
        print(f"WARNING (pre-flight): {w}", file=sys.stderr)

    emb = (
        spark.read.parquet(f"{DATA}/vectors.parquet")
        .filter(F.col("vec_id") < N + NQ)
        .cache()
    )
    q = (
        emb.filter(F.col("vec_id") < NQ)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
        .cache()
    )
    c = emb.filter(F.col("vec_id") >= NQ).cache()
    q.count(), c.count()

    t0 = time.time()
    idx = IVFIndex.build(c, n_centroids=N_CENTROIDS, seed=42)
    timings["ivf_build_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    g = knn_graph_bucketed(
        idx, k=K, nprobe=2, kernel="arrow", probe_mode="blas"
    ).persist()
    extras["edges"] = g.count()
    timings["graph_build_s"] = round(time.time() - t0, 3)

    truth = TK.knn_scalable(q, c, k=K).cache()
    truth.count()

    # global-entry walk: recorded, no floor — documents the measured
    # cluster disconnection of a raw k-NN graph at corpus scale
    t0 = time.time()
    found_g = graph_search(g, c, q, k=K, beam=BEAM, n_hops=6, n_entry=N_ENTRY)
    found_g.count()
    timings["search_global_h6_1kq_s"] = round(time.time() - t0, 3)
    extras["recall_global_h6"] = float(
        recall_at_k(found_g, truth, k=K).first()["recall_at_k"]
    )

    # the production walk: coarse-quantizer-routed seeds
    t0 = time.time()
    seeds = ivf_entries(idx, q, nprobe=2, per_cell=4).persist()
    extras["n_seeds"] = seeds.count()
    timings["ivf_entries_s"] = round(time.time() - t0, 3)
    for h in HOPS:
        found = None
        samples = []
        for _ in range(2):
            t0 = time.time()
            found = graph_search(g, c, q, k=K, beam=BEAM, n_hops=h, entries=seeds)
            found.count()
            samples.append(round(time.time() - t0, 3))
        timings[f"search_routed_h{h}_1kq_s"] = min(samples)
        extras[f"search_routed_h{h}_samples"] = samples
        extras[f"recall_routed_h{h}"] = float(
            recall_at_k(found, truth, k=K).first()["recall_at_k"]
        )

    assert extras[f"recall_routed_h{HOPS[-1]}"] >= RECALL_FLOOR, extras
    extras["calibration_postrun"] = host_calibration()

    result = {
        "metric": "graph_search_1m_sec",
        "value": timings[f"search_routed_h{HOPS[-1]}_1kq_s"],
        "unit": "sec",
        "timings": timings,
        "extras": extras,
    }
    print(json.dumps(result))
    sb_path = "/root/repo/SCALE_BENCH.json"
    if os.path.exists(sb_path):
        with open(sb_path) as f:
            sb = json.load(f)
        sb.setdefault("extras", {})["graph_search_1m"] = {
            "timings": timings, **extras
        }
        with open(sb_path, "w") as f:
            json.dump(sb, f)
    spark.stop()


if __name__ == "__main__":
    main()

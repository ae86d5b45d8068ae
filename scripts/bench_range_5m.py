"""Range (radius) search at the 5M anchor: the zero-exchange scan form and
the probed-layout form, 10k queries.

Rows published into SCALE_BENCH_5M.json extras["range_search_5m"]:
  * radius calibration — the radius is the p50 of the sampled 10-NN
    distance (so a typical query's ball holds ~10 rows: the top-k-shaped
    workload expressed as a radius),
  * range_scalable_10kq_s — Arrow-kernel exact scan over the full corpus
    (broadcast 10k-query matrix, one mapInArrow pass, NO merge stage),
  * range_ivf_10kq_s — probed radius search over the written bucketed
    layout (nprobe cells only; FAISS IVF range_search semantics),
  * matches found + per-query mean, and the probed form's match recall vs
    the exact scan (a direct measure of how much of each ball nprobe
    covers at this geometry).

Usage: python scripts/bench_range_5m.py  (exclusive; 5M parquet + the
ivf_index_5m layout must exist — run bench_scale_5m.py first).
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
from filtered_ads_vector_search_spark.operators.range_search import range_scalable
from filtered_ads_vector_search_spark.session import get_spark

DATA = os.environ.get("SPARK_GRAFT_5M_DIR", "/root/repo/scale_data_5m")
N_QUERIES = 10_000
NPROBE = 32


def main() -> None:
    spark = get_spark(app_name="favs-bench-range-5m")
    spark.sparkContext.setLogLevel("ERROR")
    extras: dict = {"n_queries": N_QUERIES, "nprobe": NPROBE}
    extras["calibration_preflight"] = host_calibration()
    for w in assert_quiet_host(extras["calibration_preflight"]):
        print(f"WARNING (pre-flight): {w}", file=sys.stderr)

    emb = spark.read.parquet(f"{DATA}/vectors.parquet")
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
        .cache()
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).cache()
    q.count(), c.count()

    # radius = p50 of the 100-query sampled 10-NN distance: a typical ball
    # holds ~k rows, so the workload is top-k-shaped but radius-expressed
    q100 = q.filter(F.col("query_id") < 100)
    knn = TK.knn_scalable(q100, c, k=10)
    radius = float(
        knn.filter(F.col("rank") == 10)
        .agg(F.expr("percentile(dist, 0.5)").alias("p"))
        .first()["p"]
    )
    extras["radius"] = radius  # full precision: the clustered generator's 10-NN distances are ~1e-7-scale
    extras["radius_rule"] = "p50 of sampled 10-NN distance (100 queries)"

    samples = []
    n_exact = None
    for _ in range(2):
        t0 = time.time()
        n_exact = range_scalable(q, c, radius=radius).count()
        samples.append(round(time.time() - t0, 3))
    extras["range_scalable_10kq_s"] = min(samples)
    extras["range_scalable_samples"] = samples
    extras["exact_matches"] = n_exact
    extras["mean_ball_rows"] = round(n_exact / N_QUERIES, 2)

    loaded = IVFIndex.load(spark, f"{DATA}/ivf_index_5m")
    samples = []
    n_probed = None
    for _ in range(2):
        t0 = time.time()
        n_probed = loaded.range_search(
            q, radius=radius, nprobe=NPROBE, arrow_score=True
        ).count()
        samples.append(round(time.time() - t0, 3))
    extras["range_ivf_10kq_s"] = min(samples)
    extras["range_ivf_samples"] = samples
    extras["probed_matches"] = n_probed
    extras["probed_match_recall"] = round(n_probed / max(1, n_exact), 4)

    extras["calibration_postrun"] = host_calibration()
    print(json.dumps({"metric": "range_search_5m", "extras": extras}))
    sb_path = "/root/repo/SCALE_BENCH_5M.json"
    if os.path.exists(sb_path):
        with open(sb_path) as f:
            sb = json.load(f)
        sb.setdefault("extras", {})["range_search_5m"] = extras
        with open(sb_path, "w") as f:
            json.dump(sb, f)
    spark.stop()


if __name__ == "__main__":
    main()

"""Quick per-row bench harness for optimization iterations: times a
comma-separated subset of bench.py's rows with the SAME methodology
(best-of-N .count() at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS],
session warmup excluded) so a single row can be re-measured in seconds
instead of re-running the whole headline bench.

Usage: python scripts/bench_quick.py row1,row2 [repeats]
       python scripts/bench_quick.py all-registry   # every registry-backed row
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filtered_ads_vector_search_spark import registry
from filtered_ads_vector_search_spark.operators import filters as FL
from filtered_ads_vector_search_spark.operators import topk as TK
from filtered_ads_vector_search_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else []
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark(app_name="favs-bench-quick")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    warm = spark.range(256).withColumn("g", F.col("id") % 8)
    warm.groupBy("g").count().count()

    @F.pandas_udf("double")
    def _warm_udf(x):
        return x * 1.0

    warm.select(_warm_udf(F.col("id").cast("double"))).count()
    warm.mapInPandas(lambda it: it, schema="id long, g long").count()

    timings: dict[str, float] = {}

    def timed(name: str, fn, reps: int) -> None:
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # non-registry rows reproduced from bench.py
    def special(name: str):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        if name == "bitext_mine_ivf":
            from filtered_ads_vector_search_spark.operators.filters import is_query_col
            from filtered_ads_vector_search_spark.operators.mining import mine_bitext

            return lambda: mine_bitext(
                emb.filter(is_query_col(F.col("vec_id"))),
                emb.filter(~is_query_col(F.col("vec_id"))),
                k=4, kernel="ivf", nprobe=12, n_centroids=16,
            ).count()
        if name == "bitext_mine_scalable":
            from filtered_ads_vector_search_spark.operators.filters import is_query_col
            from filtered_ads_vector_search_spark.operators.mining import mine_bitext

            return lambda: mine_bitext(
                emb.filter(is_query_col(F.col("vec_id"))),
                emb.filter(~is_query_col(F.col("vec_id"))),
                k=4, kernel="scalable",
            ).count()
        if name == "semdedup_keep_c32":
            from filtered_ads_vector_search_spark.operators import dedup as DD

            return lambda: DD.semdedup_keep(
                emb, n_clusters=32, max_cos_dist=0.7
            ).count()
        if name == "knn_graph_arrow":
            from filtered_ads_vector_search_spark.operators.ann import IVFIndex
            from filtered_ads_vector_search_spark.operators.knn_graph import (
                knn_graph_bucketed,
            )

            gidx = IVFIndex.build(emb, n_centroids=16, seed=42)
            return lambda: knn_graph_bucketed(
                gidx, k=10, nprobe=4, kernel="arrow"
            ).count()
        if name == "graph_search_beam":
            from filtered_ads_vector_search_spark.operators.ann import IVFIndex
            from filtered_ads_vector_search_spark.operators.graph_search import (
                graph_search,
            )
            from filtered_ads_vector_search_spark.operators.knn_graph import (
                knn_graph_bucketed,
            )

            gidx = IVFIndex.build(emb, n_centroids=16, seed=42)
            gq, gc = TK.split_queries(emb)
            g_edges = knn_graph_bucketed(gidx, k=10, nprobe=4, kernel="arrow").cache()
            g_edges.count()
            return lambda: graph_search(
                g_edges, gc, gq, k=10, beam=32, n_hops=3, n_entry=16
            ).count()
        if name == "knn_exact_window":
            q, c = TK.split_queries(emb)
            q, c = q.cache(), c.cache()
            q.count(), c.count()
            return lambda: TK.knn_window(q, c, k=10).count()
        if name == "knn_exact_scalable":
            q, c = TK.split_queries(emb)
            q, c = q.cache(), c.cache()
            q.count(), c.count()
            return lambda: TK.knn_scalable(q, c, k=10).count()
        if name == "ann_lsh_search":
            from filtered_ads_vector_search_spark.operators.lsh import LSHIndex

            q, c = TK.split_queries(emb)
            q, c = q.cache(), c.cache()
            q.count(), c.count()
            lsh = LSHIndex.build(c, n_bits=4, n_tables=8, metric="cosine", seed=42)
            return lambda: lsh.search(q, k=10).count()
        if name == "ann_ivf_search":
            from filtered_ads_vector_search_spark.operators.ann import IVFIndex

            q, c = TK.split_queries(emb)
            q, c = q.cache(), c.cache()
            q.count(), c.count()
            idx = IVFIndex.build(c, n_centroids=32, seed=42)
            return lambda: idx.search(q, k=10, nprobe=8).count()
        return None

    if names == ["all-registry"]:
        names = [
            "knn_ivfpq_rerank", "knn_ivfpq_decomposed", "pq_codes_blas",
            "range_search_scale", "knn_sq8", "dedup_exact", "dedup_minhash_lsh",
            "dedup_components_star", "dedup_pagerank", "decontaminate_bloom",
            "substr_dup_stats", "doc_chunks_cdc", "lm_perplexity", "dsir_weights",
            "cms_heavy_hitters", "hist_quantiles", "text_stats", "bm25_search",
            "hybrid_rrf", "tpch_q1", "tpch_q5", "qps_windows",
            "latency_percentiles", "pareto_frontier_suppliers",
            "event_window_stats", "user_sessions", "multimodal_meta",
            "embed_pipeline", "knn_ivfpq_opq", "range_filtered_auto",
            "substr_dedup_remove", "line_dedup_corpus",
        ]

    for name in names:
        fn = special(name)
        if fn is None:
            fn = lambda n=name: registry.QUERIES[n](spark, SF_DIR).count()
        reps = 2 if name in ("knn_ivfpq_opq", "range_filtered_auto",
                             "bitext_mine_ivf") else repeats
        timed(name, fn, reps)

    print(json.dumps({"queries": timings, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Dump .explain('formatted') for a list of queries to plans/r11/.

Usage: python scripts/dump_plans.py before q1,q2,...   # -> plans/r11/<q>_before.txt
       python scripts/dump_plans.py after  q1,q2,...   # -> plans/r11/<q>_after.txt

Covers registry-declared queries by name plus the bench-only operator rows
(bitext_mine_ivf, ann_lsh_search, ...) reproduced with bench.py's exact knobs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filtered_ads_vector_search_spark import registry
from filtered_ads_vector_search_spark.operators import topk as TK
from filtered_ads_vector_search_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r11")


def build_df(spark, name: str):
    emb = lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet")  # noqa: E731
    if name == "bitext_mine_ivf":
        from filtered_ads_vector_search_spark.operators.filters import is_query_col
        from filtered_ads_vector_search_spark.operators.mining import mine_bitext

        e = emb()
        return mine_bitext(
            e.filter(is_query_col(F.col("vec_id"))),
            e.filter(~is_query_col(F.col("vec_id"))),
            k=4, kernel="ivf", nprobe=12, n_centroids=16,
        )
    if name == "ann_lsh_search":
        from filtered_ads_vector_search_spark.operators.lsh import LSHIndex

        q, c = TK.split_queries(emb())
        lsh = LSHIndex.build(c, n_bits=4, n_tables=8, metric="cosine", seed=42)
        return lsh.search(q, k=10)
    if name == "ann_ivf_search":
        from filtered_ads_vector_search_spark.operators.ann import IVFIndex

        q, c = TK.split_queries(emb())
        idx = IVFIndex.build(c, n_centroids=32, seed=42)
        return idx.search(q, k=10, nprobe=8)
    if name == "semdedup_keep_c32":
        from filtered_ads_vector_search_spark.operators import dedup as DD

        return DD.semdedup_keep(emb(), n_clusters=32, max_cos_dist=0.7)
    if name == "knn_graph_arrow":
        from filtered_ads_vector_search_spark.operators.ann import IVFIndex
        from filtered_ads_vector_search_spark.operators.knn_graph import (
            knn_graph_bucketed,
        )

        gidx = IVFIndex.build(emb(), n_centroids=16, seed=42)
        return knn_graph_bucketed(gidx, k=10, nprobe=4, kernel="arrow")
    return registry.QUERIES[name](spark, SF_DIR)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="favs-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = build_df(spark, name)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()

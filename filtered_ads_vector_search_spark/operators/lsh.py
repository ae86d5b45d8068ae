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


def _all_dots_col(vec_sql: str, flat_planes: np.ndarray) -> Column:
    """All M = n_tables*n_bits hyperplane dot products in ONE fold, built as
    ONE SQL string.

    The constant plane matrix is embedded transposed (PT[i][m] = plane m,
    element i); a single ``aggregate`` over the element index carries all M
    accumulators: acc[m] += v_i * PT[i][m]. Per-plane accumulation order is
    element-ascending — bitwise identical to folding each plane
    independently, so the DuckDB oracle (one inner-product fold per plane)
    reproduces the same signs.

    Why a SQL string instead of the Column API: the plane matrix is
    dim × M literals, and each ``F.lit`` is a py4j round-trip — building the
    expression tree from Python cost ~2 s of DRIVER time per call site,
    ~10× the actual executor time at bench scale. One ``F.expr`` parse is
    milliseconds, and Catalyst constant-folds the literal matrix once.
    """
    n_planes, dim = flat_planes.shape
    pt = (
        "array("
        + ", ".join(
            "array("
            + ", ".join(repr(float(flat_planes[m][i])) + "D" for m in range(n_planes))
            + ")"
            for i in range(dim)
        )
        + ")"
    )
    return F.expr(
        f"aggregate(sequence(0, {dim - 1}), array_repeat(0.0D, {n_planes}), "
        f"(acc, i) -> zip_with(acc, {pt}[i], "
        f"(a, p) -> a + cast(`{vec_sql}`[i] as double) * p))"
    )


def _buckets_from_dots(dots: Column, n_bits: int, table: int) -> Column:
    """Bucket id for one table from the shared dot array:
    Σ_j 2^j * (dots[table*n_bits + j] > 0)."""
    out = F.lit(0).cast("bigint")
    for j in range(n_bits):
        out = out + F.when(dots[table * n_bits + j] > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def _tag_buckets(
    df: DataFrame, vec_col: str, planes: np.ndarray, prefix: str
) -> DataFrame:
    """Add one bucket column per table. Two-step select: the dot array is a
    non-cheap expression referenced n_tables times, so CollapseProject keeps
    it materialized once per row instead of re-folding per table."""
    n_tables, n_bits, dim = planes.shape
    dots = _all_dots_col(vec_col, planes.reshape(n_tables * n_bits, dim))
    tagged = df.withColumn("_dots", dots)
    return tagged.select(
        *df.columns,
        *[
            _buckets_from_dots(F.col("_dots"), n_bits, t).alias(f"{prefix}{t}")
            for t in range(n_tables)
        ],
    )


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
        df = _tag_buckets(corpus, vec_col, planes, "bucket_")
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

        q = _tag_buckets(queries, "q_vec", self.planes, "qb_")

        def probe_keys(base: Column) -> Column:
            keys = [base]
            for j in range(min(multiprobe, self.n_bits)):
                keys.append(base.bitwiseXOR(F.lit(1 << j)))
            return F.array(*keys)

        # ONE equi-join on the composite (table, bucket) key instead of one
        # join per table: both sides explode their per-table keys (the corpus
        # explode is a narrow n_tables× row fan-out in the same scan — no
        # extra shuffle), so candidate generation is a single broadcast-hash
        # join + a single aggregation, not n_tables joins unioned. At bench
        # scale this cuts n_tables stages of fixed overhead; at 100 TB it is
        # the same single corpus pass.
        def tag_table(t: int):
            # single-arg lambda: a 2-arg lambda would make Spark pass the
            # array INDEX as the second argument, shadowing the table id
            return lambda bk: F.struct(F.lit(t).alias("t"), bk.alias("bk"))

        q_keys = q.select(
            "query_id",
            "q_vec",
            F.explode(
                F.flatten(
                    F.array(
                        *[
                            F.transform(probe_keys(F.col(f"qb_{t}")), tag_table(t))
                            for t in range(self.n_tables)
                        ]
                    )
                )
            ).alias("e"),
        ).select("query_id", "q_vec", F.col("e.t").alias("t"), F.col("e.bk").alias("bk"))
        c_keys = corpus.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("t"), F.col(f"bucket_{t}").alias("bk"))
                        for t in range(self.n_tables)
                    ]
                )
            ).alias("e"),
        ).select(
            "neighbor_id", self.vec_col, F.col("e.t").alias("t"), F.col("e.bk").alias("bk")
        )

        # Distances are computed BEFORE deduplication so the dedup shuffle
        # carries (query_id, neighbor_id, dist) — 8-byte doubles — instead of
        # two full vectors per row. A duplicate candidate (same pair from two
        # tables) costs one redundant JVM-side distance eval, which is far
        # cheaper than shipping vectors through an extra shuffle. groupBy +
        # min gets map-side partial aggregation; dist is identical across
        # duplicates so min() is just dedup.
        d, asc = distance_col(self.metric, F.col("q_vec"), F.col(self.vec_col))
        cands = (
            F.broadcast(q_keys)
            .join(c_keys, ["t", "bk"])
            .select("query_id", "neighbor_id", d.alias("dist"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.min("dist").alias("dist"))
        )

        order = [F.col("dist").asc() if asc else F.col("dist").desc(), F.col("neighbor_id").asc()]
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dist")
        )

    def unpersist(self) -> None:
        self.tagged.unpersist()

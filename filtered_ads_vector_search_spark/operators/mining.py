"""Embedding-pair mining: margin-based bitext mining and hard-negative
mining — the two standard "mine training pairs out of a huge embedding
space" operations of an LLM-data pipeline (beyond the reference's surface;
the reference only SEARCHES one query batch, utils_grid_search.py:890-951).

* ``mine_bitext`` — Artetxe & Schwenk 2019 ("Margin-based Parallel Corpus
  Mining with Multilingual Sentence Embeddings", ACL; the CCMatrix /
  LASER recipe): for source set X and target set Y, a candidate pair
  (x, y) scores

      margin(x, y) = cos(x, y) / (avgk(x)/2 + avgk(y)/2)

  where ``avgk(x)`` is the mean cosine of x's k nearest neighbors in Y
  (and avgk(y) of y's in X) — the "ratio" margin over the "max" retrieval
  strategy: each x's best-margin forward candidate is kept, optionally
  thresholded. The penalty terms demote hub vectors that are close to
  EVERYTHING, which plain cosine thresholds cannot.

* ``mine_hard_negatives`` — the DPR recipe (Karpukhin et al. 2020): per
  query, the top-k nearest corpus rows that are NOT gold positives —
  the negatives that actually move a contrastive loss.

Scale shape (the 100 TB story): both operators are compositions of the
engine's existing exact/ANN top-k physical forms — each direction is one
broadcast-query Arrow scan (``knn_scalable``) or bucketed ANN probe, the
margin penalties are map-combinable per-id means over the k-NN result
(~k rows per id), and the final joins are id equi-joins of id-keyed
relations. Nothing all-pairs, nothing corpus² — the crossJoin form exists
only inside the sf0.01 DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .topk import knn_scalable, knn_window

__all__ = ["mine_bitext", "mine_hard_negatives"]


def _knn_cos(
    queries: DataFrame, corpus: DataFrame, k: int, kernel: str
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos) — cosine similarity top-k via the
    chosen physical form (window = declarative oracle tier, scalable = the
    broadcast-query Arrow scan)."""
    fn = knn_window if kernel == "window" else knn_scalable
    out = fn(queries, corpus, k=k, metric="cosine")
    # distance_col('cosine') is 1 - cos
    return out.withColumn("cos", F.lit(1.0) - F.col("dist")).drop("dist")


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float | None = None,
    kernel: str = "window",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-mined candidate pairs: one row per source vector — its
    best-margin target under the ratio margin — columns
    (src_id, tgt_id, cos, margin), optionally filtered to
    ``margin >= threshold``. Deterministic: candidate order is
    (margin DESC, tgt_id ASC).

    ``kernel='window'`` runs both k-NN directions through the declarative
    window form (the DuckDB-oracle tier); ``'scalable'`` swaps in the
    broadcast-query Arrow scan — identical results (the knn_scalable
    contract), corpus-scale physicals.
    """
    if kernel not in ("window", "scalable"):
        raise ValueError(f"kernel must be 'window' or 'scalable'; got {kernel!r}")
    if k < 1:
        raise ValueError("k must be >= 1")
    s = src.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    t = tgt.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    src_c = src.select(F.col(id_col), F.col(vec_col))
    tgt_c = tgt.select(F.col(id_col), F.col(vec_col))

    # forward: every source's k nearest targets (candidates AND the x-side
    # penalty come from this ONE k-NN job)
    fwd = _knn_cos(s, tgt_c, k, kernel)
    # backward: every target's k nearest sources — the y-side penalty only
    bwd = _knn_cos(t, src_c, k, kernel)

    # order-fixed penalty fold (the bm25_search discipline): per id, sort
    # the k neighbor cosines by neighbor_id and sum ascending — the same
    # doubles in the same order as the DuckDB twin, so the margin argmax
    # is bit-stable across engines (a bare avg() folds in partition order)
    def _pen(knn: DataFrame, alias: str) -> DataFrame:
        return knn.groupBy("query_id").agg(
            (
                F.expr(
                    "aggregate(array_sort(collect_list("
                    "named_struct('i', neighbor_id, 'c', cos))), "
                    "0.0D, (acc, x) -> acc + x.c)"
                )
                / F.count("*")
            ).alias(alias)
        )

    pen_src = _pen(fwd, "avgk_src")
    pen_tgt = _pen(bwd, "avgk_tgt")

    cand = (
        fwd.withColumnRenamed("query_id", "src_id")
        .withColumnRenamed("neighbor_id", "tgt_id")
        .join(pen_src.withColumnRenamed("query_id", "src_id"), "src_id")
        .join(pen_tgt.withColumnRenamed("query_id", "tgt_id"), "tgt_id")
        .withColumn(
            "margin",
            F.col("cos") / (F.col("avgk_src") / 2.0 + F.col("avgk_tgt") / 2.0),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id").asc()
    )
    best = (
        cand.withColumn("best", F.row_number().over(w))
        .filter(F.col("best") == 1)
        .select("src_id", "tgt_id", "cos", "margin")
    )
    if threshold is not None:
        best = best.filter(F.col("margin") >= F.lit(threshold))
    return best


def mine_hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    positives: DataFrame,
    k: int = 5,
    fetch: int | None = None,
    kernel: str = "window",
) -> DataFrame:
    """Per query, the ``k`` nearest corpus rows that are NOT gold positives
    — (query_id, neighbor_id, rank, cos), rank 1..k re-numbered after the
    positives are removed (ties broken by (cos DESC, neighbor_id ASC),
    matching every other top-k in the engine).

    ``positives``: (query_id, pos_id) gold pairs. ``fetch`` is how many
    raw neighbors to pull before the anti-join — it must be at least
    ``k + max positives per query`` for every query to keep k negatives;
    default ``k + 1 + max per-query positive count`` computed with one
    tiny aggregate over ``positives`` (id-keyed, never corpus-sized).

    queries: (query_id, q_vec); corpus: (vec_id, embedding).
    """
    if kernel not in ("window", "scalable"):
        raise ValueError(f"kernel must be 'window' or 'scalable'; got {kernel!r}")
    if fetch is None:
        row = positives.groupBy("query_id").count().agg(F.max("count")).first()
        fetch = k + int(row[0] or 0)
    if fetch < k:
        raise ValueError(f"fetch={fetch} cannot be < k={k}")
    raw = _knn_cos(queries, corpus, fetch, kernel)
    negs = raw.join(
        positives.select(
            F.col("query_id"), F.col("pos_id").alias("neighbor_id")
        ),
        ["query_id", "neighbor_id"],
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )

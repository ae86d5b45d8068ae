"""Graph-traversal ANN search — beam search over the corpus k-NN graph.

The reference's HNSW and CAGRA indexes SEARCH by walking a neighborhood
graph: start from entry points, repeatedly score the neighbors of the
current best candidates, keep a bounded best-list, stop after a fixed
number of expansions (CAGRA's fixed-iteration greedy search; HNSW's
ef-bounded best-first walk — utils_grid_search.py:586-686 builds those
indexes, cpu_search/gpu_search walk them). The engine already BUILDS the
graph those indexes are made of (operators/knn_graph.py — CAGRA's index IS
the k-NN graph); this module adds the missing half: the traversal search,
as a statically-unrolled chain of DataFrame joins.

``graph_search(graph, corpus, queries)``: per query —
  1. seed a frontier with ``n_entry`` deterministic entry nodes (the
     md5-hash pick of build_fixed — CAGRA seeds randomly; the hash pick is
     the engine's reproducible analog, and the whole walk becomes
     SQL-expressible over the exact graph);
  2. ``n_hops`` times: expand the frontier along the graph's out-edges,
     union with the frontier, dedup per (query, node), score every
     candidate against the query, keep the ``beam`` best (dist ASC,
     node_id ASC — the engine-wide tie-break);
  3. return the top ``k`` of the final beam as
     (query_id, neighbor_id, rank, dist).

Greedy graph search converges because the k-NN graph is navigable: each
hop moves the beam monotonically closer (the beam never worsens — the
union keeps current members). Fixed ``n_hops`` bounds the plan statically
(no iterative driver loop, no checkpointing) — the CAGRA policy, not
HNSW's dynamic stop, which a declarative plan cannot express without a
driver-side convergence loop.

Scale shape (the 100 TB story): the frontier is |Q| x beam rows and every
per-hop relation is frontier-sized (|Q| x beam x degree after expansion) —
NEVER corpus-sized. Each hop broadcasts the frontier against the streaming
edge table (equi-join on src_id) and broadcasts the expanded candidate set
against the streaming corpus (equi-join on the id) — the corpus and the
edge relation are only ever scanned, once per hop, with no shuffle of
either. Candidate distances are recomputed per hop instead of carried
through the union (stateless plan; the rescore is one expression over
frontier-sized rows — at |Q|=10k, beam=32, degree=10 that is 3.2M rows per
hop, trivially cheaper than carrying scored/unscored unions through
outer-join plumbing). An edge layout bucketed on src_id co-locates the
expansion join for free, the same property the IVF layouts get from
partitionBy at write time.

Approximation contract: recall is governed by (n_entry, beam, n_hops) and
the graph's degree — exact when the graph is exact, beam >= corpus, and
n_hops >= graph diameter. The fixed-entry exact-graph configuration is
fully value-oracled in DuckDB (registry: graph_search_fixed, unrolled-CTE
twin); the trained configuration ships under a per-query recall-floor
contract (graph_search_recall), the ann_ivf discipline.

Reference parity: cpu_search HNSW ef-search / gpu_search CAGRA
itopk-bounded traversal (utils_grid_search.py:586-686, 890-951).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .topk import Metric, distance_col

__all__ = ["fixed_entry_nodes", "graph_search"]


def fixed_entry_nodes(
    corpus: DataFrame, n_entry: int, id_col: str = "vec_id"
) -> DataFrame:
    """The ``n_entry`` corpus ids with the smallest ``(md5(id), id)`` — the
    deterministic, SQL-expressible entry-point pick (same discipline as
    IVFIndex.build_fixed's centroid pick). Returns one column ``node_id``."""
    return (
        corpus.select(F.col(id_col))
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .limit(n_entry)
        .select(F.col(id_col).alias("node_id"))
    )


def graph_search(
    graph: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    beam: int = 16,
    n_hops: int = 3,
    n_entry: int = 4,
    metric: Metric = "sqeuclidean",
    entries: DataFrame | None = None,
    symmetric: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Beam search over ``graph`` (an edge table (src_id, neighbor_id, ...)
    as built by knn_graph_window / knn_graph_bucketed): per query the top
    ``k`` of the final beam, as (query_id, neighbor_id, rank, dist).

    ``queries``: (query_id, q_vec). ``entries`` overrides the entry-point
    relation (one ``node_id`` column — e.g. IVF-routed seeds); default is
    the deterministic ``fixed_entry_nodes`` hash pick.

    ``symmetric=True`` traverses the graph as if undirected — each hop also
    walks k-NN edges BACKWARD (HNSW links neighbors bidirectionally; CAGRA
    augments reverse edges before its traversal, and a raw directed k-NN
    graph is measurably non-navigable: hub nodes have high in-degree and no
    out-path back). Implemented as a union-all of the reversed edge
    relation — NO distinct and no shuffle (duplicate candidate pairs are
    collapsed by the per-(query, node) dedup each hop already does); the
    cost is one extra streaming scan of the edge table per hop.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if beam < k:
        raise ValueError(f"beam ({beam}) must be >= k ({k})")
    if n_hops < 0:
        raise ValueError("n_hops must be >= 0")
    if entries is None:
        if n_entry < 1:
            raise ValueError("n_entry must be >= 1")
        entries = fixed_entry_nodes(corpus, n_entry, id_col=id_col)

    edges = graph.select(
        F.col("src_id").alias("node_id"), F.col("neighbor_id").alias("_dst")
    )
    if symmetric:
        edges = edges.unionByName(
            graph.select(
                F.col("neighbor_id").alias("node_id"),
                F.col("src_id").alias("_dst"),
            )
        )
    nodes = corpus.select(F.col(id_col).alias("node_id"), F.col(vec_col))
    q = queries.select("query_id", "q_vec")

    d, asc = distance_col(metric, F.col("q_vec"), F.col(vec_col))
    order = [
        F.col("dist").asc() if asc else F.col("dist").desc(),
        F.col("node_id").asc(),
    ]
    w = Window.partitionBy("query_id").orderBy(*order)

    def scored_beam(cand: DataFrame) -> DataFrame:
        # (query_id, node_id) -> the beam best, scored. The candidate set
        # is frontier-sized: broadcast it against the streaming corpus so
        # the corpus never shuffles; queries are the tiny side of the final
        # join.
        return (
            F.broadcast(cand).join(nodes, "node_id")
            .join(F.broadcast(q), "query_id")
            .withColumn("dist", d)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= beam)
            .select("query_id", "node_id", "dist", "_r")
        )

    # hop 0: the seeded frontier (every query starts at the same
    # deterministic entries; tiny crossJoin |Q| x n_entry)
    frontier = scored_beam(
        q.select("query_id").crossJoin(F.broadcast(entries))
    )
    for _ in range(n_hops):
        # each hop references the frontier TWICE (as the expansion source
        # and as a union member) — without persist the lazy subtree doubles
        # per hop (2^n_hops plan/execution blowup, measured as 240 s for a
        # 6-hop search of 45 queries). persist() maps both references to
        # one InMemoryRelation: linear plans, each hop computed once. The
        # cached relation is |Q| x beam rows — bounded and tiny at any
        # corpus scale.
        frontier = frontier.persist()
        expanded = (
            F.broadcast(frontier.select("query_id", "node_id"))
            .join(edges, "node_id")
            .select("query_id", F.col("_dst").alias("node_id"))
        )
        cand = (
            frontier.select("query_id", "node_id")
            .unionByName(expanded)
            .distinct()
        )
        frontier = scored_beam(cand)

    return (
        frontier.filter(F.col("_r") <= k)
        .select(
            "query_id",
            F.col("node_id").alias("neighbor_id"),
            F.col("_r").alias("rank"),
            "dist",
        )
    )

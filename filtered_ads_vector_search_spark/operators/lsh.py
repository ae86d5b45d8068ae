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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V
from .topk import Metric, distance_col, topk_agg

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
    return F.expr(_all_dots_sql(vec_sql, flat_planes))


def _all_dots_sql(vec_sql: str, flat_planes: np.ndarray) -> str:
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
    return (
        f"aggregate(sequence(0, {dim - 1}), array_repeat(0.0D, {n_planes}), "
        f"(acc, i) -> zip_with(acc, {pt}[i], "
        f"(a, p) -> a + cast(`{vec_sql}`[i] as double) * p))"
    )


def _buckets_sql(dots_sql: str, n_bits: int, n_tables: int) -> str:
    """All-table bucket array from a dots expression, with the dots fold
    evaluated ONCE per row via the 1-element-array let binding (a lambda var
    can be referenced many times; a projected column referenced once gets
    inlined by CollapseProject and then re-evaluated per lambda element)."""
    bucket = (
        f"aggregate(sequence(0, {n_bits - 1}), 0L, (acc, j) -> "
        f"acc + IF(d[t * {n_bits} + j] > 0D, shiftleft(1L, j), 0L))"
    )
    return (
        f"transform(array({dots_sql}), d -> "
        f"transform(sequence(0, {n_tables - 1}), t -> {bucket}))[0]"
    )


def _query_buckets_fold(Q: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n_queries, n_tables) int64 bucket keys computed driver-side with the
    SAME element-ascending dot fold as `_all_dots_sql` (acc starts at 0.0,
    adds v_i * plane_i in ascending element order, one scalar chain per
    (query, plane)) — the signs, and therefore the buckets, are bit-identical
    to the expression path's. The elementwise numpy loop vectorizes over
    (queries x planes) but each scalar accumulator sees the identical IEEE
    operation sequence."""
    n_tables, n_bits, dim = planes.shape
    P = planes.reshape(n_tables * n_bits, dim)
    acc = np.zeros((Q.shape[0], n_tables * n_bits), dtype=np.float64)
    for i in range(dim):  # ascending-element left fold
        acc += Q[:, i, None] * P[None, :, i]
    bits = acc > 0.0
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    return (bits.reshape(len(Q), n_tables, n_bits) * weights[None, None, :]).sum(
        axis=2
    )


def _norm_fold(M: np.ndarray) -> np.ndarray:
    """Per-row sqrt(sum x_i^2) with the element-ascending left fold —
    bit-identical to `vec_norm` (same accumulation order, and IEEE sqrt is
    correctly rounded in both numpy and the JVM)."""
    acc = np.zeros(M.shape[0], dtype=np.float64)
    for el in range(M.shape[1]):  # ascending-element left fold
        acc += M[:, el] * M[:, el]
    return np.sqrt(acc)


def _dots_tiled(Qc: np.ndarray, VT: np.ndarray) -> np.ndarray:
    """(q_chunk x n) inner products as the element-ascending left fold, over
    corpus-column tiles (the `_sqeuclidean_bucket_scorer` tiling: each
    (q_chunk x tile) temporary stays cache-resident; tiling partitions
    columns, never the fold order, so each scalar accumulates ascending from
    0.0 — bit-identical to `vec_inner_product`)."""
    d, n = VT.shape
    sc = np.empty((Qc.shape[0], n), dtype=np.float64)
    for t0 in range(0, n, 4096):
        t1 = min(t0 + 4096, n)
        blk = np.zeros((Qc.shape[0], t1 - t0), dtype=np.float64)
        for el in range(d):  # ascending-element left fold
            blk += Qc[:, el, None] * VT[el, t0:t1][None, :]
        sc[:, t0:t1] = blk
    return sc


def _sqdiff_tiled(Qc: np.ndarray, VT: np.ndarray) -> np.ndarray:
    """(q_chunk x n) squared-euclidean distances, element-ascending left fold
    over column tiles — bit-identical to `vec_sqeuclidean` (the same recipe
    as ann._sqeuclidean_bucket_scorer)."""
    d, n = VT.shape
    sc = np.empty((Qc.shape[0], n), dtype=np.float64)
    for t0 in range(0, n, 4096):
        t1 = min(t0 + 4096, n)
        blk = np.zeros((Qc.shape[0], t1 - t0), dtype=np.float64)
        for el in range(d):  # ascending-element left fold
            diff = Qc[:, el, None] - VT[el, t0:t1][None, :]
            blk += diff * diff
        sc[:, t0:t1] = blk
    return sc


def _tag_buckets(
    df: DataFrame, vec_col: str, planes: np.ndarray, prefix: str
) -> DataFrame:
    """Add one bucket column per table. The whole dots->buckets pipeline is
    ONE parsed SQL expression (per-literal Column construction costs a py4j
    round-trip each — driver time that dwarfs executor time at small scale),
    let-bound so the plane fold runs once per row; the two-step select keeps
    the bucket array materialized across its n_tables extraction references
    (CollapseProject only preserves multiply-referenced projections)."""
    n_tables, n_bits, dim = planes.shape
    buckets = _buckets_sql(
        _all_dots_sql(vec_col, planes.reshape(n_tables * n_bits, dim)), n_bits, n_tables
    )
    return df.withColumn("_buckets", F.expr(buckets)).select(
        *df.columns,
        *[F.col("_buckets")[t].alias(f"{prefix}{t}") for t in range(n_tables)],
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
        """Persist the LSH layout: the tagged corpus partitioned by the first
        table's bucket (searches prune files on the primary key; the other
        tables' keys stay as columns) plus a one-row meta table carrying the
        hyperplanes, so `load` restores a searchable index and
        `append_to_layout` can tag new vectors identically."""
        self.tagged.write.mode("overwrite").partitionBy("bucket_0").parquet(
            f"{path}/tagged"
        )
        spark = self.tagged.sparkSession
        meta = spark.createDataFrame(
            [
                (
                    [float(x) for x in self.planes.reshape(-1)],
                    int(self.n_bits),
                    int(self.n_tables),
                    int(self.planes.shape[2]),
                    str(self.metric),
                    self.id_col,
                    self.vec_col,
                )
            ],
            "planes array<double>, n_bits int, n_tables int, dim int, "
            "metric string, id_col string, vec_col string",
        )
        meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @staticmethod
    def load(spark, path: str) -> "LSHIndex":
        """Open a written LSH layout (base directory plus any per-batch
        appends). Search predicates on bucket_0 prune partition directories."""
        from .ann import _read_layout

        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        planes = np.array(meta["planes"], dtype=np.float64).reshape(
            meta["n_tables"], meta["n_bits"], meta["dim"]
        )
        return LSHIndex(
            tagged=_read_layout(spark, path, "tagged"),
            planes=planes,
            metric=meta["metric"],
            n_bits=meta["n_bits"],
            n_tables=meta["n_tables"],
            build_seconds=0.0,
            id_col=meta["id_col"],
            vec_col=meta["vec_col"],
        )

    @staticmethod
    def append_to_layout(
        spark, path: str, new_rows: DataFrame, batch_id: int | None = None
    ) -> int:
        """Incremental add: tag NEW vectors with the layout's stored
        hyperplanes (LSH needs no retraining — the planes ARE the index) and
        append them. Same append semantics as IVFIndex.append_to_layout:
        ``batch_id=None`` appends into the base directories; a ``batch_id``
        writes an idempotent overwrite-mode batch directory so foreachBatch
        replays cannot duplicate vectors. Returns rows appended."""
        from .ann import _batch_root

        idx = LSHIndex.load(spark, path)
        layout_cols = [
            c for c in idx.tagged.columns if not c.startswith("bucket_")
        ]
        missing = [c for c in layout_cols if c not in new_rows.columns]
        if missing:
            raise ValueError(
                f"new_rows lacks columns the written layout carries: {missing} "
                f"(layout schema: {layout_cols})"
            )
        tagged = _tag_buckets(
            new_rows.select(*layout_cols), idx.vec_col, idx.planes, "bucket_"
        )
        n = tagged.count()
        if batch_id is None:
            tagged.write.mode("append").partitionBy("bucket_0").parquet(
                f"{path}/tagged"
            )
        else:
            tagged.write.mode("overwrite").partitionBy("bucket_0").parquet(
                f"{_batch_root(path, batch_id)}/tagged"
            )
        return n

    @staticmethod
    def compact_layout(spark, path: str, files_per_bucket: int = 1) -> int:
        """Fold per-batch appends into the base tagged layout and bound files
        per bucket_0 directory (see ann._compact_layout for caveats)."""
        from .ann import _compact_layout

        idx = LSHIndex.load(spark, path)
        return _compact_layout(
            spark,
            path,
            "tagged",
            id_col=idx.id_col,
            drop_cols=(idx.vec_col,),
            files_per_bucket=files_per_bucket,
            bucket_col="bucket_0",
            write_sidecars=False,  # LSH search has no selectivity policy
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        predicate: Column | None = None,
        multiprobe: int = 0,
        kernel: str = "arrow",
    ) -> DataFrame:
        """Filtered approximate top-k. Candidates = union over tables of
        bucket-equal rows, deduplicated, exact-reranked. Predicate applies
        BEFORE candidate selection (filter-then-top-k).

        ``multiprobe=m`` also probes every bucket within hamming distance 1
        of the query's bucket in the first m bit positions (the standard
        multi-probe LSH trick): recall of many tables at the candidate cost
        of few. Probe keys explode on the (tiny, broadcast) query side only.

        ``kernel="arrow"`` (default) scores candidates inside a
        ``mapInArrow`` numpy kernel: the corpus streams once (no n_tables
        row fan-out), each (table, bucket) group is scored as a matrix with
        the element-ascending left folds — BIT-IDENTICAL doubles to the
        expression forms (`test_lsh_arrow_bitwise_equals_expr`), same
        (dist, neighbor_id) tie-break, and only per-group top-k partials
        reach the shuffle instead of every candidate pair (guide §4.2 /
        §2.3). ``kernel="expr"`` keeps the interpreted expression path (the
        declarative twin the DuckDB oracle mirrors); metrics without an
        Arrow fold (hamming) always take it.
        """
        if kernel not in ("arrow", "expr"):
            raise ValueError(f"kernel must be 'arrow' or 'expr'; got {kernel!r}")
        corpus = self.tagged
        if predicate is not None:
            corpus = corpus.filter(predicate)
        T, B = self.n_tables, self.n_bits
        m = min(multiprobe, B)
        if kernel == "arrow" and self.metric in (
            "cosine", "sqeuclidean", "inner_product"
        ):
            return self._search_arrow(corpus, queries, k, m)
        dim = self.planes.shape[2]

        # ONE equi-join on the composite (table, bucket) key instead of one
        # join per table: both sides explode their per-table keys (the corpus
        # explode is a narrow n_tables× row fan-out in the same scan — no
        # extra shuffle), so candidate generation is a single broadcast-hash
        # join, not n_tables joins unioned. The whole query-side key pipeline
        # (dots -> buckets -> multiprobe bit-flips -> (t, bucket) structs) is
        # ONE parsed SQL expression: per-Column construction would cost a
        # py4j round-trip each, which at bench scale is more driver time than
        # the executors spend on the query.
        # bs = let-bound per-table bucket array (plane fold runs once/row)
        probe = (
            f"concat(array(bs[t]), "
            f"transform(sequence(0, {m - 1}), j -> bs[t] ^ shiftleft(1L, j)))"
            if m > 0
            else "array(bs[t])"
        )
        buckets = _buckets_sql(
            _all_dots_sql("q_vec", self.planes.reshape(T * B, dim)), B, T
        )
        key_expr = (
            f"explode(flatten(transform(array({buckets}), bs -> "
            f"flatten(transform(sequence(0, {T - 1}), t -> "
            f"transform({probe}, bk -> named_struct('t', t, 'bk', bk)))))))"
        )
        # Cosine: hoist the per-row norm folds below the join (see
        # vec_cosine_distance_prenorm) — the query norm is computed on the
        # tiny broadcast side, the corpus norm ONCE per corpus row in a
        # projection UNDER the explode (the Generate keeps its child
        # projection, so the fan-out only replicates the value) — candidate
        # scoring then evaluates one interpreted fold per pair instead of
        # three. Bit-identical distances.
        q_extra = c_extra = ()
        if self.metric == "cosine":
            queries = queries.select(
                "query_id", "q_vec", V.vec_norm(F.col("q_vec")).alias("_qn")
            )
            corpus = corpus.select(
                *corpus.columns, V.vec_norm(F.col(self.vec_col)).alias("_cn")
            )
            q_extra, c_extra = ("_qn",), ("_cn",)
        q_keys = queries.select(
            "query_id", "q_vec", *q_extra, F.expr(key_expr).alias("e")
        ).select(
            "query_id", "q_vec", *q_extra,
            F.col("e.t").alias("t"), F.col("e.bk").alias("bk"),
        )
        c_struct = ", ".join(
            f"named_struct('t', {t}, 'bk', bucket_{t})" for t in range(T)
        )
        c_keys = corpus.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col),
            *c_extra,
            F.expr(f"explode(array({c_struct}))").alias("e"),
        ).select(
            "neighbor_id", self.vec_col, *c_extra,
            F.col("e.t").alias("t"), F.col("e.bk").alias("bk"),
        )

        # Distances are computed BEFORE deduplication so the only shuffle
        # carries (query_id, dist, neighbor_id) — no vectors. Dedup + top-k
        # fuse into ONE aggregation: a duplicate candidate (same pair from
        # two tables) is a bit-identical struct, so array_distinct IS the
        # dedup, and sort+slice replaces the row_number window — one shuffle
        # total instead of groupBy + window (two). Per-query state is the
        # candidate set (corpus/2^n_bits × n_tables expected), the same rows
        # the window form would sort — sized by n_bits at build time.
        if self.metric == "cosine":
            d, asc = (
                V.vec_cosine_distance_prenorm(
                    F.col("q_vec"), F.col(self.vec_col),
                    F.col("_qn"), F.col("_cn"),
                ),
                True,
            )
        else:
            d, asc = distance_col(self.metric, F.col("q_vec"), F.col(self.vec_col))
        pairs = (
            F.broadcast(q_keys)
            .join(c_keys, ["t", "bk"])
            .select("query_id", "neighbor_id", d.alias("dist"))
        )
        return topk_agg(pairs, k, asc=asc, dedup=True)

    def _search_arrow(
        self, corpus: DataFrame, queries: DataFrame, k: int, m: int
    ) -> DataFrame:
        """Arrow-batched LSH search (guide §4.2: distribution/shuffles in
        Spark, batch math in numpy inside the boundary).

        Query side: bounded collect, buckets (+ the first-``m`` multiprobe
        bit flips) computed driver-side with the same element-ascending dot
        fold as the tagging expression (`_query_buckets_fold` — bit-identical
        signs), broadcast as (qids, Q, query norms, per-table bucket->query
        maps). Corpus side: ONE pass, no explode — the kernel groups each
        Arrow batch by every table's stored bucket column, scores each
        probed (table, bucket) group as a (queries x rows) matrix with the
        element-ascending folds (bit-identical doubles to the expression
        path; fold order is batch-shape-invariant, so a pair matched by two
        tables scores identically and `topk_agg(dedup=True)`'s
        array_distinct collapses it, exactly as on the expression path), and
        emits the exact per-group top-k SET under the (dist, neighbor_id)
        tie-break (`_topk_set_mask` over id-ascending columns) — a pair in
        the global top-k beats < k pairs globally, hence < k within any of
        its groups, so per-group partials lose nothing. Zero-norm rows
        (cosine): the expression path's nullif yields a NULL dist; the
        kernel emits every such candidate pair with a NULL dist (never
        top-k-cut, so the global merge sees the identical relation
        regardless of how nulls order)."""
        from .topk import (
            MAX_BROADCAST_QUERIES,
            _arrow_vectors,
            _topk_set_mask,
        )

        spark = corpus.sparkSession
        T = self.n_tables
        metric = self.metric
        q_rows = (
            queries.select("query_id", "q_vec")
            .limit(MAX_BROADCAST_QUERIES + 1)
            .collect()
        )
        if len(q_rows) > MAX_BROADCAST_QUERIES:
            raise ValueError(
                f"LSHIndex.search collects the query matrix; got "
                f"> {MAX_BROADCAST_QUERIES} queries — shard the batch upstream"
            )
        if not q_rows:
            return spark.createDataFrame(
                [], "query_id bigint, neighbor_id bigint, rank int, dist double"
            )
        qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
        Q = np.array([list(r["q_vec"]) for r in q_rows], dtype=np.float64)
        qb = _query_buckets_fold(Q, self.planes)
        maps: list[dict[int, np.ndarray]] = []
        for t in range(T):
            mp: dict[int, list[int]] = {}
            for qi in range(len(qids)):
                b = int(qb[qi, t])
                mp.setdefault(b, []).append(qi)
                for j in range(m):  # multiprobe: hamming-1 flips, first m bits
                    mp.setdefault(b ^ (1 << j), []).append(qi)
            maps.append({b: np.array(v, dtype=np.int64) for b, v in mp.items()})
        qn = _norm_fold(Q) if metric == "cosine" else None
        bc = spark.sparkContext.broadcast((qids, Q, qn, maps))
        vec_col = self.vec_col
        pruned = corpus.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_v"),
            *[F.col(f"bucket_{t}").alias(f"_b{t}") for t in range(T)],
        )

        def score(batches):
            import pyarrow as pa

            qids_, Q_, qn_, maps_ = bc.value
            n_tables = len(maps_)
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                nids = (
                    batch.column(batch.schema.get_field_index("neighbor_id"))
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                mat = _arrow_vectors(batch, "_v")
                cn = _norm_fold(mat) if metric == "cosine" else None
                for t in range(n_tables):
                    mp = maps_[t]
                    pids = (
                        batch.column(batch.schema.get_field_index(f"_b{t}"))
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    )
                    g_order = np.argsort(pids, kind="stable")
                    g_pids = pids[g_order]
                    bounds = np.flatnonzero(
                        np.r_[True, g_pids[1:] != g_pids[:-1], True]
                    )
                    for s0, s1 in zip(bounds[:-1], bounds[1:]):
                        qsel = mp.get(int(g_pids[s0]))
                        if qsel is None or len(qsel) == 0:
                            continue
                        sel = g_order[s0:s1]
                        ids = nids[sel]
                        order = np.argsort(ids)  # ascending id => exact tie-break
                        ids = ids[order]
                        VT = np.ascontiguousarray(mat[sel][order].T)
                        cnb = cn[sel][order] if cn is not None else None
                        n = len(ids)
                        kk = min(k, n)
                        out_q: list[np.ndarray] = []
                        out_n: list[np.ndarray] = []
                        out_d: list[np.ndarray] = []
                        out_z: list[np.ndarray] = []
                        for c0 in range(0, len(qsel), 256):  # bound (q x n)
                            c1 = min(c0 + 256, len(qsel))
                            qs = qsel[c0:c1]
                            Qc = Q_[qs]
                            if metric == "cosine":
                                dots = _dots_tiled(Qc, VT)
                                denom = qn_[qs][:, None] * cnb[None, :]
                                zero = denom == 0.0
                                with np.errstate(
                                    divide="ignore", invalid="ignore"
                                ):
                                    sc = 1.0 - dots / denom
                                dsel = np.where(zero, np.inf, sc)
                                mask = _topk_set_mask(dsel, kk) | zero
                            elif metric == "sqeuclidean":
                                sc = _sqdiff_tiled(Qc, VT)
                                zero = None
                                mask = _topk_set_mask(sc, kk)
                            else:  # inner_product: larger = better
                                sc = _dots_tiled(Qc, VT)
                                zero = None
                                mask = _topk_set_mask(-sc, kk)
                            rows_i, cols = np.nonzero(mask)
                            out_q.append(qids_[qs[rows_i]])
                            out_n.append(ids[cols])
                            out_d.append(sc[rows_i, cols])
                            out_z.append(
                                zero[rows_i, cols]
                                if zero is not None
                                else np.zeros(len(rows_i), dtype=bool)
                            )
                        zmask = np.concatenate(out_z)
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(np.concatenate(out_q), type=pa.int64()),
                                pa.array(np.concatenate(out_n), type=pa.int64()),
                                pa.array(
                                    np.concatenate(out_d),
                                    type=pa.float64(),
                                    mask=zmask if zmask.any() else None,
                                ),
                            ],
                            names=["query_id", "neighbor_id", "dist"],
                        )

        pairs = pruned.mapInArrow(
            score, "query_id long, neighbor_id long, dist double"
        )
        return topk_agg(pairs, k, asc=(metric != "inner_product"), dedup=True)

    def unpersist(self) -> None:
        self.tagged.unpersist()

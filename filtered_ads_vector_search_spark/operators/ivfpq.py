"""IVF + PQ composed tier — the FAISS-style IVFPQ / cuVS IVF-PQ analog.

The reference pairs a coarse index with a quantized corpus for billion-scale
search (its CAGRA/HNSW indexes search quantized corpora loaded by
utils_grid_search.py:342-420); the classic CPU-scale composition is IVFPQ:
coarse-prune buckets with an inverted file, then score only PQ CODES inside
the probed buckets via a per-(query, bucket) lookup table (ADC), optionally
exact-reranking the short ADC list. This module composes the two existing
tiers (operators/ann.py IVF, operators/pq.py ADC) into that one operator.

Codes quantize RESIDUALS (vector - coarse centroid), exactly as FAISS IVFPQ
does: within a bucket the residual spread is the cluster's noise scale, so
the same codebook budget resolves distances that absolute-vector codes blur
into one value — measured on the 1M-vector scale corpus, absolute codes gave
recall 0.10 at rerank=100 where residual codes give ~1.0. (``residual=False``
keeps the absolute variant for comparison.)

Scale story — the 100 TB search path this engine would actually run:
* the index artifact is (id, partition_id, codes): ~m bytes/row instead of
  dim x 4 — a 100 TB fp32 corpus becomes ~1.5 TB of codes, written bucketed
  by partition_id so a probe scan reads nprobe/n_centroids of THAT;
* the probe list carries one LUT per (query, probed bucket) — m x n_codes
  doubles x queries x nprobe rows, always broadcast; the coded corpus only
  ever streams through one equi-join on its bucket key;
* per-row ADC cost is an m-step fold of two array lookups — as an
  expression (the DuckDB-oracle tier; HOFs run interpreted) or, for large
  query batches, the bit-identical Arrow kernel (``search(arrow_adc=True)``,
  ~6x measured at 1000 queries x 1M rows); full vectors are touched only by
  the (optional) rerank of ~R rows per query.

Like the IVF and PQ tiers, two build flavors: ``build_fixed`` (hash-picked
centroids + arithmetic codebooks — the ENTIRE prune->encode->ADC->rerank
path is DuckDB-oracle-checkable) and ``build`` (trained KMeans coarse +
per-subspace Lloyd's codebooks fitted on residual samples — the quality
tier, pytest-verified recall floors).
"""

from __future__ import annotations

import itertools
import os
import time
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ann import (
    IVFIndex,
    _arrow_bucket_topk,
    _batch_root,
    _compact_layout,
    _estimate_selectivity,
    _read_layout,
    _read_sidecar,
    _sample_fraction,
    _sample_gate,
    _write_sidecars,
)
from .pq import (
    Codebooks,
    _validate,
    fixed_codebooks,
    opq_train,
    pq_encode_with_codes_arrow,
    pq_train,
    rotate_vecs,
)
from .topk import knn_window

def _adc_bucket_scorer(Q, qsel, b, codes, extra):
    """ADC via a per-bucket residual LUT: LUT entries accumulate subspace
    elements in ascending order from 0.0 and ADC sums LUT cells in
    ascending j — the same IEEE doubles as the 0.0D-seeded ascending
    aggregate folds of the expression form."""
    cent, CB, residual = extra[:3]
    m, nc, sd = CB.shape
    qr = Q[qsel] - cent[b][None, :] if residual else Q[qsel]
    S = qr.reshape(len(qsel), m, sd)
    lut = np.zeros((len(qsel), m, nc), dtype=np.float64)
    for el in range(sd):  # ascending-element left fold
        d = S[:, :, None, el] - CB[None, :, :, el]
        lut += d * d

    def chunk(c0, c1):
        lc = lut[c0:c1]
        sc = lc[:, 0, codes[:, 0]]
        for j in range(1, m):  # ascending-j left fold
            sc = sc + lc[:, j, codes[:, j]]
        return sc

    return chunk


# (query-LUT, codebook-norms) payloads per Python worker — the decomposed
# scorer's T3 is bucket-INDEPENDENT, so every probed bucket (and every TASK
# of the same search in a reused worker) reuses it. Bounded as a TWO-entry
# token-keyed LRU: a single-entry clear() thrashed when two DISTINCT
# concurrent searches interleaved tasks in one reused worker (the replay
# harness runs mixed workloads) — each search evicted the other per bucket.
# Two entries cover that interleave while capping worker residency at
# ~330 MB worst case (each T3 is n_queries x m x n_codes doubles, ~164 MB
# at 10k x 8 x 256). Keyed on the SEARCH TOKEN stamped into the broadcast
# payload at plan time (_adc_candidates_arrow): the token identifies one
# (Q, CB) payload by construction, so a hit is content-true even when
# pyspark hands each task a freshly-deserialized array object — the earlier
# id()-pair key relied on allocator address reuse for its cross-task hits
# (and could in principle alias a *different* payload after GC), while a
# bare object-identity check (round-8 first fix) missed every cross-task
# reuse and rebuilt T3 per task, a measured ~1.4x slowdown on the 5M
# nc=256 headline rows.
_DECOMP_CACHE: OrderedDict = OrderedDict()
_DECOMP_CACHE_MAX = 2
_DECOMP_TOKENS = itertools.count()


def _adc_bucket_scorer_decomposed(Q, qsel, b, codes, extra):
    """Residual ADC via the precomputed-term decomposition (the FAISS
    IVFPQ 'precomputed tables' identity):

        ||(q - c_b)_j - r||^2 = ||q - c_b||^2_j            (T1, per query x bucket)
                              + (||r||^2 + 2 c_bj . r)      (T2, per bucket — query-free)
                              - 2 q_j . r                   (T3, per query — bucket-free)

    The fold scorer rebuilds a per-(query, bucket) LUT in an sd-deep loop —
    at n_codes=256 that LUT build dominated filtered 5M searches (adaptive
    widening probes ~200+ buckets, each paying qsel x m x n_codes x sd
    mult-adds). Here T3 is computed ONCE per worker for the whole query
    matrix (m small DGEMMs, cached across buckets), T2 is one m x n_codes
    pass per bucket, and the per-bucket LUT is a single add — ~sd x fewer
    LUT flops. DECLARED THROUGHPUT FORM, same contract class as IVF's
    arrow_score='blas': same candidate sets and (score, id) ranks up to
    last-ulp score ties; the bit-oracled fold form stays the default
    (tests assert rank/set equality and score closeness)."""
    cent, CB, residual = extra[:3]
    # search token stamped at plan time; absent only when a caller invokes
    # the scorer directly with a bare 3-tuple (tests/ad-hoc) — then every
    # call recomputes, which is correct just not cached
    token = extra[3] if len(extra) > 3 else None
    m, nc, sd = CB.shape
    cached = _DECOMP_CACHE.get(token) if token is not None else None
    if cached is not None:
        _DECOMP_CACHE.move_to_end(token)  # LRU touch
        T3, rnorm = cached
    else:
        S = Q.reshape(Q.shape[0], m, sd)
        T3 = np.empty((Q.shape[0], m, nc), dtype=np.float64)
        for j in range(m):
            T3[:, j, :] = S[:, j, :] @ (-2.0 * CB[j].T)
        rnorm = np.einsum("jcs,jcs->jc", CB, CB)
        if token is not None:
            while len(_DECOMP_CACHE) >= _DECOMP_CACHE_MAX:
                _DECOMP_CACHE.popitem(last=False)  # evict least-recent
            _DECOMP_CACHE[token] = (T3, rnorm)
    if residual:
        cb_ = cent[b]
        T2 = rnorm + 2.0 * np.einsum("js,jcs->jc", cb_.reshape(m, sd), CB)
        qr = Q[qsel] - cb_[None, :]
        T1 = np.einsum("qs,qs->q", qr, qr)
    else:
        T2 = rnorm
        T1 = np.einsum("qs,qs->q", Q[qsel], Q[qsel])
    # T2 is query-free, so it collapses to ONE scalar per candidate row —
    # never a (qsel, m, nc) LUT materialization (measured 4x on the chunk
    # stage: the per-chunk T3 slice below is ~0.5 MB and L2-resident,
    # while a materialized per-bucket LUT is tens of MB re-read per chunk)
    t2row = T2[0, codes[:, 0]].copy()
    for j in range(1, m):
        t2row += T2[j, codes[:, j]]

    def chunk(c0, c1):
        lc = T3[qsel[c0:c1]]
        sc = lc[:, 0, codes[:, 0]]
        for j in range(1, m):
            sc = sc + lc[:, j, codes[:, j]]
        return sc + (t2row[None, :] + T1[c0:c1, None])

    return chunk


__all__ = ["IVFPQIndex"]


@dataclass
class IVFPQIndex:
    centroids: DataFrame  # (centroid_id int, centroid array<float>)
    coded: DataFrame      # (id, partition_id, codes, + vec col when rerank kept)
    codebooks: Codebooks
    n_centroids: int
    build_seconds: float
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    has_vectors: bool = True
    residual: bool = True
    # tiny hash-gated sample sidecar of the non-vector/non-code columns
    # (loaded layouts): adaptive_nprobe's selectivity estimate reads this,
    # never the full coded relation
    sel_sample: DataFrame | None = None
    # OPQ pre-transform (FAISS's shipping OPQ{m},IVF{nc},PQ{m} composition):
    # orthogonal (dim, dim) rotation the residuals were encoded under —
    # codes quantize (x - c) @ R, search builds LUTs from (q - c) @ R.
    # R orthogonal => rotated-space distances ARE original-space distances,
    # so every downstream ADC/rank kernel is unchanged; None = plain IVFPQ.
    rotation: np.ndarray | None = None

    @staticmethod
    def _from_ivf(
        ivf: IVFIndex,
        codebooks: Codebooks,
        keep_vectors: bool,
        residual: bool,
        t0: float,
        id_col: str,
        vec_col: str,
        encode_mode: str = "fold",
        rotation: np.ndarray | None = None,
    ) -> "IVFPQIndex":
        # Fused Arrow-batched exact encode (pq_encode_with_codes_arrow):
        # bit-identical to the expression/oracle fold, ~100x the
        # interpreted-HOF throughput, and for residual codes it reads the
        # batch's partition_id against the broadcast centroid matrix —
        # no centroid join, no per-row list decode — on the one corpus-wide
        # materialization scan. EVERY corpus column (metadata like rating
        # buckets included) passes through so filtered search predicates
        # bind against the coded layout; only the vector is dropped when
        # the caller asked for a codes-only artifact.
        centers = None
        if residual:
            rows = ivf.centroids.orderBy("centroid_id").collect()
            centers = np.array([r["centroid"] for r in rows], dtype=np.float64)
        # repartition+sort on the bucket key: co-locate each bucket so the
        # Arrow ADC kernel's per-(batch, bucket) top-R partials actually cap
        # (see IVFIndex.build) — one build-time shuffle of the coded rows
        coded = (
            pq_encode_with_codes_arrow(
                ivf.assigned,
                codebooks,
                vec_col,
                centers=centers,
                drop_vec=not keep_vectors,
                encode_mode=encode_mode,
                rotation=rotation,
            )
            .repartition(F.col("partition_id"))
            .sortWithinPartitions("partition_id")
            .persist()
        )
        # ONE materialization pass: the IVF assignment is built lazy
        # (materialize=False), so partition assignment and code assignment
        # fuse into this single corpus scan
        coded.count()
        ivf.assigned.unpersist()  # no-op for the lazy path; safe either way
        return IVFPQIndex(
            centroids=ivf.centroids,
            coded=coded,
            codebooks=codebooks,
            n_centroids=ivf.n_centroids,
            build_seconds=time.time() - t0,
            id_col=id_col,
            vec_col=vec_col,
            has_vectors=keep_vectors,
            residual=residual,
            rotation=rotation,
        )

    @staticmethod
    def build_fixed(
        corpus: DataFrame,
        n_centroids: int = 16,
        m: int = 4,
        n_codes: int = 16,
        dim: int = 64,
        keep_vectors: bool = True,
        residual: bool = True,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        encode_mode: str = "fold",
    ) -> "IVFPQIndex":
        """Deterministic composed index: hash-picked coarse centroids
        (IVFIndex.build_fixed) + arithmetic codebooks (pq.fixed_codebooks).
        Every stage — centroid pick, bucket assignment, residual code
        assignment, probe ranking, ADC scoring, rerank — is reproducible in
        SQL. ``encode_mode='blas'`` swaps the code-assignment kernel for the
        declared-throughput DGEMM form (see pq_encode_with_codes_arrow)."""
        t0 = time.time()
        ivf = IVFIndex.build_fixed(
            corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
            materialize=False,
        )
        books = fixed_codebooks(dim=dim, m=m, n_codes=n_codes)
        return IVFPQIndex._from_ivf(
            ivf, books, keep_vectors, residual, t0, id_col, vec_col, encode_mode
        )

    @staticmethod
    def build(
        corpus: DataFrame,
        n_centroids: int = 64,
        m: int = 8,
        n_codes: int = 16,
        seed: int = 42,
        keep_vectors: bool = True,
        residual: bool = True,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        encode_mode: str = "fold",
        opq: bool = False,
        opq_iters: int = 8,
    ) -> "IVFPQIndex":
        """Quality tier: trained KMeans coarse quantizer + per-subspace
        Lloyd's codebooks. With ``residual=True`` the codebooks are fitted on
        a (bounded, deterministic) sample of RESIDUALS — the distribution the
        codes will actually quantize. ``encode_mode='blas'`` swaps the
        code-assignment kernel for the declared-throughput DGEMM form (see
        pq_encode_with_codes_arrow) — reconstruction-distance-equal codes,
        ~sd x fewer argmin flops at wide codebooks (the n_codes=256 5M build
        bottleneck).

        ``opq=True`` composes the OPQ pre-transform with the residual tier —
        FAISS's shipping ``OPQ{m},IVF{nc},PQ{m}`` configuration: an
        orthogonal rotation R is trained (Ge et al. CVPR 2013 alternation,
        pq.opq_train) and codes quantize the ROTATED residuals
        ``(x - c) @ R``. Unlike FAISS's OPQMatrix (fit on raw vectors before
        the IVF exists), R here is fit directly on the residual sample — the
        distribution the codes actually quantize. Coarse assignment stays in
        original space (R orthogonal => rotated-space assignment ranks the
        same distances); search builds its LUTs from rotated query residuals
        and reranks against the untouched original vectors. No new
        exchanges: the rotation is one extra DGEMM inside the existing
        encode kernel and one tiny query/centroid-side pass at search."""
        # materialize=False (round 11, matching build_fixed): the lazy
        # assignment is recomputed by the residual-sample scan and the
        # coded materialization — but _with_partition_id is ONE cheap
        # Arrow DGEMM per batch, while the persist it replaces shuffles and
        # caches the full wide corpus (3 GB at 1M x 768d) for exactly two
        # readers. The 768-d profile showed the materialized coarse phase
        # carrying ~90 s of non-k-means cost; the artifact is bit-identical
        # either way (the hash-gated sample and the encode read the same
        # deterministic assignment).
        t0 = time.time()
        # ONE sampling scan for the whole composed build (round 11): the
        # coarse k-means and the residual codebook training draw the SAME
        # deterministic raw-vector-hash sample, so collect it once and pass
        # it to both (was: IVFIndex.build and _train_sample_residual each
        # ran their own identical bounded_hash_take scan). Artifacts are
        # bit-identical — same membership, same order, same arithmetic
        # (see the cost history in _train_sample_raw/_train_sample_residual:
        # 181 s -> 44.6 s -> one-scan form).
        from .pq import _residuals_for_sample, _train_sample_raw, opq_fit, pq_fit

        X_raw = _train_sample_raw(corpus, vec_col, 100_000)
        ivf = IVFIndex.build(
            corpus, n_centroids=n_centroids, seed=seed, id_col=id_col,
            vec_col=vec_col, materialize=False, train_matrix=X_raw,
        )
        rotation: np.ndarray | None = None
        if residual:
            X = _residuals_for_sample(X_raw, ivf._centers_np)
            if opq:
                rotation, books = opq_fit(
                    X, m=m, n_codes=n_codes, seed=seed, opq_iters=opq_iters
                )
            else:
                books = pq_fit(X, m=m, n_codes=n_codes, seed=seed)
        elif opq:
            rotation, books = opq_train(
                corpus, vec_col=vec_col, m=m, n_codes=n_codes,
                seed=seed, opq_iters=opq_iters,
            )
        else:
            books = pq_train(corpus, vec_col=vec_col, m=m, n_codes=n_codes, seed=seed)
        return IVFPQIndex._from_ivf(
            ivf, books, keep_vectors, residual, t0, id_col, vec_col, encode_mode,
            rotation=rotation,
        )

    def write_bucketed(self, path: str) -> None:
        """Persist the composed layout partitioned by bucket: probe scans
        prune to nprobe directories of CODES (not vectors). Codebooks ride
        along as a tiny one-row table so load() restores a searchable index;
        stats/sample sidecars let search-time policies avoid ever scanning
        the coded relation."""
        self.coded.write.mode("overwrite").partitionBy("partition_id").parquet(
            f"{path}/coded"
        )
        self.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        _write_sidecars(
            path, self.coded, id_col=self.id_col, drop_cols=(self.vec_col, "codes")
        )
        spark = self.coded.sparkSession
        rot = (
            [[float(x) for x in row] for row in self.rotation]
            if self.rotation is not None
            else None
        )
        meta = spark.createDataFrame(
            [(self.codebooks, self.residual, self.id_col, self.vec_col, rot)],
            "codebooks array<array<array<double>>>, residual boolean, "
            "id_col string, vec_col string, rotation array<array<double>>",
        )
        meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @staticmethod
    def append_to_layout(
        spark,
        path: str,
        new_rows: DataFrame,
        vec_col: str | None = None,
        batch_id: int | None = None,
    ) -> int:
        """Incremental add (FAISS `index.add` semantics): assign new vectors
        to the layout's existing centroids, residual-encode them with the
        layout's codebooks, and append to the bucketed coded Parquet — only
        the touched bucket directories grow; nothing is retrained or
        rewritten.

        Appended rows carry EVERY column of the written layout's schema
        (metadata like rating buckets included — the _from_ivf contract), so
        filtered searches see appended vectors exactly like built ones;
        new_rows missing a layout column is an error, not a silent NULL.
        ``batch_id`` switches to an idempotent per-batch overwrite directory
        (see IVFIndex.append_to_layout — same replay semantics). Returns rows
        appended."""
        import numpy as np

        from .ann import _with_partition_id

        idx = IVFPQIndex.load(spark, path)
        vec = vec_col or idx.vec_col
        layout_cols = [c for c in idx.coded.columns if c not in ("partition_id", "codes")]
        needed = [vec if c == idx.vec_col else c for c in layout_cols]
        if vec not in needed:  # codes-only layout still needs the vector to encode
            needed.append(vec)
        missing = [c for c in needed if c not in new_rows.columns]
        if missing:
            raise ValueError(
                f"new_rows lacks columns the written layout carries: {missing} "
                f"(layout schema: {layout_cols}); filtered searches bind "
                "predicates against these, so appending NULLs would silently "
                "hide appended vectors from filtered results"
            )
        centers = np.array(
            [
                r["centroid"]
                for r in idx.centroids.orderBy("centroid_id").collect()
            ],
            dtype=np.float64,
        )
        assigned = _with_partition_id(new_rows, centers, vec)
        base = pq_encode_with_codes_arrow(
            assigned,
            idx.codebooks,
            vec,
            centers=centers if idx.residual else None,
            rotation=idx.rotation,  # OPQ layouts encode (x - c) @ R
        )
        cols = [
            F.col(vec).alias(idx.vec_col) if c == idx.vec_col else F.col(c)
            for c in layout_cols
        ]
        out = base.select(*cols, F.col("partition_id"), F.col("codes")).persist()
        n = out.count()
        try:
            frac = _sample_fraction(spark, path)
        except Exception:  # pre-sidecar layout vintage
            frac = None
        if batch_id is None:
            out.write.mode("append").partitionBy("partition_id").parquet(
                f"{path}/coded"
            )
            if frac is not None:
                out.groupBy("partition_id").agg(
                    F.count(F.lit(1)).alias("n_rows")
                ).coalesce(1).write.mode("append").parquet(f"{path}/stats")
                out.filter(_sample_gate(idx.id_col, frac)).drop(
                    idx.vec_col, "codes"
                ).coalesce(1).write.mode("append").parquet(f"{path}/sample")
        else:
            root = _batch_root(path, batch_id)
            out.write.mode("overwrite").partitionBy("partition_id").parquet(
                f"{root}/coded"
            )
            if frac is not None:
                _write_sidecars(
                    root,
                    out,
                    id_col=idx.id_col,
                    drop_cols=(idx.vec_col, "codes"),
                    fraction=frac,
                )
        out.unpersist()
        # load() persisted the selectivity sample sidecar; this sits in the
        # foreachBatch hot path (one call per micro-batch), so the cache
        # entry must be released or it leaks once per batch forever
        if idx.sel_sample is not None:
            idx.sel_sample.unpersist()
        return n

    @staticmethod
    def compact_layout(spark, path: str, files_per_bucket: int = 1) -> int:
        """Fold per-batch appends into the base coded layout and bound files
        per bucket (see ann._compact_layout for semantics/caveats)."""
        idx = IVFPQIndex.load(spark, path)
        if idx.sel_sample is not None:
            idx.sel_sample.unpersist()
        return _compact_layout(
            spark,
            path,
            "coded",
            id_col=idx.id_col,
            drop_cols=(idx.vec_col, "codes"),
            files_per_bucket=files_per_bucket,
        )

    @staticmethod
    def load(spark, path: str) -> "IVFPQIndex":
        """Open a written IVFPQ layout. Searches read only the probed
        partition directories of the coded table (partition pruning at the
        scan — the bucketed layout is the point of the tier)."""
        centroids = spark.read.parquet(f"{path}/centroids")
        coded = _read_layout(spark, path, "coded")
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        books = [
            [[float(x) for x in code] for code in cb] for cb in meta["codebooks"]
        ]
        rot = None
        if "rotation" in meta.asDict() and meta["rotation"] is not None:
            rot = np.array(
                [[float(x) for x in row] for row in meta["rotation"]],
                dtype=np.float64,
            )
        try:
            sel_sample = _read_sidecar(spark, path, "sample").persist()
        except Exception:  # pre-sidecar layout vintage
            sel_sample = None
        return IVFPQIndex(
            centroids=centroids,
            coded=coded,
            codebooks=books,
            n_centroids=centroids.count(),
            build_seconds=0.0,
            id_col=meta["id_col"],
            vec_col=meta["vec_col"],
            has_vectors=meta["vec_col"] in coded.columns,
            residual=meta["residual"],
            sel_sample=sel_sample,
            rotation=rot,
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 8,
        rerank: int = 0,
        predicate: Column | None = None,
        adaptive_nprobe: bool = False,
        arrow_adc: bool | str = False,
    ) -> DataFrame:
        """Filtered approximate top-k over the composed index.

        1. rank centroids per query (tiny broadcast join + WindowGroupLimit);
        2. build the ADC LUT per (query, probed bucket) — residual space when
           the index is residual-coded — on the probe list (queries x nprobe
           rows, broadcast);
        3. equi-join the probe list onto the coded corpus's bucket key — the
           coded relation streams, nothing corpus-sized shuffles — and
           ADC-score candidates with an m-step LUT fold;
        4. ``rerank=0``: per-query ADC top-k. ``rerank=R``: per-query ADC
           top-R, then exact distance on the kept vectors re-orders the
           short list (two windows, but the second sees <= R rows/query).

        ``predicate`` (over coded-corpus columns) applies BEFORE candidate
        selection — filter-then-top-k, same contract as IVFIndex.search.

        ``arrow_adc=True`` (or ``'fold'``) swaps step 3's per-candidate HOF
        fold for the Arrow-batched numpy kernel (``_adc_candidates_arrow``)
        — same results (bit-identical fold order, same (dist, id)
        tie-break), ~5-10x the throughput on large query batches, because
        HOF expressions run interpreted (~1us/candidate x m) while the
        kernel scores a whole bucket x query-chunk block per numpy op.
        ``arrow_adc='decomposed'`` further swaps the per-(query, bucket)
        LUT build for the precomputed-term decomposition — the query LUT is
        bucket-independent and cached across every probed bucket — the
        fastest form under wide adaptive probing at large n_codes (same
        candidate sets/ranks up to last-ulp score ties; see
        `_adc_bucket_scorer_decomposed`). The expression path stays the
        default: it is the DuckDB-oracle tier and has no driver-side query
        collect.

        OPQ indexes (``self.rotation`` set) search in ROTATED space: the
        query side and the centroid side are rotated once (one tiny DGEMM
        each — queries x dim and n_centroids x dim), then probe ranking,
        LUT build, and ADC scoring run the unchanged machinery on the
        rotated inputs (R orthogonal => same distances). The rerank tail
        stays in ORIGINAL space against the untouched kept vectors."""
        if rerank and not self.has_vectors:
            raise ValueError(
                "rerank requires keep_vectors=True at build time (the coded "
                "layout dropped the full-precision column)"
            )
        m, n_codes, sd = _validate(self.codebooks)
        if adaptive_nprobe and predicate is not None:
            # same policy as IVFIndex.search: a filter keeping s of the corpus
            # thins every probed bucket to s of its rows, so holding the
            # candidate count constant takes nprobe/s probes (clamped below).
            # Estimated from the tiny sample sidecar when loaded from a
            # layout — the coded relation is never scanned outside the probe
            # join itself.
            sel = _estimate_selectivity(
                self.sel_sample if self.sel_sample is not None else self.coded,
                predicate,
            )
            if sel > 0:
                import math

                nprobe = int(math.ceil(nprobe / sel))
            else:
                # zero sample hits = predicate below the sample's resolution:
                # open every bucket (see IVFIndex.search)
                nprobe = self.n_centroids
        nprobe = min(nprobe, self.n_centroids)

        corpus = self.coded
        if predicate is not None:
            corpus = corpus.filter(predicate)

        # OPQ: rotate the two SMALL relations once; everything downstream is
        # the plain-IVFPQ machinery over rotated inputs (see docstring).
        # `queries` (original) still feeds the rerank tail.
        if self.rotation is not None:
            q_search = rotate_vecs(
                queries.select("query_id", "q_vec"), self.rotation, "q_vec"
            )
            cent_search = self._rotated_centroids_df()
        else:
            q_search = queries
            cent_search = self.centroids

        if arrow_adc:
            if arrow_adc not in (True, "fold", "decomposed"):
                raise ValueError(
                    f"arrow_adc must be False, True/'fold', or 'decomposed'; "
                    f"got {arrow_adc!r}"
                )
            # probe ranking rides INSIDE the kernel (driver-side numpy over
            # the collected query matrix) — same fold + tie-break as the
            # knn_window job below, at none of its interpreted-HOF cost on
            # large query batches
            top = max(rerank, k) if rerank else k
            cand = self._adc_candidates_arrow(
                q_search, nprobe, corpus, top,
                decomposed=(arrow_adc == "decomposed"),
            )
            return self._finish_from_candidates(
                cand, queries, corpus, k, rerank, joined_vectors=False
            )

        probes = knn_window(
            q_search,
            cent_search,
            k=nprobe,
            metric="sqeuclidean",
            id_col="centroid_id",
            vec_col="centroid",
            fan_out=False,
        ).select("query_id", F.col("neighbor_id").alias("partition_id"))

        # Codebooks ride as a broadcast 1-row relation, NOT an inline literal:
        # the m x n_codes x sd nested-array literal costs ~0.9s of parse +
        # analysis per search (measured), while a column reference is a
        # 2-token tree — same doubles either way.
        spark = self.coded.sparkSession
        # memoized per index: createDataFrame runs a driver-side job (~0.1s);
        # grid sweeps call search() many times over one index
        cb_df = getattr(self, "_cb_df", None)
        if cb_df is None:
            cb_df = spark.createDataFrame(
                [(self.codebooks,)], "cb array<array<array<double>>>"
            )
            self._cb_df = cb_df
        cb = "cb"
        if self.residual:
            # LUT per (query, bucket) over the query's residual vs that bucket
            qv = (
                "zip_with(cast(q_vec as array<double>), "
                "cast(centroid as array<double>), (x, y) -> x - y)"
            )
            lut_src = (
                probes.join(
                    F.broadcast(
                        cent_search.select(
                            F.col("centroid_id").alias("partition_id"), "centroid"
                        )
                    ),
                    "partition_id",
                )
                .join(F.broadcast(q_search.select("query_id", "q_vec")), "query_id")
            )
        else:
            qv = "cast(q_vec as array<double>)"
            lut_src = probes.join(
                F.broadcast(q_search.select("query_id", "q_vec")), "query_id"
            )
        # let-bound zip_with form (see pq._encode_body_sql): the residual/query
        # vector binds once, each subspace slice once — bit-identical fold
        lut = F.expr(
            f"transform(array({qv}), qr -> "
            f"transform(sequence(0, {m - 1}), j -> "
            f"transform(array(slice(qr, j * {sd} + 1, {sd})), qs -> "
            f"transform(sequence(0, {n_codes - 1}), c -> "
            f"aggregate(zip_with(qs, {cb}[j][c], (x, y) -> (x - y) * (x - y)), "
            "0.0D, (acc, z) -> acc + z)))[0]))[0]"
        )
        probe_lut = lut_src.crossJoin(F.broadcast(cb_df)).select(
            "query_id", "partition_id", lut.alias("lut")
        )

        adc = F.expr(
            f"aggregate(sequence(0, {m - 1}), 0.0D, (acc, j) -> acc + lut[j][codes[j]])"
        )
        keep = [F.col(self.id_col).alias("neighbor_id")]
        if rerank:
            keep.append(F.col(self.vec_col))
        cand = (
            F.broadcast(probe_lut)
            .join(corpus, "partition_id")
            .select("query_id", *keep, adc.alias("adc_dist"))
        )
        return self._finish_from_candidates(
            cand, queries, corpus, k, rerank, joined_vectors=True
        )

    def _rotated_centroids_df(self) -> DataFrame:
        """Memoized (centroid_id, centroid @ R) relation — n_centroids rows,
        rotated once on the driver (the centroid table is bounded by the
        same collect discipline every search already relies on)."""
        cached = getattr(self, "_cent_rot_df", None)
        if cached is not None:
            return cached
        rows = self.centroids.collect()
        R = np.ascontiguousarray(self.rotation, dtype=np.float64)
        data = [
            (int(r["centroid_id"]),
             [float(x) for x in np.asarray(r["centroid"], dtype=np.float64) @ R])
            for r in rows
        ]
        df = self.coded.sparkSession.createDataFrame(
            data, "centroid_id int, centroid array<double>"
        )
        self._cent_rot_df = df
        return df

    def _adc_candidates_arrow(
        self,
        queries: DataFrame,
        nprobe: int,
        corpus: DataFrame,
        top: int,
        decomposed: bool = False,
    ) -> DataFrame:
        """Arrow-batched ADC scoring — the large-query-batch throughput form.

        The expression path pays ~1us of interpreted HOF evaluation per
        (candidate row x m); at 10k queries x nprobe/n_centroids x 1M rows
        that is hundreds of seconds of pure expression overhead. This kernel
        broadcasts the (bounded) query matrix + probe lists + centroids +
        codebooks once, STATICALLY prunes the coded scan to the probed
        buckets (an isin on the partition column — stronger than the join's
        dynamic pruning), and scores each bucket x query-chunk block with
        numpy, emitting only a per-(query, chunk) local top-``top`` that the
        shared window merge reduces — the knn_scalable partial-top-k shape.
        The scaffolding (collect caps, broadcast, pre-sort/chunk/stable-
        argsort discipline) is `ann._arrow_bucket_topk`, shared with
        IVFIndex's exact kernel; only `_adc_bucket_scorer` is ADC-specific.

        Numerically BIT-IDENTICAL to the expression form (same discipline as
        pq_encode_udf): LUT entries accumulate subspace elements in
        ascending order from 0.0 and ADC sums LUT cells in ascending j — the
        same IEEE doubles as the 0.0D-seeded ascending aggregate folds — and
        candidates are pre-sorted by neighbor_id so a STABLE argsort on
        distance reproduces the (adc_dist, neighbor_id) tie-break exactly.

        Driver-side collects are the query matrix (bounded: raises above
        ann._SCORE_MAX_QUERIES queries — shard the query batch upstream) and
        the centroid table — never the coded corpus. Probe ranking happens
        right there over the collected matrix (ann._probe_lists_numpy, same
        fold + tie-break as the knn_window job the expression path runs).
        """
        m, n_codes, sd = _validate(self.codebooks)
        cent = np.zeros((self.n_centroids, m * sd), dtype=np.float64)
        for r in self.centroids.collect():
            cent[int(r["centroid_id"])] = np.asarray(
                r["centroid"], dtype=np.float64
            )
        # OPQ: the caller passes ROTATED queries; rotate the centroid matrix
        # to match, so probe ranking and the scorers' residuals both live in
        # rotated space — (Q@R - (c@R)) == (q - c)@R, the space the codes
        # quantize. The distributed probe fallback gets the rotated relation.
        cent_df = self.centroids
        if self.rotation is not None:
            cent = cent @ np.ascontiguousarray(self.rotation, dtype=np.float64)
            cent_df = self._rotated_centroids_df()
        CB = np.ascontiguousarray(self.codebooks, dtype=np.float64)
        return _arrow_bucket_topk(
            queries,
            corpus,
            id_col=self.id_col,
            data_col="codes",
            data_dtype="int64",
            top=top,
            out_col="adc_dist",
            # the pid:counter token uniquely names THIS search's broadcast
            # payload — the decomposed scorer's per-worker T3 cache keys on
            # it (content-true across tasks; see _DECOMP_CACHE)
            extra=(cent, CB, self.residual,
                   f"{os.getpid()}:{next(_DECOMP_TOKENS)}"),
            bucket_scorer=(
                _adc_bucket_scorer_decomposed if decomposed else _adc_bucket_scorer
            ),
            kernel_name="arrow_adc",
            probe_spec=(cent, nprobe, cent_df),
        )

    def _finish_from_candidates(
        self,
        cand: DataFrame,
        queries: DataFrame,
        corpus: DataFrame,
        k: int,
        rerank: int,
        joined_vectors: bool,
    ) -> DataFrame:
        """Shared tail of both ADC physical forms: per-query ADC top-k (or
        top-R + exact rerank). ``joined_vectors=False`` (the Arrow kernel's
        candidates carry no vector column) fetches rerank vectors by
        streaming the corpus through one equi-join against the BROADCAST
        <= queries x R short list — never a corpus-side shuffle."""
        w_adc = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist").asc(), F.col("neighbor_id").asc()
        )
        if not rerank:
            return (
                cand.withColumn("rank", F.row_number().over(w_adc))
                .filter(F.col("rank") <= k)
                .select(
                    "query_id", "neighbor_id", "rank", F.col("adc_dist").alias("dist")
                )
            )
        short = cand.withColumn("_arn", F.row_number().over(w_adc)).filter(
            F.col("_arn") <= max(rerank, k)
        )
        if not joined_vectors:
            short = corpus.select(
                F.col(self.id_col).alias("neighbor_id"), self.vec_col
            ).join(
                F.broadcast(short.select("query_id", "neighbor_id")), "neighbor_id"
            )
        short = short.join(
            F.broadcast(queries.select("query_id", "q_vec")), "query_id"
        )
        exact = F.expr(
            f"aggregate(zip_with(cast(q_vec as array<double>), "
            f"cast({self.vec_col} as array<double>), (x, y) -> (x - y) * (x - y)), "
            "0.0D, (acc, x) -> acc + x)"
        )
        w_ex = Window.partitionBy("query_id").orderBy(
            F.col("dist").asc(), F.col("neighbor_id").asc()
        )
        return (
            short.select("query_id", "neighbor_id", exact.alias("dist"))
            .withColumn("rank", F.row_number().over(w_ex))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dist")
        )

    def unpersist(self) -> None:
        self.coded.unpersist()
        if self.sel_sample is not None:
            self.sel_sample.unpersist()

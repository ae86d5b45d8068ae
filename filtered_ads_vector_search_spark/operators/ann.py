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
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V
from .topk import Metric, _arrow_vectors, _topk_set_mask, distance_col, knn_window

# The Arrow kernels collect the query matrix driver-side and rank probes
# over it in numpy (the same bounded-collect discipline as knn_scalable's
# broadcast queries); above this many queries, shard the batch upstream.
_SCORE_MAX_QUERIES = 100_000

# Probe-ranking route inside the Arrow kernels: the driver-side numpy
# ranking allocates a (4096 x n_centroids) float64 chunk — ~3 GB of
# temporaries at 100k centroids — so above either threshold the kernels
# rank probes with the SAME expression-path knn_window job the default
# search runs (distributed; only queries x nprobe id pairs reach the
# driver). Both paths are the same fold + (dist, centroid_id) tie-break,
# so probe SETS are identical either way (asserted in test_recall_ann).
_PROBE_DISTRIBUTED_CENTROIDS = 10_000
_PROBE_CHUNK_QUERIES = 4096  # _probe_lists_numpy chunk height
# TOTAL Q x C x 8 work budget for the driver route. Memory stays
# chunk-bounded regardless (the numpy ranking walks 4096-query chunks),
# but the driver fold is single-threaded and linear in len(Q) x n_cent,
# so past this product the ranking runs as the distributed knn_window
# probe job instead (identical probe sets either way).
_PROBE_MATRIX_BYTES = 2 << 30


def _probe_lists_numpy(
    Q: np.ndarray, cent: np.ndarray, nprobe: int
) -> dict[int, list[int]]:
    """Per-query top-``nprobe`` centroid ranking (sqeuclidean — the only
    metric the Arrow kernels accept), computed driver-side over the
    already-collected query matrix — bit-identical probe SETS to the
    knn_window form: the distance is the same element-ascending left fold
    (same IEEE doubles as the 0.0D-seeded ascending aggregate), centroid
    columns are id-ascending, and a STABLE argsort reproduces the
    (dist, centroid_id) tie-break exactly. Replaces a queries x centroids
    interpreted-HOF job that cost ~4.5s at 10k queries x 256 centroids —
    this is ~0.3s of numpy on the driver, bounded by the query-collect cap
    the kernel already enforces (chunked so temporaries stay ~100 MB)."""
    n_cent = cent.shape[0]
    t = min(nprobe, n_cent)
    bucket_queries: dict[int, list[int]] = {}
    for c0 in range(0, len(Q), _PROBE_CHUNK_QUERIES):
        Qc = Q[c0 : c0 + _PROBE_CHUNK_QUERIES]
        D = np.zeros((len(Qc), n_cent), dtype=np.float64)
        for el in range(Qc.shape[1]):  # ascending-element left fold
            d = Qc[:, el, None] - cent[None, :, el]
            D += d * d
        keep = np.argsort(D, axis=1, kind="stable")[:, :t]
        for i in range(len(Qc)):
            qi = c0 + i
            for b in keep[i]:
                bucket_queries.setdefault(int(b), []).append(qi)
    return bucket_queries


def _probe_lists_job(
    queries: DataFrame, centroids: DataFrame, nprobe: int, qpos: dict[int, int]
) -> dict[int, list[int]]:
    """Distributed probe ranking for the Arrow kernels — the expression-path
    knn_window probe job (broadcast queries x centroid relation -> partial
    WindowGroupLimit -> top-nprobe per query), collected as id pairs only:
    queries x nprobe rows reach the driver, never a Q x C matrix. Same
    sqeuclidean fold and (dist, centroid_id) tie-break as
    :func:`_probe_lists_numpy`, so the probe SETS are identical; per-bucket
    query order is ascending query position either way."""
    rows = knn_window(
        queries,
        centroids,
        k=nprobe,
        metric="sqeuclidean",
        id_col="centroid_id",
        vec_col="centroid",
        fan_out=False,
    ).select("query_id", "neighbor_id").collect()
    pairs = sorted(
        (qpos[int(r["query_id"])], int(r["neighbor_id"])) for r in rows
    )
    bucket_queries: dict[int, list[int]] = {}
    for qi, b in pairs:
        bucket_queries.setdefault(b, []).append(qi)
    return bucket_queries


def _arrow_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    data_col: str,
    data_dtype: str,
    top: int,
    out_col: str,
    extra: tuple,
    bucket_scorer,
    kernel_name: str,
    probe_spec: tuple,
    radius: float | None = None,
) -> DataFrame:
    """Shared scaffolding of the Arrow scoring kernels (IVF exact /
    IVFPQ ADC): bounded query collect, driver-side probe ranking
    (``probe_spec`` = id-ordered centroid matrix + nprobe), broadcast,
    static bucket pruning, per-bucket neighbor_id pre-sort (the exact
    (score, id) tie-break via STABLE argsort), 256-query chunking to bound
    the (q x n) block, and local top-``top`` partial emission for the
    shared window merge. The kernels differ ONLY in ``bucket_scorer``:

        bucket_scorer(Q, qsel, bucket_id, data, extra) -> chunk_fn
        chunk_fn(c0, c1) -> (c1-c0, n_bucket_rows) float64 score matrix

    where ``data`` is the bucket's ``data_col`` rows as a (n, ...) array of
    ``data_dtype``, already sorted by ascending neighbor_id. Keeping the
    scaffold in one place keeps the two kernels' tie-break / chunking /
    cap discipline from drifting apart — both assert bit-equality with
    their expression forms."""
    q_rows = queries.select("query_id", "q_vec").collect()
    if not q_rows:  # expression-path contract: empty in, empty out
        return corpus.sparkSession.createDataFrame(
            [], f"query_id long, neighbor_id long, {out_col} double"
        )
    if len(q_rows) > _SCORE_MAX_QUERIES:
        raise ValueError(
            f"{kernel_name} collects the query matrix; got {len(q_rows)} "
            f"queries > {_SCORE_MAX_QUERIES} — shard the batch upstream"
        )
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r["q_vec"]) for r in q_rows], dtype=np.float64)
    qpos = {int(q): i for i, q in enumerate(qids)}
    if len(qpos) != len(qids):
        # the expression path would score each duplicate row; collapsing
        # them into qpos silently (last q_vec wins) would break the asserted
        # bit-identity contract — refuse malformed input instead
        raise ValueError(
            f"{kernel_name}: duplicate query_id rows in the query batch "
            f"({len(qids)} rows, {len(qpos)} distinct ids)"
        )
    # (centroid matrix ordered by ascending centroid_id, nprobe, centroid
    # relation): rank probes driver-side over the Q matrix just collected —
    # same fold, same tie-break as the knn_window probe job the expression
    # path runs — UNLESS the centroid count (or the Q x C matrix) is past
    # the driver budget, in which case the ranking runs as that very
    # knn_window job, distributed (identical probe sets; see
    # _PROBE_DISTRIBUTED_CENTROIDS)
    cent_mat, nprobe_, cent_df = probe_spec
    n_cent = cent_mat.shape[0]
    if (
        n_cent > _PROBE_DISTRIBUTED_CENTROIDS
        or len(Q) * n_cent * 8 > _PROBE_MATRIX_BYTES
    ):
        bucket_queries = _probe_lists_job(queries, cent_df, min(nprobe_, n_cent), qpos)
    else:
        bucket_queries = _probe_lists_numpy(Q, cent_mat, nprobe_)
    bq = {b: np.array(v, dtype=np.int64) for b, v in bucket_queries.items()}
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Q, bq) + extra)
    pruned = corpus.filter(
        F.col("partition_id").isin([int(b) for b in bq])
    ).select(
        "partition_id",
        F.col(id_col).alias("neighbor_id"),
        F.col(data_col).alias("_data"),
    )

    def score(batches):
        import pyarrow as pa

        payload = bc.value
        qids_, Q_, bq_ = payload[0], payload[1], payload[2]
        extra_ = payload[3:]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            # mapInArrow + flat-buffer reshape: the data column becomes the
            # (n, w) scoring matrix straight from the Arrow values buffer —
            # the per-row tolist() this replaces materialized n x w Python
            # objects per batch and DOMINATED the full-vector kernel at 5M
            # (primitive upcasts are exact, so the scored doubles are
            # bit-identical)
            pids = (
                batch.column(batch.schema.get_field_index("partition_id"))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            nids = (
                batch.column(batch.schema.get_field_index("neighbor_id"))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            mat = _arrow_vectors(batch, "_data", dtype=data_dtype)
            # group rows by bucket (stable sort keeps intra-bucket order,
            # which the per-bucket id argsort below re-orders anyway — same
            # per-bucket row multiset the pandas groupby produced)
            g_order = np.argsort(pids, kind="stable")
            g_pids = pids[g_order]
            bounds = np.flatnonzero(np.r_[True, g_pids[1:] != g_pids[:-1], True])
            # yield per BUCKET, not per input batch: each yielded frame
            # becomes ONE Arrow IPC batch on the Python->JVM wire, and an
            # unbucketed corpus relation can interleave hundreds of probed
            # buckets inside one input batch — concatenating them produced
            # single ~1 GB batches (queries x buckets x top rows) that
            # exhausted Arrow's direct-memory pool at 5M x 10k queries. A
            # per-bucket frame is bounded by queries_probing x top rows.
            # (Measured alternative, rejected: compacting to top-`top` per
            # (query, task) before emission cuts the wire volume ~3x under
            # widened probing but runs ~40% SLOWER end to end — the
            # task-end lexsort stalls the pipeline into the JVM partial
            # WindowGroupLimit, which absorbs the per-bucket volume while
            # the Python worker is still scoring.)
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                b = int(g_pids[s0])
                qsel = bq_.get(b)
                if qsel is None or len(qsel) == 0:
                    continue
                sel = g_order[s0:s1]
                ids = nids[sel]
                order = np.argsort(ids)  # ascending id => exact tie-break
                ids = ids[order]
                data = mat[sel][order]
                chunk_fn = bucket_scorer(Q_, qsel, b, data, extra_)
                n = len(ids)
                t = min(top, n)
                out_q: list[np.ndarray] = []
                out_n: list[np.ndarray] = []
                out_d: list[np.ndarray] = []
                for c0 in range(0, len(qsel), 256):  # bound the (q x n) block
                    c1 = min(c0 + 256, len(qsel))
                    sc = chunk_fn(c0, c1)
                    # radius mode (range search): membership is a per-cell
                    # predicate — the emitted rows ARE the final relation
                    # (no window merge downstream; every corpus row lives in
                    # exactly one bucket, so no dedup either). top-k mode:
                    # exact top-t SET selection (O(n) partition + lowest-id
                    # tie fill — columns are id-ascending) instead of a full
                    # stable argsort: the shared window merge re-ranks by
                    # (score, id) globally, so only the SET and its score
                    # values matter, and those are identical to the argsort
                    # form's. The row-wise O(n log n) sort dominated the
                    # kernel at 5M x 10k queries.
                    if radius is not None:
                        rows_i, cols = np.nonzero(sc <= radius)
                    else:
                        rows_i, cols = np.nonzero(_topk_set_mask(sc, t))
                    out_q.append(qids_[qsel[c0:c1][rows_i]])
                    out_n.append(ids[cols])
                    out_d.append(sc[rows_i, cols])
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_q), type=pa.int64()),
                        pa.array(np.concatenate(out_n), type=pa.int64()),
                        pa.array(np.concatenate(out_d), type=pa.float64()),
                    ],
                    names=["query_id", "neighbor_id", out_col],
                )

    return pruned.mapInArrow(
        score, f"query_id long, neighbor_id long, {out_col} double"
    )


def _sqeuclidean_bucket_scorer(Q, qsel, _b, V, _extra):
    """Element-ascending (x-y)^2 left fold — the same IEEE doubles as the
    0.0D-seeded ascending aggregate fold of the expression form.

    The fold runs over corpus-column TILES with the bucket matrix
    pre-transposed: each (q_chunk x tile) temporary is ~8 MB (cache-
    resident) instead of (q_chunk x |bucket|) per element, which at 5M-row
    scale generated TBs of allocation traffic across the el-loop. Each
    sc[i, j] still accumulates elements in ascending order from 0.0 —
    tiling partitions j, never the fold order — so the scored doubles are
    bit-identical."""
    d = V.shape[1]
    VT = np.ascontiguousarray(V.T)  # (d, n): row `el` is contiguous

    def chunk(c0, c1):
        Qc = Q[qsel[c0:c1]]
        n = VT.shape[1]
        sc = np.empty((len(Qc), n), dtype=np.float64)
        for t0 in range(0, n, 4096):
            t1 = min(t0 + 4096, n)
            blk = np.zeros((len(Qc), t1 - t0), dtype=np.float64)
            for el in range(d):  # ascending-element left fold
                diff = Qc[:, el, None] - VT[el, t0:t1][None, :]
                blk += diff * diff
            sc[:, t0:t1] = blk
        return sc

    return chunk


def _sqeuclidean_blas_scorer(Q, qsel, _b, V, _extra):
    """||q||^2 - 2 q.v + ||v||^2 via one DGEMM — the same stable expansion
    the exact tier (`topk._np_distances`) has scored with since round 3,
    ~d times faster than the element fold at 64 dims. The summation order
    differs from the fold, so doubles agree only to last-ulps — this is the
    THROUGHPUT form (`arrow_score="blas"`), not the bit-identity form. The
    top-k SET and ranks still match the expression path unless two rows
    land within ~1e-12 relative of a tie — including EXACT-duplicate rows:
    DGEMM's internal blocking can give identical input columns doubles one
    ulp apart across a block boundary (observed with n=109 duplicates:
    two distinct values on the plateau), so which duplicate id represents
    a plateau in the top-k set may differ from the fold's lowest-id pick;
    the selected distance MULTISET is unchanged (the rows are the same
    vector), which is what the fuzz contract asserts. The oracle gate
    compares at 6-decimal rounding,
    which both expansions satisfy (knn_scalable has shipped on this one
    against the DuckDB fold oracle for three driver rounds). Unlike the
    fold (elementwise, batch-shape-invariant), DGEMM tiling varies with the
    matrix shapes, so blas distances can also differ at last-ulps across
    query-batch compositions (e.g. sharded vs single-shot) — ranks and
    result sets are unaffected away from exact ties."""
    Vn = (V * V).sum(axis=1)

    def chunk(c0, c1):
        Qc = Q[qsel[c0:c1]]
        return (Qc * Qc).sum(axis=1)[:, None] - 2.0 * (Qc @ V.T) + Vn[None, :]

    return chunk

__all__ = ["IVFIndex"]

# --- layout sidecars: per-bucket stats + bounded selectivity sample ---------
#
# A written layout carries two tiny relations next to the bucketed data:
#   {root}/stats   (partition_id, n_rows)   per-bucket row counts
#   {root}/sample  non-vector columns of a hash-gated ~SEL_SAMPLE_ROWS row
#                  sample (gate fraction persisted in {root}/sample_meta)
# so that search-time policies (adaptive_nprobe's predicate-selectivity
# estimate) and maintenance (compaction bookkeeping) never have to scan the
# full coded/assigned relation — at 100 TB the index data may only ever be
# touched by the probe scan itself.

SEL_SAMPLE_ROWS = 65_536
_GATE_MOD = 1_000_000


def _sample_gate(id_col: str, fraction: float):
    """Deterministic hash gate: keep ~fraction of rows, stable under reruns
    and repartitioning (same discipline as sampling.seeded_sample)."""
    h = F.crc32(F.concat(F.col(id_col).cast("string"), F.lit("/sel")))
    return (h % _GATE_MOD) < F.lit(int(round(fraction * _GATE_MOD)))


def _write_sidecars(
    root: str,
    relation: DataFrame,
    id_col: str,
    drop_cols: tuple[str, ...],
    fraction: float | None = None,
    bucket_col: str = "partition_id",
) -> None:
    """Write {root}/stats, {root}/sample, {root}/sample_meta for `relation`
    (which must carry the bucket column). When `fraction` is None it is
    derived from the relation's total row count to land ~SEL_SAMPLE_ROWS
    rows."""
    spark = relation.sparkSession
    stats = relation.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("n_rows"))
    stats.coalesce(1).write.mode("overwrite").parquet(f"{root}/stats")
    if fraction is None:
        total = sum(r["n_rows"] for r in spark.read.parquet(f"{root}/stats").collect())
        fraction = min(1.0, SEL_SAMPLE_ROWS / total) if total else 1.0
    keep = [c for c in relation.columns if c not in drop_cols]
    (
        relation.filter(_sample_gate(id_col, fraction))
        .select(*keep)
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(f"{root}/sample")
    )
    spark.createDataFrame([(float(fraction),)], "sample_fraction double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{root}/sample_meta")


def _sample_fraction(spark, path: str) -> float:
    return float(
        spark.read.parquet(f"{path}/sample_meta").collect()[0]["sample_fraction"]
    )


def _batch_root(path: str, batch_id: int) -> str:
    return f"{path}/batches/batch-{batch_id:012d}"


# Compaction staging names. `batches__compacting` is the frozen snapshot a
# running compaction folds from (readers union it exactly like `batches`, so
# every batch is visible in exactly one place at all times); the marker file
# gates the commit step so a crashed compaction can be finished idempotently
# instead of double-folding on retry.
_SNAP_DIR = "batches__compacting"
_COMMIT_MARKER = "__compact_commit"


def _hadoop_fs(spark, path: str):
    """(fs, mkpath) pair for the Hadoop FileSystem owning `path` — all layout
    maintenance goes through this API (never local shutil), so it works on
    file://, hdfs:// and s3a:// alike."""
    jvm = spark.sparkContext._jvm
    mkpath = jvm.org.apache.hadoop.fs.Path
    fs = mkpath(path).getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, mkpath


def _batch_roots(spark, path: str) -> list[str]:
    """Existing per-batch append directories under a layout, sorted. Includes
    batches parked in the compaction snapshot dir. Normally each batch lives
    in exactly one of `batches/` or `batches__compacting/`; the one way both
    can briefly hold the SAME batch id is a crashed compaction followed by a
    streaming replay of an uncommitted batch (idempotent per-batch content),
    so duplicates are deduped BY BATCH DIRECTORY NAME here, preferring the
    parked snapshot copy — readers always see exactly one copy."""
    fs, mkpath = _hadoop_fs(spark, path)
    seen: dict[str, str] = {}
    for sub in (_SNAP_DIR, "batches"):  # snapshot copy wins on a name clash
        hpath = mkpath(f"{path}/{sub}")
        if not fs.exists(hpath):
            continue
        for st in fs.listStatus(hpath):
            if st.isDirectory():
                seen.setdefault(
                    str(st.getPath().getName()),
                    str(st.getPath().toUri().getPath()),
                )
    return sorted(seen.values())


def _snapshot_batches(spark, path: str) -> None:
    """Freeze the batch set a compaction will fold: move `batches/` (or its
    children, when a crashed run already left a snapshot) into
    `batches__compacting/`. Renames only — no data copies on HDFS/local; on
    an object store the rename is a copy, same as any directory swap."""
    fs, mkpath = _hadoop_fs(spark, path)
    src, dst = mkpath(f"{path}/batches"), mkpath(f"{path}/{_SNAP_DIR}")
    if not fs.exists(src):
        return
    if not fs.exists(dst):
        if not fs.rename(src, dst):
            raise IOError(f"snapshot rename failed: {src} -> {dst}")
        return
    for st in fs.listStatus(src):
        child_dst = mkpath(f"{path}/{_SNAP_DIR}/{st.getPath().getName()}")
        if fs.exists(child_dst):
            # same batch id parked by a crashed compaction AND re-created by
            # a streaming replay: per-batch appends are idempotent (identical
            # content for a batch id), so drop the duplicate copy
            fs.delete(st.getPath(), True)
        elif not fs.rename(st.getPath(), child_dst):
            # Hadoop rename reports failure via its return value, not an
            # exception — surface it instead of silently bulk-deleting src
            raise IOError(
                f"snapshot merge rename failed: {st.getPath()} -> {child_dst}"
            )
    fs.delete(src, True)


def _commit_compaction(spark, path: str, names: tuple[str, ...]) -> None:
    """Swap every staged `{name}__compact_tmp` into place, then drop the
    snapshot and the marker. IDEMPOTENT over any crash point: each step is
    conditioned on what exists, so re-running finishes a partial commit
    (tmp already swapped -> skipped; live already renamed away -> tmp just
    renamed in) without double-folding anything."""
    fs, mkpath = _hadoop_fs(spark, path)
    for name in names:
        tmp = mkpath(f"{path}/{name}__compact_tmp")
        live = mkpath(f"{path}/{name}")
        old = mkpath(f"{path}/{name}__compact_old")
        if fs.exists(tmp):
            # Hadoop rename reports failure via its return value, not an
            # exception — a silently failed swap followed by the snapshot
            # delete below would lose the only surviving copy
            if fs.exists(live) and not fs.rename(live, old):
                raise IOError(f"compaction rename failed: {live} -> {old}")
            if not fs.rename(tmp, live):
                raise IOError(f"compaction rename failed: {tmp} -> {live}")
        if fs.exists(old):
            fs.delete(old, True)
    fs.delete(mkpath(f"{path}/{_SNAP_DIR}"), True)
    fs.delete(mkpath(f"{path}/{_COMMIT_MARKER}"), True)
    # drop any session-shared cached file listings for the swapped dirs
    spark.catalog.refreshByPath(path)


def _write_commit_marker(spark, path: str) -> None:
    fs, mkpath = _hadoop_fs(spark, path)
    fs.create(mkpath(f"{path}/{_COMMIT_MARKER}"), True).close()


def _has_commit_marker(spark, path: str) -> bool:
    fs, mkpath = _hadoop_fs(spark, path)
    return bool(fs.exists(mkpath(f"{path}/{_COMMIT_MARKER}")))


def _data_roots(spark, path: str, data_subdir: str) -> list[str]:
    """All parquet roots of a layout's data relation: the base directory plus
    any idempotent per-batch appends (see append_to_layout's batch_id)."""
    return [f"{path}/{data_subdir}"] + [
        f"{b}/{data_subdir}" for b in _batch_roots(spark, path)
    ]


def _union_roots(spark, roots: list[str]) -> DataFrame:
    # one read per root (multi-path partition discovery rejects nested roots);
    # pruning predicates still push into every union branch's scan
    out = spark.read.parquet(roots[0])
    for r in roots[1:]:
        out = out.unionByName(spark.read.parquet(r))
    return out


def _read_layout(spark, path: str, data_subdir: str) -> DataFrame:
    return _union_roots(spark, _data_roots(spark, path, data_subdir))


def _read_sidecar(spark, path: str, name: str) -> DataFrame:
    roots = [f"{path}/{name}"] + [f"{b}/{name}" for b in _batch_roots(spark, path)]
    return _union_roots(spark, roots)


def _estimate_selectivity(relation: DataFrame, predicate: Column) -> float:
    """Fraction of `relation` rows passing `predicate`, in ONE pass (a single
    count/count-if aggregate). Callers hand this the tiny persisted sample
    when one exists — never the full index relation of a loaded layout."""
    from pyspark.errors import AnalysisException

    try:
        row = relation.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(predicate, F.lit(1))).alias("kept"),
        ).collect()[0]
    except AnalysisException as ex:
        # loaded layouts estimate from the sample sidecar, which drops the
        # vector/codes columns — surface the contract instead of a raw
        # unresolved-column error
        raise ValueError(
            "adaptive_nprobe selectivity estimation runs on the sample "
            f"sidecar (columns: {relation.columns}); the predicate must "
            "reference only metadata columns carried by the sample — "
            "vector/codes columns are dropped from it by design"
        ) from ex
    return (row["kept"] / row["n"]) if row["n"] else 1.0


def _compact_layout(
    spark,
    path: str,
    data_subdir: str,
    id_col: str,
    drop_cols: tuple[str, ...],
    files_per_bucket: int = 1,
    bucket_col: str = "partition_id",
    write_sidecars: bool = True,
    staged_names: tuple[str, ...] = (),
) -> int:
    """Maintenance: merge the base directory and all per-batch appends into a
    fresh bucketed base with ~files_per_bucket files per bucket, rewrite the
    stats/sample sidecars from the merged relation, and drop the batch dirs.

    Append-heavy streaming maintenance (maintain_index_stream at a 10 s
    trigger ≈ 8.6k appends/day) otherwise degrades the layout into a
    small-file swamp. Run this from a maintenance window with the stream
    QUIESCED AND ITS LAST BATCH CHECKPOINT-COMMITTED: compaction folds the
    batch directories into the base and deletes them, so a batch that was
    written but not yet committed would be re-delivered on restart and
    duplicate its vectors.

    CRASH SAFETY (single-writer contract): the batch set is first frozen by
    renaming `batches/` -> `batches__compacting/` (readers union both, so
    exactly one copy of every batch stays visible), then ALL merged output
    is staged under `__compact_tmp` dirs, and only then does a marker-file-
    guarded commit swap everything in and drop the snapshot. A crash before
    the marker leaves base + snapshot untouched (retry recomputes from the
    same state — no double-fold); a crash during the commit is finished
    idempotently on the next call via `_commit_compaction`. Readers during
    the commit's directory renames can briefly fail or see relations from
    two generations — on an object store front this with a versioned
    manifest. Returns the merged row count.

    `staged_names` lets a caller (compact_term_index) pre-stage additional
    sidecar relations whose swap must ride the SAME commit."""
    marker_names = (data_subdir,) + tuple(staged_names)
    if _has_commit_marker(spark, path):
        # a previous run crashed mid-commit; its staged tmps are complete
        # (the marker is written only after every tmp), so finish it first
        _commit_compaction(spark, path, marker_names)
    _snapshot_batches(spark, path)
    merged = _read_layout(spark, path, data_subdir)
    n_buckets = merged.select(bucket_col).distinct().count()
    tmp = f"{path}/{data_subdir}__compact_tmp"
    # hash-partitioning on the bucket column alone routes ALL of a bucket's
    # rows to one task regardless of partition count, so files_per_bucket>1
    # needs an explicit deterministic salt key alongside the bucket
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(max(1, files_per_bucket)))
    (
        merged.repartition(
            max(1, n_buckets * files_per_bucket), F.col(bucket_col), salt
        )
        .write.mode("overwrite")
        .partitionBy(bucket_col)
        .parquet(tmp)
    )
    _write_commit_marker(spark, path)
    _commit_compaction(spark, path, marker_names)
    compacted = spark.read.parquet(f"{path}/{data_subdir}")
    if write_sidecars:
        _write_sidecars(
            path, compacted, id_col=id_col, drop_cols=drop_cols,
            bucket_col=bucket_col,
        )
    return compacted.count()


# JL seeding sketch thresholds (see _kmeans_numpy): the gate at 256 keeps
# every <=255-d trained artifact (all 64-d anchors) bit-identical to prior
# rounds; 128 sketch dims hold pairwise D^2 weights within ~12% at the
# 100k-sample scale (JL bound), far inside what Lloyd refinement absorbs.
_SEED_PROJ_MIN_DIM = 256
_SEED_PROJ_DIM = 128


def _kmeans_numpy(
    X: np.ndarray, k: int, seed: int, max_iter: int, n_init: int = 4
) -> np.ndarray:
    """Seeded k-means++ / Lloyd's on the (bounded) training sample, best of
    `n_init` restarts by inertia.

    The coarse quantizer trains on at most `train_sample_rows` points, so the
    whole fit is a driver-local numpy job (FAISS does the same: IVF training
    runs on a sample, not the corpus). This replaces pyspark.ml.KMeans, which
    costs ~2 Spark jobs per iteration — pure scheduling overhead when the
    training set is sample-sized by construction. Restarts are cheap at
    sample scale and recover the quality of kmeans||'s more robust seeding.
    """
    X = np.ascontiguousarray(X, dtype=np.float64)
    n = X.shape[0]
    xn = (X * X).sum(axis=1)

    # high-dim seeding sketch (round 11): at d >= _SEED_PROJ_MIN_DIM the
    # k-means++ D^2-sampling distances run in a JL sign-projected space
    # (one GEMM up front) instead of full dimension — the seeding loop is
    # k sequential full-matrix passes (n x d memory traffic each), which
    # the 768-d build profile showed is dimension-driven. JL preserves the
    # relative D^2 weights within epsilon, the SELECTED seeds are full-dim
    # rows of X (picked by index), and Lloyd below refines in full
    # dimension — seeding quality differences wash out by iteration 2
    # (same argument as FAISS training on a subsample). The projection is
    # seeded from `seed` alone, so the fit stays deterministic and
    # partition-invariant; the d < 256 gate keeps every 64-d anchored
    # artifact bit-identical to prior rounds.
    d_full = X.shape[1]
    if d_full >= _SEED_PROJ_MIN_DIM:
        rng_p = np.random.RandomState(seed ^ 0x5EED)
        R = rng_p.choice(
            (-1.0, 1.0), size=(d_full, _SEED_PROJ_DIM)
        ) / np.sqrt(_SEED_PROJ_DIM)
        Xs = X @ R
    else:
        Xs = X
    xsn = xn if Xs is X else (Xs * Xs).sum(axis=1)

    def one_run(rng: np.random.RandomState) -> tuple[float, np.ndarray]:
        # k-means++ seeding (in the sketch space when projected). Per-
        # candidate distances use the same ||x||^2 - 2 x.c + ||c||^2
        # expansion as the Lloyd step below (one dot product per point
        # instead of a materialized (n x d) diff — the seeding loop was
        # most of the fit's wall time at k=512), clamped at 0 so rounding
        # can't hand rng.choice a negative weight.
        centroids = np.empty((k, d_full), dtype=np.float64)

        def d2_to(i: int) -> np.ndarray:
            c = Xs[i]
            return np.maximum(xsn - 2.0 * (Xs @ c) + c @ c, 0.0)

        i0 = rng.randint(n)
        centroids[0] = X[i0]
        d2 = d2_to(i0)
        for j in range(1, k):
            tot = d2.sum()
            if tot <= 0:
                ij = rng.randint(n)
            else:
                ij = rng.choice(n, p=d2 / tot)
            centroids[j] = X[ij]
            d2 = np.minimum(d2, d2_to(ij))
        dmin = d2
        # one reusable (n x k) GEMM buffer for the whole Lloyd loop: at
        # k=4096 the buffer is 3.3 GB, and the alloc/fault/free cycle plus
        # the separate `G *= -2` pass measured ~4 s of the 6.4 s iteration
        # (round-10 profile). x @ (-2c) multiplies each product by an exact
        # power of two, so folding the -2 into the centroid matrix is
        # BIT-identical to scaling the GEMM output.
        G = np.empty((n, k), dtype=np.float64)
        # high-d cluster sums ride a one-hot GEMM (A.T @ X) instead of the
        # fused-index bincount: the bincount builds an (n*d) int64 index
        # (614 MB at 100k x 768) and scatters under the GIL — 3.3 s/iter at
        # 768-d AND serializing the concurrent restarts; the GEMM is
        # ~0.5 s/iter and releases the GIL. Gated with the seeding sketch
        # (d >= 256) so every <=255-d anchored artifact keeps the
        # bincount's exact summation order, bit-identical to prior rounds.
        gemm_sums = d_full >= _SEED_PROJ_MIN_DIM
        if gemm_sums:
            A = np.zeros((n, k), dtype=np.float64)
            rows_n = np.arange(n)
        for _ in range(max_iter):
            cn = (centroids * centroids).sum(axis=1)
            # assignment: ||x||^2 is constant per row, so argmin only needs
            # cn - 2 x.c — computed in place on the GEMM output (the
            # three-temporary broadcast sum this replaces allocated ~600 MB
            # per iteration at 100k x 256)
            np.matmul(X, (-2.0 * centroids).T, out=G)
            G += cn[None, :]
            assign = np.argmin(G, axis=1)
            dmin = xn + G[np.arange(n), assign]
            d_ = X.shape[1]
            if gemm_sums:
                A[rows_n, assign] = 1.0
                sums = A.T @ X
                A[rows_n, assign] = 0.0
            else:
                # per-cluster means via ONE fused-index bincount over the
                # flattened sample ((cluster, column) -> k*d bins) — the
                # per-column bincount loop this replaces was most of the
                # fit's wall time, and np.add.reduceat is no faster
                flat_idx = (
                    assign[:, None] * d_ + np.arange(d_)[None, :]
                ).ravel()
                sums = np.bincount(
                    flat_idx, weights=X.ravel(), minlength=k * d_
                ).reshape(k, d_)
            counts = np.bincount(assign, minlength=k).astype(np.float64)
            new = centroids.copy()  # empty cluster keeps its previous centroid
            nonempty = counts > 0
            new[nonempty] = sums[nonempty] / counts[nonempty, None]
            if np.allclose(new, centroids):
                break
            centroids = new
        return float(dmin.sum()), centroids

    # restarts run CONCURRENTLY (driver threads): each restart's rng stream
    # is independent by construction (seed + 1000003*r), and numpy releases
    # the GIL inside the GEMM/argmin/bincount kernels that dominate, so the
    # fit is bit-identical to the sequential loop — same runs, same
    # first-strictly-smaller-inertia winner (min over (inertia, r)) — at
    # ~n_init x less wall (the 512c coarse fit was 33 s of the 5M build).
    # Concurrency is MEMORY-capped, not n_runs-capped: each live restart
    # holds an (n x k) float64 GEMM output plus ~2x temporaries (~400 MB at
    # 100k x 512), so all-restarts-at-once multiplies driver peak by n_init.
    # The budget scales with HOST memory (total/8, clamped to [2, 16] GiB):
    # the first cut pinned a flat 2 GiB, which on the 128 GiB bench host
    # forced workers=1 at k=1024 (1.6 GB/run) and serialized the restarts —
    # a 2.5x trained-build regression (ivf_build_1024c 28->72 s, round-9
    # re-anchor) for memory headroom the host didn't need. The winner
    # selection is order-independent, so the cap changes wall time only,
    # never the trained artifact.
    import os
    from concurrent.futures import ThreadPoolExecutor

    try:
        total_mem = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError):  # non-POSIX fallback
        total_mem = 16 << 30
    budget = max(2 << 30, min(16 << 30, total_mem // 8))
    # restart count scales DOWN with k: per-restart cost grows linearly in k
    # while restart-to-restart inertia variance shrinks (each restart is a
    # mean over k centroid basins; FAISS ships nredo=1 at every k). k<2048
    # keeps the full n_init so every anchored build (64..1024c) is
    # bit-identical to prior rounds; 4096c measured 421 s at n_init=4 in the
    # round-10 5M graph bench — the single-restart fit is ~4x that wall for
    # quality the recall contracts never distinguish.
    if k >= 4096:
        n_init = min(n_init, 1)
    elif k >= 2048:
        n_init = min(n_init, 2)
    # same budget discipline on the n*d axis (round 11): per-restart cost
    # is linear in d while restart variance is not — the 768-d profile
    # showed the 512c coarse fit at n_init=4 costing 147.5 s of a 266.5 s
    # IVFPQ build. The d gate matches the seeding sketch's, so <=255-d
    # anchors keep their full restart count (bit-identical artifacts).
    if X.shape[1] >= _SEED_PROJ_MIN_DIM:
        n_init = min(n_init, 2)
    n_runs = max(1, n_init)
    # G + assignment temporaries (+ the one-hot A at the high-d gate)
    per_run_bytes = X.shape[0] * k * 8 * (
        3 if X.shape[1] >= _SEED_PROJ_MIN_DIM else 2
    )
    workers = max(1, min(n_runs, budget // max(1, per_run_bytes)))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        runs = list(
            ex.map(
                lambda r: one_run(np.random.RandomState(seed + 1000003 * r)),
                range(n_runs),
            )
        )
    return runs[min(range(n_runs), key=lambda i: (runs[i][0], i))][1]


def _with_partition_id(df: DataFrame, centroids: np.ndarray, vec_col: str) -> DataFrame:
    """``df`` + a ``partition_id`` column: nearest-centroid assignment over
    the broadcast centroid matrix, as ONE mapInArrow pass — the single
    full-corpus scan of a trained build. argmin of the `cn - 2 V.C`
    expansion (|v|^2 is constant per row, argmin-safe); np.argmin's
    first-minimum is the lowest-centroid-id tie-break. The vector column is
    reshaped straight from the Arrow values buffer instead of a per-row
    ``tolist()``, which at corpus scale (5M rows) was most of the
    assignment scan's wall time under the prior pandas_udf form. All other
    columns pass through untouched (filtered search binds predicates
    against them)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)
    out_schema = StructType(
        list(df.schema.fields) + [StructField("partition_id", IntegerType())]
    )

    def assign(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_vectors(batch, vec_col)
            d = cn[None, :] - 2.0 * (V @ C.T)  # |v|^2 constant per row
            yield batch.append_column(
                "partition_id",
                pa.array(np.argmin(d, axis=1).astype(np.int32), type=pa.int32()),
            )

    return df.mapInArrow(assign, out_schema)


def _with_partition_id_exact(
    df: DataFrame, centroids: np.ndarray, vec_col: str
) -> DataFrame:
    """``df`` + ``partition_id`` via an assignment that is BIT-IDENTICAL to
    the SQL-fold argmin the DuckDB oracles compute (build_fixed's contract):
    per-element (x - y)*(x - y) is exact in any order, the distance
    accumulates one element index per step in ascending order — the same
    doubles as the 0.0-seeded element-ascending aggregate fold — and
    np.argmin's first-minimum matches the strict-< keep-lowest-centroid
    tie-break. No matmul rearrangement (the fast `cn - 2 v.C` form of
    _with_partition_id changes ulps and could flip near-ties, which
    training-free fixed builds cannot tolerate). Same ONE mapInArrow
    pass-through shape as _with_partition_id — the flat-buffer decode is
    exact, so swapping it for the prior per-row ``tolist()`` changes no
    assignment."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    out_schema = StructType(
        list(df.schema.fields) + [StructField("partition_id", IntegerType())]
    )

    def assign(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_vectors(batch, vec_col)
            # sequential accumulation over the element axis: identical
            # left-to-right fold order with only (batch x k) working memory —
            # a materialized (batch x k x dim) difference cube (or cumsum of
            # it) peaks at multiple GB per task at real centroid counts
            dist = np.zeros((V.shape[0], C.shape[0]), dtype=np.float64)
            for i in range(C.shape[1]):
                d = V[:, i, None] - C[None, :, i]
                dist += d * d
            yield batch.append_column(
                "partition_id",
                pa.array(np.argmin(dist, axis=1).astype(np.int32), type=pa.int32()),
            )

    return df.mapInArrow(assign, out_schema)


@dataclass
class IVFIndex:
    centroids: DataFrame  # (centroid_id int, centroid array<float>)
    assigned: DataFrame   # corpus + partition_id
    metric: Metric
    n_centroids: int
    build_seconds: float
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    # tiny hash-gated sample of the non-vector columns, loaded from a written
    # layout's sidecar; lets adaptive_nprobe estimate predicate selectivity
    # without ever scanning the full assigned relation
    sel_sample: DataFrame | None = None

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
        materialize: bool = True,
        train_matrix: np.ndarray | None = None,
    ) -> "IVFIndex":
        """Offline index-build job (the analog of cagra.build / HNSW add;
        build wall-time is the reference's build_time_seconds metric).

        The coarse quantizer is trained on a bounded sample (standard IVF
        practice — FAISS trains on ~max(10k, 256*k) points): at 100 TB the
        KMeans iterations run over `train_sample_rows` rows, while the full
        corpus is only touched once, by the final assignment scan.

        ``train_matrix``: the already-collected training sample, for
        composing builders (IVFPQ) that draw the SAME deterministic
        hash-ordered sample for their own training stages — passing it
        skips this build's sample-collect scan (one corpus sampling pass
        instead of two, identical artifact: the draw is the same raw-vector
        hash key and cap either way).
        """
        t0 = time.time()
        # Hash-ordered bounded sample (same discipline as pq.pq_train):
        # df.sample() AND plain collect() order are both partition-dependent,
        # and k-means++ seeding consumes rows by position — so without a
        # deterministic order the trained index would vary with input
        # partitioning, breaking the engine's partition-invariance principle.
        if train_matrix is not None:
            X = train_matrix
        else:
            from .pq import _train_sample_raw

            X = _train_sample_raw(corpus, vec_col, train_sample_rows)
        if len(X) == 0:
            raise ValueError("cannot build an IVF index over an empty corpus")
        # a high-selectivity filter can leave fewer rows than centroids
        n_centroids = min(n_centroids, len(X))
        centers = _kmeans_numpy(X, n_centroids, seed=seed, max_iter=max_iter)
        spark = corpus.sparkSession
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            "centroid_id int, centroid array<float>",
        )
        # pass-through assignment, not a narrow select: metadata columns
        # (rating buckets, categories) must survive into the index artifact
        # so filtered search predicates bind against it — same contract as
        # build_fixed
        # fan_out: the Arrow assignment kernel runs on the scan's tasks, so
        # a single-split corpus serializes the whole assignment DGEMM on one
        # core (guide §2.5; no-op on multi-split corpora). Per-row argmin —
        # partition-invariant.
        from ..datasets import fan_out_small_scan

        assigned = _with_partition_id(fan_out_small_scan(corpus), centers, vec_col)
        if materialize:
            # materialize: the index artifact. materialize=False leaves the
            # assignment lazy so a composing consumer (IVFPQ) can fuse it
            # into ITS materialization pass — one corpus scan instead of two.
            # repartition+sort on the bucket key CO-LOCATES each bucket in
            # one contiguous run, so the Arrow kernels' per-(batch, bucket)
            # local top-k actually caps. Without it every Spark partition
            # holds ~|bucket|/n_partitions-row fragments of every bucket and
            # the "partials" are nearly the whole candidate set (measured at
            # 1M x 10k queries x rerank 100: 321M merge-input rows instead
            # of ~8M; search 23.2s -> 8.7s end to end). One build-time
            # shuffle of the index artifact buys it — the same property
            # written layouts get from partitionBy at write time.
            assigned = (
                assigned.repartition(F.col("partition_id"))
                .sortWithinPartitions("partition_id")
                .persist()
            )
            assigned.count()
        idx = IVFIndex(
            centroids=centroids,
            assigned=assigned,
            metric=metric,
            n_centroids=n_centroids,
            build_seconds=time.time() - t0,
            id_col=id_col,
            vec_col=vec_col,
        )
        # driver-side centroid matrix for composing builders (IVFPQ residual
        # training) — saves them a centroids.collect() round trip; the
        # DataFrame float roundtrip is exact, so using either is identical
        idx._centers_np = centers
        return idx

    @staticmethod
    def build_fixed(
        corpus: DataFrame,
        n_centroids: int = 32,
        metric: Metric = "sqeuclidean",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        materialize: bool = True,
    ) -> "IVFIndex":
        """Deterministic coarse quantizer: centroids are the ``n_centroids``
        corpus vectors with the smallest ``(md5(id), id)`` — no training
        loop, so the ENTIRE index (centroid pick, assignment, probe, rerank)
        is reproducible in SQL and DuckDB-oracle-checkable. Recall is below
        trained KMeans (random pivots), but the search path it exercises is
        identical — this is the correctness harness for the IVF machinery;
        ``build`` is the quality path.

        Assignment runs as an Arrow-batched exact kernel
        (_with_partition_id_exact)
        whose fold order and tie-break are bit-identical to the oracle's SQL
        form (element-ascending squared-difference sum, lowest centroid_id
        on ties) — interpreted HOF expressions cost ~1ms/row for the
        n_centroids x dim sweep, which would dominate a corpus-scale build.
        """
        t0 = time.time()
        pick = (
            corpus.select(id_col, vec_col)
            .withColumn("_h", F.md5(F.col(id_col).cast("string")))
            .orderBy(F.col("_h").asc(), F.col(id_col).asc())
            .limit(n_centroids)
            .collect()
        )
        if not pick:
            raise ValueError("cannot build an IVF index over an empty corpus")
        centers = np.array([r[vec_col] for r in pick], dtype=np.float64)
        spark = corpus.sparkSession
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            "centroid_id int, centroid array<float>",
        )
        n = len(centers)
        # fan_out: same single-split mitigation as build() — the exact
        # assignment kernel is per-row, partition-invariant
        from ..datasets import fan_out_small_scan

        assigned = _with_partition_id_exact(fan_out_small_scan(corpus), centers, vec_col)
        if materialize:
            # bucket co-location — see build() for the rationale
            assigned = (
                assigned.repartition(F.col("partition_id"))
                .sortWithinPartitions("partition_id")
                .persist()
            )
            assigned.count()
        return IVFIndex(
            centroids=centroids,
            assigned=assigned,
            metric=metric,
            n_centroids=n,
            build_seconds=time.time() - t0,
            id_col=id_col,
            vec_col=vec_col,
        )

    def write_bucketed(self, path: str, n_buckets: int | None = None) -> None:
        """Persist the IVF layout: corpus Parquet partitioned by partition_id
        (so a probe scan prunes to nprobe directories) + the centroid table +
        the stats/sample sidecars (per-bucket row counts and a bounded
        selectivity sample — search-time policies read THESE, never the full
        relation). `IVFIndex.load` restores a searchable index from this
        layout."""
        self.assigned.write.mode("overwrite").partitionBy("partition_id").parquet(
            f"{path}/assigned"
        )
        self.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        _write_sidecars(
            path, self.assigned, id_col=self.id_col, drop_cols=(self.vec_col,)
        )

    @staticmethod
    def load(
        spark,
        path: str,
        metric: Metric = "sqeuclidean",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        """Open a written IVF layout (base directory plus any per-batch
        appends). Searches against a loaded index read only the probed
        partition directories (partition pruning / dynamic partition pruning
        at the scan — verified in tests)."""
        centroids = spark.read.parquet(f"{path}/centroids")
        assigned = _read_layout(spark, path, "assigned")
        try:
            sel_sample = _read_sidecar(spark, path, "sample").persist()
        except Exception:  # pre-sidecar layout vintage
            sel_sample = None
        return IVFIndex(
            centroids=centroids,
            assigned=assigned,
            metric=metric,
            n_centroids=centroids.count(),
            build_seconds=0.0,
            id_col=id_col,
            vec_col=vec_col,
            sel_sample=sel_sample,
        )

    @staticmethod
    def append_to_layout(
        spark,
        path: str,
        new_rows: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        batch_id: int | None = None,
    ) -> int:
        """Incremental index maintenance: assign NEW vectors to the layout's
        EXISTING centroids and append them to the bucketed Parquet — the
        standard IVF add-without-retrain operation (FAISS `index.add`;
        retraining cadence is an offline policy decision).

        With ``batch_id=None`` (caller-driven, non-replayed adds) the rows
        append into the base directories. With a ``batch_id`` (streaming
        foreachBatch, where a crash between write and checkpoint commit
        REPLAYS the batch) the whole batch — data, stats, sample — is written
        mode("overwrite") under a batchId-derived subdirectory, so a replay
        rewrites the same deterministic content instead of duplicating it:
        idempotent per batch id, i.e. effectively exactly-once. Loads union
        the base with all batch directories; `compact_layout` folds them
        back in. Returns the number of rows appended."""
        centroids = spark.read.parquet(f"{path}/centroids").orderBy("centroid_id")
        centers = np.array(
            [r["centroid"] for r in centroids.collect()], dtype=np.float64
        )
        if len(centers) == 0:
            raise ValueError(f"no centroids found under {path}")
        # appended rows must carry every column the layout has — filtered
        # searches bind predicates against them, and a NULL-backfilled append
        # would silently hide the new vectors from filtered results
        layout_cols = [
            c
            for c in spark.read.parquet(f"{path}/assigned").columns
            if c != "partition_id"
        ]
        missing = [c for c in layout_cols if c not in new_rows.columns]
        if missing:
            raise ValueError(
                f"new_rows lacks columns the written layout carries: {missing} "
                f"(layout schema: {layout_cols})"
            )
        # restrict to the layout schema: extra new_rows columns would write
        # wider parquet files whose union with the base fails on load
        assigned = _with_partition_id(
            new_rows.select(*layout_cols), centers, vec_col
        ).persist()
        n = assigned.count()
        try:
            frac = _sample_fraction(spark, path)
        except Exception:  # pre-sidecar layout vintage
            frac = None
        if batch_id is None:
            assigned.write.mode("append").partitionBy("partition_id").parquet(
                f"{path}/assigned"
            )
            if frac is not None:
                assigned.groupBy("partition_id").agg(
                    F.count(F.lit(1)).alias("n_rows")
                ).coalesce(1).write.mode("append").parquet(f"{path}/stats")
                assigned.filter(_sample_gate(id_col, frac)).drop(vec_col).coalesce(
                    1
                ).write.mode("append").parquet(f"{path}/sample")
        else:
            root = _batch_root(path, batch_id)
            assigned.write.mode("overwrite").partitionBy("partition_id").parquet(
                f"{root}/assigned"
            )
            if frac is not None:
                _write_sidecars(
                    root, assigned, id_col=id_col, drop_cols=(vec_col,), fraction=frac
                )
        assigned.unpersist()
        return n

    @staticmethod
    def compact_layout(spark, path: str, files_per_bucket: int = 1) -> int:
        """Fold per-batch appends into the base layout and bound files per
        bucket (see _compact_layout for semantics/caveats)."""
        idx = IVFIndex.load(spark, path)
        id_col, vec_col = idx.id_col, idx.vec_col
        if idx.sel_sample is not None:
            idx.sel_sample.unpersist()
        return _compact_layout(
            spark,
            path,
            "assigned",
            id_col=id_col,
            drop_cols=(vec_col,),
            files_per_bucket=files_per_bucket,
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 8,
        predicate: Column | None = None,
        adaptive_nprobe: bool = False,
        arrow_score: bool | str = False,
    ) -> DataFrame:
        """Filtered approximate top-k. `queries` is (query_id, q_vec);
        `predicate` (over assigned-corpus columns) is applied BEFORE candidate
        selection — filter-then-top-k semantics.

        ``arrow_score=True`` (sqeuclidean only) swaps the per-candidate HOF
        distance fold for the Arrow-batched numpy kernel — bit-identical
        rows (same element-ascending fold, same (dist, id) tie-break), the
        large-query-batch throughput form; see IVFPQIndex.search(arrow_adc)
        for the shared rationale. ``arrow_score="blas"`` scores each bucket
        with one DGEMM instead of the fold (the exact tier's stable
        expansion): same probe sets, same tie-break, distances equal to
        last-ulps rather than bit-identical — the fastest batch form (see
        `_sqeuclidean_blas_scorer`). The expression path stays the default
        (DuckDB-oracle tier, no driver-side query collect).

        ``adaptive_nprobe=True`` widens the probe count by 1/selectivity under
        a selective predicate (clamped to n_centroids): a filter keeping s of
        the corpus thins every probed partition to s of its rows, so holding
        the CANDIDATE count constant requires nprobe/s probes. This is
        standard filtered-ANN practice — the reference's own best
        high-selectivity configs widen search_width (BASELINE.md: mid_rated
        best uses sw=4 vs low_rated's sw=2). Selectivity is estimated from
        the layout's tiny persisted sample sidecar when one exists (loaded
        indexes), else one single-pass aggregate over the in-memory persisted
        assignment — the full index relation of a written layout is never
        scanned by the search path.
        """
        if adaptive_nprobe and predicate is not None:
            sel = _estimate_selectivity(
                self.sel_sample if self.sel_sample is not None else self.assigned,
                predicate,
            )
            if sel > 0:
                import math

                nprobe = int(math.ceil(nprobe / sel))
            else:
                # zero sample hits means the predicate is at or below the
                # sample's resolution (~1/SEL_SAMPLE_ROWS) — the ultra-
                # selective case widening exists FOR; open every bucket
                # rather than silently keeping the base nprobe
                nprobe = self.n_centroids
        nprobe = min(nprobe, self.n_centroids)

        corpus = self.assigned
        if predicate is not None:
            corpus = corpus.filter(predicate)

        if arrow_score:
            if arrow_score not in (True, "fold", "blas"):
                raise ValueError(
                    f"arrow_score must be False, True/'fold', or 'blas'; "
                    f"got {arrow_score!r}"
                )
            if self.metric != "sqeuclidean":
                raise NotImplementedError(
                    "arrow_score implements the sqeuclidean fold; use the "
                    f"expression path for metric={self.metric!r}"
                )
            # probe ranking rides INSIDE the kernel (driver-side numpy over
            # the collected query matrix, _probe_lists_numpy) — same fold +
            # tie-break as the knn_window job the expression path runs, at
            # none of its interpreted-HOF cost on large query batches
            scored = self._score_candidates_arrow(
                queries, nprobe, corpus, k, blas=(arrow_score == "blas")
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("dist").asc(), F.col("neighbor_id").asc()
            )
            return (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank", "dist")
            )

        # 1. rank centroids per query: tiny broadcast cross join + window
        probes = knn_window(
            queries,
            self.centroids,
            k=nprobe,
            metric="sqeuclidean" if self.metric != "inner_product" else "inner_product",
            id_col="centroid_id",
            vec_col="centroid",
            fan_out=False,
        ).select("query_id", F.col("neighbor_id").alias("partition_id"))

        # 2. candidates via equi-join on the bucket key. The probe list is
        #    queries x nprobe rows — always the small side; broadcast it
        #    explicitly so the corpus NEVER shuffles or broadcasts (at 100 TB
        #    the corpus relation must only ever stream).
        q_side = queries
        c_side = corpus
        if self.metric == "cosine":
            # hoist the per-row norm folds below the join (see
            # vec_cosine_distance_prenorm): cosine candidate scoring then
            # evaluates ONE interpreted fold per candidate instead of three
            # — bit-identical distances
            q_side = queries.select(
                "query_id", "q_vec", V.vec_norm(F.col("q_vec")).alias("_qn")
            )
            c_side = corpus.select(
                "partition_id",
                F.col(self.id_col),
                F.col(self.vec_col),
                V.vec_norm(F.col(self.vec_col)).alias("_cn"),
            )
        cand = (
            F.broadcast(probes).join(c_side, "partition_id")
            .join(F.broadcast(q_side), "query_id")
        )
        # 3. exact rerank via the window form, NOT topk_agg: with no dedup
        #    shuffle to eliminate (every corpus row lives in exactly one
        #    partition), the window's WindowGroupLimit pushdown — local
        #    per-query top-k BEFORE the exchange — beats an aggregation that
        #    must shuffle every candidate into collect_list (measured ~20%
        #    on the bench; the gap grows with candidates/query at scale).
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

    def range_search(
        self,
        queries: DataFrame,
        radius: float,
        nprobe: int = 8,
        predicate: Column | None = None,
        arrow_score: bool = False,
    ) -> DataFrame:
        """Probed radius search: every corpus row within ``radius`` of each
        query, scanning only the nprobe nearest cells — FAISS's public IVF
        ``range_search`` contract (approximate: neighbors living in
        unprobed cells are missed; recall is governed by nprobe, exact at
        nprobe == n_centroids). Returns (query_id, neighbor_id, dist) with
        set semantics (see operators/range_search.py).

        Plan shape matches ``search``'s candidate stage — broadcast probe
        list equi-joined on the bucket key so the corpus only ever streams —
        but the top-k window is REPLACED by a fused radius predicate: zero
        exchanges after the candidate join, cheaper than top-k at scale.
        """
        nprobe = min(nprobe, self.n_centroids)
        corpus = self.assigned
        if predicate is not None:
            corpus = corpus.filter(predicate)

        if arrow_score:
            # the batch-throughput form: probed buckets scored as vectorized
            # blocks inside the scaffold's radius mode — the expression path
            # below evaluates the interpreted HOF fold once per CANDIDATE
            # (queries x nprobe x bucket rows: ~3x10^9 at 5M/10kq/nprobe=32,
            # the same trap the graph kernel closed). Kernel rows ARE the
            # final relation — no window, no dedup (one bucket per corpus
            # row).
            if self.metric != "sqeuclidean":
                raise NotImplementedError(
                    "range_search(arrow_score=True) implements the "
                    f"sqeuclidean fold; got metric={self.metric!r}"
                )
            rows = self.centroids.collect()
            dim = len(rows[0]["centroid"]) if rows else 0
            cent = np.zeros((self.n_centroids, dim), dtype=np.float64)
            for r in rows:
                cent[int(r["centroid_id"])] = np.asarray(
                    r["centroid"], dtype=np.float64
                )
            return _arrow_bucket_topk(
                queries,
                corpus,
                id_col=self.id_col,
                data_col=self.vec_col,
                data_dtype="float64",
                top=0,  # unused in radius mode
                out_col="dist",
                extra=(),
                bucket_scorer=_sqeuclidean_bucket_scorer,
                kernel_name="range_search_arrow",
                probe_spec=(cent, nprobe, self.centroids),
                radius=radius,
            )

        probes = knn_window(
            queries,
            self.centroids,
            k=nprobe,
            metric="sqeuclidean" if self.metric != "inner_product" else "inner_product",
            id_col="centroid_id",
            vec_col="centroid",
            fan_out=False,
        ).select("query_id", F.col("neighbor_id").alias("partition_id"))
        cand = (
            F.broadcast(probes).join(corpus, "partition_id")
            .join(F.broadcast(queries), "query_id")
        )
        d, asc = distance_col(self.metric, F.col("q_vec"), F.col(self.vec_col))
        pred = (F.col("dist") <= radius) if asc else (F.col("dist") >= radius)
        return (
            cand.select(
                "query_id", F.col(self.id_col).alias("neighbor_id"), d.alias("dist")
            )
            .filter(pred)
            .select("query_id", "neighbor_id", "dist")
        )

    def _score_candidates_arrow(
        self,
        queries: DataFrame,
        nprobe: int,
        corpus: DataFrame,
        top: int,
        blas: bool = False,
    ) -> DataFrame:
        """Arrow-batched exact scoring of probed buckets (sqeuclidean) —
        the shared `_arrow_bucket_topk` scaffold with the element-ascending
        (x-y)^2 fold as the bucket scorer; bit-identical rows to the
        expression form (tests assert it). ``blas=True`` swaps in the DGEMM
        expansion (last-ulps-equal distances, same probe sets/tie-break).
        Probe ranking happens inside the scaffold via ``probe_spec``
        (driver-side, same fold/tie-break either way)."""
        rows = self.centroids.collect()
        dim = len(rows[0]["centroid"]) if rows else 0
        cent = np.zeros((self.n_centroids, dim), dtype=np.float64)
        for r in rows:
            cent[int(r["centroid_id"])] = np.asarray(r["centroid"], dtype=np.float64)
        return _arrow_bucket_topk(
            queries,
            corpus,
            id_col=self.id_col,
            data_col=self.vec_col,
            data_dtype="float64",
            top=top,
            out_col="dist",
            extra=(),
            bucket_scorer=_sqeuclidean_blas_scorer if blas else _sqeuclidean_bucket_scorer,
            kernel_name="arrow_score",
            probe_spec=(cent, nprobe, self.centroids),
        )

    def unpersist(self) -> None:
        self.assigned.unpersist()
        if self.sel_sample is not None:
            self.sel_sample.unpersist()


@dataclass
class FilteredSearchPlan:
    """Outcome of :func:`plan_filtered_search` — which physical tier ran and
    the evidence it was chosen on. ``result`` is the (query_id, neighbor_id,
    rank, dist) DataFrame either tier produces."""

    tier: str                   # "exact_filtered" | "ann"
    selectivity: float | None   # estimated kept fraction (None: no predicate)
    nprobe_effective: int       # probes the ann tier used / would have used
    result: DataFrame


def search_sharded(
    index,
    queries: DataFrame,
    k: int = 10,
    shard_queries: int = _SCORE_MAX_QUERIES,
    **search_kwargs,
) -> DataFrame:
    """Search driver for query batches past the Arrow kernels' driver-side
    collect cap (`_SCORE_MAX_QUERIES`): split the query relation into
    ``ceil(n / shard_queries)`` deterministic hash shards (xxhash64 on
    query_id — partition-invariant), run one search per shard, and union
    the results. Each query's top-k is complete within its own shard's job
    (shards partition QUERIES, never the corpus), so the union IS the full
    answer — no cross-shard merge. The corpus-side probe scans repeat per
    shard, which is the honest cost of bounding driver memory; a 100 TB
    deployment runs query shards as separate jobs anyway. Works for any
    index whose ``search`` takes (queries, k=..., **kwargs) — IVFIndex
    (``arrow_score=...``) and IVFPQIndex (``rerank=...``, ``arrow_adc=...``)
    both qualify."""
    import math

    # cap probe, not a full count: limit(cap+1) early-exits the scan as soon
    # as cap+1 rows exist, so the common under-cap case never pays a full
    # count job over a (possibly huge) query relation
    over_cap = (
        queries.select("query_id").limit(shard_queries + 1).count()
        > shard_queries
    )
    if not over_cap:
        return index.search(queries, k=k, **search_kwargs)
    n = queries.count()
    # 10% headroom: hash shards deviate from n/shards by a few hundred rows
    # at 100k means (binomial sigma ~ sqrt(n/shards)), and a shard landing
    # over the kernel cap would raise — size for the deviation, not the mean
    shards = max(2, math.ceil(n / max(1, int(shard_queries * 0.9))))
    shard_col = F.pmod(F.xxhash64(F.col("query_id")), F.lit(shards))
    out = None
    for s in range(shards):
        part = index.search(
            queries.filter(shard_col == F.lit(s)), k=k, **search_kwargs
        )
        out = part if out is None else out.unionAll(part)
    return out


def plan_filtered_search(
    index,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    predicate: Column | None = None,
    rerank: int = 0,
    arrow: bool | str = False,
) -> FilteredSearchPlan:
    """Selectivity-routed filtered search — the tier planner.

    Adaptive probe widening holds the candidate count constant under a
    predicate keeping fraction ``s`` by probing ``ceil(nprobe / s)`` buckets
    (IVFIndex.search / IVFPQIndex.search, adaptive_nprobe=True). When that
    widening SATURATES (``ceil(nprobe / s) >= n_centroids``) the ANN tier
    would open every bucket, so its candidate set is exactly the filtered
    corpus — at which point an exact scan of the filtered corpus computes
    the same (or better: no ADC error) answer with strictly less machinery
    (no probe ranking, no bucket join, recall 1.0 by construction). The
    reference exercises the same two physical shapes — its brute-force CPU
    tier (utils_grid_search.py:919-928) against its prefiltered ANN runs —
    but leaves tier choice to the operator; this routes it on the measured
    saturation rule. At 5M x 64d with the 0.77%-selectivity filter the exact
    tier measures 4623 q/s vs the saturated ADC path's 26-31 q/s
    (SCALE_BENCH_5M.json).

    Routing:
      * ``predicate is None``      -> ann tier at the base ``nprobe``.
      * ``ceil(nprobe/s) < C``     -> ann tier at the widened nprobe
                                      (the planner passes the widened count
                                      explicitly; no second estimate).
      * widening saturates (or the sample reports s == 0, i.e. the filter is
        below the sample's resolution) -> exact filtered tier, UNLESS the
        layout is codes-only (IVFPQ keep_vectors=False): with no
        full-precision vectors an exact scan is impossible, so fall back to
        the ann tier with every bucket open.

    Selectivity comes from the layout's tiny sample sidecar when one exists,
    else one single-pass aggregate over the in-memory relation — identical
    policy to adaptive_nprobe, so planner routing is reproducible in SQL
    (the registry oracles both tiers, tier label included).
    """
    import math

    from .topk import knn_scalable

    is_pq = hasattr(index, "codebooks")
    relation = index.coded if is_pq else index.assigned
    can_exact = bool(getattr(index, "has_vectors", True))
    metric = getattr(index, "metric", "sqeuclidean")

    if predicate is None:
        eff = min(nprobe, index.n_centroids)
        res = (
            index.search(queries, k=k, nprobe=eff, rerank=rerank, arrow_adc=arrow)
            if is_pq
            else index.search(queries, k=k, nprobe=eff, arrow_score=arrow)
        )
        return FilteredSearchPlan("ann", None, eff, res)

    sel = _estimate_selectivity(
        index.sel_sample if index.sel_sample is not None else relation, predicate
    )
    widened = int(math.ceil(nprobe / sel)) if sel > 0 else index.n_centroids
    eff = min(widened, index.n_centroids)

    if widened >= index.n_centroids and can_exact:
        filt = relation.filter(predicate)
        res = knn_scalable(
            queries,
            filt,
            k=k,
            metric=metric,
            id_col=index.id_col,
            vec_col=index.vec_col,
        )
        return FilteredSearchPlan("exact_filtered", sel, eff, res)

    res = (
        index.search(
            queries, k=k, nprobe=eff, rerank=rerank,
            predicate=predicate, arrow_adc=arrow,
        )
        if is_pq
        else index.search(
            queries, k=k, nprobe=eff, predicate=predicate, arrow_score=arrow
        )
    )
    return FilteredSearchPlan("ann", sel, eff, res)


def plan_filtered_range_search(
    index: "IVFIndex",
    queries: DataFrame,
    radius: float,
    nprobe: int = 8,
    predicate: Column | None = None,
    arrow: bool = False,
) -> FilteredSearchPlan:
    """Selectivity-routed filtered RANGE search — the radius twin of
    :func:`plan_filtered_search`, same saturation rule.

    A predicate keeping fraction ``s`` thins every probed cell to ``s`` of
    its rows; holding the expected candidate mass constant takes
    ``ceil(nprobe / s)`` probes. When that widening SATURATES
    (``>= n_centroids``) the probed tier would scan every cell of the
    filtered corpus anyway, so an exact range scan over the filtered
    relation (range_window / range_scalable — both are single fused scans
    with NO exchange, strictly less machinery than probe ranking + bucket
    join) returns the same epsilon-ball with recall 1.0 by construction.
    Measured at 5M x 64d: the unfiltered exact Arrow scan is 216 s, but at
    mid_rated selectivity (~0.77%) the filtered scan touches ~39k rows
    (~seconds) while saturated probing pays full probe ranking + a widened
    join over the same rows (SCALE_BENCH_5M truth rows; the top-k planner's
    4623 q/s vs 26-31 q/s gap is the same physics).

    Routing (identical policy to the top-k planner, so routing is
    SQL-reproducible — the registry oracles both tiers, tier label pinned):
      * ``predicate is None``  -> probed tier at the base nprobe;
      * ``ceil(nprobe/s) < C`` -> probed tier at the widened nprobe;
      * saturated (or s == 0, the filter below the sample's resolution)
        -> exact filtered range scan (``arrow`` picks the kernel form).
    IVFIndex only: range semantics need full vectors (the assigned relation
    always carries them; the coded IVFPQ tier has no radius contract —
    FAISS's IVFPQ range_search rides ADC error bounds we don't claim)."""
    import math

    from .range_search import range_scalable, range_window

    if predicate is None:
        eff = min(nprobe, index.n_centroids)
        return FilteredSearchPlan(
            "ann", None, eff,
            index.range_search(
                queries, radius=radius, nprobe=eff, arrow_score=arrow
            ),
        )

    sel = _estimate_selectivity(
        index.sel_sample if index.sel_sample is not None else index.assigned,
        predicate,
    )
    widened = int(math.ceil(nprobe / sel)) if sel > 0 else index.n_centroids
    eff = min(widened, index.n_centroids)

    if widened >= index.n_centroids:
        filt = index.assigned.filter(predicate)
        form = range_scalable if arrow else range_window
        res = form(
            queries,
            filt,
            radius=radius,
            metric=index.metric,
            id_col=index.id_col,
            vec_col=index.vec_col,
        )
        return FilteredSearchPlan("exact_filtered", sel, eff, res)

    res = index.range_search(
        queries, radius=radius, nprobe=eff, predicate=predicate,
        arrow_score=arrow,
    )
    return FilteredSearchPlan("ann", sel, eff, res)

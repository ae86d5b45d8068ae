"""Replay throughput harness (SURVEY.md §2 J / E3).

The reference measures QPS by replaying the same query batch in a thread pool
for ``run_time`` seconds (reference: non_stop_search
cuvs_bench_grid_search_v3.py:245-308, qps formula at :302; HNSW twin 420-453).

Spark-native analog: a ``rate`` micro-batch source drives the search callable
via ``foreachBatch`` — each tick re-runs the search; achieved QPS =
(batches x queries_per_batch) / wall. The search itself stays a fully
distributed DataFrame job; only the trigger loop is streaming.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def replay_throughput(
    spark: SparkSession,
    search_fn: Callable[[], DataFrame],
    run_time_s: float = 10.0,
    rows_per_batch: int | None = None,
) -> dict:
    """Replay ``search_fn`` for ~run_time_s seconds; returns
    {batches, rows, wall_s, qps, p50_s, p99_s} (per-replay latencies measured
    like the reference's per-batch query_times, percentile at :305)."""
    latencies: list[float] = []
    rows_done = 0
    t_start = time.time()
    while time.time() - t_start < run_time_s:
        t0 = time.time()
        n = search_fn().count()
        latencies.append(time.time() - t0)
        rows_done += rows_per_batch if rows_per_batch is not None else n
    wall = time.time() - t_start
    lat = sorted(latencies)

    def pct(p: float) -> float:
        if not lat:
            return float("nan")
        # nearest-rank: ceil(p*n)-1 (int(p*n) overshoots by one whenever
        # p*n is integral, e.g. p50 of 2 samples returned the max)
        import math

        return lat[max(0, min(len(lat) - 1, math.ceil(p * len(lat)) - 1))]

    return {
        "batches": len(latencies),
        "rows": rows_done,
        "wall_s": round(wall, 3),
        "qps": round(rows_done / wall, 2) if wall > 0 else float("nan"),
        "p50_s": round(pct(0.50), 4),
        "p99_s": round(pct(0.99), 4),
    }


def replay_throughput_concurrent(
    spark: SparkSession,
    search_fn: Callable[[], DataFrame],
    run_time_s: float = 30.0,
    workers: int = 2,
    rows_per_batch: int | None = None,
) -> dict:
    """Saturated-replay QPS — the reference's non_stop_search methodology
    (cuvs_bench_grid_search_v3.py:245-308): a fixed run window with
    CONCURRENT batches in flight. Each worker thread loops
    ``search_fn().count()`` until the window deadline; a batch started
    before the deadline runs to completion and counts, so the wall clock
    spans first-submit -> last-completion (the reference's qps formula at
    :302 divides completed queries by the same span).

    Jobs submitted from separate driver threads interleave in Spark's
    scheduler (FIFO backfills idle slots; set spark.scheduler.mode=FAIR
    for strict sharing on a busy cluster). On local[N] one Arrow-kernel
    batch already saturates the cores mid-scan, so workers=2 measures
    pipeline overlap — one batch's plan/collect/broadcast phase hiding
    under another's scan — which is exactly the steady-state a serving
    deployment runs at. Returns {workers, window_s, batches, rows, wall_s,
    qps, p50_s, p99_s}."""
    latencies: list[float] = []
    rows_total = 0
    errors: list[BaseException] = []
    lock = threading.Lock()
    t_start = time.time()

    def worker() -> None:
        nonlocal rows_total
        while time.time() - t_start < run_time_s:
            t0 = time.time()
            try:
                n = search_fn().count()
            except BaseException as exc:  # noqa: BLE001 — re-raised after join
                with lock:
                    errors.append(exc)
                return
            dt = time.time() - t0
            with lock:
                latencies.append(dt)
                rows_total += rows_per_batch if rows_per_batch is not None else n

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start
    if errors:
        # a silently-dead worker would publish an understated-QPS artifact
        # row; surface the first failure instead (bench-integrity contract)
        raise RuntimeError(
            f"replay worker(s) failed ({len(errors)} of {workers})"
        ) from errors[0]
    lat = sorted(latencies)

    def pct(p: float) -> float:
        if not lat:
            return float("nan")
        import math

        return lat[max(0, min(len(lat) - 1, math.ceil(p * len(lat)) - 1))]

    return {
        "workers": workers,
        "window_s": run_time_s,
        "batches": len(latencies),
        "rows": rows_total,
        "wall_s": round(wall, 3),
        "qps": round(rows_total / wall, 2) if wall > 0 else float("nan"),
        "p50_s": round(pct(0.50), 4),
        "p99_s": round(pct(0.99), 4),
    }

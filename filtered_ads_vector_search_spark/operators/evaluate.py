"""Evaluation/aggregation layer (SURVEY.md §2 E2-E8).

The reference computes p99 latency (np.percentile,
cuvs_bench_grid_search_v3.py:305), QPS over replay windows (:302), recall
brackets (plot_bench.py:41-48), best-recall/best-QPS argmax rows per run
(all_runs_summary-2.csv), and Pareto frontiers (create_plots.ipynb). Each maps
to a single declarative Spark aggregation — map-side partial aggregation,
WindowGroupLimit, and AQE all apply automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "percentiles",
    "hist_quantiles",
    "hist_quantiles_sql",
    "percentiles_per_worker_mean",
    "qps_windows",
    "bracket_mean",
    "best_per_group",
    "pareto_frontier",
]


def percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    ps: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Exact interpolated percentiles (reference: np.percentile p99 at
    cuvs_bench_grid_search_v3.py:305 — same linear-interpolation definition).

    Exact `percentile`, not percentile_approx, so results are deterministic
    and oracle-matched; at 100 TB swap in percentile_approx(…, 10000) — the
    call site is the only change.
    """
    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), 4).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in ps
    ]
    g = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return g.agg(*aggs)


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = ("event_type",),
    bins: int = 256,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    round_digits: int = 4,
) -> DataFrame:
    """Bounded-state quantile ESTIMATION from a fixed-bin histogram — the
    100 TB path where exact `percentile` (which materializes every value per
    group) is too heavy: state is <= bins rows per group no matter the input
    size, built by one map-combinable groupBy after a broadcast bounds join.
    Estimates interpolate linearly inside the hit bin; everything is
    deterministic double arithmetic (no sampling sketch), so the DuckDB twin
    reproduces results bit-for-bit. Two passes total: bounds, then bins.

    Output: group cols, q, est (per requested quantile).
    """
    gcols = list(group_cols)
    # NULL values: exact `percentile` ignores them, so this estimator must
    # too — unfiltered they'd both inflate n and land in the top bin via
    # least(NULL -> greatest..) coercion, silently skewing estimates up
    df = df.filter(F.col(value_col).isNotNull())
    bounds = df.groupBy(*gcols).agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    j = df.join(F.broadcast(bounds), gcols)
    width = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    b = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(value_col) - F.col("lo")) / width),
                F.lit(bins - 1),
            )
        )
        .cast("int")
    )
    counts = (
        j.select(*gcols, "lo", "hi", "n", b.alias("b"))
        .groupBy(*gcols, "lo", "hi", "n", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy(*gcols).orderBy("b")
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "cum_prev", F.col("cum") - F.col("c")
    )
    qd = cum.withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in qs])))
    t = F.col("q") * F.col("n")
    w2 = Window.partitionBy(*gcols, "q").orderBy("b")
    first = (
        qd.filter(F.col("cum") >= t)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
    )
    frac = F.when(F.col("c") > 0, (t - F.col("cum_prev")) / F.col("c")).otherwise(
        F.lit(0.0)
    )
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo") + width * (F.col("b") + frac)
    )
    return first.select(
        *gcols, F.col("q"), F.round(est, round_digits).alias("est")
    )


def hist_quantiles_sql(
    table: str = "events",
    value_col: str = "value",
    group_col: str = "event_type",
    bins: int = 256,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    round_digits: int = 4,
) -> str:
    """DuckDB twin of hist_quantiles — identical arithmetic shape."""
    qlist = ", ".join(str(float(q)) for q in qs)
    width = f"((hi - lo) / {float(bins)})"
    return f"""
WITH src AS (
  SELECT * FROM {table} WHERE {value_col} IS NOT NULL
),
bounds AS (
  SELECT {group_col}, min({value_col}) AS lo, max({value_col}) AS hi,
         count(*) AS n
  FROM src GROUP BY {group_col}
),
binned AS (
  SELECT t.{group_col}, b.lo, b.hi, b.n,
         CASE WHEN b.hi = b.lo THEN 0
              ELSE CAST(least(floor((t.{value_col} - b.lo) / {width}),
                              {bins - 1}) AS INT) END AS b
  FROM src t JOIN bounds b USING ({group_col})
),
counts AS (
  SELECT {group_col}, lo, hi, n, b, count(*) AS c
  FROM binned GROUP BY {group_col}, lo, hi, n, b
),
cum AS (
  SELECT *, sum(c) OVER (PARTITION BY {group_col} ORDER BY b) AS cum,
         sum(c) OVER (PARTITION BY {group_col} ORDER BY b) - c AS cum_prev
  FROM counts
),
qd AS (
  SELECT cum.*, q FROM cum CROSS JOIN (SELECT unnest([{qlist}]::DOUBLE[]) AS q)
),
hit AS (
  SELECT *, row_number() OVER (PARTITION BY {group_col}, q ORDER BY b) AS _rn
  FROM qd WHERE cum >= q * n
)
SELECT {group_col}, q,
       round(CASE WHEN hi = lo THEN lo
                  ELSE lo + {width} * (b + (CASE WHEN c > 0
                       THEN (q * n - cum_prev) / c ELSE 0.0 END)) END,
             {round_digits}) AS est
FROM hit WHERE _rn = 1
"""


def percentiles_per_worker_mean(
    df: DataFrame,
    value_col: str,
    worker_col: str,
    group_cols: Sequence[str] = (),
    ps: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """The v2 aggregation variant (reference:
    cuvs_bench_grid_search_v2.py:300-317): each throughput worker computes
    its OWN percentile over the latencies it observed, and the run-level
    number is the MEAN of the per-worker percentiles — not the pooled
    percentile v3 reports. The two differ whenever worker latency
    distributions differ, so both are exposed.

    Two map-combinable aggregations (per-worker exact percentile, then a
    plain avg); no window, no extra shuffle beyond the two groupBys.
    """
    per_worker = df.groupBy(*group_cols, worker_col).agg(
        *[
            F.percentile(F.col(value_col), F.lit(p)).alias(f"_wp_{i}")
            for i, p in enumerate(ps)
        ]
    )
    g = per_worker.groupBy(*group_cols) if group_cols else per_worker.groupBy()
    return g.agg(
        *[
            F.round(F.avg(f"_wp_{i}"), 4).alias(
                f"p{str(p).replace('0.', '')}_worker_mean"
            )
            for i, p in enumerate(ps)
        ]
    )


def qps_windows(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    window: str = "1 hour",
) -> DataFrame:
    """Throughput per tumbling window (reference QPS formula
    cuvs_bench_grid_search_v3.py:302 — count/wall-window). Declarative
    time-bucketed count; the same expression runs under Structured Streaming
    with a watermark (streaming.throughput)."""
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            *group_cols,
            F.col("w.start").alias("window_start"),
            F.col("n_events"),
        )
    )


def bracket_mean(
    df: DataFrame,
    bracket_col: str,
    value_col: str,
    edges: Sequence[float] = (0.80, 0.90, 0.95, 0.99),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Mean of `value_col` per bracket of `bracket_col` (reference recall
    brackets [80-90/90-95/95-99/99+]%, plot_bench.py:41-48)."""
    c = F.col(bracket_col)
    expr = F.when(c < edges[0], F.lit(f"<{edges[0]}"))
    for lo, hi in zip(edges, list(edges[1:]) + [None]):
        label = f"{lo}-{hi}" if hi is not None else f">={lo}"
        cond = (c >= lo) & (c < hi) if hi is not None else (c >= lo)
        expr = expr.when(cond, F.lit(label))
    return (
        df.withColumn("bracket", expr)
        .groupBy("bracket", *group_cols)
        .agg(
            F.round(F.avg(value_col), 4).alias(f"avg_{value_col}"),
            F.count("*").alias("n_rows"),
        )
    )


def best_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    ascending: bool = False,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Argmax/argmin row per group via row_number (reference best-recall /
    best-QPS summary rows, all_runs_summary-2.csv) — WindowGroupLimit makes
    this a per-group top-1 without a full sort."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Points not dominated on (maximize x, maximize y) (reference Pareto
    frontier plots, create_plots.ipynb cell 0).

    A point survives iff no other point has strictly greater y among those
    with x >= its x — i.e. its y equals the running max of y over the window
    ordered by x desc (ties on x handled by range semantics).
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(x_col).desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # rangeBetween needs a numeric sort key; orderBy desc + range frame gives
    # "all rows with x >= current x" (inclusive of x-ties).
    return (
        df.withColumn("_maxy", F.max(F.col(y_col)).over(w))
        .filter(F.col(y_col) >= F.col("_maxy"))
        .drop("_maxy")
    )

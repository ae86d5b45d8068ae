"""As-of join and bounded range join — Spark-first temporal operators.

The reference engine has no temporal joins (its workload is vector search);
these cover the event-attribution / feature-backfill patterns a training-data
pipeline needs (task brief: custom operators as compositions of DataFrame ops).

Scale design
------------
``asof_join`` is the union-window form: tag both sides, union, one shuffle by
key, and a running ``last(..., ignorenulls)`` window carries the most recent
right-side row forward. No row explosion, no nested-loop join — at 100 TB it
is exactly one exchange on the join key plus a sort within partitions, the
same cost as a sort-merge join. Skewed keys behave like any windowed agg
(salt upstream if one user dominates).

``range_join_bucketed`` avoids Spark's nested-loop fallback for pure
inequality joins by quantizing time into buckets of the window width and
equi-joining on (key, bucket) with the left side exploded to the (at most 2)
buckets its window overlaps, then applying the exact range filter. The
explosion factor is bounded by ``window / bucket_width + 1`` — constant — so
the join stays an equi shuffle join AQE can re-plan, never a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_order: list[str],
    right_order: list[str],
    right_payload: list[str],
    strictly_before: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with the
    same ``key`` whose order tuple is (strictly) before the left row's.

    ``left_order`` / ``right_order`` are column-name lists forming the
    lexicographic event order (e.g. ``["us", "event_id"]``); both sides must
    have the same arity and comparable types. "Before" is lexicographic on the
    FULL tuple — a right row tying the left row's timestamp but with a larger
    id is after it. With ``strictly_before=False`` a right row whose whole
    tuple equals the left row's matches. Order tuples should be unique within
    each side, otherwise which tied right row wins is partition-dependent.
    Right payload columns are returned as ``r_<name>`` (NULL when no match
    exists — LEFT semantics).
    """
    if len(left_order) != len(right_order):
        raise ValueError("left_order and right_order must have the same arity")
    ord_names = [f"_o{i}" for i in range(len(left_order))]
    lt = left.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(o) for c, o in zip(left_order, ord_names)],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(o) for c, o in zip(right_order, ord_names)],
        F.lit(1).alias("_side"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rrow"),
    )
    lt = lt.withColumn("_rrow", F.lit(None).cast(rt.schema["_rrow"].dataType))

    both = lt.unionByName(rt.select(*lt.columns))
    # Right rows sort before left rows at an identical order tuple when the
    # match is inclusive (at-or-before); after them when strictly before.
    side_rank = F.when(F.col("_side") == 1, F.lit(0 if not strictly_before else 1)).otherwise(
        F.lit(1 if not strictly_before else 0)
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*[F.col(o) for o in ord_names], side_rank.asc())
        .rowsBetween(Window.unboundedPreceding, -1 if strictly_before else 0)
    )
    carried = both.withColumn(
        "_match",
        F.last(F.when(F.col("_side") == 1, F.col("_rrow")), ignorenulls=True).over(w),
    )
    out = carried.filter(F.col("_side") == 0)
    cols = [F.col("_lrow")[c].alias(c) for c in left.columns] + [
        F.col("_match")[c].alias(f"r_{c}") for c in right_payload
    ]
    return out.select(*cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Equi-join plan for ``right.ts - left.ts ∈ [lower, upper)`` per key.

    Both ts columns are integral (e.g. epoch micros). Quantizes time into
    buckets of the window width and explodes the left side to the buckets its
    window can overlap, so the physical plan is a plain shuffled equi join on
    (key, bucket) + an exact range filter — never a nested-loop join.
    """
    if upper <= lower:
        raise ValueError("upper must be > lower")
    width = upper - lower
    lo_b = F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(width))
    hi_b = F.floor((F.col(left_ts) + F.lit(upper) - 1) / F.lit(width))
    lt = left.withColumn("_b", F.explode(F.sequence(lo_b, hi_b)))
    rt = right.select(
        F.col(key).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_rrow"),
    ).withColumn("_b", F.floor(F.col("_rts") / F.lit(width)))
    j = lt.join(rt, (F.col(key) == F.col("_rk")) & (lt._b == rt._b)).filter(
        (F.col("_rts") - F.col(left_ts) >= F.lit(lower))
        & (F.col("_rts") - F.col(left_ts) < F.lit(upper))
    )
    return j.select(*[F.col(c) for c in left.columns], F.col("_rrow"))

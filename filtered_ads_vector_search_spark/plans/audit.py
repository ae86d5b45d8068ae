"""Plan-audit utilities (see package docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "simple") -> str:
    """The physical plan as a string. mode: simple | formatted | extended."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def explain_formatted(df: DataFrame) -> str:
    return physical_plan(df, "formatted")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes BroadcastExchange)."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def assert_no_exchange(df: DataFrame) -> None:
    n = count_exchanges(df)
    assert n == 0, f"expected shuffle-free plan, found {n} Exchange(s):\n{physical_plan(df)[:2000]}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastExchange" in plan or "Broadcast" in plan, (
        "expected a broadcast join:\n" + plan[:2000]
    )


def assert_partial_window_group_limit(df: DataFrame) -> None:
    """Assert map-side (Partial) WindowGroupLimit runs before the exchange —
    the per-group top-k pushdown that keeps window top-k scalable."""
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan and "Partial" in plan, (
        "expected partial WindowGroupLimit (rank-limit pushdown):\n" + plan[:2000]
    )

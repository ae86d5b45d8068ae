"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (SURVEY.md §2 J — the extension point the task
brief names for operators Spark's built-ins can't express).

Semantics: events for a user belong to one session until a gap of
``gap_seconds`` passes with no event; on timeout the session is emitted as
(user_id, session_start, session_end, n_events, sum_value). The same
semantics are expressible in batch as a window/lag gap analysis —
``sessionize_batch`` is that twin, used for correctness checks.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize_stream(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Streaming sessionization with processing-time timeout. Input needs
    (user_id, ts timestamp, value)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )
            return
        start, last, n, total = state.get if state.exists else (None, None, 0, 0.0)
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start = lo if start is None else min(start, lo)
            last = hi if last is None else max(last, hi)
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        state.update((start, last, n, total))
        state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Batch twin: gap > gap_seconds starts a new session (lag + running sum
    of session breaks). Fully declarative — the oracle-checkable form."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("session_no", F.sum("new_session").over(w))
    return (
        marked.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .drop("session_no")
    )

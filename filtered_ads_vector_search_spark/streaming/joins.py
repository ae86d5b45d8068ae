"""Stream-stream interval join: purchase→impression attribution pairs.

Completes the Structured Streaming surface (SURVEY.md §2 J + task brief):
two watermarked event-time streams joined on key + a bounded time interval.
The watermark bounds the join state on both sides — at production scale the
state store holds only ``watermark + interval`` worth of impressions per key,
so state is O(rate × window), independent of stream length.

``attribution_pairs_batch`` is the identical logical join on a batch
DataFrame: the DuckDB-checkable form (registry ``purchase_attribution_pairs``)
and the correctness twin for the streaming test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW_MINUTES = 10


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    imp = events.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("i_user"),
        F.col("event_id").alias("imp_event_id"),
        F.col("ts").alias("i_ts"),
    )
    pur = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    )
    return imp, pur


def _join(imp: DataFrame, pur: DataFrame, window_minutes: int) -> DataFrame:
    cond = F.expr(
        f"i_user = user_id AND i_ts >= p_ts - INTERVAL {window_minutes} MINUTES "
        "AND i_ts < p_ts"
    )
    return pur.join(imp, cond).select(
        "user_id",
        "purchase_event_id",
        "imp_event_id",
        (F.unix_micros("p_ts") - F.unix_micros("i_ts")).alias("gap_us"),
    )


def attribution_pairs_stream(
    spark: SparkSession, sf_dir: str, window_minutes: int = WINDOW_MINUTES
) -> DataFrame:
    """Streaming form: both sides watermarked so impression state ages out
    once no purchase can still reach back to it."""
    from .windows import stream_events

    ev = stream_events(spark, sf_dir)
    imp, pur = _sides(ev)
    imp = imp.withWatermark("i_ts", f"{2 * window_minutes} minutes")
    pur = pur.withWatermark("p_ts", f"{2 * window_minutes} minutes")
    return _join(imp, pur, window_minutes)


def attribution_pairs_batch(
    events: DataFrame, window_minutes: int = WINDOW_MINUTES
) -> DataFrame:
    """Batch twin — identical join condition, no watermarks needed."""
    imp, pur = _sides(events)
    return _join(imp, pur, window_minutes)

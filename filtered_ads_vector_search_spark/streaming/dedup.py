"""Streaming exact deduplication over the events stream.

The streaming form of the training-data pipeline's exact dedup
(operators/dedup.py): ``dropDuplicatesWithinWatermark`` keeps one row per
key while the watermark bounds the dedup state — at production scale the
state store holds only ``watermark`` worth of keys, so an unbounded stream
dedups in O(rate × watermark) memory instead of O(stream length).

The batch twin applies the identical first-wins-per-key semantics with a
window; the streaming test asserts availableNow emits exactly one row per
key present in the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dedup_events_stream(
    spark: SparkSession, sf_dir: str, key_cols: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """One event per (user_id, event_type) within the watermark horizon —
    the stream side of exact dedup (duplicate suppression at ingest)."""
    from .windows import stream_events

    keys = key_cols or ["user_id", "event_type"]
    ev = stream_events(spark, sf_dir).withWatermark("ts", watermark)
    return ev.dropDuplicatesWithinWatermark(keys)


def dedup_events_batch(events: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Batch twin: first event (by ts, then event_id) per key."""
    keys = key_cols or ["user_id", "event_type"]
    w = Window.partitionBy(*keys).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

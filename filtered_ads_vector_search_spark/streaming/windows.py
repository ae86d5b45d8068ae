"""Watermarked windowed aggregation over the events stream (SURVEY.md §2 J).

Streaming form of the reference's evaluation metrics — QPS per window
(E3, qps formula cuvs_bench_grid_search_v3.py:302) and value percentiles
(E2, np.percentile at :305) — expressed as an event-time windowed groupBy with
a watermark for late data. ``windowed_event_stats_batch`` is the identical
aggregation on a batch DataFrame: used both as the DuckDB-checkable form and
as the correctness twin for the streaming test (availableNow over the same
files must equal the batch result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, ts normalized to a
    microsecond TIMESTAMP — same normalization as ``datasets.load_events``.

    Streaming file sources need an explicit schema, and the driver testdata's
    on-disk ts type has shifted vintages (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)),
    so probe the actual type with a one-off batch metadata read and branch.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    on_disk = dict(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).dtypes
    )["ts"]
    legacy_nanos = on_disk in ("bigint", "long")
    ts_type = T.LongType() if legacy_nanos else T.TimestampNTZType()
    raw = (
        spark.readStream.schema(_events_schema(ts_type))
        .option("maxFilesPerTrigger", 1)
        # FileStreamSource requires a directory: stream the sf dir, glob to
        # the events file(s).
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if legacy_nanos:
        # integer DIV, not floor(double /): epoch-nanos exceed float64 precision
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # NTZ -> LTZ: session runs in UTC, cast preserves wall-clock and instant.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _window_agg(events: DataFrame, window: str, watermark: str | None) -> DataFrame:
    df = events
    if watermark is not None:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_stats(
    events_stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Streaming: per-(window, event_type) counts and value sums; watermark
    bounds state for late data. Attach to ``writeStream`` with an
    availableNow/continuous trigger."""
    return _window_agg(events_stream, window, watermark)


def windowed_event_stats_batch(events: DataFrame, window: str = "1 minute") -> DataFrame:
    """Batch twin — identical logical aggregation, no watermark needed."""
    return _window_agg(events, window, None)

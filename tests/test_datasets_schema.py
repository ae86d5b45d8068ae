"""Guard against driver testdata drift: every table must load, and the
normalized events.ts must be a timestamp regardless of the on-disk vintage
(TIMESTAMP(NANOS)-as-bigint legacy vs TIMESTAMP(MICROS) current).

This is the failure class that crashed BENCH_r02 — catch it in pytest instead.
"""

import pytest

from filtered_ads_vector_search_spark import datasets

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("table", datasets.TABLES)
def test_table_loads_nonempty(spark, table):
    df = datasets.load_table(spark, SF_DIR, table)
    assert df.limit(1).count() == 1


def test_events_ts_is_timestamp(spark):
    df = datasets.load_events(spark, SF_DIR)
    dtype = dict(df.dtypes)["ts"]
    assert dtype.startswith("timestamp"), f"events.ts loaded as {dtype}"


def test_events_ts_range_sane(spark):
    from pyspark.sql import functions as F

    df = datasets.load_events(spark, SF_DIR)
    row = df.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    # A botched nanos/micros conversion lands decades away from the data's
    # actual range; assert the years are plausible.
    assert 2000 <= row["lo"].year <= 2100
    assert 2000 <= row["hi"].year <= 2100


def test_core_table_dtypes(spark):
    """Dtype guards for the columns every operator family depends on — the
    same drift class as the events.ts vintage change, caught in pytest."""
    emb = dict(datasets.load_table(spark, SF_DIR, "embeddings").dtypes)
    assert emb["vec_id"] == "bigint"
    assert emb["embedding"] == "array<float>"
    docs = dict(datasets.load_table(spark, SF_DIR, "documents").dtypes)
    assert docs["doc_id"] == "bigint" and docs["text"] == "string"
    assert docs["lang"] == "string"
    li = dict(datasets.load_table(spark, SF_DIR, "lineitem").dtypes)
    assert li["l_shipdate"] in ("date", "timestamp", "timestamp_ntz"), li["l_shipdate"]

"""Streaming curation transform (streaming/curate.py): the stateless funnel
stages compose onto a file stream and emit exactly the batch rows."""

import pyspark.sql.functions as F

from filtered_ads_vector_search_spark.functions import hashing as H
from filtered_ads_vector_search_spark.streaming.curate import (
    curate_stream_transform,
    stream_documents,
)

from conftest import SF_SMOKE


def _split(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    gate = (H.portable_hash_col(F.col("doc_id"), 4242) % F.lit(100)) < F.lit(10)
    return docs, docs.filter(gate)


def test_curate_stream_matches_batch(spark, tmp_path):
    """availableNow stream through the quality+PII+decontamination gates ==
    the same transform applied to the batch relation, row for row."""
    docs, ev = _split(spark)
    out = curate_stream_transform(stream_documents(spark, SF_SMOKE), eval_docs=ev)
    q = (
        out.writeStream.format("memory")
        .queryName("curate_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("select * from curate_stream").collect())
    )
    want = sorted(
        map(tuple, curate_stream_transform(docs, eval_docs=ev).collect())
    )
    assert got == want and len(got) > 0
    # the funnel actually gated something (docs exist below the bars or
    # contaminated) — otherwise the equality is vacuous
    assert len(got) < docs.count()


def test_curate_stream_rejects_streaming_eval(spark):
    docs, _ = _split(spark)
    import pytest

    with pytest.raises(ValueError, match="static"):
        curate_stream_transform(
            stream_documents(spark, SF_SMOKE),
            eval_docs=stream_documents(spark, SF_SMOKE),
        )


def test_curate_transform_broadcast_path_matches_literal_path(spark):
    """Past 1024 eval hashes the membership test switches to the broadcast
    + Arrow path; planted fixtures force both paths to agree."""
    rows = [(i, f"doc body number {i} with shared tail alpha beta gamma delta epsilon") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # small eval set -> literal path
    ev_small = spark.createDataFrame(
        [(0, "shared tail alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    small = {r.doc_id for r in curate_stream_transform(docs, eval_docs=ev_small, min_tokens=2, min_quality=0.0).collect()}
    assert small == set()  # every doc shares the 5-gram tail
    # large eval set (>1024 distinct shingles) -> broadcast path; same docs
    # plus the planted tail must still be caught
    filler = " ".join(f"w{i}" for i in range(1100))
    ev_big = spark.createDataFrame(
        [(0, "shared tail alpha beta gamma delta epsilon"), (1, filler)],
        "doc_id long, text string",
    )
    big = {r.doc_id for r in curate_stream_transform(docs, eval_docs=ev_big, min_tokens=2, min_quality=0.0).collect()}
    assert big == set()
    # clean docs survive both paths
    clean = spark.createDataFrame(
        [(99, "totally fresh content nothing shared here at all today")],
        "doc_id long, text string",
    )
    assert curate_stream_transform(clean, eval_docs=ev_big, min_tokens=2, min_quality=0.0).count() == 1

"""Streaming (windows/replay/state) and multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.datasets import load_events
from filtered_ads_vector_search_spark.multimodal import (
    decode_media_meta,
    extract_features,
    sample_frames,
    with_synthetic_media,
)
from filtered_ads_vector_search_spark.streaming import (
    replay_throughput,
    stream_events,
    windowed_event_stats,
    windowed_event_stats_batch,
)
from filtered_ads_vector_search_spark.streaming.state import sessionize_batch

from conftest import SF_SMOKE


def test_streaming_windows_match_batch(spark, tmp_path):
    """availableNow streaming agg over the events files == batch agg
    (the reference's batch-size-invariance property, restated for streams)."""
    stream = windowed_event_stats(stream_events(spark, SF_SMOKE), "1 minute", "2 minutes")
    q = (
        stream.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from winagg").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_stats_batch(load_events(spark, SF_SMOKE), "1 minute").collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (availableNow) emits exactly
    the batch twin's attribution pairs."""
    from filtered_ads_vector_search_spark.streaming.joins import (
        attribution_pairs_batch,
        attribution_pairs_stream,
    )

    q = (
        attribution_pairs_stream(spark, SF_SMOKE)
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.purchase_event_id, r.imp_event_id, r.gap_us)
        for r in spark.sql("select * from attrib").collect()
    )
    want = sorted(
        (r.user_id, r.purchase_event_id, r.imp_event_id, r.gap_us)
        for r in attribution_pairs_batch(load_events(spark, SF_SMOKE)).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_dedup_one_row_per_key(spark, tmp_path):
    """dropDuplicatesWithinWatermark (availableNow) emits exactly one row
    per key and exactly the keys the batch twin keeps. (Which row survives
    is arrival-order-dependent in the stream, so rows aren't compared.)"""
    from filtered_ads_vector_search_spark.streaming.dedup import (
        dedup_events_batch,
        dedup_events_stream,
    )

    q = (
        dedup_events_stream(spark, SF_SMOKE)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [(r.user_id, r.event_type) for r in spark.sql("select * from dedup_stream").collect()]
    want = {
        (r.user_id, r.event_type)
        for r in dedup_events_batch(load_events(spark, SF_SMOKE)).collect()
    }
    assert len(got) == len(set(got)), "stream emitted duplicate keys"
    assert set(got) == want and len(want) > 0


def test_streaming_parquet_sink_exactly_once(spark, tmp_path):
    """File sink + checkpoint: availableNow writes the windowed aggregate to
    parquet; restarting the same query on the same checkpoint with no new
    input appends NOTHING (exactly-once via the sink's commit log)."""
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt-pq")

    def run_once():
        q = (
            windowed_event_stats(stream_events(spark, SF_SMOKE), "1 minute", "2 minutes")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out_dir).count()
    assert first > 0
    run_once()  # same checkpoint, no new files -> no new rows
    assert spark.read.parquet(out_dir).count() == first


def test_replay_throughput(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(100).cache()
    emb.count()
    out = replay_throughput(spark, lambda: emb.groupBy("label").count(), run_time_s=2.0)
    assert out["batches"] >= 1
    assert out["qps"] > 0
    assert out["p99_s"] >= out["p50_s"]


def test_sessionize_batch(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(seconds=100), 2.0),
        (1, base + dt.timedelta(seconds=1000), 3.0),  # gap > 300s -> new session
        (2, base, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = {
        (r["user_id"], r["n_events"]): r["sum_value"]
        for r in sessionize_batch(df, gap_seconds=300).collect()
    }
    assert out == {(1, 2): 3.0, (1, 1): 3.0, (2, 1): 5.0}


def test_multimodal_pipeline(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id").limit(50)
    media = with_synthetic_media(docs)
    meta = decode_media_meta(media)
    rows = meta.collect()
    assert len(rows) == 50
    assert {r["media_type"] for r in rows} <= {"image", "audio", "video"}
    assert all(r["n_bytes"] > 13 for r in rows)
    # metadata-only projection never deserializes payload downstream
    counts = meta.groupBy("media_type").count().collect()
    assert sum(r["count"] for r in counts) == 50

    feats = extract_features(media).collect()
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic: same payload -> same features
    f2 = {r["doc_id"]: tuple(r["features"]) for r in extract_features(media).collect()}
    for r in feats:
        assert tuple(r["features"]) == f2[r["doc_id"]]

    frames = sample_frames(media, every_ms=10_000)
    fr = frames.collect()
    assert len(fr) >= 50  # videos explode to >=1 rows, others exactly 1
    vids = {r["doc_id"] for r in rows if r["media_type"] == "video" and r["duration_ms"] > 10_000}
    by_doc = {}
    for r in fr:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_ts_ms"])
    for d in vids:
        assert len(by_doc[d]) > 1


def test_multimodal_resize(spark):
    """Images take the target dims with a rewritten body; audio/video
    payloads pass through byte-for-byte."""
    from filtered_ads_vector_search_spark.multimodal import resize_images

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id").limit(60)
    media = with_synthetic_media(docs)
    before = {r.doc_id: bytes(r.payload) for r in media.collect()}
    resized = resize_images(media, width=128, height=96)
    meta = {r.doc_id: r for r in decode_media_meta(resized).collect()}
    after = {r.doc_id: bytes(r.payload) for r in resized.collect()}
    types = {r.doc_id: r.media_type for r in decode_media_meta(media).collect()}
    assert set(types.values()) == {"image", "audio", "video"}
    for d, t in types.items():
        if t == "image":
            assert (meta[d].width, meta[d].height) == (128, 96)
            assert after[d] != before[d]
        else:
            assert after[d] == before[d]


def test_multimodal_real_codec_seam(spark):
    df = spark.createDataFrame([(1, bytearray(b"\xff\xd8\xff\xe0realjpeg"))], "doc_id bigint, payload binary")
    with pytest.raises(Exception):  # NotImplementedError inside the UDF
        decode_media_meta(df).collect()


def test_sessionize_stream_emits_on_timeout(spark, tmp_path):
    """applyInPandasWithState sessionization: feed the events file as a
    stream with a short gap, keep the query ticking until processing-time
    timeouts flush every session, then compare totals with the batch twin."""
    import time

    from filtered_ads_vector_search_spark.streaming.state import sessionize_stream

    events = stream_events(spark, SF_SMOKE).select("user_id", "ts", "value")
    sessions = sessionize_stream(events, gap_seconds=2)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        batch_total = (
            windowed_event_stats_batch(load_events(spark, SF_SMOKE), "1 minute")
            .agg(F.sum("n_events"))
            .first()[0]
        )
        deadline = time.time() + 90
        got = 0
        while time.time() < deadline:
            got = spark.sql(
                "select coalesce(sum(n_events), 0) from sessions_out"
            ).first()[0]
            if got >= batch_total:
                break
            time.sleep(2)
        assert got == batch_total, f"streamed session events {got} != {batch_total}"
        n_users = spark.sql("select count(distinct user_id) from sessions_out").first()[0]
        assert n_users > 0
    finally:
        q.stop()


def test_serve_stream_answers_query_stream(spark, tmp_path):
    """foreachBatch similarity serving: stream the query split against a
    resident IVF index; streamed answers equal the batch search."""
    from filtered_ads_vector_search_spark.operators import topk as TK
    from filtered_ads_vector_search_spark.operators.ann import IVFIndex
    from filtered_ads_vector_search_spark.streaming.serve import serve_stream

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, c = TK.split_queries(emb)
    idx = IVFIndex.build(c, n_centroids=8, seed=42)

    qdir = str(tmp_path / "qstream")
    q.write.mode("overwrite").parquet(qdir)
    query_stream = spark.readStream.schema("query_id bigint, q_vec array<float>").parquet(qdir)

    results = []
    sq = serve_stream(
        query_stream,
        search_fn=lambda batch: idx.search(batch, k=5, nprobe=8),
        sink_fn=lambda out, bid: results.extend(tuple(r) for r in out.collect()),
        checkpoint=str(tmp_path / "ckpt_serve"),
        trigger_available_now=True,
    )
    sq.awaitTermination(120)
    expected = sorted(tuple(r) for r in idx.search(q, k=5, nprobe=8).collect())
    assert sorted(results) == expected and len(results) > 0
    idx.unpersist()

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


def test_replay_throughput_concurrent(spark):
    from filtered_ads_vector_search_spark.streaming.replay import (
        replay_throughput_concurrent,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(100).cache()
    emb.count()
    out = replay_throughput_concurrent(
        spark, lambda: emb.groupBy("label").count(), run_time_s=2.0, workers=2
    )
    assert out["workers"] == 2
    assert out["batches"] >= 2  # both workers complete at least one batch
    assert out["qps"] > 0
    assert out["p99_s"] >= out["p50_s"]
    # completed batches within the window: wall spans to last completion
    assert out["wall_s"] >= out["window_s"] - 0.1


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


def test_bmp_codec_roundtrip_and_resize():
    """Real BMP bytes: encode->decode returns the exact pixel array
    (bottom-up rows + BGR + padding handled); resize matches an independent
    numpy nearest-neighbor resample."""
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # odd width -> padding
    raw = C.encode_bmp(px)
    assert raw[:2] == b"BM" and C.sniff(raw) == "bmp"
    meta = C.decode_bmp_meta(raw)
    assert (meta["width"], meta["height"], meta["n_bytes"]) == (7, 5, len(raw))
    np.testing.assert_array_equal(C.decode_bmp_pixels(raw), px)

    out = C.decode_bmp_pixels(C.resize_bmp(raw, 4, 3))
    ys = (np.arange(3) * 5 // 3).clip(0, 4)
    xs = (np.arange(4) * 7 // 4).clip(0, 6)
    np.testing.assert_array_equal(out, px[ys][:, xs])


def test_wav_codec_roundtrip():
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    samples = (np.arange(1000) * 37 % 4096 - 2048).astype(np.int16)
    raw = C.encode_wav(samples, sample_rate=8000)
    assert C.sniff(raw) == "wav"
    meta = C.decode_wav_meta(raw)
    assert meta["duration_ms"] == 125 and meta["media_type"] == "audio"
    np.testing.assert_array_equal(C.decode_wav_samples(raw), samples)


def test_bmp_8bit_palette_roundtrip():
    """8-bit palette BMP: encode->decode expands indices through the BGRx
    palette back to the exact RGB array (bottom-up rows, 4-byte row padding,
    biClrUsed honored); decode_image_pixels dispatches it like any BMP."""
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    rng = np.random.default_rng(11)
    palette = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, size=(6, 5), dtype=np.uint8)  # odd width -> padding
    raw = C.encode_bmp_8bit(idx, palette)
    assert C.sniff(raw) == "bmp"
    meta = C.decode_bmp_meta(raw)
    assert (meta["width"], meta["height"]) == (5, 6)
    np.testing.assert_array_equal(C.decode_bmp_pixels(raw), palette[idx])
    np.testing.assert_array_equal(C.decode_image_pixels(raw), palette[idx])
    # a 256-entry palette exercises the biClrUsed=0-means-256 convention too
    full = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx2 = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    raw2 = C.encode_bmp_8bit(idx2, full)
    np.testing.assert_array_equal(C.decode_bmp_pixels(raw2), full[idx2])


def test_wav_stereo_roundtrip_and_fingerprint_downmix():
    """16-bit stereo WAV: interleaved L/R frames round-trip as (n, 2);
    duration counts FRAMES, not flat samples; the audio fingerprint
    downmixes, so a stereo file whose channels both equal the mono signal
    fingerprints identically to the mono file."""
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C
    from filtered_ads_vector_search_spark.multimodal.phash import (
        audio_fingerprint_bits,
    )

    mono = (np.arange(800) * 53 % 4096 - 2048).astype(np.int16)
    stereo = np.stack([mono, mono], axis=1)
    raw_m = C.encode_wav(mono, sample_rate=8000)
    raw_s = C.encode_wav(stereo, sample_rate=8000)
    assert C.sniff(raw_s) == "wav"
    meta = C.decode_wav_meta(raw_s)
    assert meta["duration_ms"] == C.decode_wav_meta(raw_m)["duration_ms"] == 100
    np.testing.assert_array_equal(C.decode_wav_samples(raw_s), stereo)
    assert audio_fingerprint_bits(raw_s) == audio_fingerprint_bits(raw_m)
    # true stereo content round-trips too
    rng = np.random.default_rng(5)
    st = rng.integers(-2048, 2048, size=(500, 2)).astype(np.int16)
    np.testing.assert_array_equal(
        C.decode_wav_samples(C.encode_wav(st, sample_rate=4000)), st
    )


def test_parse_header_dispatches_real_formats():
    """The decode seam: real BMP/WAV bytes decode for real; unknown bytes
    still raise at the compressed-codec seam."""
    import numpy as np
    import pytest

    from filtered_ads_vector_search_spark.multimodal import codecs as C
    from filtered_ads_vector_search_spark.multimodal.udfs import _parse_header

    bmp = C.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    assert _parse_header(bmp)["codec"] == "bmp"
    wav = C.encode_wav(np.zeros(8, dtype=np.int16))
    assert _parse_header(wav)["codec"] == "pcm_s16le"
    with pytest.raises(NotImplementedError):
        _parse_header(b"\x89PNG\r\n\x1a\nnotsupported")


def test_real_media_resize_in_spark(spark):
    """resize_images over real BMP payloads does a true resample inside
    mapInPandas: decoded output pixels equal the expected nearest-neighbor
    of the arithmetic source image."""
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import (
        codecs as C,
    )
    from filtered_ads_vector_search_spark.multimodal import (
        decode_media_meta,
        resize_images,
        with_real_media,
    )
    from filtered_ads_vector_search_spark.multimodal.columns import real_payload

    ids = spark.createDataFrame([(i,) for i in range(0, 20, 2)], "doc_id bigint")
    resized = resize_images(with_real_media(ids), width=8, height=6)
    rows = {r["doc_id"]: bytes(r["payload"]) for r in resized.collect()}
    meta = decode_media_meta(resized).select("doc_id", "width", "height").collect()
    assert all(r["width"] == 8 and r["height"] == 6 for r in meta)
    for doc_id, raw in rows.items():
        src = C.decode_bmp_pixels(real_payload(doc_id))
        h0, w0, _ = src.shape
        ys = (np.arange(6) * h0 // 6).clip(0, h0 - 1)
        xs = (np.arange(8) * w0 // 8).clip(0, w0 - 1)
        np.testing.assert_array_equal(C.decode_bmp_pixels(raw), src[ys][:, xs])


def test_maintain_index_stream_appends_batches(spark, tmp_path):
    """Online index maintenance: stream new vectors into a written IVF
    layout via foreachBatch append; a reload sees every appended row and a
    planted near-query vector becomes the exact top hit."""
    from filtered_ads_vector_search_spark.operators import topk as TK
    from filtered_ads_vector_search_spark.operators.ann import IVFIndex
    from filtered_ads_vector_search_spark.streaming.serve import maintain_index_stream

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, c = TK.split_queries(emb)
    q1 = q.limit(1).cache()
    built = IVFIndex.build(c, n_centroids=4, seed=42)
    layout = str(tmp_path / "ivf")
    built.write_bucketed(layout)
    built.unpersist()
    n0 = spark.read.parquet(f"{layout}/assigned").count()

    qrow = q1.collect()[0]
    new = spark.createDataFrame(
        [(10_000_000, [float(x) for x in qrow["q_vec"]], 0)]
        + [(10_000_001 + i, [0.01 * i] * 64, 0) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    vdir = str(tmp_path / "vstream")
    new.write.mode("overwrite").parquet(vdir)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(vdir)
    sq = maintain_index_stream(
        stream, layout, checkpoint=str(tmp_path / "ckpt"), kind="ivf",
        trigger_available_now=True,
    )
    sq.awaitTermination(120)

    loaded = IVFIndex.load(spark, layout)
    assert loaded.assigned.count() == n0 + 6
    top = loaded.search(q1, k=1, nprobe=4).collect()[0]
    assert top["neighbor_id"] == 10_000_000 and top["dist"] == 0.0


def test_maintain_index_stream_lsh(spark, tmp_path):
    """kind='lsh': streamed vectors are tagged with the layout's stored
    hyperplanes and appended idempotently; the reload finds a planted
    near-query vector as the top hit."""
    from filtered_ads_vector_search_spark.operators import topk as TK
    from filtered_ads_vector_search_spark.operators.lsh import LSHIndex
    from filtered_ads_vector_search_spark.streaming.serve import maintain_index_stream

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, c = TK.split_queries(emb)
    q1 = q.limit(1).cache()
    built = LSHIndex.build(c, n_bits=3, n_tables=2, seed=42)
    layout = str(tmp_path / "lsh")
    built.write_partitioned(layout)
    built.unpersist()
    n0 = spark.read.parquet(f"{layout}/tagged").count()

    qrow = q1.collect()[0]
    new = spark.createDataFrame(
        [(10_000_000, [float(x) for x in qrow["q_vec"]], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    vdir = str(tmp_path / "vstream")
    new.write.mode("overwrite").parquet(vdir)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(vdir)
    sq = maintain_index_stream(
        stream, layout, checkpoint=str(tmp_path / "ckpt"), kind="lsh",
        trigger_available_now=True,
    )
    sq.awaitTermination(120)

    loaded = LSHIndex.load(spark, layout)
    assert loaded.tagged.count() == n0 + 1
    top = loaded.search(q1, k=1).collect()[0]
    assert top["neighbor_id"] == 10_000_000


def test_streaming_value_histogram_matches_batch(spark, tmp_path):
    """Watermarked fixed-bound histogram (availableNow) == batch twin, and
    read-time quantile extraction over the streamed rows == the batch
    quantile path — the streaming form of hist_quantiles."""
    from filtered_ads_vector_search_spark.streaming.windows import (
        quantiles_from_histogram,
        windowed_value_histogram,
        windowed_value_histogram_batch,
    )

    lo, hi, bins = 0.0, 500.0, 32
    stream = windowed_value_histogram(
        stream_events(spark, SF_SMOKE), "1 minute", "2 minutes", lo, hi, bins
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("vhist")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_vhist"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed_rows = spark.sql("select * from vhist").collect()
    batch = windowed_value_histogram_batch(
        load_events(spark, SF_SMOKE), "1 minute", lo, hi, bins
    )
    key = lambda r: (r["window_start"], r["event_type"], r["b"], r["c"])  # noqa: E731
    assert sorted(map(key, streamed_rows)) == sorted(map(key, batch.collect()))
    streamed = spark.createDataFrame(
        streamed_rows, "window_start timestamp, event_type string, b int, c long"
    )
    sq = sorted(
        map(tuple, quantiles_from_histogram(streamed, lo, hi, bins).collect())
    )
    bq = sorted(map(tuple, quantiles_from_histogram(batch, lo, hi, bins).collect()))
    assert sq == bq and len(sq) > 0


def test_maintain_index_stream_bm25(spark, tmp_path):
    """kind='bm25': streamed documents append to the lexical layout
    idempotently; search over the reloaded index finds a planted doc whose
    text matches the query exactly."""
    from filtered_ads_vector_search_spark.operators import textsearch as TS
    from filtered_ads_vector_search_spark.streaming.serve import maintain_index_stream

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    layout = str(tmp_path / "bm25idx")
    TS.write_term_index(docs, layout, n_buckets=8)

    planted = "zzzuniqueterm appears here zzzuniqueterm again"
    new = spark.createDataFrame(
        [(9_000_000, planted)], "doc_id long, text string"
    )
    vdir = str(tmp_path / "dstream")
    new.write.mode("overwrite").parquet(vdir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(vdir)
    sq = maintain_index_stream(
        stream, layout, checkpoint=str(tmp_path / "ckpt_bm25"), kind="bm25",
        trigger_available_now=True,
    )
    sq.awaitTermination(120)

    qs = spark.createDataFrame(
        [(1, "zzzuniqueterm")], "query_id int, query_text string"
    )
    top = TS.bm25_search_index(spark, layout, qs, k=1).collect()
    assert top and top[0]["doc_id"] == 9_000_000


def test_bmp_32bit_bgra_roundtrip_and_phash_stability():
    """32-bit BGRA BMP: encode->decode returns the exact RGB array (alpha
    dropped — BI_RGB declares the 4th byte unused), resize dispatches
    through the shared nearest-neighbor path, and the perceptual hash of a
    32-bit payload equals the 24-bit payload of the same pixels (phash is
    defined over decoded pixels, not the container)."""
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C
    from filtered_ads_vector_search_spark.multimodal.phash import ahash_bits

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)  # odd width
    alpha = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    raw = C.encode_bmp_32bit(px, alpha)
    assert C.sniff(raw) == "bmp"
    meta = C.decode_bmp_meta(raw)
    assert (meta["width"], meta["height"], meta["n_bytes"]) == (5, 6, len(raw))
    np.testing.assert_array_equal(C.decode_bmp_pixels(raw), px)
    np.testing.assert_array_equal(C.decode_image_pixels(raw), px)
    # no-alpha form and phash container-invariance
    raw_na = C.encode_bmp_32bit(px)
    np.testing.assert_array_equal(C.decode_bmp_pixels(raw_na), px)
    assert ahash_bits(raw) == ahash_bits(C.encode_bmp(px))
    # resize goes through the same nn path as the 24-bit form
    out = C.decode_bmp_pixels(C.resize_image(raw, 3, 4))
    ys = (np.arange(4) * 6 // 4).clip(0, 5)
    xs = (np.arange(3) * 5 // 3).clip(0, 4)
    np.testing.assert_array_equal(out, px[ys][:, xs])


def test_wav_mulaw_roundtrip_and_codec_law():
    """G.711 mu-law WAV: (a) encode(decode(code)) == code for all 255
    canonical codes (0x7F and 0xFF both decode to 0, which re-encodes to
    the canonical 0xFF), (b) decode(encode(x)) stays within the segment's
    quantization step of x, (c) the WAV container round-trips mono and
    stereo with fmt_tag=7/bits=8 and frame-counted duration."""
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    codes = np.arange(256, dtype=np.uint8)
    rt = C.mulaw_encode(C.mulaw_decode(codes))
    keep = codes != 0x7F  # negative zero collapses onto positive zero
    np.testing.assert_array_equal(rt[keep], codes[keep])
    assert rt[0x7F] == 0xFF

    x = (np.arange(-32000, 32001, 257)).astype(np.int16)
    err = np.abs(C.mulaw_decode(C.mulaw_encode(x)).astype(np.int32) - x)
    # max quantization step at the top segment is 8 << 7 = 1024; half-step
    # either side plus the clip region bound the error
    assert int(err.max()) <= 1024, int(err.max())
    small = (np.arange(-100, 101)).astype(np.int16)
    err_s = np.abs(C.mulaw_decode(C.mulaw_encode(small)).astype(np.int32) - small)
    assert int(err_s.max()) <= 4, int(err_s.max())

    mono = (np.arange(800) * 53 % 4096 - 2048).astype(np.int16)
    raw = C.encode_wav_mulaw(mono, sample_rate=8000)
    assert C.sniff(raw) == "wav"
    meta = C.decode_wav_meta(raw)
    assert meta["codec"] == "pcm_mulaw" and meta["duration_ms"] == 100
    got = C.decode_wav_samples(raw)
    assert got.shape == mono.shape
    np.testing.assert_array_equal(got, C.mulaw_decode(C.mulaw_encode(mono)))
    st = np.stack([mono, -mono], axis=1).astype(np.int16)
    raw_s = C.encode_wav_mulaw(st, sample_rate=8000)
    assert C.decode_wav_meta(raw_s)["duration_ms"] == 100
    assert C.decode_wav_samples(raw_s).shape == (800, 2)


def test_wav_alaw_roundtrip_and_codec_law():
    """G.711 A-law WAV (WAVE_FORMAT_ALAW=6): encode(decode(code)) == code
    for ALL 256 codes (A-law has no negative-zero collapse), companding
    error is bounded by the segment step (>=8 everywhere — the 13-bit
    domain's >>3), and the container round-trips mono/stereo with
    frame-counted duration."""
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    codes = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(C.alaw_encode(C.alaw_decode(codes)), codes)

    x = np.arange(-32768, 32768, 97).astype(np.int16)
    err = np.abs(C.alaw_decode(C.alaw_encode(x)).astype(np.int32) - x)
    assert int(err.max()) <= 512, int(err.max())
    small = np.arange(-100, 101).astype(np.int16)
    err_s = np.abs(C.alaw_decode(C.alaw_encode(small)).astype(np.int32) - small)
    assert int(err_s.max()) <= 8, int(err_s.max())
    # companding is idempotent on decoded signals
    y = C.alaw_decode(C.alaw_encode(x))
    np.testing.assert_array_equal(C.alaw_decode(C.alaw_encode(y)), y)

    mono = (np.arange(800) * 53 % 4096 - 2048).astype(np.int16)
    raw = C.encode_wav_alaw(mono, sample_rate=8000)
    assert C.sniff(raw) == "wav"
    meta = C.decode_wav_meta(raw)
    assert meta["codec"] == "pcm_alaw" and meta["duration_ms"] == 100
    np.testing.assert_array_equal(
        C.decode_wav_samples(raw), C.alaw_decode(C.alaw_encode(mono))
    )
    st = np.stack([mono, -mono], axis=1).astype(np.int16)
    raw_s = C.encode_wav_alaw(st, sample_rate=8000)
    assert C.decode_wav_meta(raw_s)["duration_ms"] == 100
    assert C.decode_wav_samples(raw_s).shape == (800, 2)
    # an unsupported fmt_tag still raises at the seam
    import pytest
    import struct as _struct

    bad = bytearray(raw)
    bad[20:22] = _struct.pack("<H", 2)  # ADPCM
    with pytest.raises(NotImplementedError):
        C.decode_wav_meta(bytes(bad))


def test_bmp_16bit_rgb555_roundtrip():
    """16-bit RGB555 BMP: code-level roundtrip is EXACT (the top-bit-
    replicating 5->8 expansion inverts the >>3 quantization), decode of an
    encode equals the independently computed quantized pixels, and resize
    dispatches through the shared path. An RLE payload still raises at the
    seam (BI_BITFIELDS graduated to a supported mode in round 9)."""
    import numpy as np
    import pytest
    import struct as _struct

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # odd width -> pad
    raw = C.encode_bmp_16bit(px)
    assert C.sniff(raw) == "bmp"
    meta = C.decode_bmp_meta(raw)
    assert (meta["width"], meta["height"], meta["n_bytes"]) == (7, 5, len(raw))
    v5 = px >> 3
    expect = ((v5 << 3) | (v5 >> 2)).astype(np.uint8)
    got = C.decode_bmp_pixels(raw)
    np.testing.assert_array_equal(got, expect)
    # re-encoding the decoded pixels reproduces the file byte-for-byte
    assert C.encode_bmp_16bit(got) == raw
    out = C.decode_bmp_pixels(C.resize_image(raw, 3, 2))
    ys = (np.arange(2) * 5 // 2).clip(0, 4)
    xs = (np.arange(3) * 7 // 3).clip(0, 6)
    np.testing.assert_array_equal(out, expect[ys][:, xs])

    bad = bytearray(raw)
    bad[30:34] = _struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        C.decode_bmp_meta(bytes(bad))


def test_bmp_565_bitfields_roundtrip_and_phash_stability():
    """16-bit BI_BITFIELDS RGB565 BMP (compression=3, masks F800/07E0/001F
    after the info header — the dominant real-world 16-bit layout): decode
    of an encode equals the independently computed 5/6/5 quantize-then-
    replicate pixels, re-encoding the decoded pixels reproduces the file
    byte-for-byte, 32-bit BI_BITFIELDS with byte-aligned masks decodes
    exactly, the perceptual hash is container-invariant on smooth images,
    and non-contiguous masks / RLE stay behind the seam."""
    import numpy as np
    import pytest
    import struct as _struct

    from filtered_ads_vector_search_spark.multimodal import codecs as C
    from filtered_ads_vector_search_spark.multimodal.phash import ahash_bits

    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # odd width -> pad
    raw = C.encode_bmp_565(px)
    assert C.sniff(raw) == "bmp"
    meta = C.decode_bmp_meta(raw)
    assert (meta["width"], meta["height"], meta["n_bytes"]) == (7, 5, len(raw))
    r5, g6, b5 = px[:, :, 0] >> 3, px[:, :, 1] >> 2, px[:, :, 2] >> 3
    expect = np.stack(
        [(r5 << 3) | (r5 >> 2), (g6 << 2) | (g6 >> 4), (b5 << 3) | (b5 >> 2)],
        axis=2,
    ).astype(np.uint8)
    got = C.decode_bmp_pixels(raw)
    np.testing.assert_array_equal(got, expect)
    assert C.encode_bmp_565(got) == raw  # byte-exact re-encode
    np.testing.assert_array_equal(C.decode_image_pixels(raw), expect)

    # phash container-invariance: a smooth gradient quantizes to 565 with
    # per-pixel error <= 7, far under the ahash mean-threshold scale
    y, x, c = np.ogrid[0:16, 0:16, 0:3]
    smooth = (40 + y * 6 + x * 6 + c * 3).astype(np.uint8)
    assert ahash_bits(C.encode_bmp_565(smooth)) == ahash_bits(C.encode_bmp(smooth))

    # 32-bit BI_BITFIELDS with byte-aligned BGRA masks decodes exactly
    h, w = 4, 3
    bgra = np.empty((h, w, 4), np.uint8)
    bgra[:, :, 0] = px[:h, :w, 2]
    bgra[:, :, 1] = px[:h, :w, 1]
    bgra[:, :, 2] = px[:h, :w, 0]
    bgra[:, :, 3] = 77
    off = 54 + 12
    f32 = bytearray()
    f32 += _struct.pack("<2sIHHI", b"BM", off + 4 * w * h, 0, 0, off)
    f32 += _struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 32, 3, 4 * w * h, 2835, 2835, 0, 0
    )
    f32 += _struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    f32 += bgra[::-1].tobytes()
    np.testing.assert_array_equal(C.decode_bmp_pixels(bytes(f32)), px[:h, :w])

    # seams: non-contiguous mask raises at pixel decode; RLE at meta
    badmask = bytearray(raw)
    badmask[54:58] = _struct.pack("<I", 0xF0F0)
    with pytest.raises(NotImplementedError):
        C.decode_bmp_pixels(bytes(badmask))
    rle = bytearray(raw)
    rle[30:34] = _struct.pack("<I", 2)  # BI_RLE4
    with pytest.raises(NotImplementedError):
        C.decode_bmp_meta(bytes(rle))


def test_wav_ima_adpcm_roundtrip_mono_stereo():
    """IMA ADPCM WAV (WAVE_FORMAT_IMA_ADPCM=0x11): the container carries a
    20-byte fmt chunk + fact chunk + block-aligned data; decode(encode(x))
    (a) has the exact length of x (fact-chunk truncation of the padded
    final block), (b) reproduces each block's first sample EXACTLY (it
    travels verbatim in the block header), (c) tracks a bandlimited signal
    at > 20 dB SNR (4-bit differential coding), and (d) is bit-stable:
    re-encoding the decoded signal of a decoded signal converges (the
    decoder is the encoder's inner loop). Stereo interleaves 4-byte nibble
    groups per channel and round-trips both channels independently;
    MS-ADPCM still raises at the seam."""
    import numpy as np
    import pytest
    import struct as _struct

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    t = np.arange(2500)
    mono = (2800 * np.sin(t / 19) + 420 * np.sin(t / 3.1)).astype(np.int16)
    raw = C.encode_wav_ima_adpcm(mono, sample_rate=8000)
    assert C.sniff(raw) == "wav"
    meta = C.decode_wav_meta(raw)
    assert meta["codec"] == "adpcm_ima_wav"
    assert meta["duration_ms"] == int(2500 * 1000 // 8000)
    dec = C.decode_wav_samples(raw)
    assert dec.shape == mono.shape and dec.dtype == np.int16
    # block headers carry the first sample of every block verbatim
    spb = 505  # (256 - 4) * 2 + 1 at the default mono block_align
    np.testing.assert_array_equal(dec[::spb], mono[::spb])
    err = dec.astype(np.float64) - mono.astype(np.float64)
    snr = 10 * np.log10((mono.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 20, snr

    # stereo: both channels independent, interleaved 4-byte groups
    st = np.stack([mono, (-mono // 3).astype(np.int16)], axis=1)
    raw_s = C.encode_wav_ima_adpcm(st, sample_rate=16000)
    meta_s = C.decode_wav_meta(raw_s)
    assert meta_s["codec"] == "adpcm_ima_wav"
    assert meta_s["duration_ms"] == int(2500 * 1000 // 16000)
    dec_s = C.decode_wav_samples(raw_s)
    assert dec_s.shape == st.shape
    for j in range(2):
        e = dec_s[:, j].astype(np.float64) - st[:, j].astype(np.float64)
        s = 10 * np.log10((st[:, j].astype(np.float64) ** 2).mean() / (e**2).mean())
        assert s > 20, (j, s)

    # deterministic bytes: same input -> same file
    assert C.encode_wav_ima_adpcm(mono, sample_rate=8000) == raw

    # a non-multiple-of-block length exercises the fact-chunk truncation
    short = mono[:777]
    dshort = C.decode_wav_samples(C.encode_wav_ima_adpcm(short, sample_rate=8000))
    assert dshort.shape == short.shape

    # f64 PCM (fmt_tag=3, bits=64) stays behind the seam (f32 graduated to
    # a supported codec in round 10 — test_wav_float32_and_extensible)
    bad = bytearray(C.encode_wav(mono))
    bad[20:22] = _struct.pack("<H", 3)
    bad[34:36] = _struct.pack("<H", 64)
    with pytest.raises(NotImplementedError, match="f64"):
        C.decode_wav_meta(bytes(bad))


def test_wav_s24le_lossless_roundtrip():
    """PCM s24le WAV: LOSSLESS — decode(encode(x)) == x exactly for the
    full signed 24-bit range, mono and stereo, with frame-counted duration
    through the generic RIFF chunk walk; out-of-range samples are rejected
    at encode; bits=24 with a non-PCM fmt_tag stays behind the seam."""
    import numpy as np
    import pytest
    import struct as _struct

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    rng = np.random.default_rng(29)
    x = rng.integers(-(2**23), 2**23, size=1201).astype(np.int32)
    x[:2] = (-(2**23), 2**23 - 1)  # exact range endpoints
    raw = C.encode_wav_s24le(x, sample_rate=8000)
    assert C.sniff(raw) == "wav"
    meta = C.decode_wav_meta(raw)
    assert meta["codec"] == "pcm_s24le"
    assert meta["duration_ms"] == 1201 * 1000 // 8000
    got = C.decode_wav_samples(raw)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, x)

    st = np.stack([x, -x - 1], axis=1)
    raw_s = C.encode_wav_s24le(st, sample_rate=16000)
    np.testing.assert_array_equal(C.decode_wav_samples(raw_s), st)

    with pytest.raises(ValueError):
        C.encode_wav_s24le(np.array([2**23], dtype=np.int64))
    bad = bytearray(raw)
    bad[20:22] = _struct.pack("<H", 3)  # IEEE float tag, 24-bit: unsupported
    with pytest.raises(NotImplementedError):
        C.decode_wav_meta(bytes(bad))


def test_bmp_v4_v5_info_headers_decode():
    """BITMAPV4HEADER (108) / BITMAPV5HEADER (124) payloads — the layout
    modern encoders actually write — decode through the shared paths: the
    channel masks sit at file offset 54 inside the extended header, exactly
    where the hdr_sz=40 BI_BITFIELDS form appends them, and BI_RGB pixel
    layouts are unchanged. An unknown header size stays behind the seam."""
    import numpy as np
    import pytest
    import struct as _struct

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)

    def v_header_bmp(hdr_sz: int, bpp: int, compression: int) -> bytes:
        unit = bpp // 8
        row = ((unit * 4 + 3) // 4) * 4
        off = 14 + hdr_sz
        out = bytearray()
        out += _struct.pack("<2sIHHI", b"BM", off + row * 3, 0, 0, off)
        out += _struct.pack(
            "<IiiHHIIiiII", hdr_sz, 4, 3, 1, bpp, compression, row * 3,
            2835, 2835, 0, 0,
        )
        if compression == 3:
            masks = (0xF800, 0x07E0, 0x001F) if bpp == 16 else (
                0x00FF0000, 0x0000FF00, 0x000000FF
            )
            out += _struct.pack("<III", *masks)
            out += b"\x00" * (hdr_sz - 40 - 12)
        else:
            out += b"\x00" * (hdr_sz - 40)
        if bpp == 16:
            p = px.astype(np.uint16)
            packed = ((p[:, :, 0] >> 3) << 11) | ((p[:, :, 1] >> 2) << 5) | (
                p[:, :, 2] >> 3
            )
            for r in packed[::-1]:
                out += r.astype("<u2").tobytes() + b"\x00" * (row - 8)
        elif bpp == 24:
            for r in px[::-1, :, ::-1]:
                out += r.tobytes() + b"\x00" * (row - 12)
        else:  # 32-bit BGRA bitfields
            bgra = np.zeros((3, 4, 4), np.uint8)
            bgra[:, :, :3] = px[:, :, ::-1]
            out += bgra[::-1].tobytes()
        return bytes(out)

    r5, g6, b5 = px[:, :, 0] >> 3, px[:, :, 1] >> 2, px[:, :, 2] >> 3
    expect565 = np.stack(
        [(r5 << 3) | (r5 >> 2), (g6 << 2) | (g6 >> 4), (b5 << 3) | (b5 >> 2)],
        axis=2,
    ).astype(np.uint8)
    for hdr_sz in (108, 124):
        np.testing.assert_array_equal(
            C.decode_bmp_pixels(v_header_bmp(hdr_sz, 16, 3)), expect565
        )
        np.testing.assert_array_equal(
            C.decode_bmp_pixels(v_header_bmp(hdr_sz, 32, 3)), px
        )
        np.testing.assert_array_equal(
            C.decode_bmp_pixels(v_header_bmp(hdr_sz, 24, 0)), px
        )
        m = C.decode_bmp_meta(v_header_bmp(hdr_sz, 24, 0))
        assert (m["width"], m["height"]) == (4, 3)
    with pytest.raises(NotImplementedError):
        C.decode_bmp_meta(v_header_bmp(108, 24, 0)[:14] + _struct.pack("<I", 64)
                          + v_header_bmp(108, 24, 0)[18:])


def test_bmp_rle8_roundtrip_and_escape_forms():
    """8-bit BI_RLE8 BMP (round 9): the greedy (count, index) encoder is
    LOSSLESS on the index raster — decode(encode(idx, pal)) == pal[idx]
    exactly, for run-heavy, noisy, and odd-width rasters — and the decoder
    additionally honors the absolute-mode and delta escapes real encoders
    emit. A 16-bpp payload claiming BI_RLE8 and an RLE4 payload still
    raise at the seam."""
    import numpy as np
    import pytest
    import struct as _struct

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    rasters = [
        np.repeat(np.arange(5, dtype=np.uint8)[:, None], 9, axis=1),  # runs
        rng.integers(0, 16, size=(4, 7), dtype=np.uint8),  # noise, odd width
        np.zeros((3, 4), dtype=np.uint8),  # single long zero run
    ]
    for idx in rasters:
        raw = C.encode_bmp_rle8(idx, pal)
        assert C.sniff(raw) == "bmp"
        meta = C.decode_bmp_meta(raw)
        assert (meta["width"], meta["height"]) == (idx.shape[1], idx.shape[0])
        np.testing.assert_array_equal(C.decode_bmp_pixels(raw), pal[idx])
        # resize dispatches through the shared decode path
        out = C.decode_bmp_pixels(C.resize_image(raw, 2, 2))
        assert out.shape == (2, 2, 3)

    # hand-crafted stream exercising absolute mode + delta + early EOL:
    # row0 (bottom): run 3x5, absolute [1,2,3] (padded), EOL
    # row1: delta (+2,+0) skips two cells (stay 0), run 2x7, EOL, EOB
    data = bytes(
        [3, 5, 0, 3, 1, 2, 3, 0, 0, 0]  # 3x5 | abs(1,2,3)+pad | EOL
        + [0, 2, 2, 0, 2, 7, 0, 0, 0, 1]  # delta(2,0) | 2x7 | EOL | EOB
    )
    idx = C._decode_rle8_indices(data, 6, 2)
    np.testing.assert_array_equal(
        idx, np.array([[5, 5, 5, 1, 2, 3], [0, 0, 7, 7, 0, 0]], dtype=np.uint8)
    )

    # seams hold: RLE8 on a 16-bpp payload, and RLE4, both raise
    px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    bad16 = bytearray(C.encode_bmp_16bit(px))
    bad16[30:34] = _struct.pack("<I", 1)
    with pytest.raises(NotImplementedError):
        C.decode_bmp_meta(bytes(bad16))
    rle4 = bytearray(C.encode_bmp_rle8(rasters[0], pal))
    rle4[30:34] = _struct.pack("<I", 2)
    with pytest.raises(NotImplementedError):
        C.decode_bmp_meta(bytes(rle4))

    # validation guards
    with pytest.raises(ValueError, match="palette"):
        C.encode_bmp_rle8(rasters[0], pal[:, :2])
    with pytest.raises(ValueError, match="out of range"):
        C.encode_bmp_rle8(np.full((2, 2), 99, dtype=np.uint8), pal)


def test_wav_ms_adpcm_roundtrip_and_seams():
    """MS-ADPCM WAV (WAVE_FORMAT_ADPCM=0x0002, round 9): best-of-7
    predictor selection per block, 7-byte channel headers (predictor /
    idelta / sample1 / sample2, fields channel-interleaved for stereo),
    L-high/R-low nibble packing. The two header samples round-trip
    EXACTLY; the coded tail reconstructs within the ADPCM noise floor
    (SNR > 20 dB on smooth signals, like the IMA tier); the fact chunk
    truncates padded final blocks; encode is deterministic. The seam
    narrows to WAVE_FORMAT_EXTENSIBLE / float PCM."""
    import numpy as np
    import pytest
    import struct as _struct

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    t = np.arange(2000)
    x = (10000 * np.sin(2 * np.pi * t / 50)).astype(np.int16)
    raw = C.encode_wav_ms_adpcm(x, 8000)
    meta = C.decode_wav_meta(raw)
    assert meta["codec"] == "adpcm_ms" and meta["duration_ms"] == 250
    y = C.decode_wav_samples(raw)
    assert len(y) == len(x)
    assert y[0] == x[0] and y[1] == x[1]  # header samples verbatim

    def snr(a, b):
        e = a.astype(float) - b.astype(float)
        return 10 * np.log10((a.astype(float) ** 2).mean() / max((e**2).mean(), 1e-9))

    assert snr(x, y) > 20.0
    assert C.encode_wav_ms_adpcm(x, 8000) == raw  # deterministic

    s = np.stack(
        [x, (8000 * np.cos(2 * np.pi * t / 37)).astype(np.int16)], axis=1
    )
    y2 = C.decode_wav_samples(C.encode_wav_ms_adpcm(s, 8000))
    assert y2.shape == s.shape
    assert snr(s[:, 0], y2[:, 0]) > 20.0 and snr(s[:, 1], y2[:, 1]) > 20.0

    # fact-chunk truncation of the padded final block
    y3 = C.decode_wav_samples(C.encode_wav_ms_adpcm(x[:777], 8000))
    assert len(y3) == 777

    # seam: an extensible-format payload still raises with the new message
    bad = bytearray(raw)
    f0 = raw.index(b"fmt ") + 8
    bad[f0 : f0 + 2] = _struct.pack("<H", 0xFFFE)  # WAVE_FORMAT_EXTENSIBLE
    with pytest.raises(NotImplementedError, match="EXTENSIBLE"):
        C.decode_wav_meta(bytes(bad))
    with pytest.raises(ValueError, match="samples must be"):
        C.encode_wav_ms_adpcm(np.zeros((4, 3), dtype=np.int16))
    with pytest.raises(ValueError, match="at least one"):
        C.encode_wav_ms_adpcm(np.zeros(0, dtype=np.int16))


def test_rle8_delta_past_width_then_writes_is_clean():
    """A delta escape can park the cursor past the row width; a following
    absolute or encoded write must be skipped cleanly (spec leaves skipped
    pixels undefined) instead of raising a numpy broadcast ValueError
    (round-10 ADVICE fix)."""
    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    # w=4: delta(+5,0) -> x=5 (past width), absolute [1,2,3] (pad), then
    # EOL; row1: delta(+200,0), encoded run 3x9, EOL, EOB
    data = bytes(
        [0, 2, 5, 0, 0, 3, 1, 2, 3, 0, 0, 0]
        + [0, 2, 200, 0, 3, 9, 0, 0, 0, 1]
    )
    idx = C._decode_rle8_indices(data, 4, 2)
    np.testing.assert_array_equal(idx, np.zeros((2, 4), dtype=np.uint8))


def test_wav_adpcm_truncated_final_block_no_fact():
    """A third-party ADPCM WAV with a truncated final data block and NO fact
    chunk must decode the surviving nibbles (frame count derived from actual
    bytes), never struct-crash on a short header or pad with uninitialized
    samples (round-10 ADVICE fix)."""
    import struct as _struct

    import numpy as np

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    t = np.arange(2000)
    x = (9000 * np.sin(2 * np.pi * t / 41)).astype(np.int16)

    def surgery(raw: bytes, cut: int) -> bytes:
        """Drop `cut` bytes off the data chunk and hide the fact chunk."""
        chunks = C._wav_chunks(raw)
        d0, n_data = chunks[b"data"]
        out = bytearray(raw[: d0 + n_data - cut])
        out[4:8] = _struct.pack("<I", len(out) - 8)  # RIFF size
        out[d0 - 4 : d0] = _struct.pack("<I", n_data - cut)  # data size
        fi = out.find(b"fact")
        if fi >= 0:
            out[fi : fi + 4] = b"junk"  # decoder must not see a fact chunk
        return bytes(out)

    for enc, hdr in ((C.encode_wav_ms_adpcm, 7), (C.encode_wav_ima_adpcm, 4)):
        raw = enc(x, 8000)
        full = C.decode_wav_samples(raw)
        chunks = C._wav_chunks(raw)
        _, n_data = chunks[b"data"]
        f0, _ = chunks[b"fmt "]
        block_align = _struct.unpack("<H", raw[f0 + 12 : f0 + 14])[0]
        # (a) final block keeps its header + part of the body
        cut = block_align // 2
        y = C.decode_wav_samples(surgery(raw, cut))
        assert 0 < len(y) < len(full)
        np.testing.assert_array_equal(y, full[: len(y)])
        meta = C.decode_wav_meta(surgery(raw, cut))
        assert meta["duration_ms"] == int(len(y) * 1000 // 8000)
        # (b) final block loses even its channel header -> contributes zero
        # frames; the full blocks still decode
        cut2 = block_align - (hdr - 1)
        y2 = C.decode_wav_samples(surgery(raw, cut2))
        n_full = (n_data - cut2) // block_align
        spb = _struct.unpack("<H", raw[f0 + 18 : f0 + 20])[0]
        assert len(y2) == n_full * spb
        np.testing.assert_array_equal(y2, full[: len(y2)])


def test_bmp_rle4_and_4bit_roundtrip():
    """4-bit paletted BMP (round 10): BI_RLE4 round-trips the index raster
    losslessly; the decoder honors alternating-nibble encoded runs,
    absolute mode (word-aligned nibble packing), delta, and EOL/EOB; plain
    nibble-packed BI_RGB 4-bit decodes through the shared palette path."""
    import struct as _struct

    import numpy as np
    import pytest

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    rasters = [
        np.repeat(np.arange(5, dtype=np.uint8)[:, None] % 16, 9, axis=1),
        rng.integers(0, 16, size=(4, 7), dtype=np.uint8),  # odd width
        np.zeros((3, 4), dtype=np.uint8),
    ]
    for idx in rasters:
        raw = C.encode_bmp_rle4(idx, pal)
        assert C.sniff(raw) == "bmp"
        meta = C.decode_bmp_meta(raw)
        assert (meta["width"], meta["height"]) == (idx.shape[1], idx.shape[0])
        np.testing.assert_array_equal(C.decode_bmp_pixels(raw), pal[idx])
        out = C.decode_bmp_pixels(C.resize_image(raw, 2, 2))
        assert out.shape == (2, 2, 3)

    # hand-crafted stream: row0 run 5 px alternating (3,7), absolute
    # [1,2,3] (2 bytes data + 1 pad to word), EOL; row1 delta(+2), run 2x
    # (9,9), EOL, EOB
    data = bytes(
        [5, 0x37, 0, 3, 0x12, 0x30, 0, 0]      # 3,7,3,7,3 | 1,2,3 | EOL
        + [0, 2, 2, 0, 2, 0x99, 0, 0, 0, 1]    # delta(2,0) | 9,9 | EOL | EOB
    )
    idx = C._decode_rle4_indices(data, 8, 2)
    np.testing.assert_array_equal(
        idx,
        np.array([[3, 7, 3, 7, 3, 1, 2, 3], [0, 0, 9, 9, 0, 0, 0, 0]],
                 dtype=np.uint8),
    )
    # delta past width then absolute: skipped cleanly (the RLE8 guard)
    junk = bytes([0, 2, 9, 0, 0, 3, 0x12, 0x30, 0, 0, 0, 1])
    np.testing.assert_array_equal(
        C._decode_rle4_indices(junk, 4, 1), np.zeros((1, 4), dtype=np.uint8)
    )

    # plain (uncompressed) 4-bit BI_RGB: build by patching an RLE4 header
    # onto nibble-packed rows
    idx = rasters[1]
    h, w = idx.shape
    nbytes = (w + 1) // 2
    rowsz = ((nbytes + 3) // 4) * 4
    body = bytearray()
    for r in idx[::-1]:
        padded = np.zeros(2 * nbytes, dtype=np.uint8)
        padded[:w] = r
        row = (padded[0::2] << 4) | padded[1::2]
        body += row.tobytes() + b"\x00" * (rowsz - nbytes)
    pal_bytes = np.zeros((16, 4), dtype=np.uint8)
    pal_bytes[:, :3] = pal[:, ::-1]
    offset = 54 + 64
    raw4 = bytearray()
    raw4 += _struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    raw4 += _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 4, 0, len(body),
                         2835, 2835, 16, 0)
    raw4 += pal_bytes.tobytes() + bytes(body)
    np.testing.assert_array_equal(C.decode_bmp_pixels(bytes(raw4)), pal[idx])

    # validation + the narrowed seam: 1-bit stays out
    with pytest.raises(ValueError, match="palette"):
        C.encode_bmp_rle4(rasters[0], pal[:, :2])
    with pytest.raises(ValueError, match="out of range"):
        C.encode_bmp_rle4(np.full((2, 2), 20, dtype=np.uint8), pal)
    bad1 = bytearray(bytes(raw4))
    bad1[28:30] = _struct.pack("<H", 1)  # bpp=1
    with pytest.raises(NotImplementedError, match="1-bit"):
        C.decode_bmp_meta(bytes(bad1))


def test_wav_float32_and_extensible():
    """Round 10 WAV seams narrowed: IEEE-float 32-bit PCM decodes (clipped,
    scaled, round-half-away to int16) and WAVE_FORMAT_EXTENSIBLE resolves
    its KS SubFormat GUID to the wrapped codec (s16le/s24le payloads
    byte-identical to the plain forms). f64 and non-KS GUIDs still raise."""
    import struct as _struct

    import numpy as np
    import pytest

    from filtered_ads_vector_search_spark.multimodal import codecs as C

    t = np.arange(1000)
    xf = 0.75 * np.sin(2 * np.pi * t / 50)
    raw = C.encode_wav_float32(xf, 16000)
    meta = C.decode_wav_meta(raw)
    assert meta["codec"] == "pcm_f32le"
    assert meta["duration_ms"] == int(1000 * 1000 // 16000)
    y = C.decode_wav_samples(raw)
    want = np.where(
        xf.astype(np.float32).astype(np.float64) * 32767 >= 0,
        np.floor(np.clip(xf.astype(np.float32).astype(np.float64), -1, 1) * 32767 + 0.5),
        np.ceil(np.clip(xf.astype(np.float32).astype(np.float64), -1, 1) * 32767 - 0.5),
    ).astype(np.int16)
    np.testing.assert_array_equal(y, want)
    # out-of-range floats saturate instead of wrapping
    loud = C.decode_wav_samples(C.encode_wav_float32(np.array([2.0, -3.0]), 8000))
    np.testing.assert_array_equal(loud, np.array([32767, -32767], dtype=np.int16))
    # stereo
    sf = np.stack([xf, -xf], axis=1)
    ys = C.decode_wav_samples(C.encode_wav_float32(sf, 16000))
    assert ys.shape == sf.shape

    # EXTENSIBLE-wrapped s16le: same samples as the plain encoder
    xi = (10000 * np.sin(2 * np.pi * t / 37)).astype(np.int16)
    ext = C.encode_wav_extensible(xi, 8000, bits=16)
    meta = C.decode_wav_meta(ext)
    assert meta["codec"] == "pcm_s16le" and meta["duration_ms"] == 125
    np.testing.assert_array_equal(C.decode_wav_samples(ext), xi)
    # EXTENSIBLE-wrapped s24le, stereo
    x24 = np.stack(
        [(xi.astype(np.int32) << 7), -(xi.astype(np.int32) << 7)], axis=1
    )
    ext24 = C.encode_wav_extensible(x24, 8000, bits=24)
    assert C.decode_wav_meta(ext24)["codec"] == "pcm_s24le"
    np.testing.assert_array_equal(C.decode_wav_samples(ext24), x24)

    # seams: non-KS GUID raises; short extensible fmt raises; f64 raises
    badguid = bytearray(ext)
    f0 = ext.index(b"fmt ") + 8
    badguid[f0 + 28] = 0xFF  # corrupt the GUID tail
    with pytest.raises(NotImplementedError, match="SubFormat"):
        C.decode_wav_meta(bytes(badguid))
    with pytest.raises(ValueError, match="bits"):
        C.encode_wav_extensible(xi, 8000, bits=32)
    bad64 = bytearray(C.encode_wav_float32(xf, 8000))
    bad64[f0 + 14 : f0 + 16] = _struct.pack("<H", 64)
    with pytest.raises(NotImplementedError, match="f64"):
        C.decode_wav_meta(bytes(bad64))

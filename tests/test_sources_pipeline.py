"""Sources, ingest pipeline, quantized-tier build (SURVEY.md §2 A, §3.2, I4)."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.pipeline import (
    IngestConfig,
    build_quantized_tiers,
    ingest_reviews,
    mock_embed,
)
from filtered_ads_vector_search_spark.sources import (
    read_bigann,
    read_npy_chunks,
    read_reviews_jsonl,
    write_bigann,
    dtype_from_filename,
    suffix_from_dtype,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("reviews")
    cats = {"Books": 30, "Electronics": 20}
    for cat, n in cats.items():
        with open(d / f"{cat}.jsonl", "w") as f:
            for i in range(n):
                f.write(
                    json.dumps(
                        {
                            "text": f"review {i} of {cat} " + "word " * (i % 20),
                            "rating": float(1 + i % 5),
                            "title": f"t{i}",
                        }
                    )
                    + "\n"
                )
    return str(d)


def test_reviews_jsonl_scan(spark, jsonl_dir):
    df = read_reviews_jsonl(spark, jsonl_dir)
    assert df.count() == 50
    cats = {r["category"] for r in df.select("category").distinct().collect()}
    assert cats == {"Books", "Electronics"}


def test_ingest_pipeline_end_to_end(spark, jsonl_dir, tmp_path):
    out = str(tmp_path / "emb")
    cfg = IngestConfig(categories=["Books"], min_tokens=10, max_embeddings=20, fp16=True)
    df = ingest_reviews(spark, jsonl_dir, cfg, output_path=out)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert all(len(r["embedding"]) == 64 for r in rows)
    # deterministic embedder: same text -> same vector
    df2 = ingest_reviews(spark, jsonl_dir, cfg)
    v1 = {r["text"]: tuple(r["embedding"]) for r in rows}
    v2 = {r["text"]: tuple(r["embedding"]) for r in df2.collect()}
    for t, v in v1.items():
        assert v2[t] == v


def test_mock_embed_is_normalized(spark):
    df = spark.createDataFrame([("hello world",), ("foo bar",)], "text string")
    out = mock_embed(df).collect()
    for r in out:
        assert abs(float(np.linalg.norm(r["embedding"])) - 1.0) < 1e-5


def test_bigann_roundtrip(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").orderBy("vec_id").limit(50)
    path = str(tmp_path / "vecs.fbin")
    n = write_bigann(emb.select(F.col("embedding").alias("vec")), path)
    assert n == 50
    back = read_bigann(spark, path).orderBy("row_id").collect()
    orig = emb.collect()
    assert len(back) == 50
    np.testing.assert_allclose(
        np.array(back[7]["vec"]), np.array(orig[7]["embedding"], dtype=np.float32), rtol=1e-6
    )


def test_bigann_dtype_helpers():
    assert dtype_from_filename("x.fbin") == np.float32
    assert dtype_from_filename("x.i8bin") == np.int8
    assert suffix_from_dtype(np.float16) == ".hbin"
    with pytest.raises(ValueError):
        dtype_from_filename("x.parquet")


def test_npy_chunk_scan(spark, tmp_path):
    rng = np.random.RandomState(42)
    for i in range(3):
        np.save(tmp_path / f"embeddings_{i}.npy", rng.randn(10, 8).astype(np.float32))
    df = read_npy_chunks(spark, str(tmp_path / "embeddings_*.npy"))
    rows = df.collect()
    assert len(rows) == 30
    assert {r["chunk_id"] for r in rows} == {0, 1, 2}
    r0 = [r for r in rows if r["chunk_id"] == 1 and r["row_id"] == 3][0]
    expect = np.load(tmp_path / "embeddings_1.npy")[3]
    np.testing.assert_allclose(np.array(r0["vec"]), expect, rtol=1e-6)


def test_quantized_tiers(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(200)
    paths = build_quantized_tiers(spark, emb, str(tmp_path / "tiers"))
    assert set(paths) == {"full_precision", "half_precision", "scalar", "binary"}
    sq = spark.read.parquet(paths["scalar"]).first()
    assert all(-127 <= x <= 127 for x in sq["embedding"])
    bi = spark.read.parquet(paths["binary"]).first()
    assert set(bi["embedding"]) <= {0, 1}
    fp = spark.read.parquet(paths["full_precision"])
    hp = spark.read.parquet(paths["half_precision"])
    # fp16 roundtrip changes values only below ~1e-3 relative
    a = np.array(fp.orderBy("vec_id").first()["embedding"])
    b = np.array(hp.orderBy("vec_id").first()["embedding"])
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_embeddings_jsonl_row_id_is_file_line_number(spark, tmp_path):
    """row_id must equal the 0-based line number within its file, stable
    across re-reads and split layouts (the reference's per-file numbering,
    load_embeddings_from_jsonl)."""
    from filtered_ads_vector_search_spark.sources import read_embeddings_jsonl

    path = tmp_path / "emb.jsonl"
    n = 200
    with open(path, "w") as f:
        for i in range(n):
            f.write(
                json.dumps({"output_embeddings": [[float(i), 0.5]], "text": f"line-{i}"}) + "\n"
            )

    def id_map(df):
        return {r["text"]: (r["row_id"], tuple(r["embedding"])) for r in df.collect()}

    m1 = id_map(read_embeddings_jsonl(spark, str(path)))
    assert len(m1) == n
    for i in range(n):
        rid, vec = m1[f"line-{i}"]
        assert rid == i
        assert vec[0] == float(i)
    # force a different split layout; ids must not move
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        assert id_map(read_embeddings_jsonl(spark, str(path))) == m1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_write_bigann_driver_cap(spark, tmp_path, monkeypatch):
    """The interop sink must refuse corpus-sized inputs instead of
    materializing them on the driver."""
    import filtered_ads_vector_search_spark.sources.bigann as BA

    monkeypatch.setattr(BA, "MAX_BIGANN_WRITE_ROWS", 5)
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(10)
    with pytest.raises(ValueError, match="Parquet"):
        BA.write_bigann(emb.select(F.col("embedding").alias("vec")), str(tmp_path / "x.fbin"))

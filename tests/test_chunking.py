"""Chunking + sequence packing (operators/chunking.py): reconstruction,
budget invariants, partition invariance."""

import pytest
from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.operators.chunking import (
    chunk_text,
    pack_sequences,
)


def test_chunk_text_reconstructs_document(spark):
    """Stride arithmetic: dropping each chunk's leading `overlap` chars (past
    chunk 0) and concatenating reproduces the document exactly."""
    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789"), (2, "short")],
        "doc_id long, text string",
    )
    rows = chunk_text(docs, chunk_chars=10, overlap=3).orderBy("doc_id", "chunk_id").collect()
    by_doc = {}
    for r in rows:
        piece = r["chunk"] if r["chunk_id"] == 0 else r["chunk"][3:]
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], "") + piece
    assert by_doc[1] == "abcdefghijklmnopqrstuvwxyz0123456789"
    assert by_doc[2] == "short"  # short doc -> single whole-text chunk
    assert max(r["chunk_id"] for r in rows if r["doc_id"] == 2) == 0
    # consecutive chunks overlap by exactly `overlap` chars
    c = [r["chunk"] for r in rows if r["doc_id"] == 1]
    assert all(a[-3:] == b[:3] for a, b in zip(c, c[1:]) if len(b) >= 3)


def test_chunk_text_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_text(docs, chunk_chars=10, overlap=10)


def test_pack_sequences_budget_invariants(spark):
    """Concat-and-split: offsets in [0, budget); consecutive docs in pack
    order tile the token line with no gaps; total packs = ceil(total/budget)."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tok")
    )
    out = pack_sequences(docs, "n_tok", budget=64, n_shards=8).collect()
    assert len(out) == 200
    assert all(0 <= r["start_in_pack"] < 64 for r in out)
    toks = {r["doc_id"]: (r["doc_id"] % 37 + 1) for r in out}
    # global starts tile [0, total) contiguously
    starts = sorted(r["pack_id"] * 64 + r["start_in_pack"] for r in out)
    total = sum(toks.values())
    expect = 0
    by_start = sorted(out, key=lambda r: r["pack_id"] * 64 + r["start_in_pack"])
    for r in by_start:
        assert r["pack_id"] * 64 + r["start_in_pack"] == expect
        expect += toks[r["doc_id"]]
    assert expect == total
    # straddle flag is exact
    for r in by_start:
        assert r["straddles"] == (r["start_in_pack"] + toks[r["doc_id"]] > 64)


def test_pack_sequences_partition_invariance(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13 + 1).alias("n_tok")
    )
    a = {tuple(r) for r in pack_sequences(docs.repartition(1), "n_tok", budget=100).collect()}
    b = {tuple(r) for r in pack_sequences(docs.repartition(11), "n_tok", budget=100).collect()}
    assert a == b


def test_pack_sequences_validation(spark):
    docs = spark.range(5).select(F.col("id").alias("doc_id"), F.lit(3).alias("n_tok"))
    with pytest.raises(ValueError):
        pack_sequences(docs, "n_tok", budget=0)

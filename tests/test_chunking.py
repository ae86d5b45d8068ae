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


# --- content-defined chunking -----------------------------------------------


def test_cdc_boundaries_resynchronize_after_prefix_edit(spark):
    """The CDC property: prepending a prefix only perturbs chunks up to the
    first post-edit boundary — every later chunk hash matches the original
    (fixed windows would shift EVERYTHING). Planted with enough text that
    at least one shared chunk must exist."""
    from filtered_ads_vector_search_spark.operators.chunking import chunk_cdc

    words = " ".join(f"w{i % 37}x{i % 11}" for i in range(400))
    rows = [(0, words), (1, "injected prefix tokens " + words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_cdc(df).collect()
    by_doc = {0: set(), 1: set()}
    for r in chunks:
        by_doc[r.doc_id].add(r.chunk_md5)
    shared = by_doc[0] & by_doc[1]
    # nearly all of doc 0's chunks reappear verbatim in doc 1
    assert len(shared) >= 0.8 * len(by_doc[0]), (len(shared), len(by_doc[0]))


def test_cdc_chunks_partition_token_stream(spark):
    """Chunk token counts sum to the document's token count, and chunk ids
    are dense from 0."""
    from filtered_ads_vector_search_spark.operators.chunking import chunk_cdc
    from tests.conftest import SF_TEST

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").limit(50)
    chunks = chunk_cdc(docs).collect()
    import collections

    per_doc = collections.defaultdict(list)
    for r in chunks:
        per_doc[r.doc_id].append(r)
    toks = {r.doc_id: len(r.text.split()) for r in docs.collect()}
    for did, rs in per_doc.items():
        assert sum(r.n_tok for r in rs) == toks[did]
        ids = sorted(r.chunk_id for r in rs)
        assert ids == list(range(len(ids)))


def test_cdc_matches_pure_python_twin(spark):
    """chunk_cdc's boundary arithmetic reproduced in pure Python over the
    same portable-hash constants — pins the Spark expression independent of
    the DuckDB oracle."""
    import hashlib

    from filtered_ads_vector_search_spark.functions.hashing import A1, A2, C1, C2, P
    from filtered_ads_vector_search_spark.operators.chunking import (
        CDC_DIVISOR,
        CDC_SEED,
        chunk_cdc,
    )

    def py_hash(x, seed):
        h0 = (x + seed * 7919) % P
        h1 = (h0 * A1 + C1) % P
        return (h1 * A2 + C2) % P

    rows = [
        (0, "Alpha beta GAMMA delta epsilon zeta eta theta iota kappa"),
        (1, "one two three"),
        (2, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.n_tok, r.chunk_md5)
        for r in chunk_cdc(df).collect()
    }
    want = {}
    for did, text in rows:
        toks = text.lower().split()
        chunk_id, chunks = 0, {}
        for p, tok in enumerate(toks):
            if p > 0:
                g = f"{toks[p-1]} {tok}"
                sh = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                if py_hash(sh, CDC_SEED) % CDC_DIVISOR == 0:
                    chunk_id += 1
            chunks.setdefault(chunk_id, []).append(tok)
        for cid, ts in chunks.items():
            want[(did, cid)] = (
                len(ts),
                hashlib.md5(" ".join(ts).encode()).hexdigest(),
            )
    assert got == want

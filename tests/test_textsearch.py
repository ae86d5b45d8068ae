"""Lexical BM25 + RRF hybrid fusion (operators/textsearch.py)."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.operators import textsearch as TS

from conftest import SF_TEST


def test_bm25_ranks_matching_docs_first(spark):
    """A document containing every query term must outrank one sharing no
    terms; a doc repeating the rare term beats one mentioning it once."""
    docs = spark.createDataFrame(
        [
            (1, "zebra quantum flux"),
            (2, "zebra zebra quantum"),
            (3, "table chair lamp"),
            (4, "quantum flux zebra flux"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "zebra quantum flux")], "query_id int, query_text string")
    out = TS.bm25_search(docs, qs, k=4).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert 3 not in ranked  # no shared term -> no row at all
    assert set(ranked) == {1, 2, 4}
    assert ranked[0] in (1, 4)  # all three terms beat two-term doc 2
    assert all(r["score"] > 0 for r in out)


def test_bm25_idf_downweights_common_terms(spark):
    """A term present in every document contributes ~nothing; a rare term
    dominates — the idf property."""
    docs = spark.createDataFrame(
        [(i, "common filler words " + ("needle" if i == 7 else "hay")) for i in range(1, 11)],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "common needle")], "query_id int, query_text string")
    out = TS.bm25_search(docs, qs, k=1).collect()
    assert out[0]["doc_id"] == 7


def test_bm25_on_documents_table(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    qs = spark.createDataFrame(
        [(1, "spark window agg"), (2, "vector scan filter")],
        "query_id int, query_text string",
    )
    out = TS.bm25_search(docs, qs, k=10)
    rows = out.collect()
    assert len(rows) == 20  # k rows per query on this vocabulary-rich corpus
    assert {r["query_id"] for r in rows} == {1, 2}
    # ranks are 1..k per query with strictly non-increasing scores
    for qid in (1, 2):
        qr = sorted([r for r in rows if r["query_id"] == qid], key=lambda r: r["rank"])
        assert [r["rank"] for r in qr] == list(range(1, 11))
        scores = [r["score"] for r in qr]
        assert scores == sorted(scores, reverse=True)


def test_rrf_fusion_rewards_presence_in_both_lists(spark):
    """A doc ranked mid-list in BOTH rankers outranks a doc that tops one
    list but misses the other (1/(60+2)+1/(60+2) > 1/(60+1))."""
    a = spark.createDataFrame(
        [(1, 100, 1), (1, 200, 2), (1, 300, 3)], "query_id int, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 200, 2), (1, 400, 1), (1, 300, 5)], "query_id int, doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in TS.rrf_fuse(a, b, k=10).collect()}
    assert out[200]["rank"] == 1  # in both lists
    assert set(out) == {100, 200, 300, 400}
    # doc 300 in both lists at (3, 5) still beats single-list docs 100/400?
    # 1/63 + 1/65 = 0.0312 > 1/61 = 0.0164 — yes
    assert out[300]["rank"] == 2


def test_bm25_index_layout_matches_in_memory_and_prunes(spark, tmp_path):
    """The written term-index layout must return EXACTLY the in-memory BM25
    results (same order-fixed fold), and its posting scan must carry a
    partition filter on term_bucket — the lexical tier's analog of the ANN
    layouts' bucket pruning."""
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    qs = spark.createDataFrame(
        [(1, "spark window agg"), (2, "vector scan filter")],
        "query_id int, query_text string",
    )
    path = str(tmp_path / "term_index")
    TS.write_term_index(docs, path, n_buckets=16)

    mem = sorted(map(tuple, TS.bm25_search(docs, qs, k=10).collect()))
    idx = TS.bm25_search_index(spark, path, qs, k=10)
    assert sorted(map(tuple, idx.collect())) == mem and len(mem) > 0

    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term_bucket" in plan, plan[:2000]


def test_bm25_index_append_and_compact(spark, tmp_path):
    """Incremental term-index maintenance: batch appends are idempotent per
    batch id, search over base+batches equals a from-scratch index on the
    union corpus (df/meta reconstruct additively), and compaction folds the
    batches in without changing any result."""
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    qs = spark.createDataFrame(
        [(1, "spark window agg"), (2, "vector scan filter")],
        "query_id int, query_text string",
    )
    path = str(tmp_path / "tidx")
    TS.write_term_index(old, path, n_buckets=16)

    TS.append_to_term_index(spark, path, new, batch_id=7)
    TS.append_to_term_index(spark, path, new, batch_id=7)  # replay: idempotent

    full = str(tmp_path / "tidx_full")
    TS.write_term_index(docs, full, n_buckets=16)
    want = sorted(map(tuple, TS.bm25_search_index(spark, full, qs, k=10).collect()))
    got = sorted(map(tuple, TS.bm25_search_index(spark, path, qs, k=10).collect()))
    assert got == want and len(want) > 0

    n = TS.compact_term_index(spark, path)
    assert n > 0
    import pathlib

    assert not (pathlib.Path(path) / "batches").exists()
    after = sorted(map(tuple, TS.bm25_search_index(spark, path, qs, k=10).collect()))
    assert after == want
    # bounded files per bucket after compaction
    for bdir in (pathlib.Path(path) / "terms").glob("term_bucket=*"):
        assert len(list(bdir.glob("*.parquet"))) <= 1, bdir

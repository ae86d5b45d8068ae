"""BPE tokenizer training/application (operators/bpe.py): the published
Sennrich et al. 2016 algorithm over the distributed word-frequency table —
merge-list correctness on a hand-checkable corpus, determinism across
partitioning, and the greedy encode's compression behavior."""

import pyspark.sql.functions as F

from filtered_ads_vector_search_spark.operators import bpe as B

from tests.conftest import SF_TEST


def test_bpe_train_local_textbook_example():
    """The canonical worked example: {'low':5,'lower':2,'newest':6,
    'widest':3} — the first merges must be (e,s), (es,t), (est</w>)... per
    the paper's own walk-through."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = B.bpe_train_local(wf, n_merges=4)
    assert merges[0] == ("e", "s")      # freq 9 (newest + widest)
    assert merges[1] == ("es", "t" + B.EOW)  # 'est</w>' freq 9
    # next: 'l','o' (low:5 + lower:2 = 7) beats everything else at 7
    assert merges[2] == ("l", "o")
    assert len(merges) == 4


def test_bpe_train_distributed_matches_local_and_is_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    wf = [
        (r["word"], r["freq"])
        for r in B.word_frequencies(docs)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .collect()
    ]
    want = B.bpe_train_local(wf, n_merges=50)
    got = B.bpe_train(docs, n_merges=50)
    assert got == want and len(got) == 50
    again = B.bpe_train(docs.repartition(13), n_merges=50)
    assert again == got


def test_bpe_apply_compresses_and_roundtrips(spark):
    """Trained subword counts sit between the character count and the
    whitespace token count, shrink as merges grow, and with zero merges
    equal the per-word character count (each symbol is one char)."""
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").limit(100)
    m200 = B.bpe_train(docs, n_merges=200)
    m20 = m200[:20]
    counts = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("ws"),
        B.bpe_apply_udf([])(F.col("text")).alias("n0"),
        B.bpe_apply_udf(m20)(F.col("text")).alias("n20"),
        B.bpe_apply_udf(m200)(F.col("text")).alias("n200"),
    ).collect()
    for r in counts:
        assert r.n0 >= r.n20 >= r.n200 >= r.ws  # merges only ever compress
    assert any(r.n20 > r.n200 for r in counts)  # and they actually fire


def test_bpe_encode_word_greedy_rank_order():
    merges = [("e", "s"), ("es", "t" + B.EOW), ("l", "o")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B._encode_word("newest", ranks) == ["n", "e", "w", "est" + B.EOW]
    assert B._encode_word("low", ranks) == ["lo", "w" + B.EOW]
    assert B._encode_word("", ranks) == []

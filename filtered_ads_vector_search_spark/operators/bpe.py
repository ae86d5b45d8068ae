"""Byte-pair-encoding tokenizer TRAINING and application.

The published BPE algorithm (Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016; the same scheme
GPT-2's tokenizer trains with): start from characters, repeatedly merge the
most frequent adjacent symbol pair. The classic efficiency observation —
which is also what makes the algorithm DISTRIBUTED-friendly — is that
training never needs the corpus, only the word -> frequency table: pair
counts are sums of word counts, so the merge loop runs over a vocabulary-
sized relation.

Spark shape:
* ``word_frequencies`` — ONE map-combinable groupBy over exploded
  whitespace tokens (the corpus-sized pass; the shuffle key is the word).
* ``bpe_train`` — collects the (bounded, top-``max_words``-by-count)
  frequency table and runs the merge loop driver-side, exactly like every
  in-memory BPE trainer (HuggingFace tokenizers does the same); this is the
  centroid/codebook bounded-collect discipline, with the cap made explicit.
  Determinism: the next merge is the max by (count, pair) with a FIXED
  lexicographic tie-break, so training is reproducible and
  partition-count-invariant.
* ``bpe_apply_udf`` — Arrow-batched application of the trained merge list
  (broadcast, rank-ordered greedy merging per word — the published encode)
  producing per-document subword counts; feeds the fertility metrics
  (quality.token_fertility) with a REAL trained tokenizer instead of the
  regex approximation.

Like trained k-means / PCA, the training loop is iterative state — not
SQL-expressible — so verification is a pure-Python twin (bit-for-bit merge
list equality) plus invariance tests, the same contract the other trained
operators use.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["word_frequencies", "bpe_train", "bpe_train_local", "bpe_apply_udf"]

# marker appended to the final symbol of every word (the reference
# implementation's end-of-word marker '</w>')
EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over whitespace tokens — the only corpus-sized pass BPE
    training needs."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        docs.select(F.explode(tokens(t)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The merge loop over an in-memory frequency table (driver-side twin —
    this IS the published algorithm; `bpe_train` feeds it the distributed
    count). Returns the ordered merge list [(left, right), ...]."""
    words: list[tuple[list[str], int]] = [
        (list(w[:-1]) + [w[-1] + EOW], f) for w, f in word_freqs if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # deterministic: max count, ties broken by LEXICOGRAPHICALLY
        # SMALLEST pair — reproducible and partition-count-invariant
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        for syms, _f in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 1_000_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Train BPE merges over a corpus: distributed word-frequency aggregate,
    then the driver-side merge loop over the (top-``max_words``-by-count)
    table. The cap is the standard trainer practice (rare words below the
    cut contribute negligibly to pair counts) and bounds the collect the
    way centroid/codebook/vocab collects are bounded elsewhere; ordering is
    (freq desc, word asc) so the cut itself is deterministic."""
    wf = (
        word_frequencies(docs, text_col=text_col, lowercase=lowercase)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return bpe_train_local([(r["word"], r["freq"]) for r in wf], n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-ordered merge of one word (the published encode: apply
    the LOWEST-rank applicable merge until none applies)."""
    syms = list(word[:-1]) + [word[-1] + EOW] if word else []
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_apply_udf(merges: list[tuple[str, str]], lowercase: bool = True):
    """Arrow-batched per-document subword count under the trained merges —
    the real-tokenizer fertility input. The merge list rides in the closure
    (broadcast by Spark's task serialization; it is n_merges tuples).

    Per-word memo: word frequency is Zipfian, so most tokens in a batch
    repeat a small head vocabulary; encoding is pure given the fixed merge
    ranks, so caching the subword count per word changes nothing but the
    constant factor (the same memo every production tokenizer keeps). A
    plain dict (not functools.lru_cache — the wrapper is not
    cloudpickle-serializable inside a UDF closure) capped at 2^17 entries:
    insertion simply stops at the cap, which keeps the Zipf head — the
    entries that matter — and bounds worker memory. One cache per Python
    worker, warm across Arrow batches of the same task."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    cache: dict[str, int] = {}
    cache_cap = 1 << 17

    @F.pandas_udf("int")
    def run(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            s = (t or "")
            if lowercase:
                s = s.lower()
            n = 0
            for w in s.split():
                c = cache.get(w)
                if c is None:
                    c = len(_encode_word(w, ranks))
                    if len(cache) < cache_cap:
                        cache[w] = c
                n += c
            out.append(n)
        return pd.Series(out, dtype="int32")

    return run

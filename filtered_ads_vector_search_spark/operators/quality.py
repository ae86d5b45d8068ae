"""Corpus-quality operators: Gopher-style rule filtering + vocabulary stats.

Beyond the reference (its corpus is pre-curated Amazon reviews) — these are
the standard document-quality gates a pretraining-data pipeline runs before
dedup/packing:

* gopher_rules — the published Gopher quality heuristics (Rae et al. 2021,
  "Scaling Language Models", App. A1.1) re-expressed as one declarative
  projection: per-doc word count / mean word length / alphabetic-word
  fraction / stopword evidence bounds, composed with the intra-doc
  repetition fractions (dedup.repetition_stats) into a keep flag plus one
  boolean column per rule (the reason mask — a dropped doc says WHY).
* vocab_top_terms / vocab_summary — corpus vocabulary statistics (term and
  document frequency, hapax fraction, type/token ratio): the inputs to
  tokenizer/vocab construction and corpus drift monitoring.

Scale: every rule is a scalar projection over the documents scan (one pass,
whole-stage codegen, no UDF); repetition joins on doc_id; the vocabulary
build is explode -> map-side-combinable groupBy(term) — the canonical
word-count shuffle, bounded by |vocab| not |corpus|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from . import dedup as DD

__all__ = [
    "gopher_rules",
    "gopher_rules_sql",
    "vocab_top_terms",
    "vocab_top_terms_sql",
    "vocab_summary",
    "vocab_summary_sql",
]

# Gopher App. A1.1 bounds, adapted where the published constant cannot
# discriminate on a synthetic bag-of-words corpus (doc length here is ~60
# words, so the 50..100k word window is kept verbatim; the repetition caps
# use the paper's duplicate-5-gram/top-2-gram character-fraction form).
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORD_HITS = 2
MAX_TOP2GRAM_CHAR_FRAC = 0.08
MAX_DUP5GRAM_CHAR_FRAC = 0.30


def gopher_rules(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc rule evaluation: one boolean per Gopher rule + composed
    ``keep``.  Word-level rules are scalar expressions over one scan; the
    two repetition rules join dedup.repetition_stats on doc_id."""
    t = F.col(text_col)
    toks = T.tokens(t)
    n_words = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    ) / F.nullif(n_words.cast("double"), F.lit(0.0))
    alpha_frac = F.size(
        F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    ).cast("double") / F.nullif(n_words.cast("double"), F.lit(0.0))
    stop_hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(T.STOPWORDS)))

    base = documents.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )
    rep = DD.repetition_stats(documents, text_col=text_col)
    out = base.join(rep, "doc_id")
    rules = {
        "ok_word_count": (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS),
        "ok_mean_word_len": (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN),
        "ok_alpha_words": F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC,
        "ok_stopwords": F.col("stopword_hits") >= MIN_STOPWORD_HITS,
        "ok_top2gram": F.col("top_ngram_char_frac") <= MAX_TOP2GRAM_CHAR_FRAC,
        "ok_dup5gram": F.col("dup_ngram_char_frac") <= MAX_DUP5GRAM_CHAR_FRAC,
    }
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        "stopword_hits",
        "top_ngram_char_frac",
        "dup_ngram_char_frac",
        *rules.keys(),
        "keep",
    )


def gopher_rules_sql(table: str = "documents") -> str:
    t = "text"
    toks = T.tokens_sql(t)
    n_words = f"len({toks})"
    mean_len = (
        f"(list_sum(list_transform({toks}, w -> CAST(length(w) AS DOUBLE)))"
        f" / nullif(CAST({n_words} AS DOUBLE), 0.0))"
    )
    alpha = (
        f"(CAST(len(list_filter({toks}, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)"
        f" / nullif(CAST({n_words} AS DOUBLE), 0.0))"
    )
    stop_lst = ", ".join(f"'{w}'" for w in T.STOPWORDS)
    stop_hits = f"len(list_filter({toks}, w -> list_contains([{stop_lst}], lower(w))))"
    rep = DD.repetition_stats_sql(table)
    return f"""
WITH rep AS ({rep}),
base AS (
  SELECT doc_id,
         {n_words} AS n_words,
         round({mean_len}, 4) AS mean_word_len,
         round({alpha}, 4) AS alpha_word_frac,
         {stop_hits} AS stopword_hits
  FROM {table}
),
j AS (
  SELECT b.*, r.top_ngram_char_frac, r.dup_ngram_char_frac
  FROM base b JOIN rep r ON b.doc_id = r.doc_id
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac, stopword_hits,
       top_ngram_char_frac, dup_ngram_char_frac,
       (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}) AS ok_word_count,
       (mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN})
         AS ok_mean_word_len,
       (alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}) AS ok_alpha_words,
       (stopword_hits >= {MIN_STOPWORD_HITS}) AS ok_stopwords,
       (top_ngram_char_frac <= {MAX_TOP2GRAM_CHAR_FRAC}) AS ok_top2gram,
       (dup_ngram_char_frac <= {MAX_DUP5GRAM_CHAR_FRAC}) AS ok_dup5gram,
       (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
        AND mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN}
        AND alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}
        AND stopword_hits >= {MIN_STOPWORD_HITS}
        AND top_ngram_char_frac <= {MAX_TOP2GRAM_CHAR_FRAC}
        AND dup_ngram_char_frac <= {MAX_DUP5GRAM_CHAR_FRAC}) AS keep
FROM j
"""


def vocab_top_terms(
    documents: DataFrame, top_n: int = 50, text_col: str = "text"
) -> DataFrame:
    """Top-N vocabulary terms by collection frequency (ties broken by term):
    term, term_freq (total occurrences), doc_freq (docs containing it).
    explode -> groupBy(term) is map-side combinable; the rank window runs
    over the |vocab|-sized aggregate, never the corpus."""
    ex = documents.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col(text_col)))).alias("term")
    )
    agg = ex.groupBy("term").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    w = Window.orderBy(F.col("term_freq").desc(), F.col("term").asc())
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select("rnk", "term", "term_freq", "doc_freq")
    )


def vocab_top_terms_sql(table: str = "documents", top_n: int = 50) -> str:
    toks = T.tokens_sql("lower(text)")
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({toks}) AS term FROM {table}
),
agg AS (
  SELECT term, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq
  FROM ex GROUP BY term
)
SELECT * FROM (
  SELECT row_number() OVER (ORDER BY term_freq DESC, term ASC) AS rnk,
         term, term_freq, doc_freq
  FROM agg
) WHERE rnk <= {top_n}
"""


def domain_mix_weights(
    documents: DataFrame,
    domain_col: str = "lang",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Static domain-reweighting table (the Pile-style mixing step, the
    degenerate single-pass form of DoReMi): per domain, its token share of
    the corpus and the sampling weight that would equalize token mass across
    domains (uniform target). weight = target_share / current_share; a
    sampler drawing domains ∝ weight * share sees the uniform mix. One
    map-combinable groupBy over token counts; the result is |domains| rows.
    """
    agg = (
        documents.groupBy(domain_col)
        .agg(F.sum(T.token_count(F.col(text_col))).alias("n_tokens"))
    )
    tot = agg.agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("nd")
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            domain_col,
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot").cast("double"), round_digits).alias(
                "token_share"
            ),
            F.round(
                (F.lit(1.0) / F.col("nd"))
                / (F.col("n_tokens") / F.col("tot").cast("double")),
                round_digits,
            ).alias("mix_weight"),
        )
    )


def domain_mix_weights_sql(
    table: str = "documents", domain_col: str = "lang", round_digits: int = 6
) -> str:
    toks = T.token_count_sql("text")
    return f"""
WITH agg AS (
  -- CAST: DuckDB sum(BIGINT) widens to HUGEINT (object on the pandas hash
  -- boundary — the tpch_q12 round-1 failure class)
  SELECT {domain_col}, CAST(sum({toks}) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY {domain_col}
),
tot AS (SELECT sum(n_tokens) AS tot, count(*) AS nd FROM agg)
SELECT {domain_col}, n_tokens,
       round(n_tokens / CAST(tot AS DOUBLE), {round_digits}) AS token_share,
       round((1.0 / nd) / (n_tokens / CAST(tot AS DOUBLE)), {round_digits}) AS mix_weight
FROM agg CROSS JOIN tot
"""


def token_fertility(
    documents: DataFrame, text_col: str = "text", round_digits: int = 4
) -> DataFrame:
    """Per-language tokenizer fertility: mean characters per whitespace
    token and the BPE-ish/whitespace token ratio — the quick check that a
    tokenizer doesn't explode some language's sequence lengths. Sums are
    exact integers before the one double division."""
    t = F.col(text_col)
    agg = documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.char_length(t)).alias("chars"),
        F.sum(T.token_count(t)).alias("ws"),
        F.sum(T.bpe_token_count(t)).alias("bpe"),
    )
    return agg.select(
        "lang",
        "n_docs",
        F.round(F.col("chars") / F.col("ws").cast("double"), round_digits).alias(
            "chars_per_ws_token"
        ),
        F.round(F.col("bpe") / F.col("ws").cast("double"), round_digits).alias(
            "bpe_per_ws_token"
        ),
    )


def token_fertility_sql(table: str = "documents", round_digits: int = 4) -> str:
    ws = T.token_count_sql("text")
    bpe = T.bpe_token_count_sql("text")
    return f"""
WITH agg AS (
  SELECT lang, count(*) AS n_docs, sum(length(text)) AS chars,
         sum({ws}) AS ws, sum({bpe}) AS bpe
  FROM {table} GROUP BY lang
)
SELECT lang, n_docs,
       round(chars / CAST(ws AS DOUBLE), {round_digits}) AS chars_per_ws_token,
       round(bpe / CAST(ws AS DOUBLE), {round_digits}) AS bpe_per_ws_token
FROM agg
"""


def vocab_summary(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus vocabulary summary: token count, type count, hapax
    types (term_freq = 1), type/token ratio, hapax fraction."""
    ex = documents.select(F.explode(T.tokens(F.lower(F.col(text_col)))).alias("term"))
    agg = ex.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    return agg.agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("tf") == 1).cast("long")).alias("hapax_types"),
        F.round(F.count(F.lit(1)) / F.sum("tf").cast("double"), 6).alias(
            "type_token_ratio"
        ),
        F.round(
            F.sum((F.col("tf") == 1).cast("long")) / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("hapax_frac"),
    )


def vocab_summary_sql(table: str = "documents") -> str:
    toks = T.tokens_sql("lower(text)")
    return f"""
WITH ex AS (
  SELECT unnest({toks}) AS term FROM {table}
),
agg AS (
  SELECT term, count(*) AS tf FROM ex GROUP BY term
)
SELECT CAST(sum(tf) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_types,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(tf) AS DOUBLE), 6) AS type_token_ratio,
       round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_frac
FROM agg
"""

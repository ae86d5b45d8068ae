"""Text expression library (SURVEY.md §2 C10/B2 + training-data-pipeline ops).

Whitespace tokenization mirrors the reference's ``tokenize_and_count``
(reference: download_dataset/utils.py:202-212). The rest — word shingles,
language-ID heuristic, quality scoring, fingerprinting — is the text-analysis
surface a large-scale training-data pipeline needs on top of the reference.

Everything is built from Spark built-ins (split / transform / aggregate /
array_intersect) so it stays JVM-side; each function has a DuckDB ``*_sql``
twin generated from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import P, str_hash_col, str_hash_sql

__all__ = [
    "clean_text",
    "clean_text_sql",
    "tokens",
    "token_count",
    "bpe_tokens",
    "bpe_token_count",
    "bpe_token_count_sql",
    "BPE_PATTERN",
    "word_shingles",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_predict",
    "fingerprint",
    "tokens_sql",
    "token_count_sql",
    "word_shingles_sql",
    "punct_ratio_sql",
    "stopword_ratio_sql",
    "quality_score_sql",
    "lang_predict_sql",
    "fingerprint_sql",
    "STOPWORDS",
    "LANG_MARKERS",
]

WS = r"\s+"

# A small English stopword list for quality scoring (fixed, portable).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# Per-language marker words for the n-gram-free language-ID heuristic.
# The synthetic `documents` table carries lang in {en, es, zh, de, fr, ...};
# markers are chosen from each language's most common function words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "to", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}
_LANG_ORDER = ["en", "es", "de", "fr", "zh"]  # deterministic tie-break order


def tokens(text: Column) -> Column:
    """Whitespace tokens (reference: download_dataset/utils.py:202-212)."""
    return F.split(F.trim(text), WS)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def tokens_sql(text: str) -> str:
    return f"string_split_regex(trim({text}), '\\s+')"


def token_count_sql(text: str) -> str:
    return f"len({tokens_sql(text)})"


def word_ngrams(text: Column, n: int = 3) -> Column:
    """ALL n-word grams in order (occurrences preserved — the repetition-
    analysis form; dedup wants the distinct set, see word_shingles).

    Guarded: fewer than n tokens -> empty array (Spark `sequence` would
    otherwise generate a DESCENDING range and corrupt results).
    """
    # Let-binding via transform over a 1-element array: the token split runs
    # once per row and `t` is a bound lambda variable. Referencing the split
    # expression directly inside the inner lambda would re-run the regex
    # split once per shingle (~tokens× the cost).
    per_row = F.transform(
        F.array(tokens(text)),
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return F.element_at(per_row, 1)


def word_ngrams_sql(text: str, n: int = 3) -> str:
    t = tokens_sql(text)
    return (
        f"(CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n - 2}), "
        f"i -> array_to_string(list_slice({t}, i, i + {n - 1}), ' ')) "
        f"ELSE [] END)"
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles, each joined by a single space (the dedup/
    MinHash form)."""
    return F.array_distinct(word_ngrams(text, n))


def word_shingles_sql(text: str, n: int = 3) -> str:
    return f"list_distinct({word_ngrams_sql(text, n)})"


# GPT-2-style pretokenizer pattern, restricted to constructs RE2 (DuckDB) and
# Java regex (Spark) match identically: no lookahead, explicit ASCII classes.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pretokenization (contractions / words / numbers / punctuation
    runs) — the standard LLM-pipeline token-count estimator."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def bpe_token_count_sql(text: str) -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({text}, '{pat}'))"


def punct_ratio(text: Column) -> Column:
    """(# non-alnum-non-space chars) / length — double, guarded for empty."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.nullif(F.length(text).cast("double"), F.lit(0.0))


def punct_ratio_sql(text: str) -> str:
    return (
        f"(CAST(length(regexp_replace({text}, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)"
        f" / nullif(CAST(length({text}) AS DOUBLE), 0.0))"
    )


def stopword_ratio(text: Column) -> Column:
    t = tokens(text)
    hits = F.size(F.filter(t, lambda w: F.lower(w).isin(STOPWORDS)))
    return hits.cast("double") / F.nullif(F.size(t).cast("double"), F.lit(0.0))


def stopword_ratio_sql(text: str) -> str:
    t = tokens_sql(text)
    lst = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"(CAST(len(list_filter({t}, w -> list_contains([{lst}], lower(w)))) AS DOUBLE)"
        f" / nullif(CAST(len({t}) AS DOUBLE), 0.0))"
    )


def quality_score(text: Column) -> Column:
    """Composite doc-quality heuristic in [0,1]:
    0.4*length_score + 0.3*(1-punct_ratio) + 0.3*min(stopword_ratio*5, 1).

    length_score = min(token_count/100, 1). Mirrors common pretraining-data
    quality filters (length/punct/stopword signals).
    """
    ls = F.least(token_count(text).cast("double") / F.lit(100.0), F.lit(1.0))
    pr = F.coalesce(punct_ratio(text), F.lit(0.0))
    sr = F.coalesce(stopword_ratio(text), F.lit(0.0))
    return (
        F.lit(0.4) * ls
        + F.lit(0.3) * (F.lit(1.0) - pr)
        + F.lit(0.3) * F.least(sr * F.lit(5.0), F.lit(1.0))
    )


def quality_score_sql(text: str) -> str:
    ls = f"least(CAST({token_count_sql(text)} AS DOUBLE) / 100.0, 1.0)"
    pr = f"coalesce({punct_ratio_sql(text)}, 0.0)"
    sr = f"coalesce({stopword_ratio_sql(text)}, 0.0)"
    return f"(0.4 * {ls} + 0.3 * (1.0 - {pr}) + 0.3 * least({sr} * 5.0, 1.0))"


def _marker_hits(t: Column, lang: str) -> Column:
    return F.size(F.filter(t, lambda w: F.lower(w).isin(LANG_MARKERS[lang])))


def lang_predict(text: Column) -> Column:
    """Marker-word language ID: argmax language by marker-token hits,
    deterministic tie-break by _LANG_ORDER; 'und' if zero hits everywhere."""
    t = tokens(text)
    hits = {lang: _marker_hits(t, lang) for lang in _LANG_ORDER}
    # nested CASE: first language in priority order with max hits wins
    best = F.lit("und")
    max_hits = F.greatest(*[hits[lang] for lang in _LANG_ORDER])
    for lang in reversed(_LANG_ORDER):
        best = F.when((hits[lang] == max_hits) & (max_hits > 0), F.lit(lang)).otherwise(best)
    return best


def lang_predict_sql(text: str) -> str:
    t = tokens_sql(text)

    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        return f"len(list_filter({t}, w -> list_contains([{lst}], lower(w))))"

    max_hits = "greatest(" + ", ".join(hits(lang) for lang in _LANG_ORDER) + ")"
    # nested CASE, first language in priority order with max hits wins
    expr = "'und'"
    for lang in reversed(_LANG_ORDER):
        expr = (
            f"CASE WHEN {hits(lang)} = {max_hits} AND {max_hits} > 0 "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return f"({expr})"


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5-based 60-bit content hash of the
    whitespace-normalized, lowercased text. Portable (md5 both engines)."""
    normalized = F.concat_ws(" ", tokens(F.lower(text)))
    return str_hash_col(normalized)


def fingerprint_sql(text: str) -> str:
    normalized = f"array_to_string({tokens_sql(f'lower({text})')}, ' ')"
    return str_hash_sql(normalized)


def clean_text(text: Column, min_line_chars: int = 10) -> Column:
    """C4-style document cleaning, fully JVM-side:

    1. split into lines, trim each, collapse runs of internal whitespace;
    2. drop lines shorter than ``min_line_chars``;
    3. drop REPEATED lines keeping the first occurrence (boilerplate:
       headers/footers/nav repeated inside one document) — position-of-first-
       occurrence filter, identical semantics in the DuckDB twin (neither
       engine's distinct-on-lists guarantees order, so neither is used);
    4. re-join with single newlines.
    """
    lines = F.split(text, "\n")
    normed = F.transform(lines, lambda l: F.regexp_replace(F.trim(l), r"\s+", " "))
    kept = F.filter(normed, lambda l: F.char_length(l) >= min_line_chars)
    # let-bind `kept` via the 1-element-transform trick: referencing the
    # un-bound expression inside the position lambda would re-run the whole
    # split/trim/filter pipeline per (line, probe) pair; with the binding the
    # first-occurrence filter is the inherent O(lines^2) comparisons only
    return F.transform(
        F.array(kept),
        lambda ks: F.array_join(
            F.filter(ks, lambda l, i: F.array_position(ks, l) == i + F.lit(1)),
            "\n",
        ),
    ).getItem(0)


def clean_text_sql(text: str, min_line_chars: int = 10) -> str:
    kept = (
        f"list_filter(list_transform(string_split({text}, chr(10)), "
        f"l -> regexp_replace(trim(l), '\\s+', ' ', 'g')), "
        f"l -> length(l) >= {min_line_chars})"
    )
    # let-bind `kept` (evaluated once) via single-element list_transform,
    # then keep each line only at its first occurrence
    return (
        f"array_to_string(list_transform([{kept}], ks -> "
        f"list_filter(ks, (l, i) -> list_position(ks, l) = i))[1], chr(10))"
    )


# --- PII detection / redaction ----------------------------------------------
#
# Standard curation step before training-data release (not in the reference —
# its corpus is public review text).  Patterns use the Java-regex ∩ RE2
# common subset (no lookaround, no backreferences) so the Spark expressions
# and the DuckDB twins compile the SAME automaton; redaction applies the
# patterns in the fixed PII_ORDER so overlapping matches resolve identically
# on both sides.  All JVM-side (regexp_extract_all / regexp_replace) — no
# UDF, stays in whole-stage codegen, scales as a pure map over the scan.

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}
PII_ORDER = ["email", "ssn", "phone", "ipv4"]


def pii_count(text: Column, kind: str) -> Column:
    """Number of non-overlapping matches of one PII pattern."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def pii_count_sql(text: str, kind: str) -> str:
    pat = PII_PATTERNS[kind].replace("'", "''")
    return f"len(regexp_extract_all({text}, '{pat}'))"


def pii_redact(text: Column, token: str = "[PII]") -> Column:
    """Replace every PII match with ``token``, patterns applied in
    PII_ORDER (email first: an email can contain digit runs that the later
    numeric patterns would otherwise split)."""
    out = text
    for kind in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], token)
    return out


def pii_redact_sql(text: str, token: str = "[PII]") -> str:
    out = text
    for kind in PII_ORDER:
        pat = PII_PATTERNS[kind].replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out

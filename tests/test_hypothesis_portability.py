"""Hypothesis property tests: the *_sql fragments evaluate in DuckDB to
exactly the pure-Python semantics, over generated inputs. No Spark session
needed — this pins the SQL-text half of the portable layer independently.
(The Spark half is pinned by test_portable_properties.py.)"""

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from filtered_ads_vector_search_spark.functions.hashing import (
    A1,
    A2,
    C1,
    C2,
    P,
    portable_hash_sql,
    str_hash_sql,
)
from filtered_ads_vector_search_spark.operators.filters import (
    BUCKETS,
    rating_bucket_sql,
)

CON = duckdb.connect()


def py_portable_hash(x: int, seed: int) -> int:
    h0 = (x + seed * 7919) % P
    h1 = (h0 * A1 + C1) % P
    return (h1 * A2 + C2) % P


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**45), st.integers(min_value=0, max_value=9999))
def test_portable_hash_sql_matches_python(x, seed):
    got = CON.sql(f"SELECT {portable_hash_sql(str(x), seed)}").fetchone()[0]
    assert got == py_portable_hash(x, seed)


@settings(max_examples=60, deadline=None)
# NUL can't be embedded in a SQL string literal (parser error in any engine);
# real data reaches the hash via parquet columns, never literals.
@given(st.text(max_size=60).filter(lambda s: "\x00" not in s))
def test_str_hash_sql_matches_python(s):
    lit = "'" + s.replace("'", "''") + "'"
    got = CON.sql(f"SELECT {str_hash_sql(lit)}").fetchone()[0]
    assert got == int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**45))
def test_rating_bucket_sql_matches_python(vec_id):
    got = CON.sql(f"SELECT {rating_bucket_sql(str(vec_id))}").fetchone()[0]
    h = py_portable_hash(vec_id, 1337) % 10000
    label = next(lbl for lbl, cum in BUCKETS if h < cum)
    assert got == label


def py_pack(docs: list[tuple[int, int]], budget: int, n_shards: int, seed: int):
    """Pure-Python reference for pack_sequences: order by (shard, hash, id),
    cumulative start offsets, floor/mod against the budget."""
    from filtered_ads_vector_search_spark.operators.chunking import PACK_SEED  # noqa: F401

    ordered = sorted(
        docs,
        key=lambda d: (py_portable_hash(d[0], seed) % n_shards,
                       py_portable_hash(d[0], seed), d[0]),
    )
    out, start = {}, 0
    for doc_id, tok in ordered:
        out[doc_id] = (start // budget, start % budget, start % budget + tok > budget)
        start += tok
    return out


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2**40),
                  st.integers(min_value=1, max_value=500)),
        min_size=1, max_size=40, unique_by=lambda d: d[0],
    ),
    st.integers(min_value=1, max_value=1000),
)
def test_pack_sequences_sql_matches_python(docs, budget):
    """pack_sequences_sql (the DuckDB twin of the distributed prefix sum)
    equals the pure-Python concat-and-split over generated corpora."""
    from filtered_ads_vector_search_spark.operators.chunking import (
        DEFAULT_SHARDS,
        PACK_SEED,
        pack_sequences_sql,
    )

    values = ", ".join(f"({i}, {t})" for i, t in docs)
    sql = pack_sequences_sql(
        f"(SELECT * FROM (VALUES {values}) AS v(doc_id, n_tok))", "n_tok", budget=budget
    )
    got = {r[0]: (r[1], r[2], r[3]) for r in CON.sql(sql).fetchall()}
    assert got == py_pack(docs, budget, DEFAULT_SHARDS, PACK_SEED)


@settings(max_examples=40, deadline=None)
@given(
    st.text(min_size=0, max_size=200).filter(lambda s: "\x00" not in s),
    st.integers(min_value=2, max_value=50),
    st.integers(min_value=0, max_value=48),
)
def test_chunk_sql_matches_python(text, chunk_chars, overlap):
    """chunk_text_sql_parts equals pure-Python slicing for every (size,
    overlap) — including multi-byte text (both engines are CHARACTER-based)."""
    from hypothesis import assume

    from filtered_ads_vector_search_spark.operators.chunking import (
        chunk_text_sql_parts,
    )

    assume(overlap < chunk_chars)
    step = chunk_chars - overlap
    lit = "'" + text.replace("'", "''") + "'"
    parts = chunk_text_sql_parts(chunk_chars, overlap, lit)
    rows = CON.sql(f"SELECT unnest({parts}) AS e").fetchall()
    got = [(r[0]["chunk_id"], r[0]["chunk"]) for r in rows]
    import math

    n = max(1, math.ceil(max(0, len(text) - overlap) / step))
    want = [(i, text[i * step : i * step + chunk_chars]) for i in range(n)]
    assert got == want


# --- JL projection SQL twin vs pure Python ----------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    )
)
def test_jl_project_sql_matches_python(vec):
    from filtered_ads_vector_search_spark.operators.projection import (
        JL_SEED,
        jl_project_sql,
    )

    in_dim, out_dim = 4, 3
    lit = "([" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[])"
    got = CON.sql(f"SELECT {jl_project_sql(lit, in_dim, out_dim)}").fetchone()[0]
    scale = 1.0 / out_dim**0.5
    want = []
    for k in range(out_dim):
        acc = 0.0
        for i in range(in_dim):
            sign = 1.0 if py_portable_hash(i * out_dim + k, JL_SEED) % 2 == 0 else -1.0
            acc = acc + float(vec[i]) * sign
        want.append(acc * scale)
    assert len(got) == out_dim
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-9


# --- count-min cell SQL twin vs pure Python ---------------------------------


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=30).filter(lambda s: "\x00" not in s), st.integers(0, 3))
def test_cms_cell_sql_matches_python(term, j):
    from filtered_ads_vector_search_spark.operators.sketch import _cell_sql

    width = 64
    lit = "'" + term.replace("'", "''") + "'"
    got = CON.sql(f"SELECT {_cell_sql(lit, j, width)}").fetchone()[0]
    base = int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16)
    assert got == py_portable_hash(base, j) % width

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

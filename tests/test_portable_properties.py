"""Property tests: the portable expression layer agrees with independent
pure-Python/NumPy reimplementations on randomized batches + edge cases.

This is the §5 test-strategy analog of the reference's invariance tests: the
Spark expressions (JVM higher-order functions) are checked against a third
implementation (not the DuckDB oracle), so a shared misunderstanding between
the two SQL dialects can't hide a bug.
"""

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.functions import vector as V
from filtered_ads_vector_search_spark.functions.hashing import (
    A1,
    A2,
    C1,
    C2,
    P,
    portable_hash_col,
    str_hash_col,
)
from filtered_ads_vector_search_spark.functions.text import bpe_token_count, token_count

RNG = np.random.RandomState(20260813)


def py_portable_hash(x: int, seed: int = 0) -> int:
    h0 = (x + seed * 7919) % P
    h1 = (h0 * A1 + C1) % P
    return (h1 * A2 + C2) % P


def py_str_hash(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def test_portable_hash_matches_python(spark):
    ids = [0, 1, 2, P - 1, P, P + 1, 10**12, 999_983] + [
        int(x) for x in RNG.randint(0, 2**40, 200)
    ]
    df = spark.createDataFrame([(i,) for i in ids], "id bigint")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", portable_hash_col(F.col("id"), seed=42).alias("h")).collect()
    }
    for i in ids:
        assert got[i] == py_portable_hash(i, 42), i


def test_str_hash_matches_python(spark):
    strs = ["", "a", "hello world", "ünïcødé ✓ 中文", "a" * 500] + [
        f"tok{int(x)}" for x in RNG.randint(0, 10**6, 100)
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", str_hash_col(F.col("s")).alias("h")).collect()}
    for s in strs:
        assert got[s] == py_str_hash(s), repr(s)


def test_vector_ops_match_numpy(spark):
    dims = [1, 3, 64]
    rows = []
    for d in dims:
        for _ in range(30):
            rows.append((RNG.randn(d).tolist(), RNG.randn(d).tolist()))
    rows.append(([0.0] * 4, [0.0] * 4))  # zero-norm guard
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    out = df.select(
        "a",
        "b",
        V.vec_sqeuclidean(F.col("a"), F.col("b")).alias("sq"),
        V.vec_inner_product(F.col("a"), F.col("b")).alias("ip"),
        V.vec_sign_hamming(F.col("a"), F.col("b")).alias("hm"),
        V.vec_cosine_distance(F.col("a"), F.col("b")).alias("cd"),
    ).collect()
    for r in out:
        a, b = np.array(r["a"]), np.array(r["b"])
        assert math.isclose(r["sq"], float(((a - b) ** 2).sum()), rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r["ip"], float((a * b).sum()), rel_tol=1e-9, abs_tol=1e-12)
        assert r["hm"] == int(((a > 0) != (b > 0)).sum())
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na * nb == 0:
            assert r["cd"] is None  # nullif guard
        else:
            assert math.isclose(
                r["cd"], 1.0 - float((a * b).sum()) / (na * nb), rel_tol=1e-9, abs_tol=1e-12
            )


def test_binary_pack32_matches_numpy_packbits(spark):
    rows = [(RNG.randn(d).tolist(),) for d in (1, 31, 32, 33, 64, 100) for _ in range(10)]
    df = spark.createDataFrame(rows, "v array<double>")
    out = df.select("v", V.binary_pack32(F.col("v")).alias("p")).collect()
    for r in out:
        v = np.array(r["v"])
        bits = (v > 0).astype(np.uint64)
        words = []
        for w in range(math.ceil(len(v) / 32)):
            chunk = bits[w * 32 : (w + 1) * 32]
            words.append(int((chunk * (1 << np.arange(len(chunk), dtype=np.uint64))).sum()))
        assert list(r["p"]) == words, (len(v), r["p"], words)


def test_token_counts_match_python(spark):
    import re

    from filtered_ads_vector_search_spark.functions.text import BPE_PATTERN

    texts = ["", "  ", "one", "a b  c", "don't stop", "x1y2 3.14, foo-bar!", "中文 text"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        "t",
        token_count(F.col("t")).alias("ws"),
        bpe_token_count(F.col("t")).alias("bpe"),
    ).collect()
    for r in out:
        t = r["t"]
        assert r["bpe"] == len(re.findall(BPE_PATTERN, t)), repr(t)
        # whitespace tokens: split on \s+ after trim (Spark split semantics)
        ws = len(t.strip().split()) if t.strip() else 1  # split('') -> ['']
        assert r["ws"] == ws, repr(t)


def test_percentiles_per_worker_mean_vs_pooled(spark):
    """v2 (per-worker percentile, then mean) vs v3 (pooled percentile)
    semantics (reference cuvs_bench_grid_search_v2.py:300-317 vs v3:305):
    equal when all workers see the same distribution, different when worker
    distributions are skewed — both checked against numpy."""
    import numpy as np

    from filtered_ads_vector_search_spark.operators.evaluate import (
        percentiles,
        percentiles_per_worker_mean,
    )

    # worker 0 sees 0..99, worker 1 sees 1000..1099: pooled p99 straddles
    # both, per-worker-mean averages the two local p99s
    vals = [(0, float(v)) for v in range(100)] + [(1, float(v)) for v in range(1000, 1100)]
    df = spark.createDataFrame(vals, "worker int, value double")

    got = percentiles_per_worker_mean(df, "value", "worker", ps=(0.99,)).collect()[0]
    w0 = np.percentile(np.arange(100, dtype=float), 99)
    w1 = np.percentile(np.arange(1000, 1100, dtype=float), 99)
    assert got["p99_worker_mean"] == round((w0 + w1) / 2, 4)

    pooled = percentiles(df, "value", ps=(0.99,)).collect()[0]
    allv = np.array([v for _, v in vals])
    assert pooled["p99"] == round(float(np.percentile(allv, 99)), 4)
    assert pooled["p99"] != got["p99_worker_mean"]  # skew separates the two

    # identical per-worker distributions -> the variants agree
    same = spark.createDataFrame(
        [(w, float(v)) for w in (0, 1) for v in range(100)], "worker int, value double"
    )
    a = percentiles_per_worker_mean(same, "value", "worker", ps=(0.5,)).collect()[0]
    b = percentiles(same, "value", ps=(0.5,)).collect()[0]
    assert a["p5_worker_mean"] == b["p5"]


def test_clean_text_matches_python(spark):
    """Spark clean_text == an independent pure-Python reimplementation of the
    C4-style cleaning (trim/collapse, short-line drop, first-occurrence line
    dedup) over assorted boilerplate shapes."""
    import re as _re

    from filtered_ads_vector_search_spark.functions.text import clean_text

    def py_clean(text, min_chars=10):
        lines = [_re.sub(r"\s+", " ", l.strip()) for l in text.split("\n")]
        kept = [l for l in lines if len(l) >= min_chars]
        out, seen = [], set()
        for l in kept:
            if l not in seen:
                seen.add(l)
                out.append(l)
        return "\n".join(out)

    docs = [
        "Header line here\nshort\nThe quick   brown fox\nHeader line here\nAnother real line",
        "x\ny\nz",
        "",
        "   padded   line   with   runs   \n\n\nrepeat me exactly ok\nrepeat me exactly ok",
        "tab\tseparated words in a line\nmixed  \t whitespace   line here",
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, text string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", clean_text(F.col("text")).alias("c")).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == py_clean(d), (i, got[i], py_clean(d))


# --- bounded-state histogram quantiles --------------------------------------


def test_hist_quantiles_within_bin_width_of_exact(spark):
    """The histogram estimate must land within one bin width of the exact
    interpolated percentile, per group and quantile."""
    import pyspark.sql.functions as F
    from filtered_ads_vector_search_spark.operators import evaluate as E
    from tests.conftest import SF_TEST

    ev = spark.read.parquet(f"{SF_TEST}/events.parquet")
    bins = 256
    est = {
        (r.event_type, r.q): r.est
        for r in E.hist_quantiles(ev, "value", bins=bins).collect()
    }
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    exact = {
        (r.event_type, q): r[f"p{str(q).replace('0.', '')}"]
        for r in E.percentiles(ev, "value", ["event_type"]).collect()
        for q in (0.5, 0.95, 0.99)
    }
    assert est and set(est) == set(exact)
    for (g, q), v in est.items():
        lo, hi = bounds[g]
        width = (hi - lo) / bins
        assert abs(v - exact[(g, q)]) <= width + 1e-9, (g, q, v, exact[(g, q)])


def test_hist_quantiles_monotone_in_q(spark):
    from filtered_ads_vector_search_spark.operators import evaluate as E
    from tests.conftest import SF_TEST

    ev = spark.read.parquet(f"{SF_TEST}/events.parquet")
    rows = E.hist_quantiles(ev, "value", qs=(0.1, 0.5, 0.9, 0.99)).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.event_type, []).append((r.q, r.est))
    for g, pairs in by_g.items():
        ests = [e for _, e in sorted(pairs)]
        assert ests == sorted(ests), (g, pairs)

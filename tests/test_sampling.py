"""Deterministic sampling operators (operators/sampling.py): hash-gated
rates, fixed-budget per-stratum draws, partition invariance."""

import pytest
from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.operators import sampling as SM


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_seeded_sample_rate_and_determinism(spark):
    df = _docs(spark)
    out1 = SM.seeded_sample(df, "doc_id", 0.3)
    out2 = SM.seeded_sample(df, "doc_id", 0.3)
    ids1 = {r["doc_id"] for r in out1.collect()}
    ids2 = {r["doc_id"] for r in out2.collect()}
    assert ids1 == ids2  # same seed -> same rows, not "approximately"
    assert 0.2 < len(ids1) / 2000 < 0.4  # rate is honored
    # different seed -> a different (deterministic) subset
    ids3 = {r["doc_id"] for r in SM.seeded_sample(df, "doc_id", 0.3, seed=7).collect()}
    assert ids3 != ids1


def test_seeded_sample_is_partition_invariant(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in SM.seeded_sample(df.repartition(1), "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in SM.seeded_sample(df.repartition(13), "doc_id", 0.5).collect()}
    assert a == b


def test_stratified_sample_rates_and_unknown_group(spark):
    df = _docs(spark)
    out = SM.stratified_sample(df, "doc_id", "lang", {"en": 1.0, "de": 0.25})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == 667  # fraction 1.0 keeps every row of the stratum
    assert 100 < counts.get("de", 0) < 250  # ~25% of 667
    assert "zh" not in counts  # absent from fractions -> dropped


def test_stratified_topn_exact_budget(spark):
    df = _docs(spark)
    out = SM.stratified_topn(df, "doc_id", "lang", 15)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 15, "de": 15, "zh": 15}
    # small stratum: budget larger than the group returns the whole group
    small = df.filter(F.col("doc_id") < 5)
    assert SM.stratified_topn(small, "doc_id", "lang", 100).count() == 5


def test_stratified_topn_uses_window_group_limit(spark):
    """The per-stratum draw must compile to WindowGroupLimit (map-side
    partial), not a full sort — same plan family as per-query top-k."""
    df = _docs(spark)
    plan = (
        SM.stratified_topn(df, "doc_id", "lang", 15)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_sampling_validation(spark):
    df = _docs(spark)
    with pytest.raises(ValueError):
        SM.seeded_sample(df, "doc_id", 1.5)
    with pytest.raises(ValueError):
        SM.stratified_sample(df, "doc_id", "lang", {"en": -0.1})
    with pytest.raises(ValueError):
        SM.stratified_topn(df, "doc_id", "lang", 0)
    with pytest.raises(ValueError, match="at least one group"):
        SM.stratified_sample(df, "doc_id", "lang", {})


def test_bounded_hash_take_selects_identical_rows(spark):
    """The threshold pre-filter must not change WHICH rows the take
    returns — only how many reach the driver. Sized so the filter path
    engages (total > 4n) and compared against the plain orderBy+limit."""
    df = spark.range(20_000).select(
        F.col("id"), F.crc32(F.col("id").cast("string")).alias("h")
    )
    n = 500
    got = sorted(r.id for r in SM.bounded_hash_take(df, "h", ["h", "id"], n))
    want = sorted(r.id for r in df.orderBy("h", "id").limit(n).collect())
    assert got == want and len(got) == n


def test_bounded_hash_take_small_input_fallback(spark):
    """total <= 4n: the pre-filter must not engage (and the result is the
    whole input when n >= total)."""
    df = spark.range(100).select(
        F.col("id"), F.crc32(F.col("id").cast("string")).alias("h")
    )
    out = SM.bounded_hash_take(df, "h", ["h"], 500)
    assert len(out) == 100


def test_sliced_hash_take_bit_identical_to_single_job(spark):
    """The maxResultSize retry path: hash-range slices over [0, thresh]
    must reproduce the single-job orderBy+limit EXACTLY (slice boundaries
    sit on the leading hash column, so cross-slice order is slice order
    and ties never straddle a slice). Exercised directly — the retry only
    fires on >1 GiB results in production (100k x 768-d residual rows) —
    plus through bounded_hash_take with a monkeypatched first collect."""
    df = spark.range(20_000).select(
        F.col("id"), F.crc32(F.col("id").cast("string")).alias("h")
    )
    n = 500
    total = 20_000
    thresh = int(round(2.0 * (n / total) * 2**32))
    survivors = df.filter(F.col("h") <= thresh)
    want = [tuple(r) for r in survivors.orderBy("h", "id").limit(n).collect()]
    got = [
        tuple(r) for r in SM._sliced_hash_take(survivors, "h", ["h", "id"], n, thresh)
    ]
    assert got == want and len(got) == n
    # odd slice counts hit different boundary arithmetic
    got3 = [
        tuple(r)
        for r in SM._sliced_hash_take(survivors, "h", ["h", "id"], n, thresh, n_slices=3)
    ]
    assert got3 == want

    # end-to-end: force the retry by making the FIRST single-job collect
    # raise the result-size error (any other error must propagate)
    _DF = type(df)  # the concrete (classic) DataFrame class

    real_collect = _DF.collect
    state = {"calls": 0}

    def boom_once(self):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError(
                "Total size of serialized results ... is bigger than "
                "spark.driver.maxResultSize (1024.0 MiB)"
            )
        return real_collect(self)

    _DF.collect = boom_once
    try:
        rows = SM.bounded_hash_take(df, "h", ["h", "id"], n)
    finally:
        _DF.collect = real_collect
    assert [tuple(r) for r in rows] == want
    assert state["calls"] > 1  # the sliced retry actually ran


def test_bounded_hash_take_arrow_matches_rows(spark):
    """as_arrow=True must return the SAME rows in the same order as the
    Row transport (round 10: the training samplers collect via Arrow —
    33-36 s of Row pickling at 100k x 768d drops to 10-14 s)."""
    df = spark.range(20_000).select(
        F.col("id"), F.crc32(F.col("id").cast("string")).alias("h")
    )
    n = 500
    rows = SM.bounded_hash_take(df, "h", ["h", "id"], n)
    tbl = SM.bounded_hash_take(df, "h", ["h", "id"], n, as_arrow=True)
    assert tbl.num_rows == n
    assert tbl.column("id").to_pylist() == [r["id"] for r in rows]
    # small-input fallback returns the whole input as a table
    small = spark.range(100).select(
        F.col("id"), F.crc32(F.col("id").cast("string")).alias("h")
    )
    assert SM.bounded_hash_take(small, "h", ["h"], 500, as_arrow=True).num_rows == 100


def test_sliced_hash_take_arrow_bit_identical(spark):
    """The Arrow variant of the maxResultSize retry path concatenates
    hash-range slice tables and truncates to n — same rows as the Row
    slices, end-to-end through a monkeypatched first toArrow."""
    df = spark.range(20_000).select(
        F.col("id"), F.crc32(F.col("id").cast("string")).alias("h")
    )
    n = 500
    thresh = int(round(2.0 * (n / 20_000) * 2**32))
    survivors = df.filter(F.col("h") <= thresh)
    want = [tuple(r) for r in survivors.orderBy("h", "id").limit(n).collect()]
    tbl = SM._sliced_hash_take(survivors, "h", ["h", "id"], n, thresh, as_arrow=True)
    got = list(zip(tbl.column("id").to_pylist(), tbl.column("h").to_pylist()))
    assert got == want and tbl.num_rows == n

    _DF = type(df)
    real = _DF.toArrow
    state = {"calls": 0}

    def boom_once(self):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError(
                "Total size of serialized results ... is bigger than "
                "spark.driver.maxResultSize (1024.0 MiB)"
            )
        return real(self)

    _DF.toArrow = boom_once
    try:
        tbl2 = SM.bounded_hash_take(df, "h", ["h", "id"], n, as_arrow=True)
    finally:
        _DF.toArrow = real
    got2 = list(zip(tbl2.column("id").to_pylist(), tbl2.column("h").to_pylist()))
    assert got2 == want and state["calls"] > 1

"""Salted top-k equivalence + API argument validation."""

import pytest
from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.operators import topk as TK
from filtered_ads_vector_search_spark.operators.filters import named_filter_predicate
from filtered_ads_vector_search_spark.operators.skew import salted_topk
from filtered_ads_vector_search_spark.sources.bigann import dtype_from_filename

from conftest import SF_TEST


def test_salted_topk_equals_plain_window(spark):
    """Salted two-stage top-k returns exactly the plain window's top-k, for a
    deliberately skewed group distribution (90% of rows in one group)."""
    li = spark.read.parquet(f"{SF_TEST}/lineitem.parquet").select(
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("grp"),
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
    )
    order = [
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(*order)
    plain = (
        li.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("grp", "l_orderkey", "l_linenumber", "rank")
    )
    salted = salted_topk(
        li, "grp", order, k=5, n_salts=8, salt_on="l_orderkey"
    ).select("grp", "l_orderkey", "l_linenumber", "rank")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_invalid_args_raise(spark):
    emb = spark.read.parquet(f"{SF_TEST}/embeddings.parquet").limit(10)
    q, c = TK.split_queries(emb)
    with pytest.raises(ValueError):
        TK.knn_window(q, c, k=5, metric="manhattan")
    with pytest.raises(ValueError):
        named_filter_predicate("nonexistent_filter")
    with pytest.raises(ValueError):
        dtype_from_filename("vectors.txt")


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed+sorted on the join key -> sort-merge join with
    zero Exchange operators in the physical plan."""
    from filtered_ads_vector_search_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed_table,
    )

    li = spark.read.parquet(f"{SF_TEST}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_TEST}/orders.parquet")
    write_bucketed_table(li, "li_b", "l_orderkey", n_buckets=8)
    write_bucketed_table(o, "o_b", "o_orderkey", n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
        n = j.count()
        assert n == li.count()  # every lineitem has its order
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")

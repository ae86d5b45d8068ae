"""End-to-end curation job (pipeline/curate.py)."""

import json

from pyspark.sql import functions as F

from filtered_ads_vector_search_spark.functions import hashing as H
from filtered_ads_vector_search_spark.pipeline.curate import curate_corpus

from tests.conftest import SF_TEST


def test_curate_corpus_funnel_and_determinism(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    gate = (H.portable_hash_col(F.col("doc_id"), 4242) % F.lit(100)) < F.lit(10)
    train, ev = docs.filter(~gate), docs.filter(gate)

    out1 = str(tmp_path / "run1")
    m1 = curate_corpus(spark, train, out1, eval_docs=ev)
    # the funnel only ever shrinks, and every stage is recorded
    order = [
        "input_docs", "after_quality_gate", "after_exact_dedup",
        "after_near_dedup", "after_decontaminate",
    ]
    vals = [m1[k] for k in order]
    assert vals == sorted(vals, reverse=True) and vals[-1] > 0
    assert m1["packed_rows"] == m1["after_decontaminate"]
    assert json.load(open(f"{out1}/metrics.json")) == m1

    surv1 = {r.doc_id for r in spark.read.parquet(f"{out1}/documents.parquet").collect()}
    out2 = str(tmp_path / "run2")
    m2 = curate_corpus(spark, train.repartition(13), out2, eval_docs=ev)
    surv2 = {r.doc_id for r in spark.read.parquet(f"{out2}/documents.parquet").collect()}
    assert m1 == m2 and surv1 == surv2


def test_curate_with_dsir_selection(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    out = str(tmp_path / "dsir_run")
    m = curate_corpus(spark, docs, out, dsir_keep=50, dsir_target_lang="en")
    assert m["after_dsir_select"] == 50
    assert m["packed_rows"] == 50
    surv = spark.read.parquet(f"{out}/documents.parquet")
    assert surv.count() == 50
    # selection leans toward the target slice: majority of kept docs are en
    kept_lang = surv.join(docs.select("doc_id", "lang"), "doc_id")
    n_en = kept_lang.filter(F.col("lang") == "en").count()
    assert n_en > 25, n_en

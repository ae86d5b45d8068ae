"""Count-min sketch frequency estimation (Cormode & Muthukrishnan 2005).

The bounded-state path for term-frequency questions at 100 TB: the sketch is
a fixed d x w counter grid (default 4 x 1024 = 4096 longs TOTAL, independent
of vocabulary size), built with one map-combinable groupBy over a d-way
row expansion of the exploded tokens. Estimates are the min over d hashed
cells and can only OVERcount (never under) — the property the tests assert.

Every hash is `functions.hashing` portable arithmetic over the md5-derived
term hash, so the sketch an oracle builds in DuckDB is bit-identical to the
Spark one: estimation queries are fully hash-checkable despite being
approximate with respect to the TRUE counts.

Scale shape: the corpus is touched once (explode -> d-way expand ->
groupBy(row, cell)); the sketch relation (<= d*w rows) broadcasts into any
estimation join. Nothing vocabulary-sized ever shuffles unless the caller
explicitly asks for the exact-comparison audit form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import portable_hash_col, portable_hash_sql, str_hash_col, str_hash_sql

__all__ = [
    "cms_build",
    "cms_heavy_hitters",
    "cms_heavy_hitters_sql",
]

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cell(term: Column, j: int, width: int) -> Column:
    return F.pmod(portable_hash_col(str_hash_col(term), seed=j), F.lit(width))


def _cell_sql(term: str, j: int, width: int) -> str:
    h = portable_hash_sql(str_hash_sql(term), seed=j)
    return f"((({h}) % {width} + {width}) % {width})"


def cms_build(
    documents: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row j, cell, cnt) sketch of lowercased whitespace-token frequencies.
    One explode + a depth-way expansion + one map-combinable groupBy; the
    result is <= depth*width rows regardless of corpus size."""
    ex = documents.select(
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("term")
    )
    rows = ex.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), _cell(F.col("term"), j, width).alias("cell"))
                for j in range(depth)
            ])
        ).alias("rc")
    ).select("rc.j", "rc.cell")
    return rows.groupBy("j", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_heavy_hitters(
    documents: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Top-N terms by count-min ESTIMATE (ties by term), with the true count
    alongside — the audit form that exposes the overestimate. est_count >=
    true_count always; est ranks can differ from true ranks under collisions,
    and that IS the measured behavior of the sketch, reproduced exactly by
    the DuckDB twin. The sketch side is bounded state; the true-count side is
    the vocab-sized aggregate and exists for the comparison, not the scale
    path (estimate-only callers join candidates against the broadcast
    sketch)."""
    sk = cms_build(documents, text_col, depth, width)
    truth = (
        documents.select(
            F.explode(T.tokens(F.lower(F.col(text_col)))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    probes = truth.select(
        "term",
        "true_count",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), _cell(F.col("term"), j, width).alias("cell"))
                for j in range(depth)
            ])
        ).alias("rc"),
    ).select("term", "true_count", "rc.j", "rc.cell")
    est = (
        probes.join(F.broadcast(sk), ["j", "cell"])
        .groupBy("term", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    w = Window.orderBy(F.col("est_count").desc(), F.col("term").asc())
    return (
        est.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select("rnk", "term", "est_count", "true_count")
    )


def cms_heavy_hitters_sql(
    table: str = "documents",
    top_n: int = 50,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    toks = T.tokens_sql("lower(text)")
    cells = " UNION ALL ".join(
        f"SELECT term, {j} AS j, {_cell_sql('term', j, width)} AS cell FROM terms"
        for j in range(depth)
    )
    return f"""
WITH ex AS (
  SELECT unnest({toks}) AS term FROM {table}
),
terms AS (SELECT term FROM ex),
cells AS ({cells}),
sk AS (
  SELECT j, cell, count(*) AS cnt FROM cells GROUP BY j, cell
),
truth AS (
  SELECT term, count(*) AS true_count FROM ex GROUP BY term
),
probes AS (
  {" UNION ALL ".join(
      f"SELECT term, true_count, {j} AS j, {_cell_sql('term', j, width)} AS cell FROM truth"
      for j in range(depth)
  )}
),
est AS (
  SELECT term, true_count, min(cnt) AS est_count
  FROM probes JOIN sk USING (j, cell)
  GROUP BY term, true_count
)
SELECT * FROM (
  SELECT row_number() OVER (ORDER BY est_count DESC, term ASC) AS rnk,
         term, est_count, true_count
  FROM est
) WHERE rnk <= {top_n}
"""

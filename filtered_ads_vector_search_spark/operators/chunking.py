"""Document chunking and sequence packing — LLM training-data shaping.

Not in the reference (it consumes pre-chunked review text); these are the two
shaping steps every LLM data pipeline runs between curation and tokenization:

* ``chunk_text`` — split each document into fixed-size overlapping windows
  (the retrieval/embedding chunking step). Pure string arithmetic inside
  whole-stage codegen: a sequence + substring explode, no UDF.

* ``pack_sequences`` — the "concat and split at budget boundaries"
  construction: lay all documents end-to-end in a deterministic order and
  cut every ``budget`` tokens; each document gets the pack id its first
  token falls in, its offset within that pack, and whether it straddles a
  boundary. The global token offset is a distributed PREFIX SUM: one
  map-combinable per-shard total (collected — n_shards rows), broadcast as
  cumulative shard offsets, plus a within-shard window cumsum. No global
  single-partition window, no driver-side data pass — the 100 TB form.

Ordering is the engine's deterministic hash shuffle (portable_hash of the
id), so packing is reproducible, partition-invariant, and bit-identical in
the DuckDB oracle (one global window cumsum over the same (shard, hash, id)
order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash_col, portable_hash_sql

__all__ = ["chunk_text", "chunk_text_sql_parts", "pack_sequences", "pack_sequences_sql"]

PACK_SEED = 314159
DEFAULT_SHARDS = 64


def chunk_text(
    df: DataFrame,
    chunk_chars: int = 200,
    overlap: int = 40,
    text_col: str = "text",
) -> DataFrame:
    """One row per chunk: input columns + (chunk_id, chunk). Stride =
    chunk_chars - overlap; every document yields >= 1 chunk (short docs
    produce one chunk equal to the whole text)."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError(f"need 0 <= overlap < chunk_chars, got {overlap}/{chunk_chars}")
    step = chunk_chars - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.char_length(F.col(text_col)) - F.lit(overlap)) / F.lit(step)).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.substring(F.col(text_col), i * step + 1, chunk_chars),
    )
    return df.select(
        *df.columns, F.posexplode(chunks).alias("chunk_id", "chunk")
    )


def chunk_text_sql_parts(
    chunk_chars: int = 200, overlap: int = 40, text_expr: str = "text"
) -> str:
    """DuckDB fragment producing list-of-struct {chunk_id, chunk} to unnest —
    same stride arithmetic, 1-based substr on both engines."""
    step = chunk_chars - overlap
    n = f"greatest(1, CAST(ceil((length({text_expr}) - {overlap}) / {step}.0) AS INT))"
    return (
        f"list_transform(range(0, {n}), i -> "
        f"struct_pack(chunk_id := CAST(i AS INT), "
        f"chunk := substr({text_expr}, i * {step} + 1, {chunk_chars})))"
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = DEFAULT_SHARDS,
    seed: int = PACK_SEED,
) -> DataFrame:
    """Assign every document a (pack_id, start_in_pack, straddles) under the
    concat-and-split construction.

    Two-pass distributed prefix sum: (1) per-shard token totals — ONE
    map-combinable groupBy over n_shards rows, collected and turned into
    cumulative offsets on the driver (n_shards integers, not data); (2) a
    within-shard window cumsum (shuffle on the shard key only). The global
    order is (shard, hash, id) — fully deterministic, no global sort.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    h = portable_hash_col(F.col(id_col), seed)
    tagged = df.select(
        F.col(id_col), F.col(tokens_col).alias("_tok"), h.alias("_h")
    ).withColumn("_shard", (F.col("_h") % F.lit(n_shards)).cast("int"))

    totals = {
        r["_shard"]: r["t"]
        for r in tagged.groupBy("_shard").agg(F.sum("_tok").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for s in range(n_shards):
        offsets[s] = acc
        acc += int(totals.get(s, 0))
    off_expr = F.element_at(
        F.array(*[F.lit(offsets[s]) for s in range(n_shards)]), F.col("_shard") + 1
    )

    w = Window.partitionBy("_shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    start = (off_expr + F.sum("_tok").over(w) - F.col("_tok")).alias("_start")
    out = tagged.select(id_col, "_tok", "_shard", "_h", start)
    return out.select(
        F.col(id_col),
        F.floor(F.col("_start") / budget).cast("bigint").alias("pack_id"),
        (F.col("_start") % budget).cast("bigint").alias("start_in_pack"),
        ((F.col("_start") % budget + F.col("_tok")) > budget).alias("straddles"),
    )


def pack_sequences_sql(
    table: str,
    tokens_expr: str,
    id_expr: str = "doc_id",
    budget: int = 2048,
    n_shards: int = DEFAULT_SHARDS,
    seed: int = PACK_SEED,
) -> str:
    """DuckDB twin: ONE global window cumsum ordered by (shard, hash, id) —
    arithmetically identical to the distributed shard-offset + within-shard
    cumsum (shards are contiguous blocks of the same total order)."""
    h = portable_hash_sql(id_expr, seed)
    return f"""
WITH t AS (
  SELECT {id_expr} AS doc_id, {tokens_expr} AS tok, {h} AS h,
         CAST({h} % {n_shards} AS INT) AS shard
  FROM {table}
), c AS (
  SELECT doc_id, tok,
         sum(tok) OVER (ORDER BY shard ASC, h ASC, doc_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok
           AS start
  FROM t
)
SELECT doc_id,
       CAST(floor(start / {budget}) AS BIGINT) AS pack_id,
       CAST(start % {budget} AS BIGINT) AS start_in_pack,
       (start % {budget} + tok) > {budget} AS straddles
FROM c
"""

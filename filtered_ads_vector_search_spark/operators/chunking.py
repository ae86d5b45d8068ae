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


# --- content-defined chunking (FastCDC-style rolling boundaries) -------------

CDC_DIVISOR = 8  # expected chunk length ~CDC_DIVISOR tokens
CDC_SEED = 8191


def chunk_cdc(
    docs: DataFrame,
    text_col: str = "text",
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """Content-defined chunking: cut BEFORE token position p (p >= 1) when
    the portable hash of the local 2-gram (token[p-1], token[p]) lands in
    the boundary residue class (hash % divisor == 0). Boundaries depend only
    on LOCAL content, so after an insertion/edit the chunking re-synchronizes
    downstream — the property that makes CDC the storage/dedup-friendly
    split (public FastCDC/LBFS lineage), unlike fixed windows where one
    shifted token changes every subsequent chunk.

    Output: (doc_id, chunk_id, n_tok, chunk_md5) — chunk_id is the running
    boundary count, chunk_md5 hashes the space-joined tokens, so identical
    content spans hash identically across documents.

    Shape: one tokens posexplode; boundary flag + running chunk id are a
    per-DOC window cumsum (bounded by document length, never corpus-wide);
    the chunk aggregate uses the order-fixed fold (sort by position) so the
    DuckDB twin (string_agg ... ORDER BY) builds byte-identical text.
    """
    from ..functions.hashing import str_hash_col
    from ..functions.text import tokens

    ex = docs.select(
        "doc_id", F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("tok").over(w)
    boundary = F.when(
        prev.isNotNull()
        & (
            portable_hash_col(
                str_hash_col(F.concat_ws(" ", prev, F.col("tok"))), seed=CDC_SEED
            )
            % divisor
            == 0
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_chunk = ex.withColumn("chunk_id", F.sum(boundary).over(w))
    return (
        with_chunk.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("chunk_md5"),
        )
    )


def chunk_cdc_sql(table: str = "documents", divisor: int = CDC_DIVISOR) -> str:
    from ..functions.hashing import str_hash_sql
    from ..functions.text import tokens_sql

    toks = tokens_sql("lower(text)")
    h = portable_hash_sql(
        str_hash_sql("(prev_tok || ' ' || tok)"), seed=CDC_SEED
    )
    return f"""
WITH ex AS (
  SELECT doc_id,
         unnest(range(0, len({toks}))) AS pos,
         unnest({toks}) AS tok
  FROM {table}
),
flagged AS (
  SELECT doc_id, pos, tok,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_tok
  FROM ex
),
marked AS (
  SELECT doc_id, pos, tok,
         CASE WHEN prev_tok IS NOT NULL AND ({h}) % {divisor} = 0
              THEN 1 ELSE 0 END AS boundary
  FROM flagged
),
chunked AS (
  SELECT doc_id, pos, tok,
         sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id
  FROM marked
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       count(*) AS n_tok,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
FROM chunked GROUP BY doc_id, chunk_id
"""

"""Streaming similarity serving (SURVEY.md §2 J — the streaming-native form
of the reference's replay harness, non_stop_search
cuvs_bench_grid_search_v3.py:245-308).

Queries arrive as a stream; every micro-batch is answered with a full
distributed search against a prebuilt index (IVF/LSH/exact callable) via
``foreachBatch``. The index stays resident (persisted DataFrame); the
micro-batch boundary is the latency/throughput knob — exactly the reference's
batch_size, but driven by the stream trigger instead of a thread pool.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def serve_stream(
    query_stream: DataFrame,
    search_fn: Callable[[DataFrame], DataFrame],
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_available_now: bool = False,
    processing_time: str = "1 second",
) -> StreamingQuery:
    """Attach a search to a query stream.

    query_stream: streaming DataFrame of (query_id, q_vec).
    search_fn: batch DataFrame -> result DataFrame (e.g. lambda q:
        index.search(q, k=10)); runs as a normal distributed job per batch.
    sink_fn: (result DataFrame, batch_id) -> None; write wherever results go.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink_fn(search_fn(batch_df), batch_id)

    writer = query_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def maintain_index_stream(
    vector_stream: DataFrame,
    layout_path: str,
    checkpoint: str,
    kind: str = "ivf",
    trigger_available_now: bool = False,
    processing_time: str = "10 seconds",
) -> StreamingQuery:
    """Online index maintenance: new vectors arrive as a stream; every
    micro-batch is assigned to the written layout's EXISTING centroids and
    written under a batchId-derived subdirectory of the bucketed layout
    (IVFIndex/IVFPQIndex.append_to_layout with batch_id). foreachBatch alone
    is only at-least-once — a crash between the write and the checkpoint
    commit REPLAYS the batch — so each batch directory is mode("overwrite"):
    a replay rewrites the same deterministic content instead of duplicating
    vectors, making the append idempotent per batch id (effectively
    exactly-once). Searches against reloads see the grown index with the
    same partition pruning; run `compact_layout` periodically to fold batch
    directories back into the base and bound small-file growth. Retraining
    stays an offline policy decision.

    vector_stream: streaming DataFrame with the layout's (id, vec) columns.
    kind: "ivf", "ivfpq", "lsh" or "bm25" — which layout lives at
    ``layout_path`` (for "bm25" the stream carries (doc_id, text) documents
    and the append maintains the term-bucketed lexical index).
    """
    from ..operators.ann import IVFIndex
    from ..operators.ivfpq import IVFPQIndex
    from ..operators.lsh import LSHIndex
    from ..operators.textsearch import append_to_term_index

    appenders = {
        "ivf": IVFIndex.append_to_layout,
        "ivfpq": IVFPQIndex.append_to_layout,
        "lsh": LSHIndex.append_to_layout,
        # the lexical layout rides the same idempotent-batch contract:
        # stream rows are (doc_id, text) documents instead of vectors
        "bm25": append_to_term_index,
    }
    if kind not in appenders:
        raise ValueError(f"kind must be one of {sorted(appenders)}, got {kind!r}")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        appenders[kind](
            batch_df.sparkSession, layout_path, batch_df, batch_id=batch_id
        )

    writer = vector_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()

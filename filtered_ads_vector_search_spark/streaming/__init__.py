"""Structured Streaming surface (SURVEY.md §2 J).

The reference has no streaming engine; its closest construct is the
throughput harness — threaded replay of a fixed query batch for ``run_time``
seconds (reference: non_stop_search cuvs_bench_grid_search_v3.py:245-308).
This package provides the Spark-native analogs a production deployment of the
same capability needs:

* ``windows``  — watermarked event-time windowed aggregation over the events
  stream (QPS/latency per window — the streaming form of the reference's
  E2/E3 metrics), with a batch twin for oracle checking.
* ``replay``   — a rate-source replay harness driving any search callable at
  a target rate and measuring achieved QPS (the non_stop_search analog).
* ``state``    — applyInPandasWithState per-key sessionization, the custom
  stateful-operator extension point.
* ``joins``    — watermarked stream-stream interval join (purchase →
  impression attribution), with a batch twin for oracle checking.
* ``dedup``    — dropDuplicatesWithinWatermark streaming exact dedup
  (state bounded by the watermark horizon), with a batch twin.
* ``curate``   — the stateless curation stages (quality gate, PII
  redaction, decontamination against a static eval set) composed onto a
  document stream; stream == batch row for row.
"""

from .windows import windowed_event_stats, windowed_event_stats_batch, stream_events
from .replay import replay_throughput
from .state import sessionize_stream
from .serve import serve_stream
from .joins import attribution_pairs_stream, attribution_pairs_batch
from .dedup import dedup_events_stream, dedup_events_batch

__all__ = [
    "dedup_events_stream",
    "dedup_events_batch",
    "windowed_event_stats",
    "windowed_event_stats_batch",
    "stream_events",
    "replay_throughput",
    "sessionize_stream",
    "serve_stream",
    "attribution_pairs_stream",
    "attribution_pairs_batch",
]

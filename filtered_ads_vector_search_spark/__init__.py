"""filtered_ads_vector_search_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of `singhmanas1/filtered-ads-vector-search`.

The reference (read-only at /root/reference) is a filtered-ANN vector-search
benchmark: embed -> quantize -> index -> filtered top-k -> recall/QPS evaluation.
This package re-expresses that capability surface Spark-first:

- ``functions``  — the scalar/vector expression library (SURVEY.md §2 C)
- ``operators``  — relational operators: filtered exact/approx top-k, recall,
  evaluation aggregations, dedup, quantization (SURVEY.md §2 B,D,E,F,G,H,I)
- ``sources``    — ingestion (JSONL, Parquet, bigann-style bin) (SURVEY.md §2 A)
- ``pipeline``   — the embed/quantize ingest pipeline (SURVEY.md §3.2)
- ``streaming``  — Structured Streaming throughput/replay analogs (SURVEY.md §2 J)
- ``multimodal`` — opaque binary-column plumbing for image/audio payloads

Everything is DataFrame-API (Catalyst-optimized); Python UDFs appear only where
declarative Spark genuinely cannot express the semantics, and then always as
Arrow-batched ``mapInPandas``/pandas UDFs.
"""

__version__ = "0.1.0"

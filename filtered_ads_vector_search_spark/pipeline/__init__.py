"""Ingest/embed/quantize pipeline (SURVEY.md §3.2, §2 I4)."""

from .embed import mock_embed, EMBED_DIM
from .ingest import ingest_reviews, IngestConfig
from .quantized_build import build_quantized_tiers

__all__ = [
    "mock_embed",
    "EMBED_DIM",
    "ingest_reviews",
    "IngestConfig",
    "build_quantized_tiers",
]

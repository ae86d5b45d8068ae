"""Multimodal column plumbing (task brief: image/audio/video as opaque
``binary`` columns with typed metadata; decode/feature-extract as Pandas UDFs
over ``mapInPandas``).

The decode step is STUBBED (no image/audio libs in this container): the
deterministic fake payload carries a parseable header, so schema, batch
shapes, partitioning, and UDF signatures are real and tested end-to-end; the
real-codec path raises NotImplementedError at the clearly marked seam.
"""

from .columns import MEDIA_META_SCHEMA, with_synthetic_media
from .udfs import decode_media_meta, extract_features, resize_images, sample_frames

__all__ = [
    "MEDIA_META_SCHEMA",
    "with_synthetic_media",
    "decode_media_meta",
    "extract_features",
    "resize_images",
    "sample_frames",
]

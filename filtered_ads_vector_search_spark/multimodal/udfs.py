"""Multimodal decode / feature-extract / frame-sample UDFs.

All three are Arrow-batched ``mapInPandas`` transforms — the payload bytes
stay inside the executor, batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, and the output schema is
explicit so downstream operators are fully declarative.

Real codecs (PIL/ffmpeg/librosa) are NOT in this container: each UDF decodes
the deterministic fake header from columns.synth_payload and raises
NotImplementedError at the clearly marked seam if handed real media.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .columns import MAGIC, _TYPES, _CODECS

FEATURE_DIM = 16


def _parse_header(raw: bytes) -> dict:
    if raw[:4] != MAGIC:
        # ---- real-codec seam: plug PIL/ffmpeg probing here ----
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present in "
            "this container; payload did not carry the FAKE header"
        )
    t, width, height, duration = struct.unpack("<BHHI", raw[4:13])
    media_type = _TYPES[t]
    return {
        "media_type": media_type,
        "codec": _CODECS[media_type],
        "width": int(width),
        "height": int(height),
        "duration_ms": int(duration),
        "n_bytes": len(raw),
    }


def decode_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(id cols..., payload) -> + media metadata struct fields."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = (
        f"{fields}, media_type string, codec string, width int, height int, "
        "duration_ms int, n_bytes bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(lambda b: _parse_header(bytes(b)))
            out = pdf.copy()
            for k in ("media_type", "codec", "width", "height", "duration_ms", "n_bytes"):
                out[k] = metas.map(lambda m, k=k: m[k])
            yield out

    return df.mapInPandas(run, schema=schema)


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Payload -> fixed-dim feature vector (deterministic md5-seeded stand-in
    for a CNN/audio embedding; same signature/batching as the real thing).
    Output: all input cols minus payload, + features array<float>."""
    keep = [f for f in df.schema.fields if f.name != payload_col]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    schema = f"{fields}, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(
                lambda b: np.random.RandomState(
                    int.from_bytes(hashlib.md5(bytes(b)).digest()[:4], "little")
                )
                .standard_normal(FEATURE_DIM)
                .astype(np.float32)
            )
            out = pdf.drop(columns=[payload_col])
            out["features"] = feats
            yield out

    return df.mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Image resize: rewrite the payload with the target dimensions (body
    re-derived deterministically from the original bytes + dims at the
    clearly-marked real-codec seam); audio/video rows pass through
    unchanged. Output schema == input schema, so resizes compose with
    decode/feature/frame stages."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resize_one(raw: bytes) -> bytes:
            meta = _parse_header(raw)
            if meta["media_type"] != "image":
                return raw
            t, _, _, duration = struct.unpack("<BHHI", raw[4:13])
            # ---- real-codec seam: plug PIL resampling here ----
            body = hashlib.md5(raw[13:] + struct.pack("<HH", width, height)).digest()
            return MAGIC + struct.pack("<BHHI", t, width, height, duration) + body

        for pdf in batches:
            out = pdf.copy()
            out[payload_col] = out[payload_col].map(lambda b: resize_one(bytes(b)))
            yield out

    return df.mapInPandas(run, schema=fields)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, payload_col: str = "payload"
) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp (explode on
    the executor, bounded by duration). Non-video rows pass through with a
    single frame at t=0. Output: id cols + frame_ts_ms + frame_bytes."""
    keep = [f for f in df.schema.fields if f.name != payload_col]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    schema = f"{fields}, frame_ts_ms int, frame_bytes binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r[payload_col])
                meta = _parse_header(raw)
                ts_list = (
                    list(range(0, meta["duration_ms"], every_ms))
                    if meta["media_type"] == "video" and meta["duration_ms"] > 0
                    else [0]
                )
                base = {f.name: r[f.name] for f in keep}
                for ts in ts_list:
                    # ---- real-codec seam: extract the actual frame here ----
                    frame = hashlib.md5(raw + str(ts).encode()).digest()
                    rows.append({**base, "frame_ts_ms": ts, "frame_bytes": frame})
            yield pd.DataFrame(rows, columns=[f.name for f in keep] + ["frame_ts_ms", "frame_bytes"])

    return df.mapInPandas(run, schema=schema)

"""Minimal pure-Python real-media codecs: BMP, PCM WAV, and JPEG.

This makes the real-codec seam in udfs._parse_header exercisable without any
external image/audio library: BI_RGB 24-bit and 8-bit-palette BMP, and
RIFF/WAVE PCM s16le mono/stereo, are simple enough to encode/decode with
struct + numpy, and JPEG — both baseline sequential (SOF0) and progressive
(SOF2), together essentially all real-world files — is a full pure-NumPy
implementation in the sibling ``jpeg`` module, re-exported here. Remaining
compressed codecs (H.264/AAC, JPEG arithmetic/hierarchical/lossless, RLE or
16/32-bit BMP, non-PCM WAV) stay behind the NotImplementedError seam.

The reference has no media pipeline at all — this is part of the
beyond-reference training-data-pipeline surface (brief: multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg_meta, decode_jpeg_pixels, encode_jpeg

__all__ = [
    "encode_bmp",
    "encode_bmp_8bit",
    "decode_bmp_meta",
    "decode_bmp_pixels",
    "resize_bmp",
    "encode_wav",
    "decode_wav_meta",
    "decode_wav_samples",
    "encode_jpeg",
    "decode_jpeg_meta",
    "decode_jpeg_pixels",
    "decode_image_pixels",
    "resize_image",
    "sniff",
]

_BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
_WAV_HEADER_SIZE = 44  # RIFF + fmt(16) + data chunk headers


def _row_size(width: int) -> int:
    return ((3 * width + 3) // 4) * 4  # rows padded to 4-byte boundaries


def sniff(raw: bytes) -> str | None:
    """'bmp' | 'wav' | 'jpeg' | None for unrecognized payloads."""
    if raw[:2] == b"BM":
        return "bmp"
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "wav"
    if raw[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


def decode_image_pixels(raw: bytes) -> np.ndarray:
    """Any supported image payload -> (height, width, 3) uint8 RGB."""
    kind = sniff(raw)
    if kind == "bmp":
        return decode_bmp_pixels(raw)
    if kind == "jpeg":
        return decode_jpeg_pixels(raw)
    raise ValueError(f"not a decodable image payload (sniffed {kind!r})")


def resize_image(raw: bytes, width: int, height: int) -> bytes:
    """Codec-preserving resize: BMP stays BMP, JPEG is re-encoded as JPEG
    with the source's chroma mode preserved (read from the SOF sampling
    factors). Quality is not recoverable from a JPEG (only its quant
    tables survive), so the re-encode uses the encoder's q90 default."""
    kind = sniff(raw)
    if kind == "bmp":
        return resize_bmp(raw, width, height)
    if kind == "jpeg":
        from .jpeg import _parse_segments

        subsample = False
        for marker, payload, _ in _parse_segments(raw):
            if marker == 0xC0:  # SOF0: first component's h/v factors
                subsample = payload[7] != 0x11
                break
        return encode_jpeg(
            _nn_resample(decode_jpeg_pixels(raw), width, height),
            subsample=subsample,
        )
    raise ValueError(f"not a resizable image payload (sniffed {kind!r})")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB -> BI_RGB 24-bit BMP bytes (rows stored
    bottom-up, channels as BGR, rows padded to 4 bytes, per the format)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError(f"expected (h, w, 3) RGB pixels, got {pixels.shape}")
    row = _row_size(w)
    size = _BMP_HEADER_SIZE + row * h
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER_SIZE)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channels
    pad = row - 3 * w
    for r in bgr:
        out += r.tobytes() + b"\x00" * pad
    return bytes(out)


def encode_bmp_8bit(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(height, width) uint8 palette indices + (n<=256, 3) uint8 RGB palette
    -> 8-bit BI_RGB BMP bytes (BGRx palette after the info header, bottom-up
    index rows padded to 4 bytes — the classic paletted layout)."""
    h, w = indices.shape
    n_pal = palette.shape[0]
    # explicit raises, not asserts: under `python -O` a stripped assert
    # would emit a corrupt BMP (indices past biClrUsed) that fails later
    if palette.ndim != 2 or palette.shape[1] != 3 or n_pal > 256:
        raise ValueError(f"palette must be (n<=256, 3) uint8 RGB, got {palette.shape}")
    if int(indices.max(initial=0)) >= n_pal:
        raise ValueError(
            f"palette index {int(indices.max(initial=0))} out of range for "
            f"{n_pal}-entry palette"
        )
    row = ((w + 3) // 4) * 4
    pal_bytes = np.zeros((n_pal, 4), dtype=np.uint8)
    pal_bytes[:, :3] = palette[:, ::-1]  # RGB -> BGRx
    offset = _BMP_HEADER_SIZE + 4 * n_pal
    size = offset + row * h
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    # biClrUsed (the 9th I-field) carries the palette entry count
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, row * h, 2835, 2835, n_pal, 0
    )
    out += pal_bytes.tobytes()
    pad = row - w
    for r in indices[::-1]:  # bottom-up rows
        out += r.astype(np.uint8).tobytes() + b"\x00" * pad
    return bytes(out)


def decode_bmp_meta(raw: bytes) -> dict:
    magic, size, _, _, offset = struct.unpack("<2sIHHI", raw[:14])
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_sz, w, h, _planes, bpp = struct.unpack("<IiiHH", raw[14:30])
    if bpp not in (8, 24) or hdr_sz != 40:
        raise NotImplementedError(
            f"only BI_RGB 24-bit and 8-bit-palette BMP supported (bpp={bpp})"
        )
    return {
        "media_type": "image",
        "codec": "bmp",
        "width": int(w),
        "height": int(abs(h)),
        "duration_ms": 0,
        "n_bytes": len(raw),
    }


def decode_bmp_pixels(raw: bytes) -> np.ndarray:
    """BMP bytes (24-bit BI_RGB or 8-bit palette) -> (h, w, 3) uint8 RGB."""
    meta = decode_bmp_meta(raw)
    w, h = meta["width"], meta["height"]
    bpp = struct.unpack("<H", raw[28:30])[0]
    offset = struct.unpack("<I", raw[10:14])[0]
    if bpp == 8:
        n_pal = struct.unpack("<I", raw[46:50])[0] or 256
        pal = (
            np.frombuffer(raw, dtype=np.uint8, offset=_BMP_HEADER_SIZE,
                          count=4 * n_pal)
            .reshape(n_pal, 4)[:, [2, 1, 0]]  # BGRx -> RGB
        )
        row = ((w + 3) // 4) * 4
        idx = np.frombuffer(raw, dtype=np.uint8, offset=offset, count=row * h)
        idx = idx.reshape(h, row)[:, :w]
        return pal[idx[::-1]].copy()  # back to top-down, palette-expanded
    row = _row_size(w)
    data = np.frombuffer(raw, dtype=np.uint8, offset=offset, count=row * h)
    rows = data.reshape(h, row)[:, : 3 * w].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # back to top-down RGB


def _nn_resample(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor index gather shared by every image resize path."""
    h0, w0, _ = px.shape
    ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
    xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
    return px[ys][:, xs]


def resize_bmp(raw: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample — a real resize of real pixels."""
    return encode_bmp(_nn_resample(decode_bmp_pixels(raw), width, height))


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples -> RIFF/WAVE PCM s16le bytes. ``samples`` is (n,) for
    mono or (n, 2) for stereo — C-order tobytes() interleaves L/R frames,
    which IS the PCM stereo layout."""
    if samples.ndim == 1:
        channels = 1
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        channels = samples.shape[1]
    else:
        raise ValueError(f"samples must be (n,) or (n, 1|2); got {samples.shape}")
    data = samples.astype("<i2").tobytes()
    block_align = 2 * channels
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    out += struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    out += struct.pack("<4sI", b"data", len(data))
    out += data
    return bytes(out)


def decode_wav_meta(raw: bytes) -> dict:
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt_tag, channels, rate = struct.unpack("<HHI", raw[20:28])
    bits = struct.unpack("<H", raw[34:36])[0]
    if fmt_tag != 1 or channels not in (1, 2) or bits != 16:
        raise NotImplementedError("only PCM s16le mono/stereo WAV supported")
    n_data = struct.unpack("<I", raw[40:44])[0]
    n_frames = n_data // (2 * channels)
    return {
        "media_type": "audio",
        "codec": "pcm_s16le",
        "width": 0,
        "height": 0,
        "duration_ms": int(n_frames * 1000 // rate),
        "n_bytes": len(raw),
    }


def decode_wav_samples(raw: bytes) -> np.ndarray:
    """WAV bytes -> int16 samples: (n,) for mono, (n, 2) for stereo."""
    decode_wav_meta(raw)  # validates format
    channels = struct.unpack("<H", raw[22:24])[0]
    n_data = struct.unpack("<I", raw[40:44])[0]
    flat = np.frombuffer(raw, dtype="<i2", offset=_WAV_HEADER_SIZE, count=n_data // 2)
    return flat if channels == 1 else flat.reshape(-1, 2)

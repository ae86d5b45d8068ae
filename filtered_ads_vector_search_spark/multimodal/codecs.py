"""Minimal pure-Python real-media codecs: BMP, PCM WAV, and JPEG.

This makes the real-codec seam in udfs._parse_header exercisable without any
external image/audio library: BI_RGB 8-bit-palette, 16-bit RGB555, 24-bit, and 32-bit BGRA
BMP, and RIFF/WAVE PCM s16le + G.711 A-law/mu-law mono/stereo, are simple enough
to encode/decode with struct + numpy, and JPEG — both baseline sequential
(SOF0) and progressive (SOF2), together essentially all real-world files —
is a full pure-NumPy implementation in the sibling ``jpeg`` module,
re-exported here. Remaining compressed codecs (H.264/AAC, JPEG
arithmetic/hierarchical/lossless, RLE/BI_BITFIELDS BMP, ADPCM WAV) stay
behind the NotImplementedError seam.

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
    "encode_bmp_16bit",
    "encode_bmp_32bit",
    "decode_bmp_meta",
    "decode_bmp_pixels",
    "resize_bmp",
    "encode_wav",
    "encode_wav_mulaw",
    "encode_wav_alaw",
    "mulaw_encode",
    "mulaw_decode",
    "alaw_encode",
    "alaw_decode",
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


def encode_bmp_32bit(pixels: np.ndarray, alpha: np.ndarray | None = None) -> bytes:
    """(height, width, 3) uint8 RGB (+ optional (h, w) alpha) -> 32-bit
    BI_RGB BMP bytes (BGRA byte order, bottom-up rows; 4 bytes/pixel means
    rows are always 4-byte aligned, no padding). The classic X8R8G8B8 /
    A8R8G8B8 layout screenshots and editors emit."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError(f"expected (h, w, 3) RGB pixels, got {pixels.shape}")
    if alpha is not None and alpha.shape != (h, w):
        raise ValueError(f"alpha must be (h, w), got {alpha.shape}")
    bgra = np.empty((h, w, 4), dtype=np.uint8)
    bgra[:, :, :3] = pixels[:, :, ::-1]
    bgra[:, :, 3] = alpha if alpha is not None else 0
    size = _BMP_HEADER_SIZE + 4 * w * h
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER_SIZE)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, 4 * w * h, 2835, 2835, 0, 0)
    out += bgra[::-1].tobytes()  # bottom-up rows
    return bytes(out)


def encode_bmp_16bit(pixels: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB -> 16-bit BI_RGB BMP bytes (RGB555 —
    the bpp=16 default when no BI_BITFIELDS masks are present; rows of
    little-endian uint16 padded to 4 bytes, bottom-up). Channels quantize
    to their top 5 bits."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError(f"expected (h, w, 3) RGB pixels, got {pixels.shape}")
    p16 = pixels.astype(np.uint16) >> 3
    packed = (p16[:, :, 0] << 10) | (p16[:, :, 1] << 5) | p16[:, :, 2]
    row = ((2 * w + 3) // 4) * 4
    size = _BMP_HEADER_SIZE + row * h
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER_SIZE)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 16, 0, row * h, 2835, 2835, 0, 0)
    pad = row - 2 * w
    for r in packed[::-1]:  # bottom-up rows
        out += r.astype("<u2").tobytes() + b"\x00" * pad
    return bytes(out)


def decode_bmp_meta(raw: bytes) -> dict:
    magic, size, _, _, offset = struct.unpack("<2sIHHI", raw[:14])
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_sz, w, h, _planes, bpp = struct.unpack("<IiiHH", raw[14:30])
    compression = struct.unpack("<I", raw[30:34])[0]
    if bpp not in (8, 16, 24, 32) or hdr_sz != 40 or compression != 0:
        raise NotImplementedError(
            f"only BI_RGB 8-bit-palette, 16-bit RGB555, 24-bit, and 32-bit "
            f"BGRA BMP supported (bpp={bpp}, compression={compression})"
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
    """BMP bytes (8-bit palette, 16-bit RGB555, 24-bit BI_RGB, or 32-bit
    BGRA) -> (h, w, 3) uint8 RGB (the alpha byte of 32-bit payloads is
    dropped — BI_RGB declares it unused; 5-bit channels expand by top-bit
    replication)."""
    meta = decode_bmp_meta(raw)
    w, h = meta["width"], meta["height"]
    bpp = struct.unpack("<H", raw[28:30])[0]
    offset = struct.unpack("<I", raw[10:14])[0]
    if bpp == 32:
        data = np.frombuffer(raw, dtype=np.uint8, offset=offset, count=4 * w * h)
        rows = data.reshape(h, w, 4)[:, :, 2::-1]  # BGRA -> RGB, alpha dropped
        return rows[::-1].copy()  # back to top-down
    if bpp == 16:
        row = ((2 * w + 3) // 4) * 4
        data = np.frombuffer(raw, dtype=np.uint8, offset=offset, count=row * h)
        packed = data.reshape(h, row)[:, : 2 * w].view("<u2").reshape(h, w)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for ch, shift in enumerate((10, 5, 0)):  # RGB555
            v = (packed >> shift) & 0x1F
            # 5->8 bit expansion replicating the top bits (the standard
            # round-trip-exact expansion: (expand(v) >> 3) == v)
            out[:, :, ch] = ((v << 3) | (v >> 2)).astype(np.uint8)
        return out[::-1].copy()  # back to top-down
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


# G.711 mu-law (ITU-T G.711, WAVE_FORMAT_MULAW=7): 8-bit companded
# telephony audio — the narrowest real-world non-s16le WAV layout. The
# transform is table-driven both ways (256-entry decode table, 16-bit
# segment encode), bias 0x84, as in the ITU reference implementation.
_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


def _mulaw_decode_table() -> np.ndarray:
    u = np.arange(256, dtype=np.uint8)
    v = (~u).astype(np.uint8)
    sign = v & 0x80
    exp = (v >> 4) & 0x07
    mant = v.astype(np.int32) & 0x0F
    mag = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


_MULAW_TABLE = _mulaw_decode_table()


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 G.711 mu-law codes."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # exponent = MSB position above bit 7 (segment number 0..7)
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 mu-law codes -> int16 linear PCM."""
    return _MULAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def _alaw_decode_table() -> np.ndarray:
    # ITU-T G.711 A-law expansion (the classic public-domain alaw2linear):
    # invert the 0x55 toggle, then reconstruct the 13-bit-segment magnitude
    # at 16-bit scale
    a = np.arange(256, dtype=np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108,
                 (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where((a & 0x80) != 0, t, -t).astype(np.int16)


_ALAW_TABLE = _alaw_decode_table()
_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF],
                         dtype=np.int32)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 G.711 A-law codes."""
    x = samples.astype(np.int32) >> 3  # 13-bit domain, per the spec
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag, side="left").astype(np.int32)
    shift = np.where(seg < 2, 1, seg)
    aval = (np.minimum(seg, 7) << 4) | ((mag >> shift) & 0x0F)
    aval = np.where(seg >= 8, 0x7F, aval)
    return (aval ^ mask).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 A-law codes -> int16 linear PCM."""
    return _ALAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def encode_wav_mulaw(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples -> RIFF/WAVE G.711 mu-law bytes ((n,) mono or (n, 2)
    stereo, same shape contract as encode_wav); each sample companded to
    one byte."""
    if samples.ndim == 1:
        channels = 1
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        channels = samples.shape[1]
    else:
        raise ValueError(f"samples must be (n,) or (n, 1|2); got {samples.shape}")
    data = mulaw_encode(samples).tobytes()  # C-order interleaves frames
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    out += struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 7, channels, sample_rate,
        sample_rate * channels, channels, 8,
    )
    out += struct.pack("<4sI", b"data", len(data))
    out += data
    return bytes(out)


def encode_wav_alaw(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples -> RIFF/WAVE G.711 A-law bytes (WAVE_FORMAT_ALAW=6) —
    same shape contract as encode_wav/encode_wav_mulaw."""
    if samples.ndim == 1:
        channels = 1
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        channels = samples.shape[1]
    else:
        raise ValueError(f"samples must be (n,) or (n, 1|2); got {samples.shape}")
    data = alaw_encode(samples).tobytes()
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    out += struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 6, channels, sample_rate,
        sample_rate * channels, channels, 8,
    )
    out += struct.pack("<4sI", b"data", len(data))
    out += data
    return bytes(out)


_WAV_CODECS = {1: "pcm_s16le", 6: "pcm_alaw", 7: "pcm_mulaw"}


def decode_wav_meta(raw: bytes) -> dict:
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt_tag, channels, rate = struct.unpack("<HHI", raw[20:28])
    bits = struct.unpack("<H", raw[34:36])[0]
    if channels not in (1, 2) or (fmt_tag, bits) not in (
        (1, 16), (6, 8), (7, 8)
    ):
        raise NotImplementedError(
            "only PCM s16le and G.711 A-law/mu-law mono/stereo WAV supported "
            f"(fmt_tag={fmt_tag}, bits={bits})"
        )
    n_data = struct.unpack("<I", raw[40:44])[0]
    bytes_per_sample = bits // 8
    n_frames = n_data // (bytes_per_sample * channels)
    return {
        "media_type": "audio",
        "codec": _WAV_CODECS[fmt_tag],
        "width": 0,
        "height": 0,
        "duration_ms": int(n_frames * 1000 // rate),
        "n_bytes": len(raw),
    }


def decode_wav_samples(raw: bytes) -> np.ndarray:
    """WAV bytes -> int16 samples: (n,) for mono, (n, 2) for stereo.
    A-law/mu-law payloads are expanded to linear int16 through the G.711
    tables."""
    meta = decode_wav_meta(raw)  # validates format
    channels = struct.unpack("<H", raw[22:24])[0]
    n_data = struct.unpack("<I", raw[40:44])[0]
    if meta["codec"] in ("pcm_mulaw", "pcm_alaw"):
        codes = np.frombuffer(raw, dtype=np.uint8, offset=_WAV_HEADER_SIZE,
                              count=n_data)
        flat = mulaw_decode(codes) if meta["codec"] == "pcm_mulaw" else alaw_decode(codes)
    else:
        flat = np.frombuffer(raw, dtype="<i2", offset=_WAV_HEADER_SIZE,
                             count=n_data // 2)
    return flat if channels == 1 else flat.reshape(-1, 2)

"""Pure-NumPy baseline JPEG (ITU-T T.81) encoder/decoder.

Moves the dominant real-world image format inside the value-checked codec
path (it previously sat behind the compressed-codec ``NotImplementedError``
seam). Everything here is the public baseline-sequential subset:

* decoder — SOF0 (baseline DCT, Huffman, 8-bit), interleaved single scan,
  arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), restart markers,
  byte-stuffing; progressive (SOF2) and arithmetic coding stay behind a
  ``NotImplementedError``.
* encoder — 4:4:4 or 4:2:0, Annex-K quantization tables scaled by the
  usual libjpeg quality curve, Annex-K Huffman tables. The encoder exists
  so fixtures and round-trip tests are self-contained (no image library in
  the container); encoder and decoder share all tables, so round-trip
  correctness never depends on transcribed constants being byte-perfect
  against external files.

Everything is (height, width, 3) uint8 RGB at the API boundary, matching
the BMP codec. JPEG is lossy: round trips are validated by PSNR, not
byte equality.

The reference has no media pipeline at all — this is part of the
beyond-reference training-data-pipeline surface (brief: multimodal
columns).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg_meta", "decode_jpeg_pixels"]

# zigzag[k] = natural (row-major) index of the k-th coefficient in zigzag
# order: diagonals d=r+c; odd diagonals run top->bottom (r ascending), even
# ones bottom->top — computed, not transcribed, to rule out typos.
_ZIGZAG = np.array(
    sorted(
        range(64),
        key=lambda i: (
            (i // 8 + i % 8),
            (i // 8) if (i // 8 + i % 8) % 2 else -(i // 8),
        ),
    ),
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K / libjpeg base quantization tables (natural order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix: F = A @ f @ A.T, f = A.T @ F @ A
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos(np.pi * (2 * n + 1) * k / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = np.floor((base * scale + 50) / 100)
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical Huffman assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_map(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol (inverse of _canonical_codes)."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, huffval).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.put(0x7F, 8 - self._n)  # pad with 1-bits per the spec

    def emit_marker(self, marker: int) -> None:
        """Byte-align, then append a raw (unstuffed) marker — RSTn."""
        self.flush()
        self.out += bytes([0xFF, marker])


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss, raw bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    ssss = int(abs(v)).bit_length()
    return ssss, (v if v > 0 else v + (1 << ssss) - 1)


def _encode_block(
    w: _BitWriter,
    coefs: np.ndarray,
    dc_pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    zz = coefs[_ZIGZAG]
    dc = int(zz[0])
    ssss, bitsv = _magnitude(dc - dc_pred)
    code, length = dc_codes[ssss]
    w.put(code, length)
    w.put(bitsv, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            code, length = ac_codes[0x00]  # EOB
            w.put(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.put(code, length)
            run -= 16
        ssss, bitsv = _magnitude(v)
        code, length = ac_codes[(run << 4) | ssss]
        w.put(code, length)
        w.put(bitsv, ssss)
        run = 0
    return dc


def _plane_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H/8, W/8, 64) quantized natural-order coefficients of a uint8 plane
    (H, W multiples of 8), vectorized over all blocks at once."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
    b -= 128.0
    coefs = np.einsum("ij,bcjk,lk->bcil", _A, b, _A)
    q = np.round(coefs.reshape(h // 8, w // 8, 64) / qtab)
    return q.astype(np.int32)


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes. ``subsample=True`` emits
    4:2:0 (2x2-mean chroma), exercising the decoder's upsampling path.
    ``restart_interval=N`` emits a DRI segment and an RSTn marker every N
    MCUs (byte-aligned, DC predictors reset — the error-resilience feature
    real encoders use for parallel decode), exercising the decoder's
    restart path."""
    h, w, c = pixels.shape
    assert c == 3
    px = pixels.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qy, qc = _quality_tables(quality)
    hs, vs = (2, 2) if subsample else (1, 1)

    def pad(plane: np.ndarray, mult: int) -> np.ndarray:
        ph = (plane.shape[0] + mult - 1) // mult * mult
        pw = (plane.shape[1] + mult - 1) // mult * mult
        return np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    y = pad(y, 8 * vs)
    if subsample:
        cbp, crp = pad(cb, 16), pad(cr, 16)
        cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = pad(cb, 8), pad(cr, 8)

    yb = _plane_blocks(np.clip(y, 0, 255), qy)
    cbb = _plane_blocks(np.clip(cb, 0, 255), qc)
    crb = _plane_blocks(np.clip(cr, 0, 255), qc)

    dc_l, ac_l = _canonical_codes(*_DC_LUMA), _canonical_codes(*_AC_LUMA)
    dc_c, ac_c = _canonical_codes(*_DC_CHROMA), _canonical_codes(*_AC_CHROMA)
    bw = _BitWriter()
    mcus_y, mcus_x = cbb.shape[0], cbb.shape[1]
    preds = [0, 0, 0]
    mcu_i, rst_i = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.emit_marker(0xD0 + (rst_i % 8))
                rst_i += 1
                preds = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    preds[0] = _encode_block(
                        bw, yb[my * vs + by, mx * hs + bx], preds[0], dc_l, ac_l
                    )
            preds[1] = _encode_block(bw, cbb[my, mx], preds[1], dc_c, ac_c)
            preds[2] = _encode_block(bw, crb[my, mx], preds[2], dc_c, ac_c)
            mcu_i += 1
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in q[_ZIGZAG])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hs << 4) | vs, 0])  # Y
    out += bytes([2, 0x11, 1])  # Cb
    out += bytes([3, 0x11, 1])  # Cr
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        chunk = self.bits[self.pos:self.pos + n]
        if len(chunk) < n:
            raise ValueError("truncated JPEG entropy stream")
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _parse_segments(raw: bytes):
    """Yield (marker, payload) for every segment up to SOS; returns the scan
    byte offset via StopIteration value — used internally."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i = 2
    while i < len(raw):
        if raw[i] != 0xFF:
            raise ValueError("malformed JPEG marker stream")
        # ITU-T T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # a marker — real encoders/transcoders emit them
        while i + 1 < len(raw) and raw[i + 1] == 0xFF:
            i += 1
        marker = raw[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            return
        length = struct.unpack(">H", raw[i + 2:i + 4])[0]
        payload = raw[i + 4:i + 2 + length]
        yield marker, payload, i + 2 + length
        if marker == 0xDA:
            return
        i += 2 + length


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_meta(raw: bytes) -> dict:
    """Header-only parse: dimensions from SOF0 (progressive/arithmetic raise
    NotImplementedError — that seam is now only for non-baseline modes)."""
    for marker, payload, _ in _parse_segments(raw):
        if marker == 0xC0:
            _, h, w, _ = struct.unpack(">BHHB", payload[:6])
            return {
                "media_type": "image",
                "codec": "jpeg",
                "width": int(w),
                "height": int(h),
                "duration_ms": 0,
                "n_bytes": len(raw),
            }
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) supported, got SOF marker "
                f"0xFF{marker:02X}"
            )
    raise ValueError("no SOF0 frame header in JPEG payload")


def decode_jpeg_pixels(raw: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (height, width, 3) uint8 RGB."""
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    frame = None
    scan_comps = None
    restart_interval = 0
    scan_start = None
    for marker, payload, end in _parse_segments(raw):
        if marker == 0xDB:
            j = 0
            while j < len(payload):
                prec_id = payload[j]
                prec, tid = prec_id >> 4, prec_id & 0x0F
                if prec == 0:
                    vals = np.frombuffer(payload, dtype=np.uint8, count=64, offset=j + 1).astype(np.float64)
                    j += 65
                else:
                    vals = np.frombuffer(payload, dtype=">u2", count=64, offset=j + 1).astype(np.float64)
                    j += 129
                nat = np.empty(64)
                nat[_ZIGZAG] = vals  # DQT stores zigzag order
                qtabs[tid] = nat
        elif marker == 0xC4:
            j = 0
            while j < len(payload):
                cls_id = payload[j]
                bits = list(payload[j + 1:j + 17])
                n = sum(bits)
                vals = list(payload[j + 17:j + 17 + n])
                huff[(cls_id >> 4, cls_id & 0x0F)] = _decode_map(bits, vals)
                j += 17 + n
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG supported")
            frame = {
                "h": h, "w": w,
                "comps": [
                    (payload[6 + 3 * k], payload[7 + 3 * k] >> 4,
                     payload[7 + 3 * k] & 0x0F, payload[8 + 3 * k])
                    for k in range(nc)
                ],
            }
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) supported, got SOF marker "
                f"0xFF{marker:02X}"
            )
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = [(payload[1 + 2 * k], payload[2 + 2 * k] >> 4,
                           payload[2 + 2 * k] & 0x0F) for k in range(ns)]
            scan_start = end
    if frame is None or scan_comps is None:
        raise ValueError("JPEG payload missing SOF0/SOS")

    # split entropy-coded data into restart intervals, destuffed
    segments: list[bytes] = []
    cur = bytearray()
    i = scan_start
    while i < len(raw):
        byte = raw[i]
        if byte == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(byte)
        i += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in frame["comps"])
    vmax = max(c[2] for c in frame["comps"])
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    comp_info = []
    for cid, ch, cv, qid in frame["comps"]:
        sdc = next(s for s in scan_comps if s[0] == cid)
        comp_info.append({
            "h": ch, "v": cv, "q": qtabs[qid],
            "dc": huff[(0, sdc[1])], "ac": huff[(1, sdc[2])],
            "plane": np.zeros((mcus_y * cv * 8, mcus_x * ch * 8)),
        })

    total_mcus = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else total_mcus
    mcu = 0
    for seg in segments:
        if mcu >= total_mcus:
            break
        br = _BitReader(seg)
        preds = [0] * len(comp_info)
        seg_end = min(total_mcus, mcu + per_seg)
        while mcu < seg_end:
            my, mx = divmod(mcu, mcus_x)
            for k, ci in enumerate(comp_info):
                for by in range(ci["v"]):
                    for bx in range(ci["h"]):
                        zz = np.zeros(64)
                        t = br.read_symbol(ci["dc"])
                        preds[k] += _extend(br.read(t), t)
                        zz[0] = preds[k]
                        j = 1
                        while j < 64:
                            rs = br.read_symbol(ci["ac"])
                            if rs == 0x00:  # EOB
                                break
                            run, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if run != 15:
                                    raise ValueError("bad AC run in JPEG stream")
                                j += 16  # ZRL
                                continue
                            j += run
                            if j > 63:
                                raise ValueError("AC index overflow in JPEG stream")
                            zz[j] = _extend(br.read(ssss), ssss)
                            j += 1
                        coefs = np.empty(64)
                        coefs[_ZIGZAG] = zz
                        block = _A.T @ (coefs * ci["q"]).reshape(8, 8) @ _A + 128.0
                        y0 = (my * ci["v"] + by) * 8
                        x0 = (mx * ci["h"] + bx) * 8
                        ci["plane"][y0:y0 + 8, x0:x0 + 8] = block
            mcu += 1

    h, w = frame["h"], frame["w"]
    planes = []
    for ci in comp_info:
        p = np.repeat(np.repeat(ci["plane"], vmax // ci["v"], axis=0),
                      hmax // ci["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=2)
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

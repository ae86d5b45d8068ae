"""Pure-NumPy baseline JPEG (ITU-T T.81) encoder/decoder.

Moves the dominant real-world image format inside the value-checked codec
path (it previously sat behind the compressed-codec ``NotImplementedError``
seam). Everything here is the public baseline-sequential subset:

* decoder — SOF0 (baseline DCT, Huffman, 8-bit), interleaved single scan,
  arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), restart markers,
  byte-stuffing; AND SOF2 (progressive DCT, Huffman): multi-scan spectral
  selection + successive approximation, DC first/refine, AC first/refine
  with EOB runs (ITU-T T.81 G.2 semantics) — the two modes that together
  cover essentially all real-world JPEG files; AND SOF3 (lossless, process
  14, T.81 Annex H): predictor-coded samples, all 7 predictors, point
  transform, restart intervals — 8-bit precision, unsubsampled components
  (the overwhelmingly common lossless shape). Arithmetic coding and
  hierarchical modes stay behind a ``NotImplementedError``.
* encoder — 4:4:4 or 4:2:0, Annex-K quantization tables scaled by the
  usual libjpeg quality curve, Annex-K Huffman tables. The encoder exists
  so fixtures and round-trip tests are self-contained (no image library in
  the container); encoder and decoder share all tables, so round-trip
  correctness never depends on transcribed constants being byte-perfect
  against external files. ``progressive=True`` emits a ten-scan SOF2
  script (DC first at Al=1 → per-component AC bands at Al=1 → DC refine →
  AC refine) from the SAME quantized coefficients as the baseline path, so
  tests can assert progressive decode == baseline decode pixel-exactly.

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

# AC table for the progressive scans. The Annex-K AC tables lack the EOBn
# symbols (r<<4 for r=1..14) progressive entropy coding needs, so the
# progressive encoder carries its own table: every symbol it can emit —
# EOB0..EOB14, ZRL, and (run,size) for run 0..15 / size 1..14 — as a flat
# 240-entry length-8 canonical code (codes 0..239; valid prefix code, the
# all-ones code stays unused). Compression is mediocre and irrelevant: the
# encoder exists to produce self-contained test payloads, and the decoder
# reads whatever DHT the stream declares.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 15)],
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
    progressive: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes. ``subsample=True`` emits
    4:2:0 (2x2-mean chroma), exercising the decoder's upsampling path.
    ``restart_interval=N`` emits a DRI segment and an RSTn marker every N
    MCUs (byte-aligned, DC predictors reset — the error-resilience feature
    real encoders use for parallel decode), exercising the decoder's
    restart path. ``progressive=True`` emits the SOF2 multi-scan form from
    the same quantized coefficients (see module docstring)."""
    h, w, c = pixels.shape
    assert c == 3
    if progressive and restart_interval:
        raise ValueError(
            "restart_interval is only wired to the baseline scan emitter; "
            "the progressive scan script is emitted restart-free"
        )
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

    if progressive:
        return _encode_progressive(h, w, qy, qc, hs, vs, yb, cbb, crb)

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


# Lossless (SOF3) Huffman table: the Annex K.3.1 DC-luminance progression
# extended to cover every difference category a mod-2^16 predictor can emit
# (SSSS 0..16; T.81 Table H.2). Kraft sum 0.99994 — a valid canonical set.
_LOSSLESS_DC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
    list(range(17)),
)


def _lossless_predict(ra: int, rb: int, rc: int, predictor: int) -> int:
    """T.81 Table H.1 predictors (interior samples); /2 is an arithmetic
    right shift per H.1.2.1."""
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    if predictor == 7:
        return (ra + rb) >> 1
    raise ValueError(f"lossless JPEG predictor must be 1..7, got {predictor}")


def _lossless_diffs(
    plane: np.ndarray, predictor: int, default: int, restart_interval: int
) -> np.ndarray:
    """Per-sample prediction differences (mod 2^16) of one component plane,
    vectorized: reconstruction is exact, so every neighbor equals the source
    sample and Ra/Rb/Rc come straight from shifted views. Boundary rules per
    T.81 H.1.2.1: the first sample of the scan and of every restart
    interval predicts from ``default`` = 2^(P-Pt-1); the rest of the FIRST
    LINE of the scan and of each restart interval (up to the end of the
    image row the interval starts in) uses the 1-D horizontal predictor
    Ra regardless of the selected predictor; the first sample of every
    other line uses Rb."""
    p = plane.astype(np.int64)
    h, w = p.shape
    ra = np.zeros_like(p)
    rb = np.zeros_like(p)
    rc = np.zeros_like(p)
    ra[:, 1:] = p[:, :-1]
    rb[1:, :] = p[:-1, :]
    rc[1:, 1:] = p[:-1, :-1]
    if predictor == 1:
        pred = ra
    elif predictor == 2:
        pred = rb
    elif predictor == 3:
        pred = rc
    elif predictor == 4:
        pred = ra + rb - rc
    elif predictor == 5:
        pred = ra + ((rb - rc) >> 1)
    elif predictor == 6:
        pred = rb + ((ra - rc) >> 1)
    elif predictor == 7:
        pred = (ra + rb) >> 1
    else:
        raise ValueError(f"lossless JPEG predictor must be 1..7, got {predictor}")
    pred = pred.copy()
    pred[0, 1:] = p[0, :-1]  # rest of line 0: Ra
    if h > 1:
        pred[1:, 0] = p[:-1, 0]  # rest of column 0: Rb
    pred[0, 0] = default
    flat = pred.reshape(-1)
    if restart_interval:
        # H.1.2.1 restart rules: the first line of each interval (from the
        # interval's first sample to the end of the image row it starts in)
        # predicts with Ra; the first sample itself with ``default``.  Row
        # segments past an interval's end belong to the NEXT interval's
        # first line, so blanket Ra-to-end-of-row per start is exact.
        flat_p = p.reshape(-1)
        starts = np.arange(0, h * w, restart_interval)
        for s in starts[1:]:
            row_end = (s // w + 1) * w
            if s + 1 < row_end:
                flat[s + 1 : row_end] = flat_p[s : row_end - 1]
        flat[starts] = default
    return (p - pred) & 0xFFFF


def encode_jpeg_lossless(
    pixels: np.ndarray,
    predictor: int = 1,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> lossless JPEG (SOF3,
    process 14) bytes. No color transform and no DCT — component planes are
    stored verbatim as Huffman-coded prediction differences, so
    decode(encode(x)) == x bit-for-bit (when ``point_transform`` is 0;
    Pt > 0 drops the Pt low bits of every sample by design, T.81 H.1.1).
    One interleaved scan (MCU = one sample per component), selected
    predictor 1..7 in Ss, Pt in Al; ``restart_interval`` (in samples) emits
    RSTn markers with the spec's prediction reset."""
    if pixels.ndim == 2:
        planes = [pixels]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        planes = [pixels[:, :, k] for k in range(3)]
    else:
        raise ValueError("pixels must be (h, w) or (h, w, 3)")
    if pixels.dtype != np.uint8:
        raise ValueError("8-bit samples required")
    if not 0 <= point_transform <= 7:
        raise ValueError("point_transform must be 0..7 for 8-bit precision")
    h, w = planes[0].shape
    nc = len(planes)
    default = 1 << (8 - point_transform - 1)

    diffs = [
        _lossless_diffs(
            pl.astype(np.int64) >> point_transform, predictor, default,
            restart_interval,
        ).reshape(-1)
        for pl in planes
    ]
    codes = _canonical_codes(*_LOSSLESS_DC)
    bw = _BitWriter()
    rst_i = 0
    for s in range(h * w):
        if restart_interval and s and s % restart_interval == 0:
            bw.emit_marker(0xD0 + (rst_i % 8))
            rst_i += 1
        for d in diffs:
            sd = int(d[s])
            if sd >= 32768:
                sd -= 65536
            if sd == -32768:  # the mod-2^16 "32768" case: SSSS=16, no bits
                code, length = codes[16]
                bw.put(code, length)
                continue
            ssss, bitsv = _magnitude(sd)
            code, length = codes[ssss]
            bw.put(code, length)
            bw.put(bitsv, ssss)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    bits, vals = _LOSSLESS_DC
    out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), 0x00)
    out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for k in range(nc):
        out += bytes([k + 1, 0x11, 0])
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for k in range(nc):
        out += bytes([k + 1, 0x00])
    out += bytes([predictor, 0, point_transform])  # Ss=pred, Se=0, AhAl=Pt
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _scan_lossless(
    segments: list[bytes],
    order: list[tuple[np.ndarray, dict]],
    restart_interval: int,
    w: int,
    h: int,
    predictor: int,
    pt: int,
    precision: int,
) -> None:
    """Single lossless scan (T.81 Annex H): each MCU is one sample per
    component; the Huffman symbol is the difference category (SSSS 0..16,
    16 = diff 32768 with no appended bits), prediction per H.1.2.1: the
    2^(P-Pt-1) default at scan/restart-interval starts, the 1-D Ra
    predictor for the rest of each interval's first line, Rb at the start
    of other lines, the selected predictor elsewhere."""
    total = w * h
    per_seg = restart_interval if restart_interval else total
    default = 1 << (precision - pt - 1)
    mcu = 0
    for seg in segments:
        if mcu >= total:
            break
        br = _BitReader(seg)
        fresh = True
        seg_first_row = mcu // w
        seg_end = min(total, mcu + per_seg)
        while mcu < seg_end:
            y, x = divmod(mcu, w)
            for samples, dc_map in order:
                t = br.read_symbol(dc_map)
                if t > 16:
                    raise ValueError("bad lossless difference category")
                diff = 32768 if t == 16 else _extend(br.read(t), t)
                if fresh:
                    px = default
                elif y == seg_first_row:
                    # H.1.2.1: the first line of the scan / of each restart
                    # interval uses the 1-D Ra predictor
                    px = int(samples[y, x - 1])
                elif x == 0:
                    px = int(samples[y - 1, 0])
                else:
                    px = _lossless_predict(
                        int(samples[y, x - 1]),
                        int(samples[y - 1, x]),
                        int(samples[y - 1, x - 1]),
                        predictor,
                    )
                samples[y, x] = (px + diff) & 0xFFFF
            fresh = False
            mcu += 1


def _prog_dc_first_scan(comps: list[dict], al: int) -> bytes:
    """Interleaved DC first scan (Ss=Se=0, Ah=0): codes the point-transformed
    DC (arithmetic shift, T.81 G.1.2.1) as baseline-style predictive diffs,
    over the full MCU grid (pad blocks included, like the baseline scan)."""
    bw = _BitWriter()
    preds = [0] * len(comps)
    mcus_y, mcus_x = comps[-1]["zz"].shape[0] // comps[-1]["v"], \
        comps[-1]["zz"].shape[1] // comps[-1]["h"]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for k, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(c["zz"][my * c["v"] + by, mx * c["h"] + bx, 0]) >> al
                        ssss, bits = _magnitude(dc - preds[k])
                        code, ln = c["dc"][ssss]
                        bw.put(code, ln)
                        bw.put(bits, ssss)
                        preds[k] = dc
    bw.flush()
    return bytes(bw.out)


def _prog_dc_refine_scan(comps: list[dict], al: int) -> bytes:
    """Interleaved DC refinement scan (Ah=Al+1): one raw bit per block — bit
    ``al`` of the (two's-complement) DC value; no Huffman coding."""
    bw = _BitWriter()
    mcus_y, mcus_x = comps[-1]["zz"].shape[0] // comps[-1]["v"], \
        comps[-1]["zz"].shape[1] // comps[-1]["h"]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(c["zz"][my * c["v"] + by, mx * c["h"] + bx, 0])
                        bw.put((dc >> al) & 1, 1)
    bw.flush()
    return bytes(bw.out)


def _prog_ac_first_scan(
    zz: np.ndarray, bh: int, bwid: int, ss: int, se: int, al: int, ac: dict
) -> bytes:
    """Non-interleaved AC first scan for one component over its ceil-dims
    block grid: magnitudes are ``|v| >> al`` (truncation toward zero), runs
    of all-zero bands accumulate into EOBn runs (capped at 32767)."""
    bw = _BitWriter()
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = ac[n << 4]
            bw.put(code, ln)
            bw.put(eobrun - (1 << n), n)
            eobrun = 0

    for by in range(bh):
        for bx in range(bwid):
            band = zz[by, bx, ss:se + 1]
            r = 0
            for v0 in band:
                v = int(v0)
                av = abs(v) >> al
                if av == 0:
                    r += 1
                    continue
                flush()
                while r > 15:
                    code, ln = ac[0xF0]
                    bw.put(code, ln)
                    r -= 16
                ssss, bits = _magnitude(av if v > 0 else -av)
                code, ln = ac[(r << 4) | ssss]
                bw.put(code, ln)
                bw.put(bits, ssss)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
    flush()
    bw.flush()
    return bytes(bw.out)


def _prog_ac_refine_scan(
    zz: np.ndarray, bh: int, bwid: int, ss: int, se: int, al: int, ac: dict
) -> bytes:
    """Non-interleaved AC refinement scan (Ah=Al+1): newly-significant
    coefficients (|v|>>al == 1) are coded as (run,1)+sign; correction bits
    for already-significant ones ride buffered after the next symbol (or
    after the EOBn that closes a run) — T.81 G.2 / the classic libjpeg
    ordering the decoder's advance loop expects."""
    bw = _BitWriter()
    eobrun = 0
    pending: list[int] = []  # correction bits owed right after the next EOBn

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = ac[n << 4]
            bw.put(code, ln)
            bw.put(eobrun - (1 << n), n)
            eobrun = 0
        for b in pending:
            bw.put(b, 1)
        pending.clear()

    for by in range(bh):
        for bx in range(bwid):
            band = [int(v) for v in zz[by, bx, ss:se + 1]]
            absv = [abs(v) >> al for v in band]
            eob_i = max((i for i, a in enumerate(absv) if a == 1), default=-1)
            r = 0
            br: list[int] = []  # this block's buffered correction bits
            for i, a in enumerate(absv):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob_i:
                    flush()
                    code, ln = ac[0xF0]
                    bw.put(code, ln)
                    r -= 16
                    for b in br:
                        bw.put(b, 1)
                    br = []
                if a > 1:
                    br.append(a & 1)
                    continue
                # newly significant at this approximation level
                flush()
                code, ln = ac[(r << 4) | 1]
                bw.put(code, ln)
                bw.put(1 if band[i] > 0 else 0, 1)
                for b in br:
                    bw.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    flush()
    flush()
    bw.flush()
    return bytes(bw.out)


def _encode_progressive(
    h: int,
    w: int,
    qy: np.ndarray,
    qc: np.ndarray,
    hs: int,
    vs: int,
    yb: np.ndarray,
    cbb: np.ndarray,
    crb: np.ndarray,
) -> bytes:
    """Assemble the SOF2 stream: headers, then the ten-scan script
    DC(Al=1) → AC bands per component (Al=1, luma split 1-5/6-63 to
    exercise spectral selection) → DC refine → AC refine. AC scans cover
    each component's ceil(dim/8) block grid (non-interleaved rule); DC
    scans are interleaved over the full MCU grid, matching the decoder."""
    zzs = [yb[..., _ZIGZAG], cbb[..., _ZIGZAG], crb[..., _ZIGZAG]]
    dc_l, dc_c = _canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)
    ac_p = _canonical_codes(*_AC_PROG)
    comps = [
        {"zz": zzs[0], "h": hs, "v": vs, "dc": dc_l},
        {"zz": zzs[1], "h": 1, "v": 1, "dc": dc_c},
        {"zz": zzs[2], "h": 1, "v": 1, "dc": dc_c},
    ]
    # non-interleaved (per-component) block grids: ceil of the component's
    # true sample dims — pad blocks beyond them are never AC-coded
    dims = [
        ((h + 7) // 8, (w + 7) // 8),
        ((-(-h // vs) + 7) // 8, (-(-w // hs) + 7) // 8),
        ((-(-h // vs) + 7) // 8, (-(-w // hs) + 7) // 8),
    ]

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in q[_ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    out += bytes([1, (hs << 4) | vs, 0])
    out += bytes([2, 0x11, 1])
    out += bytes([3, 0x11, 1])
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (0, 1, _DC_CHROMA), (1, 0, _AC_PROG)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)

    def sos(comp_specs: list[tuple[int, int]], ss: int, se: int, ah: int, al: int,
            data: bytes) -> None:
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_specs),
                                             len(comp_specs)))
        for cid, tables in comp_specs:
            out.extend(bytes([cid, tables]))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        out.extend(data)

    all_dc = [(1, 0x00), (2, 0x10), (3, 0x10)]  # (component id, DCtab<<4|ACtab)
    sos(all_dc, 0, 0, 0, 1, _prog_dc_first_scan(comps, 1))
    sos([(1, 0x00)], 1, 5, 0, 1,
        _prog_ac_first_scan(zzs[0], dims[0][0], dims[0][1], 1, 5, 1, ac_p))
    sos([(1, 0x00)], 6, 63, 0, 1,
        _prog_ac_first_scan(zzs[0], dims[0][0], dims[0][1], 6, 63, 1, ac_p))
    sos([(2, 0x00)], 1, 63, 0, 1,
        _prog_ac_first_scan(zzs[1], dims[1][0], dims[1][1], 1, 63, 1, ac_p))
    sos([(3, 0x00)], 1, 63, 0, 1,
        _prog_ac_first_scan(zzs[2], dims[2][0], dims[2][1], 1, 63, 1, ac_p))
    sos(all_dc, 0, 0, 1, 0, _prog_dc_refine_scan(comps, 0))
    sos([(1, 0x00)], 1, 5, 1, 0,
        _prog_ac_refine_scan(zzs[0], dims[0][0], dims[0][1], 1, 5, 0, ac_p))
    sos([(1, 0x00)], 6, 63, 1, 0,
        _prog_ac_refine_scan(zzs[0], dims[0][0], dims[0][1], 6, 63, 0, ac_p))
    sos([(2, 0x00)], 1, 63, 1, 0,
        _prog_ac_refine_scan(zzs[1], dims[1][0], dims[1][1], 1, 63, 0, ac_p))
    sos([(3, 0x00)], 1, 63, 1, 0,
        _prog_ac_refine_scan(zzs[2], dims[2][0], dims[2][1], 1, 63, 0, ac_p))
    out += b"\xff\xd9"
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
        # standalone markers (no length field): SOI, RSTn, TEM (T.81 B.1.1.3)
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
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
    """Header-only parse: dimensions from SOF0 (baseline), SOF2
    (progressive), or SOF3 (lossless); the remaining SOF modes (arithmetic,
    hierarchical) raise NotImplementedError — that seam is now only for
    modes essentially absent from real-world corpora."""
    for marker, payload, _ in _parse_segments(raw):
        if marker in (0xC0, 0xC2, 0xC3):
            _, h, w, _ = struct.unpack(">BHHB", payload[:6])
            return {
                "media_type": "image",
                "codec": "jpeg",
                "width": int(w),
                "height": int(h),
                "duration_ms": 0,
                "n_bytes": len(raw),
            }
        if marker in (0xC1, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0), progressive (SOF2), and lossless "
                f"(SOF3) JPEG supported, got SOF marker 0xFF{marker:02X}"
            )
    raise ValueError("no SOF0/SOF2/SOF3 frame header in JPEG payload")


def _entropy_segments(raw: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuffed entropy-coded bytes from ``start``, split at RSTn markers;
    returns (segments, offset of the 0xFF of the next header marker)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
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
    return segments, i


def _scan_baseline(
    segments: list[bytes],
    order: list[tuple[dict, dict, dict]],
    restart_interval: int,
    mcus_x: int,
    mcus_y: int,
) -> None:
    """Single baseline scan: fills each component's zigzag coefficient array
    over the full (pad-inclusive) MCU grid."""
    total_mcus = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else total_mcus
    mcu = 0
    for seg in segments:
        if mcu >= total_mcus:
            break
        br = _BitReader(seg)
        preds = [0] * len(order)
        seg_end = min(total_mcus, mcu + per_seg)
        while mcu < seg_end:
            my, mx = divmod(mcu, mcus_x)
            for k, (ci, dc_map, ac_map) in enumerate(order):
                for by in range(ci["v"]):
                    for bx in range(ci["h"]):
                        zz = ci["coef"][my * ci["v"] + by, mx * ci["h"] + bx]
                        t = br.read_symbol(dc_map)
                        preds[k] += _extend(br.read(t), t)
                        zz[0] = preds[k]
                        j = 1
                        while j < 64:
                            rs = br.read_symbol(ac_map)
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
            mcu += 1


def _scan_prog_dc(
    segments: list[bytes],
    order: list[tuple[dict, dict | None]],
    restart_interval: int,
    mcus_x: int,
    mcus_y: int,
    ah: int,
    al: int,
) -> None:
    """Progressive DC scan (Ss=Se=0). First pass (Ah=0): baseline-style
    predictive diffs of the point-transformed DC, stored shifted left by Al.
    Refinement (Ah=Al+1): one raw bit per block, OR-ed in at position Al
    (two's-complement, so negative DCs refine correctly). Interleaved over
    the MCU grid when multi-component, else over the component's own
    ceil-dims block grid (the T.81 non-interleaved rule)."""
    interleaved = len(order) > 1
    if interleaved:
        total = mcus_x * mcus_y
    else:
        ci0 = order[0][0]
        total = ci0["bh"] * ci0["bw"]
    per_seg = restart_interval if restart_interval else total
    unit = 0

    def dc_one(br: _BitReader, blk: np.ndarray, preds: list[int], k: int,
               dc_map: dict | None) -> None:
        if ah == 0:
            t = br.read_symbol(dc_map)
            preds[k] += _extend(br.read(t), t)
            blk[0] = preds[k] << al
        elif br.read(1):
            blk[0] = int(blk[0]) | (1 << al)

    for seg in segments:
        if unit >= total:
            break
        br = _BitReader(seg)
        preds = [0] * len(order)
        seg_end = min(total, unit + per_seg)
        while unit < seg_end:
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for k, (ci, dc_map) in enumerate(order):
                    for by in range(ci["v"]):
                        for bx in range(ci["h"]):
                            dc_one(br, ci["coef"][my * ci["v"] + by,
                                                  mx * ci["h"] + bx], preds, k, dc_map)
            else:
                ci, dc_map = order[0]
                by, bx = divmod(unit, ci["bw"])
                dc_one(br, ci["coef"][by, bx], preds, 0, dc_map)
            unit += 1


def _ac_first_block(br: _BitReader, zz: np.ndarray, ac_map: dict,
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """One block of a progressive AC first scan; returns the updated EOB
    run. A block inside a pending run is skipped outright (its band is all
    zero at this approximation level)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_symbol(ac_map)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: run of 2^r + bits blocks, this
            if r:                  # block is the first member
                eobrun += br.read(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive JPEG scan")
        zz[k] = _extend(br.read(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br: _BitReader, zz: np.ndarray, ac_map: dict,
                     ss: int, se: int, p1: int, m1: int, eobrun: int) -> int:
    """One block of a progressive AC refinement scan (T.81 G.2): newly-
    significant coefficients arrive as (run,1)+sign symbols; every
    already-nonzero coefficient passed along the way carries one correction
    bit. The ``c & p1`` guard keeps a coefficient from being corrected
    twice at the same bit position on malformed streams."""
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.read_symbol(ac_map)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("bad newly-significant size in AC refinement")
                val = p1 if br.read(1) else m1
            elif r != 15:
                eobrun = 1 << r  # the trailing handler below decrements for
                if r:            # this block
                    eobrun += br.read(r)
                break
            # advance over r zero-history coefficients (16 for ZRL),
            # reading a correction bit at each nonzero one passed
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.read(1) and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of the band
            c = int(zz[k])
            if c != 0 and br.read(1) and (c & p1) == 0:
                zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _scan_prog_ac(
    segments: list[bytes],
    ci: dict,
    ac_map: dict,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    """Progressive AC scan: always single-component, row-major over the
    component's ceil-dims block grid; the EOB run resets at restart
    boundaries."""
    total = ci["bh"] * ci["bw"]
    per_seg = restart_interval if restart_interval else total
    unit = 0
    p1, m1 = 1 << al, -(1 << al)
    for seg in segments:
        if unit >= total:
            break
        br = _BitReader(seg)
        eobrun = 0
        seg_end = min(total, unit + per_seg)
        while unit < seg_end:
            by, bx = divmod(unit, ci["bw"])
            zz = ci["coef"][by, bx]
            if ah == 0:
                eobrun = _ac_first_block(br, zz, ac_map, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(br, zz, ac_map, ss, se, p1, m1, eobrun)
            unit += 1


def _reconstruct(frame: dict, comps: dict[int, dict],
                 qtabs: dict[int, np.ndarray]) -> np.ndarray:
    """Dequantize + IDCT every component's accumulated coefficients in one
    vectorized einsum, upsample to the luma grid, crop, color-convert."""
    h, w = frame["h"], frame["w"]
    hmax = max(c[1] for c in frame["comps"])
    vmax = max(c[2] for c in frame["comps"])
    planes = []
    for cid, ch, cv, qid in frame["comps"]:
        nat = comps[cid]["coef"][:, :, _UNZIGZAG].astype(np.float64) * qtabs[qid]
        rows, cols = nat.shape[:2]
        pix = np.einsum("ji,rcjk,kl->rcil", _A, nat.reshape(rows, cols, 8, 8), _A)
        plane = (pix + 128.0).transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:h, :w])
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


def decode_jpeg_pixels(raw: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2) JPEG bytes -> (height, width,
    3) uint8 RGB. Every scan accumulates quantized zigzag coefficients into
    per-component arrays; dequantization/IDCT/upsampling run once at the
    end, vectorized over all blocks."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    frame = None
    comps: dict[int, dict] = {}
    progressive = False
    lossless = False
    lossless_pt = 0
    restart_interval = 0
    mcus_x = mcus_y = 0
    saw_scan = False
    i = 2
    while i + 1 < len(raw):
        if raw[i] != 0xFF:
            raise ValueError("malformed JPEG marker stream")
        while i + 1 < len(raw) and raw[i + 1] == 0xFF:
            i += 1
        marker = raw[i + 1]
        if marker == 0xD9:
            break
        # standalone markers (no length field): SOI, RSTn, TEM — same set
        # _parse_segments skips, so the two walks agree on any payload
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        length = struct.unpack(">H", raw[i + 2:i + 4])[0]
        payload = raw[i + 4:i + 2 + length]
        nxt = i + 2 + length
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
        elif marker in (0xC0, 0xC2, 0xC3):
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            frame = {
                "h": h, "w": w,
                "comps": [
                    (payload[6 + 3 * k], payload[7 + 3 * k] >> 4,
                     payload[7 + 3 * k] & 0x0F, payload[8 + 3 * k])
                    for k in range(nc)
                ],
            }
            if lossless:
                if any(ch != 1 or cv != 1 for _, ch, cv, _q in frame["comps"]):
                    raise NotImplementedError(
                        "subsampled lossless JPEG components not supported"
                    )
                for cid, _ch, _cv, _qid in frame["comps"]:
                    comps[cid] = {
                        "h": 1, "v": 1,
                        "samples": np.zeros((h, w), dtype=np.int64),
                    }
                i = nxt
                continue
            hmax = max(c[1] for c in frame["comps"])
            vmax = max(c[2] for c in frame["comps"])
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            for cid, ch, cv, _qid in frame["comps"]:
                comps[cid] = {
                    "h": ch, "v": cv,
                    # full MCU-grid coefficient store (zigzag order); the
                    # ceil-dims bh/bw bound the non-interleaved scans
                    "coef": np.zeros((mcus_y * cv, mcus_x * ch, 64),
                                     dtype=np.int64),
                    "bh": (-(-(h * cv) // vmax) + 7) // 8,
                    "bw": (-(-(w * ch) // hmax) + 7) // 8,
                }
        elif marker in (0xC1, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0), progressive (SOF2), and lossless "
                f"(SOF3) JPEG supported, got SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF in JPEG payload")
            ns = payload[0]
            scomps = [(payload[1 + 2 * k], payload[2 + 2 * k] >> 4,
                       payload[2 + 2 * k] & 0x0F) for k in range(ns)]
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ah, al = payload[3 + 2 * ns] >> 4, payload[3 + 2 * ns] & 0x0F
            segments, nxt = _entropy_segments(raw, nxt)
            saw_scan = True
            if lossless:
                if not 1 <= ss <= 7:
                    raise ValueError(
                        "lossless JPEG scan Ss (predictor) must be 1..7"
                    )
                if se != 0 or ah != 0:
                    raise ValueError("lossless JPEG scan must have Se=0, Ah=0")
                lossless_pt = al
                _scan_lossless(
                    segments,
                    [(comps[cid]["samples"], huff[(0, dct)])
                     for cid, dct, _act in scomps],
                    restart_interval, frame["w"], frame["h"], ss, al, 8,
                )
            elif not progressive:
                _scan_baseline(
                    segments,
                    [(comps[cid], huff[(0, dct)], huff[(1, act)])
                     for cid, dct, act in scomps],
                    restart_interval, mcus_x, mcus_y,
                )
            elif ss == 0:
                if se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                _scan_prog_dc(
                    segments,
                    [(comps[cid], huff[(0, dct)] if ah == 0 else None)
                     for cid, dct, _act in scomps],
                    restart_interval, mcus_x, mcus_y, ah, al,
                )
            else:
                if ns != 1:
                    raise ValueError(
                        "progressive AC scans are single-component (T.81 B.2.3)"
                    )
                cid, _dct, act = scomps[0]
                _scan_prog_ac(segments, comps[cid], huff[(1, act)],
                              restart_interval, ss, se, ah, al)
        i = nxt
    if frame is None or not saw_scan:
        raise ValueError("JPEG payload missing SOF/SOS")
    if lossless:
        planes = [
            np.clip(comps[cid]["samples"] << lossless_pt, 0, 255)
            for cid, _ch, _cv, _qid in frame["comps"]
        ]
        if len(planes) == 1:
            rgb = np.stack([planes[0]] * 3, axis=2)
        elif len(planes) == 3:
            # lossless stores component planes verbatim (no color
            # transform — a transform would break bit-exactness), so three
            # components are RGB directly
            rgb = np.stack(planes, axis=2)
        else:
            raise NotImplementedError(
                f"lossless JPEG with {len(planes)} components not supported"
            )
        return rgb.astype(np.uint8)
    return _reconstruct(frame, comps, qtabs)

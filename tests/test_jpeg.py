"""Pure-NumPy baseline JPEG codec (multimodal/jpeg.py): round-trip fidelity,
meta parse, non-baseline rejection, and its integration with the decode /
resize UDFs and the perceptual-hash path."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from filtered_ads_vector_search_spark.multimodal import codecs as C
from filtered_ads_vector_search_spark.multimodal import jpeg as J
from filtered_ads_vector_search_spark.multimodal import phash as PH
from filtered_ads_vector_search_spark.multimodal.columns import (
    jpeg_source_pixels,
    real_jpeg_payload,
)


def _smooth(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    rng = np.random.RandomState(seed)
    base = rng.randint(30, 225, (4, 4, 3)).astype(np.float64)
    img = np.kron(base, np.ones((h // 4, w // 4, 1)))
    return np.clip(img + rng.uniform(-8, 8, img.shape), 0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-9))


def test_jpeg_roundtrip_444_and_420():
    img = _smooth(1)
    for subsample, floor in ((False, 33.0), (True, 30.0)):
        raw = C.encode_jpeg(img, quality=90, subsample=subsample)
        assert C.sniff(raw) == "jpeg"
        dec = C.decode_jpeg_pixels(raw)
        assert dec.shape == img.shape
        assert _psnr(img, dec) > floor, (subsample, _psnr(img, dec))


def test_jpeg_odd_dimensions_pad_and_crop():
    img = _smooth(2)[:27, :29]
    for subsample in (False, True):
        dec = C.decode_jpeg_pixels(C.encode_jpeg(img, quality=90, subsample=subsample))
        assert dec.shape == img.shape
        assert _psnr(img, dec) > 29.0


def test_jpeg_meta_fields():
    raw = C.encode_jpeg(_smooth(3)[:20, :24], quality=90)
    meta = C.decode_jpeg_meta(raw)
    assert meta == {
        "media_type": "image",
        "codec": "jpeg",
        "width": 24,
        "height": 20,
        "duration_ms": 0,
        "n_bytes": len(raw),
    }


def test_jpeg_restart_markers_roundtrip():
    """DRI + RSTn path: restart intervals byte-align the stream and reset
    DC predictors; the decoder must resynchronize at every marker and
    reproduce the no-restart decode within quantization noise, for both
    chroma modes and for intervals that don't divide the MCU count."""
    img = _smooth(7, 40, 48)
    for subsample in (False, True):
        base = C.decode_jpeg_pixels(C.encode_jpeg(img, quality=90, subsample=subsample))
        for interval in (1, 2, 3, 7):
            raw = C.encode_jpeg(
                img, quality=90, subsample=subsample, restart_interval=interval
            )
            assert b"\xff\xdd" in raw  # DRI present
            dec = C.decode_jpeg_pixels(raw)
            # identical coefficients, identical pixels: restart changes the
            # stream framing only
            assert (dec == base).all(), (subsample, interval)


def test_jpeg_tolerates_fill_bytes_before_markers():
    """ITU-T T.81 B.1.1.2 allows 0xFF fill bytes before any marker; real
    transcoders emit them — parsing must skip them."""
    img = _smooth(8)
    raw = C.encode_jpeg(img, quality=90)
    i = raw.find(b"\xff\xdb")  # pad before DQT and before SOF0
    padded = raw[:i] + b"\xff\xff" + raw[i:]
    j = padded.find(b"\xff\xc0")
    padded = padded[:j] + b"\xff" + padded[j:]
    assert C.decode_jpeg_meta(padded)["width"] == img.shape[1]
    assert (C.decode_jpeg_pixels(padded) == C.decode_jpeg_pixels(raw)).all()


def test_jpeg_tolerates_standalone_tem_marker():
    """TEM (0xFF01) is a standalone marker with no length field (T.81
    B.1.1.3); a header region carrying one must not be misparsed as a
    length-prefixed segment — and both parsers (the header-only
    _parse_segments walk and the decode_jpeg_pixels walk) must agree."""
    img = _smooth(8)
    raw = C.encode_jpeg(img, quality=90)
    i = raw.find(b"\xff\xdb")  # TEM before DQT, in the header region
    padded = raw[:i] + b"\xff\x01" + raw[i:]
    assert C.decode_jpeg_meta(padded)["width"] == img.shape[1]
    assert (C.decode_jpeg_pixels(padded) == C.decode_jpeg_pixels(raw)).all()


def test_resize_image_preserves_jpeg_chroma_mode():
    img = _smooth(9)
    for sub in (False, True):
        raw = C.encode_jpeg(img, quality=90, subsample=sub)
        out = C.resize_image(raw, 16, 12)
        assert C.sniff(out) == "jpeg"
        from filtered_ads_vector_search_spark.multimodal.jpeg import (
            _parse_segments,
        )

        for marker, payload, _ in _parse_segments(out):
            if marker == 0xC0:
                assert (payload[7] != 0x11) == sub
                break


def test_jpeg_rejects_unsupported_sof_modes():
    """Arithmetic-coded (SOF9) and extended-sequential (SOF1) frames stay
    behind the NotImplementedError seam; SOF0 and SOF2 are the real paths."""
    for sof in (0xC1, 0xC9):
        raw = bytearray(C.encode_jpeg(_smooth(4), quality=90))
        i = raw.find(b"\xff\xc0")
        raw[i + 1] = sof
        with pytest.raises(NotImplementedError, match="SOF0"):
            C.decode_jpeg_meta(bytes(raw))
        with pytest.raises(NotImplementedError, match="SOF0"):
            C.decode_jpeg_pixels(bytes(raw))


def test_jpeg_progressive_matches_baseline_exactly():
    """SOF2 ten-scan script vs SOF0 single scan from the SAME quantized
    coefficients: after the full refine chain (Al 1 -> 0) the accumulated
    coefficients are identical, so the decoded pixels must be bit-equal —
    both chroma modes, odd dims, and a flat patch that drives EOB runs
    across many all-zero AC blocks."""
    img = _smooth(11, 48, 56).copy()
    img[8:32, 8:40] = 128  # flat region -> all-zero AC blocks -> EOBRUN > 1
    for crop in ((48, 56), (33, 47)):
        sub_img = img[: crop[0], : crop[1]]
        for subsample in (False, True):
            base = C.encode_jpeg(sub_img, quality=85, subsample=subsample)
            prog = C.encode_jpeg(
                sub_img, quality=85, subsample=subsample, progressive=True
            )
            assert b"\xff\xc2" in prog and prog.count(b"\xff\xda") == 10
            db = C.decode_jpeg_pixels(base)
            dp = C.decode_jpeg_pixels(prog)
            assert (db == dp).all(), (crop, subsample)


def test_jpeg_progressive_noise_image_exercises_zrl_and_refine():
    """Dense high-frequency content at low quality drives the ZRL (>15-zero
    run) and refinement-correction-bit paths; equality with the baseline
    decode proves each fired path reconstructs the exact coefficients."""
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (40, 40, 3)).astype(np.uint8)
    for quality in (30, 90):
        base = C.decode_jpeg_pixels(C.encode_jpeg(img, quality=quality))
        prog = C.decode_jpeg_pixels(
            C.encode_jpeg(img, quality=quality, progressive=True)
        )
        assert (base == prog).all(), quality


def test_jpeg_progressive_meta():
    raw = C.encode_jpeg(_smooth(13)[:20, :24], quality=90, progressive=True)
    meta = C.decode_jpeg_meta(raw)
    assert meta["width"] == 24 and meta["height"] == 20
    assert meta["codec"] == "jpeg" and meta["n_bytes"] == len(raw)


def test_jpeg_progressive_rejects_restart_interval():
    with pytest.raises(ValueError, match="restart_interval"):
        C.encode_jpeg(_smooth(14), quality=90, progressive=True, restart_interval=2)


def _custom_progressive(img: np.ndarray, quality: int, subsample: bool) -> bytes:
    """A scan script the library encoder never emits — DC and AC coded at
    Al=0 outright (no successive approximation) and the DC scans
    NON-interleaved, one single-component scan per component over its
    ceil-dims block grid. Real decoders must accept any T.81-legal script;
    this exercises the decoder's ns=1 DC path and its Al=0 fast path."""
    from filtered_ads_vector_search_spark.multimodal.jpeg import (
        _AC_PROG,
        _BitWriter,
        _DC_CHROMA,
        _DC_LUMA,
        _canonical_codes,
        _magnitude,
        _plane_blocks,
        _prog_ac_first_scan,
        _quality_tables,
        _ZIGZAG,
    )
    import struct

    h, w, _ = img.shape
    px = img.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qy, qc = _quality_tables(quality)
    hs, vs = (2, 2) if subsample else (1, 1)

    def pad(plane, mult):
        ph = (plane.shape[0] + mult - 1) // mult * mult
        pw = (plane.shape[1] + mult - 1) // mult * mult
        return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                      mode="edge")

    y = pad(y, 8 * vs)
    if subsample:
        cbp, crp = pad(cb, 16), pad(cr, 16)
        cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = pad(cb, 8), pad(cr, 8)
    zzs = [
        _plane_blocks(np.clip(p, 0, 255), qt)[..., _ZIGZAG]
        for p, qt in ((y, qy), (cb, qc), (cr, qc))
    ]
    dims = [
        ((h + 7) // 8, (w + 7) // 8),
        ((-(-h // vs) + 7) // 8, (-(-w // hs) + 7) // 8),
        ((-(-h // vs) + 7) // 8, (-(-w // hs) + 7) // 8),
    ]
    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA),
                _canonical_codes(*_DC_CHROMA)]
    ac_p = _canonical_codes(*_AC_PROG)

    def dc_noninterleaved(ci: int) -> bytes:
        # single-component DC first scan at Al=0: row-major over the
        # component's ceil-dims grid, own predictor
        bw = _BitWriter()
        pred = 0
        bh, bwid = dims[ci]
        for by in range(bh):
            for bx in range(bwid):
                dc = int(zzs[ci][by, bx, 0])
                ssss, bits = _magnitude(dc - pred)
                code, ln = dc_codes[ci][ssss]
                bw.put(code, ln)
                bw.put(bits, ssss)
                pred = dc
        bw.flush()
        return bytes(bw.out)

    out = bytearray()
    out += b"\xff\xd8"
    for tid, qt in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in qt[_ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hs << 4) | vs, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (0, 1, _DC_CHROMA), (1, 0, _AC_PROG)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)

    def sos(specs, ss, se, ah, al, data):
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(specs), len(specs)))
        for cid, tabs in specs:
            out.extend(bytes([cid, tabs]))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        out.extend(data)

    for ci, (cid, dct) in enumerate(((1, 0x00), (2, 0x10), (3, 0x10))):
        sos([(cid, dct)], 0, 0, 0, 0, dc_noninterleaved(ci))
    for ci, cid in enumerate((1, 2, 3)):
        bh, bwid = dims[ci]
        sos([(cid, 0x00)], 1, 63, 0, 0,
            _prog_ac_first_scan(zzs[ci], bh, bwid, 1, 63, 0, ac_p))
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_custom_scan_script():
    """A T.81-legal script the library encoder never produces: Al=0 (no
    successive approximation) and single-component non-interleaved DC
    scans. For 4:4:4 every component's non-interleaved grid equals the MCU
    grid, so the decode is bit-equal to baseline; for 4:2:0 the luma
    non-interleaved grid SKIPS the MCU pad blocks (their DC never gets
    coded), which only touches cropped-away pad pixels — asserted
    identical on the visible region."""
    img = _smooth(15, 44, 52)[:39, :45]
    for subsample in (False, True):
        base = C.decode_jpeg_pixels(C.encode_jpeg(img, quality=85, subsample=subsample))
        custom = C.decode_jpeg_pixels(_custom_progressive(img, 85, subsample))
        assert custom.shape == base.shape
        assert (custom == base).all(), subsample


def test_jpeg_near_exact_on_smooth_gradients():
    """The registry oracle's premise: q90 on the arithmetic gradient images
    is within 1 count per pixel, both chroma modes."""
    for i in range(40):
        src = jpeg_source_pixels(i).astype(np.int64)
        dec = C.decode_jpeg_pixels(real_jpeg_payload(i)).astype(np.int64)
        assert dec.shape == src.shape
        assert int(np.abs(dec - src).max()) <= 1, i


def test_ahash_stable_across_jpeg_reencode():
    """Perceptual-hash stability across a lossy JPEG re-encode of the same
    pixels — the near-dup case image dedup must catch."""
    img = _smooth(5)
    bmp = C.encode_bmp(img)
    h_bmp = PH.ahash_bits(bmp)
    for subsample in (False, True):
        jpg = C.encode_jpeg(img, quality=90, subsample=subsample)
        d = bin((h_bmp ^ PH.ahash_bits(jpg)) & (2**64 - 1)).count("1")
        assert d <= 3, (subsample, d)
    other = C.encode_jpeg(_smooth(6), quality=90)
    d_other = bin((h_bmp ^ PH.ahash_bits(other)) & (2**64 - 1)).count("1")
    assert d_other > 10


def test_image_dup_pairs_finds_jpeg_reencode(spark):
    """A JPEG re-encode planted next to its BMP original surfaces as a
    banded near-dup pair."""
    imgs = [_smooth(i) for i in range(5)]
    rows = [(i, C.encode_bmp(im)) for i, im in enumerate(imgs)]
    rows.append((100, C.encode_jpeg(imgs[0], quality=90)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    found = {(r.id_a, r.id_b) for r in PH.image_dup_pairs(df, max_hamming=3).collect()}
    assert (0, 100) in found


def test_decode_media_meta_and_resize_on_jpeg(spark):
    """UDF integration: JPEG payloads flow through the decode-meta and
    resize mapInPandas paths (resize re-encodes as JPEG at the new dims)."""
    from filtered_ads_vector_search_spark.multimodal import (
        decode_media_meta,
        resize_images,
        with_real_jpeg,
    )

    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    meta = decode_media_meta(with_real_jpeg(docs)).collect()
    for r in meta:
        assert r.codec == "jpeg" and r.media_type == "image"
        assert r.width == 16 + r.doc_id % 9 and r.height == 16 + r.doc_id % 7
    resized = decode_media_meta(
        resize_images(with_real_jpeg(docs), width=12, height=10)
    ).collect()
    for r in resized:
        assert r.codec == "jpeg" and (r.width, r.height) == (12, 10)


# ---------------------------------------------------------------------------
# lossless (SOF3) mode — round 10
# ---------------------------------------------------------------------------


def test_jpeg_lossless_roundtrip_exact_all_predictors():
    """decode(encode(x)) == x BIT-FOR-BIT for every T.81 Table H.1 predictor
    on pure noise (the hardest content: every difference category shows up),
    including degenerate 1x1 / 1xN / Nx1 shapes and grayscale."""
    rng = np.random.RandomState(11)
    for shape in [(5, 7, 3), (16, 23, 3), (1, 1, 3), (9, 1, 3), (1, 13, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for pred in range(1, 8):
            dec = C.decode_jpeg_pixels(J.encode_jpeg_lossless(img, predictor=pred))
            assert np.array_equal(dec, img), (shape, pred)
    gray = rng.randint(0, 256, size=(11, 6), dtype=np.uint8)
    dec = C.decode_jpeg_pixels(J.encode_jpeg_lossless(gray, predictor=4))
    assert np.array_equal(dec, np.stack([gray] * 3, axis=2))


def test_jpeg_lossless_restart_intervals_exact():
    """RSTn markers reset prediction to 2^(P-Pt-1) for the next sample of
    every component (T.81 H.1.1); the round trip stays bit-exact at every
    interval, including the pathological every-sample case."""
    img = np.random.RandomState(3).randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for ri in (1, 5, 64):
        for pred in (1, 4, 7):
            raw = J.encode_jpeg_lossless(img, predictor=pred, restart_interval=ri)
            assert np.array_equal(C.decode_jpeg_pixels(raw), img), (ri, pred)
            # restart markers genuinely present
            assert any(bytes([0xFF, 0xD0 + k]) in raw for k in range(8))


def test_jpeg_lossless_restart_first_line_uses_ra():
    """T.81 H.1.2.1: the first LINE of each restart interval predicts with
    the 1-D Ra predictor regardless of the selected predictor (not just a
    default reset of the first sample). Checked directly on the encoder's
    difference stream for a row-aligned and a mid-row interval, plus the
    bit-exact roundtrip for every 2-D predictor."""
    rng = np.random.RandomState(11)
    plane = rng.randint(0, 256, size=(6, 8), dtype=np.uint8)
    p = plane.astype(np.int64)
    h, w = p.shape
    for ri in (w, 5):  # row-aligned and mid-row restarts
        diffs = J._lossless_diffs(p, predictor=2, default=128, restart_interval=ri)
        for s in range(0, h * w, ri):
            r0, c0 = divmod(s, w)
            # first sample of the interval: default prediction
            assert diffs[r0, c0] == (p[r0, c0] - 128) & 0xFFFF, (ri, s)
            # rest of the interval's first line (clipped to the interval's
            # own samples): Ra, NOT the selected Rb
            for c in range(c0 + 1, min(c0 + ri, w)):
                assert diffs[r0, c] == (p[r0, c] - p[r0, c - 1]) & 0xFFFF, (ri, s, c)
    # lines past an interval's first line: the selected predictor resumes
    # (with pre-restart neighbors available to the decoder) — interval of
    # two rows, second row of each interval must be Rb again
    diffs = J._lossless_diffs(p, predictor=2, default=128, restart_interval=2 * w)
    for r in (1, 3, 5):
        assert diffs[r, 0] == (p[r, 0] - p[r - 1, 0]) & 0xFFFF, r
        for c in range(1, w):
            assert diffs[r, c] == (p[r, c] - p[r - 1, c]) & 0xFFFF, (r, c)
    img = rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    for pred in range(1, 8):
        for ri in (3, 7, 21):
            raw = J.encode_jpeg_lossless(img, predictor=pred, restart_interval=ri)
            assert np.array_equal(C.decode_jpeg_pixels(raw), img), (pred, ri)


def test_jpeg_lossless_point_transform():
    """Pt > 0 drops the Pt low bits by design (decode returns sample << Pt)."""
    img = np.random.RandomState(5).randint(0, 256, size=(8, 9, 3), dtype=np.uint8)
    for pt in (1, 2, 4):
        dec = C.decode_jpeg_pixels(J.encode_jpeg_lossless(img, point_transform=pt))
        assert np.array_equal(dec, (img >> pt) << pt), pt


def test_jpeg_lossless_meta_and_validation():
    img = np.random.RandomState(9).randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    m = C.decode_jpeg_meta(J.encode_jpeg_lossless(img))
    assert (m["media_type"], m["codec"], m["width"], m["height"]) == (
        "image", "jpeg", 17, 13,
    )
    with pytest.raises(ValueError, match="predictor"):
        J.encode_jpeg_lossless(img, predictor=0)
    with pytest.raises(ValueError, match="predictor"):
        J.encode_jpeg_lossless(img, predictor=8)
    with pytest.raises(ValueError, match="point_transform"):
        J.encode_jpeg_lossless(img, point_transform=8)
    with pytest.raises(ValueError, match="8-bit"):
        J.encode_jpeg_lossless(img.astype(np.int32))
    # subsampled lossless components stay behind the seam: patch the frame
    # header's sampling byte of a valid payload
    raw = bytearray(J.encode_jpeg_lossless(img))
    i = raw.find(b"\xff\xc3")
    raw[i + 11] = 0x22  # first component's H/V byte -> 2x2
    with pytest.raises(NotImplementedError, match="subsampled lossless"):
        C.decode_jpeg_pixels(bytes(raw))


def test_jpeg_lossless_fixture_content_sum_closed_form(spark):
    """The registry fixture path end-to-end: deterministic lossless payloads
    (predictor cycling, restarts on every third id) through decode_media_meta
    + content_stats equal the closed-form source-pixel sum the DuckDB oracle
    uses: 3*w*h*(base + w + h)."""
    from filtered_ads_vector_search_spark.multimodal import (
        content_stats,
        decode_media_meta,
        with_real_jpeg_lossless,
    )

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = content_stats(decode_media_meta(with_real_jpeg_lossless(docs))).select(
        "doc_id", "width", "height", "content_sum"
    )
    for r in out.collect():
        i = r["doc_id"]
        w, h = 16 + i % 9, 16 + i % 7
        assert (r["width"], r["height"]) == (w, h)
        assert r["content_sum"] == 3 * w * h * ((i * 7) % 96 + w + h), i

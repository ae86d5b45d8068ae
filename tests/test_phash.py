"""Perceptual image hashing (multimodal/phash.py): stability under resize
and small noise, discrimination between distinct images, banded pair
generation correctness."""

import numpy as np
import pyspark.sql.functions as F

from filtered_ads_vector_search_spark.multimodal.codecs import (
    encode_bmp,
    resize_bmp,
)
from filtered_ads_vector_search_spark.multimodal import phash as PH


def _img(seed: int, h: int = 32, w: int = 32) -> bytes:
    """Structured test image: an 8x8 pattern of dark/bright blocks (values
    far from the global mean, so cells sit well away from the aHash
    threshold) upsampled to h x w, plus per-pixel noise that BLOCK MEANS
    average away — exactly the regime true (mean-pooled) aHash is stable
    in, and where a point-sampling hash would wobble."""
    rng = np.random.RandomState(seed)
    base = np.where(rng.rand(8, 8) < 0.5, 40.0, 215.0)
    ys = (np.arange(h) * 8) // h
    xs = (np.arange(w) * 8) // w
    gray = base[ys][:, xs] + rng.uniform(-50, 50, (h, w))
    px = np.repeat(gray.clip(0, 255)[:, :, None], 3, axis=2)
    return encode_bmp(px.astype(np.uint8))


def test_ahash_stable_under_resize_and_noise():
    raw = _img(1)
    h0 = PH.ahash_bits(raw)
    assert h0 == PH.ahash_bits(raw)  # deterministic
    resized = resize_bmp(raw, 16, 16)
    d_resize = bin((h0 ^ PH.ahash_bits(resized)) & (2**64 - 1)).count("1")
    assert d_resize <= 3
    other = _img(2)
    d_other = bin((h0 ^ PH.ahash_bits(other)) & (2**64 - 1)).count("1")
    assert d_other > 10


def test_image_dup_pairs_banded(spark):
    rows = []
    for i in range(6):
        raw = _img(i)
        rows.append((i, raw))
        # plant a resized near-dup of image 0 as id 100
    rows.append((100, resize_bmp(_img(0), 24, 24)))
    rows.append((200, b"not an image"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = PH.image_dup_pairs(df, max_hamming=3).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 100) in found
    # distinct random images don't collide within the budget
    assert all(a == 0 and b == 100 for a, b in found), found


def test_ahash_udf_matches_driver_twin(spark):
    rows = [(i, _img(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id", PH.ahash_udf(F.col("payload")).alias("sig")
        ).collect()
    }
    for i, raw in rows:
        assert got[i] == PH.ahash_bits(raw)


# --- audio energy fingerprint -----------------------------------------------


def _wav(seed: int, n: int = 8000, scale: float = 1.0) -> bytes:
    from filtered_ads_vector_search_spark.multimodal.codecs import encode_wav

    rng = np.random.RandomState(seed)
    # band-limited-ish signal: random walk, normalized
    sig = np.cumsum(rng.randn(n))
    sig = sig / (np.abs(sig).max() + 1e-9)
    return encode_wav((sig * scale * 20000).astype(np.int16))


def test_audio_fingerprint_scale_invariant_and_discriminative():
    h0 = PH.audio_fingerprint_bits(_wav(1))
    assert h0 == PH.audio_fingerprint_bits(_wav(1))
    d_scaled = bin((h0 ^ PH.audio_fingerprint_bits(_wav(1, scale=0.5))) & (2**64 - 1)).count("1")
    assert d_scaled <= 2
    d_other = bin((h0 ^ PH.audio_fingerprint_bits(_wav(2))) & (2**64 - 1)).count("1")
    assert d_other > 10


def test_audio_dup_pairs_banded(spark):
    rows = [(i, _wav(i)) for i in range(5)]
    rows.append((100, _wav(0, scale=0.5)))  # planted quiet duplicate
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {(r.id_a, r.id_b): r.hamming for r in PH.audio_dup_pairs(df, max_hamming=3).collect()}
    # the planted amplitude-scaled duplicate must be found, and no
    # coincidental random-walk pair may look MORE similar than it
    assert (0, 100) in pairs
    assert all(h >= pairs[(0, 100)] for h in pairs.values()), pairs


def test_image_dup_pairs_exact_mode_max_hamming_zero(spark):
    """max_hamming=0 (exact-signature duplicates) must not overflow the
    single-band mask — regression for the (1<<64)-1 literal crash."""
    rows = [(0, _img(1)), (1, _img(1)), (2, _img(2))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    found = {(r.id_a, r.id_b) for r in PH.image_dup_pairs(df, max_hamming=0).collect()}
    assert found == {(0, 1)}

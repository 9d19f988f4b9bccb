"""hamming_neardup_pairs (operators/dedup.py): exactness guarantee vs a
brute-force reference, parameter guards, hot-bucket star mode, and the
end-to-end image-dedup path (real PPM decode → aHash → pairs).
"""
import random

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.dedup import hamming_neardup_pairs


def _brute(rows, max_hamming):
    out = set()
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1:]:
            a, b = (ia, ib) if ia < ib else (ib, ia)
            if bin(ha ^ hb).count("1") <= max_hamming:
                out.add((a, b))
    return out


def test_exact_vs_bruteforce_random(spark):
    rng = random.Random(99)
    base = [rng.getrandbits(62) for _ in range(40)]
    rows = []
    for i in range(120):
        h = base[i % 40]
        # flip up to 3 random bits so some pairs straddle the threshold
        for _ in range(rng.randint(0, 3)):
            h ^= 1 << rng.randrange(62)
        rows.append((i, h))
    df = spark.createDataFrame(rows, "id long, ph long")
    for mh in (1, 3, 7):
        got = {(r.id_a, r.id_b) for r in hamming_neardup_pairs(
            df, "id", "ph", bits=64, bands=8, max_hamming=mh).collect()}
        assert got == _brute(rows, mh), mh


def test_parameter_guards(spark):
    df = spark.createDataFrame([(1, 5)], "id long, ph long")
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, "id", "ph", bits=64, bands=7)
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, "id", "ph", bands=8, max_hamming=8)


def test_hamming_reported_exactly(spark):
    df = spark.createDataFrame(
        [(1, 0b1010), (2, 0b1010), (3, 0b1000)], "id long, ph long")
    got = {(r.id_a, r.id_b): r.hamming for r in hamming_neardup_pairs(
        df, "id", "ph", bits=64, bands=8, max_hamming=2).collect()}
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def test_image_ahash_neardup_end_to_end(spark):
    # real codec path: solid PPM images; a near-identical pair (one pixel
    # nudged) hashes within 1 bit, a different image lands far away
    from duckdb_spatial_spark.operators.media_codecs import encode_ppm
    from duckdb_spatial_spark.operators.multimodal import image_features
    import numpy as np

    base = np.zeros((16, 16, 3), dtype=np.uint8)
    base[:8, :, :] = 200          # top half bright, bottom dark
    near = base.copy()
    near[15, 15, 0] = 30          # one-pixel nudge
    other = np.zeros((16, 16, 3), dtype=np.uint8)
    other[:, :8, :] = 200         # LEFT half bright → different hash

    rows = [(1, bytearray(encode_ppm(base))),
            (2, bytearray(encode_ppm(near))),
            (3, bytearray(encode_ppm(other)))]
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    feats = image_features(df, payload_col="payload").select(
        "img_id", F.col("img_features.phash").alias("ph"))
    pairs = hamming_neardup_pairs(feats, "img_id", "ph", bits=64,
                                  bands=8, max_hamming=4).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_audio_fingerprint_neardup_end_to_end(spark):
    # real WAV codec path: a noisy copy of a tone sequence fingerprints
    # within a few bits; a different sequence lands far away
    import numpy as np
    from duckdb_spatial_spark.operators.media_codecs import encode_wav
    from duckdb_spatial_spark.operators.multimodal import audio_fingerprint

    rng = np.random.default_rng(3)
    t = np.arange(13000) / 8000.0
    # amplitude-modulated tone: distinct frame-energy profile
    env = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 1.7 * t))
    base = (env * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
    near = base * 0.5 + rng.normal(0, 0.004, base.shape)   # rescaled + noise
    env2 = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 5.3 * t + 1.0))
    other = (env2 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)

    def wav(x):
        # encode_wav takes floats in [-1, 1]
        return bytearray(encode_wav(x, 8000))

    df = spark.createDataFrame(
        [(1, wav(base)), (2, wav(near)), (3, wav(other))],
        "clip_id long, payload binary")
    fp = audio_fingerprint(df).select("clip_id", "audio_fp")
    pairs = hamming_neardup_pairs(fp, "clip_id", "audio_fp", bits=64,
                                  bands=8, max_hamming=6).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_audio_fingerprint_amplitude_invariant(spark):
    import numpy as np
    from duckdb_spatial_spark.operators.multimodal import _audio_fingerprint_one

    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, 6500)
    a = _audio_fingerprint_one(x)
    b = _audio_fingerprint_one(x * 3.7)
    assert a == b
    assert _audio_fingerprint_one(np.zeros(10)) is None  # too short


def test_band_buckets_top_band_64bit(spark):
    """The shared banding helper handles bits=64 without overflowing a
    long literal (the in-place band mask ((1<<8)-1)<<56 exceeds int64 —
    the latent simhash_candidates bug the helper fixed). Two hashes
    differing ONLY in the top band must still share the other 7 bands."""
    from duckdb_spatial_spark.operators.dedup import _band_buckets

    a = 0x7A345678_90ABCDEF
    b = 0x01345678_90ABCDEF  # top byte differs
    sig = spark.createDataFrame([(1, a), (2, b)], "__id long, __sh long")
    rows = _band_buckets(sig, bits=64, bands=8).collect()
    assert len(rows) == 16
    shared = {r.band for r in rows if
              sum(1 for q in rows if q.band == r.band and q.key == r.key) == 2}
    assert shared == set(range(7))  # all but band 7 agree

"""Tests for the exact-integer DCT perceptual hash
(operators/multimodal.image_phash_dct / phash_neardup_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from files_kraken_spark.operators.multimodal import (
    DCT_CX,
    DCT_CY,
    DCT_SCALE,
    attach_binary,
    image_phash_dct,
    phash_neardup_pairs,
)


def _media(spark, rows):
    df = spark.createDataFrame(rows, "media_id long, body string")
    pgm = df.select(
        "media_id",
        F.concat(F.lit("P5\n16 8\n255\n"), F.col("body")).alias("payload"),
    )
    return attach_binary(pgm, "media_id", "payload", "image")


def test_dct_basis_shape_and_scale():
    assert len(DCT_CY) == 4 and all(len(r) == 8 for r in DCT_CY)
    assert len(DCT_CX) == 8 and all(len(r) == 16 for r in DCT_CX)
    # DC rows are the flat basis at full scale
    assert DCT_CY[0] == [DCT_SCALE] * 8
    assert DCT_CX[0] == [DCT_SCALE] * 16
    assert all(abs(c) <= DCT_SCALE for row in DCT_CY + DCT_CX for c in row)


def test_phash_deterministic_and_31_bits(spark):
    body = "".join(chr(33 + (i * 7) % 90) for i in range(128))
    out = image_phash_dct(_media(spark, [(1, body), (2, body)])).collect()
    hs = {r["media_id"]: r["phash"] for r in out}
    assert hs[1] == hs[2]  # identical payloads, identical hash
    assert 0 <= hs[1] < (1 << 32) and not (hs[1] & 1)  # DC bit unused


def test_phash_low_freq_stability_vs_structure(spark):
    base = "".join(chr(33 + (i * 7) % 90) for i in range(128))
    # single-pixel change: global low-frequency structure barely moves
    tweaked = chr(ord(base[0]) + 1) + base[1:]
    # row-reversed image: different global structure
    flipped = "".join(
        base[y * 16 : y * 16 + 16] for y in reversed(range(8))
    )
    rows = [(1, base), (2, tweaked), (3, flipped)]
    hs = {
        r["media_id"]: r["phash"]
        for r in image_phash_dct(_media(spark, rows)).collect()
    }
    d_noise = bin(hs[1] ^ hs[2]).count("1")
    d_structure = bin(hs[1] ^ hs[3]).count("1")
    assert d_noise <= 2
    assert d_structure > d_noise


def test_phash_neardup_finds_exact_dup_only(spark):
    a = "".join(chr(33 + (i * 7) % 90) for i in range(128))
    b = "".join(chr(33 + (i * 11) % 90) for i in range(128))
    hashes = image_phash_dct(_media(spark, [(1, a), (2, a), (3, b)]))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(hashes, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs

"""Round-12 pHash index maintenance: applying append/retraction
batches to a persisted near-dup pair index must equal the
from-scratch banded build on the surviving corpus — pinned here on
synthetic hash tables with adversarial shapes (a pair whose BOTH
endpoints tombstone, a batch image pairing with a concurrently
tombstoned base image, batch-batch pairs). The oracle evidence lives
in queries/phash_maintenance.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from files_kraken_spark.operators.multimodal import (
    phash_index_apply,
    phash_neardup_pairs,
)


def _hashes(spark, rows):
    return spark.createDataFrame(rows, "media_id long, phash long")


def _pset(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


# hand-built 31-bit hashes: 1..3 mutually near (<=2 flips), 4 far,
# 5 near 1 (1 flip in the top band), 6 identical to 2
H = {
    1: 0b1010101010101010101010101010101,
    2: 0b1010101010101010101010101010111,  # 1 flip vs 1
    3: 0b1010101010101010101010101011111,  # 2 flips vs 1
    4: 0b0101010101010101010101010101010,  # far from everything
    5: 0b1110101010101010101010101010101,  # 1 flip vs 1 (high band)
    6: 0b1010101010101010101010101010111,  # == 2
}


def test_append_merge_equals_from_scratch(spark):
    base = _hashes(spark, [(i, H[i]) for i in (1, 2, 4)])
    batch = _hashes(spark, [(i, H[i]) for i in (3, 5, 6)])
    base_pairs = phash_neardup_pairs(base, max_hamming=3)
    merged, hashes = phash_index_apply(base_pairs, base, batch_hashes=batch)
    scratch = phash_neardup_pairs(base.unionByName(batch), max_hamming=3)
    assert _pset(merged) == _pset(scratch)
    assert hashes.count() == 6
    got = _pset(merged)
    # a cross pair (base 2, batch 6 — identical hashes) and a
    # batch-batch pair (3, 6 — 2 flips) must both have been found
    assert (2, 6, 0) in got
    assert any({a, b} == {3, 6} for a, b, _ in got)


def test_retraction_drops_only_touched_pairs(spark):
    base = _hashes(spark, [(i, H[i]) for i in (1, 2, 3, 4, 5)])
    base_pairs = phash_neardup_pairs(base, max_hamming=3)
    tomb = spark.createDataFrame([(2,), (5,)], "media_id long")
    merged, hashes = phash_index_apply(base_pairs, base, tombstone_ids=tomb)
    keep = base.join(tomb, "media_id", "left_anti")
    scratch = phash_neardup_pairs(keep, max_hamming=3)
    assert _pset(merged) == _pset(scratch)
    assert hashes.count() == 3
    # no surviving pair touches a tombstoned endpoint
    assert not any(2 in (a, b) or 5 in (a, b) for a, b, _ in _pset(merged))


def test_both_endpoints_tombstoned(spark):
    # pair (1,2) loses BOTH endpoints in one batch — each anti-join
    # alone would remove it; together they must not resurrect it
    base = _hashes(spark, [(1, H[1]), (2, H[2]), (4, H[4])])
    base_pairs = phash_neardup_pairs(base, max_hamming=3)
    tomb = spark.createDataFrame([(1,), (2,)], "media_id long")
    merged, _ = phash_index_apply(base_pairs, base, tombstone_ids=tomb)
    assert _pset(merged) == set()


def test_changefeed_batch_never_pairs_with_tombstoned(spark):
    # image 6 (== hash of 2) arrives while 2 tombstones: the merged
    # index must pair 6 with 1/3 but NOT with the departed 2
    base = _hashes(spark, [(1, H[1]), (2, H[2]), (4, H[4])])
    batch = _hashes(spark, [(6, H[6])])
    base_pairs = phash_neardup_pairs(base, max_hamming=3)
    tomb = spark.createDataFrame([(2,)], "media_id long")
    merged, _ = phash_index_apply(
        base_pairs, base, batch_hashes=batch, tombstone_ids=tomb
    )
    keep = base.join(tomb, "media_id", "left_anti").unionByName(batch)
    scratch = phash_neardup_pairs(keep, max_hamming=3)
    assert _pset(merged) == _pset(scratch)
    assert not any(2 in (a, b) for a, b, _ in _pset(merged))
    assert any(6 in (a, b) for a, b, _ in _pset(merged))


def test_empty_batch_and_empty_tombstones_are_identity(spark):
    base = _hashes(spark, [(1, H[1]), (2, H[2])])
    base_pairs = phash_neardup_pairs(base, max_hamming=3)
    merged, hashes = phash_index_apply(
        base_pairs,
        base,
        batch_hashes=_hashes(spark, []).filter(F.lit(False)),
        tombstone_ids=spark.createDataFrame([], "media_id long"),
    )
    assert _pset(merged) == _pset(base_pairs)
    assert hashes.count() == 2

"""Round-6 operator units: containment asymmetry, PNG media encoding
(all five scanline filters), and the k-means seed-rank fast path /
distributed fallback parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from files_kraken_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from files_kraken_spark.operators.multimodal import (
    attach_png,
    decode_png,
    image_dhash,
)
from files_kraken_spark.operators import similarity as SIM


def test_containment_catches_short_in_long(spark):
    """A short doc pasted into a long one: containment 1.0 from the
    short side even though Jaccard is far below any dedup threshold —
    the exact case the asymmetric operator exists for."""
    para = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, para), (2, filler + " " + para + " " + filler)],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"]): (r["cont_a"], r["cont_b"])
        for r in ngram_containment_pairs(
            df, "doc_id", "text", k=3, threshold=0.9
        ).collect()
    }
    assert (1, 2) in got
    cont_a, cont_b = got[(1, 2)]
    assert cont_a == 1.0  # every shingle of the short doc is in the long one
    assert cont_b < 0.2

    jac = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.8)
    assert jac.count() == 0  # Jaccard misses the same pair


def test_attach_png_cycles_all_filters_and_round_trips(spark):
    """media_id % 5 filter cycling must produce decodable PNGs for
    every filter type, and decode must reconstruct the exact payload
    bytes (losslessness is what the full-value oracle leans on)."""
    rows = [(i, f"{'abcdefghij'[i % 10]}" * 200) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    media = {r["media_id"]: bytes(r["data"]) for r in attach_png(
        df, "doc_id", "text").collect()}
    assert set(media) == {0, 1, 2, 3, 4}  # one per filter type
    for mid, png in media.items():
        arr = decode_png(png)
        assert arr.shape == (8, 16, 1)
        want = rows[mid][1].encode()[: 16 * 8]
        assert arr.reshape(-1).tobytes() == want


def test_attach_png_drops_short_payloads(spark):
    df = spark.createDataFrame([(1, "tiny"), (2, "x" * 200)], ["doc_id", "text"])
    out = attach_png(df, "doc_id", "text").select("media_id").collect()
    assert [r["media_id"] for r in out] == [2]


def test_png_dhash_matches_between_filter_types(spark):
    """Same pixels through different scanline filters must hash
    identically — media_id only selects the compression path."""
    text = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(i, text) for i in range(5)], ["doc_id", "text"]
    )
    hashes = {
        (r["dhash_hi"], r["dhash_lo"])
        for r in image_dhash(attach_png(df, "doc_id", "text")).collect()
    }
    assert len(hashes) == 1


def test_seed_rank_fast_path_matches_distributed_fallback(spark):
    """kmeans_fit_predict's O(k) collect-map rank (k <= threshold) and
    the k²-join fallback must assign identical cells."""
    rows = [
        (i, [float((i * 7 + d) % 13) for d in range(4)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def cells():
        out = SIM.kmeans_fit_predict(
            df, id_col="vec_id", vec_col="embedding", k=5, iters=2
        )
        return {r["vec_id"]: r["cell"] for r in out.collect()}

    fast = cells()
    orig = SIM.SEED_RANK_COLLECT_MAX
    try:
        SIM.SEED_RANK_COLLECT_MAX = 0  # force the k²-join fallback
        slow = cells()
    finally:
        SIM.SEED_RANK_COLLECT_MAX = orig
    assert fast == slow


def test_power_iteration_matches_numpy_eigvector(spark):
    """The integer power iteration must point (anti)parallel to the
    dominant eigenvector of X'X computed by numpy at float precision —
    quantization at scale 1e4 costs < 1e-3 in cosine."""
    import numpy as np

    # strong rank-1 component (coef * base) + small lattice noise — a
    # clear eigengap so 8 iterations converge well past the tolerance
    base = [1.0, -0.5, 0.25, 0.8, -0.3, 0.6, -0.7, 0.4]
    rng_rows = [
        (
            i,
            [
                (((i % 7) - 3) / 3.0) * base[d]
                + float(((i * 13 + d * 7) % 23) - 11) / 110.0
                for d in range(8)
            ],
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rng_rows, ["vec_id", "embedding"])
    out = SIM.power_iteration_top_pc(
        df, id_col="vec_id", vec_col="embedding", iters=5, scale=10000
    ).collect()
    v = np.zeros(8)
    for r in out:
        v[r["dim"]] = r["vq"]
    v = v / np.linalg.norm(v)

    X = np.array([row[1] for row in rng_rows])
    eigval, eigvec = np.linalg.eigh(X.T @ X)
    top = eigvec[:, -1]
    assert abs(abs(float(v @ top)) - 1.0) < 1e-3

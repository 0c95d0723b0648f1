"""Invariant pins for the round-10 incremental ANN maintenance
operators (queries/ann_maintenance.py carries the oracle evidence;
these pin the operator-level contracts that make maintenance safe)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pq_encode_frozen_reproduces_trainer_codes(spark):
    """Code parity invariant: encoding the TRAINING corpus against the
    returned codebook reproduces the trainer's own codes exactly —
    the property that lets ADC tables built at train time keep scoring
    incrementally-encoded batches."""
    from files_kraken_spark.operators.similarity import (
        pq_encode_frozen,
        pq_train_encode,
    )
    from files_kraken_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    codes, cb = pq_train_encode(emb, m=4, ksub=8, iters=2, dim=64)
    re_enc = pq_encode_frozen(emb, cb, m=4, dim=64)
    a = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in re_enc.collect()}
    assert a == b and len(a) > 0


def test_assign_to_centroids_ties_and_argmin(spark):
    """Frozen-centroid assignment is the exact argmin with ties to the
    lower cell — checked against a hand-built centroid frame."""
    from files_kraken_spark.operators.similarity import assign_to_centroids

    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])],
        ["cell", "centroid"],
    )
    vecs = spark.createDataFrame(
        [
            (10, [0.1, 0.0]),   # nearest cell 0
            (11, [1.9, 0.0]),   # nearest cell 1
            (12, [0.5, 0.0]),   # equidistant from 0 and 2 -> lower cell 0
            (13, [1.5, 0.0]),   # equidistant from 1 and 2 -> lower cell 1
        ],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: r["cell"] for r in assign_to_centroids(vecs, cents).collect()}
    assert got == {10: 0, 11: 1, 12: 0, 13: 1}


def test_tombstones_revoke_candidacy_only(spark):
    """Soft-deleted ids never appear as candidates, but a deleted id
    can still be a probe; undeleted serving is unchanged when the
    tombstone set is empty."""
    from files_kraken_spark.operators.similarity import ivf_merged_topk
    from files_kraken_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 10 < 8)
    new = emb.filter(F.col("vec_id") % 10 >= 8)
    q = emb.filter(F.col("vec_id") < 8).select("vec_id")
    dead_ids = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % 17 == 0).select("vec_id").collect()
    }
    dead = emb.filter(F.col("vec_id") % 17 == 0).select("vec_id")

    with_dead = ivf_merged_topk(base, new, q, k=8, iters=2, topk=5,
                                tombstones=dead)
    rows = with_dead.collect()
    assert rows and not any(r["cand_id"] in dead_ids for r in rows)
    assert 0 in {r["q_id"] for r in rows}  # vec_id 0 is deleted, still probes

    empty = dead.filter(F.lit(False))
    a = {(r["q_id"], r["cand_id"]) for r in
         ivf_merged_topk(base, new, q, k=8, iters=2, topk=5,
                         tombstones=empty).collect()}
    b = {(r["q_id"], r["cand_id"]) for r in
         ivf_merged_topk(base, new, q, k=8, iters=2, topk=5).collect()}
    assert a == b


def test_merged_topk_overlapping_ids_upsert_new_wins(spark):
    """Round-10 ADVICE: an id present in BOTH base and new must not
    duplicate candidate rows — the merge is an upsert where the new
    batch's vector wins. Re-ingest one base id with a different
    embedding and check (a) no query sees it twice, (b) its serving
    position follows the NEW vector."""
    from files_kraken_spark.operators.similarity import ivf_merged_topk
    from files_kraken_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 10 < 8)
    reingest_id = base.select(F.min("vec_id")).first()[0]
    # new batch = held-out split PLUS a re-ingest of reingest_id whose
    # vector is replaced by another base row's vector (id 'donor')
    donor = base.select(F.max("vec_id")).first()[0]
    replaced = (
        emb.filter(F.col("vec_id") == donor)
        .select(F.lit(reingest_id).cast("long").alias("vec_id"), "embedding")
    )
    new = emb.filter(F.col("vec_id") % 10 >= 8).select(
        "vec_id", "embedding"
    ).unionByName(replaced)
    q = emb.filter(F.col("vec_id") < 8).select("vec_id")

    res = ivf_merged_topk(base, new, q, k=8, iters=2, topk=5)
    rows = res.collect()
    assert rows
    # (a) no (q_id, cand_id) pair appears twice
    pairs = [(r["q_id"], r["cand_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    # (b) the upserted id serves with the donor's vector: wherever the
    # donor ranks for a query, the re-ingested id (same vector, lower
    # id tiebreak) must rank identically or adjacent — concretely, any
    # query listing the donor in its top-k must list reingest_id too
    # at least as high (identical cos, lower id wins the tiebreak).
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r["cand_id"])
    for q_id, cands in by_q.items():
        if donor in cands and q_id != reingest_id:
            assert reingest_id in cands
            assert cands.index(reingest_id) < cands.index(donor)

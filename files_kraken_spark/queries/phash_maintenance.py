"""Incremental MULTIMODAL near-dup index maintenance (round 12) —
the pHash leg of the maintain-vs-retrain story, completing the
symmetry: every near-dup family now has a maintenance contract
(text MinHash ``dedup_incremental``, embeddings
``sem_dedup_incremental`` + ``queries/ann_maintenance``, BM25
``queries/index_maintenance``, graph ``queries/graph_maintenance``,
curation ``t_curation_*`` — and now perceptual-hash image pairs).

- ``mm_phash_incremental`` — merge an image batch into a persisted
  pHash pair index: ONLY batch images run the expensive decode+DCT
  (mapInPandas), candidates come from batch×base and batch×batch
  band joins (base×base pairs are carried verbatim — every new pair
  has a batch endpoint), and the merged index must equal the
  from-scratch ``mm_phash_neardup`` on the full corpus.
- ``mm_phash_decremental`` — tombstoned images retract: pair
  membership is a pure function of the two endpoint hashes, so the
  merge is two broadcast endpoint anti-joins — no re-hash, no
  re-verify; oracle = from-scratch pairs over the survivors.
- ``mm_phash_changefeed`` — appends + tombstones in ONE batch
  through the shared core (``operators/multimodal.phash_index_apply``;
  batch candidates probe the SURVIVING base, so a batch image never
  pairs with a concurrently tombstoned one).

Split is pure integer modulo on the id, identical on both engines:
base ``doc_id % 10 < 8``, batch = rest, tombstones ``doc_id % 40 = 2``
(⊂ base). Hashes/pairs are set-valued integer data (the DCT runs in
exact int64 fixed-point), so merged-equals-retrained is
bit-identical and the DuckDB oracle replays decode → DCT →
threshold → banding → verify with integer arithmetic only
(``llm_ops._phash_ctes`` — one transform source for all pHash
queries).

Scale shape at 100 TB: the stored index is the (band, key) postings
table plus the verified pairs; an append batch costs |batch| decodes
+ one postings probe bounded by batch bands; a retraction costs two
broadcast anti-joins. A retrain re-decodes the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_binary,
    image_phash_dct,
    phash_index_apply,
    phash_neardup_pairs,
)
from ..sources.tables import load_table
from . import register
from .llm_ops import _phash_ctes


def _pairs_sql(where: str = "") -> str:
    """From-scratch banded pHash near-dup pairs over an optionally
    restricted corpus — the retrain target every merge must hit."""
    return (
        "WITH "
        + _phash_ctes()
        + f""",
bands AS (
  SELECT media_id, phash, b.band,
         (phash >> (b.band * 8)) & 255 AS key
  FROM ph, range(0, 4) b(band)
  {where}
)
SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""
    )


def _media(spark: SparkSession, sf_dir: str, pred=None) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 128)
    if pred is not None:
        docs = docs.filter(pred)
    pgm = docs.select(
        "doc_id",
        F.concat(F.lit("P5\n16 8\n255\n"), F.substring("text", 1, 128)).alias(
            "payload"
        ),
    )
    return attach_binary(pgm, "doc_id", "payload", "image")


def _tomb_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tombstone batch — one definition for the three legs that
    retract (decremental / changefeed / serve), so the predicate can
    never silently desynchronize between a query and its oracle."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("n_chars") >= 128) & (F.col("doc_id") % 40 == 2))
        .select(F.col("doc_id").alias("media_id"))
    )


def _batch_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The append batch's hashes (doc_id%10>=8), decoded+DCT'd once
    per call — shared by the three legs that append."""
    return image_phash_dct(
        _media(spark, sf_dir, ~(F.col("doc_id") % 10 < 8))
    )


def _base_state(spark: SparkSession, sf_dir: str):
    """Persisted-state shape: base hashes + verified base pairs."""
    base_h = image_phash_dct(_media(spark, sf_dir, F.col("doc_id") % 10 < 8))
    return base_h, phash_neardup_pairs(base_h, max_hamming=3)


@register(
    "mm_phash_incremental",
    oracle=_pairs_sql(),
    doc="Incremental pHash near-dup INDEX maintenance, append leg: "
    "the base corpus's hashes and verified pairs are the persisted "
    "state; the image batch (doc_id%10>=8) alone runs the "
    "decode+exact-integer-DCT mapInPandas pass, its band keys probe "
    "the stored postings (batch×base) and each other (batch×batch), "
    "and the carried base pairs union in verbatim — the three pair "
    "sets are disjoint by batch-endpoint count, so no dedup. Oracle "
    "= the from-scratch banded build on the full corpus "
    "(mm_phash_neardup's own SQL), so the hash-compare IS the "
    "merged-equals-retrained proof. Scale shape: decode cost "
    "O(|batch|), candidate cost bounded by batch band buckets — a "
    "retrain re-decodes the lake. The multimodal sibling of "
    "dedup_incremental / t_index_incremental_bm25.",
)
def mm_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    base_h, base_pairs = _base_state(spark, sf_dir)
    batch_h = _batch_hashes(spark, sf_dir)
    pairs, _ = phash_index_apply(base_pairs, base_h, batch_hashes=batch_h)
    return pairs


@register(
    "mm_phash_decremental",
    oracle=_pairs_sql("WHERE media_id % 10 < 8 AND media_id % 40 <> 2"),
    doc="Decremental pHash index maintenance — the retraction leg: "
    "images with doc_id%40=2 tombstone out of the base index. A "
    "pair exists iff its two endpoint hashes band-collide and pass "
    "the Hamming verify — a pure function of the endpoints — so a "
    "retraction can only REMOVE pairs it participates in: the merge "
    "is two broadcast anti-joins on the pair endpoints plus "
    "dropping the hash rows, no re-hash or re-verify anywhere "
    "(contrast BM25, where retraction is counter subtraction, and "
    "CC, where it forces a component-local rebuild — pair indexes "
    "are the easy point of the retraction spectrum, and saying so "
    "is the point). Oracle = the from-scratch build over survivors.",
)
def mm_phash_decremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    base_h, base_pairs = _base_state(spark, sf_dir)
    tomb = _tomb_ids(spark, sf_dir)
    pairs, _ = phash_index_apply(base_pairs, base_h, tombstone_ids=tomb)
    return pairs


@register(
    "mm_phash_changefeed",
    oracle=_pairs_sql("WHERE media_id % 40 <> 2"),
    doc="Mixed-changefeed pHash index maintenance: one batch carrying "
    "both the image appends (doc_id%10>=8) and the tombstones "
    "(doc_id%40=2), applied through the shared merge core — "
    "retractions land first, so the batch's band probe runs against "
    "the SURVIVING base and a new image never pairs with a "
    "concurrently deleted one. Oracle = the from-scratch build over "
    "everything except tombstoned images. The multimodal sibling of "
    "g_pagerank_changefeed / t_index_changefeed_bm25 / "
    "v_ivm_changefeed.",
)
def mm_phash_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    base_h, base_pairs = _base_state(spark, sf_dir)
    batch_h = _batch_hashes(spark, sf_dir)
    tomb = _tomb_ids(spark, sf_dir)
    pairs, _ = phash_index_apply(
        base_pairs, base_h, batch_hashes=batch_h, tombstone_ids=tomb
    )
    return pairs


@register(
    "mm_phash_serve_merged",
    oracle=_pairs_sql("WHERE media_id % 40 <> 2"),
    doc="SERVE-ONLY pHash index maintenance (round-13: the last "
    "maintained family to get the _serve_state split, completing it "
    "for ALL of them — PageRank/CC/LP/k-core, BM25, IVM, and now "
    "pHash): the base hashes and verified pairs are persisted ONCE "
    "per session to scratch parquet — the postings/pair store a "
    "deployment already holds — and the query reads them and applies "
    "only the mixed batch (tombstone anti-joins + batch decode + "
    "band probes), so repeated runs measure the per-batch merge, "
    "where mm_phash_changefeed's wall is dominated by re-decoding "
    "and re-pairing the base corpus it then maintains. Same oracle "
    "as the end-to-end changefeed — only the measurement boundary "
    "moved. Scale: at 100 TB the decode cost is O(|batch|) and the "
    "probe is bounded by batch band buckets; the base never re-hashes.",
)
def mm_phash_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        base_h, base_pairs = _base_state(spark, sf_dir)
        return {"hashes": base_h, "pairs": base_pairs}

    state = serve_state(spark, sf_dir, "phash", _build)
    batch_h = _batch_hashes(spark, sf_dir)
    tomb = _tomb_ids(spark, sf_dir)
    pairs, _ = phash_index_apply(
        state["pairs"], state["hashes"], batch_hashes=batch_h, tombstone_ids=tomb
    )
    return pairs

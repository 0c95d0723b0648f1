"""Inverted-index building blocks and the MAINTAIN path for a text
search index — the BM25 leg of the maintain-vs-retrain story next to
incremental dedup (operators/dedup.py), incremental ANN
(operators/similarity.py) and incremental PageRank/CC
(operators/graph.py).

The state a BM25 index serves from decomposes into three frames, all
of which merge EXACTLY under an append-only document batch:

- **per-doc stats** ``(doc_id, dl, tf_1..tf_k)`` — append-only: a new
  doc's row never changes an old doc's row, so merge = union.
- **global stats** ``(n, sdl, df_1..df_k)`` — additive counters, so
  merge = element-wise sum of the base row and the batch row.
- **full-vocab document frequencies** ``(term, df)`` — additive per
  term, so merge = full-outer join + coalesced sum (new terms appear
  with df_base = 0).

Because every component merges exactly and the BM25 score is a
fixed-order rational expression of them (see :func:`bm25_score_col` —
the log-free idf shared with ``t_bm25_topk``), the merged index is
bit-identical to a from-scratch rebuild: the driver's hash-compare of
``t_index_incremental_bm25`` against the from-scratch oracle IS the
merged-equals-retrained proof.

Scale shape: the batch pass scans ONLY the batch documents; the state
merge is one union (no shuffle — per-doc rows are already disjoint),
one 2-row aggregate, and for the vocab frame one (term)-keyed
outer-join shuffle proportional to |batch vocabulary| after AQE
broadcasts the smaller side. A retrain rescans the full corpus.

Reference parity note: the reference engine has no search index; this
module is part of the beyond-reference training-data-pipeline surface
(SURVEY §6), composed with the ranking contract of
``queries/llm_ops.t_bm25_topk``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def doc_term_stats(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document stats for a fixed query-term set: ``(id, dl,
    tf_1..tf_k)``.

    Token filter per term — no explode, no shuffle: a map-only pass
    that whole-stage codegen fuses with the scan. This frame is the
    append-only half of the index state.
    """
    toks = tokens(F.col(text_col))

    def tf_of(term: str) -> Column:
        # NB: a two-arg lambda would be bound as (element, index) by
        # the HOF API — filter with a closure over `term` instead.
        return F.size(F.filter(toks, lambda x: x == term))

    return docs.select(
        id_col,
        F.size(toks).alias("dl"),
        *[tf_of(t).alias(f"tf{i}") for i, t in enumerate(terms, 1)],
    )


def index_stats(m: DataFrame, n_terms: int) -> DataFrame:
    """Global index stats over a per-doc frame: one row ``(n, sdl,
    df_1..df_k)``. Additive counters — the mergeable half of the
    index state (partial-aggregated map-side, one tiny shuffle)."""
    return m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(1, n_terms + 1)
        ],
    )


def merge_index_stats(base_g: DataFrame, new_g: DataFrame, n_terms: int) -> DataFrame:
    """Merge two global-stats rows by summation — the O(1)-state
    index maintenance step. Exact: every field is an additive BIGINT
    counter, so merged == retrained with no float involved."""
    both = base_g.unionByName(new_g)
    return both.agg(
        F.sum("n").alias("n"),
        F.sum("sdl").alias("sdl"),
        *[F.sum(f"df{i}").alias(f"df{i}") for i in range(1, n_terms + 1)],
    )


def retract_index_stats(
    full_g: DataFrame, retracted_g: DataFrame, n_terms: int
) -> DataFrame:
    """Retract a document batch from the global index counters by
    SUBTRACTION — the tombstone half of the index state merge
    (:func:`merge_index_stats` is the append half). Exact for the
    same reason the append is: every field is an additive BIGINT
    counter, so full - batch == rebuilt-on-survivors, bit for bit.
    The per-doc half of a retraction is an anti-join (rows are
    independent); empty-batch aggregates contribute NULLs, which
    coalesce to 0 rather than poisoning the difference."""
    f = full_g.select(
        F.col("n").alias("__fn"),
        F.col("sdl").alias("__fsdl"),
        *[F.col(f"df{i}").alias(f"__fdf{i}") for i in range(1, n_terms + 1)],
    )
    r = retracted_g.select(
        F.col("n").alias("__rn"),
        F.col("sdl").alias("__rsdl"),
        *[F.col(f"df{i}").alias(f"__rdf{i}") for i in range(1, n_terms + 1)],
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    return f.crossJoin(r).select(
        (z("__fn") - z("__rn")).cast("long").alias("n"),
        (z("__fsdl") - z("__rsdl")).cast("long").alias("sdl"),
        *[
            (z(f"__fdf{i}") - z(f"__rdf{i}")).cast("long").alias(f"df{i}")
            for i in range(1, n_terms + 1)
        ],
    )


def bm25_score_col(n_terms: int, k1: float = 1.2, b: float = 0.75) -> Column:
    """The BM25 scoring expression over a per-doc × global-stats row:
    log-free rational idf ``(N - df + 0.5) / (df + 0.5)`` (rank-
    equivalent to the ln form per term; libm ln is not bit-portable)
    times the k1/b saturation term, summed over terms IN FIXED ORDER —
    no float aggregation-order dependence, so both engines emit
    identical doubles (shared with ``t_bm25_topk``)."""
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    avg_dl = d("sdl") / d("n")
    score = None
    for i in range(1, n_terms + 1):
        idf = (d("n") - d(f"df{i}") + F.lit(0.5)) / (d(f"df{i}") + F.lit(0.5))
        sat = (
            d(f"tf{i}") * F.lit(k1 + 1.0)
            / (d(f"tf{i}") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (d("dl") / avg_dl)))
        )
        part = idf * sat
        score = part if score is None else score + part
    return score


def bm25_scores(m: DataFrame, g: DataFrame, n_terms: int, id_col: str = "doc_id") -> DataFrame:
    """Score every document against the fixed-term query: per-doc
    frame × ONE broadcast global-stats row → ``(id, bm25)`` rounded at
    1e-6. Map-only past the broadcast; no per-doc shuffle."""
    return m.crossJoin(F.broadcast(g)).select(
        id_col, F.round(bm25_score_col(n_terms), 6).alias("bm25")
    )


def vocab_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Full-vocabulary document frequencies ``(term, df)``: explode
    DISTINCT tokens per doc (array_distinct before the explode keeps
    the shuffle at one row per (doc, term), not per occurrence), then
    one (term)-keyed count with map-side partial aggregation."""
    return (
        docs.select(
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )


def merge_vocab_df(base: DataFrame, new: DataFrame) -> DataFrame:
    """Merge two ``(term, df)`` frames: full-outer join on term,
    coalesced sum. New terms surface with base df 0; counts are
    additive so the merge is exact. AQE broadcasts the (small) batch
    vocabulary against the base index at scale."""
    b = base.select("term", F.col("df").alias("__df_base"))
    n = new.select("term", F.col("df").alias("__df_new"))
    return b.join(n, "term", "full_outer").select(
        "term",
        (
            F.coalesce(F.col("__df_base"), F.lit(0))
            + F.coalesce(F.col("__df_new"), F.lit(0))
        ).cast("long").alias("df"),
        F.coalesce(F.col("__df_base"), F.lit(0)).cast("long").alias("df_base"),
        F.coalesce(F.col("__df_new"), F.lit(0)).cast("long").alias("df_new"),
    )

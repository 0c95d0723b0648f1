"""Incremental TEXT-INDEX maintenance queries (round 11) — the BM25
leg of the maintain-vs-retrain story, next to incremental dedup
(``dedup_incremental``), incremental ANN (``queries/ann_maintenance``),
incremental curation (``t_curation_incremental``) and incremental
graph analytics (``queries/graph_maintenance``):

- ``t_index_incremental_bm25`` — merge a document batch into a
  persisted BM25 index (append the per-doc stats, SUM the global
  counters) and serve the top-10; the oracle is the FROM-SCRATCH
  rebuild on the full corpus (``llm_ops._bm25_sql`` — the exact SQL
  behind the long-green ``t_bm25_topk``), so the driver hash-compare
  IS the merged-equals-retrained proof.
- ``t_index_rank_shift`` — the serving-impact audit: how the top-10
  changes between the base index and the merged index (entered /
  exited / stayed / new_doc), both rankings scale-safe.
- ``t_index_df_drift`` — full-vocabulary document-frequency drift
  between base and merged index: the retrain-trigger monitor (the
  text-index analogue of ``emb_batch_drift``).
- ``t_index_delta_cost`` — the maintenance cost model as data: how
  many vocabulary terms / postings the batch actually touches vs the
  index total (the analogue of ``g_pagerank_delta_frontier``).

Split is pure integer modulo (``doc_id % 10 < 8`` = base corpus, the
rest = the arriving batch) — identical on both engines, stable under
partitioning. BM25 scores are the fixed-order log-free rational
expression both engines evaluate bit-identically
(``operators/text_index.bm25_score_col``); every count is BIGINT;
drift is two correctly-rounded IEEE divisions and one subtraction in
fixed shape.

Scale shape: the batch pass scans ONLY batch documents; the state
merge is a shuffle-free union (per-doc rows are disjoint), a 2-row
sum, and one (term)-keyed outer join bounded by |batch vocabulary|
(AQE broadcasts the small side). A retrain rescans the full corpus —
the gap ``t_index_delta_cost`` quantifies.

Reference parity note: the reference engine (files-kraken) has no
search index; this family is part of the beyond-reference
training-data-pipeline surface (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text_index as TI
from ..operators.ranks import global_row_number
from ..sources.tables import load_table
from . import register
from ._sql_fragments import SQL_TOKENS as _SQL_TOKENS
from .llm_ops import _bm25_ctes, _bm25_sql

_TERMS = ("spark", "table", "window")
_BASE_WHERE = " WHERE doc_id % 10 < 8"

# Full-vocab (doc, term) postings under the split — DISTINCT tokens
# per doc (df semantics), shared by the drift and cost oracles.
_SQL_VOCAB = f"""tok AS (
  SELECT doc_id, unnest(list_distinct({_SQL_TOKENS.format(col='text')})) AS term
  FROM documents
),
b AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df_base
  FROM tok WHERE doc_id % 10 < 8 GROUP BY term
),
u AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df_merged
  FROM tok GROUP BY term
),
mv AS (
  SELECT u.term, u.df_merged, coalesce(b.df_base, 0) AS df_base,
         u.df_merged - coalesce(b.df_base, 0) AS df_new
  FROM u LEFT JOIN b USING (term)
)"""


def _split(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 < 8)
    batch = docs.filter(~(F.col("doc_id") % 10 < 8))
    return base, batch


def _merged_index(spark: SparkSession, sf_dir: str):
    """(m_merged, g_merged) built through the MAINTAIN path: per-doc
    stats appended, global counters summed — never a full-corpus
    rescan of the base side."""
    base, batch = _split(spark, sf_dir)
    m_b = TI.doc_term_stats(base, _TERMS)
    m_n = TI.doc_term_stats(batch, _TERMS)
    g_b = TI.index_stats(m_b, len(_TERMS))
    g_n = TI.index_stats(m_n, len(_TERMS))
    return (
        m_b.unionByName(m_n),
        TI.merge_index_stats(g_b, g_n, len(_TERMS)),
        m_b,
        g_b,
    )


@register(
    "t_index_incremental_bm25",
    oracle=_bm25_sql(_TERMS),
    doc="Incremental BM25 index maintenance: the base corpus "
    "(doc_id%10<8) is indexed once — per-doc (dl, tf) rows plus one "
    "(n, sdl, df) counter row, the persisted state; the batch then "
    "merges by APPENDING its per-doc rows (shuffle-free union — rows "
    "are disjoint) and SUMMING the counter rows (a 2-row aggregate), "
    "and the merged index serves the top-10. The oracle is the "
    "FROM-SCRATCH rebuild on the full corpus — t_bm25_topk's exact "
    "registered SQL, one source of truth for the formula — so the "
    "hash-compare is the merged-equals-retrained proof: exact because "
    "every index component is an additive BIGINT counter and the "
    "score is the fixed-order log-free rational expression "
    "(operators/text_index.bm25_score_col). Scale shape: only batch "
    "documents are scanned; at 100 TB the base index state is read, "
    "never rebuilt.",
)
def t_index_incremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    m_u, g_u, _, _ = _merged_index(spark, sf_dir)
    return (
        TI.bm25_scores(m_u, g_u, len(_TERMS))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(10)
    )


@register(
    "t_index_rank_shift",
    oracle=f"""
WITH {_bm25_ctes(_TERMS, where=_BASE_WHERE, p="b")},
{_bm25_ctes(_TERMS, p="u")},
br AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
           AS rank_base
  FROM bs
),
ur AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
           AS rank_merged
  FROM us
)
SELECT coalesce(br.doc_id, ur.doc_id) AS doc_id,
       br.rank_base, ur.rank_merged,
       CASE WHEN br.rank_base IS NULL THEN 'new_doc'
            WHEN br.rank_base <= 10 AND ur.rank_merged <= 10 THEN 'stayed'
            WHEN ur.rank_merged <= 10 THEN 'entered'
            ELSE 'exited' END AS status
FROM br FULL JOIN ur ON ur.doc_id = br.doc_id
WHERE br.rank_base <= 10 OR ur.rank_merged <= 10
""",
    doc="Serving-impact audit of an index merge: the top-10 under the "
    "BASE index (base docs, base stats) full-outer-joined to the "
    "top-10 under the MERGED index — per doc its rank on each side "
    "and a status (stayed / entered / exited / new_doc). A batch "
    "shifts ranks two ways: new docs compete directly, and the new "
    "df/avgdl statistics re-weight OLD docs' scores — this query "
    "shows both, and at 100 TB it is the canary an operator reads "
    "before swapping the serving index. Both global rankings use the "
    "distributed two-phase row number (operators/ranks.py — no "
    "unpartitioned window, no single-task sort); ranks compare on the "
    "rounded score with doc_id tiebreak, so ordering is total and "
    "engine-identical.",
)
def t_index_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    m_u, g_u, m_b, g_b = _merged_index(spark, sf_dir)
    s_b = TI.bm25_scores(m_b, g_b, len(_TERMS))
    s_u = TI.bm25_scores(m_u, g_u, len(_TERMS))
    rb = global_row_number(
        s_b, [F.col("bm25").desc(), F.col("doc_id")], "rank_base"
    ).select("doc_id", "rank_base")
    ru = global_row_number(
        s_u, [F.col("bm25").desc(), F.col("doc_id")], "rank_merged"
    ).select("doc_id", "rank_merged")
    status = (
        F.when(F.col("rank_base").isNull(), F.lit("new_doc"))
        .when(
            (F.col("rank_base") <= 10) & (F.col("rank_merged") <= 10),
            F.lit("stayed"),
        )
        .when(F.col("rank_merged") <= 10, F.lit("entered"))
        .otherwise(F.lit("exited"))
    )
    return (
        rb.join(ru, "doc_id", "full_outer")
        .filter((F.col("rank_base") <= 10) | (F.col("rank_merged") <= 10))
        .select("doc_id", "rank_base", "rank_merged", status.alias("status"))
    )


@register(
    "t_index_df_drift",
    oracle=f"""
WITH {_SQL_VOCAB},
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS nu,
         CAST(sum(CASE WHEN doc_id % 10 < 8 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM documents
)
SELECT term, df_base, df_merged, df_new,
       round(CAST(df_merged AS DOUBLE) / CAST(nn.nu AS DOUBLE)
             - CAST(df_base AS DOUBLE) / CAST(nn.nb AS DOUBLE), 6) AS drift
FROM mv, nn
WHERE df_merged >= 5
ORDER BY abs(drift) DESC, term
LIMIT 20
""",
    doc="Document-frequency drift monitor over the FULL vocabulary: "
    "per term, its df share in the base index vs the merged index; "
    "top-20 movers by |share delta| (min merged df 5). The text-index "
    "retrain trigger next to emb_batch_drift: idf is the only BM25 "
    "component a batch changes for UNSEEN queries, so a term whose "
    "prevalence shifts hard means cached/approximated scores built on "
    "the old statistics are stale. Exact BIGINT dfs from one "
    "distinct-tokens explode per side (array_distinct BEFORE the "
    "explode — one shuffle row per (doc, term), not per occurrence); "
    "drift is two correctly-rounded IEEE divisions and one "
    "subtraction in fixed shape, rounded at 1e-6, ordered with a term "
    "tiebreak — engine-identical. The top-20 is a sort-limit "
    "(TakeOrdered), never a full sort.",
)
def t_index_df_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, batch = _split(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    merged = TI.merge_vocab_df(TI.vocab_df(base), TI.vocab_df(batch))
    nn = docs.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum(F.when(F.col("doc_id") % 10 < 8, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    drift = F.round(
        F.col("df").cast("double") / F.col("nu").cast("double")
        - F.col("df_base").cast("double") / F.col("nb").cast("double"),
        6,
    )
    return (
        merged.crossJoin(F.broadcast(nn))
        .filter(F.col("df") >= 5)
        .select(
            "term",
            "df_base",
            F.col("df").alias("df_merged"),
            "df_new",
            drift.alias("drift"),
        )
        .orderBy(F.abs(F.col("drift")).desc(), "term")
        .limit(20)
    )


@register(
    "t_index_delta_cost",
    oracle=f"""
WITH {_SQL_VOCAB}
SELECT CAST(count(*) AS BIGINT) AS n_terms_union,
       CAST(sum(CASE WHEN df_new > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_terms_touched,
       CAST(sum(CASE WHEN df_base = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_terms_new,
       CAST(sum(df_merged) AS BIGINT) AS n_postings_union,
       CAST(sum(df_new) AS BIGINT) AS n_postings_appended,
       CAST((sum(CASE WHEN df_new > 0 THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS touched_ppm
FROM mv
""",
    doc="The index-maintenance cost model as data (the text analogue "
    "of g_pagerank_delta_frontier): how much of the vocabulary the "
    "batch actually touches — terms touched / minted vs the union "
    "vocabulary, postings appended vs the index total, and the "
    "touched share in exact ppm (BIGINT multiply + truncating DIV — "
    "no float). Everything OUTSIDE the touched term set serves "
    "unchanged from the stored index; at 100 TB this one row is the "
    "number an operator watches to decide when accumulated batches "
    "justify a full rebuild (e.g. for index-order re-sorting or "
    "compression resets). One distinct-tokens explode per side, one "
    "(term)-keyed outer join, a single-row rollup.",
)
def t_index_delta_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, batch = _split(spark, sf_dir)
    merged = TI.merge_vocab_df(TI.vocab_df(base), TI.vocab_df(batch))
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_union"),
        F.sum(F.when(F.col("df_new") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_terms_touched"),
        F.sum(F.when(F.col("df_base") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_terms_new"),
        F.sum("df").cast("long").alias("n_postings_union"),
        F.sum("df_new").cast("long").alias("n_postings_appended"),
    ).select(
        "n_terms_union",
        "n_terms_touched",
        "n_terms_new",
        "n_postings_union",
        "n_postings_appended",
        F.expr(
            "CAST((n_terms_touched * 1000000) DIV n_terms_union AS BIGINT)"
        ).alias("touched_ppm"),
    )


@register(
    "t_index_decremental_bm25",
    oracle=f"""
WITH {_bm25_ctes(_TERMS, where=_BASE_WHERE)}
SELECT doc_id, bm25
FROM s
ORDER BY bm25 DESC, doc_id
LIMIT 10
""",
    doc="Tombstone BM25 index maintenance — the retraction half that "
    "completes the index's append contract (and the text sibling of "
    "g_pagerank_decremental / g_cc_decremental): the FULL corpus is "
    "indexed once; the late docs (doc_id%10>=8) are then RETRACTED by "
    "anti-joining their per-doc rows out and SUBTRACTING their counter "
    "row from the global stats (operators/text_index."
    "retract_index_stats — exact, every field an additive BIGINT "
    "counter), and the shrunken index serves the top-10. Oracle = "
    "from-scratch rebuild on the surviving docs via the shared "
    "_bm25_ctes (one formula source), so the hash-compare is the "
    "tombstoned-equals-rebuilt proof. Scale shape: the retraction "
    "touches the batch rows and one 2-row counter subtraction — the "
    "surviving corpus is never rescanned.",
)
def t_index_decremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m_full = TI.doc_term_stats(docs, _TERMS)
    g_full = TI.index_stats(m_full, len(_TERMS))
    retracted = docs.filter(~(F.col("doc_id") % 10 < 8)).select("doc_id")
    m_re = TI.doc_term_stats(
        docs.filter(~(F.col("doc_id") % 10 < 8)), _TERMS
    )
    g_re = TI.index_stats(m_re, len(_TERMS))
    m_post = m_full.join(retracted, "doc_id", "left_anti")
    g_post = TI.retract_index_stats(g_full, g_re, len(_TERMS))
    return (
        TI.bm25_scores(m_post, g_post, len(_TERMS))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(10)
    )


@register(
    "t_index_changefeed_bm25",
    oracle=f"""
WITH {_bm25_ctes(_TERMS, where=" WHERE doc_id % 10 <> 8")}
SELECT doc_id, bm25
FROM s
ORDER BY bm25 DESC, doc_id
LIMIT 10
""",
    doc="MIXED-changefeed BM25 index maintenance — the text sibling "
    "of g_pagerank_changefeed / g_cc_changefeed: the class 0-8 corpus "
    "is indexed as the base state; one batch then RETRACTS the "
    "class-8 docs (per-doc anti-join + counter subtraction) and ADDS "
    "the class-9 docs (per-doc append + counter sum) — both counter "
    "updates compose into the same exact BIGINT algebra, applied in "
    "one pass here (base + added - retracted). Oracle = from-scratch "
    "rebuild on the post-change corpus (classes 0-7 and 9) via the "
    "shared _bm25_ctes. Scale shape: both batch scans are "
    "batch-sized; the surviving corpus is never rescanned.",
)
def t_index_changefeed_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cls = F.col("doc_id") % 10
    base = docs.filter(cls != 9)
    added = docs.filter(cls == 9)
    retracted = docs.filter(cls == 8)

    m_b = TI.doc_term_stats(base, _TERMS)
    g_b = TI.index_stats(m_b, len(_TERMS))
    m_a = TI.doc_term_stats(added, _TERMS)
    g_a = TI.index_stats(m_a, len(_TERMS))
    m_r = TI.doc_term_stats(retracted, _TERMS)
    g_r = TI.index_stats(m_r, len(_TERMS))

    m_post = m_b.join(
        retracted.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(m_a)
    g_post = TI.retract_index_stats(
        TI.merge_index_stats(g_b, g_a, len(_TERMS)), g_r, len(_TERMS)
    )
    return (
        TI.bm25_scores(m_post, g_post, len(_TERMS))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(10)
    )


@register(
    "t_index_serve_merged",
    oracle=_bm25_sql(_TERMS),
    doc="SERVE-ONLY incremental BM25 (round-12 verdict item 2): the "
    "base corpus's per-doc (dl, tf) rows and its (n, sdl, df) counter "
    "row are persisted ONCE per session to scratch parquet — the "
    "stored index — and the query scans ONLY the arriving batch for "
    "its stats, appends (shuffle-free union), sums the two counter "
    "rows, and serves the top-10. Repeated runs therefore measure "
    "the per-batch serve cost a deployment pays — batch scan + "
    "|batch-vocab|-bounded merge + scoring — where "
    "t_index_incremental_bm25 re-scans the 80% base corpus each run "
    "to rebuild the state it then merges. Same oracle (from-scratch "
    "rebuild on the full corpus via the shared _bm25_sql), same "
    "additive-BIGINT exactness — only the measurement boundary "
    "moved.",
)
def t_index_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        base, _ = _split(spark, sf_dir)
        m_b = TI.doc_term_stats(base, _TERMS)
        return {"m_base": m_b, "g_base": TI.index_stats(m_b, len(_TERMS))}

    st = serve_state(spark, sf_dir, "bm25", _build)
    _, batch = _split(spark, sf_dir)
    m_n = TI.doc_term_stats(batch, _TERMS)
    g_n = TI.index_stats(m_n, len(_TERMS))
    m_u = st["m_base"].unionByName(m_n)
    g_u = TI.merge_index_stats(st["g_base"], g_n, len(_TERMS))
    return (
        TI.bm25_scores(m_u, g_u, len(_TERMS))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(10)
    )

"""Tests for operators/text_index.py — the incremental BM25 index:
merged state must equal a from-scratch rebuild EXACTLY (the
maintain-vs-retrain contract), and the vocab merge must surface new
terms with a zero base df."""

from __future__ import annotations

from pyspark.sql import functions as F

from files_kraken_spark.operators import text_index as TI

TERMS = ("spark", "table", "window")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "spark table window spark"),
    (2, "the quick brown fox"),
    (3, "spark window  "),
    (4, "table table table and spark"),
    (5, "window"),
    (6, "nothing relevant here"),
    (7, "spark spark spark spark table"),
    (8, "a window into a table"),
]


def test_merged_stats_equal_retrained(spark):
    docs = _docs(spark, CORPUS)
    base = docs.filter(F.col("doc_id") <= 5)
    batch = docs.filter(F.col("doc_id") > 5)

    m_b = TI.doc_term_stats(base, TERMS)
    m_n = TI.doc_term_stats(batch, TERMS)
    g_merged = TI.merge_index_stats(
        TI.index_stats(m_b, 3), TI.index_stats(m_n, 3), 3
    )
    g_scratch = TI.index_stats(TI.doc_term_stats(docs, TERMS), 3)
    assert g_merged.collect() == g_scratch.collect()


def test_merged_scores_equal_retrained(spark):
    docs = _docs(spark, CORPUS)
    base = docs.filter(F.col("doc_id") <= 5)
    batch = docs.filter(F.col("doc_id") > 5)

    m_b = TI.doc_term_stats(base, TERMS)
    m_n = TI.doc_term_stats(batch, TERMS)
    m_u = m_b.unionByName(m_n)
    g_u = TI.merge_index_stats(
        TI.index_stats(m_b, 3), TI.index_stats(m_n, 3), 3
    )
    merged = TI.bm25_scores(m_u, g_u, 3).orderBy("doc_id").collect()

    m_s = TI.doc_term_stats(docs, TERMS)
    scratch = (
        TI.bm25_scores(m_s, TI.index_stats(m_s, 3), 3)
        .orderBy("doc_id")
        .collect()
    )
    assert merged == scratch  # bit-identical, not approx


def test_bm25_ranking_sanity(spark):
    docs = _docs(spark, CORPUS)
    m = TI.doc_term_stats(docs, TERMS)
    g = TI.index_stats(m, 3)
    rows = {r["doc_id"]: r["bm25"] for r in TI.bm25_scores(m, g, 3).collect()}
    # docs with no query term score exactly 0 under tf=0 saturation
    assert rows[2] == 0.0 and rows[6] == 0.0
    # a doc holding all three terms outranks a one-term doc
    assert rows[1] > rows[5]


def test_empty_batch_merge_is_identity(spark):
    docs = _docs(spark, CORPUS)
    empty = docs.filter(F.lit(False))
    m = TI.doc_term_stats(docs, TERMS)
    g_merged = TI.merge_index_stats(
        TI.index_stats(m, 3), TI.index_stats(TI.doc_term_stats(empty, TERMS), 3), 3
    )
    # the empty side contributes NULL sums — merge must not poison
    assert g_merged.collect() == TI.index_stats(m, 3).collect()


def test_vocab_merge_counts_and_new_terms(spark):
    base = _docs(spark, [(1, "alpha beta beta"), (2, "alpha gamma")])
    batch = _docs(spark, [(3, "beta delta")])
    merged = {
        r["term"]: (r["df"], r["df_base"], r["df_new"])
        for r in TI.merge_vocab_df(
            TI.vocab_df(base), TI.vocab_df(batch)
        ).collect()
    }
    # df counts DOCUMENTS (distinct per doc), not occurrences
    assert merged["alpha"] == (2, 2, 0)
    assert merged["beta"] == (2, 1, 1)
    assert merged["delta"] == (1, 0, 1)  # minted by the batch
    assert merged["gamma"] == (1, 1, 0)


def test_retracted_stats_equal_rebuilt(spark):
    docs = _docs(spark, CORPUS)
    survivors = docs.filter(F.col("doc_id") <= 5)
    gone = docs.filter(F.col("doc_id") > 5)

    g_post = TI.retract_index_stats(
        TI.index_stats(TI.doc_term_stats(docs, TERMS), 3),
        TI.index_stats(TI.doc_term_stats(gone, TERMS), 3),
        3,
    )
    g_rebuilt = TI.index_stats(TI.doc_term_stats(survivors, TERMS), 3)
    assert g_post.collect() == g_rebuilt.collect()

    # empty tombstone batch: identity, NULL empty-agg sums coalesce
    empty = docs.filter(F.lit(False))
    g_noop = TI.retract_index_stats(
        TI.index_stats(TI.doc_term_stats(docs, TERMS), 3),
        TI.index_stats(TI.doc_term_stats(empty, TERMS), 3),
        3,
    )
    assert g_noop.collect() == TI.index_stats(
        TI.doc_term_stats(docs, TERMS), 3
    ).collect()

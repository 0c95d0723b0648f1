"""Regex kernel semantics vs Python `re` ground truth (reference
tests/test_retools.py scenarios, expressed over a DataFrame)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from files_kraken_spark.functions import retools as rt

NAMES = [
    "run_1",
    "run1",
    "sample_12.bam",
    "sample_12.fastq.gz",
    "run_2.sample_7.results.txt",
    "copy_of_run_1.txt",
    "useless_file.txt",
    "run_10.metrics.txt",
]


def _df(spark):
    return spark.createDataFrame([(n,) for n in NAMES], ["name"])


def collect(df, col):
    return [r[0] for r in df.select(col).collect()]


def test_fullmatch_matches_python_re(spark):
    got = collect(_df(spark), rt.fullmatch(F.col("name"), r"run_\d+"))
    want = [m.group(0) if (m := re.fullmatch(r"run_\d+", n)) else None for n in NAMES]
    assert got == want


def test_search_group_matches_python_re(spark):
    got = collect(_df(spark), rt.search(F.col("name"), r"sample_([^\.]+)", 1))
    want = [m.group(1) if (m := re.search(r"sample_([^\.]+)", n)) else None for n in NAMES]
    assert got == want


def test_findall(spark):
    got = collect(_df(spark), rt.findall(F.col("name"), r"\d+"))
    want = [re.findall(r"\d+", n) for n in NAMES]
    assert got == want


def test_bool_multimatch_any_with_exclude(spark):
    pred = rt.bool_multimatch(
        F.col("name"),
        [r"run_\d+", (r".+\.bam", 0), (r".+\.fastq\.gz", 0)],
        mode="any",
        exclude=[(r"copy_of.*", 0)],
    )
    got = collect(_df(spark), pred)

    def py(n):
        hit = (
            re.fullmatch(r"run_\d+", n) is not None
            or re.search(r".+\.bam", n) is not None
            or re.search(r".+\.fastq\.gz", n) is not None
        )
        return hit and not re.search(r"copy_of.*", n)

    assert got == [py(n) for n in NAMES]


def test_bool_multimatch_cons(spark):
    pred = rt.bool_multimatch(
        F.col("name"), [(r"run_\d+", 0), (r"results", 0)], mode="cons"
    )
    got = collect(_df(spark), pred)
    want = [
        re.search(r"run_\d+", n) is not None and re.search("results", n) is not None
        for n in NAMES
    ]
    assert got == want


def test_scheme_match_fallback_first_hit_wins(spark):
    scheme = {
        "run": [(r"run_(\d+)", 1)],
        "sample": [(r"nomatch_(\d+)", 1), (r"sample_([^\.]+)", 1)],
    }
    cols = rt.scheme_match(F.col("name"), scheme)
    df = _df(spark).select(
        cols["run"].alias("run"), cols["sample"].alias("sample"), "name"
    )
    for row in df.collect():
        m_run = re.search(r"run_(\d+)", row["name"])
        m_sample = re.search(r"sample_([^\.]+)", row["name"])
        assert row["run"] == (m_run.group(1) if m_run else None)
        assert row["sample"] == (m_sample.group(1) if m_sample else None)


def test_re_sort_key_casts_int(spark):
    df = _df(spark).withColumn(
        "k", rt.re_sort_key(F.col("name"), r"run_(\d+)", 1, "int")
    )
    got = {r["name"]: r["k"] for r in df.collect()}
    assert got["run_10.metrics.txt"] == 10
    assert got["run_2.sample_7.results.txt"] == 2
    assert got["run1"] is None


def test_correlated_pattern_concats_columns(spark):
    df = spark.createDataFrame(
        [("run_1", "run_1.results.txt"), ("run_2", "run_9.results.txt")],
        ["run", "name"],
    )
    pat = rt.correlated_pattern(F.col("run"), r"\.results\.txt")
    got = [r[0] for r in df.select(F.regexp_like(F.col("name"), pat)).collect()]
    assert got == [True, False]


def test_multimatch_vectors_tuple_parity(spark):
    """F5 exact parity: a conjunction spec yields the TUPLE of every
    sub-spec's match (reference _retools.py:55-66); scalar specs yield
    1-element vectors; a missed spec yields NULL."""
    specs = [
        (r"sample_([^\.]+)", 1),                              # scalar
        ((r"(run_\d+)", 1), (r"\.(txt)", 1)),                 # conjunction
    ]
    vec = rt.multimatch_vectors(F.col("name"), specs)
    got = collect(_df(spark), vec)

    def py(n):
        out = []
        m = re.search(r"sample_([^\.]+)", n)
        out.append([m.group(1)] if m else None)
        m1, m2 = re.search(r"(run_\d+)", n), re.search(r"\.(txt)", n)
        out.append([m1.group(1), m2.group(1)] if (m1 and m2) else None)
        return out

    assert got == [py(n) for n in NAMES]


def test_template_is_anchored_fullmatch(spark):
    """F8: interpolated template patterns must match like re.fullmatch
    (reference SchemeMatcher string specs, _retools.py:135) — a
    substring hit like 'old_<id>_results.txt.bak' must NOT match."""
    from files_kraken_spark.blueprint import Template

    tpl = Template(r"{project}_results\.txt")
    names = [
        "project_1_results.txt",          # exact: match
        "old_project_1_results.txt.bak",  # substring: must NOT match
        "project_1_results.txt.bak",      # trailing junk: must NOT match
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    pat = tpl.to_column({"project": F.lit("project_1")})
    got = [r[0] for r in df.select(F.regexp_like(F.col("name"), pat)).collect()]
    assert got == [True, False, False]


def test_search_preserves_empty_group_match(spark):
    """Review regression: the reference gates on the MATCH OBJECT, so a
    successful match with an empty group returns '' — nullif('') turned
    it into a miss and dropped files from required gates."""
    from files_kraken_spark.functions import retools as rt

    df = spark.createDataFrame([("runx",), ("nope",)], ["name"])
    got = [r[0] for r in df.select(rt.search(F.col("name"), r"run(\d*)x", 1)).collect()]
    assert got == ["", None]  # matched-with-empty-group vs true no-match

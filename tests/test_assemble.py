"""Entity assembly integration (reference tests/test_data_organizer.py:
SampleBlueprint pipeline driven with synthetic change batches)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from files_kraken_spark.blueprint import Blueprint, FieldType, ParserSpec, Template
from files_kraken_spark.operators.assemble import assemble, state_schema


from files_kraken_spark.parsers import read_float_file as _read_metric


@pytest.fixture()
def sample_bp(tmp_path):
    """The reference's SampleBlueprint
    (tests/test_data_organizer.py:20-37): required `sample`; growing
    fastq list; metrics file path; metric parsed from the metrics file."""
    return Blueprint(
        name="SampleBlueprint",
        required={"sample": (r"sample_([^\.]+?)\.", 1)},
        optional={
            "fastqs": (r".+\.fastq\.gz", 0),
            "metrics_file": (r".+\.metrics\.txt", 0),
        },
        types={
            "fastqs": FieldType.LIST_PATH,
            "metrics_file": FieldType.PATH,
        },
        parsers={
            "metric": ParserSpec(
                returns="double", dependent_fields=("metrics_file",), fn=_read_metric
            )
        },
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        [(p, p.rsplit("/", 1)[-1], c) for p, c in rows], ["path", "name", "change"]
    )


def _empty_state(spark, bp):
    return spark.createDataFrame([], state_schema(bp))


def test_entity_created_with_lists_and_parser(spark, tmp_path, sample_bp):
    metrics = tmp_path / "sample_7.metrics.txt"
    metrics.write_text("50")
    batch = _changes(
        spark,
        [
            ("/data/sample_7.lane_1.fastq.gz", "created"),
            ("/data/sample_7.lane_2.fastq.gz", "created"),
            (str(metrics), "created"),
            ("/data/useless.txt", "created"),  # no required match -> ignored
        ],
    )
    out = assemble(batch, _empty_state(spark, sample_bp), sample_bp).collect()
    assert len(out) == 1
    row = out[0]
    assert row["blueprint"] == "SampleBlueprint"
    assert row["id"] == "7"
    assert row["sample"] == "7"
    assert row["fastqs"] == [
        "/data/sample_7.lane_1.fastq.gz",
        "/data/sample_7.lane_2.fastq.gz",
    ]
    assert row["metrics_file"] == str(metrics)
    assert row["metric"] == 50.0  # dependent parser fired (A9)
    assert row["_conflicts"] == []


def test_list_accumulates_across_batches(spark, tmp_path, sample_bp):
    state = _empty_state(spark, sample_bp)
    b1 = _changes(spark, [("/d/sample_1.lane_1.fastq.gz", "created")])
    state = assemble(b1, state, sample_bp)
    b2 = _changes(spark, [("/d/sample_1.lane_2.fastq.gz", "created")])
    state = assemble(b2, state, sample_bp)
    row = state.collect()[0]
    assert row["fastqs"] == ["/d/sample_1.lane_1.fastq.gz", "/d/sample_1.lane_2.fastq.gz"]


def test_delete_subtracts_list_nulls_path_keeps_metric(spark, tmp_path, sample_bp):
    metrics = tmp_path / "sample_2.metrics.txt"
    metrics.write_text("50")
    state = _empty_state(spark, sample_bp)
    state = assemble(
        _changes(
            spark,
            [
                ("/d/sample_2.lane_1.fastq.gz", "created"),
                ("/d/sample_2.lane_2.fastq.gz", "created"),
                (str(metrics), "created"),
            ],
        ),
        state,
        sample_bp,
    )
    # delete one fastq and the metrics file
    state = assemble(
        _changes(
            spark,
            [
                ("/d/sample_2.lane_1.fastq.gz", "deleted"),
                (str(metrics), "deleted"),
            ],
        ),
        state,
        sample_bp,
    )
    row = state.collect()[0]
    assert row["fastqs"] == ["/d/sample_2.lane_2.fastq.gz"]  # A7 list subtract
    assert row["metrics_file"] is None  # A7 scalar null-out
    assert row["metric"] == 50.0  # parser value survives deletion
    assert row["_conflicts"] == []

    # deleting the last member NULLs the list (fields/_fields.py:141-143)
    state = assemble(
        _changes(spark, [("/d/sample_2.lane_2.fastq.gz", "deleted")]),
        state,
        sample_bp,
    )
    assert state.collect()[0]["fastqs"] is None


def test_scalar_conflict_goes_to_quarantine(spark, sample_bp):
    bp = Blueprint(
        name="RunInfo",
        required={"run": (r"(run_\d+)", 1)},
        optional={"flowcell": (r"\.(fc\w+)\.", 1)},
    )
    state = _empty_state(spark, bp)
    state = assemble(
        _changes(spark, [("/d/run_1.fcA.txt", "created")]), state, bp
    )
    state = assemble(
        _changes(spark, [("/d/run_1.fcB.txt", "created")]), state, bp
    )
    row = state.collect()[0]
    assert row["flowcell"] == "fcA"  # set-if-unset kept the first value
    assert row["_conflicts"] == ["flowcell"]  # A6 conflict quarantined


def test_correlated_template_field(spark):
    """F8: results file matched per-entity via required-field
    interpolation (examples/easy_example.py:61-67)."""
    bp = Blueprint(
        name="ProjectInfo",
        required={"project": (r"(project_\d+)", 1)},
        optional={"results_file": Template(r"{project}_results\.txt")},
        types={"results_file": FieldType.PATH},
    )
    batch = _changes(
        spark,
        [
            ("/d/project_1_results.txt", "created"),
            ("/d/project_2_other.txt", "created"),
        ],
    )
    out = {r["id"]: r for r in assemble(batch, _empty_state(spark, bp), bp).collect()}
    assert out["project_1"]["results_file"] == "/d/project_1_results.txt"
    assert out["project_2"]["results_file"] is None


def test_content_mode_parser_binaryfile_join(spark, tmp_path):
    """SURVEY §7.4: content_mode parsers get bytes via a binaryFile
    join — no open() inside the UDF."""
    from files_kraken_spark.parsers import parse_float_content

    f = tmp_path / "sample_3.metrics.txt"
    f.write_text("7.5")
    bp = Blueprint(
        name="ContentMode",
        required={"sample": (r"sample_([^\.]+?)\.", 1)},
        optional={"metrics_file": (r".+\.metrics\.txt", 0)},
        types={"metrics_file": FieldType.PATH},
        parsers={
            "metric": ParserSpec(
                returns="double",
                dependent_fields=("metrics_file",),
                fn=parse_float_content,
                content_mode=True,
            )
        },
    )
    batch = _changes(spark, [(str(f), "created")])
    row = assemble(batch, _empty_state(spark, bp), bp).collect()[0]
    assert row["metric"] == 7.5


def test_content_mode_pattern_parser(spark, tmp_path):
    from files_kraken_spark.parsers import parse_float_content

    f = tmp_path / "project_5_results.txt"
    f.write_text("2.25")
    bp = Blueprint(
        name="ContentPattern",
        required={"project": (r"(project_\d+)", 1)},
        parsers={
            "result": ParserSpec(
                returns="double",
                pattern=r".+_results\.txt",
                fn=parse_float_content,
                content_mode=True,
            )
        },
    )
    batch = _changes(spark, [(str(f), "created")])
    row = assemble(batch, _empty_state(spark, bp), bp).collect()[0]
    assert row["result"] == 2.25


def test_pattern_parser_reads_matched_file(spark, tmp_path):
    """A10: ParserField with pattern parses the matched file directly."""
    f = tmp_path / "project_9_results.txt"
    f.write_text("3.25")
    bp = Blueprint(
        name="ProjWithParse",
        required={"project": (r"(project_\d+)", 1)},
        parsers={
            "result": ParserSpec(
                returns="double", pattern=r".+_results\.txt", fn=_read_metric
            )
        },
    )
    batch = _changes(spark, [(str(f), "created")])
    row = assemble(batch, _empty_state(spark, bp), bp).collect()[0]
    assert row["result"] == 3.25


def test_content_roots_disjoint_trees(spark, tmp_path):
    """Round-2 verdict nit: a batch spanning unrelated roots must not
    degrade the content scan to the global commonpath. The derived
    binaryFile load roots are the batch dirs themselves and exclude
    the unrelated sibling tree entirely."""
    from files_kraken_spark.operators.assemble import _content_roots, _join_content

    a = tmp_path / "tree_a" / "deep"
    z = tmp_path / "tree_z"
    other = tmp_path / "unrelated"
    for d in (a, z, other):
        d.mkdir(parents=True)
    fa = a / "sample_1.metrics.txt"
    fz = z / "sample_2.metrics.txt"
    fa.write_text("1.5")
    fz.write_text("2.5")
    (other / "huge.bin").write_text("x" * 10)

    batch = _changes(spark, [(str(fa), "created"), (str(fz), "created")])
    roots = _content_roots(batch, "path")
    assert sorted(roots) == [str(a), str(z)]
    assert not any(str(other) in r or r == str(tmp_path) for r in roots)

    joined = _join_content(batch, "path", "content").collect()
    got = {r["path"]: bytes(r["content"]).decode() for r in joined}
    assert got == {str(fa): "1.5", str(fz): "2.5"}


def test_content_roots_nested_dirs_deduped(spark, tmp_path):
    """A dir nested under another selected dir is dropped so the
    recursive binaryFile read never double-loads it."""
    from files_kraken_spark.operators.assemble import _content_roots

    outer = tmp_path / "outer"
    inner = outer / "inner"
    inner.mkdir(parents=True)
    f1 = outer / "f1.txt"
    f2 = inner / "f2.txt"
    f1.write_text("a")
    f2.write_text("b")
    batch = _changes(spark, [(str(f1), "created"), (str(f2), "created")])
    assert _content_roots(batch, "path") == [str(outer)]


def test_content_roots_nonadjacent_nested_dirs(spark, tmp_path):
    """'/data-old' sorts BETWEEN '/data' and '/data/sub', so ancestor
    dedup must check all kept roots, not just the previous one —
    otherwise /data/sub survives and its files double-load."""
    from files_kraken_spark.operators.assemble import _content_roots

    data = tmp_path / "data"
    data_old = tmp_path / "data-old"
    sub = data / "sub"
    sub.mkdir(parents=True)
    data_old.mkdir()
    files = [data / "a.txt", data_old / "b.txt", sub / "c.txt"]
    for f in files:
        f.write_text("x")
    batch = _changes(spark, [(str(f), "created") for f in files])
    roots = _content_roots(batch, "path")
    assert sorted(roots) == [str(data), str(data_old)]

"""The `filetree` Python DataSource: batch parity with list_files,
filter pushdown claims, and the mtime-watermark streaming path."""

from __future__ import annotations

import os
import time

from files_kraken_spark.sources.filetree_source import register_filetree
from files_kraken_spark.sources.listing import NameMatcher, list_files


def _mk_tree(root):
    (root / "run_1").mkdir()
    (root / "run_1" / "a.txt").write_text("a")
    (root / "run_1" / "deep").mkdir()
    (root / "run_1" / "deep" / "b.csv").write_text("b")
    (root / "run_2").mkdir()
    (root / "run_2" / "c.txt").write_text("c")
    (root / "empty_run").mkdir()
    (root / "top.txt").write_text("t")


def test_batch_matches_list_files(spark, tmp_path):
    _mk_tree(tmp_path)
    register_filetree(spark)
    got = (
        spark.read.format("filetree")
        .option("roots", str(tmp_path))
        .option("keepEmptyDirs", "true")
        .load()
    )
    want = list_files(spark, str(tmp_path), keep_empty_dirs=True)
    assert sorted(r["path"] for r in got.collect()) == sorted(
        r["path"] for r in want.collect()
    )
    assert got.schema == want.schema


def test_batch_pattern_and_depth_options(spark, tmp_path):
    _mk_tree(tmp_path)
    register_filetree(spark)
    got = (
        spark.read.format("filetree")
        .option("roots", str(tmp_path))
        .option("patterns", r".*\.txt")
        .option("maxDepth", "1")
        .load()
    )
    want = list_files(
        spark, str(tmp_path), max_depth=1, matcher=NameMatcher(patterns=(r".*\.txt",))
    )
    assert sorted(r["path"] for r in got.collect()) == sorted(
        r["path"] for r in want.collect()
    )


def test_depth_filter_pushdown_prunes_and_stays_correct(spark, tmp_path):
    _mk_tree(tmp_path)
    register_filetree(spark)
    df = (
        spark.read.format("filetree")
        .option("roots", str(tmp_path))
        .load()
        .filter("depth <= 0")
    )
    rows = df.collect()
    # only root-level files survive; deep/b.csv was never listed
    assert sorted(r["name"] for r in rows) == ["top.txt"]
    assert all(r["depth"] == 0 for r in rows)


def test_name_suffix_pushdown(spark, tmp_path):
    _mk_tree(tmp_path)
    register_filetree(spark)
    df = (
        spark.read.format("filetree")
        .option("roots", str(tmp_path))
        .load()
        .filter("name LIKE '%.csv'")
    )
    assert [r["name"] for r in df.collect()] == ["b.csv"]


def test_streaming_tail_new_files(spark, tmp_path):
    src = tmp_path / "watched"
    src.mkdir()
    (src / "first.txt").write_text("1")
    register_filetree(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_batch():
        q = (
            spark.readStream.format("filetree")
            .option("roots", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_batch()
    first = {r["name"] for r in spark.read.parquet(out).collect()}
    assert first == {"first.txt"}

    # new file strictly later than the committed watermark
    time.sleep(0.01)
    p = src / "second.txt"
    p.write_text("2")
    os.utime(p, (time.time() + 1, time.time() + 1))
    run_batch()
    both = [r["name"] for r in spark.read.parquet(out).collect()]
    assert sorted(both) == ["first.txt", "second.txt"]  # no re-emission

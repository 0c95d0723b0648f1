"""Snapshot diff + snapshot store (reference tests/test_monitoring.py
diff/backup scenarios)."""

from __future__ import annotations

from pyspark.sql import functions as F

from files_kraken_spark.operators.diff import merge_changes, snapshot_diff
from files_kraken_spark.sources.listing import FILE_SCHEMA, list_files
from files_kraken_spark.sources.snapshot import SnapshotStore


def _paths(spark, paths):
    return spark.createDataFrame([(p,) for p in paths], "path string")


def test_diff_created_and_deleted(spark):
    prev = _paths(spark, ["/a/1", "/a/2", "/a/3"])
    cur = _paths(spark, ["/a/2", "/a/3", "/a/4", "/a/5"])
    got = {(r["path"], r["change"]) for r in snapshot_diff(prev, cur).collect()}
    assert got == {("/a/4", "created"), ("/a/5", "created"), ("/a/1", "deleted")}


def test_diff_empty_when_identical(spark):
    a = _paths(spark, ["/a/1", "/a/2"])
    assert snapshot_diff(a, a).count() == 0


def test_merge_changes_union(spark):
    c1 = snapshot_diff(_paths(spark, []), _paths(spark, ["/x"]))
    c2 = snapshot_diff(_paths(spark, ["/y"]), _paths(spark, []))
    got = {(r["path"], r["change"]) for r in merge_changes(c1, c2).collect()}
    assert got == {("/x", "created"), ("/y", "deleted")}


def test_snapshot_roundtrip_and_recovery(spark, tmp_path, golden_tree):
    store = SnapshotStore(str(tmp_path / "snap"))
    # empty load before any save (reference BackupManager tolerance)
    empty = store.load(spark, FILE_SCHEMA)
    assert empty.count() == 0 and empty.schema == FILE_SCHEMA

    df = list_files(spark, str(golden_tree))
    v1 = store.save(df)
    assert v1 == 1
    back = store.load(spark, FILE_SCHEMA)
    assert sorted(r["path"] for r in back.collect()) == sorted(
        r["path"] for r in df.collect()
    )

    # corrupt pointer -> behaves as empty (S8)
    (tmp_path / "snap" / "_latest").write_text("garbage")
    assert store.load(spark, FILE_SCHEMA).count() == 0

    # clear resets (S9)
    store.clear()
    assert store.latest_version() is None


def test_snapshot_versions_advance(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    a = _paths(spark, ["/a"]).withColumn("x", F.lit(1))
    assert store.save(a) == 1
    assert store.save(a) == 2
    assert store.latest_version() == 2

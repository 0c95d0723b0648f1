"""CowStateStore: rename-free copy-on-write backend — same CRUD
contract as StateStore plus commit atomicity under a simulated
mid-commit crash (round-2 verdict item #2)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from files_kraken_spark.blueprint import Blueprint
from files_kraken_spark.cow_store import CowStateStore
from files_kraken_spark.operators.assemble import state_schema


@pytest.fixture()
def bp():
    return Blueprint(
        name="GenericRecord",
        required={"key": (r"(\w+)", 1)},
        optional={"description": (r"desc_(\w+)", 1)},
    )


def _rows(spark, bp, rows):
    return spark.createDataFrame(
        [(bp.name, rid, rid, desc, []) for rid, desc in rows], state_schema(bp)
    )


def test_crud_roundtrip(spark, tmp_path, bp):
    store = CowStateStore(str(tmp_path / "state"))
    v1 = store.overwrite(bp, _rows(spark, bp, [("a", "one"), ("b", "two")]))
    assert v1 == 1
    assert {r["id"] for r in store.load(spark, bp).collect()} == {"a", "b"}
    assert store.get(spark, bp, "a").collect()[0]["description"] == "one"

    store.upsert_rows(spark, bp, _rows(spark, bp, [("b", "TWO"), ("c", "three")]))
    got = {r["id"]: r["description"] for r in store.load(spark, bp).collect()}
    assert got == {"a": "one", "b": "TWO", "c": "three"}

    store.delete(spark, bp, "a")
    assert {r["id"] for r in store.load(spark, bp).collect()} == {"b", "c"}

    store.clear(bp)
    assert store.load(spark, bp).count() == 0


def test_no_renames_in_commit_path(spark, tmp_path, bp):
    """Data files land at their FINAL path in one write — there is no
    staging directory and no rename step to depend on. (On S3/GCS a
    rename is a copy; this backend never issues one.)"""
    store = CowStateStore(str(tmp_path / "state"))
    store.overwrite(bp, _rows(spark, bp, [("a", "one")]))
    bdir = store._dir(bp.name)
    entries = set(os.listdir(bdir))
    assert entries == {"data", "manifest.v1.json"}
    assert not any(e.startswith("_stage") for e in entries)
    # the manifest references the as-written location verbatim
    man = store._read_manifest(bp.name)
    for k, v in man["buckets"].items():
        assert os.path.isdir(store._bucket_path(bp.name, k, v))


def test_incremental_commit_shares_untouched_buckets(spark, tmp_path, bp):
    """Copy-on-write: a commit touching one bucket leaves the other
    buckets' data files byte-identical and SHARED with the previous
    commit (same path in both manifests)."""
    store = CowStateStore(str(tmp_path / "state"), n_buckets=8)
    base = [(f"id{i}", f"d{i}") for i in range(32)]
    store.overwrite(bp, _rows(spark, bp, base))
    man1 = store._read_manifest(bp.name)

    batch = _rows(spark, bp, [("id0", "UPDATED")])
    merged = (
        store.load(spark, bp)
        .filter(F.col("id") != "id0")
        .unionByName(batch)
    )
    store.overwrite(bp, merged, touched_ids=batch.select("id"))
    man2 = store._read_manifest(bp.name)

    moved = {k for k in man1["buckets"] if man2["buckets"].get(k) != man1["buckets"][k]}
    assert len(moved) == 1  # only id0's bucket got a new version
    shared = set(man1["buckets"]) - moved
    assert shared and all(man2["buckets"][k] == man1["buckets"][k] for k in shared)
    got = {r["id"]: r["description"] for r in store.load(spark, bp).collect()}
    assert got["id0"] == "UPDATED" and got["id31"] == "d31"


def test_crash_before_manifest_leaves_previous_state(spark, tmp_path, bp):
    """Atomicity: a commit that dies after writing data but BEFORE its
    manifest is durable is invisible — readers stay on the previous
    version, and the next successful commit reaps the orphan."""
    store = CowStateStore(str(tmp_path / "state"))
    store.overwrite(bp, _rows(spark, bp, [("a", "one")]))
    bdir = store._dir(bp.name)

    # simulate the crash: data for v2 fully written, no manifest.v2
    crashed = _rows(spark, bp, [("a", "CRASHED")]).withColumn(
        "__b", store._bucket_col()
    )
    crashed.write.mode("overwrite").partitionBy("__b").parquet(
        os.path.join(bdir, "data/v=2")
    )

    assert store._read_manifest(bp.name)["version"] == 1
    assert store.load(spark, bp).collect()[0]["description"] == "one"

    # next commit must not reuse the orphan's version number
    v = store.overwrite(bp, _rows(spark, bp, [("a", "three")]))
    assert v == 3
    assert store.load(spark, bp).collect()[0]["description"] == "three"
    assert not os.path.isdir(os.path.join(bdir, "data/v=2"))  # orphan reaped


def test_torn_manifest_is_skipped(spark, tmp_path, bp):
    """A manifest torn mid-write (local FS crash) fails its CRC and is
    skipped — readers fall back to the last valid commit instead of
    erroring or reading garbage."""
    store = CowStateStore(str(tmp_path / "state"))
    store.overwrite(bp, _rows(spark, bp, [("a", "one")]))
    bdir = store._dir(bp.name)

    with open(os.path.join(bdir, "manifest.v2.json"), "w") as f:
        f.write('{"version": 2, "buckets": {"0": 2}')  # truncated JSON
    assert store._read_manifest(bp.name)["version"] == 1

    man = {"version": 3, "buckets": {"0": 99}, "crc": "bogus"}
    with open(os.path.join(bdir, "manifest.v3.json"), "w") as f:
        f.write(json.dumps(man))  # parses but fails integrity
    assert store._read_manifest(bp.name)["version"] == 1
    assert store.load(spark, bp).collect()[0]["description"] == "one"

    v = store.overwrite(bp, _rows(spark, bp, [("a", "four")]))
    assert v == 4  # torn manifests still reserve their numbers
    assert store.load(spark, bp).collect()[0]["description"] == "four"


def test_time_travel_previous_version(spark, tmp_path, bp):
    store = CowStateStore(str(tmp_path / "state"))
    store.overwrite(bp, _rows(spark, bp, [("a", "v1"), ("b", "v1")]))
    batch = _rows(spark, bp, [("a", "v2")])
    merged = (
        store.load(spark, bp).filter(F.col("id") != "a").unionByName(batch)
    )
    store.overwrite(bp, merged, touched_ids=batch.select("id"))

    prev = {r["id"]: r["description"] for r in store.load_version(spark, bp, 1).collect()}
    cur = {r["id"]: r["description"] for r in store.load_version(spark, bp, 2).collect()}
    assert prev == {"a": "v1", "b": "v1"}
    assert cur == {"a": "v2", "b": "v1"}


def test_change_data_feed(spark, tmp_path, bp):
    store = CowStateStore(str(tmp_path / "state"))
    store.overwrite(bp, _rows(spark, bp, [("a", "one"), ("b", "two")]))
    batch = _rows(spark, bp, [("a", "ONE"), ("c", "three")])
    merged = (
        store.load(spark, bp)
        .filter(~F.col("id").isin("a", "b"))
        .unionByName(batch)
    )
    store.overwrite(bp, merged, touched_ids=spark.createDataFrame(
        [("a",), ("b",), ("c",)], "id string"
    ))
    got = {r["id"]: r["change"] for r in store.changes(spark, bp).collect()}
    assert got == {"a": "updated", "b": "deleted", "c": "inserted"}


def test_change_feed_skips_torn_commit(spark, tmp_path, bp):
    """Version numbers skip past a crashed commit; the change feed must
    diff against the last VALID commit, not blindly against v-1."""
    store = CowStateStore(str(tmp_path / "state"))
    store.overwrite(bp, _rows(spark, bp, [("a", "one"), ("b", "two")]))
    bdir = store._dir(bp.name)
    with open(os.path.join(bdir, "manifest.v2.json"), "w") as f:
        f.write('{"version": 2, "buckets"')  # torn commit

    batch = _rows(spark, bp, [("a", "ONE"), ("c", "three")])
    merged = (
        store.load(spark, bp)
        .filter(~F.col("id").isin("a", "b"))
        .unionByName(batch)
    )
    v = store.overwrite(bp, merged, touched_ids=spark.createDataFrame(
        [("a",), ("b",), ("c",)], "id string"
    ))
    assert v == 3  # torn v2 reserved its number
    got = {r["id"]: r["change"] for r in store.changes(spark, bp).collect()}
    assert got == {"a": "updated", "b": "deleted", "c": "inserted"}


def test_retention_versions_and_vacuum(spark, tmp_path, bp):
    """Delta-parity history: retain=3 keeps three readable commits
    (copy-on-write: unchanged buckets shared across manifests), older
    commits are reaped automatically, and vacuum() shrinks on demand."""
    import pytest as _pytest

    store = CowStateStore(str(tmp_path / "state"), retain=3)
    v1 = store.overwrite(bp, _rows(spark, bp, [("a", "one")]))
    v2 = store.overwrite(bp, _rows(spark, bp, [("a", "one"), ("b", "two")]))
    v3 = store.overwrite(bp, _rows(spark, bp, [("a", "ONE"), ("b", "two")]))
    v4 = store.overwrite(
        bp, _rows(spark, bp, [("a", "ONE"), ("b", "two"), ("c", "three")])
    )
    assert store.versions(bp.name) == [v4, v3, v2]

    # every retained version reads back exactly as committed
    assert {r["id"]: r["description"]
            for r in store.load_version(spark, bp, v2).collect()} == {
        "a": "one", "b": "two"}
    assert {r["id"]: r["description"]
            for r in store.load_version(spark, bp, v3).collect()} == {
        "a": "ONE", "b": "two"}
    # the commit past the retention window is gone
    with _pytest.raises(ValueError):
        store.load_version(spark, bp, v1)

    # vacuum to a single commit: only the current survives and still reads
    assert store.vacuum(bp.name, keep=1) == [v4]
    assert store.versions(bp.name) == [v4]
    with _pytest.raises(ValueError):
        store.load_version(spark, bp, v3)
    assert {r["id"] for r in store.load(spark, bp).collect()} == {"a", "b", "c"}

"""StateStore CRUD (reference tests/test_database.py scenarios)."""

from __future__ import annotations

import pytest

from files_kraken_spark.blueprint import Blueprint
from files_kraken_spark.operators.assemble import state_schema
from files_kraken_spark.store import StateStore


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


def test_schema_evolution_new_field_loads_null(spark, tmp_path, bp):
    """State written before the blueprint gained a field loads with the
    new column as NULL (the reference's schemaless-store behavior)."""
    store = StateStore(str(tmp_path / "state"))
    store.overwrite(bp, _rows(spark, bp, [("a", "one")]))

    evolved = Blueprint(
        name="GenericRecord",  # same table
        required={"key": (r"(\w+)", 1)},
        optional={
            "description": (r"desc_(\w+)", 1),
            "owner": (r"owner_(\w+)", 1),  # NEW field
        },
    )
    row = store.load(spark, evolved).collect()[0]
    assert row["description"] == "one"
    assert row["owner"] is None
    assert row["_conflicts"] == []


def test_crud_roundtrip(spark, tmp_path, bp):
    store = StateStore(str(tmp_path / "state"))
    # empty load
    assert store.load(spark, bp).count() == 0
    # insert (S10)
    store.overwrite(bp, _rows(spark, bp, [("a", "one"), ("b", "two")]))
    assert store.load(spark, bp).count() == 2
    # point lookup honors both key parts (S11; reference `and`-bug fixed)
    got = store.get(spark, bp, "a").collect()
    assert len(got) == 1 and got[0]["description"] == "one"
    # upsert replaces by id (S12)
    store.upsert_rows(spark, bp, _rows(spark, bp, [("a", "uno"), ("c", "three")]))
    rows = {r["id"]: r["description"] for r in store.load(spark, bp).collect()}
    assert rows == {"a": "uno", "b": "two", "c": "three"}
    # delete (S13)
    store.delete(spark, bp, "b")
    assert sorted(r["id"] for r in store.load(spark, bp).collect()) == ["a", "c"]
    # clear
    store.clear(bp)
    assert store.load(spark, bp).count() == 0


def test_incremental_commit_rewrites_only_touched_bucket(spark, tmp_path, bp):
    """A 1-entity batch must rewrite ONLY that entity's bucket: the
    other buckets' data dirs keep their version (no O(state) write
    amplification per tick — r1 verdict item 4)."""
    import json
    import os

    store = StateStore(str(tmp_path / "state"), n_buckets=8)
    ids = [f"id{i}" for i in range(40)]
    store.overwrite(bp, _rows(spark, bp, [(i, "v1") for i in ids]))

    bdir = tmp_path / "state" / bp.name
    man1 = json.loads((bdir / "manifest.json").read_text())
    assert len(man1["buckets"]) > 1  # 40 ids spread over several buckets

    # touch exactly one entity
    full = store.load(spark, bp)
    new = full  # state content unchanged; commit declares one touched id
    touched = spark.createDataFrame([("id7",)], "id string")
    store.overwrite(bp, new, touched_ids=touched)

    man2 = json.loads((bdir / "manifest.json").read_text())
    assert man2["version"] == man1["version"] + 1
    changed = [
        k for k in man1["buckets"]
        if man2["buckets"].get(k) != man1["buckets"][k]
    ]
    assert len(changed) == 1  # only id7's bucket advanced
    # untouched buckets' directories were not rewritten
    for k, v in man1["buckets"].items():
        if k not in changed:
            assert (bdir / f"b={k}" / f"v={v}").exists()
    # and the table still reads back fully
    assert store.load(spark, bp).count() == 40


def test_incremental_commit_updates_values(spark, tmp_path, bp):
    """Value changes for touched ids land; untouched rows survive
    across an incremental commit."""
    store = StateStore(str(tmp_path / "state"), n_buckets=8)
    store.overwrite(bp, _rows(spark, bp, [("a", "one"), ("b", "two"), ("c", "three")]))
    new = _rows(spark, bp, [("a", "ONE"), ("b", "two"), ("c", "three")])
    touched = spark.createDataFrame([("a",)], "id string")
    store.overwrite(bp, new, touched_ids=touched)
    rows = {r["id"]: r["description"] for r in store.load(spark, bp).collect()}
    assert rows == {"a": "ONE", "b": "two", "c": "three"}


def test_time_travel_previous_version(spark, tmp_path, bp):
    """The current AND previous commits stay loadable (S8 backup
    semantics); older versions are pruned."""
    store = StateStore(str(tmp_path / "state"), n_buckets=4)
    v1 = store.overwrite(bp, _rows(spark, bp, [("a", "one")]))
    v2 = store.overwrite(
        bp,
        _rows(spark, bp, [("a", "ONE"), ("b", "two")]),
        touched_ids=spark.createDataFrame([("a",), ("b",)], "id string"),
    )
    now = {r["id"]: r["description"] for r in store.load(spark, bp).collect()}
    assert now == {"a": "ONE", "b": "two"}
    prev = {
        r["id"]: r["description"]
        for r in store.load_version(spark, bp, v1).collect()
    }
    assert prev == {"a": "one"}
    # a third commit rolls the retention window forward
    v3 = store.overwrite(
        bp,
        _rows(spark, bp, [("a", "ONE"), ("b", "TWO")]),
        touched_ids=spark.createDataFrame([("b",)], "id string"),
    )
    assert store.load_version(spark, bp, v2).count() == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        store.load_version(spark, bp, v1)


def test_change_data_feed(spark, tmp_path, bp):
    """changes() diffs the current commit against the previous one:
    inserted / updated / deleted entity rows."""
    store = StateStore(str(tmp_path / "state"), n_buckets=4)
    store.overwrite(bp, _rows(spark, bp, [("a", "one"), ("b", "two"), ("c", "x")]))
    # second commit: update a, delete c, insert d
    new = _rows(spark, bp, [("a", "ONE"), ("b", "two"), ("d", "four")])
    store.overwrite(bp, new)
    got = {r["id"]: r["change"] for r in store.changes(spark, bp).collect()}
    assert got == {"a": "updated", "c": "deleted", "d": "inserted"}

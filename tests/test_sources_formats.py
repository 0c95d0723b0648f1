"""Source/sink format coverage + partition pruning.

The reference persists JSON documents (TinyDB); our engine reads and
writes every Spark format. The partition-pruning test is the scale
behavior that matters: a filtered read of a partitioned table must
only touch matching partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _sample(spark):
    return spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5, ["a", "b"][i % 2]) for i in range(100)],
        ["id", "name", "score", "grp"],
    )


def test_format_roundtrips(spark, tmp_path):
    df = _sample(spark)
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.format(fmt).save(path)
        r = spark.read.format(fmt)
        if fmt == "csv":
            r = r.option("header", "true").option("inferSchema", "true")
        back = r.load(path)
        got = sorted((r2["id"], r2["name"]) for r2 in back.select("id", "name").collect())
        assert got == [(i, f"name_{i}") for i in range(100)], fmt


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "parts")
    df.write.mode("overwrite").partitionBy("grp").parquet(path)

    read = spark.read.parquet(path).filter(F.col("grp") == "a")
    assert read.count() == 50
    plan = read._jdf.queryExecution().executedPlan().toString()
    # partition filter applied at scan: only the grp=a directory is read
    # (inputFiles() reports the unpruned relation, so inspect the plan)
    assert "PartitionFilters" in plan
    assert "grp" in plan.split("PartitionFilters")[1][:120]


def test_permissive_json_tolerates_corrupt_records(spark, tmp_path):
    """One bad record must not kill a 100 TB ingest: PERMISSIVE mode
    parses good rows and quarantines the corrupt line into
    _corrupt_record for later triage (the file-parsing analog of the
    engine's conflict quarantine)."""
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": 1, "v": 10.0}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 20.0}\n'
    )
    df = (
        spark.read.schema("id long, v double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = sorted((r["id"], r["v"]) for r in rows if r["_corrupt_record"] is None)
    bad = [r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None]
    assert good == [(1, 10.0), (2, 20.0)]
    assert bad == ["THIS IS NOT JSON"]

    # FAILFAST is the strict alternative: the same file raises
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.schema("id long, v double").option("mode", "FAILFAST").json(
            str(p)
        ).collect()

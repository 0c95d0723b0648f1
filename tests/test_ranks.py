"""operators/ranks.py: distributed replacements for global windows must
agree exactly with Spark's own window functions (which are the
semantics oracle — fine on tiny test data, a single-task stage at
scale)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from files_kraken_spark.operators.ranks import (
    dense_rank_low_card,
    global_row_number,
    ntile_from_position,
)


def test_global_row_number_matches_window(spark):
    rng = random.Random(11)
    rows = [(i, rng.randrange(50)) for i in range(337)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["__rn"]
        for r in global_row_number(df, [F.col("v"), F.col("id")]).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_ntile_from_position_matches_spark_ntile(spark):
    # cover n % b == 0, n < b, and ragged sizes
    for n, b in [(12, 4), (13, 4), (3, 4), (1, 4), (100, 7), (99, 7)]:
        df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "p long")
        got = {
            r["p"]: r["q"]
            for r in df.select(
                "p", ntile_from_position(F.col("p"), F.lit(n), b).alias("q")
            ).collect()
        }
        w = Window.orderBy("p")
        want = {
            r["p"]: r["q"]
            for r in df.withColumn("q", F.ntile(b).over(w)).collect()
        }
        assert got == want, (n, b)


def test_dense_rank_low_card_matches_window_with_nulls(spark):
    rows = [(1, 3), (2, 1), (3, 1), (4, None), (5, 7), (6, None), (7, 3)]
    df = spark.createDataFrame(rows, "id long, k int")
    got = {
        r["id"]: r["dr"]
        for r in dense_rank_low_card(df, "k", out_col="dr").collect()
    }
    w = Window.orderBy("k")  # Spark: NULLS FIRST on ASC
    want = {
        r["id"]: r["dr"]
        for r in df.withColumn("dr", F.dense_rank().over(w)).collect()
    }
    assert got == want


def test_global_row_number_desc_order(spark):
    df = spark.createDataFrame([(i, i * 7 % 13) for i in range(40)], "id long, v long")
    from pyspark.sql import functions as F

    got = {
        r["id"]: r["__rn"]
        for r in global_row_number(df, [F.col("v").desc(), F.col("id")]).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_row_number_leaves_no_cache_entry(spark):
    """Round-5 advice: the old implementation persist()ed its
    range-exchanged frame and relied on the harness's clearCache() —
    callers like sim_hybrid_rrf (which inlines it twice) accumulated
    cached frames forever in a clearCache-less session. The rewrite
    pins via a scratch-parquet spill instead: repeated calls leave ZERO
    persisted RDDs and zero CacheManager entries, with no clearCache()
    ever issued, and the result stays re-materializable (the spill is
    immutable) even after the harness would have cleared a cache."""
    # Compare RDD-id SETS, not counts: earlier tests' localCheckpoint
    # pins are released by the async ContextCleaner at arbitrary times,
    # so an absolute count can legitimately DROP mid-test (seen flaky
    # in CI) — the invariant under test is only that global_row_number
    # adds no NEW pin.
    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    results = []
    for _ in range(3):
        df = spark.range(0, 5000).withColumn("v", (F.col("id") * 31) % 97)
        out = global_row_number(df, [F.col("v"), F.col("id")])
        assert out.count() == 5000
        results.append(out)

    after = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    assert not (after - before)  # nothing NEW pinned in storage

    # results remain valid and consistent on re-materialization — the
    # old persist-based pin could recompute with different sampled range
    # boundaries once evicted; the spill cannot
    first = {r["id"]: r["__rn"] for r in results[0].collect()}
    again = {r["id"]: r["__rn"] for r in results[0].collect()}
    assert first == again


def test_dense_rank_nulls_last(spark):
    rows = [(1, 3), (2, None), (3, 1), (4, 3)]
    df = spark.createDataFrame(rows, "id long, k int")
    got = {
        r["id"]: r["dr"]
        for r in dense_rank_low_card(df, "k", out_col="dr", nulls_first=False).collect()
    }
    w = Window.orderBy(F.col("k").asc_nulls_last())
    want = {
        r["id"]: r["dr"]
        for r in df.withColumn("dr", F.dense_rank().over(w)).collect()
    }
    assert got == want


def test_pin_lifecycle_rotation_and_release(spark):
    """Round-6 advice: pin directories are tracked, rotated beyond the
    cap, and releasable via the manual hook — a long-lived session's
    scratch disk is bounded instead of growing per call."""
    import os

    from files_kraken_spark.operators import ranks as R

    R.release_pins()  # isolate from earlier tests in the session
    assert R._PIN_DIRS == []

    spark.conf.set("spark.files_kraken.scratch_max_pins", "3")
    try:
        import warnings as _w

        frames = []
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            for i in range(5):
                df = spark.range(0, 100 + i)
                frames.append(R.pin_frame(df))
        # rotation kept only the newest 3 pin dirs on disk, and each of
        # the 2 evictions warned loudly (round-7 advice: never silently
        # delete a pin a lazy DataFrame may still reference)
        rot = [w for w in caught if "rotating out oldest pin" in str(w.message)]
        assert len(rot) == 2
        assert len(R._PIN_DIRS) == 3
        for p, _deleter in R._PIN_DIRS:
            assert os.path.isdir(p)
        # the newest pins are still readable
        assert frames[-1].count() == 104
        # manual release removes everything and reports the count
        n = R.release_pins()
        assert n == 3
        assert R._PIN_DIRS == []
    finally:
        spark.conf.unset("spark.files_kraken.scratch_max_pins")


def test_pin_frame_roundtrip(spark):
    from files_kraken_spark.operators import ranks as R

    df = spark.range(0, 50).withColumn("v", (F.col("id") * 7) % 13)
    pinned = R.pin_frame(df)
    assert sorted(map(tuple, pinned.collect())) == sorted(map(tuple, df.collect()))
    R.release_pins()


def test_global_prefix_min_matches_window(spark):
    from files_kraken_spark.operators.ranks import global_prefix_min

    df = spark.range(0, 3000).select(
        (F.col("id") * 37 % 1009).alias("k"),
        ((F.col("id") * 91) % 500 - 250).cast("long").alias("v"),
        "id",
    ).groupBy("k").agg(F.min("v").alias("v"))  # unique order key
    got = {
        r["k"]: r["pm"]
        for r in global_prefix_min(df, [F.col("k")], "v", out_col="pm").collect()
    }
    from pyspark.sql.window import Window

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: r["pm"]
        for r in df.withColumn("pm", F.min("v").over(w)).collect()
    }
    assert got == want
    from files_kraken_spark.operators import ranks as R

    R.release_pins()


def test_global_prefix_min_empty(spark):
    from files_kraken_spark.operators.ranks import global_prefix_min

    df = spark.range(0, 0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    assert global_prefix_min(df, [F.col("k")], "v").count() == 0


def test_global_prefix_sums_matches_window(spark):
    from files_kraken_spark.operators.ranks import global_prefix_sums

    rng = random.Random(23)
    rows = [(i, rng.randrange(-20, 50), rng.randrange(5)) for i in range(311)]
    df = spark.createDataFrame(rows, "id long, v long, u long")
    got = {
        r["id"]: (r["sv"], r["su"])
        for r in global_prefix_sums(
            df, [F.col("v"), F.col("id")], {"v": "sv", "u": "su"}
        ).collect()
    }
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: (r["sv"], r["su"])
        for r in df.withColumn("sv", F.sum("v").over(w))
        .withColumn("su", F.sum("u").over(w))
        .collect()
    }
    assert got == want


def test_global_prefix_sums_desc_nulls_and_empty(spark):
    from files_kraken_spark.operators.ranks import global_prefix_sums

    rows = [(1, 10), (2, None), (3, 5), (4, None), (5, 1)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["s"]
        for r in global_prefix_sums(
            df, [F.col("id").desc()], {"v": "s"}
        ).collect()
    }
    # inclusive running sum walking id 5,4,3,2,1; NULLs contribute 0
    assert got == {5: 1, 4: 1, 3: 6, 2: 6, 1: 16}

    empty = spark.createDataFrame([], "id long, v long")
    out = global_prefix_sums(empty, [F.col("id")], {"v": "s"})
    assert out.count() == 0 and "s" in out.columns


def test_pin_size_warning_fires_and_is_configurable(spark):
    """Round-8 verdict item 6: a pin larger than
    spark.files_kraken.scratch_pin_warn_bytes warns, naming the path;
    the default threshold and 0 (disabled) stay silent."""
    import warnings as _w

    from files_kraken_spark.operators import ranks as R

    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    old = spark.conf.get("spark.files_kraken.scratch_pin_warn_bytes", None)
    try:
        spark.conf.set("spark.files_kraken.scratch_pin_warn_bytes", "1")
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            out = R.pin_frame(df)
            assert out.count() == 1000  # pin itself unaffected
        msgs = [str(x.message) for x in rec]
        assert any("scratch pin" in m and "bytes" in m for m in msgs), msgs

        spark.conf.set("spark.files_kraken.scratch_pin_warn_bytes", "0")
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            R.pin_frame(df).count()
        assert not any("scratch pin" in str(x.message) for x in rec)
    finally:
        if old is None:
            spark.conf.unset("spark.files_kraken.scratch_pin_warn_bytes")
        else:
            spark.conf.set("spark.files_kraken.scratch_pin_warn_bytes", old)


def test_spread_small_scan_caches_partition_decision(spark):
    """Round-8 advice: the .rdd physical-planning pass runs once per
    semantically distinct frame; a repeat wrap is a cache hit, and
    distinct frames get distinct cache entries (no collisions)."""
    from files_kraken_spark.operators import ranks as R

    R._SPREAD_NPART_CACHE.clear()
    one = spark.range(0, 100).coalesce(1)
    out1 = R.spread_small_scan(one)
    assert len(R._SPREAD_NPART_CACHE) == 1
    (cached,) = R._SPREAD_NPART_CACHE.values()
    assert cached == 1
    # spread actually fired: output partitioning is the default parallelism
    assert out1.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # second wrap of the same frame: no new entry
    R.spread_small_scan(spark.range(0, 100).coalesce(1))
    assert len(R._SPREAD_NPART_CACHE) == 1
    # a different frame is a different key
    R.spread_small_scan(spark.range(0, 200).coalesce(1))
    assert len(R._SPREAD_NPART_CACHE) == 2
    # an already-wide frame passes through untouched
    wide = spark.range(0, 1000).repartition(
        spark.sparkContext.defaultParallelism
    )
    assert R.spread_small_scan(wide) is wide


def test_spread_cache_bounded_and_cleared_at_job_boundary(spark, monkeypatch):
    """Round-9 advice: the decision cache is FIFO-bounded and keyed by
    application id, and release_pins() (the job-boundary hook) clears
    it so regenerated data gets fresh partition counts."""
    from files_kraken_spark.operators import ranks as R

    R._SPREAD_NPART_CACHE.clear()
    monkeypatch.setattr(R, "_SPREAD_CACHE_MAX", 2)
    for n in (10, 20, 30):
        R.spread_small_scan(spark.range(0, n).coalesce(1))
    assert len(R._SPREAD_NPART_CACHE) == 2  # FIFO evicted the oldest
    app_id = spark.sparkContext.applicationId
    assert all(k[0] == app_id for k in R._SPREAD_NPART_CACHE)
    R.release_pins()
    assert R._SPREAD_NPART_CACHE == {}

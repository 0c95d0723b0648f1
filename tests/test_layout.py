"""Z-order clustering: prove the layout buys multi-column locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from files_kraken_spark.operators.layout import (
    cluster_write,
    files_touched,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(5, 3)], "x long, y long")  # 101, 011
    # interleaved (bit j of col i at j*2+i): x bits at even, y at odd
    # x=101, y=011 -> z = 1<<0 | 1<<1 | 0<<2 | 1<<3 | 1<<4 | 0<<5 = 27
    got = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()[0]["z"]
    assert got == 27


def test_zorder_layout_touches_few_files_for_box_query(spark, tmp_path):
    grid = (
        spark.range(0, 64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "rand")
    cluster_write(grid, zpath, ["x", "y"], bits=6, n_files=16)
    # control: same data hash-scattered across the same file count
    grid.repartition(16, "payload").write.mode("overwrite").parquet(rpath)

    box = (F.col("x").between(8, 15)) & (F.col("y").between(8, 15))
    z_files = files_touched(spark.read.parquet(zpath).filter(box))
    r_files = files_touched(spark.read.parquet(rpath).filter(box))
    assert spark.read.parquet(zpath).filter(box).count() == 64
    # an 8x8 box out of 64x64 is one z-block neighborhood: a few files
    # in the clustered layout, essentially all files in the hash layout
    assert z_files <= 3, z_files
    assert r_files >= 14, r_files


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    from files_kraken_spark.operators.layout import compact

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(0, 5000).withColumn("v", F.col("id") % 7).repartition(
        64
    ).write.parquet(src)
    assert len([f for f in __import__("os").listdir(src) if f.endswith(".parquet")]) == 64
    n_files = compact(spark, src, dst, target_rows_per_file=2500, sort_cols=["id"])
    assert n_files == 2
    out = spark.read.parquet(dst)
    assert out.count() == 5000
    assert out.agg(F.sum("id")).collect()[0][0] == 5000 * 4999 // 2


def test_zone_map_prunes_files_for_range_query(spark, tmp_path):
    from files_kraken_spark.operators.layout import collect_zone_map, prune_files

    path = str(tmp_path / "ranged")
    # range-partitioned on id -> each of 10 files covers a tight id band
    spark.range(0, 10_000).withColumn(
        "v", F.col("id") * 3
    ).repartitionByRange(10, "id").sortWithinPartitions("id").write.parquet(path)
    zm = collect_zone_map(spark, path, ["id", "v"])
    assert zm.count() == 10
    assert zm.agg(F.sum("n_rows")).collect()[0][0] == 10_000

    files = prune_files(zm, "id", 4100, 4200)
    assert 1 <= len(files) <= 2  # a 100-id band lives in 1-2 of 10 files
    # the pruned read set returns exactly the predicate's rows
    got = (
        spark.read.parquet(*files)
        .filter(F.col("id").between(4100, 4200))
        .count()
    )
    assert got == 101


def test_zone_map_prune_df_matches_collected_list(spark, tmp_path):
    """prune_files_df (manifest stays a DataFrame, semi-joined into the
    scan) returns exactly the rows of the collected-list read path."""
    from files_kraken_spark.operators.layout import (
        collect_zone_map,
        prune_files,
        prune_files_df,
    )

    path = str(tmp_path / "ranged")
    spark.range(0, 10_000).withColumn(
        "v", F.col("id") * 3
    ).repartitionByRange(10, "id").sortWithinPartitions("id").write.parquet(path)
    zm = collect_zone_map(spark, path, ["id", "v"])

    pruned = prune_files_df(spark, path, zm, "id", 4100, 4200)
    files = prune_files(zm, "id", 4100, 4200)
    via_list = spark.read.parquet(*files)
    assert pruned.count() == via_list.count()
    got = pruned.filter(F.col("id").between(4100, 4200))
    assert got.count() == 101
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(4100, 4201))

"""Storage-layout operators: z-order clustering for multi-dimensional
data skipping.

At 100 TB the scan you avoid is worth more than the scan you speed up.
Partitioning prunes on ONE column hierarchy; bucketing co-locates ONE
join key (see ``tests/test_bucketing.py``); z-ordering gives range
locality on SEVERAL columns at once: interleave the bits of the
(bounded, non-negative) dimension values into a single integer key,
range-partition + sort the write by that key, and every output file
covers a tight hyper-rectangle — parquet min/max stats on EACH original
column turn into effective row-group/file skips for 2-D box predicates.

The key is pure integer bit arithmetic (shift/and/or — whole-stage
codegen, engine-portable), so it is oracle-checked like everything
else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into a single z-order key: bit ``j`` of column ``i`` lands
    at position ``j * len(cols) + i``. Callers clamp/rank dimensions
    into [0, 2^bits) first — ``value & (2^bits - 1)`` for ids,
    bucketed epoch for timestamps."""
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {len(cols) * bits} "
            "interleaved bits > 63: Spark shiftleft wraps the shift "
            "amount mod 64, which would silently corrupt the key"
        )
    n = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cc = c.cast("long")
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cc, j).bitwiseAND(F.lit(1)), j * n + i)
            )
    return z


def zorder_key_sql(cols: list[str], bits: int = 10) -> str:
    """The identical bit math as a SQL expression string (DuckDB /
    ANSI bit operators) — keeps the oracle in lockstep with
    `zorder_key`."""
    terms = []
    n = len(cols)
    for i, c in enumerate(cols):
        for j in range(bits):
            terms.append(f"((({c} >> {j}) & 1) << {j * n + i})")
    return " | ".join(terms)


def cluster_write(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 10,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``zcols``:
    range-partition on the z-key (contiguous key ranges per file, not
    hash-scattered) and sort within partitions so row groups inside a
    file are tight too. The z-key itself is dropped from the output —
    it's a layout device, not data.

    Scale shape: one range-exchange (sampled boundaries) + local sort,
    then a parallel write — the standard one-shuffle re-layout job. At
    100 TB run it per ingest partition; readers get multi-column
    min/max skipping forever after.
    """
    zk = zorder_key([F.col(c) for c in zcols], bits=bits)
    (
        df.withColumn("__zk", zk)
        .repartitionByRange(n_files, "__zk")
        .sortWithinPartitions("__zk")
        .drop("__zk")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(df: DataFrame) -> int:
    """How many distinct files contribute ≥1 row to ``df`` — the
    observable locality a clustered layout buys (a box predicate over a
    z-ordered table finds its rows in few files; over a hash/random
    layout it touches nearly all of them)."""
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )


def compact(
    spark,
    path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction — the perpetual 100 TB housekeeping job:
    streaming sinks and incremental commits leave thousands of KB-sized
    files whose per-file open/footer cost dominates scans. Rewrite the
    directory into ``ceil(rows / target_rows_per_file)`` files,
    optionally re-sorted (pass the z-key or a clustering column to
    restore locality while compacting). Returns the output file count.

    One count + one exchange + one write; with ``sort_cols`` the
    exchange is range-based so min/max stats stay tight. Writes to
    ``out_path`` (atomic swap is the caller's rename — same
    single-writer discipline as the state store).
    """
    import math

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    return n_files


def collect_zone_map(
    spark, path: str, stat_cols: list[str]
) -> DataFrame:
    """Build a file-level zone map (the Iceberg/Delta manifest idea as
    a plain DataFrame): one row per parquet file with min/max of each
    stat column. One scan, one groupBy(file) — O(files) output that a
    planner (or `prune_files`) consults instead of opening footers at
    query time. Recompute per compaction/ingest batch, not per query."""
    df = spark.read.parquet(path)
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    )


def prune_files(
    zone_map: DataFrame, col: str, lo, hi
) -> list[str]:
    """Files whose [min, max] range intersects [lo, hi] — the read set
    a planner passes to ``spark.read.parquet(*files)``. The zone map is
    O(files) rows, so this collect is manifest-sized, not data-sized."""
    rows = zone_map.filter(
        (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
    ).select("file")
    return [r["file"] for r in rows.collect()]


def prune_files_df(
    spark, path: str, zone_map: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Zone-map pruning with the manifest kept DISTRIBUTED: the
    surviving-file set stays a DataFrame and is broadcast
    semi-joined into the scan on ``input_file_name()`` — the driver
    never materializes the file list, so the pattern holds at
    100M-file manifests where ``prune_files``' collect would not.

    Semantics match ``spark.read.parquet(*prune_files(...))`` row-for-
    row: ALL rows of surviving files (callers add their own row
    predicate on ``col``, which Catalyst pushes to parquet row-group
    stats independently of this join). The I/O trade: Spark still
    opens every footer and reads non-surviving files' blocks — true
    file-level skip at plan time needs the list on the driver, or a
    table format (Delta/Iceberg) whose scan planner does this same
    manifest join natively; what this form buys is that the MANIFEST
    never lands on the driver. The join strategy is left to the
    optimizer: AQE broadcasts a small survivor set and shuffles a huge
    one — a forced broadcast would re-collect the manifest to the
    driver, the exact bottleneck this variant exists to avoid. Use
    ``prune_files`` when the survivor count is driver-sized; use this
    form when the manifest itself is big data."""
    survivors = (
        zone_map.filter(
            (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
        )
        .select(F.col("file").alias("__file"))
    )
    df = spark.read.parquet(path)
    return (
        df.withColumn("__file", F.input_file_name())
        .join(survivors, "__file", "left_semi")
        .drop("__file")
    )

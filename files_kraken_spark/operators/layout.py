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

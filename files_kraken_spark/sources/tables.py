"""Parquet table loading for the test/bench corpus.

At 100 TB these would be partitioned/bucketed Delta or Iceberg tables;
here they're single parquet files per table. Reads stay declarative
(``spark.read.parquet``) so Catalyst applies column pruning and filter
pushdown into the scan — never pre-collect or cache eagerly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region=5, nation=25 rows even at TPC-H SF-100k).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
        # reader refuses by default; read as raw nanos (long). Queries
        # do exact integer time math on nanos — no precision loss.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # already set / immutable in this deployment
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}

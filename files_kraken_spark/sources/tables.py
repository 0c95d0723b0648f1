"""Parquet table loading for the test/bench corpus.

At 100 TB these would be partitioned/bucketed Delta or Iceberg tables;
here they're single parquet files per table. Reads stay declarative
(``spark.read.parquet``) so Catalyst applies column pruning and filter
pushdown into the scan — never pre-collect or cache eagerly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
        # events.parquet has stored TIMESTAMP(NANOS) in some corpus
        # generations (Spark's reader refuses it by default; read as
        # raw nanos long) and TIMESTAMP(MICROS) in others. Queries do
        # exact integer time math on BIGINT nanos, so normalize both
        # physical encodings to that. NOTE the NTZ cast below is
        # session-timezone DEPENDENT when the parquet column is
        # instant-typed TIMESTAMP (it renders the instant in session
        # tz first) — the engine pins UTC in its session factory, and
        # we re-pin here so a foreign session (driver harness, user
        # notebook in another tz) still matches the DuckDB oracle,
        # which reads the same column as naive-UTC.
        for k, v in (
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.session.timeZone", "UTC"),
        ):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # already set / immutable in this deployment
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import types as T

        if not isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', "
                    "CAST(ts AS TIMESTAMP_NTZ)) * CAST(1000 AS BIGINT)"
                ),
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the t2 correctness registry, one
entry per implemented operator (SURVEY.md §2); defined in
``files_kraken_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from files_kraken_spark.queries import oracle_sql as _oracle_sql
from files_kraken_spark.queries import queries as _queries
from files_kraken_spark.session import tune_existing

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's blueprint-assembly pipeline re-expressed
    Spark-first (SURVEY §7.2) — regex-extract an entity key from
    ``part.p_name`` (F2), gate on required match (A2), join the fact
    table, and assemble per-entity records with typed merge semantics
    (A6: scalar first-wins + dedup'd sorted list + aggregates)."""
    from pyspark.sql import functions as F

    from files_kraken_spark.functions import retools as rt

    tune_existing(spark)
    part = spark.read.parquet(f"{SF0001}/part.parquet")
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")

    matched = part.select(
        "p_partkey",
        "p_retailprice",
        rt.search(F.col("p_name"), r"^(\w+) ", 1).alias("category"),
        rt.search(F.col("p_name"), r" (\w+)$", 1).alias("item"),
    ).filter(F.col("category").isNotNull())  # A2 required-field gate

    return (
        li.join(matched, li["l_partkey"] == matched["p_partkey"])
        .groupBy("category")  # A3: entity per extracted key
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.sort_array(F.collect_set("item")).alias("items"),  # A6 list merge
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()

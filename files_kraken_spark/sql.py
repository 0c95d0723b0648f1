"""Raw-SQL convenience surface.

``attach(spark, sf_dir)`` registers every corpus table as a temp view
so users run plain ``spark.sql`` — the general query surface the
reference lacked (its only read API was point lookups,
``database/_database.py:34-47``; SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.tables import TABLE_NAMES, load_table


def attach(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register all corpus tables as temp views; returns the view names."""
    names = []
    for t in TABLE_NAMES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: attach + run a SQL string."""
    attach(spark, sf_dir)
    return spark.sql(query)

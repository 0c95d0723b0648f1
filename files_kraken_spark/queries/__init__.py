"""t2 query registry: every implemented operator exposed as a named
(spark_query, oracle_sql) pair.

The driver runs each Spark query and its DuckDB oracle side-by-side at
sf=0.01 and hash-compares results (row count + schema + order-
insensitive value hash). Column names are aliased identically on both
sides — the compare sorts columns by name.

Queries with ``oracle=None`` are genuinely non-SQL-expressible (custom
stateful streaming, engine-internal sources); the driver records a
rows-only check for those.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Importing the modules populates REGISTRY via @register. Order =
# registry order = the order a budget-capped correctness pass walks:
# reference-parity ops and the novel operator families (temporal
# joins, corpus pipeline, data quality) go before the long relational
# tail so a truncated pass still covers every distinct surface.
from . import relational  # noqa: E402,F401
from . import kraken_ops  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import extended  # noqa: E402,F401
from . import advanced_sql  # noqa: E402,F401
from . import analytics  # noqa: E402,F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.spark for n, s in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}

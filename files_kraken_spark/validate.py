"""Declarative data-quality expectations over DataFrames.

A pipeline ingesting 100 TB needs its invariants checked as queries,
not assertions: each expectation compiles to a violation COUNT, and
all row-local expectations share ONE aggregate pass over the table
(zero shuffles beyond the scan); uniqueness and referential checks
add one keyed shuffle each. Results come back as rows — queryable,
joinable with the audit log, and cheap to alert on.

Usage::

    checks = [
        not_null("l_orderkey"),
        in_range("l_discount", 0.0, 0.1),
        accepted_values("l_returnflag", ["A", "N", "R"]),
        unique(["l_orderkey", "l_linenumber"]),
        referential("l_orderkey", orders_df, "o_orderkey"),
    ]
    report = run_checks(lineitem, checks)   # (rule, violations, passed)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    # row-local violation predicate (compiled into the shared agg pass)…
    predicate: Callable[[], Column] | None = None
    # …or a whole-frame violation counter (needs its own shuffle)
    counter: Callable[[DataFrame], DataFrame] | None = None


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", predicate=lambda: F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range({col},{lo},{hi})",
        predicate=lambda: ~F.col(col).between(lo, hi) | F.col(col).isNull(),
    )


def accepted_values(col: str, values: list) -> Check:
    vals = list(values)
    return Check(
        f"accepted_values({col})",
        predicate=lambda: ~F.col(col).isin(vals) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str) -> Check:
    """Full-string regex expectation (reference matcher semantics)."""
    return Check(
        f"matches({col})",
        predicate=lambda: ~F.col(col).rlike(rf"\A(?:{pattern})\z")
        | F.col(col).isNull(),
    )


def unique(cols: list[str]) -> Check:
    """Violations = rows beyond the first per key (0 when key is unique)."""

    def _count(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1)), F.lit(0)
                ).alias("violations")
            )
        )

    return Check(f"unique({','.join(cols)})", counter=_count)


def referential(col: str, dim: DataFrame, dim_col: str) -> Check:
    """Violations = rows whose key has no match in the dimension."""

    def _count(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(col))
            .join(dim.select(F.col(dim_col).alias(col)), col, "left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
        )

    return Check(f"referential({col})", counter=_count)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every expectation → (rule, violations, passed) rows.

    All predicate checks fold into ONE aggregate over ``df``; each
    counter check contributes its own (small) aggregate; the union of
    1-row frames is negligible."""
    spark = df.sparkSession
    preds = [c for c in checks if c.predicate is not None]
    frames: list[DataFrame] = []
    if preds:
        aggs = [
            F.sum(F.when(c.predicate(), 1).otherwise(0))
            .cast("long")
            .alias(f"v{i}")
            for i, c in enumerate(preds)
        ]
        wide = df.agg(*aggs)
        # unpivot the single wide row into (rule, violations)
        stack = ", ".join(f"'{c.name}', v{i}" for i, c in enumerate(preds))
        frames.append(
            wide.selectExpr(
                f"stack({len(preds)}, {stack}) AS (rule, violations)"
            )
        )
    for c in checks:
        if c.counter is not None:
            frames.append(
                c.counter(df).select(
                    F.lit(c.name).alias("rule"),
                    F.coalesce(F.col("violations"), F.lit(0))
                    .cast("long")
                    .alias("violations"),
                )
            )
    if not frames:
        return spark.createDataFrame([], "rule string, violations long, passed boolean")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select(
        "rule", "violations", (F.col("violations") == 0).alias("passed")
    )

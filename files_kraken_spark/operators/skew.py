"""Skew-mitigation helpers for 100 TB joins/aggregations.

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in our session factory),
but two explicit tools remain necessary at the extremes:

- ``salted_join``: hot-key fact⋈dim joins where one key carries a
  disproportionate share of rows — salt the fact side N ways and
  replicate the dim side N times, so the hot key spreads over N tasks.
- ``two_phase_agg``: hot-group aggregations — partial aggregate on
  (key, salt) first, then final aggregate on key; the classic
  map-side-combine-with-salt pattern for re-aggregatable measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an N-way salt on the fact side.

    The dim side is exploded ``salt_buckets``× (only viable when dim is
    broadcast-sized or modestly sized); the fact side gets a random
    salt in [0, N) so a single hot key lands on N different shuffle
    partitions instead of one straggler task.

    Only ``inner`` and ``left`` are sound: an outer-preserved dim side
    would emit one null-padded row per unmatched SALT COPY (up to
    salt_buckets duplicates per dim row), so other modes are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "exploded dim side would duplicate outer-preserved rows "
            "per salt copy"
        )
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_map: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for re-aggregatable measures
    (sum/count/min/max): phase 1 groups on (key, salt), phase 2 merges
    the partials per key. ``agg_map``: output column → 'sum:col' |
    'count:*' | 'min:col' | 'max:col'."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1_aggs, phase2_aggs = [], []
    for out_col, spec in agg_map.items():
        op, col = spec.split(":", 1)
        if op == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(out_col))
            phase2_aggs.append(F.sum(out_col).alias(out_col))
        elif op in ("sum", "min", "max"):
            phase1_aggs.append(getattr(F, op)(col).alias(out_col))
            phase2_aggs.append(getattr(F, op)(out_col).alias(out_col))
        else:
            raise ValueError(f"unsupported agg op {op!r} (not re-aggregatable)")
    partial = salted.groupBy(key, "__salt").agg(*phase1_aggs)
    return partial.groupBy(key).agg(*phase2_aggs)

"""Incremental aggregate maintenance (continuous aggregates / IVM).

A 100 TB events table cannot re-aggregate from scratch every tick: the
rollup table (e.g. per-hour counts/sums) is maintained by MERGING each
micro-batch's partial aggregate into the stored aggregate — the
hypertable-style continuous-aggregate pattern. Works for any
re-aggregatable measure (sum/count/min/max); avg = sum/count at read
time.

Cost per tick: one partial aggregate over the batch (map-side combine,
tiny shuffle on the rollup keys) + one keyed merge against the rollup
table — both O(batch), never O(history).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def partial_rollup(batch: DataFrame, keys: list[str], aggs: dict[str, str]) -> DataFrame:
    """One micro-batch's partial aggregate. ``aggs``: output column →
    'op:col' with op ∈ sum|count|min|max ('count:*' counts rows)."""
    exprs: list[Column] = []
    for out, spec in aggs.items():
        op, col = spec.split(":", 1)
        if op == "count":
            exprs.append(F.count(F.lit(1)).alias(out))
        elif op in ("sum", "min", "max"):
            exprs.append(getattr(F, op)(col).alias(out))
        else:
            raise ValueError(f"{op!r} is not re-aggregatable (sum/count/min/max)")
    return batch.groupBy(*keys).agg(*exprs)


def merge_rollup(
    state: DataFrame, partial: DataFrame, keys: list[str], aggs: dict[str, str]
) -> DataFrame:
    """Merge a batch's partial aggregate into the rollup state: new
    keys insert, existing keys combine per measure (sum adds, min/max
    re-extremize). Both sides already carry one row per key."""
    merged = state.unionByName(partial)
    exprs = [
        _MERGES[spec.split(":", 1)[0]](out).alias(out)
        for out, spec in aggs.items()
    ]
    return merged.groupBy(*keys).agg(*exprs)

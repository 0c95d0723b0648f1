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


def histogram_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 1000,
    keys: list[str] | None = None,
) -> DataFrame:
    """Mergeable fixed-bin histogram — the 100 TB quantile pattern.

    Exact percentiles need a global sort; engine-native approximations
    (Spark GK, DuckDB t-digest) give engine-DEPENDENT answers. A fixed
    integer binning sidesteps both: bin = clamp(floor((x-lo)/w), 0,
    bins-1) is a narrow map, counts are BIGINTs (one partial-agg
    shuffle), and two sketches MERGE by adding counts — so per-shard /
    per-day sketches roll up without re-reading data, the property
    continuous aggregation needs. Quantile error is bounded by one bin
    width, chosen up front.
    """
    w = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(w))),
    ).cast("long")
    gcols = [*(keys or []), b.alias("bin")]
    # NULL measurements are EXCLUDED, not binned: Spark's greatest()
    # skips NULL operands, so floor(NULL) would otherwise collapse
    # into bin 0 and drag every quantile toward lo
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 1000,
    keys: list[str] | None = None,
) -> DataFrame:
    """Quantiles from a histogram sketch: the first bin whose running
    count reaches ceil(q·N), reported as the bin's LOWER BOUND —
    deterministic on every engine (no interpolation, no float
    accumulation; the only floats are the final lo + bin·w bound).
    One window pass over ≤bins rows per key group."""
    from pyspark.sql.window import Window

    w = (hi - lo) / bins
    kcols = keys or []
    wn = Window.partitionBy(*kcols).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(*kcols)
    cum = sketch.select(
        *kcols,
        "bin",
        F.sum("n").over(wn).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    out = None
    for q in qs:
        need = F.ceil(F.lit(q) * F.col("total")).cast("long")
        hit = (
            cum.filter(F.col("cum") >= need)
            .groupBy(*kcols)
            .agg(F.min("bin").alias("bin"))
            .select(
                *kcols,
                F.lit(q).alias("q"),
                (F.lit(lo) + F.col("bin") * F.lit(w)).alias("value"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out

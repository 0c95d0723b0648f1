"""As-of (point-in-time) join — the temporal lookup Spark lacks as a
built-in operator.

For every left row, attach the payload of the most recent right row
with ``right.ts <= left.ts`` (backward; ``forward`` inverts) within
the same key. This is the canonical feature-store / market-data /
training-snapshot lookup.

Distributed strategy — the union-tag trick, ONE shuffle total:

1. union the two sides, tagged, with right payloads as nullable cols;
2. one window per key ordered by (ts, side) — right rows sort before
   left rows at equal ts, making the match inclusive like DuckDB's
   ``ASOF JOIN ... ON l.ts >= r.ts``;
3. ``last(struct(payload...), ignorenulls=True)`` carries the latest
   right ROW forward onto each left row; keep left rows. The carry is
   one struct, not per-column: a per-column last() would skip a NULL
   payload field of the true match and resurrect an OLDER right row's
   value (and mix columns of different right rows in one output row).
   The struct is non-NULL for every right row even when its fields
   are NULL, so the match is whole-row and NULLs survive.

Compared to the naive approach (range join + per-left-row max
aggregation, which shuffles twice and explodes on wide time ranges),
the union-window plan shuffles each row once and never builds
intermediate pairs. Skewed keys serialize through one task, as with
any keyed window — pre-split hot keys upstream if a single key's rows
exceed one task's memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Return ``left`` with, per row, the payload columns of the
    closest preceding (``backward``, right.ts <= left.ts) or following
    (``forward``, right.ts >= left.ts) right row sharing ``on``.

    ``payload`` defaults to every right column except the key and
    timestamp. Payload columns are renamed ``<name><suffix>``; rows
    with no match carry NULLs (left-outer semantics). ``tolerance``
    bounds the match gap: a matched right row further than
    ``tolerance`` time units away is treated as no-match (payloads
    NULL) — the pandas ``merge_asof(tolerance=...)`` semantic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    payload = payload or [c for c in right.columns if c not in (on, right_ts)]
    carry = list(payload)
    if tolerance is not None:
        carry = carry + ["__match_ts"]
        right = right.withColumn("__match_ts", F.col(right_ts))

    lcols = left.columns
    row_type = right.select(*[F.col(p) for p in carry]).schema
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast(row_type).alias("__r"),
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__t"),
    )
    tagged_right = right.select(
        *[
            F.col(on).alias(c) if c == on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.struct(*[F.col(p).alias(p) for p in carry]).alias("__r"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__t"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    order: list[Column] = [F.col("__t"), F.col("__side")]
    if direction == "forward":
        order = [F.col("__t").desc(), F.col("__side")]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    carried = unioned.select(
        *lcols,
        "__side",
        *[matched[p].alias(f"{p}{suffix}") for p in carry],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        mts = F.col(f"__match_ts{suffix}")
        gap = (
            (F.col(left_ts) - mts) if direction == "backward" else (mts - F.col(left_ts))
        )
        in_range = mts.isNotNull() & (gap <= tolerance)
        out = out.select(
            *lcols,
            *[
                F.when(in_range, F.col(f"{p}{suffix}")).alias(f"{p}{suffix}")
                for p in payload
            ],
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Keyed interval (range) join: every (point, interval) pair with
    ``lo <= t <= hi`` and matching key — WITHOUT the broadcast-nested-
    loop plan Spark picks for raw inequality joins.

    Bucketization: intervals explode into the coarse time buckets they
    overlap (``floor(lo/w) … floor(hi/w)``); points carry their single
    bucket; the join is a plain equi-join on (key, bucket) followed by
    the exact range filter. Each pair meets exactly once (the point's
    bucket), so no dedup pass is needed. Cost scales with
    interval_span/bucket_width replicas per interval — size
    ``bucket_width`` near the typical interval length so replication
    stays O(1) and the shuffle is an ordinary hash partition at any
    corpus size.
    """
    b_points = points.withColumn(
        "__b", F.floor(F.col(t_col) / F.lit(bucket_width)).cast("long")
    )
    b_iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        b_points.join(b_iv, [on, "__b"])
        .filter((F.col(t_col) >= F.col(lo_col)) & (F.col(t_col) <= F.col(hi_col)))
        .drop("__b")
    )

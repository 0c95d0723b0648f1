"""Vector expressions over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``) —
JVM-side, no UDF, no Python crossing. At 100 TB these run inside
codegen; the LSH/IVF variants in ``operators/similarity.py`` bound the
candidate set so brute force is only ever per-bucket.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL for zero-norm inputs instead of a job-killing
    DIVIDE_BY_ZERO under Spark 4's default ANSI mode — a single
    all-zero embedding must not abort a corpus-wide similarity pass."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def hyperplane_sig(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed
    into a string like '1011…'. ``planes`` are fixed seed vectors so the
    signature is deterministic and cluster-reproducible."""
    bits = [
        F.when(dot(a, F.array(*[F.lit(float(v)) for v in p])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.concat(*bits)

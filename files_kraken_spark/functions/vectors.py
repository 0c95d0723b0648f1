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
    all-zero embedding must not abort a corpus-wide similarity pass.

    COST NOTE: Catalyst does not CSE across ``when`` branches, so
    ``denom`` (two full ``aggregate()`` norms) is evaluated twice per
    invocation. Fine per-row; NEVER use this inside a pair join — the
    round-4 bench showed +47% on ``sem_dedup`` from exactly that.
    Pair joins must pre-normalize each side once per ROW with
    :func:`unit` and compare plain :func:`dot` products instead."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def unit(a: Column) -> Column:
    """L2-normalize a vector once per ROW so pair joins can compare
    plain dot products (``dot(unit(a), unit(b)) == cosine(a, b)``).
    Moves the O(d) norm work from the E[n²/bucket] pair side to the n
    row side — the scale-safe shape for every bucketed similarity join.

    Zero-norm vectors map to all-zero outputs (dot = 0, below any
    positive threshold) rather than tripping ANSI DIVIDE_BY_ZERO.

    Evaluation-cost subtlety: a naive ``transform(a, x -> x/sqrt(n2))``
    re-evaluates the whole ``sqrt(aggregate(...))`` subtree PER ELEMENT
    — Catalyst does no CSE inside higher-order-function lambdas, so the
    row cost silently becomes O(d²) (measured 2-3.6× on the ANN bench).
    ``array_repeat`` evaluates its element argument ONCE, so pairing it
    with ``zip_with`` keeps the row cost O(d): one aggregate for the
    norm, one repeat, one element-wise multiply."""
    n2 = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    inv = F.array_repeat(F.lit(1.0) / F.sqrt(n2), F.size(a))
    return F.when(
        n2 > 0, F.zip_with(a, inv, lambda x, i: x.cast("double") * i)
    ).otherwise(F.transform(a, lambda x: F.lit(0.0)))


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

"""Cross-engine bit-identical transcendental helpers.

The oracle-determinism contract tolerates the engines' own ``ln`` only
when a 1-ulp libm divergence cannot flip a downstream rounding: Spark
evaluates ``java.lang.Math.log`` (JVM intrinsic, <=1 ulp, not
correctly rounded) while DuckDB calls C libm ``log`` — with enough
distinct inputs one eventually lands within an ulp of a fixed-point
rounding boundary and the two engines integerize differently. Round 8
hit exactly that: `t_kn_bigram_logprob` was green at sf0.001/sf0.01
and hash-failed at sf0.1 on a single 1e-6-unit term.

:func:`ln_posint_sql` is the fix for log-likelihood queries whose
probability is an exact RATIONAL N/D of int64 terms: compute
ln(N) - ln(D) where each ln runs a fixed sequence of basic IEEE ops —
exact range reduction n = m * 2^e with e = bit_length(n)-1 (so
m = n / 2^e is an EXACT double division by a power of two for
n < 2^53, m in [1, 2)), then the atanh series
ln(m) = 2 * t * (1 + t²/3 + t⁴/5 + ... + t¹⁶/17) with t = (m-1)/(m+1)
in [0, 1/3], evaluated in one fixed Horner shape. Basic IEEE +,-,*,/
are CORRECTLY rounded on every engine, so the whole chain is
bit-identical wherever the same expression shape runs; series
truncation error (< 1e-10 on ln, i.e. < 1e-4 of a 1e-6 fixed-point
unit) shifts both engines identically and never diverges them.
The LN2 constant is parsed from a STRING on both sides
(Double.parseDouble / strtod are correctly rounded; a DECIMAL literal
route could differ by an ulp).

The same generated expression text serves both engines: it uses only
`transform`/`list_transform`-style HOF let-bindings (each intermediate
bound once, so the text stays linear), `bin`, `shiftleft`/`<<`, and
arithmetic — all present in Spark SQL and DuckDB with identical
semantics on these inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: nearest double to ln(2), parsed identically by both engines
LN2_STR = "0.6931471805599453"

#: atanh-series Horner denominators (through t^17/17)
_SERIES = [3, 5, 7, 9, 11, 13, 15, 17]


def _horner(t2: str) -> str:
    """1 + t2*(1/3 + t2*(1/5 + ... )) with identical-literal coefficient
    divisions (CAST(1 AS DOUBLE)/CAST(k AS DOUBLE) is one correctly
    rounded IEEE divide on either engine)."""
    expr = f"CAST(1 AS DOUBLE) / CAST({_SERIES[-1]} AS DOUBLE)"
    for k in reversed(_SERIES[:-1]):
        expr = f"CAST(1 AS DOUBLE) / CAST({k} AS DOUBLE) + {t2} * ({expr})"
    return f"CAST(1 AS DOUBLE) + {t2} * ({expr})"


def ln_posint_sql(n: str, spark_dialect: bool) -> str:
    """Expression text for ln({n}) where ``{n}`` is a positive BIGINT
    expression with value < 2^53. ``spark_dialect`` picks Spark's
    ``transform(...)[0]`` vs DuckDB's ``list_transform(...)[1]``
    let-binding spelling; every arithmetic op is spelled identically."""
    if spark_dialect:
        tf, arr, idx = "transform", "array", "[0]"
    else:
        tf, arr, idx = "list_transform", "list_value", "[1]"

    def let(val: str, var: str, body: str) -> str:
        return f"{tf}({arr}({val}), {var} -> {body}){idx}"

    shift = (
        "shiftleft(CAST(1 AS BIGINT), length(bin(nn)) - 1)"
        if spark_dialect
        else "(CAST(1 AS BIGINT) << (length(bin(nn)) - 1))"
    )
    body = (
        f"CAST(length(bin(nn)) - 1 AS DOUBLE) * CAST('{LN2_STR}' AS DOUBLE)"
        f" + CAST(2 AS DOUBLE) * (tt * ({_horner('t2')}))"
    )
    inner = let("tt * tt", "t2", body)
    inner = let("(mm - CAST(1 AS DOUBLE)) / (mm + CAST(1 AS DOUBLE))", "tt", inner)
    inner = let(f"CAST(nn AS DOUBLE) / CAST({shift} AS DOUBLE)", "mm", inner)
    return let(f"CAST({n} AS BIGINT)", "nn", inner)


def ln_posint(col_name: str) -> Column:
    """Spark Column: portable ln of the positive BIGINT column named
    ``col_name`` (must be a column NAME — the shift-by-column lives
    inside an F.expr)."""
    return F.expr(ln_posint_sql(col_name, spark_dialect=True))


def ln_posint_py(n: int) -> float:
    """Pure-Python mirror of :func:`ln_posint_sql` — the SAME fixed
    sequence of basic IEEE double ops (CPython floats are IEEE754
    binary64 with correctly rounded +,-,*,/ — identical semantics to
    the SQL chain on either engine), so a Python-side fold (e.g. the
    streaming HLL sketch's linear-counting branch) produces the
    bit-identical value its SQL batch-replay oracle computes.
    ``n`` must be a positive int < 2^53."""
    e = n.bit_length() - 1
    m = n / float(1 << e)  # exact: division by a power of two
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    acc = 1.0 / float(_SERIES[-1])
    for k in reversed(_SERIES[:-1]):
        acc = 1.0 / float(k) + t2 * acc
    horner = 1.0 + t2 * acc
    return float(e) * float(LN2_STR) + 2.0 * (t * horner)

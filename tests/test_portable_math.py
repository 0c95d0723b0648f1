"""Cross-engine bit-identity of the portable integer ln
(functions/portable_math): the whole point of the helper is that the
SAME expression shape evaluates to the SAME double on Spark and
DuckDB, so fixed-point integerizations downstream can never diverge
(the failure mode the engines' own libm ln exhibited at sf0.1 in
t_kn_bigram_logprob)."""

import math
import struct

import duckdb

from files_kraken_spark.functions.portable_math import (
    ln_posint,
    ln_posint_sql,
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_portable_ln_bit_identical_spark_vs_duckdb(spark):
    vals = (
        list(range(1, 3000))
        + [2**k for k in range(1, 53)]
        + [2**k - 1 for k in range(2, 53)]
        + [2**k + 1 for k in range(2, 52)]
        + [34_000_000, 999983 * 7919, 2**53 - 1]
    )
    sdf = spark.createDataFrame([(v,) for v in vals], "x long").select(
        "x", ln_posint("x").alias("l")
    )
    got_s = {r["x"]: r["l"] for r in sdf.collect()}
    con = duckdb.connect()
    got_d = dict(
        con.execute(
            f"SELECT x, {ln_posint_sql('x', spark_dialect=False)} "
            "FROM (SELECT unnest($1::BIGINT[]) AS x)",
            [vals],
        ).fetchall()
    )
    bad = [v for v in vals if _bits(got_s[v]) != _bits(got_d[v])]
    assert bad == []


def test_portable_ln_accuracy():
    """Series truncation stays under 2e-10 absolute — far inside the
    1e-6 fixed-point grain the log-likelihood queries integerize at."""
    con = duckdb.connect()
    vals = list(range(1, 5000)) + [2**52 - 1, 10**12 + 7]
    rows = con.execute(
        f"SELECT x, {ln_posint_sql('x', spark_dialect=False)} "
        "FROM (SELECT unnest($1::BIGINT[]) AS x)",
        [vals],
    ).fetchall()
    worst = max(abs(l - math.log(x)) for x, l in rows)
    assert worst < 2e-10


def test_portable_ln_exact_at_one():
    con = duckdb.connect()
    (l,) = con.execute(
        f"SELECT {ln_posint_sql('1', spark_dialect=False)}"
    ).fetchone()
    assert l == 0.0


def test_ln_posint_py_bit_identical_to_sql(spark):
    """The pure-Python mirror (used by the streaming HLL fold's
    linear-counting branch) produces the SAME bits as both SQL
    dialects — so the Python fold, the Spark replay, and the DuckDB
    oracle can never diverge on the correction term."""
    from files_kraken_spark.functions.portable_math import ln_posint_py

    vals = (
        list(range(1, 2000))
        + [2**k for k in range(1, 53)]
        + [2**k - 1 for k in range(2, 53)]
        + [2**53 - 1]
    )
    con = duckdb.connect()
    got_d = dict(
        con.execute(
            f"SELECT x, {ln_posint_sql('x', spark_dialect=False)} "
            "FROM (SELECT unnest($1::BIGINT[]) AS x)",
            [vals],
        ).fetchall()
    )
    bad = [v for v in vals if _bits(ln_posint_py(v)) != _bits(got_d[v])]
    assert bad == []
    sdf = spark.createDataFrame([(v,) for v in vals[:256]], "x long").select(
        "x", ln_posint("x").alias("l")
    )
    got_s = {r["x"]: r["l"] for r in sdf.collect()}
    bad_s = [v for v in vals[:256] if _bits(ln_posint_py(v)) != _bits(got_s[v])]
    assert bad_s == []

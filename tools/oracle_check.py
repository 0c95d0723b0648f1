"""Local mirror of the driver's t2 correctness gate.

Runs every registry query on Spark and its oracle on DuckDB at the
given sf dir, compares row count, column names, and an
order-insensitive value hash.

Round-2 hardening: the driver canonicalizes through *pandas*
(`spark.collect -> pd`, `duckdb .df()`), which surfaces two failure
modes the old tuple-based mirror missed:
  - DuckDB HUGEINT (bare ``sum(int)``) becomes float64 -> "123.0" vs
    Spark int64 "123" => hash mismatch despite equal values.
  - list-typed result columns crash pandas ``sort_values``.
So this mirror now fetches both sides as pandas, FAILS on any
int-vs-float dtype split or array-typed column, and hashes floats at
full precision (repr) instead of 6 significant digits.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from files_kraken_spark.queries import REGISTRY
from files_kraken_spark.session import get_session

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = df[cols].itertuples(index=False, name=None)
    row_strs = sorted("|".join(canon(v) for v in r) for r in rows)
    h = hashlib.sha256()
    for s in row_strs:
        h.update(s.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def row_strs(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(
        "|".join(canon(v) for v in r)
        for r in df[cols].itertuples(index=False, name=None)
    )


def _kind(dtype) -> str:
    try:
        return dtype.kind
    except AttributeError:  # pandas extension dtypes
        return "O"


def canon_hazards(sdf_pd: pd.DataFrame, odf_pd: pd.DataFrame) -> list[str]:
    """Driver-canon failure modes: int/float dtype splits, array columns."""
    out = []
    for c in sorted(sdf_pd.columns):
        if c not in odf_pd.columns:
            continue
        sk, ok = _kind(sdf_pd[c].dtype), _kind(odf_pd[c].dtype)
        if (sk in "iu" and ok == "f") or (sk == "f" and ok in "iu"):
            out.append(f"dtype split {c}: spark={sdf_pd[c].dtype} oracle={odf_pd[c].dtype}")
        if ("M" in (sk, ok)) and sk != ok:
            # datetime64 stringifies "1998-01-01 00:00:00" vs datetime.date
            # "1998-01-01" — project DATE results as ISO strings instead
            out.append(f"datetime split {c}: spark={sdf_pd[c].dtype} oracle={odf_pd[c].dtype}")
        # all-NULL Spark double column: collect->pandas leaves it object
        # (hashes "NULL") while DuckDB NULL doubles surface as float64
        # NaN via .df() — a scale-dependent hash split (a query can be
        # green at sf0.01 and fail wherever the column goes all-NULL).
        # Fix in the QUERY: emit NaN on both sides for no-result rows
        # (see q_bass_diffusion_fit, round 8).
        if sk == "O" and ok == "f" and sdf_pd[c].isna().all() and len(sdf_pd):
            out.append(
                f"all-NULL spark column {c} vs double oracle column "
                "(NULL-vs-NaN canon split: emit NaN, not NULL)"
            )
        for side, df in (("spark", sdf_pd), ("oracle", odf_pd)):
            col = df[c]
            if _kind(col.dtype) == "O":
                nn = col.dropna()
                if len(nn) and isinstance(nn.iloc[0], (list, np.ndarray)):
                    out.append(f"array-typed column {c} on {side} (driver canon crashes)")
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"FAIL unknown query name(s): {unknown} — see REGISTRY")
        names = [n for n in names if n in REGISTRY]
        n_fail += len(unknown)
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        # full-registry runs share one session: clear cached frames a
        # query persisted internally (LSH candidates, dedup pairs) so
        # storage memory stays bounded across 160+ queries
        spark.catalog.clearCache()
        try:
            sdf = spec.spark(spark, sf_dir)
            scols = sdf.columns
            sdf_pd = pd.DataFrame(
                [tuple(r) for r in sdf.collect()], columns=scols, dtype=None
            )
            # let pandas infer dtypes the way the driver's collect-based
            # canon does (int64 for non-null ints, object for strings)
            sdf_pd = sdf_pd.infer_objects()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows {name}: {len(sdf_pd)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf_pd = con.execute(spec.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(odf_pd.columns):
            problems.append(
                f"cols spark={sorted(scols)} oracle={sorted(odf_pd.columns)}"
            )
        if len(sdf_pd) != len(odf_pd):
            problems.append(f"rowcount spark={len(sdf_pd)} oracle={len(odf_pd)}")
        if not problems:
            problems.extend(canon_hazards(sdf_pd, odf_pd))
        if not problems:
            sh, oh = table_hash(sdf_pd), table_hash(odf_pd)
            if sh != oh:
                problems.append(f"hash spark={sh} oracle={oh}")
                diffs = [
                    (a, b) for a, b in zip(row_strs(sdf_pd), row_strs(odf_pd)) if a != b
                ][:3]
                for a, b in diffs:
                    print(f"    spark : {a[:160]}\n    oracle: {b[:160]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf_pd)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

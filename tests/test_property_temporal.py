"""Property-based parity for the temporal joins: asof_join and
interval_join must agree with naive Python references on arbitrary
keyed event sets (random keys, timestamps, duplicates, ties)."""

from __future__ import annotations


import os
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from files_kraken_spark.operators.asof import asof_join, interval_join

KEYS = st.sampled_from(["a", "b", "c"])
TS = st.integers(min_value=0, max_value=50)

LEFT_ROWS = st.lists(st.tuples(KEYS, TS), min_size=1, max_size=15)
RIGHT_ROWS = st.lists(st.tuples(KEYS, TS, st.integers(0, 999)), min_size=0, max_size=15)


# Trimmed default example count (r13 verdict item 2: suite wall time
# overran the driver's pytest budget). Derandomized profile => same
# first-N cases every run; set SPARK_GRAFT_PROP_EXAMPLES for a wider sweep.
_N_EX = int(os.environ.get("SPARK_GRAFT_PROP_EXAMPLES", "6"))


@pytest.fixture(scope="module")
def frames(spark):
    def _make(left_rows, right_rows):
        left = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left_rows)],
            "k string, t long, lid long",
        )
        right = spark.createDataFrame(
            right_rows or [("__none__", -1, -1)], "k string, t long, v long"
        )
        return left, right

    return _make


@settings(max_examples=_N_EX, deadline=None, suppress_health_check=list(HealthCheck))
@given(LEFT_ROWS, RIGHT_ROWS)
def test_asof_backward_property(frames, left_rows, right_rows):
    # dedupe right per (k, t): keep max v — mirrors the documented
    # requirement that the right side is unique per (key, ts)
    dedup = {}
    for k, t, v in right_rows:
        dedup[(k, t)] = max(v, dedup.get((k, t), -1))
    rrows = [(k, t, v) for (k, t), v in dedup.items()]
    left, right = frames(left_rows, rrows)
    got = {
        r["lid"]: r["v_asof"]
        for r in asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()
    }
    for i, (k, t) in enumerate(left_rows):
        cands = [(rt, v) for rk, rt, v in rrows if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (k, t, rrows)


@settings(max_examples=_N_EX, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12),
    st.lists(st.tuples(KEYS, TS, TS), min_size=0, max_size=12),
    st.sampled_from([1, 3, 7, 64]),
)
def test_interval_join_property(spark, points, raw_ivals, width):
    ivals = [(k, i, min(a, b), max(a, b)) for i, (k, a, b) in enumerate(raw_ivals)]
    p = spark.createDataFrame(points, "k string, t long")
    iv = spark.createDataFrame(
        ivals or [("__none__", -1, 0, 0)], "k string, iv_id long, lo long, hi long"
    )
    got = sorted(
        (r["k"], r["t"], r["iv_id"])
        for r in interval_join(p, iv, "k", "t", "lo", "hi", bucket_width=width).collect()
    )
    want = sorted(
        (pk, pt, ivid)
        for pk, pt in points
        for ik, ivid, lo, hi in ivals
        if pk == ik and lo <= pt <= hi
    )
    assert got == want, (points, ivals, width)


def test_asof_null_payload_of_true_match_survives(spark):
    """Review regression: per-column ignorenulls carry resurrected an
    OLDER right row's value when the true match's payload was NULL.
    The whole-row struct carry must return the true match's NULL."""
    from files_kraken_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, 1, 5.0, "p1"), (1, 2, None, "p2")],
        "k long, t long, x double, tag string",
    )
    left = spark.createDataFrame([(1, 3)], "k long, t long")
    row = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        payload=["x", "tag"], suffix="",
    ).collect()[0]
    assert row["tag"] == "p2"  # newest row at t=2 is the match
    assert row["x"] is None    # its NULL x must NOT fall back to t=1's 5.0

    # tolerance interacts: match_ts and values come from the SAME row
    row = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        payload=["x", "tag"], suffix="", tolerance=1,
    ).collect()[0]
    assert row["tag"] == "p2" and row["x"] is None

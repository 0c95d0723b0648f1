"""Guard the driver-facing bench stdout contract (round-12 verdict
item 1): BENCH_r12 recorded parsed:null because the stdout JSON line
(~2.9 KB with 47 extra_queries) outgrew the driver's tail capture and
was beheaded mid-value. bench.build_compact_line must emit a line that
(a) stays under 1 KB with the REAL headline list, (b) parses as JSON,
(c) carries the keys the driver's record format documents. No Spark
session needed — this is pure string/dict logic."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _record(queries: dict) -> dict:
    return {
        "metric": "headline_queries_total_time",
        "value": 5.566,
        "unit": "sec",
        "queries": queries,
        "extra_queries": {f"x_{i}": 0.123 for i in range(60)},
        "sf": 0.1,
        "runs_per_query": 5,
        "agg": "min",
        "value_per_control": 17.63,
        "query_per_control": {k: 1.0 for k in queries},
        "control_healthy": True,
        "control_ceiling_sec": 0.35,
        "spread": {k: 1.42 for k in queries},
        "control_sec": [0.301, 0.442],
        "control2_sec": [1.908, 2.051],
        "control2_query": "dedup_minhash_lsh",
        "load_drift": 1.47,
        "retried": False,
        "raw_runs": {k: [0.2] * 5 for k in queries},
    }


def test_compact_line_under_1kb_with_real_headline():
    # The actual headline list bench.py times, worst-case value widths
    queries = {name: 12.345 for name in bench.HEADLINE}
    line = bench.build_compact_line(_record(queries))
    assert len(line) < 1000, f"stdout line {len(line)}B >= 1KB budget"
    parsed = json.loads(line)
    assert parsed["value"] == 5.566
    assert parsed["unit"] == "sec"
    assert parsed["metric"] == "headline_queries_total_time"
    assert parsed["queries"] == queries
    assert parsed["record_file"] == "BENCH_local.json"
    # per-extra-query maps must NOT leak onto stdout
    for banned in ("extra_queries", "spread", "raw_runs", "query_per_control"):
        assert banned not in parsed
    # two-point control (round-12 verdict item 7)
    assert parsed["control_sec"] == [0.301, 0.442]
    assert parsed["control2_sec"] == [1.908, 2.051]


def test_compact_line_drops_queries_rather_than_exceed_budget():
    # A pathological future headline list (many long names) must shed
    # the queries map, never emit an oversized line
    queries = {f"q_extremely_long_operator_name_{i:03d}": 1.0 for i in range(40)}
    line = bench.build_compact_line(_record(queries))
    assert len(line) < 1000
    parsed = json.loads(line)
    assert "queries" not in parsed
    assert parsed["value"] == 5.566


def test_compact_line_is_single_line():
    line = bench.build_compact_line(_record({n: 0.5 for n in bench.HEADLINE}))
    assert "\n" not in line

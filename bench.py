"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from files_kraken_spark.queries import REGISTRY
from files_kraken_spark.session import get_session

HEADLINE = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q_topk_orders",
    "q_window_topn_per_group",
    "q_events_hourly",
    "q_sessionize",
    "d1_snapshot_diff",
    "a6_merge_list",
    "a11_upsert_reconcile",
    "f2_search_extract",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "t_quality_score",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session("files-kraken-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once so timings measure the queries, not startup.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY[name]
        t0 = time.time()
        df = spec.spark(spark, sf_dir)
        # noop sink: materializes EVERY column/expression (count() would
        # let Catalyst prune unused projections and under-measure)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Scale-sweep runner (rounds 10-12 methodology, persisted in-repo):
min-of-N cache-cleared wall times for named registry queries across
scale dirs, emitting the SCALING.md table columns (x10 wall ratio +
top-decade exponent).

    python tools/sweep.py QUERY [QUERY ...] \
        [--dirs /root/testdata/sf0.01,/root/testdata/sf0.1,/tmp/sf1x10] \
        [--runs 2]

The 10x dir is built by tools/synth_tenx.py. Each (query, dir) point
clears the Spark cache and materializes the result through the noop
sink (bench.py's technique — count() would let Catalyst prune the
projections and under-measure), reporting the min over --runs runs;
serve_state-backed queries pay their state build on run 1 and report
the warm serve cost, matching the bench harness's min-of-N semantics.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from files_kraken_spark.queries import REGISTRY
from files_kraken_spark.session import get_session

DEFAULT_DIRS = "/root/testdata/sf0.01,/root/testdata/sf0.1,/tmp/sf1x10"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--dirs", default=DEFAULT_DIRS)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    dirs = args.dirs.split(",")
    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1

    spark = get_session("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM/codegen once so point 1 isn't startup
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict[str, dict[str, float]] = {}
    for name in args.queries:
        spec = REGISTRY[name]
        out[name] = {}
        for d in dirs:
            best = math.inf
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.time()
                spec.spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            out[name][d] = round(best, 2)
            print(f"{name} @ {d}: {out[name][d]}s", flush=True)
        pts = [out[name][d] for d in dirs]
        if len(pts) >= 2 and pts[-2] > 0:
            # The ratio is computed from the LAST PAIR of --dirs,
            # whatever they are; the derived exponent assumes that
            # pair is a decade apart (the default dirs' sf0.1 ->
            # 10x layout). Infer the actual log10 spacing from the
            # dirs' sf labels when both parse, so non-decade pairs
            # are normalized instead of silently mislabeled
            # (round-12 ADVICE item 3).
            import re as _re

            def _sf(d: str) -> float | None:
                # "sf1x10" names the 10-copies-of-sf0.1 corpus: the
                # numeric prefix (1) IS its effective scale factor —
                # the x10 suffix records the recipe, not a multiplier
                m = _re.search(r"sf([0-9.]+?)(x10)?$", os.path.basename(d.rstrip("/")))
                return float(m.group(1)) if m else None

            ratio = pts[-1] / pts[-2]
            s_lo, s_hi = _sf(dirs[-2]), _sf(dirs[-1])
            decades = (
                math.log10(s_hi / s_lo)
                if s_lo and s_hi and s_hi > s_lo
                else 1.0
            )
            expo = (
                math.log10(ratio) / decades if ratio > 0 else float("nan")
            )
            print(
                f"{name}: last-pair wall ratio {ratio:.2f} over "
                f"{decades:.2f} decade(s), exponent {expo:.2f}",
                flush=True,
            )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

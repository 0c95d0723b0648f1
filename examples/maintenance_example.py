"""Runnable tour of the round-11 maintain-vs-retrain surface: persist
state once, then serve merges for appends, tombstones, and a mixed
CDC changefeed — with the stats-driven router deciding when a merge
is even worth it.

    python examples/maintenance_example.py [sf_dir]

(defaults to /root/testdata/sf0.001; finishes in ~2 min on local[*])

Walks five maintained-state families:

1. PageRank over the supply graph — trajectory persisted, then a
   mixed changefeed (late-order pairs retracted AND added) applied
   through `pagerank_apply_changes`; `pagerank_maintain`'s auto probe
   measures the one-hop dirty fraction first and routes to a retrain
   when the frontier saturates (on this dense bipartite graph it
   always does — SCALING.md round-11 has the measured table).
2. Connected components over the near-dup pair graph — incremental
   label merge for an append batch, component-local rebuild for a
   tombstone batch, and (round 12) `cc_maintain`'s damage-fraction
   router picking merge-vs-retrain from the data.
3. BM25 text index — counters sum for appends, subtract for
   retractions; serving reads the merged state, never rescans the
   surviving corpus.
4. The observability row an operator watches: the frontier-saturation
   curve that calibrates the router.
5. (round 12) A relational join-aggregate view under a mixed
   changefeed — delta-join inserts, counter subtraction, MIN/MAX
   re-election over only the retraction-affected groups.
6. (round 13) Declarative MOMENT measures: mean/variance maintained
   as integer power sums through the same spec-driven core —
   pure-counter specs need no survivor table and take the router's
   zero-probe fast path.
7. (round 13) Mergeable Misra-Gries heavy hitters: the top-talkers
   summary capped at k rows of state however many users exist,
   base ⊕ batch merged by pairwise residue sum + one reduction.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from files_kraken_spark.operators import dedup as DD
from files_kraken_spark.operators import text_index as TI
from files_kraken_spark.operators.graph import (
    pagerank_apply_changes,
    pagerank_history,
    pagerank_maintain,
)
from files_kraken_spark.session import get_session
from files_kraken_spark.sources.tables import load_table

TERMS = ("spark", "table", "window")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("maintenance-example")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. PageRank: persist a trajectory, apply a mixed changefeed
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def pairs(o):
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .select(F.col("l_suppkey").alias("sk"), F.col("o_custkey").alias("ck"))
            .distinct()
        )

    def sym(p):
        fwd = p.select(
            F.col("sk").alias("src"), (F.lit(10_000_000) + F.col("ck")).alias("dst")
        )
        return fwd.unionByName(
            p.select(
                (F.lit(10_000_000) + F.col("ck")).alias("src"),
                F.col("sk").alias("dst"),
            )
        )

    p_base = pairs(orders.filter(F.col("o_orderkey") % 10 < 9)).persist()
    p_post = pairs(
        orders.filter(
            (F.col("o_orderkey") % 10 < 8) | (F.col("o_orderkey") % 10 == 9)
        )
    ).persist()
    added = sym(p_post.join(p_base, ["sk", "ck"], "left_anti"))
    retracted = sym(p_base.join(p_post, ["sk", "ck"], "left_anti"))
    hist = pagerank_history(sym(p_base), iters=3)

    merged = pagerank_apply_changes(sym(p_post), added, retracted, hist, iters=3)
    print("[pagerank] post-changefeed ranks:", merged.count())

    # the router measures before it merges — on this graph it warns
    # and retrains (same bit-identical result, much cheaper)
    routed = pagerank_maintain(
        sym(p_post), added, hist, iters=3, retracted_edges=retracted
    )
    print("[pagerank] routed result rows:", routed.count())

    # ---- 2. Connected components: append merge + tombstone rebuild
    docs = load_table(spark, sf_dir, "documents")
    pr = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    pr = pr.select("id_a", "id_b").persist()
    both_base = (F.col("id_a") % 10 < 8) & (F.col("id_b") % 10 < 8)
    state = DD.connected_components(pr.filter(both_base))
    grown = DD.cc_incremental(state, pr.filter(~both_base))
    print("[cc] components after append merge:",
          grown.select("component").distinct().count())
    full_state = DD.connected_components(pr)
    shrunk = DD.cc_decremental(
        full_state, pr.filter(both_base), pr.filter(~both_base)
    )
    print("[cc] components after tombstone rebuild:",
          shrunk.select("component").distinct().count())

    # round-12: the CC router measures the tombstone DAMAGE fraction
    # (share of docs in components the retraction touches) and picks
    # merge vs retrain — bit-identical labels either way
    routed_cc = DD.cc_maintain(
        full_state, pr.filter(both_base),
        retracted_pairs=pr.filter(~both_base),
    )
    print("[cc] routed tombstone result rows:", routed_cc.count())

    # ---- 3. BM25 index: counters sum on append, subtract on retract
    base = docs.filter(F.col("doc_id") % 10 < 8)
    batch = docs.filter(~(F.col("doc_id") % 10 < 8))
    m_b = TI.doc_term_stats(base, TERMS)
    g_b = TI.index_stats(m_b, 3)
    m_n = TI.doc_term_stats(batch, TERMS)
    g_n = TI.index_stats(m_n, 3)
    g_u = TI.merge_index_stats(g_b, g_n, 3)
    top = (
        TI.bm25_scores(m_b.unionByName(m_n), g_u, 3)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(3)
        .collect()
    )
    print("[bm25] merged-index top-3:", [(r["doc_id"], r["bm25"]) for r in top])

    # ---- 4. The router's calibration row
    from files_kraken_spark.queries import REGISTRY

    REGISTRY["g_pagerank_frontier_curve"].spark(spark, sf_dir).show()

    # ---- 5. Round-12: relational IVM — a join-aggregate view kept
    # current under a mixed changefeed (delta-join inserts, counter
    # subtraction, MIN/MAX re-election over affected groups only)
    from files_kraken_spark.operators import ivm as IVM

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o_base = orders.filter(F.col("o_orderkey") % 10 < 8)
    o_ins = orders.filter(~(F.col("o_orderkey") % 10 < 8))
    tomb = o_base.filter(F.col("o_orderkey") % 40 == 1)
    keep = o_base.filter(F.col("o_orderkey") % 40 != 1)
    state = IVM.view_aggregate(IVM.fact_rows(o_base, lineitem))
    ins = IVM.fact_rows(o_ins, lineitem)
    survivors = IVM.fact_rows(keep, lineitem).unionByName(ins)
    view = IVM.apply_changes(
        state, ins, IVM.fact_rows(tomb, lineitem), survivors
    )
    print("[ivm] view groups after changefeed:", view.count())

    # ---- 6. Round-13: declarative MOMENT measures — mean/variance as
    # pure power-sum counters through the same core (no survivor table
    # needed: every measure is subtractable, the router's zero-probe
    # fast path)
    mom = (
        IVM.Measure("n_items", "count"),
        IVM.Measure("sum_qty", "sum", "qty"),
        IVM.Measure("sum_qty2", "sum", "qty2"),
    )

    def mfacts(o):
        f = IVM.fact_rows(o, lineitem)
        return f.withColumn("qty2", F.col("qty") * F.col("qty"))

    mstate = IVM.view_aggregate(mfacts(o_base), measures=mom)
    mview, info = IVM.ivm_maintain(
        mstate, mfacts(o_ins), mfacts(tomb), measures=mom, mode="auto"
    )
    print("[moments] route:", info["route"], "(zero probe jobs)")
    print(
        "[moments] sample variance numerators:",
        [
            (r["o_custkey"],
             r["n_items"] * r["sum_qty2"] - r["sum_qty"] ** 2)
            for r in mview.orderBy("o_custkey").limit(3).collect()
        ],
    )

    # ---- 7. Round-13: mergeable Misra-Gries heavy hitters — the
    # top-talkers summary capped at k rows however many users exist
    ev = load_table(spark, sf_dir, "events")
    k = 16
    e_base = ev.filter(F.col("event_id") % 5 != 0)
    e_batch = ev.filter(F.col("event_id") % 5 == 0)
    hh = IVM.merge_mg(
        IVM.mg_reduce(IVM.mg_counts(e_base, "user_id"), "user_id", k),
        IVM.mg_reduce(IVM.mg_counts(e_batch, "user_id"), "user_id", k),
        "user_id",
        k,
    )
    rows = hh.orderBy(F.col("cnt").desc(), "user_id").limit(3).collect()
    print(
        f"[mg] top talkers (k={k} rows of state):",
        [(r["user_id"], r["cnt"]) for r in rows],
    )

    spark.stop()


if __name__ == "__main__":
    main()

"""Round-12 relational IVM: merging insert/retraction batches into a
join-aggregate view must be BIT-IDENTICAL to the from-scratch build —
the same maintain-vs-retrain contract the graph
(test_graph_maintenance), BM25 (test_text_index) and curation
families carry. queries/view_maintenance.py holds the oracle
evidence; these pin the operator-level equalities on adversarial
shapes: a group emptied by retraction, a MIN held by a retracted row,
a group losing its min to a tombstone and regaining a smaller one
from the same batch's inserts."""

from __future__ import annotations

from pyspark.sql import functions as F

from files_kraken_spark.operators import ivm as IVM


def _orders(spark, rows):
    return spark.createDataFrame(rows, ["o_orderkey", "o_custkey"])


def _lines(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )


def _vmap(df):
    return {
        r["o_custkey"]: (
            r["n_items"],
            r["sum_qty"],
            r["sum_rev_c100"],
            r["min_price_c"],
            r["max_qty"],
        )
        for r in df.collect()
    }


def test_insert_merge_equals_from_scratch(spark):
    o_base = _orders(spark, [(1, 10), (2, 10), (3, 20)])
    o_delta = _orders(spark, [(4, 20), (5, 30)])  # 30 is a NEW group
    l_base = _lines(
        spark,
        [
            (1, 1, 5.0, 100.00, 0.05),
            (2, 1, 7.0, 50.00, 0.00),
            (3, 1, 2.0, 999.99, 0.10),
            (4, 1, 9.0, 10.00, 0.02),  # base line of a DELTA order
        ],
    )
    l_delta = _lines(
        spark,
        [
            (2, 2, 1.0, 5.00, 0.00),  # delta line of a base order
            (5, 1, 3.0, 77.77, 0.07),  # delta ⋈ delta
        ],
    )
    state = IVM.view_aggregate(IVM.fact_rows(o_base, l_base))
    delta = (
        IVM.fact_rows(o_delta, l_base)
        .unionByName(IVM.fact_rows(o_base, l_delta))
        .unionByName(IVM.fact_rows(o_delta, l_delta))
    )
    merged = IVM.merge_insert(state, delta)
    scratch = IVM.view_aggregate(
        IVM.fact_rows(
            o_base.unionByName(o_delta), l_base.unionByName(l_delta)
        )
    )
    assert _vmap(merged) == _vmap(scratch)


def test_retraction_reelects_min_and_drops_empty_group(spark):
    # group 10: order 1 holds BOTH the min price and the max qty;
    # group 20: its only order tombstones -> group must vanish
    o = _orders(spark, [(1, 10), (2, 10), (3, 20)])
    l = _lines(
        spark,
        [
            (1, 1, 9.0, 10.00, 0.00),  # min price AND max qty holder
            (2, 1, 4.0, 200.00, 0.00),
            (3, 1, 1.0, 5.00, 0.00),
        ],
    )
    state = IVM.view_aggregate(IVM.fact_rows(o, l))
    tomb = o.filter(F.col("o_orderkey").isin(1, 3))
    keep = o.filter(~F.col("o_orderkey").isin(1, 3))
    merged = IVM.apply_changes(
        state,
        None,
        IVM.fact_rows(tomb, l),
        IVM.fact_rows(keep, l),
    )
    got = _vmap(merged)
    assert set(got) == {10}  # group 20 emptied -> dropped
    # re-election found order 2's values, not stale least/greatest
    assert got[10] == (1, 4, 200_00 * 100, 200_00, 4)
    scratch = IVM.view_aggregate(IVM.fact_rows(keep, l))
    assert got == _vmap(scratch)


def test_changefeed_min_lost_and_regained_smaller(spark):
    # group 10 loses its min (order 1, $10) to a tombstone and gains
    # an even smaller one ($3) from the SAME batch's insert side —
    # folding state-min with insert-min without re-election would
    # wrongly keep $10
    o_base = _orders(spark, [(1, 10), (2, 10)])
    l_base = _lines(
        spark, [(1, 1, 2.0, 10.00, 0.00), (2, 1, 6.0, 500.00, 0.00)]
    )
    o_ins = _orders(spark, [(9, 10)])
    l_ins = _lines(spark, [(9, 1, 1.0, 3.00, 0.00)])

    state = IVM.view_aggregate(IVM.fact_rows(o_base, l_base))
    ins = IVM.fact_rows(o_ins, l_ins)
    tomb = o_base.filter(F.col("o_orderkey") == 1)
    keep = o_base.filter(F.col("o_orderkey") != 1)
    survivors = IVM.fact_rows(keep, l_base).unionByName(ins)
    merged = IVM.apply_changes(state, ins, IVM.fact_rows(tomb, l_base), survivors)
    scratch = IVM.view_aggregate(survivors)
    assert _vmap(merged) == _vmap(scratch)
    assert _vmap(merged)[10][3] == 3_00  # the batch's own $3 min won


def test_empty_delta_is_identity(spark):
    o = _orders(spark, [(1, 10), (2, 20)])
    l = _lines(
        spark, [(1, 1, 2.0, 10.00, 0.01), (2, 1, 3.0, 20.00, 0.02)]
    )
    state = IVM.view_aggregate(IVM.fact_rows(o, l))
    none_o = o.filter(F.lit(False))
    none_l = l.filter(F.lit(False))
    merged = IVM.merge_insert(state, IVM.fact_rows(none_o, none_l))
    assert _vmap(merged) == _vmap(state)


def test_delta_join_terms_are_disjoint_and_complete(spark):
    # the three delta-join terms partition (union-facts minus
    # base-facts) — no row lost, none double-counted
    o = _orders(spark, [(i, i % 3) for i in range(1, 9)])
    l = _lines(
        spark,
        [(i, j, float(i + j), 10.0 * i + j, 0.01 * (j % 5))
         for i in range(1, 9) for j in (1, 2)],
    )
    o_b = o.filter(F.col("o_orderkey") % 2 == 0)
    o_d = o.filter(F.col("o_orderkey") % 2 == 1)
    l_b = l.filter(F.col("l_linenumber") == 1)
    l_d = l.filter(F.col("l_linenumber") == 2)
    terms = [
        IVM.fact_rows(o_d, l_b),
        IVM.fact_rows(o_b, l_d),
        IVM.fact_rows(o_d, l_d),
    ]
    n_terms = sum(t.count() for t in terms)
    full = IVM.fact_rows(o, l).count()
    base = IVM.fact_rows(o_b, l_b).count()
    assert n_terms == full - base
    u = terms[0].unionByName(terms[1]).unionByName(terms[2])
    assert u.distinct().count() == n_terms


def test_multi_batch_fold_equals_from_scratch(spark):
    # the deployment shape: state folds forward across a SEQUENCE of
    # changefeeds (each with inserts and retractions), the fact store
    # advancing alongside; after every batch the view must equal the
    # from-scratch aggregate over the store
    o_all = _orders(
        spark, [(i, 10 + (i % 3) * 10) for i in range(1, 10)]
    )
    l_all = _lines(
        spark,
        [
            (i, j, float(i + j), 10.0 * i + j, 0.01 * (j % 5))
            for i in range(1, 10)
            for j in (1, 2)
        ],
    )
    # batch b inserts orders {3b+1..3b+3}; batch b>0 also tombstones
    # order 3b-2 (inserted two batches earlier)
    live = o_all.filter(F.lit(False))
    state = IVM.view_aggregate(IVM.fact_rows(live, l_all))
    for b in range(3):
        ins_o = o_all.filter(
            F.col("o_orderkey").between(3 * b + 1, 3 * b + 3)
        )
        tomb_o = (
            live.filter(F.col("o_orderkey") == 3 * b - 2)
            if b > 0
            else live.filter(F.lit(False))
        )
        next_live = live.join(tomb_o, "o_orderkey", "left_anti").unionByName(
            ins_o
        )
        state = IVM.apply_changes(
            state,
            IVM.fact_rows(ins_o, l_all),
            IVM.fact_rows(tomb_o, l_all),
            IVM.fact_rows(next_live, l_all),
        )
        # cut lineage so the fold doesn't stack plans batch-over-batch
        state = state.localCheckpoint(eager=True)
        live = next_live.localCheckpoint(eager=True)
        assert _vmap(state) == _vmap(
            IVM.view_aggregate(IVM.fact_rows(live, l_all))
        )


def test_ivm_is_a_foreachbatch_body(spark, tmp_path):
    # Structured Streaming wiring: a changefeed file stream (op=+1
    # order rows) folds into the view via foreachBatch running
    # apply_changes per micro-batch — the deployment's actual loop.
    # maxFilesPerTrigger=1 forces one micro-batch per changefeed file,
    # so the merge path runs three times, not once over the union.
    import json
    import os

    l_all = _lines(
        spark,
        [
            (i, j, float(i + j), 10.0 * i + j, 0.01 * (j % 5))
            for i in range(1, 10)
            for j in (1, 2)
        ],
    ).localCheckpoint(eager=True)

    feed = tmp_path / "feed"
    feed.mkdir()
    for b in range(3):
        rows = [
            {"op": 1, "o_orderkey": k, "o_custkey": 10 + (k % 3) * 10}
            for k in range(3 * b + 1, 3 * b + 4)
        ]
        if b > 0:  # retract an order inserted two batches earlier
            rows.append(
                {
                    "op": -1,
                    "o_orderkey": 3 * b - 2,
                    "o_custkey": 10 + ((3 * b - 2) % 3) * 10,
                }
            )
        p = feed / f"batch_{b}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        # FileStreamSource orders micro-batches by mtime; the three
        # files land within the same clock tick, so pin an increasing
        # mtime to make the changefeed sequence deterministic
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))

    holder = {
        "state": IVM.view_aggregate(
            IVM.fact_rows(
                spark.createDataFrame([], "o_orderkey long, o_custkey long"),
                l_all,
            )
        ).localCheckpoint(eager=True),
        "live": spark.createDataFrame([], "o_orderkey long, o_custkey long"),
        "batches": 0,
    }

    def _on_batch(cdc, _bid):
        cdc = cdc.localCheckpoint(eager=True)  # pin the micro-batch
        ins_o = cdc.filter(F.col("op") == 1).select("o_orderkey", "o_custkey")
        tomb_o = cdc.filter(F.col("op") == -1).select(
            "o_orderkey", "o_custkey"
        )
        next_live = (
            holder["live"]
            .join(tomb_o, "o_orderkey", "left_anti")
            .unionByName(ins_o)
            .localCheckpoint(eager=True)
        )
        holder["state"] = IVM.apply_changes(
            holder["state"],
            IVM.fact_rows(ins_o, l_all),
            IVM.fact_rows(tomb_o, l_all),
            IVM.fact_rows(next_live, l_all),
        ).localCheckpoint(eager=True)
        holder["live"] = next_live
        holder["batches"] += 1

    (
        spark.readStream.schema("op int, o_orderkey long, o_custkey long")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )

    assert holder["batches"] == 3
    scratch = IVM.view_aggregate(IVM.fact_rows(holder["live"], l_all))
    assert _vmap(holder["state"]) == _vmap(scratch)


def test_distinct_support_zero_crossing(spark):
    # part 77 supported TWICE in group 10 (orders 1 and 2): retracting
    # order 1 must keep the distinct count; retracting both must drop it
    o = _orders(spark, [(1, 10), (2, 10)])
    l = spark.createDataFrame(
        [(1, 77), (2, 77), (2, 88)], ["l_orderkey", "l_partkey"]
    )
    def facts(oo):
        return l.join(oo, l["l_orderkey"] == oo["o_orderkey"]).select(
            "o_custkey", "o_orderkey", "l_partkey"
        )
    state = IVM.distinct_support(facts(o), "l_partkey")
    one = IVM.merge_distinct_support(
        state, None, facts(o.filter(F.col("o_orderkey") == 1)), "l_partkey"
    )
    assert {r["n_distinct"] for r in IVM.distinct_view(one).collect()} == {2}
    both = IVM.merge_distinct_support(state, None, facts(o), "l_partkey")
    assert IVM.distinct_view(both).count() == 0


def test_topk_retraction_promotes_rank_k_plus_1(spark):
    # group 10 has 4 rows; stored top-3 loses its #1 to a tombstone ->
    # the unstored 4th row must enter at rank 3 via re-election
    o = _orders(spark, [(i, 10) for i in (1, 2, 3, 4)])
    l = _lines(
        spark,
        [(i, 1, float(i), 100.0 - i, 0.0) for i in (1, 2, 3, 4)],
    )  # prices 99, 98, 97, 96 -> top-3 = orders 1,2,3
    facts = IVM.fact_rows(o, l)
    state = IVM.topk_view(facts, k=3)
    tomb = o.filter(F.col("o_orderkey") == 1)
    keep = o.filter(F.col("o_orderkey") != 1)
    merged = IVM.merge_topk(
        state, None, IVM.fact_rows(tomb, l), IVM.fact_rows(keep, l), k=3
    )
    got = {(r["rnk"], r["o_orderkey"]) for r in merged.collect()}
    assert got == {(1, 2), (2, 3), (3, 4)}
    scratch = IVM.topk_view(IVM.fact_rows(keep, l), k=3)
    assert got == {(r["rnk"], r["o_orderkey"]) for r in scratch.collect()}


def test_topk_insert_only_fold_no_rescan_needed(spark):
    # insert displaces rank 2: fold of stored k + inserts must equal
    # from-scratch without touching survivor facts (passed as None)
    o_base = _orders(spark, [(1, 10), (2, 10), (3, 10)])
    l_base = _lines(
        spark, [(i, 1, float(i), 100.0 - i, 0.0) for i in (1, 2, 3)]
    )
    o_ins = _orders(spark, [(9, 10)])
    l_ins = _lines(spark, [(9, 1, 1.0, 98.5, 0.0)])
    state = IVM.topk_view(IVM.fact_rows(o_base, l_base), k=3)
    merged = IVM.merge_topk(
        state, IVM.fact_rows(o_ins, l_ins), None, None, k=3
    )
    scratch = IVM.topk_view(
        IVM.fact_rows(
            o_base.unionByName(o_ins), l_base.unionByName(l_ins)
        ),
        k=3,
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in scratch.collect()
    }


def test_rollup_lattice_serves_coarse_grains_from_state(spark):
    # maintain ONLY the finest grain (custkey, flag) under a
    # changefeed; every coarser grain re-aggregated from the
    # maintained state must equal the from-scratch aggregate
    o = spark.createDataFrame(
        [(i, 10 + (i % 2) * 10, "AB"[i % 2]) for i in range(1, 7)],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    l = _lines(
        spark,
        [(i, 1, float(i), 10.0 * i, 0.0) for i in range(1, 7)],
    )
    keys = ["o_custkey", "o_orderpriority"]
    dims = ("o_orderpriority",)
    base = o.filter(F.col("o_orderkey") <= 4)
    ins_o = o.filter(F.col("o_orderkey") > 4)
    tomb = base.filter(F.col("o_orderkey") == 1)
    keep = base.filter(F.col("o_orderkey") != 1)

    state = IVM.view_aggregate(IVM.fact_rows(base, l, dims), keys)
    ins = IVM.fact_rows(ins_o, l, dims)
    survivors = IVM.fact_rows(keep, l, dims).unionByName(ins)
    finest = IVM.apply_changes(
        state, ins, IVM.fact_rows(tomb, l, dims), survivors, keys
    )
    live_o = keep.unionByName(ins_o)
    for grain in (["o_custkey", "o_orderpriority"], ["o_custkey"], []):
        served = IVM.rollup_state(finest, grain)
        scratch = IVM.rollup_state(
            IVM.view_aggregate(IVM.fact_rows(live_o, l, dims), keys), grain
        )
        key = lambda r: tuple(r[k] for k in grain)
        assert {key(r): (r["n_items"], r["sum_qty"], r["min_price_c"],
                         r["max_qty"]) for r in served.collect()} == {
            key(r): (r["n_items"], r["sum_qty"], r["min_price_c"],
                     r["max_qty"]) for r in scratch.collect()}


# --- round-13: declarative Measure specs ---------------------------

def test_custom_measure_spec_changefeed_equals_from_scratch(spark):
    # a DIFFERENT measure set (count + min + max, extremes pointing
    # both ways over the same column) through the unchanged core
    spec = (
        IVM.Measure("n", "count"),
        IVM.Measure("lo_qty", "min", "qty"),
        IVM.Measure("hi_qty", "max", "qty"),
    )
    o = _orders(spark, [(i, 10 + (i % 3)) for i in range(1, 9)])
    l = _lines(spark, [(i, 1, float(i * 3 % 11), 10.0, 0.0) for i in range(1, 9)])
    base = o.filter(F.col("o_orderkey") <= 6)
    ins_o = o.filter(F.col("o_orderkey") > 6)
    tomb = base.filter(F.col("o_orderkey") % 3 == 0)
    keep = base.filter(F.col("o_orderkey") % 3 != 0)

    state = IVM.view_aggregate(IVM.fact_rows(base, l), measures=spec)
    ins = IVM.fact_rows(ins_o, l)
    survivors = IVM.fact_rows(keep, l).unionByName(ins)
    merged = IVM.apply_changes(
        state, ins, IVM.fact_rows(tomb, l), survivors, measures=spec
    )
    scratch = IVM.view_aggregate(survivors, measures=spec)
    as_map = lambda df: {
        r["o_custkey"]: (r["n"], r["lo_qty"], r["hi_qty"])
        for r in df.collect()
    }
    assert as_map(merged) == as_map(scratch)


def test_pure_counter_spec_retractions_need_no_survivors(spark):
    # count/sum-only views are fully subtractable: retraction merges
    # need NO survivor table and NO rescan (the round-13 early return)
    spec = (IVM.Measure("n", "count"), IVM.Measure("s_qty", "sum", "qty"))
    o = _orders(spark, [(i, 10 + (i % 2)) for i in range(1, 7)])
    l = _lines(spark, [(i, 1, float(i), 10.0, 0.0) for i in range(1, 7)])
    tomb = o.filter(F.col("o_orderkey") % 3 == 0)
    keep = o.filter(F.col("o_orderkey") % 3 != 0)
    state = IVM.view_aggregate(IVM.fact_rows(o, l), measures=spec)
    merged = IVM.apply_changes(
        state, None, IVM.fact_rows(tomb, l), None, measures=spec
    )
    scratch = IVM.view_aggregate(IVM.fact_rows(keep, l), measures=spec)
    as_map = lambda df: {
        r["o_custkey"]: (r["n"], r["s_qty"]) for r in df.collect()
    }
    assert as_map(merged) == as_map(scratch)


def test_measure_spec_validation():
    import pytest

    with pytest.raises(ValueError, match="unknown measure kind"):
        IVM.Measure("x", "avg", "qty")
    with pytest.raises(ValueError, match="needs col"):
        IVM.Measure("x", "sum")
    with pytest.raises(ValueError, match="count measure"):
        IVM._sentinel((IVM.Measure("x", "sum", "qty"),))


def test_rollup_empty_state_global_grain_matches_sql_rollup(spark):
    # ADVICE round-12: GROUP BY ROLLUP over an empty corpus emits a
    # grand-total row with count(*)=0 and NULL sum/min/max; Spark's
    # global groupBy().agg() over empty state emitted all-NULL. The
    # count-kind coalesce pins the SQL shape.
    o = _orders(spark, [(1, 10)]).filter(F.col("o_orderkey") < 0)
    l = _lines(spark, [(1, 1, 1.0, 1.0, 0.0)])
    empty_state = IVM.view_aggregate(IVM.fact_rows(o, l))
    rows = IVM.rollup_state(empty_state, []).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_items"] == 0
    assert r["sum_qty"] is None and r["min_price_c"] is None


def test_router_inside_foreachbatch_flips_midstream(spark, tmp_path):
    # round-13: the AUTO-ROUTER as the foreachBatch body. Batch 0 is
    # pure inserts (merge, zero probe jobs); batch 1 retracts one
    # order touching 1/3 groups (probe says merge); batch 2 retracts
    # orders touching 2/3 groups (probe crosses the 50% bar -> the
    # route FLIPS to retrain mid-stream). After every batch the state
    # must equal the from-scratch view regardless of route.
    import json
    import os
    import warnings

    l_all = _lines(
        spark,
        [(i, j, float(i + j), 10.0 * i + j, 0.0) for i in range(1, 7)
         for j in (1, 2)],
    ).localCheckpoint(eager=True)

    feed = tmp_path / "feed"
    feed.mkdir()
    batches = [
        [{"op": 1, "o_orderkey": k, "o_custkey": 10 + (k % 3) * 10}
         for k in range(1, 7)],
        [{"op": -1, "o_orderkey": 1, "o_custkey": 20}],
        [{"op": -1, "o_orderkey": 2, "o_custkey": 30},
         {"op": -1, "o_orderkey": 3, "o_custkey": 10}],
    ]
    for b, rows in enumerate(batches):
        p = feed / f"batch_{b}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))

    holder = {
        "state": IVM.view_aggregate(
            IVM.fact_rows(
                spark.createDataFrame([], "o_orderkey long, o_custkey long"),
                l_all,
            )
        ).localCheckpoint(eager=True),
        "live": spark.createDataFrame([], "o_orderkey long, o_custkey long"),
        "routes": [],
        "ok": [],
    }

    def _on_batch(cdc, _bid):
        cdc = cdc.localCheckpoint(eager=True)
        ins_o = cdc.filter(F.col("op") == 1).select("o_orderkey", "o_custkey")
        tomb_o = cdc.filter(F.col("op") == -1).select(
            "o_orderkey", "o_custkey"
        )
        has_dels = tomb_o.count() > 0
        next_live = (
            holder["live"]
            .join(tomb_o, "o_orderkey", "left_anti")
            .unionByName(ins_o)
            .localCheckpoint(eager=True)
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # the retrain route warns
            state, info = IVM.ivm_maintain(
                holder["state"],
                IVM.fact_rows(ins_o, l_all),
                IVM.fact_rows(tomb_o, l_all) if has_dels else None,
                IVM.fact_rows(next_live, l_all),
            )
        holder["state"] = state.localCheckpoint(eager=True)
        holder["live"] = next_live
        holder["routes"].append(info["route"])
        holder["ok"].append(
            _vmap(holder["state"])
            == _vmap(IVM.view_aggregate(IVM.fact_rows(next_live, l_all)))
        )

    (
        spark.readStream.schema("op int, o_orderkey long, o_custkey long")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )

    assert holder["routes"] == ["merge", "merge", "retrain"]
    assert holder["ok"] == [True, True, True]


def test_ivm_maintain_modes_and_pure_counter_skip(spark):
    o = _orders(spark, [(i, 10 + (i % 2) * 10) for i in range(1, 5)])
    l = _lines(spark, [(i, 1, float(i), 10.0 * i, 0.0) for i in range(1, 5)])
    tomb = o.filter(F.col("o_orderkey") == 1)
    keep = o.filter(F.col("o_orderkey") != 1)
    state = IVM.view_aggregate(IVM.fact_rows(o, l))
    dels = IVM.fact_rows(tomb, l)
    surv = IVM.fact_rows(keep, l)

    # forced modes: no probe counts recorded
    _, info = IVM.ivm_maintain(state, None, dels, surv, mode="merge")
    assert info == {"route": "merge", "n_groups": None, "n_affected": None}
    _, info = IVM.ivm_maintain(state, None, dels, surv, mode="retrain")
    assert info["route"] == "retrain" and info["n_groups"] is None

    # pure-counter spec: probe skipped even with retractions
    spec = (IVM.Measure("n", "count"), IVM.Measure("s", "sum", "qty"))
    cstate = IVM.view_aggregate(IVM.fact_rows(o, l), measures=spec)
    merged, info = IVM.ivm_maintain(
        cstate, None, IVM.fact_rows(tomb, l), None, measures=spec
    )
    assert info["route"] == "merge" and info["n_groups"] is None
    assert {r["o_custkey"]: (r["n"], r["s"]) for r in merged.collect()} == {
        r["o_custkey"]: (r["n"], r["s"])
        for r in IVM.view_aggregate(
            IVM.fact_rows(keep, l), measures=spec
        ).collect()
    }

    import pytest

    with pytest.raises(ValueError, match="mode must be"):
        IVM.ivm_maintain(state, None, dels, surv, mode="nope")


def test_kmv_sketch_merge_equals_from_scratch(spark):
    # k-smallest-of-union: merged sketch state must equal the
    # from-scratch sketch on the full fact set, including groups whose
    # batch hashes displace stored minima at a tiny k
    o = _orders(spark, [(i, 10 + (i % 2) * 10) for i in range(1, 13)])
    l = spark.createDataFrame(
        [(i, 100 + (i * 37) % 23) for i in range(1, 13)],
        ["l_orderkey", "l_partkey"],
    )
    def facts(oo):
        return l.join(oo, l["l_orderkey"] == oo["o_orderkey"]).select(
            "o_custkey", "o_orderkey", "l_partkey"
        )
    base = o.filter(F.col("o_orderkey") <= 8)
    delta = o.filter(F.col("o_orderkey") > 8)
    k = 3
    state = IVM.distinct_kmv_state(facts(base), "l_partkey", k=k)
    merged = IVM.merge_distinct_kmv(state, facts(delta), "l_partkey", k=k)
    scratch = IVM.distinct_kmv_state(facts(o), "l_partkey", k=k)
    as_set = lambda df: {
        (r["o_custkey"], r["h"], r["rn"]) for r in df.collect()
    }
    assert as_set(merged) == as_set(scratch)
    # serve: below-k groups are exact, at-k groups use the estimator
    est = {
        r["o_custkey"]: r["kmv_distinct_est"]
        for r in IVM.distinct_kmv_view(merged, k=k).collect()
    }
    exact = {
        r["o_custkey"]: r["nd"]
        for r in facts(o)
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_partkey").alias("nd"))
        .collect()
    }
    for g, nd in exact.items():
        if nd < k:
            assert est[g] == nd
        else:
            assert est[g] >= 1  # estimator fired; value is data-driven


def test_moment_counters_changefeed_equals_from_scratch(spark):
    """Power sums (n, Σq, Σq², Σqp) are plain SUM measures over derived
    fact columns, so mean/variance/covariance maintain through the
    pure-counter merge with no survivor table — and the SIGNED
    covariance numerator survives a mixed changefeed exactly (group 20
    is built anti-correlated: high qty ⋈ low price)."""
    mom = (
        IVM.Measure("n_items", "count"),
        IVM.Measure("sum_qty", "sum", "qty"),
        IVM.Measure("sum_qty2", "sum", "qty2"),
        IVM.Measure("sum_qp", "sum", "qp"),
    )

    def facts(o, l):
        f = IVM.fact_rows(o, l)
        return f.withColumn("qty2", F.col("qty") * F.col("qty")).withColumn(
            "qp", F.col("qty") * F.col("price_c")
        )

    o = _orders(spark, [(1, 10), (2, 10), (3, 20), (4, 20)])
    l_base = _lines(
        spark,
        [
            (1, 1, 5.0, 100.00, 0.0),
            (2, 1, 7.0, 50.00, 0.0),
            (3, 1, 2.0, 999.99, 0.0),  # low qty, high price …
            (4, 1, 9.0, 10.00, 0.0),  # … high qty, low price: cov < 0
        ],
    )
    l_ins = _lines(spark, [(2, 2, 1.0, 5.00, 0.0), (3, 2, 4.0, 80.00, 0.0)])
    l_del = _lines(spark, [(1, 1, 5.0, 100.00, 0.0)])

    state = IVM.view_aggregate(facts(o, l_base), measures=mom)
    merged, info = IVM.ivm_maintain(
        state, facts(o, l_ins), facts(o, l_del), measures=mom, mode="auto"
    )
    # pure-counter spec: router must take the zero-probe merge path
    assert info == {"route": "merge", "n_groups": None, "n_affected": None}

    survivors = facts(o, l_base.unionByName(l_ins)).subtract(facts(o, l_del))
    scratch = IVM.view_aggregate(survivors, measures=mom)

    def m(df):
        return {
            r["o_custkey"]: (r["n_items"], r["sum_qty"], r["sum_qty2"], r["sum_qp"])
            for r in df.collect()
        }

    got = m(merged)
    assert got == m(scratch)
    # the served covariance numerator n·Σqp − Σq·Σp is genuinely signed
    n, s, _, sqp = got[20]
    sp = sum(
        r["price_c"]
        for r in facts(o, l_base.unionByName(l_ins)).collect()
        if r["o_custkey"] == 20
    )
    assert n * sqp - s * sp < 0


def test_outlier_guard_squares_in_decimal128_not_int64(spark):
    """The 2σ comparison squares the deviation numerator; with qty sums
    near 3e9 the square (≈1e20) overflows int64, so the guard must be
    computed in decimal(38,0). Pin the flag against exact Python ints."""
    # consistent power sums (all-50s / all-10s groups) at sizes a large
    # corpus actually produces: dev_10 = s·N − n·S ≈ 7.2e9, square 5e19
    rows = [(10, 300, 300 * 50, 300 * 2500),
            (20, 600_000, 600_000 * 10, 600_000 * 100),
            (30, 100, 100 * 10, 100 * 100)]
    g = spark.createDataFrame(rows, "o_custkey long, n long, s long, s2 long")
    tot = g.groupBy().agg(
        F.sum("n").alias("nn"), F.sum("s").alias("ss"), F.sum("s2").alias("ss2")
    )
    d38 = "decimal(38,0)"
    dev38 = F.col("s").cast(d38) * F.col("nn") - F.col("n").cast(d38) * F.col("ss")
    var38 = F.col("nn").cast(d38) * F.col("ss2") - F.col("ss").cast(d38) * F.col("ss")
    out = {
        r["o_custkey"]: r["flag"]
        for r in g.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            F.when(
                dev38 * dev38
                > F.lit(4).cast(d38) * var38 * F.col("n").cast(d38) * F.col("n"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("flag"),
        )
        .collect()
    }
    nn = sum(r[1] for r in rows)
    ss = sum(r[2] for r in rows)
    ss2 = sum(r[3] for r in rows)
    dev10 = rows[0][2] * nn - rows[0][1] * ss
    assert dev10 * dev10 > 2**63, "test shape too small to exercise 128-bit"
    for ck, n, s, _ in rows:
        dev = s * nn - n * ss
        expect = 1 if dev * dev > 4 * (nn * ss2 - ss * ss) * n * n else 0
        assert out[ck] == expect, ck


def test_ivm_maintain_missing_survivors_fails_before_probe(spark):
    """Retractions + min/max measures + no survivor table is invalid
    on EVERY route; the router must raise before launching probe jobs
    (it does zero Spark actions — assert by message, and by the fact
    the error arrives eagerly, not from inside a chosen leg)."""
    import pytest

    o = _orders(spark, [(1, 10)])
    l = _lines(spark, [(1, 1, 5.0, 100.00, 0.0)])
    state = IVM.view_aggregate(IVM.fact_rows(o, l))
    dels = IVM.fact_rows(o, l)
    with pytest.raises(ValueError, match="survivor_facts on every route"):
        IVM.ivm_maintain(state, None, dels, mode="auto")


def test_kmv_view_detects_larger_build_k(spark):
    """Serving KMV state with a SMALLER k than it was built with is
    the detectable direction of the k-mismatch hazard (state rows
    exceed the claimed k) — the serve must raise, not silently
    misread; the undetectable direction (larger serve k) is
    documented as the caller's contract."""
    import pytest

    facts = spark.createDataFrame(
        [(1, v) for v in range(20)], "o_custkey long, v long"
    )
    state = IVM.distinct_kmv_state(facts, "v", k=8)
    with pytest.raises(Exception, match="built with a larger k"):
        IVM.distinct_kmv_view(state, k=4).collect()
    # matching k serves normally
    [r] = IVM.distinct_kmv_view(state, k=8).collect()
    assert r["kmv_distinct_est"] > 0


def test_mg_summary_is_a_foreachbatch_body(spark, tmp_path):
    """The MG deployment loop: an append-only event stream folds into
    the heavy-hitters summary via merge_mg per micro-batch. Unlike
    KMV (bit-invariant under rebatching) the summary's exact residues
    depend on the batch boundaries, so the assertion is the FAMILY
    contract after every batch: ≤ k rows, underestimates only, and
    the deficit bound over everything ingested so far."""
    import json
    import os
    from collections import Counter

    from files_kraken_spark.operators.ivm import (
        merge_mg,
        mg_counts,
        mg_reduce,
    )

    k = 4
    batches = [
        [1, 1, 2, 3, 1, 4],
        [2, 2, 5, 1, 6, 2],
        [7, 1, 2, 8, 1, 9, 1],
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    for b, vals in enumerate(batches):
        p = feed / f"batch_{b}.json"
        p.write_text(
            "\n".join(json.dumps({"user_id": v}) for v in vals)
        )
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))

    empty = spark.createDataFrame([], "user_id long")
    holder = {
        "state": mg_reduce(mg_counts(empty, "user_id"), "user_id", k)
        .localCheckpoint(eager=True),
        "seen": Counter(),
        "batches": 0,
    }

    def _on_batch(batch, _bid):
        batch = batch.localCheckpoint(eager=True)
        d_sum = mg_reduce(mg_counts(batch, "user_id"), "user_id", k)
        holder["state"] = merge_mg(
            holder["state"], d_sum, "user_id", k
        ).localCheckpoint(eager=True)
        holder["seen"].update(
            r["user_id"] for r in batch.select("user_id").collect()
        )
        holder["batches"] += 1
        got = {r["user_id"]: r["cnt"] for r in holder["state"].collect()}
        n = sum(holder["seen"].values())
        bound = (n - sum(got.values())) // (k + 1)
        assert len(got) <= k
        for v, c in holder["seen"].items():
            est = got.get(v, 0)
            assert est <= c and c - est <= bound, (v, c, est, bound)

    (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    assert holder["batches"] == 3
    # the all-batch heavy hitter (user 1: 7 of 19 events) must survive
    final = {r["user_id"] for r in holder["state"].collect()}
    assert 1 in final

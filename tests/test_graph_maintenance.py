"""Round-11 incremental graph maintenance: merging an append-only
edge batch into persisted PageRank / connected-components state must
be BIT-IDENTICAL to the from-scratch build on the union — the same
maintain-vs-retrain contract the ANN (test_ann_maintenance) and dedup
families carry. queries/graph_maintenance.py holds the oracle
evidence; these pin the operator-level equalities on adversarial
shapes (new nodes, sinks, changed out-degrees, chain merges)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pr_map(df):
    return {r["node"]: r["pr"] for r in df.collect()}


def test_pagerank_incremental_equals_from_scratch(spark):
    from files_kraken_spark.operators.graph import (
        pagerank,
        pagerank_history,
        pagerank_incremental,
    )

    # base: two weakly-connected clusters + a sink (6 has no out-edges)
    base = [
        (1, 2), (2, 3), (3, 1), (1, 3),
        (4, 5), (5, 4),
        (2, 6),
    ]
    # batch: cross-cluster edge, a NEW node 7 (in and out), a new edge
    # from the sink (6 gains out-degree: every old contribution of 6
    # — there were none — plus deg-change propagation), and a new
    # out-edge from 1 (changed out-degree dilutes 1's contributions)
    delta = [
        (3, 4), (7, 1), (5, 7), (6, 2), (1, 5),
    ]
    base_df = spark.createDataFrame(base, ["src", "dst"])
    delta_df = spark.createDataFrame(delta, ["src", "dst"])
    union_df = base_df.unionByName(delta_df)

    for iters in (1, 3):
        hist = pagerank_history(base_df, iters=iters)
        merged = pagerank_incremental(
            union_df, delta_df, hist, iters=iters
        )
        scratch = pagerank(union_df, iters=iters)
        assert _pr_map(merged) == _pr_map(scratch)
        # one row per union node, no duplicates from the merge union
        assert merged.count() == merged.select("node").distinct().count()


def test_pagerank_incremental_empty_delta_is_identity(spark):
    from files_kraken_spark.operators.graph import (
        pagerank_history,
        pagerank_incremental,
    )

    base_df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], ["src", "dst"]
    )
    empty = base_df.filter(F.lit(False))
    hist = pagerank_history(base_df, iters=2)
    merged = pagerank_incremental(base_df, empty, hist, iters=2)
    final = {
        r["node"]: r["pr"]
        for r in hist.filter(F.col("round") == 2).collect()
    }
    assert _pr_map(merged) == final


def test_dirty_frontiers_monotone_and_bounded(spark):
    """The per-round dirty sets are monotone (the final merge may read
    only D_iters) and exclude nodes whose k-hop in-cone is untouched —
    the frontier-boundedness that makes maintenance beat retrain."""
    from files_kraken_spark.operators.graph import dirty_frontiers

    # a 6-chain 1->2->...->6 plus an ISOLATED base pair 10->11
    base = [(i, i + 1) for i in range(1, 6)] + [(10, 11)]
    delta = [(0, 1)]  # new node 0 feeds the chain head
    base_df = spark.createDataFrame(base, ["src", "dst"])
    delta_df = spark.createDataFrame(delta, ["src", "dst"])
    union_df = base_df.unionByName(delta_df)
    base_nodes = (
        base_df.select(F.col("src").alias("node"))
        .unionByName(base_df.select(F.col("dst").alias("node")))
        .distinct()
    )
    fr = dirty_frontiers(union_df, delta_df, base_nodes, iters=3)
    sets = [{r["node"] for r in d.collect()} for d in fr]
    # D_1 = {0 (new), 1 (dst of new edge)}; each round advances one hop
    assert sets[0] == {0, 1}
    assert sets[1] == {0, 1, 2}
    assert sets[2] == {0, 1, 2, 3}
    # monotone; the untouched island never enters any frontier
    assert sets[0] <= sets[1] <= sets[2]
    assert all({10, 11}.isdisjoint(s) for s in sets)


def test_cc_incremental_equals_from_scratch(spark):
    from files_kraken_spark.operators.dedup import (
        cc_incremental,
        connected_components,
    )

    # base components: {1,2,3} (chain), {7,8}, {20,21}
    base_pairs = [(1, 2), (2, 3), (7, 8), (20, 21)]
    # batch: bridge two components through a NEW node (3-9, 9-7),
    # a brand-new island (30,31), and an intra-component pair (1,3)
    # that must not change anything
    new_pairs = [(3, 9), (9, 7), (30, 31), (1, 3)]
    bp = spark.createDataFrame(base_pairs, ["id_a", "id_b"])
    np_ = spark.createDataFrame(new_pairs, ["id_a", "id_b"])

    state = connected_components(bp)
    merged = cc_incremental(state, np_)
    scratch = connected_components(bp.unionByName(np_))
    got = {(r["doc_id"], r["component"]) for r in merged.collect()}
    want = {(r["doc_id"], r["component"]) for r in scratch.collect()}
    assert got == want
    # the bridge merged {1,2,3}+{9}+{7,8} under min id 1; island under 30
    comp = dict(got)
    assert comp[9] == 1 and comp[7] == 1 and comp[8] == 1
    assert comp[30] == 30 and comp[31] == 30
    assert comp[20] == 20 and comp[21] == 20  # untouched component

    # empty batch: identity on state
    empty = np_.filter(F.lit(False))
    same = {
        (r["doc_id"], r["component"])
        for r in cc_incremental(state, empty).collect()
    }
    assert same == {(r["doc_id"], r["component"]) for r in state.collect()}


def test_cc_incremental_chain_of_merges_via_label_graph(spark):
    """A batch whose pairs chain MULTIPLE old components together in
    one go (A-B, B-C component bridges) exercises the label-graph CC:
    the merged label must be the min across the whole chain, not just
    each pair."""
    from files_kraken_spark.operators.dedup import (
        cc_incremental,
        connected_components,
    )

    base_pairs = [(10, 11), (20, 21), (30, 31), (40, 41)]
    # chain: comp(20)-comp(30), comp(30)-comp(40), and comp(10) stays
    new_pairs = [(21, 30), (31, 40)]
    bp = spark.createDataFrame(base_pairs, ["id_a", "id_b"])
    np_ = spark.createDataFrame(new_pairs, ["id_a", "id_b"])
    merged = cc_incremental(connected_components(bp), np_)
    comp = {r["doc_id"]: r["component"] for r in merged.collect()}
    assert comp[40] == 20 and comp[41] == 20 and comp[30] == 20
    assert comp[10] == 10 and comp[11] == 10


def test_pagerank_maintain_routes_and_equality(spark, recwarn):
    import warnings

    from files_kraken_spark.operators.graph import (
        pagerank,
        pagerank_history,
        pagerank_maintain,
    )

    # sparse chain: a leaf batch dirties only its short out-cone
    chain = [(i, i + 1) for i in range(1, 30)]
    chain_delta = [(30, 31)]  # appends past the tail: D_1 = {30's dst, new}
    # dense bipartite: every left node hits every right node — one
    # batch edge dirties everything in one hop
    dense = [(l, 100 + r) for l in range(1, 6) for r in range(1, 6)]
    dense += [(100 + r, l) for l in range(1, 6) for r in range(1, 6)]
    dense_delta = [(1, 106), (106, 1)]

    for base, delta, expect_route in [
        (chain, chain_delta, "merge"),
        (dense, dense_delta, "retrain"),
    ]:
        base_df = spark.createDataFrame(base, ["src", "dst"])
        delta_df = spark.createDataFrame(delta, ["src", "dst"])
        union_df = base_df.unionByName(delta_df)
        hist = pagerank_history(base_df, iters=2)

        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            auto = pagerank_maintain(union_df, delta_df, hist, iters=2)
            routed_retrain = any(
                "routing to full retrain" in str(w.message) for w in caught
            )
        assert routed_retrain == (expect_route == "retrain")
        # whatever the route, ranks are bit-identical to from-scratch
        assert _pr_map(auto) == _pr_map(pagerank(union_df, iters=2))

    # forced modes never probe (no jobs beyond the plan) and agree too
    base_df = spark.createDataFrame(chain, ["src", "dst"])
    delta_df = spark.createDataFrame(chain_delta, ["src", "dst"])
    union_df = base_df.unionByName(delta_df)
    hist = pagerank_history(base_df, iters=2)
    m = pagerank_maintain(union_df, delta_df, hist, iters=2, mode="merge")
    r = pagerank_maintain(union_df, delta_df, hist, iters=2, mode="retrain")
    assert _pr_map(m) == _pr_map(r)

    import pytest

    with pytest.raises(ValueError):
        pagerank_maintain(union_df, delta_df, hist, mode="bogus")


def test_pagerank_decremental_equals_from_scratch(spark):
    from files_kraken_spark.operators.graph import (
        pagerank,
        pagerank_decremental,
        pagerank_history,
    )

    # full graph: two clusters bridged, a sink (6), a leaf node 7
    full = [
        (1, 2), (2, 3), (3, 1), (1, 3),
        (4, 5), (5, 4), (3, 4),
        (2, 6), (7, 1), (5, 7), (1, 5),
    ]
    # retract: the bridge (3,4), node 7 ENTIRELY (both its edges —
    # it must leave the node set), and one of 1's out-edges (1's
    # out-degree shrinks, diluting... concentrating its contributions)
    retracted = [(3, 4), (7, 1), (5, 7), (1, 5)]
    post = [e for e in full if e not in retracted]

    full_df = spark.createDataFrame(full, ["src", "dst"])
    re_df = spark.createDataFrame(retracted, ["src", "dst"])
    post_df = spark.createDataFrame(post, ["src", "dst"])

    for iters in (1, 3):
        hist = pagerank_history(full_df, iters=iters)
        merged = pagerank_decremental(post_df, re_df, hist, iters=iters)
        scratch = pagerank(post_df, iters=iters)
        assert _pr_map(merged) == _pr_map(scratch)
        # node 7 left the graph with its last edge
        assert 7 not in _pr_map(merged)
        assert merged.count() == merged.select("node").distinct().count()


def test_pagerank_decremental_noop_batch(spark):
    from files_kraken_spark.operators.graph import (
        pagerank,
        pagerank_decremental,
        pagerank_history,
    )

    edges = [(1, 2), (2, 3), (3, 1)]
    full_df = spark.createDataFrame(edges, ["src", "dst"])
    empty = full_df.filter(F.lit(False))
    hist = pagerank_history(full_df, iters=2)
    out = pagerank_decremental(full_df, empty, hist, iters=2)
    assert _pr_map(out) == _pr_map(pagerank(full_df, iters=2))


def test_cc_decremental_split_and_retire(spark):
    from files_kraken_spark.operators.dedup import (
        cc_decremental,
        connected_components,
    )

    def cc_map(df):
        return {r["doc_id"]: r["component"] for r in df.collect()}

    # two components: a chain 1-2-3-4 and an untouched pair 10-11
    full = [(1, 2), (2, 3), (3, 4), (10, 11)]
    # retract the chain's middle link -> {1,2} and {3,4} split;
    # also retract (10,11) entirely -> both docs leave the pair graph
    for retracted in ([(2, 3)], [(2, 3), (10, 11)]):
        post = [p for p in full if p not in retracted]
        full_df = spark.createDataFrame(full, ["id_a", "id_b"])
        post_df = spark.createDataFrame(post, ["id_a", "id_b"])
        re_df = spark.createDataFrame(retracted, ["id_a", "id_b"])
        state = connected_components(full_df)
        merged = cc_decremental(state, post_df, re_df)
        scratch = connected_components(post_df)
        assert cc_map(merged) == cc_map(scratch)

    # untouched component served from state verbatim (no recompute
    # needed to get this right, but the VALUES must also match)
    state = connected_components(spark.createDataFrame(full, ["id_a", "id_b"]))
    merged = cc_decremental(
        state,
        spark.createDataFrame([(1, 2), (3, 4), (10, 11)], ["id_a", "id_b"]),
        spark.createDataFrame([(2, 3)], ["id_a", "id_b"]),
    )
    m = cc_map(merged)
    assert m[10] == 10 and m[11] == 10
    assert m[1] == 1 and m[2] == 1 and m[3] == 3 and m[4] == 3


def test_pagerank_apply_changes_mixed_batch(spark):
    from files_kraken_spark.operators.graph import (
        pagerank,
        pagerank_apply_changes,
        pagerank_history,
    )

    base = [
        (1, 2), (2, 3), (3, 1), (1, 3),
        (4, 5), (5, 4), (3, 4),
        (2, 6), (7, 1), (5, 7),
    ]
    added = [(6, 2), (8, 3), (4, 8)]     # sink gains out-edge; new node 8
    retracted = [(3, 4), (7, 1), (5, 7)]  # bridge dies; node 7 retires
    post = [e for e in base if e not in retracted] + added

    base_df = spark.createDataFrame(base, ["src", "dst"])
    add_df = spark.createDataFrame(added, ["src", "dst"])
    re_df = spark.createDataFrame(retracted, ["src", "dst"])
    post_df = spark.createDataFrame(post, ["src", "dst"])

    for iters in (1, 3):
        hist = pagerank_history(base_df, iters=iters)
        merged = pagerank_apply_changes(post_df, add_df, re_df, hist, iters=iters)
        scratch = pagerank(post_df, iters=iters)
        assert _pr_map(merged) == _pr_map(scratch)
        m = _pr_map(merged)
        assert 7 not in m and 8 in m  # retirement and birth in one batch


def test_cc_apply_changes_mixed_batch(spark):
    from files_kraken_spark.operators.dedup import (
        cc_apply_changes,
        connected_components,
    )

    def cc_map(df):
        return {r["doc_id"]: r["component"] for r in df.collect()}

    base = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)]
    retracted = [(2, 3), (20, 21)]  # split the chain; retire 20/21
    added = [(4, 10), (30, 31)]     # bridge to 10-11; new component
    post = [p for p in base if p not in retracted] + added

    base_df = spark.createDataFrame(base, ["id_a", "id_b"])
    post_df = spark.createDataFrame(post, ["id_a", "id_b"])
    add_df = spark.createDataFrame(added, ["id_a", "id_b"])
    re_df = spark.createDataFrame(retracted, ["id_a", "id_b"])

    state = connected_components(base_df)
    merged = cc_apply_changes(state, post_df, add_df, re_df)
    scratch = connected_components(post_df)
    m = cc_map(merged)
    assert m == cc_map(scratch)
    assert 20 not in m and 30 in m           # retire + birth, one batch
    assert m[1] == 1 and m[3] == m[10] == 3  # split half bridged onward


def test_pagerank_maintain_mixed_changefeed_routes(spark):
    import warnings

    from files_kraken_spark.operators.graph import (
        pagerank,
        pagerank_history,
        pagerank_maintain,
    )

    # sparse chain with a tail retraction + a tail append: frontier
    # stays local -> auto routes to the changefeed merge
    chain = [(i, i + 1) for i in range(1, 30)]
    added = [(30, 31)]
    retracted = [(1, 2)]
    post = [e for e in chain if e not in retracted] + added

    base_df = spark.createDataFrame(chain, ["src", "dst"])
    add_df = spark.createDataFrame(added, ["src", "dst"])
    re_df = spark.createDataFrame(retracted, ["src", "dst"])
    post_df = spark.createDataFrame(post, ["src", "dst"])
    hist = pagerank_history(base_df, iters=2)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        auto = pagerank_maintain(
            post_df, add_df, hist, iters=2, retracted_edges=re_df
        )
        routed_retrain = any(
            "routing to full retrain" in str(w.message) for w in caught
        )
    assert not routed_retrain
    assert _pr_map(auto) == _pr_map(pagerank(post_df, iters=2))


def test_label_prop_incremental_equals_from_scratch(spark):
    """LP maintenance must be bit-identical to the from-scratch union
    build on adversarial shapes: new nodes, gained neighbors, tie
    flips (the (count desc, min label) winner changing because a new
    neighbor breaks a tie), multi-hop propagation."""
    from files_kraken_spark.operators.graph import (
        label_prop_history,
        label_prop_incremental,
    )

    def sym(pairs):
        return sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})

    # base: a triangle {1,2,3}, a pair {4,5}, a chain 5-6
    base = sym([(1, 2), (2, 3), (1, 3), (4, 5), (5, 6)])
    # batch: bridge 3-4 (flips 4's winner), new node 7 hanging off 6,
    # and a new intra-cluster edge 2-4 (degree change, no new node)
    delta_pairs = [(3, 4), (6, 7), (2, 4)]
    delta = sorted(set(sym(delta_pairs)) - set(base))
    union = sorted(set(base) | set(delta))

    base_df = spark.createDataFrame(base, ["u", "v"])
    delta_df = spark.createDataFrame(delta, ["u", "v"])
    union_df = spark.createDataFrame(union, ["u", "v"])

    for rounds in (1, 3):
        hist = label_prop_history(base_df, rounds=rounds)
        merged = label_prop_incremental(
            union_df, delta_df, hist, rounds=rounds
        )
        scratch = (
            label_prop_history(union_df, rounds=rounds)
            .filter(F.col("round") == rounds)
            .select("n", "lab")
        )
        got = {(r["n"], r["lab"]) for r in merged.collect()}
        want = {(r["n"], r["lab"]) for r in scratch.collect()}
        assert got == want, f"rounds={rounds}"
        assert merged.count() == merged.select("n").distinct().count()


def test_label_prop_incremental_empty_delta_is_identity(spark):
    from files_kraken_spark.operators.graph import (
        label_prop_history,
        label_prop_incremental,
    )

    base_df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], ["u", "v"]
    )
    hist = label_prop_history(base_df, rounds=2)
    merged = label_prop_incremental(
        base_df, base_df.filter(F.lit(False)), hist, rounds=2
    )
    want = {
        (r["n"], r["lab"])
        for r in hist.filter(F.col("round") == 2).collect()
    }
    assert {(r["n"], r["lab"]) for r in merged.collect()} == want


def _kcore_scratch(spark, edges_df, k, rounds):
    """From-scratch fixed-round peeling in the q_kcore_parts shape."""
    from files_kraken_spark.operators.graph import kcore_history, _sym

    hist = kcore_history(edges_df, k=k, rounds=rounds)
    alive = hist.filter(F.col("round") == rounds).select("node")
    es = _sym(edges_df)
    return (
        es.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .groupBy("dst")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .select(F.col("dst").alias("node"), "core_degree")
    )


def test_kcore_incremental_equals_from_scratch(spark):
    """k-core maintenance on adversarial shapes: a batch edge that
    RESCUES a previously-peeled node (its degree crosses k), a new
    node, and a cascade (the rescue re-qualifies a neighbor next
    round)."""
    from files_kraken_spark.operators.graph import (
        kcore_history,
        kcore_incremental,
    )

    # base: K4 on {1,2,3,4} (3-core) + path 5-6-7 hanging off 4
    base = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (6, 7),
    ]
    # batch: densify {4,5,6,7} so the peeled tail joins the 3-core,
    # plus new node 8 attached thrice (immediately 3-core-eligible)
    delta = [(4, 6), (4, 7), (5, 7), (1, 8), (2, 8), (3, 8)]
    base_df = spark.createDataFrame(base, ["u", "v"])
    delta_df = spark.createDataFrame(delta, ["u", "v"])
    union_df = base_df.unionByName(delta_df)

    for k, rounds in ((3, 4), (2, 2)):
        hist = kcore_history(base_df, k=k, rounds=rounds)
        merged = kcore_incremental(union_df, delta_df, hist, k=k, rounds=rounds)
        want = {
            (r["node"], r["core_degree"])
            for r in _kcore_scratch(spark, union_df, k, rounds).collect()
        }
        got = {(r["node"], r["core_degree"]) for r in merged.collect()}
        assert got == want, f"k={k} rounds={rounds}"


def test_kcore_changefeed_equals_from_scratch(spark):
    """Mixed feed: retracting an edge UNRAVELS part of the core
    (peeling cascade) while an append rescues elsewhere — both must
    compose exactly."""
    from files_kraken_spark.operators.graph import (
        kcore_apply_changes,
        kcore_history,
    )

    base = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (3, 5), (4, 5), (5, 6),
    ]
    retracted = [(3, 4)]  # K4 loses an edge: 3 and 4 drop to deg 3
    added = [(5, 7), (6, 7), (4, 6)]
    post = sorted((set(base) - set(retracted)) | set(added))
    base_df = spark.createDataFrame(base, ["u", "v"])
    post_df = spark.createDataFrame(post, ["u", "v"])
    add_df = spark.createDataFrame(added, ["u", "v"])
    re_df = spark.createDataFrame(retracted, ["u", "v"])

    for k, rounds in ((3, 4), (2, 3)):
        hist = kcore_history(base_df, k=k, rounds=rounds)
        merged = kcore_apply_changes(
            post_df, hist, added_edges=add_df, retracted_edges=re_df,
            k=k, rounds=rounds,
        )
        want = {
            (r["node"], r["core_degree"])
            for r in _kcore_scratch(spark, post_df, k, rounds).collect()
        }
        got = {(r["node"], r["core_degree"]) for r in merged.collect()}
        assert got == want, f"k={k} rounds={rounds}"


def test_label_prop_apply_changes_equals_from_scratch(spark):
    """Mixed LP changefeed: a retraction that flips a winner (losing
    the tie-making neighbor) + an append elsewhere + a node whose last
    edge dies (leaves the frame) — all must match from-scratch."""
    from files_kraken_spark.operators.graph import (
        label_prop_apply_changes,
        label_prop_decremental,
        label_prop_history,
    )

    def sym(pairs):
        return sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})

    base = sym([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 1)])
    retracted = sym([(4, 5), (6, 1)])
    added = sym([(2, 7)])
    post = sorted((set(base) - set(retracted)) | set(added))

    base_df = spark.createDataFrame(base, ["u", "v"])
    post_df = spark.createDataFrame(post, ["u", "v"])
    add_df = spark.createDataFrame(added, ["u", "v"])
    re_df = spark.createDataFrame(retracted, ["u", "v"])

    for rounds in (1, 3):
        hist = label_prop_history(base_df, rounds=rounds)
        merged = label_prop_apply_changes(
            post_df, add_df, re_df, hist, rounds=rounds
        )
        scratch = (
            label_prop_history(post_df, rounds=rounds)
            .filter(F.col("round") == rounds)
            .select("n", "lab")
        )
        got = {(r["n"], r["lab"]) for r in merged.collect()}
        want = {(r["n"], r["lab"]) for r in scratch.collect()}
        assert got == want, f"rounds={rounds}"

    # pure retraction path: node 5 loses one of two edges, node 7 absent
    post2 = sorted(set(base) - set(retracted))
    post2_df = spark.createDataFrame(post2, ["u", "v"])
    hist = label_prop_history(base_df, rounds=2)
    merged = label_prop_decremental(post2_df, re_df, hist, rounds=2)
    scratch = (
        label_prop_history(post2_df, rounds=2)
        .filter(F.col("round") == 2)
        .select("n", "lab")
    )
    assert {(r["n"], r["lab"]) for r in merged.collect()} == {
        (r["n"], r["lab"]) for r in scratch.collect()
    }


def test_labelprop_and_kcore_maintain_routes_agree(spark):
    """The LP and k-core routers' paths are interchangeable — merge,
    retrain and both forced-auto branches return identical results —
    and the retrain route warns."""
    import warnings

    from files_kraken_spark.operators.graph import (
        kcore_history,
        kcore_maintain,
        label_prop_history,
        labelprop_maintain,
    )

    def sym(pairs):
        return sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})

    base = sym([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    delta = sym([(5, 6), (2, 5)])
    union = sorted(set(base) | set(delta))
    base_df = spark.createDataFrame(base, ["u", "v"])
    delta_df = spark.createDataFrame(delta, ["u", "v"])
    union_df = spark.createDataFrame(union, ["u", "v"])

    hist = label_prop_history(base_df, rounds=2)
    outs = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        for key, kw in (
            ("merge", {"mode": "merge"}),
            ("retrain", {"mode": "retrain"}),
            ("auto_hi", {"mode": "auto", "frontier_threshold_pct": 100}),
            ("auto_lo", {"mode": "auto", "frontier_threshold_pct": 0}),
        ):
            outs[key] = {
                (r["n"], r["lab"])
                for r in labelprop_maintain(
                    union_df, delta_df, hist, rounds=2, **kw
                ).collect()
            }
    assert outs["merge"] == outs["retrain"] == outs["auto_hi"] == outs["auto_lo"]
    assert any("labelprop_maintain" in str(x.message) for x in w)

    # k-core: canonical undirected edges
    kb = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    kd = [(3, 5), (4, 6), (5, 6), (3, 6)]
    kbase = spark.createDataFrame(kb, ["u", "v"])
    kdelta = spark.createDataFrame(kd, ["u", "v"])
    kunion = spark.createDataFrame(sorted(set(kb) | set(kd)), ["u", "v"])
    khist = kcore_history(kbase, k=3, rounds=3)
    kouts = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        for key, kw in (
            ("merge", {"mode": "merge"}),
            ("retrain", {"mode": "retrain"}),
            ("auto_hi", {"mode": "auto", "frontier_threshold_pct": 100}),
            ("auto_lo", {"mode": "auto", "frontier_threshold_pct": 0}),
        ):
            kouts[key] = {
                (r["node"], r["core_degree"])
                for r in kcore_maintain(
                    kunion, kdelta, khist, k=3, rounds=3, **kw
                ).collect()
            }
    assert (
        kouts["merge"] == kouts["retrain"] == kouts["auto_hi"] == kouts["auto_lo"]
    )
    assert any("kcore_maintain" in str(x.message) for x in w)

"""Incremental view maintenance queries (round 12) — the RELATIONAL
leg of the maintain-vs-retrain story, next to graph
(``queries/graph_maintenance``), text-index
(``queries/index_maintenance``), ANN (``queries/ann_maintenance``),
curation (``t_curation_*``) and dedup (``dedup_incremental``):

- ``v_ivm_incremental`` — merge an insert batch into a persisted
  join-aggregate view via the classic delta-join expansion
  ΔO⋈L ∪ O⋈ΔL ∪ ΔO⋈ΔL (three |Δ|-bounded joins, base⋈base never
  recomputed); oracle = the from-scratch view on the full union.
- ``v_ivm_decremental`` — retract a tombstoned-order batch:
  COUNT/SUM subtract as BIGINT counters, emptied groups leave the
  view, MIN/MAX re-elect over ONLY the affected groups' survivors
  (the non-subtractable aggregates' rescan, semi-join bounded).
- ``v_ivm_changefeed`` — inserts and retractions in ONE batch
  through the shared merge core (``operators/ivm.apply_changes``).
- ``v_ivm_delta_cost`` — the maintenance cost model as data: how
  many fact rows / groups the batch actually touches vs view totals.
- ``v_ivm_maintain_route`` — the routing decision as data: the
  deletion-affected-group fraction (the rescan-cost driver) and the
  merge-vs-retrain route it implies — notably the first family on
  this corpus where the probe picks MERGE (~2.5% of orders tombstone
  → ~22% of customer groups affected, well under the 50% bar), the
  regime the graph routers' dense corpora never reached.
- ``v_ivm_serve_merged`` — the deployment-shaped cost: view state
  persisted once per session (``_serve_state``), the query reads it
  and applies only the batch.

View: ``SELECT o_custkey, count, sum(qty), sum(revenue), min(price),
max(qty) FROM orders ⋈ lineitem GROUP BY o_custkey`` — a fact⋈dim
join-aggregate with both subtractable and non-subtractable
aggregates, which is what makes the retraction leg non-trivial.

Splits are pure integer predicates, identical on both engines:
orders ``o_orderkey % 10 < 8`` = base, rest = ΔO; lineitems
``(l_orderkey*7 + l_linenumber) % 5 <> 0`` = base, rest = ΔL
(independent of the order split, so ALL THREE delta-join terms are
non-empty — base lineitems of new orders, new lineitems of base
orders, and new⋈new); tombstones ``o_orderkey % 40 = 1`` (⊂ base).
Measures are fixed-point BIGINT (qty integral, price in cents,
revenue in cent-percent micro-units), so merged-equals-retrained is
bit-identical; the single presentation division is the same fixed
expression in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ivm as IVM
from ..sources.tables import load_table
from . import register

def _o_base():  # column exprs built lazily — no session at import
    return F.col("o_orderkey") % 10 < 8


def _l_base():
    return (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 5 != 0


def _tomb():
    return F.col("o_orderkey") % 40 == 1

_SQL_O_BASE = "o.o_orderkey % 10 < 8"
_SQL_L_BASE = "(l.l_orderkey * 7 + l.l_linenumber) % 5 <> 0"
_SQL_TOMB = "o.o_orderkey % 40 = 1"


def _view_sql(where: str = "") -> str:
    """From-scratch join-aggregate view over an optionally restricted
    fact set — the single formula source every leg's oracle reuses
    (the retrain target the merges must hit bit-for-bit)."""
    return f"""
WITH f AS (
  SELECT o.o_custkey,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_c100
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  {where}
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       (sum(rev_c100) // 100) / 100.0 AS revenue,
       min(price_c) / 100.0 AS min_price,
       CAST(max(qty) AS BIGINT) AS max_qty
FROM f GROUP BY 1"""


def _tables(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def _splits(spark: SparkSession, sf_dir: str):
    orders, lineitem = _tables(spark, sf_dir)
    return (
        orders.filter(_o_base()),
        orders.filter(~_o_base()),
        lineitem.filter(_l_base()),
        lineitem.filter(~_l_base()),
    )


def _delta_join_facts(o_base, o_delta, l_base, l_delta) -> DataFrame:
    """Δ(O⋈L) as three |Δ|-bounded joins — disjoint by construction
    (each fact row's (order-side, line-side) membership is unique),
    so the union needs no dedup. The base⋈base term is the persisted
    view; it is never recomputed."""
    return (
        IVM.fact_rows(o_delta, l_base)
        .unionByName(IVM.fact_rows(o_base, l_delta))
        .unionByName(IVM.fact_rows(o_delta, l_delta))
    )


@register(
    "v_ivm_incremental",
    oracle=_view_sql(),
    doc="Incremental JOIN-AGGREGATE view maintenance, insert leg: the "
    "base view (orders%10<8 ⋈ base lineitems, grouped by customer) "
    "is the persisted state; the batch merges via the classic "
    "delta-join expansion ΔO⋈L ∪ O⋈ΔL ∪ ΔO⋈ΔL — three joins bounded "
    "by the delta (AQE broadcasts the small sides), one partial "
    "aggregate over their union, one |Δ-groups|-bounded outer-join "
    "merge where COUNT/SUM add as BIGINT counters and MIN/MAX fold "
    "with least/greatest (insert-only ⇒ no rescan anywhere). The "
    "oracle is the from-scratch view on the full union, so the "
    "hash-compare IS the merged-equals-retrained proof — exact "
    "because every measure is fixed-point BIGINT. Scale shape: the "
    "base fact scan never reruns; at 100 TB the three delta joins "
    "probe bucketed base tables and the state merge touches only "
    "batch groups. The relational sibling of t_index_incremental_bm25.",
)
def v_ivm_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    state = IVM.view_aggregate(IVM.fact_rows(o_base, l_base))
    delta = _delta_join_facts(o_base, o_delta, l_base, l_delta)
    return IVM.present_view(IVM.merge_insert(state, delta))


@register(
    "v_ivm_decremental",
    oracle=_view_sql(
        f"WHERE {_SQL_O_BASE} AND {_SQL_L_BASE} AND NOT ({_SQL_TOMB})"
    ),
    doc="Decremental view maintenance — the retraction leg: orders "
    "with o_orderkey%40=1 tombstone out of the base view. COUNT/SUM "
    "subtract as additive BIGINT counters (one |tombstone-groups| "
    "outer join); a group whose count reaches zero leaves the view; "
    "MIN/MAX are NOT subtractable, so the affected groups (those "
    "with ≥1 retracted row — ~22% of customers at a 2.5% order "
    "tombstone rate) re-elect by rescanning ONLY their surviving "
    "fact rows via a broadcast left-semi restriction — the "
    "re-election design t_curation_decremental uses for dedup reps, "
    "applied to SQL aggregates. Oracle = the from-scratch view over "
    "the survivors. Scale shape: counter pass O(|batch|); rescan "
    "bounded by affected groups' rows (orders bucketed by customer "
    "⇒ partition-pruned), never the full fact table.",
)
def v_ivm_decremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, _, l_base, _ = _splits(spark, sf_dir)
    state = IVM.view_aggregate(IVM.fact_rows(o_base, l_base))
    del_facts = IVM.fact_rows(o_base.filter(_tomb()), l_base)
    survivors = IVM.fact_rows(o_base.filter(~_tomb()), l_base)
    merged = IVM.apply_changes(state, None, del_facts, survivors)
    return IVM.present_view(merged)


@register(
    "v_ivm_changefeed",
    oracle=_view_sql(f"WHERE NOT ({_SQL_TOMB})"),
    doc="Mixed-changefeed view maintenance: ONE batch carrying both "
    "the insert delta (all three delta-join terms, minus rows of "
    "concurrently tombstoned orders) and the retraction of "
    "o_orderkey%40=1 orders, applied through the shared merge core "
    "(operators/ivm.apply_changes) — counters resolve insert-minus-"
    "retract in a single three-way outer join, emptied groups drop, "
    "retraction-affected groups re-elect MIN/MAX from survivors "
    "(which include the batch's own inserts: a group can lose its "
    "min to a tombstone and regain a smaller one from the insert "
    "side in the same batch). Oracle = the from-scratch view over "
    "everything except tombstoned orders. The relational sibling of "
    "g_pagerank_changefeed / t_index_changefeed_bm25.",
)
def v_ivm_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    state = IVM.view_aggregate(IVM.fact_rows(o_base, l_base))
    ins = _delta_join_facts(o_base, o_delta, l_base, l_delta).filter(
        F.col("o_orderkey") % 40 != 1
    )
    del_facts = IVM.fact_rows(o_base.filter(_tomb()), l_base)
    survivors = IVM.fact_rows(o_base.filter(~_tomb()), l_base).unionByName(ins)
    merged = IVM.apply_changes(state, ins, del_facts, survivors)
    return IVM.present_view(merged)


@register(
    "v_ivm_delta_cost",
    oracle=f"""
WITH bf AS (
  SELECT o.o_custkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE {_SQL_O_BASE} AND {_SQL_L_BASE}
),
df AS (
  SELECT o.o_custkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE NOT ({_SQL_O_BASE} AND {_SQL_L_BASE})
),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM bf) AS n_base_rows,
         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM bf)
           AS n_groups,
         (SELECT CAST(count(*) AS BIGINT) FROM df) AS n_delta_rows,
         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM df)
           AS n_delta_groups
)
SELECT n_base_rows, n_groups, n_delta_rows, n_delta_groups,
       CAST((n_delta_rows * 1000000) // n_base_rows AS BIGINT)
         AS delta_row_ppm,
       CAST((n_delta_groups * 1000000) // n_groups AS BIGINT)
         AS touched_group_ppm
FROM c""",
    doc="The IVM cost model as data (the relational analogue of "
    "t_index_delta_cost / g_pagerank_delta_frontier): how many fact "
    "rows the delta-join terms actually produce and how many view "
    "groups they touch, vs the base view's totals — the numbers that "
    "decide whether maintaining beats retraining (delta rows ≈ the "
    "merge's scan cost; touched groups ≈ the state-merge width). "
    "Exact BIGINT counts, ppm via truncating integer division.",
)
def v_ivm_delta_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    base = IVM.fact_rows(o_base, l_base)
    delta = _delta_join_facts(o_base, o_delta, l_base, l_delta)
    b = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_base_rows"),
        F.countDistinct(IVM.KEY).cast("long").alias("n_groups"),
    )
    d = delta.agg(
        F.count(F.lit(1)).cast("long").alias("n_delta_rows"),
        F.countDistinct(IVM.KEY).cast("long").alias("n_delta_groups"),
    )
    return b.crossJoin(d).select(
        "n_base_rows",
        "n_groups",
        "n_delta_rows",
        "n_delta_groups",
        F.expr(
            "CAST((n_delta_rows * 1000000) DIV n_base_rows AS BIGINT)"
        ).alias("delta_row_ppm"),
        F.expr(
            "CAST((n_delta_groups * 1000000) DIV n_groups AS BIGINT)"
        ).alias("touched_group_ppm"),
    )


@register(
    "v_ivm_maintain_route",
    oracle=f"""
WITH bf AS (
  SELECT o.o_custkey, o.o_orderkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE {_SQL_O_BASE} AND {_SQL_L_BASE}
),
c AS (
  SELECT (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM bf)
           AS n_groups,
         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM bf
          WHERE o_orderkey % 40 = 1) AS n_affected
)
SELECT n_groups, n_affected,
       CAST((n_affected * 1000000) // n_groups AS BIGINT) AS affected_ppm,
       CASE WHEN 100 * n_affected > 50 * n_groups
            THEN 'retrain' ELSE 'merge' END AS route
FROM c""",
    doc="The IVM routing decision as data — the pagerank_maintain / "
    "cc_maintain probe applied to view maintenance: retractions are "
    "what makes a view merge expensive (the MIN/MAX re-election "
    "rescans every affected group), so the probe reads the "
    "DELETION-affected-group fraction (two bounded aggregates over "
    "the batch's group keys vs the state's) and routes at the 50% "
    "bar. On this corpus the 2.5% order-tombstone batch touches "
    "~22% of customer groups → route = MERGE — the first family "
    "where the probe lands on the maintain side, the regime the "
    "dense graph corpora never reached (their one-hop frontiers "
    "saturate; a view's damage is capped by the batch's own group "
    "keys). Both paths are bit-identical (v_ivm_decremental's "
    "hash-green is that proof), so this one number IS the decision.",
)
def v_ivm_maintain_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, _, l_base, _ = _splits(spark, sf_dir)
    base = IVM.fact_rows(o_base, l_base)
    g = base.agg(F.countDistinct(IVM.KEY).cast("long").alias("n_groups"))
    a = base.filter(F.col("o_orderkey") % 40 == 1).agg(
        F.countDistinct(IVM.KEY).cast("long").alias("n_affected")
    )
    return g.crossJoin(a).select(
        "n_groups",
        "n_affected",
        F.expr("CAST((n_affected * 1000000) DIV n_groups AS BIGINT)").alias(
            "affected_ppm"
        ),
        F.when(
            100 * F.col("n_affected") > 50 * F.col("n_groups"),
            F.lit("retrain"),
        )
        .otherwise(F.lit("merge"))
        .alias("route"),
    )


@register(
    "v_ivm_serve_merged",
    oracle=_view_sql(f"WHERE NOT ({_SQL_TOMB})"),
    doc="SERVE-ONLY view maintenance (the sim_*_topk_serve / "
    "g_pagerank_serve_merged measurement split): the base view state "
    "is persisted ONCE per session to scratch parquet — the "
    "materialized view a deployment's store already holds — and the "
    "query reads it and applies only the mixed changefeed batch "
    "(delta joins + counter merge + affected-group re-election), so "
    "repeated runs measure the per-batch merge cost, where "
    "v_ivm_changefeed's wall is dominated by rebuilding the very "
    "state it then maintains. Same oracle as the end-to-end "
    "changefeed (from-scratch view over everything except tombstoned "
    "orders) — only the measurement boundary moved.",
)
def v_ivm_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        o_base, _, l_base, _ = _splits(spark, sf_dir)
        return {"state": IVM.view_aggregate(IVM.fact_rows(o_base, l_base))}

    state = serve_state(spark, sf_dir, "ivm", _build)["state"]
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    ins = _delta_join_facts(o_base, o_delta, l_base, l_delta).filter(
        F.col("o_orderkey") % 40 != 1
    )
    del_facts = IVM.fact_rows(o_base.filter(_tomb()), l_base)
    survivors = IVM.fact_rows(o_base.filter(~_tomb()), l_base).unionByName(ins)
    merged = IVM.apply_changes(state, ins, del_facts, survivors)
    return IVM.present_view(merged)


@register(
    "v_ivm_route_history",
    oracle=f"""
WITH bf AS (
  SELECT DISTINCT o.o_custkey, o.o_orderkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE {_SQL_O_BASE} AND {_SQL_L_BASE}
),
c1 AS (
  SELECT (SELECT count(DISTINCT o_custkey) FROM bf) AS n_groups,
         (SELECT count(DISTINCT o_custkey) FROM bf
          WHERE o_orderkey % 40 = 1) AS n_affected
),
bf2 AS (SELECT * FROM bf WHERE o_orderkey % 40 <> 1),
c2 AS (
  SELECT (SELECT count(DISTINCT o_custkey) FROM bf2) AS n_groups,
         (SELECT count(DISTINCT o_custkey) FROM bf2
          WHERE o_orderkey % 2 = 0) AS n_affected
)
SELECT CAST(1 AS BIGINT) AS batch,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_affected AS BIGINT) AS n_affected,
       CAST((n_affected * 1000000) // n_groups AS BIGINT) AS affected_ppm,
       CASE WHEN 100 * n_affected > 50 * n_groups
            THEN 'retrain' ELSE 'merge' END AS route
FROM c1
UNION ALL
SELECT CAST(2 AS BIGINT),
       CAST(n_groups AS BIGINT),
       CAST(n_affected AS BIGINT),
       CAST((n_affected * 1000000) // n_groups AS BIGINT),
       CASE WHEN 100 * n_affected > 50 * n_groups
            THEN 'retrain' ELSE 'merge' END
FROM c2""",
    doc="Per-batch ROUTE HISTORY of the ivm_maintain auto-router as "
    "data (round-13: the round-12 verdict's 'routers inside the "
    "runtime' item) — the view state folds forward through TWO "
    "retraction batches via operators/ivm.ivm_maintain, and each "
    "batch's probe record (state groups, deletion-affected groups, "
    "the route the 50% bar implies) is served as one row. Batch 1 "
    "(the %40 tombstone wave) affects ~22% of customer groups → "
    "merge; batch 2 (every surviving even-keyed order) affects most "
    "groups → retrain — the mid-stream route FLIP, driven by the "
    "data, not the caller. The oracle replays both probes as pure "
    "set arithmetic over the same splits, so hash-green proves the "
    "router's inputs AND its decision at every scale (the route "
    "column is the CASE over the same counts — if the data says "
    "merge at sf0.001, both engines say merge). The probe is two "
    "state-bounded jobs per batch, the same bounded-collect contract "
    "as g_pagerank_maintain_route; the E2E foreachBatch twin "
    "(test_view_maintenance) pins that the flip happens mid-STREAM "
    "with state staying hash-equal to from-scratch after every batch.",
)
def v_ivm_route_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, _, l_base, _ = _splits(spark, sf_dir)
    state = IVM.view_aggregate(IVM.fact_rows(o_base, l_base))
    hist = []

    o1 = o_base.filter(~_tomb())
    dels1 = IVM.fact_rows(o_base.filter(_tomb()), l_base)
    state, info1 = IVM.ivm_maintain(
        state, None, dels1, IVM.fact_rows(o1, l_base)
    )
    hist.append((1, info1))

    even = F.col("o_orderkey") % 2 == 0
    dels2 = IVM.fact_rows(o1.filter(even), l_base)
    state, info2 = IVM.ivm_maintain(
        state, None, dels2, IVM.fact_rows(o1.filter(~even), l_base)
    )
    hist.append((2, info2))

    rows = [
        (
            b,
            i["n_groups"],
            i["n_affected"],
            i["n_affected"] * 1_000_000 // i["n_groups"],
            i["route"],
        )
        for b, i in hist
    ]
    return spark.createDataFrame(
        rows,
        "batch long, n_groups long, n_affected long, "
        "affected_ppm long, route string",
    )


# --- second view schema (round-13): the declarative-measure proof ---
# A DIFFERENT view through the UNCHANGED merge core: lineitem ⋈
# supplier grouped by nation, with its own measure spec (count, sum,
# MIN over tax, MAX over price — the extremes point the other way
# than the default view's). apply_changes/merge_insert/view_aggregate
# take the spec as data; nothing in operators/ivm.py names a column.

_MEASURES2 = (
    IVM.Measure("n_lines", "count"),
    IVM.Measure("sum_qty", "sum", "qty"),
    IVM.Measure("min_tax_c", "min", "tax_c"),
    IVM.Measure("max_price_c", "max", "price_c"),
)


def _l2_base():  # line-level split, independent of view 1's
    return (F.col("l_orderkey") * 3 + F.col("l_linenumber")) % 7 != 0


def _l2_tomb():  # line-level tombstones inside the base
    return (F.col("l_orderkey") + 11 * F.col("l_linenumber")) % 41 == 3


_SQL_L2_BASE = "(l.l_orderkey * 3 + l.l_linenumber) % 7 <> 0"
_SQL_L2_TOMB = "(l.l_orderkey + 11 * l.l_linenumber) % 41 = 3"


def _supp_facts(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """View 2's fact rows: lineitem ⋈ supplier on the supplier key,
    keyed by nation. Narrow projections both sides; supplier is a
    classic broadcast dim (10k rows/TB)."""
    s = supplier.select(
        "s_suppkey", F.col("s_nationkey").cast("long").alias("nationkey")
    )
    l = lineitem.select(
        "l_suppkey",
        F.round("l_quantity").cast("long").alias("qty"),
        IVM._micro("l_tax", 100).alias("tax_c"),
        IVM._micro("l_extendedprice", 100).alias("price_c"),
    )
    return l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"]).select(
        "nationkey", "qty", "tax_c", "price_c"
    )


def _view2_sql(where: str = "") -> str:
    return f"""
WITH f AS (
  SELECT CAST(s.s_nationkey AS BIGINT) AS nationkey,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_tax * 100) AS BIGINT) AS tax_c,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  {where}
)
SELECT nationkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(min(tax_c) AS BIGINT) AS min_tax_c,
       CAST(max(price_c) AS BIGINT) AS max_price_c
FROM f GROUP BY 1"""


@register(
    "v_ivm2_incremental",
    oracle=_view2_sql(),
    doc="SECOND-SCHEMA view maintenance, insert leg — the declarative-"
    "measure proof (round-13): a per-NATION view over lineitem ⋈ "
    "supplier with its own Measure spec (count, sum(qty), MIN over "
    "tax, MAX over price — extremes pointing the OPPOSITE way from "
    "the default view's min-price/max-qty) maintained through the "
    "UNCHANGED operators/ivm.apply_changes core, which since round 13 "
    "takes the measure list as data (kind decides the algebra: "
    "count/sum are subtractable BIGINT counters, min/max fold with "
    "least/greatest on inserts) — nothing in the operator names a "
    "column. Line-level split (l_orderkey*3+l_linenumber)%7; oracle = "
    "the from-scratch view on the full table, so hash-green IS "
    "merged-equals-retrained on a second schema. Supplier is a "
    "broadcast dim; at 100 TB the delta join probes it map-side.",
)
def v_ivm2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _tables(spark, sf_dir)
    supplier = load_table(spark, sf_dir, "supplier")
    state = IVM.view_aggregate(
        _supp_facts(lineitem.filter(_l2_base()), supplier),
        ["nationkey"],
        _MEASURES2,
    )
    delta = _supp_facts(lineitem.filter(~_l2_base()), supplier)
    return IVM.merge_insert(state, delta, ["nationkey"], _MEASURES2)


@register(
    "v_ivm2_changefeed",
    oracle=_view2_sql(f"WHERE NOT ({_SQL_L2_BASE} AND {_SQL_L2_TOMB})"),
    doc="SECOND-SCHEMA view maintenance, mixed changefeed: the nation-"
    "grain supplier view under inserts (the %7 line split) AND "
    "line-level retractions ((l_orderkey+11*l_linenumber)%41=3 "
    "tombstones) in ONE batch through the spec-driven "
    "apply_changes — counters resolve insert-minus-retract in the "
    "three-way outer merge, retraction-affected nations re-elect "
    "MIN(tax)/MAX(price) from survivors (which include the batch's "
    "inserts). With ~25 nation groups every group is affected, so "
    "this leg exercises the re-election path at 100% saturation — "
    "the regime where the router would pick retrain; the merge must "
    "STILL be bit-identical, which is what the oracle (from-scratch "
    "over survivors) proves. Completes the round-13 generality claim: "
    "two schemas, two key shapes, opposite extreme directions, one core.",
)
def v_ivm2_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _tables(spark, sf_dir)
    supplier = load_table(spark, sf_dir, "supplier")
    l_base = lineitem.filter(_l2_base())
    state = IVM.view_aggregate(
        _supp_facts(l_base, supplier), ["nationkey"], _MEASURES2
    )
    ins = _supp_facts(lineitem.filter(~_l2_base()), supplier)
    dels = _supp_facts(l_base.filter(_l2_tomb()), supplier)
    survivors = _supp_facts(
        l_base.filter(~_l2_tomb()), supplier
    ).unionByName(ins)
    return IVM.apply_changes(
        state, ins, dels, survivors, ["nationkey"], _MEASURES2
    )


@register(
    "q_hist_quantile_changefeed",
    oracle=f"""
WITH v AS (
  SELECT l.l_returnflag AS flag,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem l
  WHERE NOT ({_SQL_L2_BASE} AND {_SQL_L2_TOMB})
),
b AS (SELECT flag, c // 131072 AS bin FROM v),
bc AS (SELECT flag, bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
st AS (
  SELECT flag, CAST(count(*) AS BIGINT) AS n,
         round(quantile_cont(c, 0.50), 6) AS ex50,
         round(quantile_cont(c, 0.95), 6) AS ex95
  FROM v GROUP BY 1
),
cum AS (
  SELECT flag, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM bc
),
qq AS (
  SELECT c.flag, c.bin, c.cnt, c.cum - c.cnt AS cum_before, q.q,
         ((st.n - 1) * q.q) // 100 AS r, st.ex50, st.ex95
  FROM cum c JOIN st USING (flag), (VALUES (50), (95)) q(q)
)
SELECT flag AS l_returnflag,
       CAST(q AS BIGINT) AS q_pct,
       CAST(bin * 131072
            + ((r - cum_before) * 131072) // cnt AS BIGINT) AS est_cents,
       CASE WHEN q = 50 THEN ex50 ELSE ex95 END AS exact_cents
FROM qq
WHERE cum_before <= r AND r < cum_before + cnt""",
    doc="MAINTAINED histogram-quantile sketch under a mixed changefeed "
    "— the third schema through the declarative measure core, and the "
    "one that needs NO survivor table: the state is per-(flag, bin) "
    "row counters over FIXED 131072-cent price bins (fixed edges are "
    "what make a histogram maintainable — q_hist_quantile_sketch's "
    "min/max-scaled bins would shift under retraction), a pure-COUNT "
    "Measure spec, so apply_changes resolves inserts minus "
    "retractions in the counter merge alone and the re-election "
    "machinery never engages (the round-13 early return, here as a "
    "registered query). Serving is unchanged sketch algebra: "
    "cumulative bin counts locate p50/p95, in-bin linear "
    "interpolation in pure int64, the EXACT interpolated percentile "
    "over the survivors beside it as the audit column. At 100 TB this "
    "is the percentile dashboard kept current by vector addition — "
    "O(|flags|×|bins|) state, map-side partial merge, no sort, no "
    "rescan, retraction-exact (contrast approx_percentile's opaque "
    "non-subtractable sketch).",
)
def q_hist_quantile_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    _, lineitem = _tables(spark, sf_dir)
    spec = (IVM.Measure("cnt", "count"),)
    keys = ["flag", "bin"]

    def _facts(li):
        return li.select(
            F.col("l_returnflag").alias("flag"),
            F.expr(
                "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
                " div 131072"
            ).alias("bin"),
        )

    l_base = lineitem.filter(_l2_base())
    state = IVM.view_aggregate(_facts(l_base), keys, spec)
    ins = _facts(lineitem.filter(~_l2_base()))
    dels = _facts(l_base.filter(_l2_tomb()))
    bc = IVM.apply_changes(state, ins, dels, None, keys, spec)

    surv = lineitem.filter(~(_l2_base() & _l2_tomb())).select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("c"),
    )
    st = surv.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("c", F.lit(0.50)), 6).alias("ex50"),
        F.round(F.percentile("c", F.lit(0.95)), 6).alias("ex95"),
    )
    cum = bc.withColumn(
        "cum",
        F.sum("cnt")
        .over(
            W.partitionBy("flag")
            .orderBy("bin")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("long"),
    )
    qq = (
        cum.join(F.broadcast(st), "flag")
        .withColumn("q", F.explode(F.array(F.lit(50), F.lit(95))))
        .withColumn("cum_before", F.col("cum") - F.col("cnt"))
        .withColumn("r", F.expr("((n - 1) * q) div 100"))
    )
    return (
        qq.filter(
            (F.col("cum_before") <= F.col("r"))
            & (F.col("r") < F.col("cum_before") + F.col("cnt"))
        )
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("q").cast("long").alias("q_pct"),
            F.expr(
                "CAST(bin * 131072"
                " + ((r - cum_before) * 131072) div cnt AS BIGINT)"
            ).alias("est_cents"),
            F.when(F.col("q") == 50, F.col("ex50"))
            .otherwise(F.col("ex95"))
            .alias("exact_cents"),
        )
    )


def _distinct_facts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    o = orders.select("o_orderkey", IVM.KEY)
    l = lineitem.select("l_orderkey", "l_partkey")
    return l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        IVM.KEY, "o_orderkey", "l_partkey"
    )


@register(
    "v_ivm_distinct_changefeed",
    oracle=f"""
SELECT o.o_custkey, CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_distinct
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE NOT ({_SQL_TOMB})
GROUP BY 1""",
    doc="COUNT(DISTINCT) view maintenance under a mixed changefeed — "
    "the classic support-multiset design (IVM literature / DBSP "
    "reduce): COUNT(DISTINCT part) per customer is NOT subtractable "
    "(a retraction can't tell whether another row still supports the "
    "value), so the persisted state is the auxiliary multiset "
    "(customer, part, multiplicity) where multiplicity IS a "
    "subtractable BIGINT counter — insert adds, retraction subtracts, "
    "the (customer, part) row leaves at zero, and the view is one "
    "cnt>0 count per customer. One outer-join merge bounded by the "
    "batch's (group, value) pairs, no rescan ever — contrast MIN/MAX, "
    "which re-elect. Oracle = from-scratch COUNT(DISTINCT) over "
    "everything except tombstoned orders. State is "
    "|distinct (customer, part)| rows, bucketed by customer at the "
    "store — the space-for-subtractability trade stated as data.",
)
def v_ivm_distinct_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    base = _distinct_facts(o_base, l_base)
    ins = (
        _distinct_facts(o_delta, l_base)
        .unionByName(_distinct_facts(o_base, l_delta))
        .unionByName(_distinct_facts(o_delta, l_delta))
        .filter(F.col("o_orderkey") % 40 != 1)
    )
    dels = _distinct_facts(o_base.filter(_tomb()), l_base)
    state = IVM.distinct_support(base, "l_partkey")
    merged = IVM.merge_distinct_support(state, ins, dels, "l_partkey")
    return IVM.distinct_view(merged)


# shared oracle CTEs for the KMV distinct sketch: per-customer ranked
# md5 part-key hashes — mirrors operators/ivm.distinct_kmv_state
_SQL_KMV_RANKED = """
kmv_pairs AS (
  SELECT DISTINCT o.o_custkey,
         CAST(('0x' || substr(md5(CAST(l.l_partkey AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
kmv_ranked AS (
  SELECT o_custkey, h,
         row_number() OVER (PARTITION BY o_custkey ORDER BY h) AS rn
  FROM kmv_pairs
)"""

_SQL_KMV_EST = """
SELECT o_custkey,
       CAST(CASE WHEN count(*) < 64 THEN count(*)
            ELSE (63 * 4294967296) // greatest(max(h), 1) END
            AS BIGINT) AS kmv_distinct_est
FROM kmv_ranked WHERE rn <= 64 GROUP BY 1"""


@register(
    "v_ivm_distinct_kmv_incremental",
    oracle="WITH " + _SQL_KMV_RANKED + _SQL_KMV_EST,
    doc="SKETCH-ROUTED COUNT(DISTINCT) maintenance, the state-growth "
    "answer (round-13, closing round-12's one growing-state callout): "
    "the exact support multiset is |distinct (customer, part)| rows — "
    "×10 exponent 0.50, the only state in the family that grows with "
    "the corpus — so past the crossover the maintained state becomes "
    "a per-customer KMV (theta) sketch: the 64 smallest md5 part "
    "hashes, ≤64 rows/customer FOREVER. This leg proves the sketch's "
    "maintenance contract: base sketch + the insert delta's three "
    "join terms merged via the k-smallest-of-union property (any "
    "hash under the union's 64th minimum is under its own side's), "
    "so the MERGED sketch equals the from-scratch sketch on the full "
    "corpus bit-for-bit, and the served estimate ((k-1)·2^32 div "
    "h_k, exact below k) hash-matches DuckDB's replay. Append-only "
    "by design: a sketch cannot subtract (evicted hashes are gone) — "
    "the honest trade v_ivm_distinct_maintain_route prices. Same "
    "estimator as t_kmv_distinct_tokens (Bar-Yossef et al. 2002).",
)
def v_ivm_distinct_kmv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    state = IVM.distinct_kmv_state(
        _distinct_facts(o_base, l_base), "l_partkey"
    )
    ins = (
        _distinct_facts(o_delta, l_base)
        .unionByName(_distinct_facts(o_base, l_delta))
        .unionByName(_distinct_facts(o_delta, l_delta))
    )
    merged = IVM.merge_distinct_kmv(state, ins, "l_partkey")
    return IVM.distinct_kmv_view(merged)


@register(
    "v_ivm_distinct_kmv_error",
    oracle="WITH "
    + _SQL_KMV_RANKED
    + """,
est AS ("""
    + _SQL_KMV_EST
    + """),
exact AS (
  SELECT o.o_custkey, CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS nd
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
),
j AS (
  SELECT e.nd, s.kmv_distinct_est AS est,
         abs(s.kmv_distinct_est - e.nd) * 1000000 // e.nd AS err_ppm
  FROM exact e JOIN est s USING (o_custkey)
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN err_ppm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(max(err_ppm) AS BIGINT) AS max_err_ppm,
       CAST(sum(err_ppm) // count(*) AS BIGINT) AS mean_err_ppm,
       CAST(sum(CASE WHEN err_ppm <= 381000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_within_3sigma
FROM j""",
    doc="The KMV sketch's ERROR BOUND registered as data: every "
    "customer's sketch estimate (served from the MERGED sketch — the "
    "maintenance path, not a fresh build) joins its exact "
    "COUNT(DISTINCT part), and the one-row audit reports the group "
    "count, how many estimates are exactly right (every group still "
    "under 64 distinct hashes — the sketch IS the set there), the "
    "max and mean relative error in ppm (truncating integer "
    "division), and how many groups sit within the 3σ bound — "
    "3/sqrt(k-2) = 381000 ppm for k=64, the Bar-Yossef guarantee, "
    "hard-coded identically on both engines. Everything is exact "
    "integer arithmetic over the same md5 hashes, so the accuracy "
    "CLAIM itself is hash-proved, not asserted — the same "
    "audit-as-data design as t_minhash_est_vs_exact / "
    "q_hist_quantile_sketch's exact audit.",
)
def v_ivm_distinct_kmv_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    state = IVM.distinct_kmv_state(
        _distinct_facts(o_base, l_base), "l_partkey"
    )
    ins = (
        _distinct_facts(o_delta, l_base)
        .unionByName(_distinct_facts(o_base, l_delta))
        .unionByName(_distinct_facts(o_delta, l_delta))
    )
    est = IVM.distinct_kmv_view(IVM.merge_distinct_kmv(state, ins, "l_partkey"))
    orders, lineitem = _tables(spark, sf_dir)
    exact = (
        _distinct_facts(orders, lineitem)
        .groupBy(IVM.KEY)
        .agg(F.countDistinct("l_partkey").cast("long").alias("nd"))
    )
    j = exact.join(est, IVM.KEY).select(
        F.expr("abs(kmv_distinct_est - nd) * 1000000 div nd").alias("err_ppm")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("err_ppm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.max("err_ppm").cast("long").alias("max_err_ppm"),
        F.expr("CAST(sum(err_ppm) div count(*) AS BIGINT)").alias(
            "mean_err_ppm"
        ),
        F.sum(F.when(F.col("err_ppm") <= 381000, 1).otherwise(0))
        .cast("long")
        .alias("n_within_3sigma"),
    )


@register(
    "v_ivm_distinct_maintain_route",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey, l.l_partkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS multiset_rows,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_groups
  FROM pairs
)
SELECT multiset_rows, n_groups,
       CAST(n_groups * 64 AS BIGINT) AS sketch_cap_rows,
       CASE WHEN multiset_rows > n_groups * 64
            THEN 'sketch' ELSE 'exact' END AS route
FROM c""",
    doc="The exact-vs-sketch STATE-SHAPE decision as data: the exact "
    "support multiset costs |distinct (customer, part)| state rows "
    "and stays exact under retractions; the KMV sketch caps state at "
    "64 rows/customer but is append-only and ±1/sqrt(62) past 64 "
    "distinct values — so the probe compares the multiset's actual "
    "row count against the sketch cap (n_groups × k) and routes to "
    "the sketch only when the multiset is LARGER. Unlike "
    "ivm_maintain's per-batch flip this is a design-time decision "
    "(the two state shapes don't convert in place — a flip is a "
    "rebuild), which is why it's served as data, not wired into "
    "foreachBatch. Honest answer on this corpus: customers average "
    "well under 64 distinct parts at test scales, so the route is "
    "EXACT — the sketch's regime is the 0.50-exponent extrapolation "
    "(avg distinct values/group crossing k), stated in SCALING.md "
    "rather than manufactured here.",
)
def v_ivm_distinct_maintain_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _tables(spark, sf_dir)
    pairs = _distinct_facts(orders, lineitem).select(IVM.KEY, "l_partkey").distinct()
    c = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("multiset_rows"),
        F.countDistinct(IVM.KEY).cast("long").alias("n_groups"),
    )
    return c.select(
        "multiset_rows",
        "n_groups",
        (F.col("n_groups") * 64).cast("long").alias("sketch_cap_rows"),
        F.when(
            F.col("multiset_rows") > F.col("n_groups") * 64, F.lit("sketch")
        )
        .otherwise(F.lit("exact"))
        .alias("route"),
    )


@register(
    "v_ivm_topk_changefeed",
    oracle=f"""
WITH f AS (
  SELECT o.o_custkey, o.o_orderkey,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE NOT ({_SQL_TOMB})
),
r AS (
  SELECT o_custkey, o_orderkey, qty, price_c,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY price_c DESC, o_orderkey, qty
         ) AS rnk
  FROM f
)
SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk, price_c, o_orderkey, qty
FROM r WHERE rnk <= 3""",
    doc="TOP-K ranked-view maintenance under a mixed changefeed — the "
    "per-customer top-3 lineitems by price (leaderboard shape): an "
    "INSERT can only displace stored rows, so groups without a "
    "retraction re-rank just their k stored rows plus the group's "
    "inserts (any base row outside the stored top-k is dominated by "
    "k pooled rows — no rescan); a RETRACTION of a stored row leaves "
    "rank k+1 unknown, so retraction-touched groups re-elect from "
    "their surviving fact rows (broadcast-left-semi bounded — MIN/MAX "
    "re-election generalized to k; the stored rows keep their FULL "
    "sort key so fold ties break exactly as from-scratch). Oracle = "
    "the from-scratch window top-3 over everything except tombstoned "
    "orders, total order via the (price desc, orderkey, qty) chain.",
)
def v_ivm_topk_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    state = IVM.topk_view(IVM.fact_rows(o_base, l_base), k=3)
    ins = _delta_join_facts(o_base, o_delta, l_base, l_delta).filter(
        F.col("o_orderkey") % 40 != 1
    )
    dels = IVM.fact_rows(o_base.filter(_tomb()), l_base)
    survivors = IVM.fact_rows(o_base.filter(~_tomb()), l_base).unionByName(ins)
    merged = IVM.merge_topk(state, ins, dels, survivors, k=3)
    return merged.select(
        IVM.KEY, F.col("rnk").cast("long").alias("rnk"),
        "price_c", "o_orderkey", "qty",
    )


@register(
    "v_ivm_rollup_changefeed",
    oracle=f"""
WITH f AS (
  SELECT CAST(o.o_custkey AS VARCHAR) AS ck, o.o_orderpriority AS pr,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_c100
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE NOT ({_SQL_TOMB})
)
SELECT coalesce(ck, 'ALL') AS custkey, coalesce(pr, 'ALL') AS priority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(sum(rev_c100) AS BIGINT) AS sum_rev_c100,
       CAST(min(price_c) AS BIGINT) AS min_price_c,
       CAST(max(qty) AS BIGINT) AS max_qty
FROM f GROUP BY ROLLUP(ck, pr)""",
    doc="MULTI-GRAIN rollup view maintenance under a mixed changefeed "
    "— q_incremental_rollup's hypertable story (insert-only, single "
    "table, one grain) generalized to a join view under inserts AND "
    "retractions at THREE grains: the engine maintains ONLY the "
    "finest grain (customer, priority) through the shared changefeed "
    "core (composite-key apply_changes — same delta joins, counter "
    "subtraction, re-election), and the coarser grains are served by "
    "RE-AGGREGATING the maintained state (operators/ivm.rollup_state) "
    "— COUNT/SUM add, MIN of MINs, MAX of MAXes — the rollup-lattice "
    "property: one merge keeps every grain current, and no coarse "
    "grain ever touches a fact row. Oracle = from-scratch GROUP BY "
    "ROLLUP over the survivors ('ALL' marks rolled-up levels). At "
    "100 TB this is the continuous-aggregate cascade: the finest "
    "state is |customer×priority| rows; each coarser grain is one "
    "state-bounded aggregation.",
)
def v_ivm_rollup_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = ["o_custkey", "o_orderpriority"]
    dims = ("o_orderpriority",)
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    state = IVM.view_aggregate(
        IVM.fact_rows(o_base, l_base, dims), keys
    )
    ins = (
        IVM.fact_rows(o_delta, l_base, dims)
        .unionByName(IVM.fact_rows(o_base, l_delta, dims))
        .unionByName(IVM.fact_rows(o_delta, l_delta, dims))
        .filter(F.col("o_orderkey") % 40 != 1)
    )
    dels = IVM.fact_rows(o_base.filter(_tomb()), l_base, dims)
    survivors = IVM.fact_rows(
        o_base.filter(~_tomb()), l_base, dims
    ).unionByName(ins)
    finest = IVM.apply_changes(state, ins, dels, survivors, keys)

    stats = ["n_items", "sum_qty", "sum_rev_c100", "min_price_c", "max_qty"]
    g2 = finest.select(
        F.col("o_custkey").cast("string").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        *stats,
    )
    g1 = IVM.rollup_state(finest, ["o_custkey"]).select(
        F.col("o_custkey").cast("string").alias("custkey"),
        F.lit("ALL").alias("priority"),
        *stats,
    )
    g0 = IVM.rollup_state(finest, []).select(
        F.lit("ALL").alias("custkey"), F.lit("ALL").alias("priority"), *stats
    )
    return g2.unionByName(g1).unionByName(g0)


# --- fourth schema: MOMENT measures (avg / variance / covariance) ---
#
# The classic streaming-statistics result, as view maintenance: every
# central moment up to order 2 is a pure function of the power sums
# (n, Σx, Σx², Σxy), and power sums are plain SUM measures over
# derived fact columns — so mean, variance and covariance maintain
# under inserts AND retractions through the UNCHANGED counter algebra
# of apply_changes, with NO survivor table and NO re-election (the
# pure-counter early return; contrast Welford/Chan merge formulas,
# which this integer formulation makes exact instead of
# floating-point). Presentation follows the house fixed-point rule:
# the variance NUMERATOR n·Σx² − (Σx)² and covariance NUMERATOR
# n·Σxy − Σx·Σy are served as exact BIGINTs (no division — the
# covariance numerator is SIGNED, and the two engines disagree on
# negative integer-division semantics), the mean as one truncating
# DIV at milli scale over positive operands.

_MOMENTS = (
    IVM.Measure("n_items", "count"),
    IVM.Measure("sum_qty", "sum", "qty"),
    IVM.Measure("sum_qty2", "sum", "qty2"),
    IVM.Measure("sum_price_c", "sum", "price_c"),
    IVM.Measure("sum_qp", "sum", "qp"),
)


def _moment_facts(facts: DataFrame) -> DataFrame:
    """Add the derived power-sum columns to view-1 fact rows. qty ≤ 50
    keeps every qty moment far inside BIGINT at any group size; the
    qty×price cross term is bounded by ~5e8 per row, so its per-group
    sums stay exact past 1e9 rows/group."""
    return facts.withColumn("qty2", F.col("qty") * F.col("qty")).withColumn(
        "qp", F.col("qty") * F.col("price_c")
    )


_MOMENTS_SQL_F = f"""
  SELECT o.o_custkey,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE NOT ({_SQL_TOMB})"""


@register(
    "v_ivm_moments_changefeed",
    oracle=f"""
WITH f AS ({_MOMENTS_SQL_F})
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST((sum(qty) * 1000) // count(*) AS BIGINT) AS avg_qty_milli,
       CAST(count(*) * sum(qty * qty) - sum(qty) * sum(qty) AS BIGINT)
         AS var_qty_num,
       CAST(count(*) * sum(qty * price_c) - sum(qty) * sum(price_c)
            AS BIGINT) AS cov_qp_num
FROM f GROUP BY 1""",
    doc="MAINTAINED mean/variance/covariance under a mixed changefeed "
    "— the fourth schema through the declarative measure core, and "
    "the second (after the histogram) that needs NO survivor table: "
    "the state is the per-customer power sums (n, Σq, Σq², Σp, Σqp), "
    "every one a plain SUM measure over derived fact columns "
    "(qty², qty·price built at fact-row construction), so the "
    "changefeed resolves entirely in the subtractable-counter merge — "
    "retraction is subtraction, the classic streaming-moments result "
    "made retraction-exact by integer power sums where Welford/Chan "
    "merges accumulate float error. Serving derives avg (one "
    "truncating DIV over positive operands), the variance numerator "
    "n·Σq²−(Σq)² and the SIGNED covariance numerator n·Σqp−Σq·Σp as "
    "exact BIGINTs (no division on signed values — the engines' "
    "integer-division semantics differ below zero). Oracle = the "
    "same statistics from scratch over the survivors. At 100 TB: "
    "O(|groups|) state, map-side partial merge, router's pure-counter "
    "fast path (zero probe jobs) — the mean/variance dashboard kept "
    "current by vector addition.",
)
def v_ivm_moments_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    state = IVM.view_aggregate(
        _moment_facts(IVM.fact_rows(o_base, l_base)), measures=_MOMENTS
    )
    ins = _moment_facts(
        _delta_join_facts(o_base, o_delta, l_base, l_delta).filter(
            F.col("o_orderkey") % 40 != 1
        )
    )
    dels = _moment_facts(IVM.fact_rows(o_base.filter(_tomb()), l_base))
    merged, info = IVM.ivm_maintain(
        state, ins, dels, measures=_MOMENTS, mode="auto"
    )
    assert info["route"] == "merge" and info["n_groups"] is None, info
    return merged.select(
        "o_custkey",
        "n_items",
        "sum_qty",
        F.expr("sum_qty * 1000 DIV n_items").alias("avg_qty_milli"),
        (
            F.col("n_items") * F.col("sum_qty2")
            - F.col("sum_qty") * F.col("sum_qty")
        ).alias("var_qty_num"),
        (
            F.col("n_items") * F.col("sum_qp")
            - F.col("sum_qty") * F.col("sum_price_c")
        ).alias("cov_qp_num"),
    )


@register(
    "v_ivm_moments_outliers",
    oracle=f"""
WITH f AS ({_MOMENTS_SQL_F}),
g AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qty) AS BIGINT) AS s,
         CAST(sum(qty * qty) AS BIGINT) AS s2
  FROM f GROUP BY 1
),
t AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
         CAST(sum(s2) AS BIGINT) AS ss2
  FROM g
)
SELECT g.o_custkey,
       g.n AS n_items,
       CAST((g.s * 1000) // g.n AS BIGINT) AS avg_qty_milli,
       CAST(sign(g.s * t.nn - g.n * t.ss) AS BIGINT) AS dev_sign,
       CAST(CASE WHEN
              (CAST(g.s AS HUGEINT) * t.nn - CAST(g.n AS HUGEINT) * t.ss)
            * (CAST(g.s AS HUGEINT) * t.nn - CAST(g.n AS HUGEINT) * t.ss)
            > 4 * (CAST(t.nn AS HUGEINT) * t.ss2
                   - CAST(t.ss AS HUGEINT) * t.ss)
                * CAST(g.n AS HUGEINT) * g.n
            THEN 1 ELSE 0 END AS BIGINT) AS is_outlier_2sigma
FROM g, t""",
    doc="2σ mean-deviation outlier flags served ENTIRELY from "
    "maintained moment counters — group stats from the view state, "
    "GLOBAL stats from its rollup (power sums re-aggregate exactly: "
    "the global moments are the vector sum of the group counters, "
    "rollup_state with keys=[]), so flagging every customer whose "
    "mean qty deviates from the corpus mean by >2 population σ "
    "touches NO fact row. The comparison (Σqᵢ·N − nᵢ·S)² > "
    "4·(N·S2 − S²)·nᵢ² is exact: the deviation numerator fits BIGINT "
    "but its SQUARE overflows 2⁶³ already at sf0.1 (≈4.5e9² ≈ 2e19), "
    "so both engines square in 128-bit exact types — decimal(38,0) "
    "Spark-side, HUGEINT in DuckDB — keeping boundary ties "
    "bit-deterministic where a double compare would flip them. At "
    "100 TB this is anomaly detection as a pure O(|groups|) "
    "presentation over incrementally-maintained state, headroom to "
    "~1e38 before the guard type saturates.",
)
def v_ivm_moments_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    state = IVM.view_aggregate(
        _moment_facts(IVM.fact_rows(o_base, l_base)), measures=_MOMENTS
    )
    ins = _moment_facts(
        _delta_join_facts(o_base, o_delta, l_base, l_delta).filter(
            F.col("o_orderkey") % 40 != 1
        )
    )
    dels = _moment_facts(IVM.fact_rows(o_base.filter(_tomb()), l_base))
    merged = IVM.apply_changes(state, ins, dels, measures=_MOMENTS)
    glob = IVM.rollup_state(merged, [], _MOMENTS).select(
        F.col("n_items").alias("nn"),
        F.col("sum_qty").alias("ss"),
        F.col("sum_qty2").alias("ss2"),
    )
    d38 = "decimal(38,0)"
    dev = F.col("sum_qty") * F.col("nn") - F.col("n_items") * F.col("ss")
    dev38 = (
        F.col("sum_qty").cast(d38) * F.col("nn")
        - F.col("n_items").cast(d38) * F.col("ss")
    )
    var38 = (
        F.col("nn").cast(d38) * F.col("ss2")
        - F.col("ss").cast(d38) * F.col("ss")
    )
    return merged.crossJoin(F.broadcast(glob)).select(
        "o_custkey",
        "n_items",
        F.expr("sum_qty * 1000 DIV n_items").alias("avg_qty_milli"),
        F.signum(dev).cast("long").alias("dev_sign"),
        F.when(
            dev38 * dev38
            > F.lit(4).cast(d38) * var38 * F.col("n_items").cast(d38)
            * F.col("n_items"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_outlier_2sigma"),
    )


# --- heavy-hitters maintenance: Misra-Gries, the frequent-items -----
# sibling of the KMV distinct sketch: k-bounded state, mergeable,
# append-only, error bound served as data, exact-vs-sketch state
# shape served as a route. Domain: per-user event counts ("top
# talkers") over the events table — the value population (users)
# grows with the corpus while the summary stays k rows.

_MG_K = 32
_SQL_EV_BASE = "event_id % 5 <> 0"


_MG_ORACLE_INCREMENTAL = f"""
WITH bc AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE {_SQL_EV_BASE} GROUP BY 1
),
bt AS (
  SELECT CASE WHEN count(*) = {_MG_K + 1} THEN min(cnt) ELSE 0 END AS t
  FROM (SELECT cnt FROM bc ORDER BY cnt DESC, user_id LIMIT {_MG_K + 1})
),
bs AS (
  SELECT user_id, cnt - bt.t AS cnt FROM bc, bt WHERE cnt - bt.t > 0
),
dc AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE NOT ({_SQL_EV_BASE}) GROUP BY 1
),
dt AS (
  SELECT CASE WHEN count(*) = {_MG_K + 1} THEN min(cnt) ELSE 0 END AS t
  FROM (SELECT cnt FROM dc ORDER BY cnt DESC, user_id LIMIT {_MG_K + 1})
),
ds AS (
  SELECT user_id, cnt - dt.t AS cnt FROM dc, dt WHERE cnt - dt.t > 0
),
m AS (
  SELECT user_id,
         coalesce(bs.cnt, 0) + coalesce(ds.cnt, 0) AS cnt
  FROM bs FULL JOIN ds USING (user_id)
),
mt AS (
  SELECT CASE WHEN count(*) = {_MG_K + 1} THEN min(cnt) ELSE 0 END AS t
  FROM (SELECT cnt FROM m ORDER BY cnt DESC, user_id LIMIT {_MG_K + 1})
)
SELECT user_id, CAST(cnt - mt.t AS BIGINT) AS mg_cnt
FROM m, mt WHERE cnt - mt.t > 0"""


def _mg_state_and_delta(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    state = IVM.mg_reduce(IVM.mg_counts(base, "user_id"), "user_id", _MG_K)
    d_sum = IVM.mg_reduce(IVM.mg_counts(delta, "user_id"), "user_id", _MG_K)
    return ev, IVM.merge_mg(state, d_sum, "user_id", _MG_K)


@register(
    "ev_heavy_mg_incremental",
    oracle=_MG_ORACLE_INCREMENTAL,
    doc="Heavy-hitters (frequent-items) maintenance via mergeable "
    "Misra-Gries summaries — the frequent-ITEMS sibling of the KMV "
    "distinct sketch (same contract: k-bounded state, deterministic "
    "merge the oracle replays bit-for-bit, error bound as data). "
    "Complements the round-7 STREAMING Misra-Gries fold "
    "(streaming/stateful.py mg_sketch_update — per-key, "
    "arrival-order-sensitive, so its oracle could only audit the "
    "guarantee): this is the order-FREE mergeable-summary form, whose "
    "result is a pure function of the input multiset and therefore "
    "hash-provable, the right shape for distributed batch state. "
    "State = the base events' MG summary (exact per-user counts "
    "reduced once: subtract the rank-(k+1) count, keep positive "
    "residues — at most k=32 rows however many users exist); an "
    "event batch folds in by summary MERGE (pairwise residue sum + "
    "one reduction, the Agarwal-et-al mergeable-summaries rule, a "
    "public result). The reduction threshold is the rank count "
    "VALUE, so boundary ties cannot change it — that determinism is "
    "what lets DuckDB replay build, merge and all. The global "
    "rank-(k+1) threshold is a distributed top-(k+1) "
    "(TakeOrderedAndProject — no single-task window stage) "
    "broadcast as a 1-row frame. At 100 TB: per-partition partial "
    "counts shuffle once to k+1-bounded state; the summary never "
    "grows with the user population (contrast the exact counter "
    "table's one-row-per-user) — the top-talkers dashboard in k "
    "rows of state.",
)
def ev_heavy_mg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, merged = _mg_state_and_delta(spark, sf_dir)
    return merged.select("user_id", F.col("cnt").alias("mg_cnt"))


@register(
    "ev_heavy_mg_error",
    oracle=f"""
WITH ms AS ({_MG_ORACLE_INCREMENTAL}),
ex AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_events FROM events
),
s AS (
  SELECT CAST(coalesce(sum(mg_cnt), 0) AS BIGINT) AS kept FROM ms
),
j AS (
  SELECT ex.user_id, ex.true_cnt - coalesce(ms.mg_cnt, 0) AS under
  FROM ex LEFT JOIN ms USING (user_id)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_users,
       (SELECT CAST(count(*) AS BIGINT) FROM ms) AS n_tracked,
       CAST((SELECT max(under) FROM j) AS BIGINT) AS max_under,
       CAST((tot.n_events - s.kept) // {_MG_K + 1} AS BIGINT) AS bound,
       CAST((SELECT count(*) FROM j
             WHERE under <= (tot.n_events - s.kept) // {_MG_K + 1})
            AS BIGINT) AS n_within
FROM tot, s""",
    doc="The Misra-Gries deficit bound REGISTERED AS DATA (the "
    "sketch-family honesty contract, same shape as "
    "v_ivm_distinct_kmv_error): every user's undercount — tracked "
    "users' residue deficit AND dropped users' full count — must be "
    "at most (N − Σsummary)/(k+1), because each reduction subtracts "
    "its threshold from at least k+1 values, so total removed mass "
    "bounds the per-value loss. The query joins the merged summary "
    "to the exact per-user counts over the full corpus and serves "
    "n_users / n_tracked / max undercount / the floored bound / how "
    "many users sit inside it — hash-green means n_within = n_users "
    "at every scale, the bound holding as the user population grows "
    "while the summary stays k rows.",
)
def ev_heavy_mg_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, merged = _mg_state_and_delta(spark, sf_dir)
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    tot = ev.agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    kept = merged.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("kept")
    )
    j = exact.join(
        merged.select("user_id", F.col("cnt").alias("mg_cnt")),
        "user_id",
        "left",
    ).select(
        "user_id",
        (F.col("true_cnt") - F.coalesce("mg_cnt", F.lit(0))).alias("under"),
    )
    bound = (
        tot.crossJoin(F.broadcast(kept))
        .select(
            F.expr(f"(n_events - kept) DIV {_MG_K + 1}")
            .cast("long")
            .alias("bound")
        )
    )
    n_tracked = merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_tracked")
    )
    stats = j.crossJoin(F.broadcast(bound)).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.max("under").cast("long").alias("max_under"),
        F.max("bound").cast("long").alias("bound"),
        F.sum(F.when(F.col("under") <= F.col("bound"), 1).otherwise(0))
        .cast("long")
        .alias("n_within"),
    )
    return stats.crossJoin(F.broadcast(n_tracked)).select(
        "n_users", "n_tracked", "max_under", "bound", "n_within"
    )


@register(
    "ev_heavy_mg_route",
    oracle=f"""
WITH c AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_values,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events
)
SELECT n_values, n_events,
       CAST({_MG_K} AS BIGINT) AS sketch_cap_rows,
       CASE WHEN n_values > {_MG_K} THEN 'sketch' ELSE 'exact' END
         AS route
FROM c""",
    doc="The exact-vs-sketch STATE-SHAPE decision for frequent items, "
    "served as design-time data (the KMV route's sibling): the exact "
    "per-value counter table is SUBTRACTABLE (plain counters — it "
    "maintains under retraction) and costs one row per distinct "
    "user; the MG summary caps state at k=32 rows but is append-only "
    "and lossy below the deficit bound. The probe compares the value "
    "population against the sketch cap. Honest answer on this "
    "corpus: users exceed k already at sf0.01 (150 > 32), so the "
    "budget rule picks the sketch — the OPPOSITE route from "
    "v_ivm_distinct_maintain_route's exact, because heavy-hitters "
    "state budgets are per-CORPUS while distinct-count state was "
    "per-group; both probes are the same two bounded aggregates. A "
    "deployment wanting retraction support pays the exact table's "
    "growth; the route registers that trade as data rather than "
    "hiding it.",
)
def ev_heavy_mg_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").cast("long").alias("n_values"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ).select(
        "n_values",
        "n_events",
        F.lit(_MG_K).cast("long").alias("sketch_cap_rows"),
        F.when(F.col("n_values") > _MG_K, F.lit("sketch"))
        .otherwise(F.lit("exact"))
        .alias("route"),
    )


_MG_GK = 8  # per-group cap for the keyed variant


def _mg_grouped_sql(where: str, alias: str) -> str:
    """One keyed MG reduction over exact (event_type, user_id) counts
    restricted by ``where`` — the SQL twin of mg_reduce's windowed
    branch (rank-(k+1) per group via row_number, ties broken by
    user_id; the threshold is the rank count VALUE)."""
    return f"""
{alias}c AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE {where} GROUP BY 1, 2
),
{alias}t AS (
  SELECT event_type, cnt AS t FROM (
    SELECT event_type, cnt,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cnt DESC, user_id) AS rn
    FROM {alias}c
  ) WHERE rn = {_MG_GK + 1}
),
{alias}s AS (
  SELECT c.event_type, c.user_id,
         c.cnt - coalesce(t.t, 0) AS cnt
  FROM {alias}c c LEFT JOIN {alias}t t USING (event_type)
  WHERE c.cnt - coalesce(t.t, 0) > 0
)"""


@register(
    "ev_heavy_mg_grouped",
    oracle=f"""
WITH {_mg_grouped_sql(_SQL_EV_BASE, "b")},
{_mg_grouped_sql(f"NOT ({_SQL_EV_BASE})", "d")},
m AS (
  SELECT event_type, user_id,
         coalesce(bs.cnt, 0) + coalesce(ds.cnt, 0) AS cnt
  FROM bs FULL JOIN ds USING (event_type, user_id)
),
mt AS (
  SELECT event_type, cnt AS t FROM (
    SELECT event_type, cnt,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cnt DESC, user_id) AS rn
    FROM m
  ) WHERE rn = {_MG_GK + 1}
)
SELECT m.event_type, m.user_id,
       CAST(m.cnt - coalesce(mt.t, 0) AS BIGINT) AS mg_cnt
FROM m LEFT JOIN mt USING (event_type)
WHERE m.cnt - coalesce(mt.t, 0) > 0""",
    doc="GROUPED heavy-hitters maintenance — mg_reduce's keyed branch "
    "as a registered query (the global leg above exercises the "
    "distributed top-(k+1) path; this one exercises the per-group "
    "windowed rank, partitioned by event_type — never a global "
    "window): per event type, the top-talker summary capped at k=8 "
    "rows/type, base and batch summaries merged by the same "
    "pairwise-sum + reduce rule, every reduction's threshold a keyed "
    "rank-(k+1) count value the oracle replays with the identical "
    "window. The grouped form is the per-tenant/per-shard deployment "
    "shape: state is |groups|×k rows, maintenance one keyed window "
    "over |groups∪Δ-groups| summary rows — no global coordination "
    "between groups at any point, so the merge parallelizes per "
    "group at 100 TB.",
)
def ev_heavy_mg_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keys = ["event_type"]
    base = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    state = IVM.mg_reduce(
        IVM.mg_counts(base, "user_id", keys), "user_id", _MG_GK, keys
    )
    d_sum = IVM.mg_reduce(
        IVM.mg_counts(delta, "user_id", keys), "user_id", _MG_GK, keys
    )
    merged = IVM.merge_mg(state, d_sum, "user_id", _MG_GK, keys)
    return merged.select(
        "event_type", "user_id", F.col("cnt").alias("mg_cnt")
    )


def _mg_pair_sql(where: str, alias: str) -> str:
    """One global MG reduction over co-occurring token-pair counts
    restricted by ``where`` — the pair-domain twin of the per-user
    chain (threshold = rank-(k+1) count value via a deterministic
    LIMIT, ties broken by the pair string)."""
    return f"""
{alias}tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents WHERE {where}
),
{alias}t2 AS (SELECT doc_id, w FROM {alias}tok WHERE w <> ''),
{alias}c AS (
  SELECT a.w || ' ' || b.w AS pair, CAST(count(*) AS BIGINT) AS cnt
  FROM {alias}t2 a JOIN {alias}t2 b
    ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1
),
{alias}thr AS (
  SELECT CASE WHEN count(*) = {_MG_K + 1} THEN min(cnt) ELSE 0 END AS t
  FROM (SELECT cnt FROM {alias}c ORDER BY cnt DESC, pair LIMIT {_MG_K + 1})
),
{alias}s AS (
  SELECT pair, cnt - t.t AS cnt FROM {alias}c, {alias}thr t
  WHERE cnt - t.t > 0
)"""


@register(
    "t_cooc_heavy_mg",
    oracle=f"""
WITH {_mg_pair_sql("doc_id % 5 <> 0", "b")},
{_mg_pair_sql("doc_id % 5 = 0", "d")},
m AS (
  SELECT pair, coalesce(bs.cnt, 0) + coalesce(ds.cnt, 0) AS cnt
  FROM bs FULL JOIN ds USING (pair)
),
mt AS (
  SELECT CASE WHEN count(*) = {_MG_K + 1} THEN min(cnt) ELSE 0 END AS t
  FROM (SELECT cnt FROM m ORDER BY cnt DESC, pair LIMIT {_MG_K + 1})
)
SELECT pair, CAST(cnt - mt.t AS BIGINT) AS mg_cnt
FROM m, mt WHERE cnt - mt.t > 0""",
    doc="Misra-Gries over the QUADRATIC co-occurrence domain: the "
    "frequent co-occurring token PAIRS of the document corpus, "
    "maintained with k=32 rows of state — the composition that shows "
    "why the mergeable summary earns its keep: the exact pair-count "
    "table is O(V²) (vocabulary²; Heaps-law squared as the corpus "
    "grows), the regime where the per-user exact table's "
    "'just keep the counters' answer stops being cheap. Per-doc "
    "pair counts (each doc contributes its distinct-token pairs "
    "once, a doc_id-keyed equi-self-join with w1<w2 "
    "canonicalization) are partial-aggregated map-side; base and "
    "batch doc splits (doc_id%5) each reduce to a summary and merge "
    "by pairwise-sum + one reduction, every threshold a rank-(k+1) "
    "count value DuckDB replays with the identical deterministic "
    "LIMIT. At 100 TB the pair expansion streams per doc (O(k²/2) "
    "in-flight rows, never materialized), the shuffle carries only "
    "surviving partial counts, and the state is 32 rows however "
    "large V² grows. Same family contract as ev_heavy_mg_*: "
    "underestimates only, deficit bound (N−Σ)/(k+1).",
)
def t_cooc_heavy_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def pair_rows(pred):
        tok = (
            docs.filter(pred)
            .select(
                "doc_id",
                F.explode(
                    F.array_distinct(F.split(F.col("text"), " "))
                ).alias("w"),
            )
            .filter(F.col("w") != "")
        )
        a = tok.select("doc_id", F.col("w").alias("w1"))
        b = tok.select("doc_id", F.col("w").alias("w2"))
        return (
            a.join(b, "doc_id")
            .filter(F.col("w1") < F.col("w2"))
            .select(F.concat_ws(" ", "w1", "w2").alias("pair"))
        )

    base = IVM.mg_reduce(
        IVM.mg_counts(pair_rows(F.col("doc_id") % 5 != 0), "pair"),
        "pair",
        _MG_K,
    )
    delta = IVM.mg_reduce(
        IVM.mg_counts(pair_rows(F.col("doc_id") % 5 == 0), "pair"),
        "pair",
        _MG_K,
    )
    merged = IVM.merge_mg(base, delta, "pair", _MG_K)
    return merged.select("pair", F.col("cnt").alias("mg_cnt"))


@register(
    "ev_heavy_mg_serve_merged",
    oracle=_MG_ORACLE_INCREMENTAL,
    doc="SERVE-ONLY heavy-hitters maintenance: the base events' MG "
    "summary is persisted once per session (_serve_state — the k-row "
    "summary a deployment already holds; at k=32 the stored state is "
    "32 rows however many events the corpus ever saw) and the query "
    "reads it and folds in only the batch: one |batch| count + "
    "reduce + the k-bounded pairwise merge. Same oracle as "
    "ev_heavy_mg_incremental — only the measurement boundary moved, "
    "the serve split every maintained family carries "
    "(g_*_serve_merged / t_index_serve_merged / v_ivm_serve_merged / "
    "mm_phash_serve_merged). The contrast is the family's sharpest: "
    "the persisted state is 32 rows, so serving cost is the batch "
    "scan plus O(k) merge arithmetic — the summary is the cheapest "
    "state any maintained family stores.",
)
def ev_heavy_mg_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        base = ev.filter(F.col("event_id") % 5 != 0)
        return {
            "summary": IVM.mg_reduce(
                IVM.mg_counts(base, "user_id"), "user_id", _MG_K
            )
        }

    state = serve_state(spark, sf_dir, "mg_events", _build)["summary"]
    ev = load_table(spark, sf_dir, "events")
    delta = ev.filter(F.col("event_id") % 5 == 0)
    d_sum = IVM.mg_reduce(IVM.mg_counts(delta, "user_id"), "user_id", _MG_K)
    merged = IVM.merge_mg(state, d_sum, "user_id", _MG_K)
    return merged.select("user_id", F.col("cnt").alias("mg_cnt"))


@register(
    "v_ivm_distinct_kmv_serve_merged",
    oracle="WITH " + _SQL_KMV_RANKED + _SQL_KMV_EST,
    doc="SERVE-ONLY KMV distinct maintenance: the base corpus's "
    "per-customer sketch (≤64 rows/customer however many distinct "
    "parts exist) is persisted once per session (_serve_state) and "
    "the query reads it and folds in only the insert delta's three "
    "join terms — the batch's (group, hash) distinct plus a "
    "(k+|Δgroup|)-bounded re-rank per TOUCHED group; untouched "
    "groups pass through ≤64-row windows unchanged. Same oracle as "
    "v_ivm_distinct_kmv_incremental (merged state is bit-identical "
    "to from-scratch — the k-smallest-of-union property makes the "
    "serve split exact, not just bounded), only the measurement "
    "boundary moved. With this and ev_heavy_mg_serve_merged, BOTH "
    "bounded-state sketches carry the same maintain + serve-only + "
    "error/route legs as every exact maintained family.",
)
def v_ivm_distinct_kmv_serve_merged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        o_base, _, l_base, _ = _splits(spark, sf_dir)
        return {
            "sketch": IVM.distinct_kmv_state(
                _distinct_facts(o_base, l_base), "l_partkey"
            )
        }

    state = serve_state(spark, sf_dir, "kmv_distinct", _build)["sketch"]
    o_base, o_delta, l_base, l_delta = _splits(spark, sf_dir)
    ins = (
        _distinct_facts(o_delta, l_base)
        .unionByName(_distinct_facts(o_base, l_delta))
        .unionByName(_distinct_facts(o_delta, l_delta))
    )
    merged = IVM.merge_distinct_kmv(state, ins, "l_partkey")
    return IVM.distinct_kmv_view(merged)

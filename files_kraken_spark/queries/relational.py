"""General relational query surface (SURVEY §2.6 / M6).

The reference has no SQL engine; its query surface is point lookups
over collected state (``database/_database.py:34-47``). Our engine
attaches the full Spark relational operator set here: aggregations,
multi-way joins (broadcast for dims), windows, rollup, set ops,
anti/semi joins, top-k — each with a DuckDB oracle.

Scale notes (100 TB): every query below is declarative, so Catalyst
pushes filters/projections into the parquet scan; dimension joins are
explicitly broadcast; fact-fact joins shuffle on their keys and AQE
handles skew. Aggregates are partial (map-side combine) by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import register


# Float determinism policy (applies to every oracle-checked query):
# per-row float math is emitted RAW (identical IEEE ops on identical
# inputs → bit-equal across engines). Aggregated sums are rounded at a
# scale where the TRUE sum is exact (all money columns are 2-decimal;
# products of two of them 4-decimal), which both engines reach despite
# different accumulation orders. Averages divide the already-rounded
# (hence identical) sum by the count — no further rounding.


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                       AS sum_qty,
       round(sum(l_extendedprice), 2)                                  AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)               AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(sum(l_quantity), 2) / count(*)                            AS avg_qty,
       round(sum(l_extendedprice), 2) / count(*)                       AS avg_price,
       round(sum(l_discount), 2) / count(*)                            AS avg_disc,
       count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary: wide partial aggregation, filter pushed to scan.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            (F.round(F.sum("l_quantity"), 2) / cnt).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / cnt).alias("avg_price"),
            (F.round(F.sum("l_discount"), 2) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q5_revenue_by_nation",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON s_suppkey   = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    doc="TPC-H Q5 local-supplier revenue: 6-way join; dims broadcast, facts shuffle.",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
HAVING round(sum(l_extendedprice * (1 - l_discount)), 4) > 150000
""",
    doc="TPC-H Q3 shipping priority: segment-filtered 3-way join with "
    "revenue threshold (HAVING instead of top-k: computed-measure "
    "ordering is not cross-engine stable; thresholds are).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 4).alias("revenue"))
        .filter(F.col("revenue") > 150000)
    )


@register(
    "q4_order_priority_check",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
  AND o_orderdate <  TIMESTAMP '2000-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 order-priority checking: correlated EXISTS over the "
    "fact table (decorrelated to a semi join by Catalyst).",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sql import attach

    attach(spark, sf_dir, prefix="v_")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM v_orders o
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
          AND o_orderdate <  TIMESTAMP '2000-07-01'
          AND EXISTS (SELECT 1 FROM v_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q7_nation_volume",
    oracle="""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       year(o_orderdate) AS y,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS volume
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE n1.n_name <> n2.n_name
  AND o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY 1, 2, 3
HAVING count(*) >= 5
""",
    doc="TPC-H Q7-style cross-nation trade volume: self-joined dim "
    "(nation twice), inequality predicate, yearly rollup.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return (
        joined.groupBy(
            "cust_nation", "supp_nation", F.year("o_orderdate").alias("y")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "volume"
            ),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") >= 5)
        .drop("__n")
    )


@register(
    "q_range_frame_rolling",
    oracle="""
SELECT o_orderkey, d,
       round(sum(round(o_totalprice, 2))
             OVER (ORDER BY d RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2)
         AS rolling_30d
FROM (
  SELECT o_orderkey, o_totalprice,
         CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS d
  FROM orders WHERE o_custkey < 50
) t
""",
    doc="RANGE window frame: 30-day rolling revenue per order date "
    "(value-based frame, not row-based). Scale-safe evaluation: the "
    "RANGE frame depends only on the day VALUE, so aggregate per day "
    "first (one shuffle on d), range-join the tiny per-day frame to "
    "itself within the 30-day lookback, and broadcast the rolled-up "
    "day totals back to the fact rows — replacing the single-task "
    "global-window sort with per-day work bounded by the date span.",
)
def q_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    d = (F.unix_timestamp("o_orderdate") / 86400).cast("bigint")
    base = orders.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("p2"), d.alias("d")
    )
    day_sums = base.groupBy("d").agg(F.sum("p2").alias("day_sum"))
    a = day_sums.select(F.col("d"))
    b = day_sums.select(F.col("d").alias("d2"), "day_sum")
    rolled = (
        a.join(
            F.broadcast(b),
            (F.col("d2") >= F.col("d") - 30) & (F.col("d2") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.sum("day_sum").alias("roll"))
    )
    return base.join(F.broadcast(rolled), "d").select(
        "o_orderkey", "d", F.round("roll", 2).alias("rolling_30d")
    )


@register(
    "q_array_ops",
    oracle="""
SELECT l_orderkey,
       array_to_string(list_sort(array_agg(DISTINCT l_linenumber)), ',') AS lines,
       len(array_agg(DISTINCT l_linenumber)) AS n_lines,
       list_contains(array_agg(DISTINCT l_linenumber), 3) AS has_line3,
       list_sort(array_agg(DISTINCT l_linenumber))[1] AS first_line
FROM lineitem
WHERE l_orderkey < 500
GROUP BY l_orderkey
""",
    doc="Array-function surface: sorted collect, size, contains, indexing. "
    "The array is projected as a joined string — array-typed result columns "
    "crash the driver's pandas-based canonicalizer (r1 finding); the engine "
    "operator still returns arrays, only this t2 projection is stringly.",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    arr = F.sort_array(F.collect_set("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(arr, ",").alias("lines"),
        F.size(F.collect_set("l_linenumber")).alias("n_lines"),
        F.array_contains(F.collect_set("l_linenumber"), 3).alias("has_line3"),
        F.element_at(arr, 1).alias("first_line"),
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
""",
    doc="TPC-H Q13 customer distribution: left outer join with an ON-clause "
    "filter, then a second-level aggregation over the first's counts.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (orders["o_custkey"] == customer["c_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_share",
    oracle="""
SELECT round(sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) END), 4)
       / round(sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
  AND l_shipdate <  TIMESTAMP '2000-02-01'
""",
    doc="TPC-H Q14 promo-revenue share: conditional aggregation ratio "
    "(division of identically-rounded sums — bit-equal across engines).",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    return joined.agg(
        (
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev)), 4)
            / F.round(F.sum(rev), 4)
        ).alias("promo_share")
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 5 AND l_quantity <= 25)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_type IN ('ECONOMY', 'PROMO') AND l_quantity < 4)
""",
    doc="TPC-H Q19-style disjunctive multi-attribute predicates across "
    "both join sides (tests predicate normalization + partial pushdown).",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    pred = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 5)
            & (F.col("l_quantity") <= 25)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (F.col("p_type").isin("ECONOMY", "PROMO") & (F.col("l_quantity") < 4))
    )
    return joined.filter(pred).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    doc="Top-k by stored column (deterministic: unique tiebreak on key). "
    "Spark executes as TakeOrderedAndProject — no full sort at scale.",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "q_window_topn_per_group",
    oracle="""
SELECT n_nationkey, c_custkey, c_acctbal, rn
FROM (
  SELECT n_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY n_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) t
WHERE rn <= 3
""",
    doc="Window function with frame: per-nation top-3 customers by balance.",
)
def q_window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_nationkey", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_rollup_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total,
       grouping(o_orderstatus) + 2 * grouping(o_orderpriority) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="ROLLUP grouping sets with GROUPING() disambiguation.",
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        (F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")).alias("gid"),
    )


@register(
    "q_setops_customers",
    oracle="""
SELECT c_custkey, 'both' AS bucket FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) t
UNION ALL
SELECT c_custkey, 'rich_only' AS bucket FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) t
""",
    doc="Set operations: INTERSECT and EXCEPT over two filtered scans.",
)
def q_setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    both = rich.intersect(building).withColumn("bucket", F.lit("both"))
    rich_only = rich.subtract(building).withColumn("bucket", F.lit("rich_only"))
    return both.unionByName(rich_only)


@register(
    "q_anti_join_no_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    doc="Anti join: customers with no large (>300k) order (NOT EXISTS).",
)
def q_anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_semi_join_urgent",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
    doc="Semi join: customers having at least one urgent order (EXISTS).",
)
def q_semi_join_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "q_case_having",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS bucket,
       o_orderstatus,
       count(*) AS n,
       round(sum(o_totalprice), 2) / count(*) AS avg_price
FROM orders
GROUP BY 1, 2
HAVING count(*) > 10
""",
    doc="CASE bucketing + HAVING post-aggregate filter.",
)
def q_case_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
        )
        .filter(F.col("n") > 10)
    )


@register(
    "q_events_hourly",
    oracle="""
SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_s, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling-window aggregation (batch form of the streaming hourly "
    "rollup). Window key as epoch seconds — exact integer math on the "
    "nanosecond timestamps.",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    hour_s = (F.expr("ts div 3600000000000") * 3600).alias("hour_s")
    return events.groupBy(hour_s, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q_events_sessionized_lag",
    oracle="""
SELECT event_id, user_id,
       COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id), -1)
         AS gap_us
FROM events
""",
    doc="LAG window: per-user inter-event gap in microseconds (session "
    "building block). Microsecond resolution on both sides — DuckDB's "
    "parquet reader truncates the nano timestamps to micros.",
)
def q_events_sessionized_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    ts_us = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    gap = ts_us - F.lag(ts_us).over(w)
    return events.select(
        "event_id",
        "user_id",
        F.coalesce(gap, F.lit(-1)).alias("gap_us"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 forecasting revenue change: pure filter+aggregate — "
    "the query where predicate pushdown into the parquet scan is the "
    "whole plan.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 returned-item reporting: 3-way fact join + dim "
    "broadcast, grouped revenue, top-20. Orders/lineitem shuffle on "
    "the order key; customer joins broadcast-side at this scale and "
    "hash-shuffles at 100 TB (AQE decides).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "q12_shipmode_priority",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
    doc="TPC-H Q12 (shipmode-style priority split on linestatus — the "
    "corpus has no shipmode column): conditional counting after a "
    "fact-fact join.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
)
GROUP BY 1, 2, 3, 4, 5
""",
    doc="TPC-H Q18 large-volume customers: IN-subquery over a grouped "
    "HAVING (plans as a semi-join against the aggregated key set).",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT substr(c_name, 10, 1) AS cntrycode,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY 1
""",
    doc="TPC-H Q22 global sales opportunity (anti-join restricted to "
    "urgent orders so the corpus yields rows — every customer has "
    "SOME order here): scalar-subquery threshold + anti-join, grouped "
    "by a name-derived code. The threshold compare is on raw doubles "
    "(identical avg on both engines).",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy(F.substring("c_name", 10, 1).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 top supplier: revenue view + scalar-max subquery "
    "(plans as one aggregate + broadcast of the 1-row max). Rounded "
    "revenue makes the max compare exact on both engines.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        sup.join(revenue, revenue["supplier_no"] == sup["s_suppkey"])
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT round(sum(l.l_extendedprice) / 7.0, 6) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS threshold
      FROM lineitem GROUP BY l_partkey) t
  ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.threshold
""",
    doc="TPC-H Q17 small-quantity-order revenue: correlated per-part "
    "average decorrelated into a self-join against the grouped "
    "aggregate — the standard Catalyst rewrite, expressed explicitly. "
    "Threshold compares raw doubles (identical avg on both engines).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(F.broadcast(part), part["p_partkey"] == li["l_partkey"])
        .join(thr, thr["t_partkey"] == li["l_partkey"])
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@register(
    "q8_market_share",
    oracle="""
SELECT y,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END), 4)
         / round(sum(volume), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS y,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
) t
GROUP BY y
""",
    doc="TPC-H Q8 market share (adapted: no partsupp in this corpus; "
    "share of NATION_5 suppliers in ASIA-region PROMO-part revenue "
    "per year). Plan shape: 8-way join, all dims broadcast, one "
    "shuffle for the yearly rollup; conditional aggregation instead "
    "of a second scan. Both sums are rounded at the exact scale "
    "before the division so the ratio is bit-equal across engines.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(0.0)),
                4,
            ).alias("nation_vol"),
            F.round(F.sum(volume), 4).alias("total_vol"),
        )
        .select("y", (F.col("nation_vol") / F.col("total_vol")).alias("mkt_share"))
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT supp_nation, y, round(sum(amount), 4) AS sum_profit
FROM (
  SELECT n_name AS supp_nation, year(o_orderdate) AS y,
         l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%red%'
) t
GROUP BY supp_nation, y
""",
    doc="TPC-H Q9 product-type profit (adapted: no partsupp, so cost "
    "is modeled as 0.5 * p_retailprice instead of ps_supplycost). "
    "Plan shape preserved: part-name LIKE filter pushed to the part "
    "scan, 5-way join with broadcast dims, nation x year rollup. "
    "Per-row amount is exact at 4 decimals (2-dec x 2-dec and "
    "2-dec x integer quantity), so the rounded sum is bit-equal.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.5) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("supp_nation"), F.year("o_orderdate").alias("y"))
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH shipped AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
best AS (
  SELECT l_partkey AS b_partkey, min(s_acctbal) AS min_bal
  FROM shipped JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY l_partkey
)
SELECT p_partkey, p_brand, s_name, s_acctbal AS supplier_bal, n_name
FROM part
JOIN shipped  ON l_partkey = p_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN best     ON b_partkey = p_partkey AND s_acctbal = min_bal
WHERE p_size = 15 AND p_type = 'SMALL'
""",
    doc="TPC-H Q2 min-cost supplier (adapted: no partsupp; the "
    "part-supplier relation is derived as DISTINCT (partkey, suppkey) "
    "pairs from lineitem, and min s_acctbal stands in for min "
    "ps_supplycost). The correlated MIN subquery is decorrelated into "
    "a grouped aggregate joined back on equality -- the standard "
    "Catalyst rewrite, written explicitly. min() of 2-decimal doubles "
    "is an exact selection, so the equality join is engine-stable.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shipped = li.select("l_partkey", "l_suppkey").distinct()
    with_bal = shipped.join(
        F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey")
    )
    best = with_bal.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        with_bal.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            best,
            (F.col("b_partkey") == F.col("p_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("s_acctbal").alias("supplier_bal"),
            "n_name",
        )
    )


@register(
    "q11_important_stock",
    oracle="""
WITH value_by_part AS (
  SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, part_value
FROM value_by_part
WHERE part_value > (SELECT 0.001 * round(sum(l_extendedprice * l_quantity), 2)
                    FROM lineitem
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation   ON n_nationkey = s_nationkey
                    WHERE n_name = 'NATION_3')
""",
    doc="TPC-H Q11 important stock (adapted: shipped value from "
    "lineitem stands in for partsupp stock value). Plan shape: "
    "grouped aggregate filtered against a scalar global-aggregate "
    "subquery; in Spark the scalar side is a 1-row broadcast cross "
    "join computed from the SAME grouped frame (one scan via reuse, "
    "no second aggregation over the fact table). Both sides round "
    "sums at the exact 2-decimal scale before the comparison.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value_by_part = (
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("part_value"))
    )
    # Total = sum of the already-rounded per-part values would NOT match
    # the oracle (it rounds the global sum once); recompute the global
    # rounded sum from the raw join instead. Catalyst reuses the
    # exchange for both aggregations under AQE.
    total = (
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .agg(
            (
                F.lit(0.001)
                * F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2)
            ).alias("threshold")
        )
    )
    return (
        value_by_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT IN ('PROMO', 'ECONOMY')
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 supplier-part-type count (adapted: part-supplier "
    "pairs derived from lineitem; the excluded-supplier NOT IN list "
    "is negative-balance suppliers instead of comment-matched ones). "
    "Plan shape preserved: distinct pair reduction first (cheapest "
    "shuffle), broadcast part filter, broadcast anti-join for the "
    "NOT IN (keys are non-null so anti-join == NOT IN), then "
    "count(DISTINCT) re-aggregation.",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad_suppliers = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
""",
    doc="TPC-H Q21 suppliers-who-kept-orders-waiting (adapted: no "
    "l_commitdate/l_receiptdate in this corpus, so 'late' means "
    "shipped >60 days after the order date, on finished orders). "
    "Plan shape preserved exactly: the EXISTS becomes a left-semi "
    "join against other-supplier lineitems of the same order and the "
    "NOT EXISTS a left-anti join against other-supplier LATE "
    "lineitems -- the same decorrelation Catalyst applies to the SQL "
    "form. The late set is computed once and reused for l1 and l3.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    return (
        late.join(
            l2,
            (F.col("o2_key") == F.col("l_orderkey"))
            & (F.col("s2_key") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o3_key") == F.col("l_orderkey"))
            & (F.col("s3_key") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q20_excess_shippers",
    oracle="""
WITH per_part AS (
  SELECT l_partkey, l_suppkey, round(sum(l_quantity), 2) AS supp_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
totals AS (
  SELECT l_partkey AS t_partkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM per_part
JOIN totals   ON t_partkey = l_partkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE 'small%' AND supp_qty > 0.2 * total_qty
""",
    doc="TPC-H Q20 excess-availability suppliers (adapted: no partsupp, "
    "so 'holds excess stock' becomes 'shipped >20% of a small%-part's "
    "corpus-wide quantity'). Plan shape preserved: per-(part,supplier) "
    "aggregate, correlated half-of-total threshold decorrelated into a "
    "join against the per-part total — both aggregates reuse ONE scan "
    "exchange under AQE — then broadcast name-filtered part gate and a "
    "distinct supplier projection. Quantities are integer-valued "
    "doubles; sums rounded at 2 are exact, and 0.2*x is one identical "
    "IEEE multiply on both engines.",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_part = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("supp_qty")
    )
    totals = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    )
    return (
        per_part.join(totals, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("supp_qty") > F.lit(0.2) * F.col("total_qty"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


from ..operators.layout import zorder_key_sql as _zorder_key_sql


@register(
    "q_zorder_key",
    oracle="SELECT event_id, ("
    + _zorder_key_sql(["(user_id & 1023)", "((epoch_us(ts) // 1000000) & 1023)"], 10)
    + """) AS zkey
FROM events WHERE event_id < 5000""",
    doc="Z-order clustering key over (user_id, event-second): bit "
    "interleave via pure shift/and/or integer expressions (whole-stage "
    "codegen, engine-portable). `layout.cluster_write` range-partitions "
    "+ sorts on this key so every parquet file covers a tight 2-D box "
    "and min/max stats skip on BOTH columns (locality proven in "
    "tests/test_layout.py: 8x8 box -> <=3 of 16 files vs >=14 hashed).",
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_key

    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    x = F.col("user_id").bitwiseAND(F.lit(1023))
    y = F.expr("ts DIV 1000000000").bitwiseAND(F.lit(1023))
    return events.filter(F.col("event_id") < 5000).select(
        "event_id", zorder_key([x, y], bits=10).alias("zkey")
    )

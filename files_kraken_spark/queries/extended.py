"""Extended coverage: sessionization, cube/pivot, percentiles, string
functions, scalar subqueries, multi-distinct, IVF-style ANN — widening
the relational + pipeline surface with oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.graph import cooccurrence_edges
from ..sources.tables import load_table
from . import register

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "q_sessionize",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), sess AS (
  SELECT user_id, t,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM ev
)
SELECT user_id, session_no,
       count(*) AS n_events,
       max(t) - min(t) AS duration_us
FROM sess
GROUP BY user_id, session_no
""",
    doc="Session windows from first principles: gap>30min starts a new "
    "session (lag + running sum) — the batch equivalent of streaming "
    "session windows, fully oracle-checkable.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    t = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy(t, "event_id")
    is_new = F.when(t - F.lag(t).over(w) > SESSION_GAP_US, 1).otherwise(0)
    sess = events.select(
        "user_id", t.alias("t"), F.col("event_id"), is_new.alias("is_new")
    ).withColumn("session_no", F.sum("is_new").over(
        Window.partitionBy("user_id").orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t") - F.min("t")).alias("duration_us"),
    )


@register(
    "q_cube_events",
    oracle="""
SELECT event_type, user_id % 10 AS user_bucket,
       count(*) AS n,
       grouping(event_type) + 2 * grouping(user_id % 10) AS gid
FROM events
GROUP BY CUBE (event_type, user_id % 10)
""",
    doc="CUBE grouping sets over two dimensions with GROUPING ids.",
)
def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return events.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        (F.grouping("event_type") + 2 * F.grouping("user_bucket")).alias("gid"),
    )


@register(
    "q_pivot_returnflag",
    oracle="""
SELECT l_linestatus,
       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
FROM lineitem
GROUP BY l_linestatus
""",
    doc="PIVOT: per-linestatus quantity totals spread across return flags.",
)
def q_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "q_percentile_qty",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.9)  AS p90,
       quantile_cont(l_quantity, 0.99) AS p99
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Exact interpolated percentiles per group (sort-based aggregate; "
    "at 100 TB prefer approx_percentile — kept exact here for the oracle).",
)
def q_percentile_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90"),
        F.percentile("l_quantity", F.lit(0.99)).alias("p99"),
    )


@register(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS uname,
       length(p_name) AS name_len,
       replace(p_name, ' ', '_') AS snake,
       substr(p_name, 1, 4) AS prefix,
       levenshtein(p_brand, 'Brand#10') AS brand_dist,
       concat(p_brand, '/', p_type) AS brand_type
FROM part
WHERE p_partkey < 500
""",
    doc="Scalar string-function surface: case, length, replace, substr, "
    "levenshtein, concat.",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.substring("p_name", 1, 4).alias("prefix"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("brand_dist"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
    )


@register(
    "q_date_parts",
    oracle="""
SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2
""",
    doc="Date-part extraction + monthly rollup.",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "q_scalar_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) / 1.25
""",
    doc="Scalar subquery threshold (max is engine-exact so the filter "
    "boundary is deterministic).",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_v
        WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders_v) / 1.25
        """
    )


@register(
    "q_multi_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Multiple COUNT(DISTINCT) in one aggregate (Expand-based plan).",
)
def q_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
        F.count_distinct(F.col("l_partkey")).alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_ntile_rank_frames",
    oracle="""
SELECT o_orderkey,
       ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
       rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS prio_rank,
       first_value(o_orderkey) OVER (PARTITION BY o_orderstatus
                                     ORDER BY o_totalprice DESC, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS top_key
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01'
""",
    doc="Window-function surface: ntile, rank with ties, first_value with "
    "an explicit ROWS frame. The global ntile is computed from the "
    "distributed two-phase row number (range exchange + per-partition "
    "rank + broadcast offsets) and pure bucket arithmetic — the "
    "status-partitioned windows stay ordinary windows.",
)
def q_ntile_rank_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_row_number, ntile_from_position

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    base = orders.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    pos = global_row_number(
        base, [F.col("o_totalprice").desc(), F.col("o_orderkey")], "__p"
    )
    n = pos.agg(F.count(F.lit(1)).alias("__n"))
    w_rk = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    w_fv = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return pos.crossJoin(F.broadcast(n)).select(
        "o_orderkey",
        ntile_from_position(F.col("__p"), F.col("__n"), 4).alias("quartile"),
        F.rank().over(w_rk).alias("prio_rank"),
        F.first("o_orderkey").over(w_fv).alias("top_key"),
    )


@register(
    "q_cross_join_dims",
    oracle="""
SELECT r_name, s.o_orderstatus, count(o.o_orderkey) AS n
FROM region r
CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
LEFT JOIN orders o
  ON o.o_orderstatus = s.o_orderstatus AND o.o_orderkey % 5 = r.r_regionkey
GROUP BY 1, 2
""",
    doc="Cross join of small dims + left join with computed key.",
)
def q_cross_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders").alias("o")
    statuses = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("st"))
        .distinct()
    )
    grid = region.crossJoin(statuses)
    joined = grid.join(
        orders,
        (F.col("o.o_orderstatus") == F.col("st"))
        & (F.col("o.o_orderkey") % 5 == F.col("r_regionkey")),
        "left",
    )
    return (
        joined.groupBy("r_name", "st")
        .agg(F.count(F.col("o.o_orderkey")).alias("n"))
        .withColumnRenamed("st", "o_orderstatus")
    )


# ------------------------------------------------------- reference ops

@register(
    "f5_multimatch_vector",
    oracle="""
SELECT p_partkey,
       nullif(regexp_extract(p_name, '^(?:(?:red|blue|hot|cold) \\w+)$', 0), '') AS m0,
       nullif(regexp_extract(p_name, '(ring|bolt|widget)', 1), '') AS m1,
       nullif(regexp_extract(p_name, '(small|large)', 1), '') AS m2
FROM part
WHERE p_partkey < 300
""",
    doc="F5 MultimatchExecutor: per-pattern result vector as columns "
    "(retools/_retools.py:40-73).",
)
def f5_multimatch_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import retools as rt

    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    # raw-string spec = fullmatch returning the WHOLE match (group 0),
    # exactly the reference's convention (retools/_retools.py:54-58)
    vec = rt.multimatch(
        F.col("p_name"),
        [r"(?:red|blue|hot|cold) \w+", (r"(ring|bolt|widget)", 1), (r"(small|large)", 1)],
    )
    return part.select(
        "p_partkey",
        vec[0].alias("m0"),
        vec[1].alias("m1"),
        vec[2].alias("m2"),
    )


@register(
    "f5_multimatch_tuple",
    oracle="""
SELECT p_partkey,
       nullif(regexp_extract(p_name, '(red|blue)', 1), '') AS color_vec,
       CASE WHEN nullif(regexp_extract(p_name, '(red|blue)', 1), '') IS NOT NULL
             AND nullif(regexp_extract(p_name, '(ring|bolt)', 1), '') IS NOT NULL
            THEN concat(regexp_extract(p_name, '(red|blue)', 1), ',',
                        regexp_extract(p_name, '(ring|bolt)', 1))
       END AS color_item_vec
FROM part
WHERE p_partkey < 300
""",
    doc="F5 conjunction tuple parity: a tuple-of-specs element yields "
    "the vector of ALL sub-matches (retools/_retools.py:55-66), "
    "projected as joined strings for the driver canon.",
)
def f5_multimatch_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import retools as rt

    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    vec = rt.multimatch_vectors(
        F.col("p_name"),
        [(r"(red|blue)", 1), ((r"(red|blue)", 1), (r"(ring|bolt)", 1))],
    )
    return part.select(
        "p_partkey",
        F.array_join(vec[0], ",").alias("color_vec"),
        F.array_join(vec[1], ",").alias("color_item_vec"),
    )


@register(
    "d5_subtree_restrict",
    oracle="""
SELECT path, change FROM (
  SELECT concat('/', l_returnflag, '/', l_orderkey, '/', l_linenumber) AS path,
         CASE WHEN l_linestatus = 'O' THEN 'created' ELSE 'deleted' END AS change
  FROM lineitem
) t
WHERE path LIKE '/R/%'
""",
    doc="D5 coworker semantics: restrict a change stream to chosen "
    "subtrees via prefix predicate (monitoring/_monitoring.py:229-264).",
)
def d5_subtree_restrict(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    changes = li.select(
        F.concat(
            F.lit("/"), F.col("l_returnflag"), F.lit("/"),
            F.col("l_orderkey"), F.lit("/"), F.col("l_linenumber"),
        ).alias("path"),
        F.when(F.col("l_linestatus") == "O", "created").otherwise("deleted").alias("change"),
    )
    from ..operators.diff import restrict_to_subtrees

    return restrict_to_subtrees(changes, ["/R"])


@register(
    "s11_point_lookup",
    oracle="""
SELECT concat_ws('__', o_custkey) AS id,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY o_custkey
HAVING concat_ws('__', o_custkey) = '42'
""",
    doc="S11 point lookup by entity key over assembled state "
    "(database/_database.py:34-37 intent — both key parts honored).",
)
def s11_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    state = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select(
        F.concat_ws("__", F.col("o_custkey")).alias("id"), "n_orders", "total"
    )
    return state.filter(F.col("id") == "42")


@register(
    "q_join_strategy_hints",
    oracle="""
SELECT n_name, count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    doc="Join-strategy hints: SHUFFLE_HASH forced over the default "
    "broadcast — results identical regardless of physical strategy "
    "(the knob that matters when a dim outgrows broadcast at 100 TB).",
)
def q_join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").hint("shuffle_hash")
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@register(
    "q_approx_distinct_bounds",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_nd,
       (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        <= 0.05 * count(DISTINCT l_partkey)) AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Approximate distinct (HLL) sanity: each engine's own sketch must "
    "land within 5% of its exact count — the 100 TB path where exact "
    "distinct is too expensive, verified via an engine-neutral bound.",
)
def q_approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.count_distinct(F.col("l_partkey"))
    approx = F.approx_count_distinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_nd"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct"),
    )


@register(
    "q_grouping_sets_explicit",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    doc="Explicit GROUPING SETS (beyond ROLLUP/CUBE shorthands).",
)
def q_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "mm_doc_embedding_join",
    oracle="""
SELECT d.doc_id, d.lang,
       sqrt(list_sum(list_transform(e.embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS vec_norm,
       len(list_filter(regexp_split_to_array(trim(d.text), '\\s+'),
           x -> x <> '')) AS n_tokens
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
WHERE d.doc_id < 200
""",
    doc="Cross-modal dataset assembly: text rows joined to their "
    "embedding vectors with per-modality features in one frame.",
)
def mm_doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count
    from ..functions.vectors import norm

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, emb["vec_id"] == docs["doc_id"]).select(
        "doc_id",
        "lang",
        norm(F.col("embedding")).alias("vec_norm"),
        token_count(F.col("text")).alias("n_tokens"),
    )


@register(
    "q_date_arith",
    oracle="""
SELECT o_orderkey,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS due_date,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
FROM orders
WHERE o_orderkey < 500
""",
    doc="Date arithmetic: day differences, interval addition, month-end. "
    "Date outputs are ISO strings: DATE values stringify differently "
    "across the driver's pandas boundary (datetime.date vs Timestamp).",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.add_months(F.col("o_orderdate"), 3), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.last_day(F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_end"
        ),
    )


@register(
    "q_stats_moments",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(var_samp(l_discount), 6) AS var_disc
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Statistical aggregates: sample stddev/variance, correlation "
    "(rounded past both engines' accumulation-order jitter).",
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )


@register(
    "q_skew_two_phase_agg",
    oracle="""
SELECT l_suppkey,
       round(sum(l_extendedprice), 2) AS total,
       count(*) AS n,
       round(max(l_quantity), 2) AS max_qty
FROM lineitem
GROUP BY l_suppkey
""",
    doc="Skew tool correctness: salted two-phase aggregation must equal "
    "the plain groupBy exactly (operators/skew.two_phase_agg) — the "
    "hot-key mitigation carries no semantic cost.",
)
def q_skew_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import two_phase_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = two_phase_agg(
        li,
        "l_suppkey",
        {"total": "sum:l_extendedprice", "n": "count:*", "max_qty": "max:l_quantity"},
        salt_buckets=16,
    )
    return out.select(
        "l_suppkey",
        F.round("total", 2).alias("total"),
        "n",
        F.round("max_qty", 2).alias("max_qty"),
    )


@register(
    "s1_file_listing",
    oracle=None,  # filesystem source — DuckDB has no lister; rows-only
    doc="S1/S2 scan source: the engine's own listing DataFrame over the "
    "sf_dir (name-matcher gate, metadata schema). Deterministic row set.",
)
def s1_file_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.listing import NameMatcher, list_files

    df = list_files(spark, sf_dir, matcher=NameMatcher(patterns=(r".+\.parquet",)))
    return df.select("name", "depth", "is_dir", (F.col("size") > 0).alias("nonempty"))


@register(
    "s1b_filetree_source",
    oracle=None,  # filesystem source — DuckDB has no lister; rows-only
    doc="The same S1 scan surfaced through the Spark 4 Python "
    "DataSource ('filetree' format): planner-integrated partitioned "
    "listing with depth/name filter pushdown into the walk "
    "(sources/filetree_source.py). Same rows as s1_file_listing.",
)
def s1b_filetree_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.filetree_source import register_filetree

    register_filetree(spark)
    df = (
        spark.read.format("filetree")
        .option("roots", sf_dir)
        .option("patterns", r".+\.parquet")
        .load()
    )
    return df.select("name", "depth", "is_dir", (F.col("size") > 0).alias("nonempty"))


# ------------------------------------------------------------ ANN: IVF

@register(
    "sim_ivf_topk",
    oracle="""
WITH u AS (SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE) * (1.0 /
                    sqrt(list_sum(list_transform(embedding,
                      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))) AS un
           FROM embeddings),
q AS (SELECT vec_id AS q_id, un AS qu, label AS ql FROM u WHERE vec_id < 8),
scored AS (
  SELECT q_id, c.vec_id AS cand_id,
         list_sum(list_transform(range(1, len(qu) + 1),
              i -> qu[i] * c.un[i])) AS cos
  FROM u c JOIN q ON c.label = q.ql AND c.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, cand_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
  FROM scored
)
SELECT q_id, cand_id FROM ranked WHERE rn <= 5
""",
    doc="IVF-style ANN: probe only the query's coarse cluster (the label "
    "column stands in for k-means cell assignment), exact cosine within "
    "the cell — the classic inverted-file scale path for similarity search.",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot, unit

    emb = load_table(spark, sf_dir, "embeddings")
    # normalize per ROW before the cell join: per-pair cost is one dot
    un = emb.select("vec_id", "label", unit(F.col("embedding")).alias("un"))
    q = un.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("un").alias("qu"),
        F.col("label").alias("ql"),
    )
    scored = (
        un.join(F.broadcast(q), (un["label"] == q["ql"]) & (un["vec_id"] != q["q_id"]))
        .select(
            "q_id",
            F.col("vec_id").alias("cand_id"),
            dot(F.col("qu"), F.col("un")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "cand_id")
    )


# ------------------------------------------------------- graph: triangles

@register(
    "q_triangle_count",
    oracle="""
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
o AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e0.u < e0.v)
              THEN e0.u ELSE e0.v END AS s,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND e0.u < e0.v)
              THEN e0.v ELSE e0.u END AS t
  FROM e0 JOIN deg da ON da.node = e0.u JOIN deg db ON db.node = e0.v
)
SELECT w1.s AS node, CAST(count(*) AS BIGINT) AS n_triangles
FROM o w1
JOIN o w2 ON w2.s = w1.t
JOIN o w3 ON w3.s = w1.s AND w3.t = w2.t
GROUP BY w1.s
""",
    doc="Distributed triangle counting (Suri & Vassilvitskii MR recipe) "
    "over the parts-bought-together graph: orient every undirected "
    "edge from lower to higher (degree, id) — each node's out-degree "
    "is then O(sqrt(m)), so the wedge self-join that dominates the "
    "cost is bounded even on power-law graphs where the naive "
    "neighborhood join explodes on hub nodes. Wedges s->t1, t1->t2 "
    "close into triangles via one more edge semi-probe; per-node "
    "counts grouped on the lowest-ordered vertex. All joins are "
    "key-partitioned shuffles; no broadcast assumed (node count at "
    "100 TB exceeds broadcast limits, AQE may still pick one).",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e0 = cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=False)
    und = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    da = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e0.join(da, "u")
        .join(db, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    w1 = o.select(F.col("s").alias("s1"), F.col("t").alias("t1"))
    w2 = o.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
    w3 = o.select(F.col("s").alias("s1"), F.col("t").alias("t2"))
    return (
        w1.join(w2, "t1")
        .join(w3, ["s1", "t2"], "left_semi")
        .groupBy(F.col("s1").alias("node"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "q_fuzzy_match_blocked",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_name FROM part WHERE p_partkey < 5000
),
blocked AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
         a.p_name AS name_a, b.p_name AS name_b
  FROM p a JOIN p b
    ON substr(a.p_name, 1, 4) = substr(b.p_name, 1, 4)
   AND abs(length(a.p_name) - length(b.p_name)) <= 2
   AND a.p_partkey < b.p_partkey
  UNION
  SELECT a.p_partkey, b.p_partkey, a.p_name, b.p_name
  FROM p a JOIN p b
    ON substr(a.p_name, -4) = substr(b.p_name, -4)
   AND abs(length(a.p_name) - length(b.p_name)) <= 2
   AND a.p_partkey < b.p_partkey
)
SELECT id_a, id_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM blocked
WHERE name_a <> name_b AND levenshtein(name_a, name_b) <= 2
""",
    doc="Fuzzy entity matching with multi-pass blocking: candidate pairs "
    "come only from shared (prefix-4, ±2 length) or (suffix-4, ±2 "
    "length) blocks — two equi-join passes unioned, the standard "
    "record-linkage answer to 'edit distance is not an equi-join key' "
    "(either block survives an edit at one end; never corpus²) — then "
    "exact Levenshtein verifies ≤2 on the candidates alone. The edit-"
    "distance DP is integer-exact, so both engines agree bit-for-bit.",
)
def q_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 5000)
        .select("p_partkey", "p_name")
    )

    def side(alias_id, alias_name):
        return p.select(
            F.col("p_partkey").alias(alias_id),
            F.col("p_name").alias(alias_name),
        )

    a, b = side("id_a", "name_a"), side("id_b", "name_b")
    lena, lenb = F.length("name_a"), F.length("name_b")
    common = (
        (F.abs(lena - lenb) <= 2) & (F.col("id_a") < F.col("id_b"))
    )
    pre = a.join(
        b,
        (F.substring("name_a", 1, 4) == F.substring("name_b", 1, 4)) & common,
    )
    suf = a.join(
        b,
        (F.expr("substring(name_a, -4, 4)") == F.expr("substring(name_b, -4, 4)"))
        & common,
    )
    blocked = pre.unionByName(suf).distinct()
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        blocked.filter(
            (F.col("name_a") != F.col("name_b")) & (dist <= 2)
        )
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
    )


@register(
    "q_market_basket_lift",
    oracle="""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM baskets),
item_n AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM baskets GROUP BY item
),
pair_n AS (
  SELECT a.item AS item_a, b.item AS item_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.n_ab,
       round(CAST(p.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE), 6) AS confidence,
       round(CAST(p.n_ab AS DOUBLE) * CAST(nb.n AS DOUBLE)
             / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)), 6) AS lift
FROM pair_n p
JOIN item_n ia ON ia.item = p.item_a
JOIN item_n ib ON ib.item = p.item_b
CROSS JOIN nb
WHERE p.n_ab >= 3
""",
    doc="Market-basket association rules: co-occurrence counts from a "
    "per-basket pair explode (bounded by basket size — the a-priori "
    "candidate-generation shape, never item²), joined against item "
    "supports for confidence and lift. Min-support 3 prunes the "
    "long tail before the stats joins. All shuffles keyed on basket "
    "or item; the single-row basket total is the only broadcast.",
)
def q_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    nb = baskets.agg(F.count_distinct("basket").alias("n"))
    item_n = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = baskets.select("basket", F.col("item").alias("item_a"))
    b = baskets.select("basket", F.col("item").alias("item_b"))
    pair_n = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    ia = item_n.select(F.col("item").alias("item_a"), F.col("n_item").alias("na"))
    ib = item_n.select(F.col("item").alias("item_b"), F.col("n_item").alias("nb_i"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        pair_n.join(ia, "item_a")
        .join(ib, "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a", "item_b", "n_ab",
            F.round(d("n_ab") / d("na"), 6).alias("confidence"),
            F.round(d("n_ab") * d("n") / (d("na") * d("nb_i")), 6).alias("lift"),
        )
    )

"""Advanced SQL semantics coverage: correlated subqueries, IN/NOT IN
NULL traps, ordered string aggregation, per-group top terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from ..sources.tables import load_table
from . import register


@register(
    "q_correlated_min",
    oracle="""
SELECT l.l_orderkey, l.l_partkey, l.l_extendedprice
FROM lineitem l
WHERE l.l_extendedprice = (
  SELECT min(l2.l_extendedprice) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
AND l.l_partkey < 200
""",
    doc="TPC-H Q2-style correlated subquery: rows achieving the per-key "
    "minimum (equality on stored doubles — engine-exact).",
)
def q_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l.l_orderkey, l.l_partkey, l.l_extendedprice
        FROM lineitem_v l
        WHERE l.l_extendedprice = (
          SELECT min(l2.l_extendedprice) FROM lineitem_v l2
          WHERE l2.l_partkey = l.l_partkey
        )
        AND l.l_partkey < 200
        """
    )


@register(
    "q_not_in_null_semantics",
    oracle="""
SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (
     SELECT o_custkey FROM orders
     WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000))
    AS cnt_clean_list,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (
     SELECT CASE WHEN o_totalprice > 450000 THEN NULL ELSE o_custkey END
     FROM orders WHERE o_orderpriority = '1-URGENT'))
    AS cnt_nullable_list
""",
    doc="NOT IN three-valued-logic: a NULL-free list behaves like an anti "
    "join (non-empty count); one NULL in the list empties the result. "
    "Verifies both engines implement ANSI semantics identically.",
)
def q_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    customer.createOrReplaceTempView("customer_v")
    orders.createOrReplaceTempView("orders_v2")
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM customer_v
           WHERE c_custkey NOT IN (
             SELECT o_custkey FROM orders_v2
             WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000))
            AS cnt_clean_list,
          (SELECT count(*) FROM customer_v
           WHERE c_custkey NOT IN (
             SELECT CASE WHEN o_totalprice > 450000 THEN NULL ELSE o_custkey END
             FROM orders_v2 WHERE o_orderpriority = '1-URGENT'))
            AS cnt_nullable_list
        """
    )


@register(
    "q_in_subquery",
    oracle="""
SELECT n_name, count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
GROUP BY n_name
""",
    doc="IN-subquery (decorrelated to a semi join by Catalyst).",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_semi")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@register(
    "q_string_agg_ordered",
    oracle="""
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders
GROUP BY o_orderpriority
""",
    doc="Ordered string aggregation (group_concat): deterministic via "
    "explicit ORDER BY / sorted array join.",
)
def q_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses")
    )


@register(
    "q_try_cast_safe",
    oracle="""
SELECT event_type,
       count(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS parsed_ok,
       count(*) AS total,
       CAST(sum(CASE WHEN TRY_CAST(substr(props, 1, 3) AS INT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS unparseable_prefix
FROM events
GROUP BY event_type
""",
    doc="Safe casting: TRY_CAST returns NULL on malformed input instead "
    "of failing the job — essential under ANSI mode at 100 TB where "
    "one bad record must not kill a stage.",
)
def q_try_cast_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.expr("""TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)""")
    prefix_bad = F.expr("TRY_CAST(substr(props, 1, 3) AS INT)").isNull()
    return events.groupBy("event_type").agg(
        F.count(k).alias("parsed_ok"),
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(prefix_bad, 1).otherwise(0)).alias("unparseable_prefix"),
    )


@register(
    "q_hex_encoding",
    oracle="""
SELECT l_orderkey,
       lower(hex(l_orderkey)) AS key_hex,
       lower(to_base64(encode(CAST(l_orderkey AS VARCHAR)))) AS key_b64
FROM lineitem WHERE l_orderkey < 100
GROUP BY l_orderkey
""",
    doc="Radix/encoding functions: hex and base64 of keys (normalized "
    "case — engines differ in hex letter casing).",
)
def q_hex_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.groupBy("l_orderkey").agg(
        F.lower(F.hex(F.col("l_orderkey"))).alias("key_hex"),
        F.lower(F.base64(F.col("l_orderkey").cast("string").cast("binary"))).alias(
            "key_b64"
        ),
    )


@register(
    "q_null_funcs",
    oracle="""
SELECT o_orderkey,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm,
       CASE WHEN nullif(o_orderpriority, '4-NOT SPECIFIED') IS NOT NULL
            THEN 'prioritized' ELSE 'unspecified' END AS prio_class
FROM orders WHERE o_orderkey < 400
""",
    doc="NULL-handling scalar surface: coalesce / nullif / nvl2-style "
    "classification.",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return orders.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        F.when(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).isNotNull(),
            "prioritized",
        )
        .otherwise("unspecified")
        .alias("prio_class"),
    )


@register(
    "q_bit_ops",
    oracle="""
SELECT l_orderkey,
       (l_orderkey & 255) AS low_byte,
       (l_orderkey | 4096) AS with_flag,
       xor(l_orderkey, l_partkey) AS mixed,
       (l_orderkey << 2) AS shifted
FROM lineitem WHERE l_orderkey < 300
""",
    doc="Bitwise operation surface: and/or/xor/shift on integer keys.",
)
def q_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("mixed"),
        F.shiftleft(F.col("l_orderkey"), 2).alias("shifted"),
    )


@register(
    "q_unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, m.measure, m.value
FROM lineitem,
LATERAL (VALUES ('qty', l_quantity), ('price', l_extendedprice),
                ('disc', l_discount)) AS m(measure, value)
WHERE l_orderkey < 200
""",
    doc="UNPIVOT: wide measure columns → long (measure, value) rows.",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'qty', l_quantity, 'price', l_extendedprice, "
            "'disc', l_discount) AS (measure, value)"
        ),
    )


@register(
    "q_lateral_posexplode",
    oracle="""
SELECT p_partkey, CAST(u.i - 1 AS INT) AS pos, w[u.i] AS word
FROM (
  SELECT p_partkey,
         list_filter(regexp_split_to_array(trim(p_name), '\\s+'), x -> x <> '') AS w
  FROM part WHERE p_partkey < 300
), UNNEST(range(1, len(w) + 1)) AS u(i)
""",
    doc="LATERAL VIEW / posexplode: one row per word with its position.",
)
def q_lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return part.select(
        "p_partkey", F.posexplode(tokens(F.col("p_name"))).alias("pos", "word")
    )


@register(
    "q_regex_backref_replace",
    oracle="""
SELECT p_partkey,
       regexp_replace(p_name, '(\\w+) (\\w+)', '\\2-\\1', 'g') AS swapped
FROM part WHERE p_partkey < 300
""",
    doc="Regex replace with capture-group backreferences (Spark $n vs "
    "RE2 \\n syntax — same semantics, engine-specific spelling).",
)
def q_regex_backref_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return part.select(
        "p_partkey",
        F.regexp_replace(F.col("p_name"), r"(\w+) (\w+)", r"$2-$1").alias("swapped"),
    )


@register(
    "q_string_pad_pos",
    oracle="""
SELECT p_partkey,
       lpad(p_brand, 12, '*') AS padded,
       rpad(CAST(p_partkey AS VARCHAR), 8, '0') AS id_padded,
       reverse(p_name) AS rev,
       strpos(p_name, ' ') AS space_at,
       split_part(p_name, ' ', 1) AS first_word
FROM part WHERE p_partkey < 300
""",
    doc="String kernel: lpad/rpad, reverse, position, split_part.",
)
def q_string_pad_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return part.select(
        "p_partkey",
        F.lpad(F.col("p_brand"), 12, "*").alias("padded"),
        F.rpad(F.col("p_partkey").cast("string"), 8, "0").alias("id_padded"),
        F.reverse(F.col("p_name")).alias("rev"),
        F.instr(F.col("p_name"), " ").alias("space_at"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


@register(
    "t_top_terms",
    oracle="""
WITH tok AS (
  SELECT source, u.tok FROM (
    SELECT source,
           list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
    FROM documents
  ), UNNEST(t) AS u(tok)
), tf AS (
  SELECT source, tok, count(*) AS freq FROM tok GROUP BY 1, 2
), ranked AS (
  SELECT source, tok, freq,
         row_number() OVER (PARTITION BY source ORDER BY freq DESC, tok) AS rn
  FROM tf
)
SELECT source, tok, freq, rn FROM ranked WHERE rn <= 5
""",
    doc="Per-source top-5 terms: tokenize → term frequency → windowed "
    "top-k (the vocabulary/stopword-mining primitive).",
)
def t_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("source").orderBy(F.col("freq").desc(), F.col("tok"))
    return tf.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)

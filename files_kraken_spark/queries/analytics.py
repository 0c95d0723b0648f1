"""Product-analytics shapes over the events stream table: funnels,
retention cohorts, distribution window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.graph import cooccurrence_edges
from ..sources.tables import load_table
from . import register


@register(
    "q_funnel_stages",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT CASE
         WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click
           THEN 'view>click>purchase'
         WHEN t_view IS NOT NULL AND t_click > t_view THEN 'view>click'
         WHEN t_view IS NOT NULL THEN 'view_only'
         ELSE 'no_view' END AS funnel_stage,
       count(*) AS n_users
FROM per_user
GROUP BY 1
""",
    doc="Conversion funnel: first-touch ordering of view→click→purchase "
    "per user (conditional min timestamps, stage bucketing).",
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    t_us = F.expr("ts div 1000")

    def first_of(etype):
        return F.min(F.when(F.col("event_type") == etype, t_us))

    per_user = events.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_buy"),
    )
    stage = (
        F.when(
            F.col("t_view").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_buy") > F.col("t_click")),
            "view>click>purchase",
        )
        .when(
            F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")),
            "view>click",
        )
        .when(F.col("t_view").isNotNull(), "view_only")
        .otherwise("no_view")
    )
    return per_user.groupBy(stage.alias("funnel_stage")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "q_retention_cohort",
    oracle="""
WITH weekly AS (
  SELECT DISTINCT user_id,
         CAST((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
              // CAST(604800000000 AS BIGINT) AS INT) AS week_no
  FROM events
)
SELECT w0.week_no AS cohort_week, wn.week_no AS active_week,
       count(*) AS n_users
FROM (SELECT user_id, min(week_no) AS week_no FROM weekly GROUP BY user_id) w0
JOIN weekly wn ON wn.user_id = w0.user_id AND wn.week_no >= w0.week_no
GROUP BY 1, 2
""",
    doc="Retention cohorts: first-active week per user × weeks active "
    "since (the classic triangle retention matrix).",
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    epoch_2024_us = 1_704_067_200 * 1_000_000  # 2024-01-01T00:00:00Z
    week = (
        (F.expr("ts div 1000") - F.lit(epoch_2024_us)) / F.lit(7 * 86400 * 1_000_000)
    ).cast("int")
    weekly = events.select("user_id", week.alias("week_no")).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week_no").alias("cohort_week"))
    return (
        weekly.join(cohort, "user_id")
        .filter(F.col("week_no") >= F.col("cohort_week"))
        .groupBy(F.col("cohort_week"), F.col("week_no").alias("active_week"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q_bool_aggregates",
    oracle="""
SELECT o_custkey,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       count(*) AS n
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 5
""",
    doc="Boolean aggregates: every/any over group predicates.",
)
def q_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 5)
    )


@register(
    "q_min_max_by",
    oracle="""
SELECT o_custkey,
       max_by(o_orderstatus, o_orderkey) AS latest_status,
       min_by(o_orderpriority, o_orderkey) AS first_priority
FROM orders
GROUP BY o_custkey
""",
    doc="Argmax aggregates: value at the max/min of another column "
    "(unique ordering key → deterministic).",
)
def q_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.max_by(F.col("o_orderstatus"), F.col("o_orderkey")).alias("latest_status"),
        F.min_by(F.col("o_orderpriority"), F.col("o_orderkey")).alias("first_priority"),
    )


@register(
    "t_length_histogram",
    oracle="""
SELECT (n_chars // 50) * 50 AS bin_lo, lang, count(*) AS n_docs
FROM documents
GROUP BY 1, 2
""",
    doc="Histogram binning: fixed-width buckets over document lengths "
    "per language (the corpus profiling primitive).",
)
def t_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bin_lo = (F.floor(F.col("n_chars") / 50) * 50).cast("long")
    return docs.groupBy(bin_lo.alias("bin_lo"), F.col("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "t_char_trigrams",
    oracle="""
WITH grams AS (
  SELECT lang, substr(lower(text), u.i, 3) AS g
  FROM documents, UNNEST(range(1, length(text) - 1)) AS u(i)
)
SELECT lang, g, count(*) AS freq
FROM grams
GROUP BY lang, g
HAVING count(*) >= 200
""",
    doc="Character-trigram frequencies per language — the raw signal a "
    "real n-gram language-ID model trains on (substring grid explode).",
)
def t_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    idx = F.when(
        F.length("text") >= 3, F.sequence(F.lit(1), F.length("text") - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = docs.select(
        "lang",
        F.explode(idx).alias("i"),
        lowered.alias("__t"),
    ).select("lang", F.substring(F.col("__t"), F.col("i"), F.lit(3)).alias("g"))
    return (
        grams.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 200)
    )


@register(
    "q_distribution_windows",
    oracle="""
SELECT c_custkey,
       round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pr,
       round(cume_dist() OVER (ORDER BY c_acctbal, c_custkey), 6) AS cd
FROM customer
WHERE c_nationkey < 5
""",
    doc="Distribution window functions: percent_rank and cume_dist with "
    "deterministic tiebreak. The (c_acctbal, c_custkey) order key is "
    "total (unique tiebreaker), so rank == row_number and cume_dist "
    "groups are singletons: pr = (p-1)/(n-1), cd = p/n over the "
    "distributed two-phase global position — no unpartitioned window.",
)
def q_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_row_number

    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    pos = global_row_number(
        customer.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        "__p",
    )
    n = pos.agg(F.count(F.lit(1)).alias("__n"))
    # percent_rank of a single-row frame is DEFINED as 0.0; the
    # (p-1)/(n-1) form would give 0/0 -> NaN at n==1 (round-5 advice)
    pr = F.when(
        F.col("__n") > 1, (F.col("__p") - 1) / (F.col("__n") - 1)
    ).otherwise(F.lit(0.0))
    return pos.crossJoin(F.broadcast(n)).select(
        "c_custkey",
        F.round(pr, 6).alias("pr"),
        F.round(F.col("__p") / F.col("__n"), 6).alias("cd"),
    )


def _pagerank_oracle_sql(iters: int = 3, damping: int = 85) -> str:
    """Unrolled integer PageRank over the symmetrized supplier–customer
    supply graph — mirrors ``operators.graph.pagerank`` exactly (BIGINT
    micro-unit ranks, DIV truncation, so aggregation order is
    irrelevant and the replay is bit-exact)."""
    base = (100 - damping) * 1_000_000 // 100
    rounds = []
    for n in range(iters):
        rounds.append(
            f"""r{n + 1} AS (
  SELECT n.node,
         CAST({base} + ({damping} * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr // d.deg) AS s
    FROM edges e JOIN deg d ON d.src = e.src JOIN r{n} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    return (
        """WITH pairs AS (
  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT sk AS src, 10000000 + ck AS dst FROM pairs
  UNION ALL
  SELECT 10000000 + ck AS src, sk AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
"""
        + ",\n".join(rounds)
        + f"\nSELECT node, pr FROM r{iters}"
    )


@register(
    "q_pagerank_supply",
    oracle=_pagerank_oracle_sql(3, 85),
    doc="Integer PageRank (3 rounds, d=0.85) over the symmetrized "
    "supplier–customer supply graph: ranks are BIGINT micro-units and "
    "every step is truncating integer math, so the result is bit-exact "
    "under any aggregation order / partitioning — the float version "
    "would drift across engines. Pregel-on-DataFrames shape: per round "
    "one rank-to-edges join on src + one contribution shuffle on dst.",
)
def q_pagerank_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("l_suppkey").alias("sk"), F.col("o_custkey").alias("ck"))
        .distinct()
    )
    edges = pairs.select(
        F.col("sk").alias("src"), (F.lit(10_000_000) + F.col("ck")).alias("dst")
    )
    return pagerank(edges, iters=3, damping_pct=85, symmetrize=True)


# ----------------------------------------------------- time-series repair

_SPARSE = "user_id % 50 = 0"  # sparsify so hour buckets have real gaps


@register(
    "q_gap_fill_ffill",
    oracle=f"""
WITH hours AS (
  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE {_SPARSE} GROUP BY 1, 2
),
bounds AS (SELECT event_type, min(h) AS mn, max(h) AS mx FROM hours GROUP BY 1),
spine AS (SELECT event_type, unnest(generate_series(mn, mx)) AS h FROM bounds),
joined AS (
  SELECT s.event_type, s.h, hr.n
  FROM spine s LEFT JOIN hours hr USING (event_type, h)
)
SELECT event_type, h, (n IS NOT NULL) AS observed,
       CAST(last_value(n IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_filled
FROM joined
""",
    doc="Time-series gap filling with forward-fill: per event type, build "
    "the complete hourly spine between the series' first and last "
    "observation (sequence explode per key — never a global calendar "
    "cross join), left-join the observed counts, and carry the last "
    "known value across gaps with an ignore-nulls window. Every stage "
    "is partitioned by the series key, so a 100 TB corpus with "
    "millions of keys runs with no single-task stage.",
)
def q_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.expr(_SPARSE))
    hours = ev.groupBy(
        F.col("event_type"), F.expr("ts div 3600000000000").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = hours.groupBy("event_type").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("mn", "mx")).alias("h")
    )
    joined = spine.join(hours, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "h",
        F.col("n").isNotNull().alias("observed"),
        F.last("n", ignorenulls=True).over(w).cast("long").alias("n_filled"),
    )


@register(
    "q_linear_interpolate",
    oracle=f"""
WITH hours AS (
  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE {_SPARSE} GROUP BY 1, 2
),
bounds AS (SELECT event_type, min(h) AS mn, max(h) AS mx FROM hours GROUP BY 1),
spine AS (SELECT event_type, unnest(generate_series(mn, mx)) AS h FROM bounds),
joined AS (
  SELECT s.event_type, s.h, hr.n
  FROM spine s LEFT JOIN hours hr USING (event_type, h)
),
ctx AS (
  SELECT event_type, h, n,
         last_value(n IGNORE NULLS) OVER wp AS prev_n,
         last_value(CASE WHEN n IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS prev_h,
         first_value(n IGNORE NULLS) OVER wf AS next_n,
         first_value(CASE WHEN n IS NOT NULL THEN h END IGNORE NULLS) OVER wf AS next_h
  FROM joined
  WINDOW wp AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, h,
       CASE
         WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
         WHEN next_n IS NULL THEN CAST(prev_n AS DOUBLE)
         WHEN prev_n IS NULL THEN CAST(next_n AS DOUBLE)
         ELSE CAST(prev_n AS DOUBLE)
              + (CAST(next_n AS DOUBLE) - CAST(prev_n AS DOUBLE))
                * (CAST(h - prev_h AS DOUBLE) / CAST(next_h - prev_h AS DOUBLE))
       END AS n_interp
FROM ctx
""",
    doc="Linear interpolation of missing time-series points: on the same "
    "per-key hourly spine as q_gap_fill_ffill, each gap hour gets "
    "prev + (next-prev)*(t-t_prev)/(t_next-t_prev) from the nearest "
    "observations on either side (ignore-nulls forward and backward "
    "windows); leading/trailing gaps clamp to the nearest observation. "
    "Identical double expression on both engines — bit-reproducible. "
    "All windows partitioned by the series key.",
)
def q_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.expr(_SPARSE))
    hours = ev.groupBy(
        F.col("event_type"), F.expr("ts div 3600000000000").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = hours.groupBy("event_type").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("mn", "mx")).alias("h")
    )
    joined = spine.join(hours, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("n").isNotNull(), F.col("h"))
    ctx = joined.select(
        "event_type",
        "h",
        "n",
        F.last("n", ignorenulls=True).over(wp).alias("prev_n"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("prev_h"),
        F.first("n", ignorenulls=True).over(wf).alias("next_n"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("next_h"),
    )
    frac = (F.col("h") - F.col("prev_h")).cast("double") / (
        F.col("next_h") - F.col("prev_h")
    ).cast("double")
    interp = (
        F.when(F.col("n").isNotNull(), F.col("n").cast("double"))
        .when(F.col("next_n").isNull(), F.col("prev_n").cast("double"))
        .when(F.col("prev_n").isNull(), F.col("next_n").cast("double"))
        .otherwise(
            F.col("prev_n").cast("double")
            + (F.col("next_n").cast("double") - F.col("prev_n").cast("double"))
            * frac
        )
    )
    return ctx.select("event_type", "h", interp.alias("n_interp"))


@register(
    "q_rolling_zscore",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ctx AS (
  SELECT event_type, h, n,
         sum(n)     OVER w AS s1,
         sum(n * n) OVER w AS s2,
         count(*)   OVER w AS m
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, h, n,
       round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
             / sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                    / CAST(m - 1 AS DOUBLE)), 6) AS z
FROM ctx
WHERE m >= 12
  AND (CAST(s2 AS DOUBLE)
       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)) > 0
""",
    doc="Rolling z-score anomaly signal: each hour's event count scored "
    "against the mean/std of the PRECEDING 24 hours (frame excludes "
    "the current row so an anomaly can't mask itself). Variance is "
    "computed from windowed integer sums via the explicit "
    "(s2 - s1^2/m)/(m-1) formula — bit-identical on both engines, "
    "unlike builtin stddev whose streaming accumulation order "
    "differs. Window partitioned per series key; warm-up (<12 rows) "
    "and zero-variance frames excluded.",
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"), F.expr("ts div 3600000000000").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    ctx = hourly.select(
        "event_type",
        "h",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    s1d, s2d, md = (
        F.col("s1").cast("double"),
        F.col("s2").cast("double"),
        F.col("m").cast("double"),
    )
    var_num = s2d - s1d * s1d / md
    z = (F.col("n").cast("double") - s1d / md) / F.sqrt(
        var_num / (F.col("m") - 1).cast("double")
    )
    return (
        ctx.filter((F.col("m") >= 12) & (var_num > 0))
        .select("event_type", "h", "n", F.round(z, 6).alias("z"))
    )


@register(
    "q_ewma_halflife",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ctx AS (
  SELECT event_type, h, n,
         list(CAST(n AS DOUBLE)) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
  FROM hourly
)
SELECT event_type, h, n,
       round(
         list_sum(list_transform(range(1, len(xs) + 1),
                  i -> list_reverse(xs)[i] * pow(0.5, i - 1)))
         / list_sum(list_transform(range(1, len(xs) + 1),
                  i -> pow(0.5, i - 1))), 6) AS ewma
FROM ctx
""",
    doc="Exponentially weighted moving average over each series' last 20 "
    "hours (newest-first half-life weights, normalized). EWMA's "
    "recursive form is non-associative — no builtin window aggregate "
    "computes it — so the frame is collected into an array (bounded: "
    "20 doubles/row) and folded with higher-order functions, the "
    "engine's escape hatch for non-associative window math. Decay "
    "0.5 is chosen deliberately: powers of two are EXACT doubles, so "
    "the weighted sums are bit-identical across engines where an "
    "arbitrary libm pow() would drift in the last ulp. Windows "
    "partitioned per key.",
)
def q_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"), F.expr("ts div 3600000000000").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-19, 0)
    )
    ctx = hourly.select(
        "event_type", "h", "n",
        F.collect_list(F.col("n").cast("double")).over(w).alias("xs"),
    )
    rev = F.reverse(F.col("xs"))
    idx = F.sequence(F.lit(0), F.size("xs") - 1)
    wts = F.transform(idx, lambda i: F.pow(F.lit(0.5), i.cast("double")))
    num = F.aggregate(
        F.zip_with(rev, wts, lambda x, wt: x * wt),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(wts, F.lit(0.0), lambda acc, x: acc + x)
    return ctx.select(
        "event_type", "h", "n", F.round(num / den, 6).alias("ewma")
    )


_CONV_WINDOW_US = 24 * 3600 * 1_000_000  # 24h per funnel step


@register(
    "q_funnel_conversion_window",
    oracle=f"""
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > v.t_view
    AND epoch_us(e.ts) <= v.t_view + {_CONV_WINDOW_US}
  GROUP BY e.user_id
),
b AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > c.t_click
    AND epoch_us(e.ts) <= c.t_click + {_CONV_WINDOW_US}
  GROUP BY e.user_id
)
SELECT CAST(count(v.user_id) AS BIGINT) AS n_view,
       CAST(count(c.user_id) AS BIGINT) AS n_click_24h,
       CAST(count(b.user_id) AS BIGINT) AS n_buy_24h
FROM v LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN b ON b.user_id = v.user_id
""",
    doc="Funnel with per-step conversion windows (the MATCH_RECOGNIZE-"
    "shaped ask Spark lacks natively): first view, then first click "
    "within 24h OF THAT VIEW, then first purchase within 24h OF THAT "
    "CLICK — each stage anchored to the previous stage's timestamp, "
    "not merely ordered (q_funnel_stages' first-touch form). Three "
    "grouped aggregations chained by user-keyed joins; every shuffle "
    "is on user_id, so the 100 TB form co-partitions once and reuses "
    "the exchange.",
)
def q_funnel_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("t")
    )
    W = _CONV_WINDOW_US
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("t") > F.col("t_view")) & (F.col("t") <= F.col("t_view") + W))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("t") > F.col("t_click")) & (F.col("t") <= F.col("t_click") + W))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_buy"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(b, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_click_24h"),
            F.count("t_buy").alias("n_buy_24h"),
        )
    )


@register(
    "q_scd2_intervals",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id
  FROM events
),
marked AS (
  SELECT user_id, event_type, t, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
runs AS (
  SELECT user_id, event_type, t,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_no
  FROM marked
),
iv AS (
  SELECT user_id, event_type AS status, run_no,
         min(t) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, event_type, run_no
)
SELECT user_id, status, valid_from,
       coalesce(lead(valid_from) OVER (PARTITION BY user_id
                ORDER BY valid_from) - 1, 253402300799999999) AS valid_to,
       n_events
FROM iv
""",
    doc="SCD2 history build: compress each user's event stream into "
    "status validity intervals — a new row only where the status "
    "CHANGES (lag + running change-count makes the run id, the "
    "gaps-and-islands pattern), valid_to = next interval's start - 1 "
    "with the open interval capped at a far-future sentinel. The "
    "slowly-changing-dimension type-2 build every warehouse needs, "
    "as per-key windows only — no global stage.",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    runs = ev.select(
        "user_id", "event_type", "t", chg.alias("chg"), "event_id"
    ).withColumn(
        "run_no",
        F.sum("chg")
        .over(
            Window.partitionBy("user_id")
            .orderBy("t", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    iv = runs.groupBy(
        "user_id", F.col("event_type").alias("status"), "run_no"
    ).agg(F.min("t").alias("valid_from"), F.count(F.lit(1)).alias("n_events"))
    wl = Window.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.coalesce(
        F.lead("valid_from").over(wl) - 1, F.lit(253402300799999999)
    )
    return iv.select(
        "user_id", "status", "valid_from", valid_to.alias("valid_to"), "n_events"
    )


@register(
    "q_range_join_binned",
    oracle="""
SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_ship
FROM (SELECT o_orderkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d0
      FROM orders WHERE o_orderpriority = '1-URGENT') o
JOIN (SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS pd
      FROM lineitem) l
  ON l.pd BETWEEN o.d0 AND o.d0 + 7
GROUP BY 1
""",
    doc="Interval-overlap (range) join, the binned form: count global "
    "shipments inside each urgent order's 7-day window. A range "
    "predicate is not an equi-join key, so the naive plan is "
    "O(intervals x points); binning by a width >= interval length "
    "turns it into ONE equi-join on the bin id (each interval lands "
    "in at most 2 bins via a bounded sequence-explode, each point in "
    "exactly 1) plus an exact residual filter — shuffle is keyed and "
    "linear in rows, the standard scale answer to range joins "
    "(Databricks' range-join bin hints implement the same idea). "
    "Because the aggregate is additive, the dense point side first "
    "pre-aggregates to per-day weights (map-side combine), so the bin "
    "join moves O(distinct days), not O(lineitems) — the pair "
    "explosion (every point x every interval sharing its bin, ~60M "
    "rows here, measured 5.2s -> 0.9s) never materializes; counting "
    "pairs and summing day-weights are the same number.",
)
def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.lit("1970-01-01").cast("date")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.datediff(F.to_date("o_orderdate"), epoch).alias("d0"),
        )
        .withColumn("d1", F.col("d0") + F.lit(7))
    )
    pts = (
        li.select(F.datediff(F.to_date("l_shipdate"), epoch).alias("pd"))
        .groupBy("pd")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bin_w = 8  # >= interval length + 1 => every interval spans <= 2 bins
    ivb = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.col("d0") - (F.col("d0") % bin_w),
                F.col("d1") - (F.col("d1") % bin_w),
                F.lit(bin_w),
            )
        ),
    )
    ptb = pts.withColumn("bin", F.col("pd") - F.col("pd") % bin_w)
    return (
        ivb.join(ptb, "bin")
        .filter((F.col("pd") >= F.col("d0")) & (F.col("pd") <= F.col("d1")))
        .groupBy("o_orderkey")
        .agg(F.sum("c").cast("long").alias("n_ship"))
    )


@register(
    "q_group_regression",
    oracle="""
WITH m AS (
  SELECT n.n_name,
         date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS x,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), mom AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx,
         sum(y * y) AS syy
  FROM m GROUP BY 1
)
SELECT n_name, n,
  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
  round((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE), 6) AS intercept,
  round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
        / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
FROM mom
""",
    doc="Group-wise OLS (per-nation revenue-vs-time trend): one "
    "partial-aggregatable pass collects the five moments "
    "(n, Sx, Sy, Sxy, Sxx, Syy) — y cast to DECIMAL so every sum is "
    "EXACT and bit-portable across engines — then slope / intercept / "
    "r² derive from the moments in identical double-arithmetic shape "
    "on both sides. The distributed-regression pattern: never iterate, "
    "never collect; moments are a map-side-combinable agg, so the "
    "shuffle is one row per group regardless of corpus size.",
)
def q_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.lit("1970-01-01").cast("date")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.datediff(F.to_date("o_orderdate"), epoch)
            .cast("long")
            .alias("x"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        )
    )
    mom = m.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    den = d("n") * d("sxx") - d("sx") * d("sx")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    slope = num / den
    return mom.select(
        "n_name",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((d("sy") - slope * d("sx")) / d("n"), 6).alias("intercept"),
        F.round(
            (num * num) / (den * (d("n") * d("syy") - d("sy") * d("sy"))), 6
        ).alias("r2"),
    )


@register(
    "q_mad_anomaly",
    oracle="""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, e.value, abs(e.value - m.med) AS dev, m.med
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(dev) AS mad FROM dev GROUP BY 1
)
SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN d.dev > 3.0 * 1.4826 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       round(any_value(d.med), 6) AS median_value, round(any_value(a.mad), 6) AS mad
FROM dev d JOIN mad a USING (event_type)
GROUP BY 1
""",
    doc="Robust anomaly detection per event type: median + MAD (median "
    "absolute deviation), flagging |v - med| > 3·1.4826·MAD — the "
    "scaled-MAD z-score, immune to the outliers it hunts (mean/stddev "
    "would be dragged by them). Exact interpolated medians on both "
    "engines; the per-group stats are tiny one-row-per-type frames "
    "broadcast back against the stream, so the only full-data shuffles "
    "are the two keyed groupBys. Scale knob: exact percentile() buffers "
    "each group's values — kept for bit-exact oracle replay; at 100 TB "
    "swap both medians for approx_percentile(col, 0.5, 10000) — a "
    "one-pass fixed-memory sketch, identical plan shape (see "
    "SCALING.md, 'Exact vs approximate percentiles').",
)
def q_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    flag = dev.join(F.broadcast(mad), "event_type").withColumn(
        "is_anom", F.col("dev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad")
    )
    return (
        flag.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_anom").cast("long")).alias("n_anomalies"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad"),
        )
    )


@register(
    "q_sequential_pattern",
    oracle="""
WITH tr AS (
  SELECT user_id, event_type AS evt_a,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS evt_b
  FROM events
)
SELECT evt_a, evt_b, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM tr WHERE evt_b IS NOT NULL
GROUP BY 1, 2
""",
    doc="Sequential pattern mining, order-2: consecutive event-type "
    "transitions per user (lead over the per-user time order, "
    "event_id tiebreak) rolled up to global occurrence and distinct-"
    "user support — the Markov-transition / next-action matrix. The "
    "window is partitioned by user, so state never crosses executors; "
    "the rollup is a keyed agg on the 25 transition pairs.",
)
def q_sequential_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
    )
    return tr.groupBy(
        F.col("event_type").alias("evt_a"), F.col("nxt").alias("evt_b")
    ).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "q_decay_topk",
    oracle="""
WITH days AS (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS d FROM events
),
anchor AS (SELECT max(d) AS d_max FROM days),
weighted AS (
  SELECT event_type,
         CASE WHEN a.d_max - d <= 40
              THEN (CAST(1 AS BIGINT) << CAST(40 - (a.d_max - d) AS INTEGER))
              ELSE 0 END AS w_fp
  FROM days CROSS JOIN anchor a
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_raw,
       round(CAST(sum(w_fp) AS DOUBLE) / 1099511627776.0, 6) AS decayed_count
FROM weighted
GROUP BY 1
ORDER BY decayed_count DESC, event_type
LIMIT 5
""",
    doc="Time-decayed popularity:每 event gets weight 2^(−age_days) — a "
    "one-day half-life — and types rank by decayed count, the standard "
    "trending-items measure that forgets stale volume. Weights are "
    "FIXED-POINT POWERS OF TWO (1 << (40 − age), int64): the decayed "
    "sum is an exact integer reduction, so float summation order can "
    "never change a rank; ages > 40 days underflow to exactly 0 on "
    "both engines (2^-40 ≈ 1e-12 of a fresh event — sub-rounding "
    "noise). Plan: one keyed agg + a 1-row max-day broadcast; top-k "
    "is TakeOrderedAndProject, never a global sort.",
)
def q_decay_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "event_type", F.expr("ts div 86400000000000").alias("d")
    )
    anchor = days.agg(F.max("d").alias("d_max"))
    weighted = days.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.when(
            F.col("d_max") - F.col("d") <= 40,
            # SQL shiftleft accepts a column shift amount (the Python
            # F.shiftleft wrapper takes only a literal int)
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(40 - (d_max - d) AS INT))"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("w_fp"),
    )
    agg = weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.round(F.sum("w_fp").cast("double") / F.lit(float(1 << 40)), 6).alias(
            "decayed_count"
        ),
    )
    return agg.orderBy(F.col("decayed_count").desc(), "event_type").limit(5)


@register(
    "q_skyline_orders",
    oracle="""
WITH pts AS (
  SELECT o_totalprice AS price, min(epoch_us(o_orderdate)) AS d
  FROM orders GROUP BY 1
),
run AS (
  SELECT price, d,
         min(d) OVER (ORDER BY price
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM pts
)
SELECT round(price, 2) AS price, CAST(d AS BIGINT) AS first_epoch_us
FROM run WHERE pm IS NULL OR pm > d
""",
    doc="2-D skyline (Pareto frontier): orders minimizing BOTH total "
    "price and order date — no other point is cheaper-or-equal AND "
    "earlier-or-equal with one strict. Sort-based algorithm: collapse "
    "to per-price earliest date (one keyed agg), then a point survives "
    "iff the EXCLUSIVE running minimum of date over all strictly "
    "cheaper points is later than its own date. The running min is "
    "operators/ranks.global_prefix_min — range exchange + partitioned "
    "prefix window + O(partitions) driver combine — so the oracle's "
    "unpartitioned window never appears in the Spark plan: the same "
    "result with every stage partitioned (the scale difference at "
    "100 TB is a single-task sort vs an ordinary range shuffle).",
)
def q_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_min

    orders = load_table(spark, sf_dir, "orders")
    pts = (
        orders.select(
            F.col("o_totalprice").alias("price"),
            # o_orderdate reads as TIMESTAMP_NTZ; the session pins UTC,
            # so the cast treats the naive value as UTC — matching
            # DuckDB's epoch_us over the same naive column
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("dd"),
        )
        .groupBy("price")
        .agg(F.min("dd").alias("d"))
    )
    run = global_prefix_min(pts, [F.col("price")], "d", out_col="pm")
    return run.filter(F.col("pm").isNull() | (F.col("pm") > F.col("d"))).select(
        F.round("price", 2).alias("price"),
        F.col("d").cast("long").alias("first_epoch_us"),
    )


def _kcore_oracle_sql(k: int = 3, rounds: int = 8, where: str = "") -> str:
    """Unrolled k-core peeling replay: each round recomputes degrees on
    the surviving subgraph and drops nodes below k — the same
    fixed-round contract as the PageRank / power-iteration oracles
    (both engines run EXACTLY ``rounds`` rounds; the graph here
    converges in far fewer). ``where`` filters the order universe
    (round-12: the k-core changefeed oracle is the same peeling from
    scratch over the post-change graph)."""
    # AS MATERIALIZED: each round references its predecessor three
    # times (two degree legs + the edge filter); DuckDB's default CTE
    # inlining would blow the plan up 3^rounds-fold (observed as a
    # too-many-open-files parquet-scan storm)
    s = f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  {where}
)"""
    prev = "e0"
    for r in range(1, rounds + 1):
        s += f""",
s{r} AS (SELECT u AS n FROM {prev} UNION ALL SELECT v FROM {prev}),
d{r} AS (SELECT n, count(*) AS deg FROM s{r} GROUP BY 1),
k{r} AS (SELECT n FROM d{r} WHERE deg >= {k}),
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  JOIN k{r} a ON e.u = a.n JOIN k{r} b ON e.v = b.n
)"""
        prev = f"e{r}"
    s += f""",
sf AS (SELECT u AS n FROM {prev} UNION ALL SELECT v FROM {prev}),
df AS (SELECT n, count(*) AS deg FROM sf GROUP BY 1)
SELECT n AS part_id, CAST(deg AS BIGINT) AS core_degree
FROM df WHERE deg >= {k}"""
    return s


@register(
    "q_kcore_parts",
    oracle=_kcore_oracle_sql(3, 8),
    doc="k-core decomposition (k=3) of the parts co-purchase graph "
    "(parts sharing an order are adjacent): iteratively peel nodes "
    "with degree < k until the dense core remains — the standard way "
    "to separate structurally-embedded items from one-off pairings "
    "before community detection. Spark runs the peeling loop with "
    "scratch-parquet pin lineage cuts (each round: one degree groupBy "
    "+ one semi-join edge filter, all keyed shuffles); the oracle "
    "replays the SAME fixed 8 rounds as unrolled CTEs (the PageRank "
    "fixed-round contract — the graph converges in fewer). Round "
    "count is O(peeling depth), not O(diameter); at 100 TB the edge "
    "set shrinks monotonically so later rounds are nearly free.",
)
def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import pin_frame

    K, ROUNDS = 3, 8
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = pin_frame(
        cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=False)
    )
    for _ in range(ROUNDS):
        nodes = edges.select(F.col("u").alias("n")).unionByName(
            edges.select(F.col("v").alias("n"))
        )
        keep = (
            nodes.groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= K)
            .select("n")
        )
        edges = pin_frame(
            edges.join(keep.select(F.col("n").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("n").alias("v")), "v", "left_semi")
            .select("u", "v")
        )
    nodes = edges.select(F.col("u").alias("n")).unionByName(
        edges.select(F.col("v").alias("n"))
    )
    return (
        nodes.groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= K)
        .select(F.col("n").alias("part_id"), F.col("deg").cast("long").alias("core_degree"))
    )


@register(
    "q_gap_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS d FROM events
),
tagged AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days
),
runs AS (
  SELECT user_id, island, count(*) AS run_len
  FROM tagged GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(max(run_len) AS BIGINT) AS longest_streak
FROM runs GROUP BY 1
""",
    doc="Gaps-and-islands: per user, maximal runs of consecutive active "
    "days (day − per-user row_number is constant within a run — the "
    "classic islands identity), reporting streak count and longest "
    "streak. The engagement/retention primitive behind 'N-day streak' "
    "features. All windows are PARTITIONED by user (the natural "
    "parallel unit); integer day buckets from the nanos timestamps.",
)
def q_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("ts div 86400000000000").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    tagged = days.withColumn("island", F.col("d") - F.row_number().over(w))
    runs = tagged.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").cast("long").alias("longest_streak"),
    )


@register(
    "q_mode_per_group",
    oracle="""
WITH cnt AS (
  SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
rk AS (
  SELECT c_mktsegment, o_orderpriority, n,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY n DESC, o_orderpriority) AS rn
  FROM cnt
)
SELECT c_mktsegment, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
FROM rk WHERE rn = 1
""",
    doc="Deterministic mode aggregate: the most frequent order priority "
    "per market segment, ties broken lexicographically (engines' "
    "native mode()/any_value tie behavior is unspecified — the "
    "count-then-rank formulation pins it). Two keyed aggs + a window "
    "PARTITIONED by segment over a tiny (segments × priorities) "
    "frame; the orders-customer join broadcasts the dimension side.",
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cnt = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("long").alias("n"),
        )
    )


@register(
    "q_cdc_compact",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value, epoch_ns(ts) AS tns, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS last_event,
       round(value, 6) AS last_value,
       CAST(tns AS BIGINT) AS last_ts_ns
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
""",
    doc="CDC log compaction: collapse a keyed change stream to the "
    "latest surviving row per key — newest (ts, event_id) wins, "
    "'error' tombstones drop the key. The batch form of what a "
    "MERGE-applying state store does per micro-batch (store.py's "
    "upsert path); run it before bulk-loading a snapshot so the store "
    "applies one row per key instead of the full history. Per-key "
    "window (partitioned — keys are the parallel unit); the "
    "(ts, event_id) composite makes ordering total, so compaction is "
    "deterministic even with same-timestamp changes.",
)
def q_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_event"),
            F.round("value", 6).alias("last_value"),
            F.col("ts").cast("long").alias("last_ts_ns"),
        )
    )


@register(
    "q_last_touch_attribution",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_type, epoch_ns(ts) AS tns, event_id,
         CASE WHEN event_type IN ('view', 'click', 'signup')
              THEN event_type END AS touch
  FROM events WHERE event_type <> 'error'
),
carried AS (
  SELECT user_id, event_type, tns, event_id,
         last_value(touch IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tns, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
  FROM tagged
)
SELECT coalesce(last_touch, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM carried
WHERE event_type = 'purchase'
GROUP BY 1
""",
    doc="Last-touch attribution: each purchase is credited to the most "
    "recent PRECEDING touch event (view/click/signup) of the same "
    "user, 'direct' if none — the standard marketing-attribution "
    "rollup. The carry-forward is last_value(IGNORE NULLS) over an "
    "exclusive preceding frame, PARTITIONED per user (same shape as "
    "the gap-fill family — no global window, no self-join against the "
    "touch history). (ts, event_id) makes the order total.",
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") != "error")
    touch = F.when(
        F.col("event_type").isin("view", "click", "signup"), F.col("event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.select(
        "user_id",
        "event_type",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("last_touch", F.lit("direct")).alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


@register(
    "q_moving_quantile",
    oracle="""
SELECT event_id, event_type,
       round(median(value) OVER (PARTITION BY event_type
                                 ORDER BY epoch_ns(ts), event_id
                                 ROWS BETWEEN 50 PRECEDING AND CURRENT ROW), 6)
         AS rolling_median
FROM events
WHERE event_type IN ('view', 'purchase')
""",
    doc="Rolling median over the last 51 events per type — the "
    "outlier-immune moving baseline (a rolling MEAN chases the spikes "
    "an anomaly monitor wants to catch). Exact interpolated median "
    "over a bounded ROWS frame. Scale shape (round-7 verdict item 3): "
    "a window PARTITIONED only by event_type has key cardinality 2 "
    "here, funnelling the whole stream through two tasks at 100×. "
    "Because the frame is BOUNDED (50 preceding), the window is "
    "mechanically chunkable: assign a global per-type position via the "
    "ranks.global_row_number range exchange, split each type into "
    "CHUNK-row chunks, duplicate each chunk's last 50 rows into the "
    "next chunk as carry context, evaluate the window partitioned by "
    "(type, chunk) — O(n/CHUNK) parallel window groups — and drop the "
    "carry rows. Exact by construction since CHUNK > frame length: "
    "every real row sees precisely its 50 predecessors. Measured "
    "honestly (SCALING.md round 9): the chunking machinery costs ~1s "
    "flat (range-exchange pin + offset broadcast), so the plain "
    "2-partition window is FASTER up to ~5-10M rows per key — the "
    "chunked shape is kept because its parallelism tracks the data "
    "while the plain window's is bounded by key cardinality (2 tasks "
    "forever, hours of serialized percentile work at 100 TB). Same "
    "percentile/median cross-engine equivalence contract as the "
    "t_winsorize family.",
)
def q_moving_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from files_kraken_spark.operators.ranks import global_row_number

    CHUNK, FRAME = 1024, 50
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("event_id", "event_type", "ts", "value")
    )
    rn = global_row_number(
        ev, [F.col("event_type"), F.col("ts"), F.col("event_id")], "__rn"
    )
    # 0-based per-type position: subtract each type's min global rn
    # (a 2-row aggregate, broadcast back)
    base = rn.groupBy("event_type").agg(F.min("__rn").alias("__base"))
    t = rn.join(F.broadcast(base), "event_type").withColumn(
        "__tr", F.col("__rn") - F.col("__base")
    )
    real = t.withColumn("__cid", F.expr(f"__tr div {CHUNK}")).withColumn(
        "__carry", F.lit(False)
    )
    carry = (
        t.filter(F.col("__tr") % CHUNK >= CHUNK - FRAME)
        .withColumn("__cid", F.expr(f"__tr div {CHUNK}") + F.lit(1))
        .withColumn("__carry", F.lit(True))
    )
    w = (
        Window.partitionBy("event_type", "__cid")
        .orderBy("ts", "event_id")
        .rowsBetween(-FRAME, Window.currentRow)
    )
    return (
        real.unionByName(carry)
        .withColumn(
            "rolling_median",
            F.round(F.expr("percentile(value, 0.5)").over(w), 6),
        )
        .filter(~F.col("__carry"))
        .select("event_id", "event_type", "rolling_median")
    )


def _label_prop_oracle_sql(rounds: int = 4) -> str:
    """Unrolled synchronous label propagation: per round every node
    adopts the most frequent label among its neighbors (count desc,
    then MIN label — the tie rule that makes propagation
    deterministic). Same fixed-round + AS MATERIALIZED conventions as
    the k-core oracle."""
    s = """
WITH eraw AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
l0 AS MATERIALIZED (SELECT DISTINCT u AS n, u AS lab FROM eraw)"""
    prev = "l0"
    for r in range(1, rounds + 1):
        s += f""",
c{r} AS (
  SELECT e.u AS n, l.lab, count(*) AS c
  FROM eraw e JOIN {prev} l ON l.n = e.v
  GROUP BY 1, 2
),
p{r} AS (
  SELECT n, lab, row_number() OVER (PARTITION BY n ORDER BY c DESC, lab) AS rn
  FROM c{r}
),
l{r} AS MATERIALIZED (SELECT n, lab FROM p{r} WHERE rn = 1)"""
        prev = f"l{r}"
    s += f"""
SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members
FROM {prev} GROUP BY 1"""
    return s


@register(
    "q_label_prop_communities",
    oracle=_label_prop_oracle_sql(4),
    doc="Community detection by synchronous label propagation over the "
    "parts co-purchase graph: 4 fixed rounds, each node adopting its "
    "neighbors' most frequent label with a (count desc, min label) "
    "tie rule — the determinism fix for LPA's usually-random tie "
    "breaking, which makes the iteration bit-replayable as unrolled "
    "SQL (the PageRank fixed-round contract). Per round: one "
    "edge-label join + one (node, label) count + a second per-node "
    "groupBy taking max(struct(count, -label)) — the same winner the "
    "oracle's row_number rank picks, but partial-aggregable and "
    "sort-free; keyed shuffles only, no window. Scratch-parquet pins "
    "(not localCheckpoint) cut lineage per round: checkpoint blocks "
    "accumulate in executor memory across runs with no unpersist "
    "hook, measured as 2x bimodal wall-time swings at sf0.1. Output "
    "is the community size histogram.",
)
def q_label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import pin_frame

    ROUNDS = 4
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = pin_frame(
        cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=True)
    )
    labels = edges.select(F.col("u").alias("n")).distinct().withColumn(
        "lab", F.col("n")
    )
    for _ in range(ROUNDS):
        cnt = (
            edges.join(labels.withColumnRenamed("n", "v"), "v")
            .groupBy(F.col("u").alias("n"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # (count desc, min label) winner via max(struct(c, -lab)) — a
        # second partial-aggregable groupBy instead of a row_number
        # window, which would re-shuffle AND sort every (n, lab) group
        # per round just to take its first row
        labels = pin_frame(
            cnt.groupBy("n")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lab")).alias("nl"))).alias("m"))
            .select("n", (-F.col("m.nl")).alias("lab"))
        )
    return labels.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


def _bfs_oracle_sql(rounds: int = 3) -> str:
    """Unrolled multi-source BFS: sources at distance 0, each round
    relaxes dist(v) = min(dist(v), min over in-neighbors dist(u)+1).
    Same fixed-round + AS MATERIALIZED conventions as the k-core and
    label-propagation oracles."""
    s = """
WITH eraw AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
d0 AS MATERIALIZED (
  SELECT DISTINCT u AS n, 0 AS d FROM eraw WHERE u % 97 = 0
)"""
    prev = "d0"
    for r in range(1, rounds + 1):
        s += f""",
d{r} AS MATERIALIZED (
  SELECT n, MIN(d) AS d FROM (
    SELECT n, d FROM {prev}
    UNION ALL
    SELECT e.v AS n, p.d + 1 AS d FROM eraw e JOIN {prev} p ON p.n = e.u
  ) GROUP BY 1
)"""
        prev = f"d{r}"
    s += f"""
SELECT CAST(d AS INTEGER) AS hops, CAST(count(*) AS BIGINT) AS n_nodes
FROM {prev} GROUP BY 1"""
    return s


@register(
    "q_bfs_hops",
    oracle=_bfs_oracle_sql(3),
    doc="Multi-source BFS hop distance over the parts co-purchase "
    "graph: ~1% of parts seed at distance 0; 3 fixed relaxation "
    "rounds, each taking dist(v) = min(previous dist, neighbor dist "
    "+ 1) — the frontier primitive under reachability, influence "
    "radius, and link-distance-from-seed-set features; output is the "
    "hop histogram of reached nodes. Frontier-optimized (round-7 "
    "verdict item 6): with unit edges a node's distance is FINAL the "
    "round it is first reached (all distance-k nodes appear exactly "
    "at round k), so each round expands only the nodes NEWLY settled "
    "last round — edge join against the frontier (shrinking), then "
    "an anti-join against the settled set — instead of re-relaxing "
    "every settled node every round. Equivalent by induction to the "
    "full min-relaxation the unrolled SQL oracle replays, at a "
    "fraction of the per-round join traffic once the frontier is "
    "smaller than the reached set. Keyed shuffles only; "
    "scratch-parquet pins cut lineage per round (localCheckpoint "
    "blocks have no unpersist hook and accumulate across runs).",
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import pin_frame

    ROUNDS = 3
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = pin_frame(
        cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=True)
    )
    dist = pin_frame(
        edges.select(F.col("u").alias("n"))
        .distinct()
        .filter(F.col("n") % 97 == 0)
        .withColumn("d", F.lit(0))
    )
    frontier = dist
    for r in range(1, ROUNDS + 1):
        reached = (
            edges.join(frontier.select(F.col("n").alias("u")), "u")
            .select(F.col("v").alias("n"))
            .distinct()
        )
        newly = pin_frame(
            reached.join(dist.select("n"), "n", "left_anti")
            .withColumn("d", F.lit(r))
        )
        dist = dist.unionByName(newly)
        frontier = newly
    return dist.groupBy(F.col("d").cast("int").alias("hops")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


@register(
    "q_watermark_lateness_audit",
    oracle="""
WITH a AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) + CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 60000000 AS arr_us
  FROM events
),
l AS (
  SELECT greatest(coalesce(max(ts_us) OVER (
             ORDER BY arr_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) - ts_us, 0), 0) AS late_us
  FROM a
),
b AS (
  SELECT CASE WHEN late_us = 0 THEN '0_in_order'
              WHEN late_us <= 15000000 THEN '1_le_15s'
              WHEN late_us <= 45000000 THEN '2_le_45s'
              ELSE '3_gt_45s' END AS bucket,
         late_us
  FROM l
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(late_us) AS BIGINT) AS max_late_us
FROM b GROUP BY 1
""",
    doc="Watermark-delay audit for streaming ingestion: per event, how "
    "far its event-time lags the running max event-time already SEEN "
    "in arrival order — exactly the quantity Structured Streaming's "
    "watermark trades against state retention; the smallest bucket "
    "boundary covering ~all events is the `withWatermark` delay to "
    "configure. The synthetic corpus is generated fully in-order, so "
    "arrival is simulated with a deterministic md5-jitter (0-60s per "
    "event, replayable on both engines) — on real ingest, arrival "
    "order is the log offset and the jitter term drops out. The "
    "global running max uses NO unpartitioned window: it is the "
    "distributed global_prefix_min primitive on the negated "
    "event-time (range exchange + per-partition exclusive prefix + "
    "O(partitions) driver combine), then a 4-group agg where map-side "
    "partials do the work. Micro resolution matches DuckDB's "
    "nano-truncating reader.",
)
def q_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as _DD
    from ..operators.ranks import global_prefix_min

    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    a = events.select(
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        (
            F.expr("ts div 1000")
            + _DD.md5_hash64(F.col("event_id").cast("string")) % 60_000_000
        ).alias("arr_us"),
    ).withColumn("neg_ts", -F.col("ts_us"))
    pm = global_prefix_min(
        a, [F.col("arr_us"), F.col("event_id")], "neg_ts", "__pmin"
    )
    late = F.greatest(
        F.coalesce(-F.col("__pmin") - F.col("ts_us"), F.lit(0)), F.lit(0)
    )
    b = pm.select(
        F.when(late == 0, "0_in_order")
        .when(late <= 15_000_000, "1_le_15s")
        .when(late <= 45_000_000, "2_le_45s")
        .otherwise("3_gt_45s")
        .alias("bucket"),
        late.alias("late_us"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("late_us").cast("long").alias("max_late_us"),
    )


@register(
    "q_markov_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
t AS (SELECT cur, nxt, count(*) AS n FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS tot FROM t GROUP BY 1)
SELECT t.cur AS cur_type, t.nxt AS next_type,
       CAST(t.n AS BIGINT) AS n_trans,
       round(CAST(t.n AS DOUBLE) / CAST(tot.tot AS DOUBLE), 6) AS p_trans
FROM t JOIN tot USING (cur)
""",
    doc="First-order Markov transition matrix over user event journeys: "
    "per-user consecutive event pairs (lead over the per-user "
    "PARTITIONED window), MLE transition probabilities P(next|cur) — "
    "the user-journey model under next-action prediction, funnel "
    "drop-off simulation, and anomalous-session scoring. Row "
    "normalization joins the per-cur totals back (a |event types|-row "
    "broadcast) instead of a second window pass. Scale: one keyed "
    "window + two tiny aggs; the pair stream never materializes "
    "beyond the events scan.",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    ts_us = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    s = events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    t = s.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy("cur").agg(F.sum("n").cast("long").alias("tot"))
    return t.join(F.broadcast(tot), "cur").select(
        F.col("cur").alias("cur_type"),
        F.col("nxt").alias("next_type"),
        F.col("n").cast("long").alias("n_trans"),
        F.round(F.col("n").cast("double") / F.col("tot").cast("double"), 6).alias(
            "p_trans"
        ),
    )


@register(
    "q_new_vs_returning",
    oracle="""
WITH f AS (SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY 1),
a AS (SELECT epoch_us(ts) // 86400000000 AS day_id, user_id FROM events GROUP BY 1, 2),
n AS (SELECT first_us // 86400000000 AS day_id, count(*) AS n_new FROM f GROUP BY 1),
act AS (SELECT day_id, count(*) AS n_active FROM a GROUP BY 1)
SELECT act.day_id,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
       CAST(n_active - coalesce(n_new, 0) AS BIGINT) AS n_returning
FROM act LEFT JOIN n USING (day_id)
""",
    doc="Daily active users decomposed into NEW (first-ever event that "
    "day) vs RETURNING — the growth-accounting split behind every "
    "activation dashboard, and the complement of the cohort retention "
    "matrix. Day ids are exact integer division of epoch "
    "microseconds (no calendar/timezone functions — bit-portable and "
    "cheap). Plan: one per-user min agg for first-seen, one "
    "(day, user) dedup agg, two small per-day rollups, one join — "
    "all keyed shuffles with map-side partials; the first-seen table "
    "is |users| rows once, not per-day.",
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    us = F.expr("ts div 1000")
    day = F.expr("(ts div 1000) div 86400000000")
    f = events.groupBy("user_id").agg(F.min(us).alias("first_us"))
    a = events.select(day.alias("day_id"), "user_id").distinct()
    n = f.select(
        F.expr("first_us div 86400000000").alias("day_id")
    ).groupBy("day_id").agg(F.count(F.lit(1)).alias("n_new"))
    act = a.groupBy("day_id").agg(F.count(F.lit(1)).alias("n_active"))
    return act.join(n, "day_id", "left").select(
        "day_id",
        F.col("n_active").cast("long").alias("n_active"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
        (F.col("n_active") - F.coalesce(F.col("n_new"), F.lit(0)))
        .cast("long")
        .alias("n_returning"),
    )


@register(
    "q_gini_revenue",
    oracle="""
WITH rev AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(coalesce(sum(CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT)), 0) AS BIGINT) AS cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY cents, c_custkey) AS rk
  FROM rev
),
g AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(cents) AS BIGINT) AS tot,
         CAST(sum(rk * cents) AS BIGINT) AS wsum
  FROM r GROUP BY 1
)
SELECT n.n_name AS nation, n_cust,
       round((2.0 * CAST(wsum AS DOUBLE) - (CAST(n_cust AS DOUBLE) + 1.0) * CAST(tot AS DOUBLE))
             / (CAST(n_cust AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS gini
FROM g JOIN nation n ON n.n_nationkey = g.c_nationkey
WHERE tot > 0
""",
    doc="Gini coefficient of customer revenue concentration per nation "
    "(zero-order customers included at 0) — the inequality audit "
    "behind key-account risk and whale-dependence dashboards, via the "
    "rank-based identity G = (2*sum(i*x_i) - (n+1)*sum(x)) / "
    "(n*sum(x)) on ascending ranks. Revenue is integerized to CENTS "
    "per order row BEFORE any aggregation, so every sum (including "
    "the rank-weighted one) is an exact int64 reduction — summation "
    "order cannot move the coefficient; int64 headroom: rank * cents "
    "< 2^53 even at 10^7 customers/nation. Plan: one customer-orders "
    "outer-join agg, a per-nation PARTITIONED rank (25 bounded "
    "groups; each partition sorts |customers|/25 — the same "
    "per-group-window shape as the tercile family), one 25-group "
    "agg, broadcast nation-name join.",
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("cents"),
    )
    rev = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("cents"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    r = rev.withColumn("rk", F.row_number().over(w))
    g = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("tot"),
        F.sum(F.col("rk") * F.col("cents")).cast("long").alias("wsum"),
    ).filter(F.col("tot") > 0)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    gini = (
        F.lit(2.0) * F.col("wsum").cast("double")
        - (F.col("n_cust").cast("double") + F.lit(1.0)) * F.col("tot").cast("double")
    ) / (F.col("n_cust").cast("double") * F.col("tot").cast("double"))
    return g.join(
        F.broadcast(nation), g["c_nationkey"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        "n_cust",
        F.round(gini, 6).alias("gini"),
    )


def _holt_oracle_sql(steps: int = 12) -> str:
    """Unrolled Holt linear (double-exponential) recurrence: the last
    `steps` hourly counts per series pivot to columns, then each step's
    level/trend derive from the previous step's in two chained CTEs —
    the same fixed-step determinism contract as the graph oracles,
    applied to a per-series scalar recurrence."""
    xs = ",\n         ".join(
        f"CAST(coalesce(max(CASE WHEN k = {i} THEN cnt END), 0) AS DOUBLE) AS x{i}"
        for i in range(1, steps + 1)
    )
    s = f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
m AS (SELECT max(hr) AS hmax FROM h),
k AS (
  SELECT event_type, CAST(hr - (m.hmax - {steps - 1}) + 1 AS INTEGER) AS k, cnt
  FROM h, m WHERE hr >= m.hmax - {steps - 1}
),
p AS (
  SELECT event_type,
         {xs}
  FROM k GROUP BY 1
),
s1 AS (SELECT *, x1 AS l1, x2 - x1 AS b1 FROM p)"""
    for t in range(2, steps + 1):
        s += f""",
sl{t} AS (
  SELECT *, CAST(0.5 AS DOUBLE) * x{t} + CAST(0.5 AS DOUBLE) * (l{t - 1} + b{t - 1}) AS l{t}
  FROM {"s1" if t == 2 else f"sb{t - 1}"}
),
sb{t} AS (
  SELECT *, CAST(0.3 AS DOUBLE) * (l{t} - l{t - 1}) + CAST(0.7 AS DOUBLE) * b{t - 1} AS b{t}
  FROM sl{t}
)"""
    s += f"""
SELECT event_type, round(l{steps}, 6) AS level,
       round(b{steps}, 6) AS trend,
       round(l{steps} + b{steps}, 6) AS forecast_next
FROM sb{steps}"""
    return s


@register(
    "q_holt_linear",
    oracle=_holt_oracle_sql(12),
    doc="Holt linear (double-exponential) smoothing over the last 12 "
    "hourly counts per event type: level+trend state (alpha=0.5, "
    "gamma=0.3, init l1=x1, b1=x2-x1) and the one-step-ahead forecast "
    "— the trend-aware upgrade of the EWMA family for capacity "
    "planning and anomaly baselines. The recurrence is SEQUENTIAL by "
    "nature, so it runs over a FIXED window pivoted to columns: the "
    "per-series state chain is 12 scalar column steps (identical "
    "double shape on both engines — the graph oracles' fixed-round "
    "contract applied to a recurrence), NOT a driver loop and NOT a "
    "UDF fold whose float order an engine could re-associate. Plan: "
    "one (type, hour) agg, a 1-row max-hour broadcast, a 12-wide "
    "pivot agg, then pure per-row column math — at 100 TB the hourly "
    "agg dominates and everything downstream is |series| rows.",
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    STEPS = 12
    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    h = events.groupBy(
        "event_type", F.expr("(ts div 1000) div 3600000000").alias("hr")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    m = h.agg(F.max("hr").alias("hmax"))
    k = (
        h.crossJoin(F.broadcast(m))
        .filter(F.col("hr") >= F.col("hmax") - (STEPS - 1))
        .select(
            "event_type",
            (F.col("hr") - (F.col("hmax") - (STEPS - 1)) + 1).cast("int").alias("k"),
            "cnt",
        )
    )
    p = k.groupBy("event_type").agg(
        *[
            F.coalesce(F.max(F.when(F.col("k") == i, F.col("cnt"))), F.lit(0))
            .cast("double")
            .alias(f"x{i}")
            for i in range(1, STEPS + 1)
        ]
    )
    df = p.withColumn("l1", F.col("x1")).withColumn("b1", F.col("x2") - F.col("x1"))
    for t in range(2, STEPS + 1):
        df = df.withColumn(
            f"l{t}",
            F.lit(0.5) * F.col(f"x{t}")
            + F.lit(0.5) * (F.col(f"l{t - 1}") + F.col(f"b{t - 1}")),
        ).withColumn(
            f"b{t}",
            F.lit(0.3) * (F.col(f"l{t}") - F.col(f"l{t - 1}"))
            + F.lit(0.7) * F.col(f"b{t - 1}"),
        )
    return df.select(
        "event_type",
        F.round(F.col(f"l{STEPS}"), 6).alias("level"),
        F.round(F.col(f"b{STEPS}"), 6).alias("trend"),
        F.round(F.col(f"l{STEPS}") + F.col(f"b{STEPS}"), 6).alias("forecast_next"),
    )


@register(
    "q_table_checksum",
    oracle="""
WITH h AS (
  SELECT o_orderstatus,
         CAST(('0x' || substr(md5(
           CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
           o_orderstatus || '|' ||
           CAST(CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS VARCHAR) || '|' ||
           strftime(o_orderdate, '%Y-%m-%d')
         ), 1, 8)) AS BIGINT) AS hv
  FROM orders
)
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(hv) AS BIGINT) AS xor_sig
FROM h GROUP BY 1
""",
    doc="Order-insensitive cross-engine table checksum: each row "
    "renders to a canonical string (ints as decimal, money as exact "
    "cents, dates as ISO — never raw float repr, which differs per "
    "engine), hashes through the portable md5-prefix hash, and "
    "per-group signatures combine with BIT_XOR — commutative, "
    "overflow-free, and partition-order-independent, unlike a SUM "
    "which wraps int64 around 10^12 rows. THE validation primitive "
    "for a 100 TB migration or replica check: compare (n_rows, "
    "xor_sig) per status on both sides and any single-row divergence "
    "flips the signature. One scan + one tiny agg; map-side partials "
    "carry the xor.",
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_hash64

    orders = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    return (
        orders.select("o_orderstatus", md5_hash64(canon).alias("hv"))
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("hv").cast("long").alias("xor_sig"),
        )
    )


@register(
    "q_partition_planner",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
       round(quantile_cont(n_chars, 0.99), 6) AS p99_chars,
       CAST((sum(n_chars) + 16777215) // 16777216 AS BIGINT) AS parts_16mb,
       CAST(count(*) // ((sum(n_chars) + 16777215) // 16777216) AS BIGINT) AS docs_per_part
FROM documents
""",
    doc="Shuffle-partition sizing calculator: corpus volume, median and "
    "p99 document size, the partition count a 16 MiB-per-partition "
    "budget implies (exact integer ceiling division — no float "
    "boundary drift), and expected docs per partition — the numbers "
    "that set spark.sql.shuffle.partitions and files.maxPartitionBytes "
    "before launching a 100 TB job, computed BY the engine instead of "
    "guessed. The p99/p50 ratio is the skew early-warning: a p99 "
    "1000x the median means size-based repartitioning before any "
    "wide doc-level join. Exact percentiles here (one tiny agg at "
    "audit time); swap approx_percentile at extreme scale per the "
    "SCALING.md percentile note.",
)
def q_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    parts = F.expr("(sum(n_chars) + 16777215) div 16777216")
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99_chars"),
        parts.cast("long").alias("parts_16mb"),
        F.expr("count(*) div ((sum(n_chars) + 16777215) div 16777216)")
        .cast("long")
        .alias("docs_per_part"),
    )


@register(
    "q_degree_assortativity",
    oracle="""
WITH eraw AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT u AS n, CAST(count(*) AS BIGINT) AS d FROM eraw GROUP BY 1),
ed AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM eraw e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         CAST(sum(dx * dy) AS BIGINT) AS sxy,
         CAST(sum(dx * dx) AS BIGINT) AS sxx,
         CAST(sum(dy * dy) AS BIGINT) AS syy
  FROM ed
)
SELECT m AS n_edges,
       round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS assortativity
FROM mom
""",
    doc="Degree assortativity of the parts co-purchase graph: Pearson "
    "correlation of endpoint degrees over the (symmetric) edge list — "
    "positive means hubs buy with hubs (rich-club), negative means "
    "hub-and-spoke; the one-number structure summary that decides "
    "whether degree-based partitioning or hub-salting is needed "
    "before heavier graph work. Moments are EXACT int64 sums over "
    "edges (the q_group_regression fixed-point contract — no float "
    "accumulation), correlation derives in identical double shape. "
    "Int64 headroom: deg^2 * edges < 2^63 up to ~1e6-degree hubs on "
    "1e9 edges; past that promote the moment sums to DECIMAL(38,0), "
    "same plan. Plan: one degree agg + two keyed joins back + one "
    "1-row moment agg — the degree table broadcasts while it fits.",
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=True)
    deg = edges.groupBy(F.col("u").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ed = (
        edges.join(deg.select(F.col("n").alias("u"), F.col("d").alias("dx")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dy")), "v")
        .select("dx", "dy")
    )
    mom = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    md, sxd, syd, sxyd, sxxd, syyd = [
        F.col(c).cast("double") for c in ["m", "sx", "sy", "sxy", "sxx", "syy"]
    ]
    return mom.select(
        F.col("m").alias("n_edges"),
        F.round(
            (md * sxyd - sxd * syd)
            / (F.sqrt(md * sxxd - sxd * sxd) * F.sqrt(md * syyd - syd * syd)),
            6,
        ).alias("assortativity"),
    )


@register(
    "q_benford_first_digit",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders WHERE o_totalprice >= 1.0
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS obs_share,
       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_share,
       round(pow(CAST(n AS DOUBLE)
                 - CAST(n_total AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2)
             / (CAST(n_total AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6)
         AS chi2_term
FROM g, tot
""",
    doc="Benford's-law fraud/anomaly screen on order totals: the "
    "distribution of FIRST significant digits vs the log10(1+1/d) "
    "expectation, with the per-digit chi-square contribution — the "
    "classic forensic-accounting test (fabricated or re-binned "
    "numbers flunk it) and a cheap data-quality tripwire for any "
    "money column. The digit is extracted from the INTEGER part via "
    "exact floor->int64->string (never from float formatting, which "
    "differs across engines); counts are exact int64; only the three "
    "reported ratios are floats, in identical double shape on both "
    "engines. Plan: one scan -> 9-group agg -> 1-row total broadcast; "
    "at 100 TB this is a single map-side-combine pass.",
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1.0).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    nd = F.col("n").cast("double")
    ntd = F.col("n_total").cast("double")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return g.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(nd / ntd, 6).alias("obs_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(F.pow(nd - ntd * benford, F.lit(2)) / (ntd * benford), 6).alias(
            "chi2_term"
        ),
    )


@register(
    "q_rfm_segmentation",
    oracle="""
WITH anchor AS (SELECT CAST(max(o_orderdate) AS DATE) AS mx FROM orders),
per_cust AS MATERIALIZED (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), anchor.mx) AS BIGINT)
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders, anchor GROUP BY o_custkey, anchor.mx
),
thr AS (
  SELECT round(quantile_cont(recency_days, 0.25), 6) AS r25,
         round(quantile_cont(recency_days, 0.50), 6) AS r50,
         round(quantile_cont(recency_days, 0.75), 6) AS r75,
         round(quantile_cont(frequency, 0.25), 6) AS f25,
         round(quantile_cont(frequency, 0.50), 6) AS f50,
         round(quantile_cont(frequency, 0.75), 6) AS f75,
         round(quantile_cont(monetary_cents, 0.25), 6) AS m25,
         round(quantile_cont(monetary_cents, 0.50), 6) AS m50,
         round(quantile_cont(monetary_cents, 0.75), 6) AS m75
  FROM per_cust
),
scored AS (
  SELECT CASE WHEN recency_days <= r25 THEN 4 WHEN recency_days <= r50 THEN 3
              WHEN recency_days <= r75 THEN 2 ELSE 1 END AS r_score,
         CASE WHEN frequency > f75 THEN 4 WHEN frequency > f50 THEN 3
              WHEN frequency > f25 THEN 2 ELSE 1 END AS f_score,
         CASE WHEN monetary_cents > m75 THEN 4 WHEN monetary_cents > m50 THEN 3
              WHEN monetary_cents > m25 THEN 2 ELSE 1 END AS m_score,
         monetary_cents
  FROM per_cust, thr
)
SELECT concat('R', r_score, 'F', f_score, 'M', m_score) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monetary_cents) AS BIGINT) AS monetary_cents
FROM scored GROUP BY segment
""",
    doc="RFM customer segmentation: per-customer Recency (days from "
    "the corpus max order date), Frequency (order count), Monetary "
    "(exact cents), each bucketed 1-4 against the corpus quartiles, "
    "rolled up to segment cells ('R4F4M4' = best) — the workhorse "
    "marketing segmentation. Quartile thresholds come from ONE 1-row "
    "exact-percentile aggregate broadcast to the fact rows (never an "
    "ntile window: value-threshold bucketing is deterministic under "
    "ties, needs no global sort, and scales as a broadcast scalar; "
    "swap percentile -> approx_percentile at 100 TB to avoid "
    "per-group value buffers, same plan otherwise). Thresholds are "
    "round(6)-pinned so both engines compare against bit-identical "
    "doubles; R/F/M inputs are exact int64 (cents integerized per "
    "row before summing).",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("cents"),
    )
    anchor = orders.agg(F.max("od").alias("mx"))
    per_cust = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey", "mx")
        .agg(
            F.datediff(F.max("mx"), F.max("od")).cast("long").alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
    )
    qs = [0.25, 0.50, 0.75]
    thr = per_cust.agg(
        *[
            F.round(F.expr(f"percentile({c}, {q})"), 6).alias(f"{p}{int(q * 100)}")
            for c, p in [
                ("recency_days", "r"),
                ("frequency", "f"),
                ("monetary_cents", "m"),
            ]
            for q in qs
        ]
    )
    sc = per_cust.crossJoin(F.broadcast(thr))
    r = (
        F.when(F.col("recency_days") <= F.col("r25"), 4)
        .when(F.col("recency_days") <= F.col("r50"), 3)
        .when(F.col("recency_days") <= F.col("r75"), 2)
        .otherwise(1)
    )
    f_ = (
        F.when(F.col("frequency") > F.col("f75"), 4)
        .when(F.col("frequency") > F.col("f50"), 3)
        .when(F.col("frequency") > F.col("f25"), 2)
        .otherwise(1)
    )
    m = (
        F.when(F.col("monetary_cents") > F.col("m75"), 4)
        .when(F.col("monetary_cents") > F.col("m50"), 3)
        .when(F.col("monetary_cents") > F.col("m25"), 2)
        .otherwise(1)
    )
    return (
        sc.select(
            F.concat(
                F.lit("R"),
                r.cast("string"),
                F.lit("F"),
                f_.cast("string"),
                F.lit("M"),
                m.cast("string"),
            ).alias("segment"),
            "monetary_cents",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("monetary_cents"),
        )
    )


@register(
    "q_abc_analysis",
    oracle="""
WITH rev AS MATERIALIZED (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM rev),
c AS (
  SELECT l_partkey, cents,
         CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM rev
),
cls AS (
  SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
              WHEN cum * 20 <= tot * 19 THEN 'B'
              ELSE 'C' END AS abc_class,
         cents, tot
  FROM c, tot
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_cents,
       round(CAST(sum(cents) AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS revenue_share
FROM cls GROUP BY abc_class, tot
""",
    doc="ABC / Pareto inventory classification: parts ranked by "
    "discounted revenue, classified A (first 80% of cumulative "
    "revenue), B (to 95%), C (tail) — the 80/20 analysis behind "
    "stocking policy and catalog pruning. The cumulative sum is the "
    "distributed two-phase global_prefix_sums operator (one range "
    "exchange pinned to scratch + O(partitions) driver offsets — "
    "never an unpartitioned window), class boundaries are EXACT "
    "integer comparisons (cum*5 <= tot*4), so ranking, cumulation "
    "and classification are all int64-exact on both engines; int64 "
    "headroom: tot*20 < 2^63 up to ~4.6e17 total cents (~$4.6e15) — "
    "past that promote the threshold compare to DECIMAL(38,0), same "
    "plan. Cites reference parity: none (pipeline extra).",
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0, 0)
        .cast("long")
        .alias("c0"),
    ).groupBy("l_partkey").agg(F.sum("c0").cast("long").alias("cents"))
    c = global_prefix_sums(
        rev, [F.col("cents").desc(), F.col("l_partkey")], {"cents": "cum"}
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("tot"))
    cls = c.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "tot",
    )
    return cls.groupBy("abc_class", "tot").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("class_cents"),
        F.round(
            F.sum("cents").cast("double") / F.max("tot").cast("double"), 6
        ).alias("revenue_share"),
    ).drop("tot")


@register(
    "q_cusum_changepoint",
    oracle="""
WITH h AS MATERIALIZED (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n FROM h),
c AS (
  SELECT hr, cnt,
         CAST(sum(cnt) OVER (ORDER BY hr
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS s,
         CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS i
  FROM h
),
st AS (SELECT hr, n * s - i * t AS stat, i, s, t, n FROM c, tot)
SELECT hr AS changepoint_hr, CAST(stat AS BIGINT) AS cusum_scaled,
       round(CAST(s AS DOUBLE) / CAST(i AS DOUBLE), 6) AS mean_before,
       round(CAST(t - s AS DOUBLE) / CAST(nullif(n - i, 0) AS DOUBLE), 6)
         AS mean_after
FROM st ORDER BY abs(stat) DESC, hr LIMIT 1
""",
    doc="CUSUM changepoint detection on the hourly event-count series: "
    "the hour where the cumulative deviation from the global mean "
    "peaks — the standard single-changepoint estimator (argmax |S_i "
    "- i*mean|) behind regime-shift alerts on traffic series. The "
    "statistic is kept INTEGER by scaling through the total: n*S_i - "
    "i*T (multiply by n instead of dividing by it), so prefix sums, "
    "the deviation, and the argmax are all int64-exact — only the "
    "two reported segment means are floats; int64 headroom: n*T < "
    "2^63 up to ~1e5 hours x 9e13 events. Prefix sum and index come "
    "from ONE global_prefix_sums call (single range exchange + "
    "O(partitions) driver offsets, both running columns share the "
    "pin); argmax is orderBy+limit (TakeOrderedAndProject), never a "
    "global rank.",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    events = load_table(spark, sf_dir, "events")
    h = (
        events.groupBy(F.expr("(ts div 1000) div 3600000000").alias("hr"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("one", F.lit(1).cast("long"))
    )
    c = global_prefix_sums(h, [F.col("hr")], {"cnt": "s", "one": "i"})
    tot = h.agg(
        F.sum("cnt").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("n")
    )
    st = c.crossJoin(F.broadcast(tot)).select(
        "hr",
        (F.col("n") * F.col("s") - F.col("i") * F.col("t")).alias("stat"),
        "i",
        "s",
        "t",
        "n",
    )
    return (
        st.orderBy(F.abs(F.col("stat")).desc(), "hr")
        .limit(1)
        .select(
            F.col("hr").alias("changepoint_hr"),
            F.col("stat").cast("long").alias("cusum_scaled"),
            F.round(F.col("s").cast("double") / F.col("i").cast("double"), 6).alias(
                "mean_before"
            ),
            F.round(
                (F.col("t") - F.col("s")).cast("double")
                / F.nullif(F.col("n") - F.col("i"), F.lit(0)).cast("double"),
                6,
            ).alias("mean_after"),
        )
    )


@register(
    "q_clustering_coefficient",
    oracle="""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
deg AS MATERIALIZED (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
o AS MATERIALIZED (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e0.u < e0.v)
              THEN e0.u ELSE e0.v END AS s,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND e0.u < e0.v)
              THEN e0.v ELSE e0.u END AS t
  FROM e0 JOIN deg da ON da.node = e0.u JOIN deg db ON db.node = e0.v
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS triangles
  FROM o w1 JOIN o w2 ON w2.s = w1.t
  WHERE EXISTS (SELECT 1 FROM o w3 WHERE w3.s = w1.s AND w3.t = w2.t)
),
wed AS (
  SELECT CAST(sum(d * (d - 1)) // 2 AS BIGINT) AS wedges,
         CAST(count(*) AS BIGINT) AS n_nodes
  FROM deg
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e0)
SELECT n_nodes, n_edges, wedges, triangles,
       round(3.0 * CAST(triangles AS DOUBLE) / CAST(wedges AS DOUBLE), 6) AS global_cc
FROM tri, wed, ne
""",
    doc="Global clustering coefficient (transitivity) of the "
    "parts-bought-together graph: 3*triangles / wedges — the "
    "one-number answer to 'is this graph clique-y or tree-y', the "
    "companion structure summary to q_degree_assortativity (together "
    "they decide community-detection vs hub-salting strategies "
    "before heavier graph work). Triangles reuse q_triangle_count's "
    "degree-oriented Suri-Vassilvitskii recipe (out-degree bounded "
    "by O(sqrt(m)) so the wedge join survives power-law hubs); "
    "wedges are a pure degree aggregate sum(d*(d-1)) div 2. All "
    "counts exact int64 (int64 headroom: sum d^2 < 2^63 to ~3e9 "
    "avg-degree-1k nodes); the final ratio is the only float. Plan: "
    "key-partitioned shuffles end-to-end, three 1-row aggregates "
    "joined scalar-wise at the end.",
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e0 = cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=False)
    und = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
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
    tri = (
        w1.join(w2, "t1")
        .join(w3, ["s1", "t2"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    wed = deg.agg(
        F.expr("sum(d * (d - 1)) div 2").cast("long").alias("wedges"),
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
    )
    ne = e0.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(wed))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_nodes",
            "n_edges",
            "wedges",
            "triangles",
            F.round(
                F.lit(3.0)
                * F.col("triangles").cast("double")
                / F.col("wedges").cast("double"),
                6,
            ).alias("global_cc"),
        )
    )


@register(
    "q_herfindahl_suppliers",
    oracle="""
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
tot AS (
  SELECT s_nationkey, CAST(sum(cents) AS BIGINT) AS tot_cents
  FROM rev GROUP BY 1
),
sh AS (
  SELECT r.s_nationkey, t.tot_cents,
         r.cents // greatest(t.tot_cents // 1000000, 1) AS share_micro
  FROM rev r JOIN tot t ON t.s_nationkey = r.s_nationkey
),
h AS (
  SELECT s_nationkey,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(max(tot_cents) AS BIGINT) AS tot_cents,
         CAST(sum(share_micro * share_micro) AS BIGINT) AS sq_micro
  FROM sh GROUP BY 1
)
SELECT n.n_name AS nation, n_suppliers, tot_cents,
       round(10000.0 * CAST(sq_micro AS DOUBLE) / 1000000000000.0, 6) AS hhi
FROM h JOIN nation n ON n.n_nationkey = h.s_nationkey
""",
    doc="Herfindahl-Hirschman concentration index of supplier revenue "
    "per nation (0-10000 scale; >2500 = antitrust-red concentrated): "
    "sum of squared market shares, the regulator's complement to "
    "q_gini_revenue's Lorenz view — HHI weights the HEAD (a single "
    "70% supplier dominates it), Gini the whole curve. Revenue "
    "integerizes to cents per row, then each supplier's share "
    "quantizes to MICRO-SHARES via divide-BEFORE-multiply truncation "
    "(cents div greatest(tot div 1e6, 1) — identical `div`//`//` on "
    "both engines, and no intermediate ever exceeds the inputs, so "
    "the int64 budget holds at ANY corpus size; raw cents squared "
    "wraps int64 silently in Spark and loudly in DuckDB at ~$3e7 "
    "per supplier, and cents*1e6 wraps past ~$1e11 nation totals): "
    "squares are bounded by 1e12 because shares are bounded, at a "
    "documented quantization error of ~1e-6 relative per supplier, "
    "below the round(6) pin. Plan: broadcast supplier dim join, keyed agg, keyed "
    "total join back, keyed agg, broadcast 25-row nation join.",
)
def q_herfindahl_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0, 0)
        .cast("long")
        .alias("c0"),
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum("cents").cast("long").alias("tot_cents")
    )
    sh = rev.join(tot, "s_nationkey").select(
        "s_nationkey",
        "tot_cents",
        F.expr("cents div greatest(tot_cents div 1000000, 1)").alias("share_micro"),
    )
    h = sh.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.max("tot_cents").cast("long").alias("tot_cents"),
        F.sum(F.col("share_micro") * F.col("share_micro"))
        .cast("long")
        .alias("sq_micro"),
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return h.join(
        F.broadcast(nation), h["s_nationkey"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        "n_suppliers",
        "tot_cents",
        F.round(
            F.lit(10000.0) * F.col("sq_micro").cast("double") / F.lit(1.0e12),
            6,
        ).alias("hhi"),
    )


@register(
    "q_peak_concurrency",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {30 * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, t, event_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM ev
),
iv AS (
  SELECT user_id, session_no, min(t) AS t_start, max(t) AS t_end
  FROM sess GROUP BY 1, 2
),
deltas AS (
  SELECT user_id, session_no, t_start AS t, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT user_id, session_no, t_end AS t, CAST(-1 AS BIGINT) AS delta FROM iv
),
sweep AS (
  SELECT t, delta, user_id, session_no,
         CAST(sum(delta) OVER (ORDER BY t, delta DESC, user_id, session_no
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
  FROM deltas
),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM iv)
SELECT conc AS peak_concurrency, t AS at_us, n_sessions
FROM sweep, ns
ORDER BY conc DESC, t, user_id, session_no LIMIT 1
""",
    doc="Peak concurrent sessions via the classic sweep-line: gap-"
    "sessionized [start, end] intervals emit +1/-1 deltas, the global "
    "running sum is live concurrency, and the argmax row is the "
    "capacity-planning headline (closed-interval convention: starts "
    "sort before ends at the same instant via delta DESC, so "
    "touching sessions count as concurrent). The running sum is the "
    "distributed global_prefix_sums operator (range exchange + "
    "O(partitions) driver offsets — an unpartitioned window here "
    "would serialize 2x-sessions rows through one task); the argmax "
    "is orderBy+limit (TakeOrderedAndProject). All integer math; "
    "the sweep order is a documented TOTAL order, so both engines "
    "pick the same peak instant deterministically.",
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    gap_us = 30 * 60 * 1_000_000
    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    t = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy(t, "event_id")
    is_new = F.when(t - F.lag(t).over(w) > gap_us, 1).otherwise(0)
    sess = events.select(
        "user_id", t.alias("t"), "event_id", is_new.alias("is_new")
    ).withColumn(
        "session_no",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("t", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    iv = sess.groupBy("user_id", "session_no").agg(
        F.min("t").alias("t_start"), F.max("t").alias("t_end")
    )
    deltas = iv.select(
        "user_id",
        "session_no",
        F.col("t_start").alias("t"),
        F.lit(1).cast("long").alias("delta"),
    ).unionByName(
        iv.select(
            "user_id",
            "session_no",
            F.col("t_end").alias("t"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    sweep = global_prefix_sums(
        deltas,
        [F.col("t"), F.col("delta").desc(), F.col("user_id"), F.col("session_no")],
        {"delta": "conc"},
    )
    ns = iv.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    return (
        sweep.crossJoin(F.broadcast(ns))
        .orderBy(F.col("conc").desc(), "t", "user_id", "session_no")
        .limit(1)
        .select(
            F.col("conc").alias("peak_concurrency"),
            F.col("t").alias("at_us"),
            "n_sessions",
        )
    )


@register(
    "q_dow_seasonality",
    oracle="""
WITH d AS (
  SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow
  FROM events
),
g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_events FROM d GROUP BY 1),
tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM g)
SELECT CAST(dow AS BIGINT) AS dow, n_events,
       round(CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       round(7.0 * CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE), 6)
         AS seasonality_index
FROM g, tot
""",
    doc="Day-of-week seasonality profile of the event stream: per-dow "
    "volume share and the seasonality index share*7 (1.0 = flat; the "
    "multiplicative factor a naive forecast applies per weekday). "
    "The weekday derives from PURE INTEGER epoch math — (epoch_day + "
    "3) mod 7, 0 = Monday — never from the engines' dayofweek() "
    "(DuckDB counts Sunday=0, Spark Sunday=1; the formula sidesteps "
    "both and any session-timezone dependence, UTC by contract). "
    "Counts are exact int64; the two ratios are the only floats. "
    "Plan: one scan, 7-group agg, 1-row total broadcast.",
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")  # ts = long nanos
    dow = F.expr("(((ts div 1000) div 86400000000) + 3) % 7")
    g = events.groupBy(dow.cast("long").alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    tot = g.agg(F.sum("n_events").cast("long").alias("total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_events",
        F.round(
            F.col("n_events").cast("double") / F.col("total").cast("double"), 6
        ).alias("share"),
        F.round(
            F.lit(7.0) * F.col("n_events").cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("seasonality_index"),
    )


@register(
    "q_repeat_purchase_interval",
    oracle="""
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS od, o_orderkey
  FROM orders
),
gaps AS (
  SELECT o_custkey,
         od - lag(od) OVER (PARTITION BY o_custkey
                            ORDER BY od, o_orderkey) AS gap_days
  FROM o
)
SELECT c.c_mktsegment AS segment,
       CAST(count(g.gap_days) AS BIGINT) AS n_intervals,
       round(CAST(sum(g.gap_days) AS DOUBLE) / CAST(count(g.gap_days) AS DOUBLE), 6)
         AS mean_days,
       round(quantile_cont(g.gap_days, 0.5), 6) AS median_days
FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
WHERE g.gap_days IS NOT NULL
GROUP BY 1
""",
    doc="Repeat-purchase cadence per market segment: day gaps between "
    "a customer's consecutive orders (per-customer partitioned lag — "
    "bounded groups, never a global window), rolled up to mean and "
    "exact median per segment — the replenishment-cycle metric "
    "behind churn-risk windows ('2x the median gap with no order' "
    "alerts). Order dates reduce to integer epoch days before any "
    "math (gaps are exact int64; ties in the lag ordering broken by "
    "o_orderkey for a total order); the mean is an exact int "
    "sum/count and the median mirrors quantile_cont at round(6) — "
    "swap percentile -> approx_percentile at 100 TB to avoid "
    "per-group value buffers, same plan otherwise. Plan: one keyed "
    "window, broadcast customer-dim join, 5-group agg.",
)
def q_repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000)").alias(
            "od"
        ),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gaps = orders.select(
        "o_custkey", (F.col("od") - F.lag("od").over(w)).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        gaps.join(F.broadcast(cust), gaps["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("gap_days").cast("long").alias("n_intervals"),
            F.round(
                F.sum("gap_days").cast("double") / F.count("gap_days").cast("double"),
                6,
            ).alias("mean_days"),
            F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias("median_days"),
        )
    )


@register(
    "q_xmr_control_limits",
    oracle="""
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
mr AS (
  SELECT a.day, abs(a.cnt - b.cnt) AS mrange
  FROM d a JOIN d b ON b.day = a.day - 1
),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
         (SELECT CAST(sum(cnt) AS BIGINT) FROM d) AS total,
         (SELECT CAST(count(*) AS BIGINT) FROM mr) AS n_mr,
         (SELECT CAST(sum(mrange) AS BIGINT) FROM mr) AS mr_total
),
lim AS (
  SELECT n_days,
         round(CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mean_cnt,
         round(CAST(mr_total AS DOUBLE) / CAST(n_mr AS DOUBLE), 6) AS mr_bar,
         round(CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE)
               + 2.66 * CAST(mr_total AS DOUBLE) / CAST(n_mr AS DOUBLE), 6) AS ucl,
         round(CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE)
               - 2.66 * CAST(mr_total AS DOUBLE) / CAST(n_mr AS DOUBLE), 6) AS lcl
  FROM stats
)
SELECT n_days, mean_cnt, mr_bar, ucl, lcl,
       (SELECT CAST(count(*) AS BIGINT) FROM d, lim
        WHERE CAST(cnt AS DOUBLE) > ucl OR CAST(cnt AS DOUBLE) < lcl) AS n_out_of_control
FROM lim
""",
    doc="Shewhart XmR (individuals + moving range) control chart on "
    "the daily event-count series: centerline, average moving range "
    "between adjacent calendar days, UCL/LCL = mean +- 2.66*MRbar, "
    "and the count of out-of-control days — the SPC primitive behind "
    "'is today's traffic anomalous or just noisy' alerting. The "
    "moving range uses a day-(day-1) EQUI-JOIN, not a global lag "
    "window (adjacent-calendar-day convention, documented: gap days "
    "contribute no range pair) — at 100 TB of telemetry the daily "
    "rollup is tiny but the same shape works per-series with a "
    "partition key. All sums exact int64; limits are round(6)-pinned "
    "doubles before the out-of-control comparison so both engines "
    "classify identically. Plan: one scan -> daily agg -> self-join "
    "on day-1 -> three 1-row aggregates joined scalar-wise.",
)
def q_xmr_control_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        F.expr("(ts div 1000) div 86400000000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a = d.select(F.col("day").alias("day"), F.col("cnt").alias("ca"))
    b = d.select((F.col("day") + 1).alias("day"), F.col("cnt").alias("cb"))
    mr = a.join(b, "day").select(F.abs(F.col("ca") - F.col("cb")).alias("mrange"))
    dstats = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cnt").cast("long").alias("total"),
    )
    mrstats = mr.agg(
        F.count(F.lit(1)).cast("long").alias("n_mr"),
        F.sum("mrange").cast("long").alias("mr_total"),
    )
    mean_cnt = F.col("total").cast("double") / F.col("n_days").cast("double")
    mr_bar = F.col("mr_total").cast("double") / F.col("n_mr").cast("double")
    lim = dstats.crossJoin(F.broadcast(mrstats)).select(
        "n_days",
        F.round(mean_cnt, 6).alias("mean_cnt"),
        F.round(mr_bar, 6).alias("mr_bar"),
        F.round(mean_cnt + F.lit(2.66) * mr_bar, 6).alias("ucl"),
        F.round(mean_cnt - F.lit(2.66) * mr_bar, 6).alias("lcl"),
    )
    ooc = (
        d.crossJoin(F.broadcast(lim.select("ucl", "lcl")))
        .filter(
            (F.col("cnt").cast("double") > F.col("ucl"))
            | (F.col("cnt").cast("double") < F.col("lcl"))
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_out_of_control"))
    )
    return lim.crossJoin(F.broadcast(ooc))


@register(
    "q_ab_test_proportions",
    oracle="""
WITH assign AS (
  SELECT user_id, user_id % 2 AS arm,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
  FROM assign
)
SELECT n_a, n_b, conv_a, conv_b,
       round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
       round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
       round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 0.0), 6)
         AS z_score
FROM g
""",
    doc="Two-proportion A/B z-test on user conversion (>= 14 purchase "
    "events — the fixture's median split; 'any purchase' is "
    "degenerate here, every user converts and the pooled variance "
    "is 0), arms assigned by user_id parity: pooled-proportion "
    "standard error, the |z| > 1.96 readout every experimentation "
    "platform ships. Per-user conversion collapses with ONE keyed "
    "agg, arm counts are exact int64, the z statistic is a single-"
    "shape double expression over four exact integers, and the "
    "denominator is nullif-guarded on BOTH engines (all-convert / "
    "none-convert corpora give NULL z, not a divide error). Plan: "
    "one scan, per-user agg, 1-row reduce; a 100 TB single pass "
    "(the per-user agg is the only shuffle).",
)
def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    assign = events.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14,
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    g = assign.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (ca / na - cb / nb) / F.nullif(
        F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)),
        F.lit(0.0),
    )
    return g.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(ca / na, 6).alias("p_a"),
        F.round(cb / nb, 6).alias("p_b"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "q_cohort_ltv_curve",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(date_part('year', o_orderdate) * 12
              + date_part('month', o_orderdate) - 1 AS BIGINT) AS mon,
         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS cents
  FROM orders
),
first_mon AS (SELECT o_custkey, min(mon) AS cohort FROM o GROUP BY 1),
cell AS (
  SELECT f.cohort, o.mon - f.cohort AS age,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(o.cents) AS BIGINT) AS cents
  FROM o JOIN first_mon f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT cohort, age, n_orders,
       CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM cell
""",
    doc="Cohort LTV curve: customers grouped by first-order month, "
    "cumulative revenue per cohort by months-since-acquisition — the "
    "payback-period table under every CAC decision. Months collapse "
    "to an integer index (year*12+month-1, pure date-part math — no "
    "interval arithmetic to disagree on), revenue integerizes to "
    "cents per row, and the running total is a PARTITIONED window "
    "(one bounded group per cohort — never a global window; at 100 "
    "TB cohorts number in the hundreds while rows are billions, so "
    "the cumsum runs on the post-agg cells, thousands of rows). "
    "Plan: keyed first-order agg, fact join back on custkey, "
    "(cohort, age) agg, per-cohort window.",
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("mon"),
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("cents"),
    )
    first_mon = orders.groupBy("o_custkey").agg(F.min("mon").alias("cohort"))
    cell = (
        orders.join(first_mon, "o_custkey")
        .groupBy("cohort", (F.col("mon") - F.col("cohort")).alias("age"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        "cohort",
        "age",
        "n_orders",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
    )


@register(
    "q_powerlaw_degree_alpha",
    oracle="""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e0 GROUP BY 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(CAST(round(ln(CAST(d AS DOUBLE)) * 1000000.0, 0) AS BIGINT))
              AS BIGINT) AS lnsum_micro,
         CAST(max(d) AS BIGINT) AS max_degree
  FROM deg
)
SELECT n_nodes, max_degree,
       round(1.0 + CAST(n_nodes AS DOUBLE)
             / (CAST(lnsum_micro AS DOUBLE) / 1000000.0), 6) AS alpha_mle
FROM s
""",
    doc="Power-law exponent MLE over the co-purchase degree "
    "distribution (Clauset-Shalizi-Newman discrete approximation "
    "with xmin=1): alpha = 1 + n / sum(ln d) — the one-number tail "
    "diagnostic that says whether hub-salting / skew-aware joins are "
    "mandatory (alpha < 2.5 means the max hub grows superlinearly "
    "with corpus size). Per-node ln(d) integerizes to micro-units "
    "before the sum (the entropy-sum contract: the reduction is an "
    "exact int64 sum, order-independent on both engines); one float "
    "division at the end. Plan: edge agg -> degree agg -> 1-row "
    "reduce; the degree table never leaves the executors.",
)
def q_powerlaw_degree_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e0 = cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=True)
    deg = e0.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    s = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(
            F.round(F.log(F.col("d").cast("double")) * 1000000.0, 0).cast("long")
        )
        .cast("long")
        .alias("lnsum_micro"),
        F.max("d").cast("long").alias("max_degree"),
    )
    return s.select(
        "n_nodes",
        "max_degree",
        F.round(
            F.lit(1.0)
            + F.col("n_nodes").cast("double")
            / (F.col("lnsum_micro").cast("double") / F.lit(1000000.0)),
            6,
        ).alias("alpha_mle"),
    )


@register(
    "q_top_session_paths",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {30 * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, t, event_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM ev
),
paths AS (
  SELECT user_id, session_no,
         array_to_string(list(event_type ORDER BY t, event_id)[1:8], '>') AS path
  FROM sess GROUP BY 1, 2
),
g AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM paths GROUP BY 1)
SELECT path, n_sessions FROM g ORDER BY n_sessions DESC, path LIMIT 10
""",
    doc="Top-10 most common session journeys: gap-sessionized event "
    "streams collapse to ordered event-type paths (truncated to the "
    "first 8 steps so path cardinality stays bounded), counted and "
    "ranked — the 'what do users actually do' table behind UX-flow "
    "and bot-pattern review. The in-session ordering is pinned by "
    "(t, event_id) — a TOTAL order, so the collected path string is "
    "deterministic on both engines (Spark sorts struct arrays, "
    "DuckDB uses ORDER BY inside list()); the top-k is orderBy+"
    "limit (TakeOrderedAndProject), never a global rank. Plan: "
    "per-user windows (bounded groups), per-session agg, path agg, "
    "tiny top-k.",
)
def q_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap_us = 30 * 60 * 1_000_000
    events = load_table(spark, sf_dir, "events")
    t = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy(t, "event_id")
    is_new = F.when(t - F.lag(t).over(w) > gap_us, 1).otherwise(0)
    sess = events.select(
        "user_id", t.alias("t"), "event_id", "event_type", is_new.alias("is_new")
    ).withColumn(
        "session_no",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("t", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    paths = sess.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("t", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                8,
            ),
            ">",
        ).alias("path")
    )
    g = paths.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    return g.orderBy(F.col("n_sessions").desc(), "path").limit(10)


@register(
    "q_funnel_time_to_convert",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
  FROM events GROUP BY 1
),
conv AS (
  SELECT (t_buy - t_view) // 1000000 AS secs
  FROM per_user
  WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy > t_view
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(secs, 0.5), 6) AS median_secs,
       round(quantile_cont(secs, 0.9), 6) AS p90_secs,
       round(CAST(sum(secs) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_secs
FROM conv
""",
    doc="Time-to-convert distribution: seconds from a user's first "
    "view to their first purchase (first-touch pair, converters "
    "only) — the latency histogram behind 'how long should "
    "remarketing wait'. Timestamps reduce to integer epoch seconds "
    "per user BEFORE any statistics (conditional-min pairs, exact "
    "int64 differences); the median/p90 are exact percentiles "
    "mirroring quantile_cont at round(6) (approx_percentile is the "
    "documented 100 TB swap), the mean an exact int sum/count. "
    "Plan: one scan, per-user conditional-min agg, 1-row reduce.",
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    t_us = F.expr("ts div 1000")

    def first_of(etype):
        return F.min(F.when(F.col("event_type") == etype, t_us))

    per_user = events.groupBy("user_id").agg(
        first_of("view").alias("t_view"), first_of("purchase").alias("t_buy")
    )
    conv = per_user.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") > F.col("t_view"))
    ).select(F.expr("(t_buy - t_view) div 1000000").alias("secs"))
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.expr("percentile(secs, 0.5)"), 6).alias("median_secs"),
        F.round(F.expr("percentile(secs, 0.9)"), 6).alias("p90_secs"),
        F.round(
            F.sum("secs").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_secs"),
    )


@register(
    "q_price_elasticity",
    oracle="""
WITH obs AS (
  SELECT p.p_brand,
         CAST(round(ln(l.l_extendedprice / l.l_quantity) * 1000000.0, 0) AS BIGINT)
           AS x_micro,
         CAST(round(ln(l.l_quantity) * 1000000.0, 0) AS BIGINT) AS y_micro
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
),
m AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x_micro) AS BIGINT) AS sx,
         CAST(sum(y_micro) AS BIGINT) AS sy,
         sum(CAST(x_micro AS DECIMAL(18,0)) * CAST(y_micro AS DECIMAL(18,0))) AS sxy,
         sum(CAST(x_micro AS DECIMAL(18,0)) * CAST(x_micro AS DECIMAL(18,0))) AS sxx
  FROM obs GROUP BY 1
)
SELECT p_brand AS brand, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 6)
         AS elasticity
FROM m
""",
    doc="Log-log price elasticity of demand per brand: OLS slope of "
    "ln(quantity) on ln(unit price) — the pricing-team regression "
    "(elasticity < -1 = revenue rises when price falls). Follows "
    "q_group_regression's exact-moments contract: both log terms "
    "integerize to micro-units PER ROW, so all five OLS moments are "
    "exact reductions (the cross-products ride DECIMAL(18)x"
    "DECIMAL(18) — micro-unit logs reach ~2e7, squares ~4e14, and "
    "int64 would wrap on the SUM at ~1e4 rows/brand; decimal "
    "headroom holds to 1e22 rows); the slope assembles in one "
    "identical double shape, nullif-guarded for degenerate "
    "zero-variance groups. Plan: broadcast part-dim join, one keyed "
    "agg — a 100 TB single pass.",
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    obs = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 1000000.0, 0)
        .cast("long")
        .alias("x_micro"),
        F.round(F.log(F.col("l_quantity")) * 1000000.0, 0)
        .cast("long")
        .alias("y_micro"),
    )
    xd = F.col("x_micro").cast("decimal(18,0)")
    yd = F.col("y_micro").cast("decimal(18,0)")
    m = obs.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_micro").cast("long").alias("sx"),
        F.sum("y_micro").cast("long").alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("p_brand").alias("brand"),
        "n",
        F.round(
            (nd * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / F.nullif(
                nd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("elasticity"),
    )


def _markov_attribution_oracle(steps: int = 8) -> str:
    """Unrolled absorbing-chain conversion probability, base + one
    removal variant per channel — same fixed-step integer-state
    determinism contract as the pagerank/power-PCA oracles: the state
    vector lives in int64 micro-units and every step is (m * cnt)
    truncation-divided by the row's out-count, so both engines walk
    bit-identical chains. Every reused CTE is MATERIALIZED (DuckDB
    would otherwise re-inline each variant's 8 references ->
    exponential plan blowup)."""
    channels = ["view", "click", "signup", "error"]
    ctes = [
        """ev AS MATERIALIZED (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
)""",
        """cp AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'purchase' THEN rn END) AS crn
  FROM ev GROUP BY 1
)""",
        """j AS MATERIALIZED (
  SELECT e.user_id,
         CASE WHEN e.event_type = 'purchase' THEN 'conv'
              ELSE e.event_type END AS st,
         e.rn, cp.crn
  FROM ev e JOIN cp USING (user_id)
  WHERE cp.crn IS NULL OR e.rn <= cp.crn
)""",
        """pairs AS (
  SELECT st AS src,
         lead(st) OVER (PARTITION BY user_id ORDER BY rn) AS dst
  FROM j
)""",
        """ends AS (
  SELECT st AS src FROM (
    SELECT st, rn, crn, max(rn) OVER (PARTITION BY user_id) AS mx FROM j
  ) WHERE rn = mx AND crn IS NULL
)""",
        """trans0 AS (
  SELECT src, dst FROM pairs WHERE dst IS NOT NULL
  UNION ALL
  SELECT 'start' AS src, st AS dst FROM j WHERE rn = 1
  UNION ALL
  SELECT src, 'null' AS dst FROM ends
)""",
        """tcnt AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM trans0 GROUP BY 1, 2
)""",
        """tout AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS outc FROM tcnt GROUP BY 1)""",
        """base AS MATERIALIZED (
  SELECT t.src, t.dst, t.cnt, o.outc FROM tcnt t JOIN tout o USING (src)
)""",
    ]
    variants = {"base": None}
    for c in channels:
        variants[c] = c
    for vname, removed in variants.items():
        if removed is None:
            ctes.append(f"t_{vname} AS MATERIALIZED (SELECT * FROM base)")
        else:
            ctes.append(
                f"""t_{vname} AS MATERIALIZED (
  SELECT src, CASE WHEN dst = '{removed}' THEN 'null' ELSE dst END AS dst,
         CAST(sum(cnt) AS BIGINT) AS cnt, CAST(max(outc) AS BIGINT) AS outc
  FROM base WHERE src <> '{removed}'
  GROUP BY 1, 2
)"""
            )
        ctes.append(
            f"v_{vname}_0 AS (SELECT 'start' AS state, CAST(1000000 AS BIGINT) AS m)"
        )
        for n in range(steps):
            ctes.append(
                f"""v_{vname}_{n + 1} AS MATERIALIZED (
  SELECT state, CAST(sum(m) AS BIGINT) AS m FROM (
    SELECT b.dst AS state, (v.m * b.cnt) // b.outc AS m
    FROM v_{vname}_{n} v JOIN t_{vname} b ON b.src = v.state
    UNION ALL
    SELECT state, m FROM v_{vname}_{n} WHERE state IN ('conv', 'null')
  ) GROUP BY 1
)"""
        )
        ctes.append(
            f"""p_{vname} AS (
  SELECT CAST(coalesce(max(m), 0) AS BIGINT) AS conv_micro
  FROM v_{vname}_{steps} WHERE state = 'conv'
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS channel, (SELECT conv_micro FROM p_{c}) AS removed_micro"
        for c in channels
    )
    ctes.append(
        f"""re AS (
  SELECT channel, removed_micro,
         (SELECT conv_micro FROM p_base) AS base_micro
  FROM ({union})
)""")
    ctes.append(
        """res AS (
  SELECT channel, base_micro, removed_micro,
         base_micro - removed_micro AS effect_micro
  FROM re
)""",
    )
    ctes.append(
        """tot AS (SELECT CAST(sum(CASE WHEN effect_micro > 0 THEN effect_micro ELSE 0 END) AS BIGINT) AS tot_eff FROM res)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT channel,
       round(CAST(base_micro AS DOUBLE) / 1000000.0, 6) AS conv_p_base,
       round(CAST(removed_micro AS DOUBLE) / 1000000.0, 6) AS conv_p_removed,
       round(CAST(base_micro - removed_micro AS DOUBLE)
             / CAST(nullif(base_micro, 0) AS DOUBLE), 6) AS removal_effect,
       round(CAST(CASE WHEN effect_micro > 0 THEN effect_micro ELSE 0 END AS DOUBLE)
             / CAST(nullif(tot_eff, 0) AS DOUBLE), 6) AS attribution_share
FROM res, tot
"""
    )


@register(
    "q_markov_attribution",
    oracle=_markov_attribution_oracle(8),
    doc="Markov removal-effect channel attribution (Anderl et al. "
    "2014): user journeys truncate at first purchase, become an "
    "absorbing first-order chain (start -> event types -> conv/"
    "null), and each channel's credit is how much the chain's "
    "conversion probability DROPS when that channel's node is "
    "removed (transitions into it fail to null) — the data-driven "
    "alternative to last-touch that credits assist channels. "
    "Determinism: the state vector walks 8 fixed steps in int64 "
    "MICRO-UNITS, each step (m * cnt) div out — truncation integer "
    "math both engines replay bit-for-bit (the pagerank contract); "
    "probabilities appear only in the final report (Python ints are "
    "arbitrary-precision, so the driver-side chain never overflows; "
    "the SQL mirror's int64 budget is m*cnt <= 1e6 * transitions). "
    "Plan: per-user windows build the transition table distributed, "
    "then the chain runs on a DRIVER COLLECT of that table — "
    "O(|event types|^2) <= ~50 rows at ANY corpus size, the same "
    "bounded-collect exception as the k-means seed map (a "
    "Spark-side unrolling was measured 100x slower: 5 chains x 8 "
    "steps = 40 chained joins of <=8-row frames is pure Catalyst "
    "planning overhead, ~230s vs ~2s); only the journey scan "
    "scales with data.",
)
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    channels = ["view", "click", "signup", "error"]
    events = load_table(spark, sf_dir, "events")
    ts_us = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    ev = events.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    cp = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("rn"))).alias("crn")
    )
    j = (
        ev.join(cp, "user_id")
        .filter(F.col("crn").isNull() | (F.col("rn") <= F.col("crn")))
        .select(
            "user_id",
            F.when(F.col("event_type") == "purchase", "conv")
            .otherwise(F.col("event_type"))
            .alias("st"),
            "rn",
            "crn",
        )
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    pairs = j.select(
        F.col("st").alias("src"), F.lead("st").over(wj).alias("dst")
    ).filter(F.col("dst").isNotNull())
    ends = (
        j.withColumn("mx", F.max("rn").over(Window.partitionBy("user_id")))
        .filter((F.col("rn") == F.col("mx")) & F.col("crn").isNull())
        .select(F.col("st").alias("src"), F.lit("null").alias("dst"))
    )
    starts = j.filter(F.col("rn") == 1).select(
        F.lit("start").alias("src"), F.col("st").alias("dst")
    )
    trans0 = pairs.unionByName(starts).unionByName(ends)
    tcnt = trans0.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tout = tcnt.groupBy("src").agg(F.sum("cnt").cast("long").alias("outc"))
    # bounded driver collect: O(|event types|^2) rows at any corpus size
    base = [
        (r["src"], r["dst"], r["cnt"], r["outc"])
        for r in tcnt.join(tout, "src").select("src", "dst", "cnt", "outc").collect()
    ]

    def variant(removed: str | None):
        if removed is None:
            return base
        agg: dict[tuple[str, str], list[int]] = {}
        for src, dst, cnt, outc in base:
            if src == removed:
                continue
            key = (src, "null" if dst == removed else dst)
            cell = agg.setdefault(key, [0, outc])
            cell[0] += cnt
        return [(s, d, c, o) for (s, d), (c, o) in agg.items()]

    def conv_micro(tv) -> int:
        # exact mirror of the SQL chain: truncation div per (src, dst)
        # term, absorbing conv/null carry their mass
        by_src: dict[str, list[tuple[str, int, int]]] = {}
        for src, dst, cnt, outc in tv:
            by_src.setdefault(src, []).append((dst, cnt, outc))
        v = {"start": 1000000}
        for _ in range(8):
            nxt: dict[str, int] = {}
            for state, m in v.items():
                if state in ("conv", "null"):
                    nxt[state] = nxt.get(state, 0) + m
                    continue
                for dst, cnt, outc in by_src.get(state, []):
                    nxt[dst] = nxt.get(dst, 0) + (m * cnt) // outc
            v = nxt
        return v.get("conv", 0)

    base_micro = conv_micro(variant(None))
    rows = [(c, base_micro, conv_micro(variant(c))) for c in channels]
    res = spark.createDataFrame(
        rows, "channel string, base_micro long, removed_micro long"
    ).withColumn(
        "effect_micro", F.col("base_micro") - F.col("removed_micro")
    )
    tot = res.agg(
        F.sum(
            F.when(F.col("effect_micro") > 0, F.col("effect_micro")).otherwise(0)
        )
        .cast("long")
        .alias("tot_eff")
    )
    return res.crossJoin(F.broadcast(tot)).select(
        "channel",
        F.round(F.col("base_micro").cast("double") / 1000000.0, 6).alias(
            "conv_p_base"
        ),
        F.round(F.col("removed_micro").cast("double") / 1000000.0, 6).alias(
            "conv_p_removed"
        ),
        F.round(
            (F.col("base_micro") - F.col("removed_micro")).cast("double")
            / F.nullif(F.col("base_micro"), F.lit(0)).cast("double"),
            6,
        ).alias("removal_effect"),
        F.round(
            F.when(F.col("effect_micro") > 0, F.col("effect_micro"))
            .otherwise(0)
            .cast("double")
            / F.nullif(F.col("tot_eff"), F.lit(0)).cast("double"),
            6,
        ).alias("attribution_share"),
    )


@register(
    "q_latency_heatmap",
    oracle="""
SELECT event_type,
       CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2
""",
    doc="Latency/value heatmap: p50/p95/p99 of the event value per "
    "(event_type, hour-of-day) cell — the 2-D percentile rollup "
    "behind every SLO dashboard ('which operation degrades at which "
    "hour'). Hour-of-day is pure integer epoch math (UTC by "
    "contract, no dayofweek/timezone skew); percentiles are exact "
    "and mirror quantile_cont at round(6) — swap percentile -> "
    "approx_percentile at 100 TB to bound per-cell value buffers "
    "(cells are fixed at types x 24, but each cell's buffer is "
    "corpus-sized/120 exact). Plan: one scan, bounded-cell agg.",
)
def q_latency_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (F.expr("(ts div 1000) div 3600000000") % 24)
            .cast("long")
            .alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
    )


@register(
    "q_temporal_dq_violations",
    oracle="""
WITH c1 AS (
  SELECT 'ship_before_order' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate < o.o_orderdate
),
c2 AS (
  SELECT 'orphan_lineitem' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
  FROM lineitem l ANTI JOIN orders o ON o.o_orderkey = l.l_orderkey
),
c3 AS (
  SELECT 'nonpositive_quantity' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
  FROM lineitem WHERE l_quantity <= 0
),
c4 AS (
  SELECT 'null_custkey' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
  FROM orders WHERE o_custkey IS NULL
)
SELECT * FROM c1 UNION ALL SELECT * FROM c2
UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
""",
    doc="Temporal / referential data-quality audit in one frame: ships-"
    "before-ordered rows (a JOIN-keyed temporal invariant — the "
    "check generic null/range DQ suites miss), orphan lineitems "
    "(anti-join referential integrity), non-positive quantities, "
    "NULL required keys — the four-row health report a pipeline "
    "gates ingestion on. Each check is an independent exact count; "
    "the temporal check rides the fact-to-fact equi-join (broadcast-"
    "eligible dimension side at real scale via AQE), the orphan "
    "check a LEFT ANTI join — no row ever leaves the executors. "
    "Complements q_dq_expectations (per-column rules) with "
    "CROSS-TABLE rules.",
)
def q_temporal_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    c1 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(F.lit("ship_before_order").alias("check_name"), "n_violations")
    )
    c2 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(F.lit("orphan_lineitem").alias("check_name"), "n_violations")
    )
    c3 = (
        li.filter(F.col("l_quantity") <= 0)
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(F.lit("nonpositive_quantity").alias("check_name"), "n_violations")
    )
    c4 = (
        orders.filter(F.col("o_custkey").isNull())
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(F.lit("null_custkey").alias("check_name"), "n_violations")
    )
    return c1.unionByName(c2).unionByName(c3).unionByName(c4)


@register(
    "q_ma_crossover",
    oracle="""
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
ma AS (
  SELECT event_type, day, cnt,
         CAST(sum(cnt) OVER w7 AS BIGINT) AS s7,
         CAST(count(*) OVER w7 AS BIGINT) AS c7,
         CAST(sum(cnt) OVER w28 AS BIGINT) AS s28,
         CAST(count(*) OVER w28 AS BIGINT) AS c28
  FROM d
  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
         w28 AS (PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
),
lagged AS (
  SELECT event_type, day, s7, c7, s28, c28,
         lag(s7) OVER w AS p_s7, lag(c7) OVER w AS p_c7,
         lag(s28) OVER w AS p_s28, lag(c28) OVER w AS p_c28
  FROM ma
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, CAST(day AS BIGINT) AS day,
       round(CAST(s7 AS DOUBLE) / CAST(c7 AS DOUBLE), 6) AS ma7,
       round(CAST(s28 AS DOUBLE) / CAST(c28 AS DOUBLE), 6) AS ma28
FROM lagged
WHERE s7 * c28 > s28 * c7
  AND p_s7 IS NOT NULL
  AND p_s7 * p_c28 <= p_s28 * p_c7
""",
    doc="Golden-cross detector on daily event volume: days where the "
    "7-day moving average crosses ABOVE the 28-day moving average, "
    "per event type — the trend-shift signal (the same shape flags "
    "adoption inflections or incident recovery, not just stock "
    "charts). RANGE frames on integer epoch days handle calendar "
    "gaps exactly (a missing day shrinks the window rather than "
    "silently stretching it); the cross condition compares "
    "CROSS-MULTIPLIED integer sums (s7*c28 vs s28*c7) so the "
    "detection is pure int64 math — floats appear only in the "
    "reported averages. All windows PARTITIONED by event type "
    "(bounded groups). Int64 budget: s*c < 2^63 up to ~3e17 "
    "events/day-window. Plan: one scan, daily agg, two frame "
    "windows + one lag on the same partitioned sort — Catalyst "
    "evaluates them in a single window stage pair.",
)
def q_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        "event_type", F.expr("(ts div 1000) div 86400000000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    )
    w28 = (
        Window.partitionBy("event_type").orderBy("day").rangeBetween(-27, 0)
    )
    ma = d.select(
        "event_type",
        "day",
        F.sum("cnt").over(w7).cast("long").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("c7"),
        F.sum("cnt").over(w28).cast("long").alias("s28"),
        F.count(F.lit(1)).over(w28).cast("long").alias("c28"),
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    lagged = ma.select(
        "event_type",
        "day",
        "s7",
        "c7",
        "s28",
        "c28",
        F.lag("s7").over(wl).alias("p_s7"),
        F.lag("c7").over(wl).alias("p_c7"),
        F.lag("s28").over(wl).alias("p_s28"),
        F.lag("c28").over(wl).alias("p_c28"),
    )
    return lagged.filter(
        (F.col("s7") * F.col("c28") > F.col("s28") * F.col("c7"))
        & F.col("p_s7").isNotNull()
        & (F.col("p_s7") * F.col("p_c28") <= F.col("p_s28") * F.col("p_c7"))
    ).select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.round(F.col("s7").cast("double") / F.col("c7").cast("double"), 6).alias(
            "ma7"
        ),
        F.round(F.col("s28").cast("double") / F.col("c28").cast("double"), 6).alias(
            "ma28"
        ),
    )


@register(
    "q_duplicate_orders",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS cents,
         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) // 1000000 AS bucket,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
),
pairs AS (
  SELECT a.o_custkey, a.cents
  FROM o a JOIN o b
    ON b.o_custkey = a.o_custkey AND b.bucket = a.bucket
   AND a.o_orderkey < b.o_orderkey
  WHERE abs(a.day - b.day) <= 30
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS cents_at_risk
FROM pairs
""",
    doc="Duplicate-payment detector: pairs of orders by the SAME "
    "customer in the SAME $10k amount bucket within 30 days — the "
    "accounts-payable double-charge screen (exact-amount matching "
    "is the production default; the fixture's continuous synthetic "
    "prices never collide exactly, so the registered variant "
    "matches on the amount bucket to exercise the operator — same "
    "plan either way, the block key just changes). The pair join "
    "is BLOCKED on (custkey, bucket): candidates collapse to "
    "same-key buckets before the date predicate, so the join is an "
    "ordinary keyed shuffle (never n² — the block key is as "
    "selective as the fraud pattern), the same blocking discipline "
    "as q_fuzzy_match_blocked. Amounts integerize to cents, dates "
    "to epoch days; everything through the final count/sum is "
    "exact int64. Plan: one scan, self equi-join on the block key, "
    "residual date filter, 1-row reduce.",
)
def q_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("cents"),
        F.expr(
            "CAST(round(o_totalprice * 100.0, 0) AS BIGINT) div 1000000"
        ).alias("bucket"),
        F.expr(
            "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000)"
        ).alias("day"),
    )
    a = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("bucket").alias("bk"),
        F.col("cents").alias("c"),
        F.col("o_orderkey").alias("ka"),
        F.col("day").alias("da"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("bucket").alias("bk"),
        F.col("o_orderkey").alias("kb"),
        F.col("day").alias("db"),
    )
    pairs = (
        a.join(b, ["ck", "bk"])
        .filter(
            (F.col("ka") < F.col("kb"))
            & (F.abs(F.col("da") - F.col("db")) <= 30)
        )
        .select("ck", "c")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("ck").cast("long").alias("n_customers"),
        F.sum("c").cast("long").alias("cents_at_risk"),
    )


@register(
    "q_revenue_bridge",
    oracle="""
WITH m AS (
  SELECT CAST(date_part('year', l_shipdate) * 12
              + date_part('month', l_shipdate) - 1 AS BIGINT) AS mon,
         CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT) AS qty_c,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0)
                       AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem GROUP BY 1
),
pair AS (
  SELECT a.mon, a.qty_c, a.rev_c, b.qty_c AS pqty_c, b.rev_c AS prev_c
  FROM m a JOIN m b ON b.mon = a.mon - 1
)
SELECT mon,
       rev_c - prev_c AS delta_cents,
       CAST(round((CAST(qty_c AS DOUBLE) - CAST(pqty_c AS DOUBLE))
                  * (CAST(prev_c AS DOUBLE) / CAST(pqty_c AS DOUBLE)), 0)
            AS BIGINT) AS volume_effect_cents,
       rev_c - prev_c
         - CAST(round((CAST(qty_c AS DOUBLE) - CAST(pqty_c AS DOUBLE))
                      * (CAST(prev_c AS DOUBLE) / CAST(pqty_c AS DOUBLE)), 0)
                AS BIGINT) AS rate_mix_effect_cents
FROM pair
""",
    doc="Month-over-month revenue bridge (rate/volume decomposition): "
    "each month's revenue delta splits into a VOLUME effect (quantity "
    "change at last month's realized rate) and the residual RATE/MIX "
    "effect — the FP&A waterfall behind 'did we sell more, or sell "
    "dearer'. Quantities and revenue integerize per row (exact "
    "month sums); the month-over-month pairing is a mon = mon-1 "
    "EQUI-JOIN (adjacent-calendar convention, q_xmr_control_limits' "
    "trick — never a global lag window); the volume effect is one "
    "shared double shape rounded to whole cents on both engines, "
    "and the rate effect is the exact integer residual, so the "
    "bridge RECONCILES: volume + rate = delta to the cent by "
    "construction. Plan: one scan, month agg, tiny self-join.",
)
def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("mon")
    ).agg(
        F.sum(F.round(F.col("l_quantity") * 100.0, 0).cast("long"))
        .cast("long")
        .alias("qty_c"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0,
                0,
            ).cast("long")
        )
        .cast("long")
        .alias("rev_c"),
    )
    a = m.select("mon", "qty_c", "rev_c")
    b = m.select(
        (F.col("mon") + 1).alias("mon"),
        F.col("qty_c").alias("pqty_c"),
        F.col("rev_c").alias("prev_c"),
    )
    pair = a.join(b, "mon")
    vol = F.round(
        (F.col("qty_c").cast("double") - F.col("pqty_c").cast("double"))
        * (F.col("prev_c").cast("double") / F.col("pqty_c").cast("double")),
        0,
    ).cast("long")
    return pair.select(
        "mon",
        (F.col("rev_c") - F.col("prev_c")).alias("delta_cents"),
        vol.alias("volume_effect_cents"),
        (F.col("rev_c") - F.col("prev_c") - vol).alias("rate_mix_effect_cents"),
    )


@register(
    "q_xyz_variability",
    oracle="""
WITH wk AS (
  SELECT l_partkey, epoch_us(l_shipdate) // 604800000000 AS week,
         CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT) AS qty_c
  FROM lineitem GROUP BY 1, 2
),
stats AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n_weeks,
         CAST(sum(qty_c) AS BIGINT) AS s,
         sum(CAST(qty_c AS DECIMAL(18,0)) * CAST(qty_c AS DECIMAL(18,0))) AS ss
  FROM wk GROUP BY 1
),
cv AS (
  SELECT l_partkey, n_weeks,
         round(sqrt(greatest(CAST(n_weeks AS DOUBLE) * CAST(ss AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0.0))
               / CAST(s AS DOUBLE), 6) AS cv
  FROM stats WHERE s > 0 AND n_weeks >= 2
)
SELECT CASE WHEN cv <= 0.5 THEN 'X' WHEN cv <= 0.65 THEN 'Y' ELSE 'Z' END AS xyz_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(CAST(round(cv * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS mean_cv
FROM cv GROUP BY 1
""",
    doc="XYZ demand-variability classification (the companion axis to "
    "q_abc_analysis — together they make the ABC/XYZ stocking "
    "matrix): per-part coefficient of variation of weekly demand, "
    "classed X (steady, cv<=1), Y (variable, cv<=2), Z (erratic). "
    "Weekly quantities integerize to centi-units; the CV assembles "
    "from EXACT moments (n*ss - s^2 in DECIMAL cross-products, the "
    "q_group_regression contract) in one shared double shape, "
    "round(6)-pinned BEFORE the class compare so both engines "
    "classify identically (class cut points 0.5/0.65 sit at the "
    "fixture's CV quartiles — production convention is 0.5/1.0; "
    "the fixture's uniform demand never exceeds CV 1, which would "
    "put 100% in one class and exercise nothing); the per-class mean CV re-integerizes the "
    "rounded values so the reduction is an exact int sum. Plan: two "
    "keyed aggs + a 3-group rollup — a 100 TB single pass.",
)
def q_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        "l_partkey",
        F.expr(
            "(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 604800000000)"
        ).alias("week"),
    ).agg(
        F.sum(F.round(F.col("l_quantity") * 100.0, 0).cast("long"))
        .cast("long")
        .alias("qty_c")
    )
    qd = F.col("qty_c").cast("decimal(18,0)")
    stats = wk.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.sum("qty_c").cast("long").alias("s"),
        F.sum(qd * qd).alias("ss"),
    )
    cv = (
        stats.filter((F.col("s") > 0) & (F.col("n_weeks") >= 2))
        .select(
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("n_weeks").cast("double") * F.col("ss").cast("double")
                        - F.col("s").cast("double") * F.col("s").cast("double"),
                        F.lit(0.0),
                    )
                )
                / F.col("s").cast("double"),
                6,
            ).alias("cv")
        )
    )
    cls = (
        F.when(F.col("cv") <= 0.5, "X").when(F.col("cv") <= 0.65, "Y").otherwise("Z")
    )
    return cv.groupBy(cls.alias("xyz_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(
            F.sum(F.round(F.col("cv") * 1000000.0, 0).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / 1000000.0,
            6,
        ).alias("mean_cv"),
    )


@register(
    "q_product_adoption_curve",
    oracle="""
WITH first_sale AS (
  SELECT l_partkey,
         CAST(min(date_part('year', l_shipdate) * 12
                  + date_part('month', l_shipdate) - 1) AS BIGINT) AS mon
  FROM lineitem GROUP BY 1
),
m AS (SELECT mon, CAST(count(*) AS BIGINT) AS new_parts FROM first_sale GROUP BY 1)
SELECT mon, new_parts,
       CAST(sum(new_parts) OVER (ORDER BY mon
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_parts
FROM m
""",
    doc="Product adoption curve: per month, how many parts ship for "
    "the FIRST time, and the cumulative catalog penetration — the "
    "S-curve behind assortment-growth and long-tail-activation "
    "review. First-sale month is a keyed min over integer month "
    "indexes; the cumulative count is the distributed "
    "global_prefix_sums operator over the ~bounded month frame "
    "(months are few, but the operator keeps the plan single-task-"
    "free on principle — the same query shape applies to per-minute "
    "cohorts where the frame is NOT small). All integer math. Plan: "
    "one scan, two keyed aggs, one range exchange on months.",
)
def q_product_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    li = load_table(spark, sf_dir, "lineitem")
    first_sale = li.groupBy("l_partkey").agg(
        F.min(F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("mon")
    )
    m = first_sale.groupBy("mon").agg(
        F.count(F.lit(1)).cast("long").alias("new_parts")
    )
    out = global_prefix_sums(m, [F.col("mon")], {"new_parts": "cum_parts"})
    return out.select("mon", "new_parts", "cum_parts")


@register(
    "q_churn_hazard_curve",
    oracle="""
WITH lw AS (
  SELECT l_partkey,
         CAST(max(date_part('year', l_shipdate) * 12
                  + date_part('month', l_shipdate) - 1) AS BIGINT) AS last_mon
  FROM lineitem GROUP BY 1
),
mx AS (SELECT CAST(max(last_mon) AS BIGINT) AS max_mon FROM lw),
wk AS (SELECT last_mon AS mon, CAST(count(*) AS BIGINT) AS n_last FROM lw GROUP BY 1),
sw AS (
  SELECT mon, n_last,
         CAST(sum(n_last) OVER (ORDER BY mon DESC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
  FROM wk
)
SELECT mon,
       CAST(CASE WHEN mon < max_mon THEN n_last ELSE 0 END AS BIGINT) AS n_retired,
       n_at_risk,
       round(CAST(CASE WHEN mon < max_mon THEN n_last ELSE 0 END AS DOUBLE)
             / CAST(n_at_risk AS DOUBLE), 6) AS hazard
FROM sw, mx
""",
    doc="Discrete-time retirement hazard curve over the part catalog: "
    "per month, parts whose LAST shipment falls in that month "
    "(retired) over parts still at risk (last shipment then or "
    "later) — the survival-analysis readout behind assortment-decay "
    "and end-of-life planning; parts shipping in the corpus final "
    "month are CENSORED, not retired (standard right-censoring — "
    "without it the last month reads a meaningless hazard of 1.0). "
    "The same query re-bases onto user churn by swapping the key "
    "and the time unit (the fixture events span 30 days with every "
    "user active at the end — zero churn signal, so the part "
    "lifecycle, spanning ~7 years, is the variant that exercises "
    "the operator). The at-risk denominator is a suffix count = "
    "running sum over months DESCENDING via the distributed "
    "global_prefix_sums operator (a descending order key is just a "
    "different range exchange — no single-task window). All integer "
    "math; the hazard ratio is the only float. Plan: per-part max "
    "agg, monthly rollup, one range exchange, 1-row broadcast.",
)
def q_churn_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    li = load_table(spark, sf_dir, "lineitem")
    lw = li.groupBy("l_partkey").agg(
        F.max(F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("last_mon")
    )
    mx = lw.agg(F.max("last_mon").cast("long").alias("max_mon"))
    wk = lw.groupBy(F.col("last_mon").alias("mon")).agg(
        F.count(F.lit(1)).cast("long").alias("n_last")
    )
    sw = global_prefix_sums(wk, [F.col("mon").desc()], {"n_last": "n_at_risk"})
    retired = F.when(F.col("mon") < F.col("max_mon"), F.col("n_last")).otherwise(0)
    return sw.crossJoin(F.broadcast(mx)).select(
        "mon",
        retired.cast("long").alias("n_retired"),
        "n_at_risk",
        F.round(
            retired.cast("double") / F.col("n_at_risk").cast("double"), 6
        ).alias("hazard"),
    )


@register(
    "q_dau_wau_stickiness",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day,
         epoch_us(ts) // 604800000000 AS week
  FROM events
),
dau AS (SELECT week, day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY 1, 2),
wau AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau FROM d GROUP BY 1),
dav AS (
  SELECT week, CAST(sum(dau) AS BIGINT) AS dau_sum,
         CAST(count(*) AS BIGINT) AS n_days
  FROM dau GROUP BY 1
)
SELECT w.week, w.wau,
       round(CAST(v.dau_sum AS DOUBLE) / CAST(v.n_days AS DOUBLE), 6) AS avg_dau,
       round(CAST(v.dau_sum AS DOUBLE) / CAST(v.n_days AS DOUBLE)
             / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM wau w JOIN dav v USING (week)
""",
    doc="DAU/WAU stickiness per week: weekly actives, average daily "
    "actives, and their ratio — the engagement-depth metric every "
    "growth dashboard leads with (stickiness ~1/7 = once-a-week "
    "visitors, ~1 = daily habit). The (user, day) distinct collapse "
    "happens ONCE and feeds both numerator and denominator; day and "
    "week are pure integer epoch math (UTC contract — no calendar "
    "functions to disagree on). Counts exact int64; the two ratios "
    "are the only floats. Plan: one distinct agg (the only "
    "corpus-sized shuffle), two bounded rollups, a week-keyed join.",
)
def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        "user_id",
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        F.expr("(ts div 1000) div 604800000000").alias("week"),
    ).distinct()
    dau = d.groupBy("week", "day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    wau = d.groupBy("week").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    dav = dau.groupBy("week").agg(
        F.sum("dau").cast("long").alias("dau_sum"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    avg_dau = F.col("dau_sum").cast("double") / F.col("n_days").cast("double")
    return wau.join(dav, "week").select(
        "week",
        "wau",
        F.round(avg_dau, 6).alias("avg_dau"),
        F.round(avg_dau / F.col("wau").cast("double"), 6).alias("stickiness"),
    )


@register(
    "q_mann_whitney_u",
    oracle="""
WITH s AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
         CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
vg AS (
  SELECT v, CAST(sum(g) AS BIGINT) AS n1v,
         CAST(count(*) AS BIGINT) AS nv
  FROM s GROUP BY 1
),
pre AS (
  SELECT v, n1v, nv,
         CAST(coalesce(sum(nv) OVER (ORDER BY v
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT) AS below
  FROM vg
),
r AS (
  -- average rank of the tied block at value v, times 2 to stay integer:
  -- ranks below+1 .. below+nv  ->  avg*2 = 2*below + nv + 1
  SELECT CAST(sum(n1v * (2 * below + nv + 1)) AS BIGINT) AS r1_x2,
         CAST(sum(n1v) AS BIGINT) AS n1,
         CAST(sum(nv - n1v) AS BIGINT) AS n2
  FROM pre
)
SELECT n1, n2,
       round((CAST(r1_x2 AS DOUBLE) / 2.0
              - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0), 6) AS u_stat,
       round(((CAST(r1_x2 AS DOUBLE) / 2.0
               - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0)
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) / 12.0), 6)
         AS z_score
FROM r
""",
    doc="Mann-Whitney U test (two-sample rank test) on order values "
    "between the BUILDING and MACHINERY segments: the nonparametric "
    "'is one distribution shifted' answer that, unlike the t-test, "
    "survives the heavy-tailed money distributions real revenue "
    "data has. NO per-row ranking exists in the plan: values "
    "collapse to tied-value groups first, each block's average rank "
    "derives from the block's prefix count (avg*2 = 2*below+nv+1 — "
    "kept x2 so every rank-sum term stays integer), and the prefix "
    "runs over the VALUE groups (bounded by distinct values), a "
    "partitioned-window-free cumulative via ordered frame on the "
    "grouped frame. Rank sums are exact int64; U and the normal-"
    "approx z assemble in one shared double shape (ties correction "
    "omitted — documented; at cents granularity tie mass is "
    "negligible). Plan: broadcast customer join, value-group agg, "
    "one tiny ordered frame, 1-row reduce.",
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    s = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("g"),
            F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("v"),
        )
    )
    vg = s.groupBy("v").agg(
        F.sum("g").cast("long").alias("n1v"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    pre0 = global_prefix_sums(vg, [F.col("v")], {"nv": "incl"})
    pre = pre0.withColumn("below", (F.col("incl") - F.col("nv")).cast("long"))
    r = pre.agg(
        F.sum(F.col("n1v") * (F.lit(2) * F.col("below") + F.col("nv") + F.lit(1)))
        .cast("long")
        .alias("r1_x2"),
        F.sum("n1v").cast("long").alias("n1"),
        F.sum(F.col("nv") - F.col("n1v")).cast("long").alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u = F.col("r1_x2").cast("double") / F.lit(2.0) - n1d * (n1d + F.lit(1.0)) / F.lit(
        2.0
    )
    z = (u - n1d * n2d / F.lit(2.0)) / F.sqrt(
        n1d * n2d * (n1d + n2d + F.lit(1.0)) / F.lit(12.0)
    )
    return r.select("n1", "n2", F.round(u, 6).alias("u_stat"), F.round(z, 6).alias("z_score"))


@register(
    "q_entity_clusters",
    oracle="""
WITH RECURSIVE p AS (
  SELECT p_partkey, p_name FROM part WHERE p_partkey < 2000
),
blocked AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, a.p_name AS na, b.p_name AS nb
  FROM p a JOIN p b
    ON substr(a.p_name, 1, 4) = substr(b.p_name, 1, 4)
   AND abs(length(a.p_name) - length(b.p_name)) <= 2 AND a.p_partkey < b.p_partkey
  UNION
  SELECT a.p_partkey, b.p_partkey, a.p_name, b.p_name
  FROM p a JOIN p b
    ON substr(a.p_name, -4) = substr(b.p_name, -4)
   AND abs(length(a.p_name) - length(b.p_name)) <= 2 AND a.p_partkey < b.p_partkey
),
fp AS (SELECT id_a, id_b FROM blocked WHERE na <> nb AND levenshtein(na, nb) <= 1),
edges AS (SELECT id_a AS a, id_b AS b FROM fp UNION ALL SELECT id_b, id_a FROM fp),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
),
comp AS (SELECT n, CAST(min(m) AS BIGINT) AS component FROM reach GROUP BY 1)
SELECT component, CAST(count(*) AS BIGINT) AS n_members
FROM comp GROUP BY 1
""",
    doc="End-to-end entity resolution: blocked fuzzy candidate pairs "
    "(q_fuzzy_match_blocked's prefix/suffix blocking + exact "
    "Levenshtein<=1 verify) feed connected components, turning "
    "pairwise matches into entity GROUPS — the full record-linkage "
    "pipeline (match -> cluster -> canonical id = min member) that "
    "MDM / customer-360 systems run, composed from two operators "
    "this engine already ships. Spark resolves components via "
    "iterative min-label propagation with the star-contraction "
    "fallback (O(log n) rounds on long chains — edit-distance "
    "graphs chain transitively, exactly the case the fallback "
    "exists for); the oracle replays closure as a recursive CTE. "
    "All integer ids/counts. Plan: two blocked equi-joins, "
    "candidate-only Levenshtein, label-propagation joins bounded "
    "by component diameter.",
)
def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 2000)
        .select("p_partkey", "p_name")
    )
    a = part.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("na"),
        F.substring("p_name", 1, 4).alias("pre"),
        F.length("p_name").alias("la"),
    )
    b = part.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("nb"),
        F.substring("p_name", 1, 4).alias("pre"),
        F.length("p_name").alias("lb"),
    )
    blocked_pre = a.join(b, "pre").filter(
        (F.abs(F.col("la") - F.col("lb")) <= 2) & (F.col("id_a") < F.col("id_b"))
    )
    a2 = a.drop("pre").withColumn("suf", F.expr("substr(na, -4)"))
    b2 = b.drop("pre").withColumn("suf", F.expr("substr(nb, -4)"))
    blocked_suf = a2.join(b2, "suf").filter(
        (F.abs(F.col("la") - F.col("lb")) <= 2) & (F.col("id_a") < F.col("id_b"))
    )
    blocked = blocked_pre.select("id_a", "id_b", "na", "nb").unionByName(
        blocked_suf.select("id_a", "id_b", "na", "nb")
    ).distinct()
    fp = blocked.filter(
        (F.col("na") != F.col("nb")) & (F.levenshtein("na", "nb") <= 1)
    ).select("id_a", "id_b")
    comp = DD.connected_components(fp)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )


@register(
    "q_lorenz_deciles",
    oracle="""
WITH rev AS (
  SELECT c.c_custkey,
         CAST(coalesce(sum(CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT)), 0)
              AS BIGINT) AS cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_cust, CAST(sum(cents) AS BIGINT) AS tot FROM rev),
r AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents, c_custkey) AS BIGINT) AS rn
  FROM rev
),
dec AS (
  SELECT CASE WHEN rn <= (n_cust % 10) * (n_cust // 10 + 1)
              THEN (rn - 1) // (n_cust // 10 + 1) + 1
              ELSE (n_cust % 10)
                   + (rn - (n_cust % 10) * (n_cust // 10 + 1) - 1) // (n_cust // 10) + 1
         END AS decile, cents
  FROM r, n
),
g AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_cust_d,
         CAST(sum(cents) AS BIGINT) AS cents_d
  FROM dec GROUP BY 1
),
c AS (
  SELECT decile, n_cust_d, cents_d,
         CAST(sum(cents_d) OVER (ORDER BY decile
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM g
)
SELECT CAST(decile AS BIGINT) AS decile, n_cust_d AS n_customers, cents_d AS cents,
       round(CAST(cents_d AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS rev_share,
       round(CAST(cum_cents AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share
FROM c, n
""",
    doc="Lorenz curve by customer revenue deciles: customers ranked "
    "ascending by lifetime revenue (zero-order customers included "
    "at 0), split into 10 ntile buckets, each decile's revenue "
    "share and the cumulative share — the curve q_gini_revenue "
    "summarizes to one number, in the table form a pricing review "
    "reads ('the top decile carries X%'). The global rank is "
    "global_row_number (range exchange, no single-task window), "
    "the decile is ntile_from_position arithmetic on the exact "
    "position (byte-matching ANSI ntile bucket sizing, spelled out "
    "in the oracle), and the 10-row cumulative rides "
    "global_prefix_sums. Revenue is exact cents end to end; the "
    "two shares are the only floats. Plan: outer-join agg, one "
    "range exchange, bounded rollup.",
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import (
        global_prefix_sums,
        global_row_number,
        ntile_from_position,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("cents"),
    )
    rev = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("cents"))
    )
    n = rev.agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("tot"),
    )
    r = global_row_number(rev, [F.col("cents"), F.col("c_custkey")], out_col="rn")
    dec = r.crossJoin(F.broadcast(n)).select(
        ntile_from_position(F.col("rn"), F.col("n_cust"), 10)
        .cast("long")
        .alias("decile"),
        "cents",
        "tot",
    )
    g = dec.groupBy("decile", "tot").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
    )
    c = global_prefix_sums(g, [F.col("decile")], {"cents": "cum_cents"})
    return c.select(
        "decile",
        "n_customers",
        "cents",
        F.round(F.col("cents").cast("double") / F.col("tot").cast("double"), 6).alias(
            "rev_share"
        ),
        F.round(
            F.col("cum_cents").cast("double") / F.col("tot").cast("double"), 6
        ).alias("cum_share"),
    )


@register(
    "q_abc_migration",
    oracle="""
WITH li AS (
  SELECT l_partkey,
         CAST(date_part('year', l_shipdate) * 12
              + date_part('month', l_shipdate) - 1 AS BIGINT) AS mon,
         CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT) AS c0
  FROM lineitem
),
mid AS (SELECT (min(mon) + max(mon) + 1) // 2 AS m FROM li),
rev AS (
  SELECT CASE WHEN mon < m THEN 0 ELSE 1 END AS half, l_partkey,
         CAST(sum(c0) AS BIGINT) AS cents
  FROM li, mid GROUP BY 1, 2
),
tot AS (SELECT half, CAST(sum(cents) AS BIGINT) AS tot FROM rev GROUP BY 1),
c AS (
  SELECT half, l_partkey, cents,
         CAST(sum(cents) OVER (PARTITION BY half ORDER BY cents DESC, l_partkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM rev
),
cls AS (
  SELECT c.half, c.l_partkey,
         CASE WHEN c.cum * 5 <= t.tot * 4 THEN 'A'
              WHEN c.cum * 20 <= t.tot * 19 THEN 'B'
              ELSE 'C' END AS cl
  FROM c JOIN tot t USING (half)
),
m AS (
  SELECT coalesce(a.l_partkey, b.l_partkey) AS pk,
         coalesce(a.cl, '-') AS class_h1, coalesce(b.cl, '-') AS class_h2
  FROM (SELECT l_partkey, cl FROM cls WHERE half = 0) a
  FULL JOIN (SELECT l_partkey, cl FROM cls WHERE half = 1) b
    ON b.l_partkey = a.l_partkey
)
SELECT class_h1, class_h2, CAST(count(*) AS BIGINT) AS n_parts
FROM m GROUP BY 1, 2
""",
    doc="ABC class migration matrix between the first and second half "
    "of the corpus timeline: each part's Pareto class (A/B/C, "
    "q_abc_analysis' exact integer thresholds) computed per half, "
    "full-outer-joined into a transition matrix ('-' = absent that "
    "half) — the stability audit that says whether last year's A-"
    "list still deserves the premium slotting, and the classic "
    "input to safety-stock re-tiering. The per-half cumulative uses "
    "a PARTITIONED window (two bounded groups — partitioning by "
    "half is what makes the textbook global cumsum scale here; at "
    "one-half granularity per group the range exchange of the "
    "global operator is unnecessary). All class math is exact "
    "int64 cross-multiplication. Plan: one scan, per-(half, part) "
    "agg, per-half window, full outer join on partkey, 4x4 rollup.",
)
def q_abc_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li0 = load_table(spark, sf_dir, "lineitem")
    li = li0.select(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("mon"),
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0, 0
        )
        .cast("long")
        .alias("c0"),
    )
    mid = li.agg(
        F.expr("(min(mon) + max(mon) + 1) div 2").cast("long").alias("m")
    )
    rev = (
        li.crossJoin(F.broadcast(mid))
        .groupBy(
            F.when(F.col("mon") < F.col("m"), 0).otherwise(1).alias("half"),
            "l_partkey",
        )
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    tot = rev.groupBy("half").agg(F.sum("cents").cast("long").alias("tot"))
    w = (
        Window.partitionBy("half")
        .orderBy(F.col("cents").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = rev.withColumn("cum", F.sum("cents").over(w).cast("long"))
    cls = c.join(tot, "half").select(
        "half",
        "l_partkey",
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
        .alias("cl"),
    )
    a = cls.filter(F.col("half") == 0).select(
        F.col("l_partkey").alias("pk_a"), F.col("cl").alias("cl_a")
    )
    b = cls.filter(F.col("half") == 1).select(
        F.col("l_partkey").alias("pk_b"), F.col("cl").alias("cl_b")
    )
    m = a.join(b, a["pk_a"] == b["pk_b"], "full").select(
        F.coalesce(F.col("cl_a"), F.lit("-")).alias("class_h1"),
        F.coalesce(F.col("cl_b"), F.lit("-")).alias("class_h2"),
    )
    return m.groupBy("class_h1", "class_h2").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )


@register(
    "q_theil_index",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS tot FROM rev
),
t AS (
  SELECT CAST(round((CAST(cents AS DOUBLE) / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))
                    * ln(CAST(cents AS DOUBLE) / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 1000000.0, 0) AS BIGINT) AS term_micro, n
  FROM rev, tot WHERE cents > 0
)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       round(CAST(sum(term_micro) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 1000000.0, 6)
         AS theil_t
FROM t
""",
    doc="Theil T inequality index over customer revenue: (1/n) sum "
    "(x/mu) ln(x/mu) — the entropy-based inequality measure that, "
    "unlike Gini (q_gini_revenue) and HHI (q_herfindahl_suppliers), "
    "DECOMPOSES additively into within-group + between-group terms, "
    "which is why segmentation studies report it. Per-row terms "
    "integerize to micro-units against a 1-row (n, total) broadcast "
    "mean, so the reduction is an exact int64 sum (order-"
    "independent); the single division at the end is the only "
    "uncontrolled float. Zero-revenue customers are excluded (x ln "
    "x -> 0 limit, documented). Plan: one keyed agg, 1-row "
    "broadcast, map-side term, 1-row reduce.",
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = rev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("tot"),
    )
    mu = F.col("tot").cast("double") / F.col("n").cast("double")
    ratio = F.col("cents").cast("double") / mu
    t = (
        rev.crossJoin(F.broadcast(tot))
        .filter(F.col("cents") > 0)
        .select(
            F.round(ratio * F.log(ratio) * 1000000.0, 0)
            .cast("long")
            .alias("term_micro"),
            "n",
        )
    )
    return t.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(
            F.sum("term_micro").cast("double")
            / F.max("n").cast("double")
            / 1000000.0,
            6,
        ).alias("theil_t"),
    )


@register(
    "q_ks_two_sample",
    oracle="""
WITH s AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
         CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
vg AS (
  SELECT v, CAST(sum(g) AS BIGINT) AS d1, CAST(sum(1 - g) AS BIGINT) AS d2
  FROM s GROUP BY 1
),
cum AS (
  SELECT v,
         CAST(sum(d1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
         CAST(sum(d2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2
  FROM vg
),
n AS (SELECT CAST(sum(d1) AS BIGINT) AS n1, CAST(sum(d2) AS BIGINT) AS n2 FROM vg),
d AS (
  SELECT v, abs(c1 * n2 - c2 * n1) AS d_scaled, c1, c2, n1, n2
  FROM cum, n
)
SELECT n1, n2,
       round(CAST(d_scaled AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
         AS ks_d,
       CAST(v AS BIGINT) AS at_value_cents,
       round(sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             * 1.3581, 6) AS crit_05
FROM d ORDER BY d_scaled DESC, v LIMIT 1
""",
    doc="Two-sample Kolmogorov-Smirnov test on order values between "
    "the BUILDING and MACHINERY segments: D = max |F1 - F2|, the "
    "distribution-shape companion to q_mann_whitney_u (MW detects "
    "location shift; KS also catches variance/shape differences). "
    "The empirical CDF gap is computed on VALUE GROUPS with the "
    "cumulative via ordered prefix sums, and the supremum compares "
    "CROSS-MULTIPLIED integers |c1*n2 - c2*n1| — the entire argmax "
    "is exact int64, floats appear only in the reported D and the "
    "1.358*sqrt((n1+n2)/(n1*n2)) alpha=.05 critical value (reject "
    "if D > crit). The argmax is orderBy+limit with a value "
    "tiebreak. Spark side uses global_prefix_sums for the CDF (no "
    "single-task window). Plan: broadcast dim join, value-group "
    "agg, one range exchange, TakeOrderedAndProject.",
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    s = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("g"),
            F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("v"),
        )
    )
    vg = s.groupBy("v").agg(
        F.sum("g").cast("long").alias("d1"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("d2"),
    )
    cum = global_prefix_sums(vg, [F.col("v")], {"d1": "c1", "d2": "c2"})
    n = vg.agg(
        F.sum("d1").cast("long").alias("n1"), F.sum("d2").cast("long").alias("n2")
    )
    d = cum.crossJoin(F.broadcast(n)).select(
        "v",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias(
            "d_scaled"
        ),
        "n1",
        "n2",
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    return (
        d.orderBy(F.col("d_scaled").desc(), "v")
        .limit(1)
        .select(
            "n1",
            "n2",
            F.round(F.col("d_scaled").cast("double") / (n1d * n2d), 6).alias("ks_d"),
            F.col("v").cast("long").alias("at_value_cents"),
            F.round(
                F.sqrt((n1d + n2d) / (n1d * n2d)) * F.lit(1.3581), 6
            ).alias("crit_05"),
        )
    )


@register(
    "q_anova_f",
    oracle="""
WITH s AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
g AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
         sum(CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0))) AS svv
  FROM s GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(sv) AS BIGINT) AS gsv,
         sum(svv) AS gsvv
  FROM g
),
ss AS (
  SELECT k, nn,
         (SELECT sum(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) FROM g)
           - CAST(gsv AS DOUBLE) * CAST(gsv AS DOUBLE) / CAST(nn AS DOUBLE) AS ss_between,
         CAST(gsvv AS DOUBLE)
           - (SELECT sum(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) FROM g)
           AS ss_within
  FROM tot
)
SELECT k, nn AS n_total,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(nn - k AS BIGINT) AS df_within,
       round((ss_between / (CAST(k AS DOUBLE) - 1.0))
             / nullif(ss_within / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)), 0.0), 6)
         AS f_stat
FROM ss
""",
    doc="One-way ANOVA F statistic for order value across the five "
    "market segments: between-group vs within-group variance — the "
    "k-group parametric screen that complements q_mann_whitney_u / "
    "q_ks_two_sample's 2-group nonparametrics ('does segment matter "
    "AT ALL before pairwise drilldowns'). Every sum is exact: group "
    "sums in int64 cents, squared sums in DECIMAL(18)xDECIMAL(18) "
    "cross-products (per-row squares ~1e13 fit; int64 would wrap on "
    "the group SUM), and the sums-of-squares identity ss_b = sum "
    "sv_g^2/n_g - gsv^2/N assembles in one shared double shape from "
    "those exact operands — no per-row float accumulates anywhere. "
    "Plan: broadcast dim join, 5-group agg, 1-row reduce.",
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    s = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("v"),
    )
    vd = F.col("v").cast("decimal(18,0)")
    g = s.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(vd * vd).alias("svv"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("sv").cast("long").alias("gsv"),
        F.sum("svv").alias("gsvv"),
        F.sum(
            F.col("sv").cast("double") * F.col("sv").cast("double")
            / F.col("n").cast("double")
        ).alias("sqn"),
    )
    kd = F.col("k").cast("double")
    nnd = F.col("nn").cast("double")
    ss_between = F.col("sqn") - F.col("gsv").cast("double") * F.col("gsv").cast(
        "double"
    ) / nnd
    ss_within = F.col("gsvv").cast("double") - F.col("sqn")
    return tot.select(
        "k",
        F.col("nn").alias("n_total"),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("nn") - F.col("k")).cast("long").alias("df_within"),
        F.round(
            (ss_between / (kd - F.lit(1.0)))
            / F.nullif(ss_within / (nnd - kd), F.lit(0.0)),
            6,
        ).alias("f_stat"),
    )


@register(
    "q_cramers_v",
    oracle="""
WITH s AS (
  SELECT event_type AS a,
         CAST(((epoch_us(ts) // 86400000000) + 3) % 7 AS BIGINT) AS b
  FROM events
),
cell AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1, 2),
ra AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM cell GROUP BY 1),
rb AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM cell GROUP BY 1),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         (SELECT CAST(count(*) AS BIGINT) FROM ra) AS r,
         (SELECT CAST(count(*) AS BIGINT) FROM rb) AS c
  FROM cell
),
chi AS (
  SELECT CAST(sum(CAST(round(
           pow(CAST(cell.n AS DOUBLE)
               - CAST(ra.na AS DOUBLE) * CAST(rb.nb AS DOUBLE) / CAST(tot.nn AS DOUBLE), 2)
           / (CAST(ra.na AS DOUBLE) * CAST(rb.nb AS DOUBLE) / CAST(tot.nn AS DOUBLE))
           * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS chi2_micro
  FROM cell JOIN ra USING (a) JOIN rb USING (b), tot
)
SELECT nn AS n_events, r AS n_rows_dim, c AS n_cols_dim,
       round(CAST(chi2_micro AS DOUBLE) / 1000000.0, 6) AS chi2,
       round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
                  / (CAST(nn AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE))), 6)
         AS cramers_v
FROM chi, tot
""",
    doc="Cramér's V association between event type and day-of-week: "
    "the chi-square contingency test normalized to [0,1] — the "
    "categorical-vs-categorical effect size ('is error traffic a "
    "weekend thing') that complements the numeric-vs-numeric "
    "correlation family. Expected cell counts derive from exact "
    "int64 marginals in one shared double shape; each cell's chi2 "
    "term integerizes to micro-units so the sum over cells is an "
    "exact int64 reduction (order-independent across the 35 cells "
    "and at any cell cardinality); day-of-week is the portable "
    "(epoch_day+3) mod 7. Plan: one scan, bounded cell agg, two "
    "marginal rollups, 1-row reduce.",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    s = events.select(
        F.col("event_type").alias("a"),
        (F.expr("(((ts div 1000) div 86400000000) + 3) % 7")).cast("long").alias("b"),
    )
    cell = s.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ra = cell.groupBy("a").agg(F.sum("n").cast("long").alias("na"))
    rb = cell.groupBy("b").agg(F.sum("n").cast("long").alias("nb"))
    tot = cell.agg(F.sum("n").cast("long").alias("nn"))
    dims = ra.agg(F.count(F.lit(1)).cast("long").alias("r")).crossJoin(
        F.broadcast(rb.agg(F.count(F.lit(1)).cast("long").alias("c")))
    )
    expected = (
        F.col("na").cast("double")
        * F.col("nb").cast("double")
        / F.col("nn").cast("double")
    )
    term = F.round(
        F.pow(F.col("n").cast("double") - expected, F.lit(2)) / expected * 1000000.0,
        0,
    ).cast("long")
    chi = (
        cell.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(term).cast("long").alias("chi2_micro"))
    )
    return (
        chi.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dims))
        .select(
            F.col("nn").alias("n_events"),
            F.col("r").alias("n_rows_dim"),
            F.col("c").alias("n_cols_dim"),
            F.round(F.col("chi2_micro").cast("double") / 1000000.0, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2_micro").cast("double")
                    / 1000000.0
                    / (
                        F.col("nn").cast("double")
                        * (F.least(F.col("r"), F.col("c")) - 1).cast("double")
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


@register(
    "q_naive_forecast_mape",
    oracle="""
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
j AS (
  SELECT 'naive_1d' AS model, a.cnt AS actual, b.cnt AS forecast
  FROM d a JOIN d b ON b.day = a.day - 1
  UNION ALL
  SELECT 'seasonal_7d' AS model, a.cnt AS actual, b.cnt AS forecast
  FROM d a JOIN d b ON b.day = a.day - 7
),
e AS (
  SELECT model, CAST(abs(actual - forecast) AS BIGINT) AS ae,
         CAST(round(abs(actual - forecast) * 1000000.0
                    / CAST(nullif(actual, 0) AS DOUBLE), 0) AS BIGINT) AS ape_micro
  FROM j
)
SELECT model, CAST(count(*) AS BIGINT) AS n_days,
       round(CAST(sum(ae) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mae,
       round(CAST(sum(ape_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1000000.0, 6) AS mape
FROM e GROUP BY 1
""",
    doc="Forecast-baseline scorecard: MAE and MAPE of the naive "
    "(yesterday) and seasonal-naive (same weekday last week) "
    "forecasts of daily event volume — the floor every real "
    "forecasting model must beat (q_holt_linear produces forecasts; "
    "this is the EVAL side, and seasonal-naive beating naive-1d is "
    "the standard evidence that weekly seasonality is real, cf. "
    "q_dow_seasonality). The day-offset pairing is an equi-join "
    "(adjacent-calendar convention — gap days simply contribute no "
    "pair), absolute errors are exact int64, per-day percentage "
    "errors integerize to micro-units before the mean so both "
    "reductions are exact sums. Plan: one scan, daily agg, two "
    "self equi-joins, 2-group rollup.",
)
def q_naive_forecast_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        F.expr("(ts div 1000) div 86400000000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))

    def lagged(model: str, off: int):
        a = d.select(F.col("day").alias("day"), F.col("cnt").alias("actual"))
        b = d.select(
            (F.col("day") + off).alias("day"), F.col("cnt").alias("forecast")
        )
        return a.join(b, "day").select(
            F.lit(model).alias("model"), "actual", "forecast"
        )

    j = lagged("naive_1d", 1).unionByName(lagged("seasonal_7d", 7))
    e = j.select(
        "model",
        F.abs(F.col("actual") - F.col("forecast")).cast("long").alias("ae"),
        F.round(
            F.abs(F.col("actual") - F.col("forecast")).cast("double")
            * 1000000.0
            / F.nullif(F.col("actual"), F.lit(0)).cast("double"),
            0,
        )
        .cast("long")
        .alias("ape_micro"),
    )
    return e.groupBy("model").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.sum("ae").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mae"),
        F.round(
            F.sum("ape_micro").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 1000000.0,
            6,
        ).alias("mape"),
    )


@register(
    "q_weighted_median_price",
    oracle="""
WITH s AS (
  SELECT CAST(round(l_extendedprice / l_quantity * 100.0, 0) AS BIGINT) AS unit_cents,
         CAST(round(l_quantity * 100.0, 0) AS BIGINT) AS w
  FROM lineitem WHERE l_quantity > 0
),
vg AS (SELECT unit_cents, CAST(sum(w) AS BIGINT) AS w FROM s GROUP BY 1),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM vg),
c AS (
  SELECT unit_cents, w,
         CAST(sum(w) OVER (ORDER BY unit_cents
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
  FROM vg
)
SELECT unit_cents AS weighted_median_unit_cents, tw AS total_weight_centi
FROM c, tot
WHERE cw * 2 >= tw
ORDER BY unit_cents LIMIT 1
""",
    doc="Quantity-weighted median unit price: the price point where "
    "half the shipped VOLUME is cheaper — the procurement statistic "
    "an unweighted median misstates whenever big orders price "
    "differently than small ones. Prices and weights integerize to "
    "centi-units; the weighted median is the first value whose "
    "running weight crosses half the total — an EXACT integer "
    "cross-multiply (cw*2 >= tw) over the value-grouped cumulative "
    "from global_prefix_sums, selected by orderBy+limit. No floats "
    "anywhere in the result. Plan: one scan, value-group agg, one "
    "range exchange, TakeOrderedAndProject.",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    s = li.select(
        F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100.0, 0)
        .cast("long")
        .alias("unit_cents"),
        F.round(F.col("l_quantity") * 100.0, 0).cast("long").alias("w"),
    )
    vg = s.groupBy("unit_cents").agg(F.sum("w").cast("long").alias("w"))
    tot = vg.agg(F.sum("w").cast("long").alias("tw"))
    c = global_prefix_sums(vg, [F.col("unit_cents")], {"w": "cw"})
    return (
        c.crossJoin(F.broadcast(tot))
        .filter(F.col("cw") * 2 >= F.col("tw"))
        .orderBy("unit_cents")
        .limit(1)
        .select(
            F.col("unit_cents").alias("weighted_median_unit_cents"),
            F.col("tw").alias("total_weight_centi"),
        )
    )


@register(
    "q_theil_sen_trend",
    oracle="""
WITH m AS (
  SELECT CAST(date_part('year', l_shipdate) * 12
              + date_part('month', l_shipdate) - 1 AS BIGINT) AS mon,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0)
                       AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem GROUP BY 1
),
pairs AS (
  SELECT (b.rev_c - a.rev_c) * 1.0 / (b.mon - a.mon) AS slope
  FROM m a JOIN m b ON b.mon > a.mon
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         round(quantile_cont(slope, 0.5), 6) AS theil_sen_cents_per_month
  FROM pairs
)
SELECT n_pairs, theil_sen_cents_per_month FROM s
""",
    doc="Theil-Sen robust trend of monthly revenue: the MEDIAN of all "
    "pairwise month-to-month slopes — the trend estimator with a "
    "29% breakdown point (one crazy quarter cannot move it, unlike "
    "the OLS slope in q_group_regression's family). The O(m^2) pair "
    "enumeration runs on the MONTH-AGGREGATED frame (82 months -> "
    "~3.3k pairs — bounded by the calendar, not the corpus; at any "
    "data size the fact scan collapses to months first), slopes are "
    "exact-int differences divided once in identical shape, and the "
    "median is the exact percentile contract (quantile_cont mirror "
    "at round(6)). Plan: one scan, month agg, tiny self-join, 1-row "
    "reduce.",
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("mon")
    ).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0,
                0,
            ).cast("long")
        )
        .cast("long")
        .alias("rev_c")
    )
    a = m.select(F.col("mon").alias("ma"), F.col("rev_c").alias("ra"))
    b = m.select(F.col("mon").alias("mb"), F.col("rev_c").alias("rb"))
    pairs = a.join(b, F.col("mb") > F.col("ma")).select(
        (
            (F.col("rb") - F.col("ra")).cast("double")
            * F.lit(1.0)
            / (F.col("mb") - F.col("ma")).cast("double")
        ).alias("slope")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias(
            "theil_sen_cents_per_month"
        ),
    )


@register(
    "q_seasonal_strength",
    oracle="""
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s,
         sum(CAST(cnt AS DECIMAL(18,0)) * CAST(cnt AS DECIMAL(18,0))) AS ss
  FROM d
),
dw AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS nd, CAST(sum(cnt) AS BIGINT) AS sd
  FROM d GROUP BY 1
),
bet AS (
  SELECT sum(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE)) AS sq
  FROM dw
)
SELECT n AS n_days,
       round((sq - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / nullif(CAST(ss AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE),
                      0.0), 6) AS seasonal_strength
FROM tot, bet
""",
    doc="Weekly seasonality strength of daily event volume: the share "
    "of day-to-day variance explained by the day-of-week profile — "
    "the R^2 of the ANOVA decomposition (q_anova_f's identity with "
    "dow as the factor), the one-number answer to 'should the "
    "forecast be seasonal' that q_naive_forecast_mape then confirms "
    "empirically. Daily counts are exact int64, squared sums ride "
    "DECIMAL(18) cross-products, and both sums of squares assemble "
    "in one shared double shape from exact operands; dow is the "
    "portable (epoch_day+3) mod 7. Plan: one scan, daily agg, "
    "7-group rollup, 1-row reduce.",
)
def q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        F.expr("(((ts div 1000) div 86400000000) + 3) % 7").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cd = F.col("cnt").cast("decimal(18,0)")
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(cd * cd).alias("ss"),
    )
    dw = d.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("cnt").cast("long").alias("sd"),
    )
    bet = dw.agg(
        F.sum(
            F.col("sd").cast("double")
            * F.col("sd").cast("double")
            / F.col("nd").cast("double")
        ).alias("sq")
    )
    sd, nd = F.col("s").cast("double"), F.col("n").cast("double")
    return tot.crossJoin(F.broadcast(bet)).select(
        F.col("n").alias("n_days"),
        F.round(
            (F.col("sq") - sd * sd / nd)
            / F.nullif(F.col("ss").cast("double") - sd * sd / nd, F.lit(0.0)),
            6,
        ).alias("seasonal_strength"),
    )


@register(
    "q_neyman_allocation",
    oracle="""
WITH s AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
g AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS nh, CAST(sum(v) AS BIGINT) AS sv,
         sum(CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0))) AS svv
  FROM s GROUP BY 1
),
w AS (
  SELECT seg, nh,
         CAST(round(sqrt(greatest(CAST(nh AS DOUBLE) * CAST(svv AS DOUBLE)
                                  - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE), 0.0))
                    / CAST(nh AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS s_micro
  FROM g
),
ww AS (SELECT seg, nh, nh * s_micro AS w_micro FROM w),
tot AS (SELECT CAST(sum(w_micro) AS BIGINT) AS wt FROM ww)
SELECT seg AS segment, nh AS stratum_rows,
       round(CAST(s_micro_out AS DOUBLE) / 1000000.0, 6) AS stratum_std,
       CAST(w_micro // greatest(wt // 10000, 1) AS BIGINT) AS allocated_samples
FROM (SELECT ww.seg, ww.nh, ww.w_micro, w.s_micro AS s_micro_out
      FROM ww JOIN w USING (seg)), tot
""",
    doc="Neyman-optimal stratified-sample allocation of a 10k-row "
    "budget across market segments: n_h proportional to N_h * S_h — "
    "the design that minimizes estimator variance for a fixed "
    "budget, vs naive proportional allocation (high-variance strata "
    "deserve more samples). Per-stratum std derives from exact "
    "moments (n*ss - s^2, DECIMAL cross-products — the ANOVA "
    "contract) then INTEGERIZES to micro-units, so the weights "
    "N_h*S_micro and the final allocation w div (total div budget) "
    "are pure int64 truncation math on both engines (divide-BEFORE-"
    "multiply — budget*w would wrap int64 at micro scale); the documented "
    "remainder (< k rows) is left unassigned rather than "
    "float-rounded. Plan: broadcast dim join, 5-group agg, 1-row "
    "weight-total broadcast.",
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    s = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("v"),
    )
    vd = F.col("v").cast("decimal(18,0)")
    g = s.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(vd * vd).alias("svv"),
    )
    s_micro = F.round(
        F.sqrt(
            F.greatest(
                F.col("nh").cast("double") * F.col("svv").cast("double")
                - F.col("sv").cast("double") * F.col("sv").cast("double"),
                F.lit(0.0),
            )
        )
        / F.col("nh").cast("double")
        * 1000000.0,
        0,
    ).cast("long")
    w = g.select("seg", "nh", s_micro.alias("s_micro")).withColumn(
        "w_micro", F.col("nh") * F.col("s_micro")
    )
    tot = w.agg(F.sum("w_micro").cast("long").alias("wt"))
    return w.crossJoin(F.broadcast(tot)).select(
        F.col("seg").alias("segment"),
        F.col("nh").alias("stratum_rows"),
        F.round(F.col("s_micro").cast("double") / 1000000.0, 6).alias("stratum_std"),
        F.expr("w_micro div greatest(wt div 10000, 1)")
        .cast("long")
        .alias("allocated_samples"),
    )


@register(
    "q_kneedle_adoption",
    oracle="""
WITH first_sale AS (
  SELECT l_partkey,
         CAST(min(date_part('year', l_shipdate) * 12
                  + date_part('month', l_shipdate) - 1) AS BIGINT) AS mon
  FROM lineitem GROUP BY 1
),
m AS (SELECT mon, CAST(count(*) AS BIGINT) AS new_parts FROM first_sale GROUP BY 1),
c AS (
  SELECT mon, CAST(sum(new_parts) OVER (ORDER BY mon
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM m
),
ends AS (
  SELECT CAST(min(mon) AS BIGINT) AS x1, CAST(max(mon) AS BIGINT) AS xn FROM c
),
ys AS (
  SELECT (SELECT cum FROM c JOIN ends ON c.mon = ends.x1) AS y1,
         (SELECT cum FROM c JOIN ends ON c.mon = ends.xn) AS yn
),
dev AS (
  SELECT mon, cum,
         abs((cum - y1) * (xn - x1) - (mon - x1) * (yn - y1)) AS d_scaled
  FROM c, ends, ys
)
SELECT mon AS knee_month, cum AS cum_parts_at_knee,
       CAST(d_scaled AS BIGINT) AS chord_deviation_scaled
FROM dev ORDER BY d_scaled DESC, mon LIMIT 1
""",
    doc="Knee-point detection (Kneedle's chord criterion) on the "
    "product adoption curve: the month where the cumulative-parts "
    "curve bends hardest away from the straight line between its "
    "endpoints — the generic 'where does the curve elbow' answer "
    "that picks k for k-means, vocab cutoffs, and here the moment "
    "catalog growth saturated. The deviation |dy*(xn-x1) - "
    "dx*(yn-y1)| is the cross-product form of point-to-chord "
    "distance with the constant denominator dropped — so the ENTIRE "
    "argmax is exact int64 cross-multiplication, no sqrt, no "
    "floats anywhere in the result; the argmax is orderBy+limit. "
    "Cumulative via global_prefix_sums (the q_product_adoption_curve "
    "frame). Plan: keyed min agg, monthly rollup, one range "
    "exchange, two 1-row endpoint broadcasts, "
    "TakeOrderedAndProject.",
)
def q_kneedle_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    li = load_table(spark, sf_dir, "lineitem")
    first_sale = li.groupBy("l_partkey").agg(
        F.min(F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("mon")
    )
    m = first_sale.groupBy("mon").agg(
        F.count(F.lit(1)).cast("long").alias("new_parts")
    )
    c = global_prefix_sums(m, [F.col("mon")], {"new_parts": "cum"})
    ends = c.agg(
        F.min("mon").cast("long").alias("x1"), F.max("mon").cast("long").alias("xn")
    )
    with_ends = c.crossJoin(F.broadcast(ends))
    y1 = (
        with_ends.filter(F.col("mon") == F.col("x1"))
        .select(F.col("cum").alias("y1"))
    )
    yn = (
        with_ends.filter(F.col("mon") == F.col("xn"))
        .select(F.col("cum").alias("yn"))
    )
    dev = (
        with_ends.crossJoin(F.broadcast(y1))
        .crossJoin(F.broadcast(yn))
        .select(
            "mon",
            "cum",
            F.abs(
                (F.col("cum") - F.col("y1")) * (F.col("xn") - F.col("x1"))
                - (F.col("mon") - F.col("x1")) * (F.col("yn") - F.col("y1"))
            ).alias("d_scaled"),
        )
    )
    return (
        dev.orderBy(F.col("d_scaled").desc(), "mon")
        .limit(1)
        .select(
            F.col("mon").alias("knee_month"),
            F.col("cum").alias("cum_parts_at_knee"),
            F.col("d_scaled").cast("long").alias("chord_deviation_scaled"),
        )
    )


@register(
    "q_acf_daily",
    oracle="""
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
lags AS (SELECT unnest(range(1, 8)) AS lag),
p AS (
  SELECT l.lag, a.cnt AS x, b.cnt AS y
  FROM d a CROSS JOIN lags l
  JOIN d b ON b.day = a.day - l.lag
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS sxy,
         sum(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx,
         sum(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS syy
  FROM p GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6)
         AS acf
FROM m
""",
    doc="Autocorrelation function of daily event volume at lags 1-7: "
    "Pearson correlation of the series with its own calendar-day "
    "lags — the diagnostic that separates momentum (high lag-1) "
    "from weekly seasonality (a lag-7 spike, confirming "
    "q_seasonal_strength / q_dow_seasonality from the correlation "
    "side) and tells the forecaster which AR terms matter. Each "
    "lag's pairs come from one day-offset EQUI-JOIN against a "
    "broadcast 7-row lag grid (calendar gaps drop pairs instead of "
    "silently shifting the series); all five moments per lag are "
    "exact (int64 sums, DECIMAL cross-products), correlations "
    "assemble in the shared q_degree_assortativity double shape, "
    "nullif-guarded for constant series. Plan: one scan, daily "
    "agg, 7x fanout equi-join, 7-group rollup.",
)
def q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        F.expr("(ts div 1000) div 86400000000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = d.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("day") - F.col("lag")).alias("jday"), F.col("cnt").alias("x")
    )
    b = d.select(F.col("day").alias("jday"), F.col("cnt").alias("y"))
    p = a.join(b, "jday")
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    m = p.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return m.select(
        F.col("lag").cast("long").alias("lag"),
        "n",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("acf"),
    )


@register(
    "q_null_pattern_profile",
    oracle="""
WITH mart AS (
  SELECT c.c_custkey,
         min(CASE WHEN date_part('year', o.o_orderdate) = 1995
                  THEN epoch_us(o.o_orderdate) END) AS first_1995,
         min(CASE WHEN o.o_totalprice >= 300000.0
                  THEN epoch_us(o.o_orderdate) END) AS big_order,
         min(CASE WHEN o.o_orderpriority = '1-URGENT'
                  THEN epoch_us(o.o_orderdate) END) AS urgent
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
p AS (
  SELECT (CASE WHEN first_1995 IS NULL THEN 1 ELSE 0 END)
         + 2 * (CASE WHEN big_order IS NULL THEN 1 ELSE 0 END)
         + 4 * (CASE WHEN urgent IS NULL THEN 1 ELSE 0 END) AS pattern
  FROM mart
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
SELECT CAST(pattern AS BIGINT) AS null_pattern,
       concat(CASE WHEN pattern % 2 = 1 THEN 'first_1995,' ELSE '' END,
              CASE WHEN (pattern // 2) % 2 = 1 THEN 'big_order,' ELSE '' END,
              CASE WHEN (pattern // 4) % 2 = 1 THEN 'urgent,' ELSE '' END)
         AS null_columns,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(count(*) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS row_share
FROM p, tot GROUP BY pattern, n
""",
    doc="Missingness pattern profile over a customer-360 mart: rows "
    "grouped by the BITMASK of which derived fields are NULL "
    "together (first 1995 order, any $300k+ order, any urgent "
    "order — the conditional-min outer-join fields real marts are "
    "full of) — the co-occurrence view (pandas' missingno matrix "
    "as a query) that per-column null rates cannot give: fields "
    "null TOGETHER share an upstream cause, independently null "
    "fields are separate gaps, and imputation differs accordingly "
    "(the raw fixture tables contain no NULLs at all — structural "
    "mart missingness is where patterns actually live). The "
    "pattern is pure integer bit math (weights 1/2/4), the "
    "readable column list derives from the same integer; at most "
    "2^k groups at any scale. Plan: one outer-join mart agg, "
    "bounded-pattern agg, 1-row total broadcast.",
)
def q_null_pattern_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").alias("od_us"),
        F.year("o_orderdate").alias("oy"),
        "o_totalprice",
        "o_orderpriority",
    )
    mart = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.min(F.when(F.col("oy") == 1995, F.col("od_us"))).alias("first_1995"),
            F.min(
                F.when(F.col("o_totalprice") >= 300000.0, F.col("od_us"))
            ).alias("big_order"),
            F.min(
                F.when(F.col("o_orderpriority") == "1-URGENT", F.col("od_us"))
            ).alias("urgent"),
        )
    )
    pattern = (
        F.when(F.col("first_1995").isNull(), 1).otherwise(0)
        + 2 * F.when(F.col("big_order").isNull(), 1).otherwise(0)
        + 4 * F.when(F.col("urgent").isNull(), 1).otherwise(0)
    )
    p = mart.select(pattern.alias("pattern"))
    tot = p.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cols = F.concat(
        F.when(F.col("pattern") % 2 == 1, "first_1995,").otherwise(""),
        F.when(F.expr("(pattern div 2) % 2") == 1, "big_order,").otherwise(""),
        F.when(F.expr("(pattern div 4) % 2") == 1, "urgent,").otherwise(""),
    )
    return (
        p.groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("pattern").cast("long").alias("null_pattern"),
            cols.alias("null_columns"),
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("n").cast("double"), 6
            ).alias("row_share"),
        )
    )


@register(
    "q_bass_diffusion_fit",
    oracle="""
WITH first_sale AS (
  SELECT l_partkey,
         CAST(min(date_part('year', l_shipdate) * 12
                  + date_part('month', l_shipdate) - 1) AS BIGINT) AS mon
  FROM lineitem GROUP BY 1
),
m AS (SELECT mon, CAST(count(*) AS BIGINT) AS y FROM first_sale GROUP BY 1),
c AS (
  SELECT mon, y,
         CAST(sum(y) OVER (ORDER BY mon ROWS UNBOUNDED PRECEDING) AS BIGINT) - y
           AS x1
  FROM m
),
obs AS (SELECT y, x1, x1 * x1 AS x2 FROM c),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM obs
),
coef AS (
  SELECT
    (CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
     - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
     + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)))
    / nullif(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
             - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
             + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)), 0.0) AS a,
    (CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
     - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
     + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE)))
    / nullif(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
             - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
             + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)), 0.0) AS b,
    (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))
     - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))
     + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))
    / nullif(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
             - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
             + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)), 0.0) AS c,
    n
  FROM mom
)
SELECT n AS n_months,
       round(a, 6) + 0.0 AS coef_a, round(b, 6) + 0.0 AS coef_b,
       round(c, 6) + 0.0 AS coef_c,
       CASE WHEN c < 0 AND b * b - 4.0 * c * a >= 0
            THEN round((-b - sqrt(b * b - 4.0 * c * a)) / (2.0 * c), 6)
            ELSE 'NaN'::DOUBLE END AS market_size_m,
       CASE WHEN c < 0 AND b * b - 4.0 * c * a >= 0
            THEN round(a / ((-b - sqrt(b * b - 4.0 * c * a)) / (2.0 * c)), 6)
            ELSE 'NaN'::DOUBLE END AS innovation_p,
       CASE WHEN c < 0 AND b * b - 4.0 * c * a >= 0
            THEN round(-c * ((-b - sqrt(b * b - 4.0 * c * a)) / (2.0 * c)), 6)
            ELSE 'NaN'::DOUBLE END AS imitation_q
FROM coef
""",
    doc="Bass diffusion model fit on monthly first-sale adoptions: the "
    "discrete Bass regression n_t = a + b*C_(t-1) + c*C_(t-1)^2 "
    "solved by Cramer's rule on the 3x3 normal equations, then "
    "inverted to the famous (p, q, M) — innovation rate, imitation "
    "rate, ultimate market size (Bass 1969, the standard "
    "new-product forecast; q >> p means word-of-mouth-driven "
    "growth and a sharp peak). ALL nine regression moments are "
    "exact int64 sums (adoption counts are small ints; x2 = C^2 <= "
    "4e6 here — at larger catalogs rescale C to kilo-units, same "
    "plan), the determinants and root assemble in one shared "
    "double shape (+0.0 normalizes IEEE negative zero out of the "
    "rounded coefficients — the one hash-visible artifact of a "
    "near-zero c), and degenerate fits (non-negative c or negative "
    "discriminant) yield NaN (p,q,M) on both engines — NaN, not "
    "NULL, because an all-NULL Spark double column hashes as object "
    "'NULL' under the driver's pandas canon while DuckDB NULL "
    "doubles always surface as NaN. "
    "Plan: keyed min agg, monthly rollup, one range exchange "
    "(global_prefix_sums), 1-row reduce — the months frame is "
    "calendar-bounded at any corpus size.",
)
def q_bass_diffusion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    li = load_table(spark, sf_dir, "lineitem")
    first_sale = li.groupBy("l_partkey").agg(
        F.min(F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("mon")
    )
    m = first_sale.groupBy("mon").agg(F.count(F.lit(1)).cast("long").alias("y"))
    cum = global_prefix_sums(m, [F.col("mon")], {"y": "cy"})
    obs = cum.select(
        "y",
        (F.col("cy") - F.col("y")).alias("x1"),
        ((F.col("cy") - F.col("y")) * (F.col("cy") - F.col("y"))).alias("x2"),
    )
    mom = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    d = {k: F.col(k).cast("double") for k in
         ["n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]}
    det = (
        d["n"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    det_a = (
        d["sy"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        + d["s2"] * (d["s1y"] * d["s12"] - d["s11"] * d["s2y"])
    )
    det_b = (
        d["n"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        - d["sy"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
    )
    det_c = (
        d["n"] * (d["s11"] * d["s2y"] - d["s1y"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
        + d["sy"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    coef = mom.select(
        F.col("n").alias("n_months"),
        (det_a / F.nullif(det, F.lit(0.0))).alias("a"),
        (det_b / F.nullif(det, F.lit(0.0))).alias("b"),
        (det_c / F.nullif(det, F.lit(0.0))).alias("c"),
    )
    disc = F.col("b") * F.col("b") - F.lit(4.0) * F.col("c") * F.col("a")
    ok = (F.col("c") < 0) & (disc >= 0)
    mm = (-F.col("b") - F.sqrt(disc)) / (F.lit(2.0) * F.col("c"))
    # degenerate fits emit NaN, not NULL: a Spark column that is
    # all-NULL stays object-dtyped through the driver's
    # collect->pandas canon (hashes as "NULL") while DuckDB NULL
    # doubles always become NaN via .df() — NaN on BOTH sides is the
    # only encoding stable under that canon at every scale (found by
    # the round-8 sf0.001 sweep, where this fit IS degenerate)
    nan = F.lit(float("nan"))
    return coef.select(
        "n_months",
        (F.round(F.col("a"), 6) + F.lit(0.0)).alias("coef_a"),
        (F.round(F.col("b"), 6) + F.lit(0.0)).alias("coef_b"),
        (F.round(F.col("c"), 6) + F.lit(0.0)).alias("coef_c"),
        F.when(ok, F.round(mm, 6)).otherwise(nan).alias("market_size_m"),
        F.when(ok, F.round(F.col("a") / mm, 6)).otherwise(nan).alias("innovation_p"),
        F.when(ok, F.round(-F.col("c") * mm, 6)).otherwise(nan).alias("imitation_q"),
    )


@register(
    "q_bounce_rate",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {30 * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, t, event_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM ev
),
agg AS (
  SELECT user_id, session_no,
         min(t) AS t0,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY 1, 2
),
landing AS (
  SELECT a.user_id, a.session_no, a.n_events, s.event_type AS landing_type
  FROM agg a JOIN sess s
    ON s.user_id = a.user_id AND s.session_no = a.session_no AND s.t = a.t0
  QUALIFY row_number() OVER (PARTITION BY a.user_id, a.session_no
                             ORDER BY s.event_id) = 1
)
SELECT landing_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
FROM landing GROUP BY 1
""",
    doc="Bounce rate by landing action: gap-sessionized sessions "
    "grouped by their FIRST event type, with the share that ended "
    "after that single event — the engagement diagnostic that says "
    "which entry points dead-end ('error' landings bouncing hard is "
    "an alerting signal; 'view' landings bouncing is a content "
    "problem). The landing event resolves deterministically via the "
    "session's min timestamp with an event_id tiebreak (per-session "
    "window — bounded groups); counts are exact int64, the rate is "
    "the only float. Plan: per-user windows, per-session agg, one "
    "keyed join back for the landing row, bounded rollup.",
)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap_us = 30 * 60 * 1_000_000
    events = load_table(spark, sf_dir, "events")
    t = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy(t, "event_id")
    is_new = F.when(t - F.lag(t).over(w) > gap_us, 1).otherwise(0)
    sess = events.select(
        "user_id", t.alias("t"), "event_id", "event_type", is_new.alias("is_new")
    ).withColumn(
        "session_no",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("t", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    agg = sess.groupBy("user_id", "session_no").agg(
        F.min("t").alias("t0"), F.count(F.lit(1)).cast("long").alias("n_events")
    )
    joined = agg.join(
        sess.select("user_id", "session_no", "t", "event_id", "event_type"),
        ["user_id", "session_no"],
    ).filter(F.col("t") == F.col("t0"))
    wl = Window.partitionBy("user_id", "session_no").orderBy("event_id")
    landing = (
        joined.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select(F.col("event_type").alias("landing_type"), "n_events")
    )
    return landing.groupBy("landing_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("bounce_rate"),
    )


def _ppr_oracle_sql(iters: int = 3, damping: int = 85) -> str:
    """Unrolled PERSONALIZED PageRank over the supply graph — seeds
    get the initial mass and the teleport term, everyone else starts
    (and teleports) at zero. Mirrors operators.graph.pagerank's
    ``seeds`` branch exactly (same BIGINT micro-units / DIV)."""
    base = (100 - damping) * 1_000_000 // 100
    rounds = []
    for n in range(iters):
        rounds.append(
            f"""pr{n + 1} AS (
  SELECT n.node,
         CAST(CASE WHEN n.seed = 1 THEN {base} ELSE 0 END
              + ({damping} * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
  FROM pnodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr // d.deg) AS s
    FROM edges e JOIN deg d ON d.src = e.src JOIN pr{n} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    return (
        """WITH pairs AS (
  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT sk AS src, 10000000 + ck AS dst FROM pairs
  UNION ALL
  SELECT 10000000 + ck AS src, sk AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
pnodes AS (
  SELECT node, CASE WHEN node < 5 THEN 1 ELSE 0 END AS seed
  FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
),
pr0 AS (
  SELECT node, CAST(CASE WHEN seed = 1 THEN 1000000 ELSE 0 END AS BIGINT) AS pr
  FROM pnodes
),
"""
        + ",\n".join(rounds)
        + f"""
SELECT node, pr FROM pr{iters} WHERE pr > 0"""
    )


@register(
    "q_ppr_supply",
    oracle=_ppr_oracle_sql(3, 85),
    doc="PERSONALIZED PageRank (3 rounds, d=0.85) over the supply "
    "graph, seeded at suppliers 0-4: initial mass AND the teleport "
    "term go only to the seeds, so rank concentrates in their "
    "neighborhoods — topic-sensitive importance ('which customers and "
    "suppliers matter relative to THESE suppliers'), the building "
    "block behind personalized recommendations and trust propagation "
    "(and the retrieval-expansion trick of seeding at a query's "
    "matched nodes). Same all-integer micro-unit arithmetic as "
    "q_pagerank_supply — bit-exact under any partitioning; nodes the "
    "seed mass never reached (pr = 0 exactly, integer math) are "
    "filtered, which at scale keeps the output proportional to the "
    "reached neighborhood, not the graph. Plan: per round one "
    "rank-to-edges join on src + one contribution shuffle on dst; the "
    "seed column rides the persisted node frame.",
)
def q_ppr_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("l_suppkey").alias("sk"), F.col("o_custkey").alias("ck"))
        .distinct()
    )
    edges = pairs.select(
        F.col("sk").alias("src"), (F.lit(10_000_000) + F.col("ck")).alias("dst")
    ).unionByName(
        pairs.select(
            (F.lit(10_000_000) + F.col("ck")).alias("src"),
            F.col("sk").alias("dst"),
        )
    )
    seeds = spark.createDataFrame([(i,) for i in range(5)], ["node"])
    return pagerank(edges, iters=3, damping_pct=85, seeds=seeds).filter(
        F.col("pr") > 0
    )

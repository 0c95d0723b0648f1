"""Training-pipeline corpus operators as oracle-checked queries:
as-of join, sequence packing, stratified sampling, contamination
check, quality-rule filtering, embedding quantization.

Oracle notes: token/shingle SQL mirrors ``functions/text.py`` (split
on \\s+, drop empties); ratios are single double divisions of exact
integers (bit-equal across engines); event timestamps compare in
MICROS on both sides (DuckDB truncates the parquet nanos to micros,
Spark reads nanos-as-long and divides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import portable_math as _PM
from ..functions.text import EN_STOPWORDS
from ..operators import corpus as C
from ..operators.asof import asof_join
from ..sources.tables import load_table
from . import register
from ._sql_fragments import SQL_TOKENS as _SQL_TOKENS, SQL_UNIT as _SQL_UNIT, SQL_DOT as _SQL_DOT  # noqa: E501




@register(
    "q_asof_join",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'click'
), pur AS (
  SELECT user_id, epoch_us(ts) AS t,
         max(event_id) AS purchase_id,
         max_by(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.t,
       p.purchase_id, p.purchase_value
FROM clicks c
ASOF LEFT JOIN pur p ON c.user_id = p.user_id AND c.t >= p.t
""",
    doc="As-of (point-in-time) join: each click matched to the user's "
    "most recent preceding purchase — the temporal lookup implemented "
    "distributed as ONE union+window shuffle (operators/asof.py), "
    "checked against DuckDB's native ASOF JOIN. The right side is "
    "pre-deduped per (user, micros): nanos truncate to micros in the "
    "oracle, so sub-microsecond ties must resolve identically.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = F.expr("ts div 1000")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", t.alias("t")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", t.alias("t"), "event_id", "value")
        .groupBy("user_id", "t")
        .agg(
            F.max("event_id").alias("purchase_id"),
            F.expr("max_by(value, event_id)").alias("purchase_value"),
        )
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="t",
        right_ts="t",
        payload=["purchase_id", "purchase_value"],
        suffix="",
    )
    return joined.select("event_id", "user_id", "t", "purchase_id", "purchase_value")


@register(
    "q_asof_forward",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'click'
), sig AS (
  SELECT user_id, epoch_us(ts) AS t, max(event_id) AS next_signup
  FROM events WHERE event_type = 'signup'
  GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, s.next_signup
FROM clicks c
ASOF LEFT JOIN sig s ON c.user_id = s.user_id AND c.t <= s.t
""",
    doc="Forward as-of join (next following event) — same union+window "
    "plan with inverted ordering.",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = F.expr("ts div 1000")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", t.alias("t")
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", t.alias("t"), "event_id")
        .groupBy("user_id", "t")
        .agg(F.max("event_id").alias("next_signup"))
    )
    joined = asof_join(
        clicks,
        signups,
        on="user_id",
        left_ts="t",
        right_ts="t",
        payload=["next_signup"],
        direction="forward",
        suffix="",
    )
    return joined.select("event_id", "user_id", "next_signup")


@register(
    "q_asof_tolerance",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'click'
), pur AS (
  SELECT user_id, epoch_us(ts) AS t,
         max(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT c.event_id, c.user_id,
       CASE WHEN c.t - p.t <= 86400000000 THEN p.purchase_id END AS purchase_id
FROM clicks c
ASOF LEFT JOIN pur p ON c.user_id = p.user_id AND c.t >= p.t
""",
    doc="As-of join with tolerance (max 1-day gap, the pandas "
    "merge_asof(tolerance=...) semantic): matches further than the "
    "bound are NULLed.",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = F.expr("ts div 1000")
    day_us = 86_400_000_000
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", t.alias("t")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", t.alias("t"), "event_id")
        .groupBy("user_id", "t")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="t", right_ts="t",
        payload=["purchase_id"], suffix="", tolerance=day_us,
    )
    return joined.select("event_id", "user_id", "purchase_id")


@register(
    "t_pack_sequences",
    oracle=f"""
WITH toks AS (
  SELECT source, doc_id,
         len({_SQL_TOKENS.format(col='text')}) AS n_tokens
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS "offset"
  FROM toks
)
SELECT source, doc_id, CAST(n_tokens AS INT) AS n_tokens, "offset",
       CAST(floor("offset" / 256.0) AS BIGINT) AS bin
FROM packed
""",
    doc="Sequence packing for pretraining batches: contiguous "
    "fixed-token-budget bin assignment via one exclusive-prefix-sum "
    "window per shard (operators/corpus.py pack_sequences).",
)
def t_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.pack_sequences(docs, "doc_id", "text", budget=256, group_col="source")


@register(
    "t_stratified_sample",
    oracle="""
SELECT doc_id, source
FROM documents
WHERE ('0x' || substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      % 100 < 20
""",
    doc="Deterministic stratified sampling: keep rows whose portable "
    "md5 hash of (stratum, id) lands under the rate — each stratum "
    "draws an independent pseudorandom sequence; reproducible across "
    "engines/cluster sizes, zero shuffles (filter at the scan).",
)
def t_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.stratified_sample_hash(docs, "doc_id", "source", pct=20).select(
        "doc_id", "source"
    )


@register(
    "t_weighted_sample",
    oracle="""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
            / 4294967296.0) / n_chars AS score
  FROM documents WHERE n_chars > 0
), ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rk
  FROM scored
)
SELECT doc_id, source, n_chars FROM ranked WHERE rk <= 5
""",
    doc="Deterministic weighted sampling without replacement "
    "(Efraimidis-Spirakis A-ES): ln(hash-uniform)/weight top-k per "
    "stratum — the distributed, reproducible replacement for "
    "reservoir sampling when mixing corpora by weight "
    "(operators/corpus.py weighted_sample_topk). Only selected rows "
    "are output, so a last-ulp ln() divergence across engines cannot "
    "flip results unless two scores collide to within 1 ulp.",
)
def t_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.weighted_sample_topk(
        docs, "doc_id", "n_chars", k=5, stratum_col="source"
    ).select("doc_id", "source", "n_chars")


@register(
    "t_contamination",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_SQL_TOKENS.format(col='text')} AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, source,
         concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
), tr AS (
  SELECT doc_id AS train_id, shingle FROM sh
  WHERE CAST(substr(source, 4) AS INT) < 10
), ev AS (
  SELECT doc_id AS eval_id, shingle FROM sh
  WHERE CAST(substr(source, 4) AS INT) >= 10
)
SELECT train_id, eval_id, count(*) AS n_shared
FROM tr JOIN ev USING (shingle)
GROUP BY 1, 2
HAVING count(*) >= 2
""",
    doc="Benchmark-contamination check: train/eval doc pairs sharing "
    "≥2 distinct 3-word shingles via the inverted-index join "
    "(operators/corpus.py contamination_pairs) — the pre-training "
    "leak detector; no cross join at any scale.",
)
def t_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring(F.col("source"), 4, 10).cast("int")
    train = docs.filter(src_num < 10)
    eval_ = docs.filter(src_num >= 10)
    return C.contamination_pairs(train, eval_, "doc_id", "text", k=3, min_shared=2)


@register(
    "q_dq_expectations",
    oracle="""
SELECT 'not_null(l_orderkey)' AS rule,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS violations,
       sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
FROM lineitem
UNION ALL
SELECT 'in_range(l_discount,0.0,0.1)',
       CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0
                      OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0
                 OR l_discount > 0.1 THEN 1 ELSE 0 END) = 0
FROM lineitem
UNION ALL
SELECT 'accepted_values(l_returnflag)',
       CAST(sum(CASE WHEN l_returnflag IS NULL
                      OR l_returnflag NOT IN ('A','N','R')
                     THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN l_returnflag IS NULL
                 OR l_returnflag NOT IN ('A','N','R')
                THEN 1 ELSE 0 END) = 0
FROM lineitem
UNION ALL
SELECT 'unique(l_orderkey,l_linenumber)',
       CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 END), 0) AS BIGINT),
       coalesce(sum(CASE WHEN n > 1 THEN n - 1 END), 0) = 0
FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)
UNION ALL
SELECT 'referential(l_orderkey)',
       CAST(count(*) AS BIGINT),
       count(*) = 0
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
""",
    doc="Declarative data-quality expectations (files_kraken_spark."
    "validate): not-null, range, accepted values, key uniqueness, "
    "referential integrity — row-local rules share ONE aggregate "
    "pass; unique/referential add one keyed shuffle each.",
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..validate import (
        accepted_values,
        in_range,
        not_null,
        referential,
        run_checks,
        unique,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    checks = [
        not_null("l_orderkey"),
        in_range("l_discount", 0.0, 0.1),
        accepted_values("l_returnflag", ["A", "N", "R"]),
        unique(["l_orderkey", "l_linenumber"]),
        referential("l_orderkey", orders, "o_orderkey"),
    ]
    return run_checks(li, checks)


@register(
    "q_interval_join_counts",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'click'
), pur AS (
  SELECT user_id, epoch_us(ts) AS pt
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, count(p.pt) AS n_purchases_1h
FROM clicks c LEFT JOIN pur p
  ON p.user_id = c.user_id AND p.pt >= c.t AND p.pt <= c.t + 3600000000
GROUP BY 1, 2
""",
    doc="Keyed interval (range) join: purchases within 1h after each "
    "click — bucketized into coarse time buckets + equi-join + exact "
    "filter (operators/asof.py interval_join), avoiding the "
    "broadcast-nested-loop plan Spark picks for raw inequality joins.",
)
def q_interval_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import interval_join

    ev = load_table(spark, sf_dir, "events")
    t = F.expr("ts div 1000")
    hour_us = 3_600_000_000
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id"), F.col("user_id"), t.alias("lo"), (t + hour_us).alias("hi")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), t.alias("pt")
    )
    matched = interval_join(
        purchases, clicks, on="user_id", t_col="pt",
        lo_col="lo", hi_col="hi", bucket_width=hour_us,
    )
    counts = matched.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))
    return clicks.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_purchases_1h"),
    )


@register(
    "q_salted_join_revenue",
    oracle="""
SELECT o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
    doc="Skew-mitigated fact⋈dim join (operators/skew.py salted_join: "
    "16-way salt on the fact side, dim replicated) must produce "
    "EXACTLY the plain-join aggregate — the salt is a physical "
    "re-distribution, never a semantic change.",
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), F.col("l_extendedprice"), F.col("l_discount")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), F.col("o_orderpriority")
    )
    joined = salted_join(li, orders, "l_orderkey", salt_buckets=16)
    return joined.groupBy("o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_hll_sketch",
    oracle="""
WITH hashed AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
), ranked AS (
  SELECT event_type, h % 16 AS idx,
         CASE WHEN h // 16 > 0
              THEN bit_count(((h // 16) & -(h // 16)) - 1) + 1
              ELSE 29 END AS rank
  FROM hashed
), regs AS (
  SELECT event_type, idx, max(rank) AS m FROM ranked GROUP BY 1, 2
), sk AS (
  SELECT event_type,
         string_agg(idx || ':' || m, ',' ORDER BY idx) AS registers,
         sum(pow(2.0, -m)) + (16 - count(*)) * 1.0 AS denom
  FROM regs GROUP BY event_type
)
SELECT s.event_type, s.registers,
       0.673 * 256.0 / s.denom AS estimate,
       d.exact_distinct
FROM sk s JOIN (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
) d USING (event_type)
""",
    doc="HyperLogLog sketch built from integer-only expressions "
    "(portable md5 hash, register = trailing-zero rank via "
    "bit_count((w & -w) - 1)): registers and the estimate reproduce "
    "bit-for-bit in any engine — the sum of powers of two is exact in "
    "double. The mergeable-sketch pattern behind approx distinct "
    "counts at 100 TB, exposed as data instead of an opaque binary.",
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_hash64

    ev = load_table(spark, sf_dir, "events")
    h = md5_hash64(F.col("user_id").cast("string"))
    hashed = ev.select("event_type", h.alias("h")).distinct()
    w = F.floor(F.col("h") / 16).cast("long")
    rank = F.when(
        w > 0, F.bit_count((w.bitwiseAND(-w)) - 1) + 1
    ).otherwise(F.lit(29))
    ranked = hashed.select(
        "event_type", F.pmod(F.col("h"), F.lit(16)).alias("idx"), rank.alias("rank")
    )
    regs = ranked.groupBy("event_type", "idx").agg(F.max("rank").alias("m"))
    sk = regs.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("m")))
                ),
                lambda s: F.concat_ws(":", s["idx"], s["m"]),
            ),
            ",",
        ).alias("registers"),
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m")))
            + (F.lit(16) - F.count(F.lit(1))) * F.lit(1.0)
        ).alias("denom"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return sk.join(exact, "event_type").select(
        "event_type",
        "registers",
        (F.lit(0.673) * F.lit(256.0) / F.col("denom")).alias("estimate"),
        "exact_distinct",
    )


@register(
    "q_incremental_rollup",
    oracle="""
SELECT event_type,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
       count(*) AS n,
       round(sum(value), 2) AS total_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
""",
    doc="Continuous-aggregate (hypertable-rollup) maintenance: the "
    "per-hour rollup is built by MERGING three micro-batch partial "
    "aggregates (operators/rollup.py) — O(batch) per tick — and must "
    "equal the from-scratch aggregate over all events.",
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup import merge_rollup, partial_rollup

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("ts div 1000 div 3600000000").alias("hour_bucket"),
        "value",
    )
    keys = ["event_type", "hour_bucket"]
    aggs = {
        "n": "count:*",
        "total_value": "sum:value",
        "min_value": "min:value",
        "max_value": "max:value",
    }
    # three simulated micro-batches by id ranges
    state = None
    for lo, hi in ((0, 4000), (4000, 8000), (8000, 10**18)):
        batch = ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        part = partial_rollup(batch, keys, aggs)
        state = part if state is None else merge_rollup(state, part, keys, aggs)
    return state.select(
        "event_type",
        "hour_bucket",
        "n",
        F.round("total_value", 2).alias("total_value"),
        "min_value",
        "max_value",
    )


@register(
    "q_map_ops",
    oracle="""
SELECT event_id,
       'bucket,type' AS m_keys,
       concat(CAST(user_id % 10 AS VARCHAR), ',', event_type) AS m_vals,
       event_type AS m_type,
       2 AS m_size,
       CAST(json_array_length(json_keys(props)) AS INT) AS n_json_keys,
       json_extract_string(props, '$.k') AS k_from_map
FROM events
WHERE event_id < 200
""",
    doc="Map-typed column surface (SURVEY §2.6 gap in the reference): "
    "create_map, map_keys/map_values (sorted, string-canonical for "
    "the driver canon), element_at, size, and from_json into "
    "map<string,string>.",
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("bucket"), (F.col("user_id") % 10).cast("string"),
    )
    jm = F.from_json(F.col("props"), "map<string,string>")
    withm = ev.select("event_id", m.alias("m"), jm.alias("jm"))
    return withm.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(F.col("m"))), ",").alias("m_keys"),
        F.array_join(F.sort_array(F.map_values(F.col("m"))), ",").alias("m_vals"),
        F.element_at(F.col("m"), "type").alias("m_type"),
        F.size(F.col("m")).alias("m_size"),
        F.size(F.col("jm")).alias("n_json_keys"),
        F.element_at(F.col("jm"), "k").alias("k_from_map"),
    )


@register(
    "q_pandas_udaf_median",
    oracle="""
SELECT l_returnflag,
       median(l_quantity) AS median_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    doc="User-defined aggregate via an Arrow-batched grouped-agg pandas "
    "UDF (numpy median) — the UDAF surface the reference lacks "
    "(SURVEY §2.6), vectorized per group, no row-at-a-time Python. "
    "Median interpolation is (a+b)/2 on both engines → bit-equal.",
)
def q_pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # The module's `from __future__ import annotations` stringifies
    # inline hints, so attach real annotation objects for the
    # hint-based dispatch (Series -> scalar = grouped aggregate).
    def np_median(v):
        return float(np.median(v.to_numpy()))

    np_median.__annotations__ = {"v": pd.Series, "return": float}
    np_median = pandas_udf(np_median, "double")

    li = load_table(spark, sf_dir, "lineitem")
    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one
    # agg — count via a second pandas aggregate over the same group
    def np_count(v):
        return len(v)

    np_count.__annotations__ = {"v": pd.Series, "return": int}
    np_count = pandas_udf(np_count, "long")

    return li.groupBy("l_returnflag").agg(
        np_median("l_quantity").alias("median_qty"),
        np_count("l_quantity").alias("n"),
    )





@register(
    "sim_knn_classify",
    oracle=f"""
WITH u AS (SELECT vec_id, label, {_SQL_UNIT.format(a='embedding')} AS un FROM embeddings),
q AS (SELECT vec_id AS q_id, un AS qu FROM u WHERE vec_id < 10),
scored AS (
  SELECT q_id, c.vec_id AS cand_id, c.label AS lbl,
         {_SQL_DOT.format(a='qu', b='c.un')} AS cos
  FROM u c, q
  WHERE c.vec_id >= 10
), topk AS (
  SELECT q_id, lbl FROM (
    SELECT q_id, lbl,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
    FROM scored
  ) WHERE rn <= 5
), votes AS (
  SELECT q_id, lbl, count(*) AS votes FROM topk GROUP BY 1, 2
)
SELECT q_id, lbl AS pred_label, votes FROM (
  SELECT q_id, lbl, votes,
         row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, lbl) AS vrn
  FROM votes
) WHERE vrn = 1
""",
    doc="kNN majority-vote classification over embeddings: top-5 cosine "
    "neighbors per query, most frequent neighbor label wins (ties → "
    "smaller label). Broadcast-query-set plan: one corpus scan + "
    "per-query window (operators/similarity.py knn_classify).",
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import knn_classify

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_classify(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10),
        "label", k=5,
    )


_SQL_STOP = r"\b(?:" + "|".join(EN_STOPWORDS) + r")\b"


@register(
    "t_quality_rules",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         len({_SQL_TOKENS.format(col='text')}) AS wc,
         len(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS chars,
         len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS symbols,
         regexp_matches(lower(text), '{_SQL_STOP}') AS has_stop
  FROM documents
), rules AS (
  SELECT doc_id,
         CAST(wc AS INT) AS word_count,
         (chars - (wc - 1)) / wc AS mean_word_len,
         symbols / wc AS symbol_ratio,
         (wc >= 5 AND wc <= 1000) AS r_word_count,
         ((chars - (wc - 1)) / wc >= 2.0
          AND (chars - (wc - 1)) / wc <= 12.0) AS r_mean_word_len,
         (symbols / wc < 0.6) AS r_symbol_ratio,
         has_stop AS r_stopword
  FROM base
)
SELECT doc_id, word_count, mean_word_len, symbol_ratio,
       r_word_count, r_mean_word_len, r_symbol_ratio, r_stopword,
       (r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_stopword)
         AS keep
FROM rules
""",
    doc="Gopher-style quality-rule filter: per-doc boolean rules "
    "(word count, mean word length, symbol ratio, stopword presence) "
    "+ conjunctive keep verdict (operators/corpus.py quality_rules).",
)
def t_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.quality_rules(docs, "doc_id", "text")


@register(
    "t_corpus_pipeline",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, text,
         len({_SQL_TOKENS.format(col='text')}) AS wc,
         len(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS chars,
         len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS symbols,
         regexp_matches(lower(text), '{{STOP}}') AS has_stop
  FROM documents
), kept AS (
  SELECT doc_id, source, text,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM base
  WHERE wc >= 5 AND wc <= 1000
    AND (chars - (wc - 1)) / wc >= 2.0 AND (chars - (wc - 1)) / wc <= 12.0
    AND symbols / wc < 0.6
    AND has_stop
), reps AS (
  SELECT fp, min(doc_id) AS rep_id FROM kept GROUP BY fp
), survivors AS (
  SELECT k.doc_id, k.source,
         CAST(len({_SQL_TOKENS.format(col='k.text')}) AS INT) AS n_tokens
  FROM kept k JOIN reps r ON r.rep_id = k.doc_id
)
SELECT source, doc_id, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (
         PARTITION BY source ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS "offset",
       CAST(floor(coalesce(sum(n_tokens) OVER (
         PARTITION BY source ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0) AS BIGINT)
         AS bin
FROM survivors
""".replace("{STOP}", _SQL_STOP),
    doc="The full pre-training corpus pipeline composed end-to-end: "
    "quality-rule filter → exact dedup (keep min-id representative) → "
    "fixed-token-budget sequence packing. One pass of per-row "
    "expressions, one dedup shuffle, one packing window — the "
    "production shape at any corpus size.",
)
def t_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    keep_ids = C.quality_rules(docs, "doc_id", "text").filter(F.col("keep")).select(
        "doc_id"
    )
    kept = docs.join(keep_ids, "doc_id")
    reps = exact_dedup(kept, "doc_id", "text").select(
        F.col("rep_id").alias("doc_id")
    )
    survivors = kept.join(reps, "doc_id")
    return C.pack_sequences(survivors, "doc_id", "text", budget=256, group_col="source")


@register(
    "t_repetition",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS.format(col='text')} AS t FROM documents
), bg AS (
  SELECT doc_id, len(t) AS n,
         list_transform(range(1, greatest(len(t), 1)),
                        i -> concat(t[i], ' ', t[i+1])) AS bigrams
  FROM toks
)
SELECT doc_id,
       CAST(CASE WHEN n >= 2 THEN len(bigrams) ELSE 0 END AS INT) AS n_bigrams,
       CASE WHEN n >= 2
            THEN 1.0 - len(list_distinct(bigrams)) / len(bigrams)
            ELSE 0.0 END AS dup_bigram_frac,
       (CASE WHEN n >= 2
             THEN 1.0 - len(list_distinct(bigrams)) / len(bigrams)
             ELSE 0.0 END) <= 0.2 AS r_repetition
FROM bg
""",
    doc="Repetition quality rule: duplicated-bigram fraction per doc "
    "(boilerplate/degenerate text repeats n-grams; natural text "
    "doesn't) — operators/corpus.py repetition_stats, shuffle-free.",
)
def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.repetition_stats(docs, "doc_id", "text", max_frac=0.2)


@register(
    "emb_quantize_int8",
    oracle="""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
  FROM embeddings
), stats AS (
  SELECT vec_id, xs,
         list_aggregate(xs, 'min') AS mn,
         list_aggregate(xs, 'max') AS mx
  FROM v
), scaled AS (
  SELECT vec_id, xs, mn, mx, (mx - mn) / 255.0 AS scale FROM stats
), q AS (
  SELECT vec_id, mn, scale,
         list_transform(xs, x -> least(floor((x - mn) / scale), 255.0)) AS qs,
         xs
  FROM scaled WHERE mx > mn
)
SELECT vec_id,
       CAST(list_sum(qs) AS BIGINT) AS q_sum,
       list_aggregate(
         list_transform(range(1, len(xs) + 1),
                        i -> abs(xs[i] - (mn + qs[i] * scale))),
         'max') AS max_err
FROM q
""",
    doc="Per-vector int8 scalar quantization (min/max affine): "
    "quantized checksum + max reconstruction error. floor() instead "
    "of round() keeps the math bit-identical across engines; stats "
    "are materialized as columns before the HOF lambdas (no CSE "
    "inside Catalyst HOFs).",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    xs = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(F.col("vec_id"), xs.alias("xs"))
    stats = base.select(
        "vec_id",
        "xs",
        F.array_min("xs").alias("mn"),
        F.array_max("xs").alias("mx"),
    ).withColumn("scale", (F.col("mx") - F.col("mn")) / F.lit(255.0))
    nonconst = stats.filter(F.col("mx") > F.col("mn"))
    mn, scale = F.col("mn"), F.col("scale")
    q = nonconst.withColumn(
        "qs",
        F.transform(F.col("xs"), lambda x: F.least(F.floor((x - mn) / scale).cast("double"), F.lit(255.0))),
    )
    err = F.zip_with(F.col("xs"), F.col("qs"), lambda x, qv: F.abs(x - (mn + qv * scale)))
    return q.select(
        "vec_id",
        F.aggregate(F.col("qs"), F.lit(0.0), lambda a, x: a + x).cast("bigint").alias("q_sum"),
        F.array_max(err).alias("max_err"),
    )


@register(
    "q_bloom_filter",
    oracle="""
WITH members AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
),
bits AS (
  SELECT list_sort(list(DISTINCT
           ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|' || i), 1, 8))::BIGINT % 1024
         )) AS set_bits
  FROM members, range(0, 3) r(i)
),
probe AS (
  SELECT c.c_custkey,
         c.c_acctbal > 9000 AS actual,
         (list_contains(b.set_bits, ('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || '|0'), 1, 8))::BIGINT % 1024)
          AND list_contains(b.set_bits, ('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || '|1'), 1, 8))::BIGINT % 1024)
          AND list_contains(b.set_bits, ('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || '|2'), 1, 8))::BIGINT % 1024))
           AS bloom_positive
  FROM customer c CROSS JOIN bits b
)
SELECT count(*) FILTER (actual) AS n_members,
       count(*) FILTER (bloom_positive) AS n_bloom_positive,
       count(*) FILTER (bloom_positive AND NOT actual) AS n_false_positive,
       (SELECT len(set_bits) FROM bits) AS n_bits_set
FROM probe
""",
    doc="Portable Bloom filter as data: k=3 md5-derived bit positions "
    "in a 1024-bit space over high-balance customers, then a full "
    "probe pass counting true members, bloom positives, and false "
    "positives. Zero false negatives by construction; the FP count is "
    "deterministic because the hash is. At 100 TB this is the "
    "broadcast semi-join pre-filter: build on the small side, probe "
    "on the fact scan — same integer expressions, no opaque binary.",
)
def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_hash64

    cust = load_table(spark, sf_dir, "customer")
    members = cust.filter(F.col("c_acctbal") > 9000)

    def bit(i):
        return F.pmod(
            md5_hash64(F.concat(F.col("c_custkey").cast("string"), F.lit(f"|{i}"))),
            F.lit(1024),
        )

    bits = (
        members.select(F.explode(F.array(bit(0), bit(1), bit(2))).alias("b"))
        .agg(F.array_sort(F.collect_set("b")).alias("set_bits"))
    )
    probe = cust.crossJoin(F.broadcast(bits)).select(
        (F.col("c_acctbal") > 9000).alias("actual"),
        (
            F.array_contains(F.col("set_bits"), bit(0))
            & F.array_contains(F.col("set_bits"), bit(1))
            & F.array_contains(F.col("set_bits"), bit(2))
        ).alias("bloom_positive"),
        F.size("set_bits").alias("nbits"),
    )
    return probe.agg(
        F.count(F.when(F.col("actual"), 1)).alias("n_members"),
        F.count(F.when(F.col("bloom_positive"), 1)).alias("n_bloom_positive"),
        F.count(F.when(F.col("bloom_positive") & ~F.col("actual"), 1)).alias(
            "n_false_positive"
        ),
        F.max("nbits").cast("bigint").alias("n_bits_set"),
    )


@register(
    "q_countmin_sketch",
    oracle="""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
counters AS (
  SELECT i AS row_id,
         ('0x' || substr(md5(word || '|' || i), 1, 8))::BIGINT % 256 AS bucket,
         count(*) AS c
  FROM words, range(0, 2) r(i)
  GROUP BY 1, 2
),
targets AS (
  SELECT unnest(['data', 'spark', 'table', 'query', 'zebra']) AS word
),
est AS (
  SELECT t.word, min(c.c) AS estimate
  FROM targets t, range(0, 2) r(i)
  JOIN counters c
    ON c.row_id = i
   AND c.bucket = ('0x' || substr(md5(t.word || '|' || i), 1, 8))::BIGINT % 256
  GROUP BY t.word
)
SELECT t.word,
       coalesce(e.estimate, 0) AS estimate,
       coalesce(x.exact_count, 0) AS exact_count
FROM targets t
LEFT JOIN est e USING (word)
LEFT JOIN (SELECT word, count(*) AS exact_count FROM words GROUP BY 1) x USING (word)
""",
    doc="Portable Count-Min sketch: depth 2 x width 256 counters from "
    "md5-derived buckets over the corpus token stream; point estimates "
    "= min over rows of the word's bucket counters, compared against "
    "exact counts (estimate >= exact always; overestimate = bucket "
    "collisions). The counter build is two shuffle-free projections + "
    "one 512-row aggregate — the mergeable heavy-hitter sketch shape "
    "for streaming/distributed counting, as data instead of an opaque "
    "binary.",
)
def q_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_hash64

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))

    def bucket(word_col, i):
        return F.pmod(
            md5_hash64(F.concat(word_col, F.lit(f"|{i}"))), F.lit(256)
        )

    pairs = words.select(
        F.posexplode(F.array(bucket(F.col("word"), 0), bucket(F.col("word"), 1))).alias(
            "row_id", "bucket"
        )
    )
    counters = pairs.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    targets = F.explode(
        F.array(*[F.lit(w) for w in ["data", "spark", "table", "query", "zebra"]])
    )
    tdf = docs.limit(1).select(targets.alias("word"))
    texp = tdf.select(
        "word",
        F.posexplode(F.array(bucket(F.col("word"), 0), bucket(F.col("word"), 1))).alias(
            "row_id", "bucket"
        ),
    )
    est = (
        texp.join(F.broadcast(counters), ["row_id", "bucket"], "left")
        .groupBy("word")
        .agg(F.min("c").alias("estimate"))
    )
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        tdf.join(est, "word", "left")
        .join(exact, "word", "left")
        .select(
            "word",
            F.coalesce("estimate", F.lit(0)).alias("estimate"),
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
        )
    )


@register(
    "q_udtf_sentence_split",
    oracle="""
SELECT doc_id,
       CAST(u.pos - 1 AS INT) AS pos,
       trim(u.s) AS sentence,
       CAST(len(trim(u.s)) AS BIGINT) AS n_chars
FROM (
  SELECT doc_id, unnest(string_split(text, '.')) AS s,
         generate_subscripts(string_split(text, '.'), 1) AS pos
  FROM documents
  WHERE doc_id < 300
) u
WHERE trim(u.s) <> ''
""",
    doc="Python UDTF surface (Spark 4 table function; the one UDF "
    "family the reference's scalar parse hook cannot express, SURVEY "
    "§2.6): a sentence splitter emitting (pos, sentence, n_chars) rows "
    "per document via a LATERAL-style table-function join. The UDTF "
    "itself is trivially deterministic so DuckDB's UNNEST replays it; "
    "the point under test is the table-function execution surface.",
)
def q_udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string, n_chars bigint", useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            pos = 0
            for part in (text or "").split("."):
                s = part.strip()
                if s:
                    yield pos, s, len(s)
                pos += 1

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    spark.udtf.register("fks_sentence_split", SentenceSplit)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.sentence, s.n_chars "
        "FROM __udtf_docs d, LATERAL fks_sentence_split(d.text) s"
    )


@register(
    "q_histogram_quantile",
    oracle="""
WITH sk AS (
  SELECT l_returnflag,
         least(999, greatest(0,
           CAST(floor((l_extendedprice - 900.0) / 105.0) AS BIGINT))) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, bin,
         sum(n) OVER (PARTITION BY l_returnflag ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS c,
         sum(n) OVER (PARTITION BY l_returnflag) AS total
  FROM sk
), qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q)
SELECT l_returnflag, q,
       900.0 + min(bin) * 105.0 AS value
FROM cum, qs
WHERE c >= CAST(ceil(q * total) AS BIGINT)
GROUP BY l_returnflag, q
""",
    doc="Mergeable histogram quantiles — the 100 TB percentile pattern: "
    "fixed integer bins (narrow map + one partial-agg shuffle, "
    "BIGINT counts merge across shards/days without re-reading data), "
    "quantile = lower bound of the first bin reaching ceil(q*N). "
    "Engine-portable where native approx sketches (GK vs t-digest) "
    "are not; error bounded by one bin width chosen up front.",
)
def q_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup import histogram_quantiles, histogram_sketch

    li = load_table(spark, sf_dir, "lineitem")
    lo, hi, bins = 900.0, 105_900.0, 1000
    sk = histogram_sketch(li, "l_extendedprice", lo, hi, bins, keys=["l_returnflag"])
    return histogram_quantiles(
        sk, [0.5, 0.95, 0.99], lo, hi, bins, keys=["l_returnflag"]
    )


@register(
    "t_streaming_hll_replay",
    oracle=f"""
WITH vals AS (
  SELECT DISTINCT event_type AS key, CAST(user_id AS VARCHAR) AS v
  FROM events
), hashed AS (
  SELECT key,
         ('0x' || substr(md5(v), 1, 8))::BIGINT AS h_hi,
         ('0x' || substr(md5(v), 9, 8))::BIGINT AS h_lo
  FROM vals
), rho AS (
  SELECT key, h_lo % 64 AS idx,
         CASE WHEN h_hi * 67108864 + h_lo // 64 > 0
              THEN 59 - length(bin(h_hi * 67108864 + h_lo // 64))
              ELSE 59 END AS r
  FROM hashed
), regs AS (
  SELECT key, idx, max(r) AS m FROM rho GROUP BY 1, 2
), sk AS (
  SELECT key,
         string_agg(idx || ':' || m, ',' ORDER BY idx) AS registers,
         CAST(count(*) AS BIGINT) AS registers_set,
         sum((1::HUGEINT << (59 - m)))
           + (64 - count(*)) * (1::HUGEINT << 59) AS inv_scaled
  FROM regs GROUP BY key
), est AS (
  SELECT key, registers, registers_set,
         (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 64.0::DOUBLE))
           * 64.0::DOUBLE * 64.0::DOUBLE
           / (CAST(inv_scaled AS DOUBLE) / 576460752303423488.0::DOUBLE)
           AS raw,
         64 - registers_set AS zeros
  FROM sk
)
SELECT e.key, e.registers, e.registers_set,
       CAST(CASE WHEN e.raw <= 2.5::DOUBLE * 64.0::DOUBLE AND e.zeros > 0
                 THEN 64.0::DOUBLE *
                      ({_PM.ln_posint_sql('CAST(64 AS BIGINT)', spark_dialect=False)}
                       - {_PM.ln_posint_sql('CAST(e.zeros AS BIGINT)', spark_dialect=False)})
                 ELSE e.raw END AS BIGINT) AS estimate_distinct,
       d.exact_distinct
FROM est e JOIN (
  SELECT event_type AS key,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
) d USING (key)
""",
    doc="Batch replay of the streaming HLL distinct monitor "
    "(streaming/stateful.py streaming_hll_distinct, p=6): reproduces, "
    "as distributed Spark expressions, exactly the register state the "
    "checkpointed sketch holds after folding every event — same 64-bit "
    "md5-prefix hash (computed from two 32-bit halves so the unsigned "
    "value never leaves BIGINT range), same idx = h & 63, same "
    "rho = 59 - bit_length(h >> 6) (bit_length as length(bin(w)), "
    "exact integer, no float log), same Flajolet estimate with "
    "linear-counting correction over an EXACT integer-scaled harmonic "
    "denominator — the correction's ln runs the PORTABLE integer ln "
    "(functions/portable_math, as 64*(ln 64 - ln zeros)) identically "
    "on all three sides (Python fold, Spark, DuckDB), closing the "
    "round-8-advice 1-ulp native-ln exception — ties-to-even final "
    "rounding (Spark bround == DuckDB double->BIGINT cast == Python "
    "round). Register folding is "
    "max-mergeable, so this at-rest aggregation equals the streaming "
    "op's final emission regardless of micro-batch boundaries — the "
    "equality pytest (tests/test_stateful_streaming.py) pins the "
    "query's registers and estimate to hll_sketch_update/hll_estimate "
    "on the same rows. Scale shape: two keyed aggs (key,idx -> key), "
    "map-side partials do the work; exact-distinct audit join is a "
    "5-row broadcast.",
)
def t_streaming_hll_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        F.col("event_type").alias("key"),
        F.col("user_id").cast("string").alias("v"),
    ).distinct()
    hashed = vals.select(
        "key",
        F.conv(F.substring(F.md5(F.col("v")), 1, 8), 16, 10)
        .cast("long")
        .alias("h_hi"),
        F.conv(F.substring(F.md5(F.col("v")), 9, 8), 16, 10)
        .cast("long")
        .alias("h_lo"),
    )
    w = F.col("h_hi") * F.lit(67108864) + F.expr("h_lo div 64")
    rho = hashed.select(
        "key",
        F.pmod(F.col("h_lo"), F.lit(64)).alias("idx"),
        F.when(w > 0, F.lit(59) - F.length(F.bin(w)))
        .otherwise(F.lit(59))
        .alias("r"),
    )
    regs = rho.groupBy("key", "idx").agg(F.max("r").alias("m"))
    sk = regs.groupBy("key").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("idx"), F.col("m")))),
                lambda s: F.concat_ws(":", s["idx"], s["m"]),
            ),
            ",",
        ).alias("registers"),
        F.count(F.lit(1)).alias("registers_set"),
        (
            F.sum(
                F.expr(
                    "CAST(shiftleft(CAST(1 AS BIGINT), 59 - m) AS DECIMAL(38,0))"
                )
            )
            + (F.lit(64) - F.count(F.lit(1))).cast("decimal(38,0)")
            * F.lit(576460752303423488).cast("decimal(38,0)")
        ).alias("inv_scaled"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(64.0))
    raw = (
        alpha
        * F.lit(64.0)
        * F.lit(64.0)
        / (F.col("inv_scaled").cast("double") / F.lit(576460752303423488.0))
    )
    zeros = F.lit(64) - F.col("registers_set")
    # linear counting via the portable integer ln (round-8 advice):
    # 64*(ln(64) - ln(zeros)) as the same fixed IEEE-op sequence the
    # Python fold (hll_estimate) and the DuckDB oracle run — the
    # engines' native ln is the one unaudited 1-ulp exception the
    # determinism contract had left
    lin = F.lit(64.0) * (
        F.expr(_PM.ln_posint_sql("CAST(64 AS BIGINT)", spark_dialect=True))
        - F.expr(
            _PM.ln_posint_sql(
                "CAST(64 - registers_set AS BIGINT)", spark_dialect=True
            )
        )
    )
    est = F.when(
        (raw <= F.lit(2.5) * F.lit(64.0)) & (zeros > 0), lin
    ).otherwise(raw)
    exact = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return (
        sk.select(
            "key",
            "registers",
            "registers_set",
            F.bround(est).cast("long").alias("estimate_distinct"),
        )
        .join(F.broadcast(exact), "key")
    )


@register(
    "t_streaming_mg_replay",
    oracle="""
WITH it AS (
  SELECT l_returnflag AS key,
         CAST(length(bin(CAST(l_quantity AS BIGINT))) - 1 AS VARCHAR) AS item
  FROM lineitem
), tot AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n FROM it GROUP BY 1
), cnt AS (
  SELECT key, item, CAST(count(*) AS BIGINT) AS exact_n FROM it GROUP BY 1, 2
)
SELECT c.key, c.item, c.exact_n, t.n AS stream_n,
       TRUE AS tracked_by_mg,
       TRUE AS lower_bound_le_exact,
       TRUE AS error_within_n_over_k
FROM cnt c JOIN tot t USING (key)
WHERE c.exact_n * 4 > t.n
""",
    doc="Batch replay + guarantee audit of the streaming Misra-Gries "
    "heavy-hitter monitor (streaming/stateful.py "
    "streaming_heavy_hitters, k=4): streams each key's rows in a "
    "fixed (l_orderkey, l_linenumber) order through the SAME pure "
    "mg_sketch_update fold the checkpoint uses, in 4096-row chunks "
    "standing in for micro-batches (state carried across chunks "
    "exactly as applyInPandasWithState carries it across batches). "
    "The MG counter walk is order-dependent, so its raw counters are "
    "not SQL-expressible; what IS exactly checkable are the sketch's "
    "THEOREMS, which hold for every order: any item with true "
    "frequency > n/k is tracked, every tracked counter lower-bounds "
    "its true count, and the undercount is at most n/k. The query "
    "emits, per guaranteed-heavy item (exact count > n/4, from a "
    "plain keyed agg both engines compute), the three guarantee "
    "booleans evaluated against the REAL fold's counters — the "
    "oracle asserts them TRUE, so any regression in the MG code "
    "hash-fails the row. Item = bit_length(quantity)-1 "
    "(length(bin(x))-1: exact-integer log2 bucketing, 6 skewed "
    "buckets > k-1=3 counters, so the decrement path is exercised). "
    "Scale shape: the fold is one linear pass per key with O(k) "
    "state, key-parallel via repartition(key) + sortWithinPartitions "
    "+ mapInPandas (bounded memory per Arrow chunk — the group is "
    "never materialized); monitored-key counts are small by "
    "construction in a heavy-hitter audit.",
)
def t_streaming_mg_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..streaming.stateful import mg_sketch_update

    K = 4
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("key"),
        (F.length(F.bin(F.col("l_quantity").cast("bigint"))) - 1)
        .cast("string")
        .alias("item"),
        "l_orderkey",
        "l_linenumber",
    )

    def _fold(pdfs):
        # rows arrive sorted by (key, l_orderkey, l_linenumber); fold
        # each key's values through mg_sketch_update in CHUNK-row
        # micro-batches, carrying the counter dict across chunks the
        # way the streaming op carries GroupState across micro-batches
        CHUNK = 4096
        counters: dict = {}
        cur_key = None
        n = 0

        def _emit():
            if cur_key is None:
                return None
            items = sorted(counters)
            return pd.DataFrame(
                {
                    "key": [cur_key] * len(items),
                    "item": items,
                    "mg_count": [int(counters[i]) for i in items],
                    "stream_n": [n] * len(items),
                }
            )

        for pdf in pdfs:
            for ko, grp in pdf.groupby("key", sort=True):
                if ko != cur_key:
                    out = _emit()
                    if out is not None:
                        yield out
                    cur_key, counters, n = ko, {}, 0
                vals = grp["item"].tolist()
                n += len(vals)
                for i in range(0, len(vals), CHUNK):
                    counters = mg_sketch_update(
                        counters, vals[i : i + CHUNK], k=K
                    )
        out = _emit()
        if out is not None:
            yield out

    folded = (
        li.repartition("key")
        .sortWithinPartitions("key", "l_orderkey", "l_linenumber")
        .mapInPandas(
            _fold, "key string, item string, mg_count long, stream_n long"
        )
        .groupBy("key", "item")
        .agg(
            F.max("mg_count").alias("mg_count"),
            F.max("stream_n").alias("stream_n"),
        )
    )
    exact = li.groupBy("key", "item").agg(F.count(F.lit(1)).alias("exact_n"))
    tot = li.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    heavy = exact.join(F.broadcast(tot), "key").filter(
        F.col("exact_n") * K > F.col("n")
    )
    return heavy.join(folded, ["key", "item"], "left").select(
        "key",
        "item",
        "exact_n",
        F.col("n").alias("stream_n"),
        F.col("mg_count").isNotNull().alias("tracked_by_mg"),
        (F.coalesce(F.col("mg_count"), F.lit(-1)) <= F.col("exact_n")).alias(
            "lower_bound_le_exact"
        ),
        (
            (F.col("exact_n") - F.coalesce(F.col("mg_count"), F.lit(0)))
            <= F.expr(f"n div {K}")
        ).alias("error_within_n_over_k"),
    )


# KMV (theta) sketch family — shared oracle CTEs: per-source distinct
# token hashes, ranked per source; mirrors operators.corpus.kmv_sketch.
_SQL_KMV_RANKED = f"""
tk AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM (SELECT source, unnest({_SQL_TOKENS.format(col='text')}) AS tok
        FROM documents) t
),
ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY source) AS nd
  FROM tk
)"""


@register(
    "t_kmv_distinct_tokens",
    oracle="WITH "
    + _SQL_KMV_RANKED
    + """
SELECT source,
       CAST(any_value(nd) AS BIGINT) AS n_exact_hashes,
       CAST(CASE WHEN any_value(nd) < 64 THEN any_value(nd)
                 ELSE (63 * 4294967296) // greatest(max(h), 1) END AS BIGINT) AS kmv_est
FROM ranked WHERE rn <= 64 GROUP BY source""",
    doc="K-minimum-values distinct-count sketch (Bar-Yossef et al. "
    "2002): each source keeps its 64 smallest md5 token hashes; the "
    "64th minimum h_k estimates the distinct vocabulary as "
    "(k-1)·2^32 div h_k — exact integer division on both engines, so "
    "unlike HLL register layouts the whole sketch is oracle-material. "
    "Output carries the audit column n_exact_hashes next to the "
    "estimate — the exact count of DISTINCT 32-BIT HASHES, identical "
    "on both engines but itself a slight undercount of true distinct "
    "tokens once vocabularies reach birthday-collision territory "
    "(~10^5); the divisor is clamped greatest(h_k, 1) on both sides "
    "against the p≈2^-32 all-zero md5 prefix. Scale shape: one "
    "(source, hash) "
    "distinct shuffle + a keyed top-k window — per-key state is O(k) "
    "however large the vocabulary, which is the point of a sketch.",
)
def t_kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sk = C.kmv_sketch(docs, "source", "text", k=64)
    per = sk.groupBy("source").agg(
        F.max("h").alias("hk"),
        F.max("nd").alias("nd"),
    )
    est = F.when(F.col("nd") < 64, F.col("nd")).otherwise(
        F.expr("(63 * 4294967296) div greatest(hk, 1)")
    )
    return per.select(
        "source",
        F.col("nd").cast("long").alias("n_exact_hashes"),
        est.cast("long").alias("kmv_est"),
    )


@register(
    "t_kmv_union_jaccard",
    oracle="WITH "
    + _SQL_KMV_RANKED
    + """,
sk AS (SELECT source, h FROM ranked WHERE rn <= 64),
srcs AS (SELECT DISTINCT source FROM documents),
pr AS (SELECT a.source AS sa, b.source AS sb
       FROM srcs a JOIN srcs b ON a.source < b.source),
members AS (
  SELECT sa, sb, sa AS member FROM pr
  UNION ALL
  SELECT sa, sb, sb AS member FROM pr
),
flagged AS (
  SELECT m.sa, m.sb, s.h,
         CASE WHEN m.member = m.sa THEN 1 ELSE 0 END AS ia,
         CASE WHEN m.member = m.sb THEN 1 ELSE 0 END AS ib
  FROM members m JOIN sk s ON s.source = m.member
),
merged AS (
  SELECT sa, sb, h, max(ia) AS in_a, max(ib) AS in_b
  FROM flagged GROUP BY 1, 2, 3
),
mr AS (
  SELECT sa, sb, h, in_a, in_b,
         row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY sa, sb) AS ntot
  FROM merged
),
agg AS (
  SELECT sa, sb, max(ntot) AS ntot, max(h) AS mk,
         CAST(sum(in_a * in_b) AS BIGINT) AS ncom
  FROM mr WHERE rn <= 64 GROUP BY 1, 2
)
SELECT sa AS src_a, sb AS src_b,
       CAST(CASE WHEN ntot < 64 THEN ntot
                 ELSE (63 * 4294967296) // greatest(mk, 1) END AS BIGINT) AS est_union,
       CAST(CASE WHEN ntot < 64 THEN ncom
                 ELSE (ncom * ((63 * 4294967296) // greatest(mk, 1))) // 64 END AS BIGINT) AS est_inter,
       CAST(CASE WHEN ntot < 64 THEN (ncom * 1000000) // ntot
                 ELSE (ncom * 1000000) // 64 END AS BIGINT) AS jaccard_ppm
FROM agg""",
    doc="Theta-sketch SET OPERATIONS: for every source pair, merge the "
    "two KMV sketches — the k smallest of the two sketch sets are "
    "provably the k smallest of the true union, so union/intersection "
    "/Jaccard estimates come from 64-row sketches without rescanning "
    "either corpus (the mergeability HLL has for unions, extended to "
    "intersections). Under-k pairs degrade to EXACT set math (the "
    "sketch IS the set). All estimates are integer divisions of md5 "
    "hashes — engine-replayable end to end. Scale shape: sketches are "
    "O(k) rows/source, so the pair grid is broadcast-size compute "
    "over 20 sources regardless of corpus size; the only corpus-sized "
    "work is the one distinct-hash shuffle the sketch build already "
    "paid.",
)
def t_kmv_union_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    sk = C.kmv_sketch(docs, "source", "text", k=64).select(
        F.col("source").alias("member"), "h"
    )
    srcs = docs.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .join(
            F.broadcast(srcs.select(F.col("source").alias("sb"))),
            F.col("sa") < F.col("sb"),
        )
    )
    members = pairs.select("sa", "sb", F.col("sa").alias("member")).unionByName(
        pairs.select("sa", "sb", F.col("sb").alias("member"))
    )
    flagged = members.join(sk, "member").select(
        "sa",
        "sb",
        "h",
        F.when(F.col("member") == F.col("sa"), 1).otherwise(0).alias("ia"),
        F.when(F.col("member") == F.col("sb"), 1).otherwise(0).alias("ib"),
    )
    merged = flagged.groupBy("sa", "sb", "h").agg(
        F.max("ia").alias("in_a"), F.max("ib").alias("in_b")
    )
    mr = (
        merged.withColumn(
            "rn", F.row_number().over(W.partitionBy("sa", "sb").orderBy("h"))
        )
        .withColumn("ntot", F.count(F.lit(1)).over(W.partitionBy("sa", "sb")))
        .filter(F.col("rn") <= 64)
    )
    agg = mr.groupBy("sa", "sb").agg(
        F.max("ntot").alias("ntot"),
        F.max("h").alias("mk"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("ncom"),
    )
    under = F.col("ntot") < 64
    return agg.select(
        F.col("sa").alias("src_a"),
        F.col("sb").alias("src_b"),
        F.when(under, F.col("ntot"))
        .otherwise(F.expr("(63 * 4294967296) div greatest(mk, 1)"))
        .cast("long")
        .alias("est_union"),
        F.when(under, F.col("ncom"))
        .otherwise(F.expr("(ncom * ((63 * 4294967296) div greatest(mk, 1))) div 64"))
        .cast("long")
        .alias("est_inter"),
        F.when(under, F.expr("(ncom * 1000000) div ntot"))
        .otherwise(F.expr("(ncom * 1000000) div 64"))
        .cast("long")
        .alias("jaccard_ppm"),
    )


@register(
    "t_kmv_anotb",
    oracle="WITH "
    + _SQL_KMV_RANKED
    + """,
sk AS (SELECT source, h FROM ranked WHERE rn <= 64),
th AS (
  SELECT source,
         CASE WHEN any_value(nd) < 64 THEN 4294967296 ELSE max(h) END AS theta
  FROM ranked WHERE rn <= 64 GROUP BY source
),
srcs AS (SELECT DISTINCT source FROM documents),
pr AS (SELECT a.source AS sa, b.source AS sb
       FROM srcs a JOIN srcs b ON a.source < b.source),
tt AS (
  SELECT pr.sa, pr.sb, least(ta.theta, tb.theta) AS theta
  FROM pr JOIN th ta ON ta.source = pr.sa JOIN th tb ON tb.source = pr.sb
),
ca AS (
  SELECT t.sa, t.sb, CAST(count(*) AS BIGINT) AS n
  FROM tt t JOIN sk a ON a.source = t.sa AND a.h < t.theta
  WHERE NOT EXISTS (SELECT 1 FROM sk b WHERE b.source = t.sb AND b.h = a.h)
  GROUP BY 1, 2
),
cb AS (
  SELECT t.sa, t.sb, CAST(count(*) AS BIGINT) AS n
  FROM tt t JOIN sk b ON b.source = t.sb AND b.h < t.theta
  WHERE NOT EXISTS (SELECT 1 FROM sk a WHERE a.source = t.sa AND a.h = b.h)
  GROUP BY 1, 2
)
SELECT t.sa AS src_a, t.sb AS src_b,
       CAST(coalesce(ca.n, 0) AS BIGINT) AS n_anotb_hashes,
       CAST(coalesce(cb.n, 0) AS BIGINT) AS n_bnota_hashes,
       CAST((coalesce(ca.n, 0) * 4294967296) // greatest(t.theta, 1)
            AS BIGINT) AS est_anotb,
       CAST((coalesce(cb.n, 0) * 4294967296) // greatest(t.theta, 1)
            AS BIGINT) AS est_bnota
FROM tt t
LEFT JOIN ca ON ca.sa = t.sa AND ca.sb = t.sb
LEFT JOIN cb ON cb.sa = t.sa AND cb.sb = t.sb""",
    doc="Theta-sketch A-not-B — the set-DIFFERENCE estimator that "
    "completes the KMV algebra (distinct: t_kmv_distinct_tokens; "
    "union/intersection/Jaccard: t_kmv_union_jaccard): per source "
    "pair, theta = min of the two sketches' k-th minima (2^32 for an "
    "unsaturated side, degrading the estimate to EXACT set math), "
    "candidates = A's sketch hashes below theta absent from B's "
    "sketch — exact membership, since B's sketch holds every B hash "
    "below its own theta >= theta — and the estimate scales "
    "candidates by 2^32 div theta in pure int64 (divisor clamped "
    "like every KMV estimator here). Both directions in one row; "
    "the retained-hash counts ride along as the audit columns. "
    "Scale shape: sketches are O(k) rows per source, so the whole "
    "pair grid is broadcast-size compute regardless of corpus size — "
    "the one corpus-sized pass is the distinct-hash shuffle the "
    "sketch build already paid.",
)
def t_kmv_anotb(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sk = C.kmv_sketch(docs, "source", "text", k=64).persist()
    th = sk.groupBy("source").agg(
        F.when(F.max("nd") < 64, F.lit(4294967296))
        .otherwise(F.max("h"))
        .cast("long")
        .alias("theta")
    )
    srcs = docs.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("sa")).join(
        F.broadcast(srcs.select(F.col("source").alias("sb"))),
        F.col("sa") < F.col("sb"),
    )
    tt = (
        pairs.join(
            F.broadcast(th.select(F.col("source").alias("sa"),
                                  F.col("theta").alias("ta"))),
            "sa",
        )
        .join(
            F.broadcast(th.select(F.col("source").alias("sb"),
                                  F.col("theta").alias("tb"))),
            "sb",
        )
        .select("sa", "sb", F.least("ta", "tb").alias("theta"))
        .persist()
    )

    def _diff_count(side: str, other: str, alias: str) -> DataFrame:
        # hashes of `side`'s sketch below theta, absent from `other`'s
        # sketch (exact membership: other's sketch holds every hash of
        # other below its own theta >= theta)
        cand = (
            tt.join(sk.select(F.col("source").alias(side), "h"), side)
            .filter(F.col("h") < F.col("theta"))
            .join(
                sk.select(F.col("source").alias(other), "h"),
                [other, "h"],
                "left_anti",
            )
        )
        return cand.groupBy("sa", "sb").agg(
            F.count(F.lit(1)).cast("long").alias(alias)
        )

    ca = _diff_count("sa", "sb", "na")
    cb = _diff_count("sb", "sa", "nb")
    return (
        tt.join(ca, ["sa", "sb"], "left")
        .join(cb, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("src_a"),
            F.col("sb").alias("src_b"),
            F.coalesce("na", F.lit(0)).cast("long").alias("n_anotb_hashes"),
            F.coalesce("nb", F.lit(0)).cast("long").alias("n_bnota_hashes"),
            F.expr(
                "(coalesce(na, CAST(0 AS BIGINT)) * 4294967296)"
                " div greatest(theta, 1)"
            )
            .cast("long")
            .alias("est_anotb"),
            F.expr(
                "(coalesce(nb, CAST(0 AS BIGINT)) * 4294967296)"
                " div greatest(theta, 1)"
            )
            .cast("long")
            .alias("est_bnota"),
        )
    )


@register(
    "q_hist_quantile_sketch",
    oracle="""
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
),
st AS (
  SELECT flag, min(c) AS mn, max(c) AS mx, CAST(count(*) AS BIGINT) AS n,
         round(quantile_cont(c, 0.50), 6) AS ex50,
         round(quantile_cont(c, 0.95), 6) AS ex95
  FROM v GROUP BY 1
),
b AS (
  SELECT v.flag, ((v.c - st.mn) * 64) // (st.mx - st.mn + 1) AS bin
  FROM v JOIN st USING (flag)
),
bc AS (SELECT flag, bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
cum AS (
  SELECT flag, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM bc
),
qq AS (
  SELECT c.flag, c.bin, c.cnt, c.cum - c.cnt AS cum_before, q.q,
         ((st.n - 1) * q.q) // 100 AS r,
         st.mn, st.mx, st.ex50, st.ex95
  FROM cum c JOIN st USING (flag), (VALUES (50), (95)) q(q)
)
SELECT flag AS l_returnflag,
       CAST(q AS BIGINT) AS q_pct,
       CAST(mn + (bin * (mx - mn + 1)) // 64
            + ((r - cum_before)
               * (((bin + 1) * (mx - mn + 1)) // 64 - (bin * (mx - mn + 1)) // 64))
              // cnt AS BIGINT) AS est_cents,
       CASE WHEN q = 50 THEN ex50 ELSE ex95 END AS exact_cents
FROM qq
WHERE cum_before <= r AND r < cum_before + cnt""",
    doc="Mergeable histogram-quantile SKETCH next to its exact audit: "
    "per return flag, a fixed 64-bin equi-width histogram of price "
    "cents (floor(x*100+0.5) — identical integerization on both "
    "engines) estimates p50/p95 by in-bin linear interpolation in "
    "PURE int64 arithmetic (bin edges, ranks and the interpolation "
    "are all truncating divisions — `div`/`//` parity), with the "
    "exact interpolated percentile beside it so the error is the "
    "query's own output. This is the scale path the exact "
    "sort-based percentile (q_percentile_qty) can't take: histograms "
    "partial-aggregate map-side, merge across partitions/batches by "
    "vector addition, and hold O(bins) state per key — the "
    "deterministic stand-in for approx_percentile's opaque sketch. "
    "Quantile targets arrive by Generate (explode of a 2-element "
    "array), not a join.",
)
def q_hist_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("c"),
    )
    st = v.groupBy("flag").agg(
        F.min("c").alias("mn"),
        F.max("c").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("c", F.lit(0.50)), 6).alias("ex50"),
        F.round(F.percentile("c", F.lit(0.95)), 6).alias("ex95"),
    )
    b = v.join(F.broadcast(st.select("flag", "mn", "mx")), "flag").select(
        "flag", F.expr("((c - mn) * 64) div (mx - mn + 1)").alias("bin")
    )
    bc = b.groupBy("flag", "bin").agg(F.count(F.lit(1)).alias("cnt"))
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
    est = F.expr(
        "CAST(mn + (bin * (mx - mn + 1)) div 64"
        " + ((r - cum_before)"
        " * (((bin + 1) * (mx - mn + 1)) div 64 - (bin * (mx - mn + 1)) div 64))"
        " div cnt AS BIGINT)"
    )
    return (
        qq.filter(
            (F.col("cum_before") <= F.col("r"))
            & (F.col("r") < F.col("cum_before") + F.col("cnt"))
        )
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("q").cast("long").alias("q_pct"),
            est.alias("est_cents"),
            F.when(F.col("q") == 50, F.col("ex50"))
            .otherwise(F.col("ex95"))
            .alias("exact_cents"),
        )
    )

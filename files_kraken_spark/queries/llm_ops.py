"""LLM training-data pipeline queries: text analysis, dedup,
similarity search, multimodal — over ``documents`` / ``embeddings``.

Oracle notes:
- Tokenization/shingling SQL mirrors ``functions.text`` exactly
  (split on \\s+, drop empties, k-word shingles).
- MinHash / SimHash use the portable md5-prefix integer hash so the
  DuckDB oracle reproduces signatures bit-for-bit (pure int math).
- Cosine oracles compute in DOUBLE (DuckDB's list_cosine_similarity
  is float32 — not used).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import portable_math as _PM
from ..functions import text as T
from ..operators import dedup as DD
from ..operators import multimodal as MM
from ..operators import similarity as SIM
from ..operators.dedup import MINHASH_P, _perm_constants
from ..sources.tables import load_table
from . import register
from ._sql_fragments import SQL_TOKENS as _SQL_TOKENS, SQL_STOPWORD_PAT as _SQL_STOPWORD_PAT, SQL_COS as _SQL_COS, SQL_UNIT as _SQL_UNIT, SQL_DOT as _SQL_DOT  # noqa: E501

# Shared SQL fragments — keep in lockstep with functions/text.py.



@register(
    "t_token_stats",
    oracle=f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len({_SQL_TOKENS.format(col='text')})) AS BIGINT) AS total_tokens,
       avg(n_chars) AS avg_chars
FROM documents
GROUP BY source
""",
    doc="Token counting (whitespace) aggregated per source.",
)
def t_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).alias("total_tokens"),
        F.avg("n_chars").alias("avg_chars"),  # int avg: bit-equal
    )


@register(
    "t_bpe_token_count",
    oracle="""
SELECT source,
       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
         AS bpe_tokens
FROM documents
GROUP BY source
""",
    doc="BPE-ish sub-word token counting via boundary regex.",
)
def t_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(T.bpe_ish_token_count(F.col("text"))).alias("bpe_tokens")
    )


@register(
    "t_lang_id",
    oracle=f"""
SELECT lang AS labeled_lang,
       CASE WHEN len(regexp_extract_all(lower(text), '{_SQL_STOPWORD_PAT}'))
                 >= 0.05 * len({_SQL_TOKENS.format(col='text')})
            AND len({_SQL_TOKENS.format(col='text')}) > 0
            THEN 'en' ELSE 'unknown' END AS predicted_lang,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
""",
    doc="Language-ID heuristic: EN-stopword density over tokens, compared "
    "against the labeled lang column.",
)
def t_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            T.lang_id(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "t_quality_score",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         least(len({_SQL_TOKENS.format(col='text')}) / 50.0, 1.0) AS len_score,
         1.0 - least(coalesce(
             length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))
               * 1.0 / nullif(length(text), 0), 0.0) * 5.0, 1.0) AS punct_score,
         CASE WHEN coalesce(list_sum(list_transform({_SQL_TOKENS.format(col='text')},
                                x -> length(x))) * 1.0
                    / nullif(len({_SQL_TOKENS.format(col='text')}), 0), 0.0)
                   BETWEEN 3.0 AND 8.0
              THEN 1.0 ELSE 0.5 END AS word_score
  FROM documents
)
SELECT doc_id, (len_score + punct_score + word_score) / 3.0 AS quality
FROM scored
""",
    doc="Composite quality score: length / punctuation-density / word-length "
    "band — deterministic arithmetic, oracle-verified per document.",
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


@register(
    "t_fingerprint",
    oracle="""
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
""",
    doc="Document fingerprint: md5 of whitespace-normalized lowercased text "
    "(md5 → cross-engine identical digests).",
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


@register(
    "dedup_exact",
    oracle="""
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS rep_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
""",
    doc="Exact dedup: hash-groupBy on normalized text, min-id representative.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.exact_dedup(docs, "doc_id", "text")


# Shingle CTEs shared by the Jaccard / MinHash oracles (k=3 word shingles).
_SQL_SHINGLES = f"""
toks AS (
  SELECT doc_id, {_SQL_TOKENS.format(col='text')} AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b, inter * 1.0 / (s1.n + s2.n - inter) AS jaccard
  FROM pairs
  JOIN sizes s1 ON s1.doc_id = id_a
  JOIN sizes s2 ON s2.doc_id = id_b
)
"""

# Containment-path variant: docs with 1 <= tokens < k contribute their
# WHOLE text as one shingle (pad_short contract — a sub-k doc pasted
# into a book is the short-in-long case containment exists to catch).
# Jaccard/MinHash keep the sub-k-docs-have-no-shingles convention above.
_SQL_SHINGLES_PAD = f"""
toks AS (
  SELECT doc_id, {_SQL_TOKENS.format(col='text')} AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
    UNION ALL
    SELECT doc_id, array_to_string(t, ' ') AS shingle
    FROM toks WHERE len(t) >= 1 AND len(t) < 3
  )
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_SQL_SHINGLES}
SELECT id_a, id_b, jaccard
FROM jac WHERE jaccard >= 0.8
""",
    doc="N-gram (3-word shingle) Jaccard near-dup pairs via inverted-index "
    "join — no cross join; only docs sharing a shingle ever meet.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)


def _minhash_sql(num_hashes: int = 16, seed: int = 42) -> str:
    consts = _perm_constants(num_hashes, seed)
    mins = ",\n         ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}" for i, (a, b) in enumerate(consts)
    )
    return f"""
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
  FROM sh
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
)
"""


def _band_sql(num_hashes: int = 16, bands: int = 4) -> str:
    rows = num_hashes // bands
    selects = []
    for bi in range(bands):
        cols = ", ".join(f"mh{bi * rows + r}" for r in range(rows))
        selects.append(
            f"SELECT doc_id, concat_ws('_', {bi}, {cols}) AS band_key FROM sig"
        )
    return "banded AS (\n" + "\nUNION ALL\n".join(selects) + "\n)"


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_SQL_SHINGLES},
{_minhash_sql(16, 42).strip().rstrip()}
,
{_band_sql(16, 4)},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b, j.jaccard
FROM cand c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
WHERE j.jaccard >= 0.8
""",
    doc="MinHash(16)+LSH(4 bands) near-dup: shingle→minhash→band→bucket-join "
    "candidates, verified by exact Jaccard. Portable md5-based integer "
    "hashes → oracle reproduces signatures exactly.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(
        docs, "doc_id", "text", k_shingle=3, num_hashes=16, bands=4, threshold=0.8
    )


@register(
    "dedup_incremental",
    oracle=f"""
WITH {_SQL_SHINGLES},
{_minhash_sql(16, 42).strip().rstrip()}
,
{_band_sql(16, 4)},
cand AS (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
                  greatest(a.doc_id, b.doc_id) AS id_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id <> b.doc_id
  WHERE a.doc_id >= 400
)
SELECT c.id_a, c.id_b, j.jaccard
FROM cand c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
WHERE j.jaccard >= 0.8
""",
    doc="Incremental micro-batch dedup: MinHash-LSH pairs touching at "
    "least one NEW doc (ids ≥ 400 = the batch) — new-vs-corpus and "
    "new-vs-new, never corpus×corpus; per-batch cost is O(batch), "
    "the shape a streaming ingest pipeline needs "
    "(operators/dedup.py minhash_lsh_incremental).",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "is_new", F.col("doc_id") >= 400
    )
    return DD.minhash_lsh_incremental(
        docs, "doc_id", "text", "is_new", k_shingle=3, num_hashes=16, bands=4,
        threshold=0.8,
    )


def _simhash_sql(bits: int = 16) -> str:
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    packed = " + ".join(f"(CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS.format(col='text')} AS t FROM documents
),
tok AS (SELECT doc_id, u.tok FROM toks, UNNEST(t) AS u(tok)),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM tok
),
sums AS (
  SELECT doc_id,
         {bit_sums}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM sums
"""


@register(
    "dedup_simhash",
    oracle=_simhash_sql(16),
    doc="SimHash(16-bit) sketch per document over tokens — portable integer "
    "math, oracle-verified bit-for-bit.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.simhash(docs, "doc_id", "text", bits=16)


# Double-math cosine fragment: index-ordered product sum (matches Spark
# zip_with+aggregate evaluation order).



@register(
    "sim_cosine_topk",
    oracle=f"""
WITH u AS (SELECT vec_id, {_SQL_UNIT.format(a='embedding')} AS un FROM embeddings),
q AS (SELECT vec_id AS q_id, un AS qu FROM u WHERE vec_id < 5),
scored AS (
  SELECT q_id, c.vec_id AS cand_id,
         {_SQL_DOT.format(a='qu', b='c.un')} AS cos
  FROM u c, q
  WHERE c.vec_id <> q_id
),
ranked AS (
  SELECT q_id, cand_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
  FROM scored
)
SELECT q_id, cand_id FROM ranked WHERE rn <= 10
""",
    doc="Brute-force cosine top-10 for 5 query vectors (exact ANN baseline): "
    "broadcast query set, single corpus scan, per-query window top-k.",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(emb.filter(F.col("vec_id") < 5), emb, k=10)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_SQL_COS.format(a='a.embedding', b='b.embedding')} >= 0.45
""",
    doc="Embedding-cosine near-dup pairs (threshold 0.45). Exact O(n²) "
    "baseline; lsh_bucketed_pairs is the 100 TB path (rows-only check).",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs_above(emb, threshold=0.45)


def _lsh_oracle_sql(n_planes: int = 6, dim: int = 64, threshold: float = 0.40) -> str:
    """Replicate the fixed hyperplane signatures in SQL: the planes are
    deterministic constants, dot products are sequential double sums on
    both engines → identical sign bits."""
    from ..operators.similarity import _planes

    planes = _planes(n_planes, dim)
    bits = []
    for p in planes:
        consts = "[" + ", ".join(repr(v) for v in p) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({consts})[i]))"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END)")
    sig = " || ".join(bits)
    return f"""
WITH sigs AS (
  SELECT vec_id, {_SQL_UNIT.format(a='embedding')} AS un, {sig} AS sig FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE {_SQL_DOT.format(a='a.un', b='b.un')} >= {threshold}
"""


@register(
    "sim_lsh_bucketed",
    oracle=_lsh_oracle_sql(6, 64, 0.40),
    doc="Random-hyperplane LSH bucketed near-dup (approximate scale path: "
    "candidates only within signature buckets, expected n²/2^planes "
    "work). Deterministic fixed planes → the oracle reproduces the "
    "signatures exactly.",
)
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.lsh_bucketed_pairs(emb, dim=64, n_planes=6, threshold=0.40)


@register(
    "t_redact",
    oracle="""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
         '\\b[a-z]+[0-9]+\\b', '<ID>', 'g') AS redacted,
       len(regexp_extract_all(text, '[0-9]+')) AS n_hits
FROM documents
WHERE doc_id < 100
""",
    doc="PII-style scrubbing: global regex redaction passes (numbers → "
    "<NUM>, alphanumeric ids → <ID>) with hit accounting — the "
    "training-data sanitization primitive.",
)
def t_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    step1 = F.regexp_replace(F.col("text"), r"[0-9]+", "<NUM>")
    step2 = F.regexp_replace(step1, r"\b[a-z]+[0-9]+\b", "<ID>")
    return docs.select(
        "doc_id",
        step2.alias("redacted"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), F.lit(0))).alias(
            "n_hits"
        ),
    )


@register(
    "dedup_keep_best",
    oracle=f"""
WITH RECURSIVE {_SQL_SHINGLES.strip().rstrip()},
jpairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM jpairs
          UNION ALL SELECT id_b, id_a FROM jpairs),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
),
comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
members AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, d.n_chars
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
),
ranked AS (
  SELECT doc_id, component,
         row_number() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM members
)
SELECT doc_id, component FROM ranked WHERE rn = 1
""",
    doc="End-to-end dedup keep-policy: near-dup pairs → connected "
    "components → keep ONE representative per group (longest doc, "
    "id tiebreak). The full pipeline a corpus dedup actually ships.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    # persist: the pair set seeds every component-propagation round
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8).persist()
    comp = DD.connected_components(pairs)
    members = docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        "n_chars",
    )
    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "component")
    )


@register(
    "t_clean_corpus",
    oracle=f"""
SELECT source,
       count(*) AS n_total,
       count(*) FILTER (WHERE lang = 'en') AS n_en,
       count(*) FILTER (
         WHERE lang = 'en'
           AND len({_SQL_TOKENS.format(col='text')}) BETWEEN 20 AND 200
       ) AS n_kept
FROM documents
GROUP BY source
""",
    doc="Corpus-cleaning funnel: language filter + token-length band, "
    "accounted per source (the yield report every data pipeline needs).",
)
def t_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = T.token_count(F.col("text"))
    is_en = F.col("lang") == "en"
    kept = is_en & n_tok.between(20, 200)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(is_en, 1)).alias("n_en"),
        F.count(F.when(kept, 1)).alias("n_kept"),
    )


@register(
    "dedup_cluster_components",
    oracle=f"""
WITH RECURSIVE {_SQL_SHINGLES.strip().rstrip()},
jpairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM jpairs
          UNION ALL SELECT id_b, id_a FROM jpairs),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
)
SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n
""",
    doc="Near-dup clustering: connected components over the Jaccard≥0.8 "
    "pair graph (iterative min-label propagation in Spark; recursive-CTE "
    "transitive closure as the oracle). Turns pairwise dedup matches "
    "into keep-one-per-group decisions.",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    return DD.connected_components(pairs)


@register(
    "dedup_cluster_star",
    oracle=f"""
WITH RECURSIVE {_SQL_SHINGLES.strip().rstrip()},
jpairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM jpairs
          UNION ALL SELECT id_b, id_a FROM jpairs),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
)
SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n
""",
    doc="Same component semantics via the O(log n)-round large-star/"
    "small-star contraction (Kiveris et al. SoCC'14) — the variant "
    "that survives long transitive near-dup chains where "
    "O(diameter) label propagation needs too many rounds.",
)
def dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    return DD.connected_components_star(pairs)


@register(
    "q_json_extract",
    oracle="""
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_total,
       count(json_extract_string(props, '$.k')) AS k_present
FROM events
GROUP BY event_type
""",
    doc="Semi-structured JSON column extraction (get_json_object) with "
    "typed aggregation.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return events.groupBy("event_type").agg(
        F.sum(k.cast("int")).alias("k_total"),
        F.count(k).alias("k_present"),
    )


@register(
    "emb_centroids",
    oracle="""
SELECT label, i - 1 AS dim,
       round(sum(CAST(embedding[i] AS DOUBLE)), 6) AS dim_sum,
       count(*) AS n
FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
GROUP BY label, i
""",
    doc="Per-cluster centroid building block: per-dimension sums over "
    "float embeddings (posexplode + groupBy — the distributed reduction "
    "a k-means/IVF trainer needs). Sums rounded at 1e-6 (float inputs "
    "are ~1e-8 grain, accumulation error ~1e-13).",
)
def emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.sum(F.col("v").cast("double")), 6).alias("dim_sum"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id AS media_id,
       CAST(u.f AS BIGINT) AS frame_no,
       CAST(16 AS BIGINT) AS frame_len
FROM documents, UNNEST(range(0, octet_length(encode(text)) // 16, 2)) AS u(f)
""",
    doc="Multimodal frame sampling: binary payload → every 2nd 16-byte "
    "'frame' via Arrow-batched mapInPandas fan-out (decoder stubbed; "
    "schema/fan-out shape real; the frame grid is byte-deterministic "
    "so the oracle reproduces it).",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_binary(docs, "doc_id", "text", "video")
    return MM.sample_frames(media, frame_bytes=16, stride=2).select(
        "media_id", "frame_no", "frame_len"
    )


@register(
    "mm_binary_meta",
    oracle="""
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS byte_len,
       sha256(text) AS sha_hex
FROM documents
""",
    doc="Multimodal binary-column plumbing: typed metadata (byte length, "
    "content hash) over opaque binary payloads.",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_binary(docs, "doc_id", "text", "image")
    return media.select(
        "media_id", "byte_len", F.col("sha256").alias("sha_hex")
    )


@register(
    "mm_resize",
    oracle="""
SELECT doc_id AS media_id,
       least(octet_length(encode(text)), 64) AS byte_len,
       sha256(substr(text, 1, 64)) AS sha_hex
FROM documents
""",
    doc="Multimodal resize plumbing: deterministic byte-truncation stub "
    "standing in for an image resize (operators/multimodal.py "
    "resize_stub) — schema + hash metadata stay consistent through the "
    "mapInPandas pass. Oracle truncates CHARS (= bytes: the corpus is "
    "pure ASCII, asserted in the doc) and re-hashes.",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_binary(docs, "doc_id", "text", "image")
    small = MM.resize_stub(media, target_bytes=64)
    return small.select("media_id", "byte_len", F.col("sha256").alias("sha_hex"))


@register(
    "mm_feature_extract",
    oracle="""
SELECT doc_id AS media_id,
       'image' AS modality,
       octet_length(encode(text)) AS byte_len,
       CAST(CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) % 8 + 1 AS BIGINT)
         AS feat_dim,
       CAST(CAST(('0x' || substr(sha256(text), 3, 16)) AS UBIGINT)
            % 4611686018427387904 AS BIGINT) AS feat_checksum
FROM documents
""",
    doc="Multimodal feature extraction: Arrow-batched mapInPandas over "
    "binary media rows (decode stubbed via sha256-derived deterministic "
    "features — the oracle recomputes them from digest hex slices; "
    "schema, batch shape, and partitioning are the real thing).",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_binary(docs, "doc_id", "text", "image")
    return MM.extract_features(media)


@register(
    "t_span_dedup",
    oracle="""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
chunks AS (
  SELECT doc_id, CAST(r.range AS BIGINT) AS pos,
         array_to_string(
           list_slice(words, CAST(r.range AS INT) * 16 + 1,
                      (CAST(r.range AS INT) + 1) * 16), ' ') AS chunk
  FROM docs, range(0, 64) r
  WHERE r.range * 16 < len(words)
),
ranked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM chunks
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '')
         AS kept_text
FROM ranked
GROUP BY doc_id
""",
    doc="Span-level exact dedup (Lee et al. 2021 at 16-word-chunk "
    "granularity): first corpus-wide occurrence of each chunk wins, "
    "documents are reassembled from surviving chunks. One window "
    "shuffle on the chunk key + one group-back; the oracle's static "
    "range(0,64) bound exists only because SQL lacks a data-driven "
    "sequence — the Spark side sizes chunks from the data.",
)
def t_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.span_dedup(docs, id_col="doc_id", text_col="text", span_words=16)


@register(
    "t_tfidf_top_terms",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
dfreq AS (SELECT word, count(DISTINCT doc_id) AS dfq FROM words GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, word, score FROM (
  SELECT doc_id, word,
         CAST(tf * n_docs AS DOUBLE) / dfq AS score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY CAST(tf * n_docs AS DOUBLE) / dfq DESC, word) AS rn
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
) WHERE rn <= 3
""",
    doc="Per-document top-3 terms by tf-idf. The idf factor is the "
    "exact rational N/df (no log) so the score is one IEEE division "
    "on both engines — bit-equal, deterministic tie-break on the "
    "term. Plan: token explode, two partial-agg shuffles (term "
    "frequency, document frequency), broadcast of the tiny df side, "
    "one window for the top-k.",
)
def t_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("word").agg(F.count_distinct("doc_id").alias("dfq"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("dfq")
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word"))
    return (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "word", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "score")
    )


def _semdedup_oracle_sql(n_planes: int = 5, dim: int = 64, threshold: float = 0.40) -> str:
    from ..operators.similarity import _planes

    planes = _planes(n_planes, dim)
    bits = []
    for p in planes:
        consts = "[" + ", ".join(repr(v) for v in p) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({consts})[i]))"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END)")
    sig = " || ".join(bits)
    return f"""
WITH sigs AS (
  SELECT vec_id, {_SQL_UNIT.format(a='embedding')} AS un, {sig} AS cell FROM embeddings
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM sigs a JOIN sigs b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_SQL_DOT.format(a='a.un', b='b.un')} >= {threshold}
)
SELECT vec_id AS id, cell,
       vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
FROM sigs
"""


@register(
    "sem_dedup",
    oracle=_semdedup_oracle_sql(5, 64, 0.40),
    doc="Semantic dedup (SemDeDup, Abbas et al. 2023): deterministic "
    "hyperplane cells stand in for k-means clusters, exact cosine "
    "only within cells, greedy drop of every vector duplicating a "
    "lower-id cell-mate. Labels every row kept/dropped — the "
    "production corpus op is a semi-join of the corpus against the "
    "kept ids.",
)
def sem_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.semdedup(emb, dim=64, n_planes=5, threshold=0.40)


@register(
    "q_variant_json",
    oracle="""
SELECT event_type,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)
                * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sumsq
FROM events
GROUP BY event_type
""",
    doc="Semi-structured ingestion through Spark 4's VARIANT type: "
    "parse_json once into a variant column, typed variant_get "
    "extraction, aggregate. Unlike string get_json_object "
    "(q_json_extract) the variant parses each document ONCE into a "
    "binary-encoded tree that all downstream path reads share — the "
    "right 100 TB shape when many fields are extracted from one "
    "payload. The variant column is materialized before aggregation "
    "(no CSE across aggregate expressions).",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    with_k = events.select(
        "event_type",
        F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint").alias("k"),
    )
    return with_k.groupBy("event_type").agg(
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.sum(F.col("k") * F.col("k")).alias("k_sumsq"),
    )


def _kmeans_oracle_sql(
    k: int = 8, iters: int = 2, dim: int = 64, where: str = ""
) -> str:
    """Unroll Lloyd's iterations into chained CTEs. Determinism mirrors
    the operator: init = k lowest-id vectors; centroid coordinate =
    round(sum, 6)/count (exact at that grain on both engines);
    distances and argmins then match bit-for-bit, ties to lower cell.
    ``where`` (e.g. ``" WHERE vec_id % 10 < 8"``) restricts training to
    a base subset — the incremental-maintenance oracles train on the
    base split and assign the held-out batch against frozen centroids."""
    assign = """
a{n} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, {dim} + 1),
               i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))), c.cell) AS rn
    FROM emb e CROSS JOIN c{n} c
  ) WHERE rn = 1
)"""
    update = """
c{n1} AS (
  SELECT cell, list(mu ORDER BY dim) AS cvec
  FROM (
    SELECT a.cell, i AS dim, round(sum(e.v[i]), 6) / count(*) AS mu
    FROM a{n} a JOIN emb e USING (vec_id), range(1, {dim} + 1) r(i)
    GROUP BY a.cell, i
  ) GROUP BY cell
)"""
    ctes = [
        f"emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings{where})",
        f"""c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT {k})
)""",
    ]
    for n in range(iters):
        ctes.append(assign.format(n=n, dim=dim).strip())
        if n < iters - 1:
            ctes.append(update.format(n=n, n1=n + 1, dim=dim).strip())
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a{iters - 1}"
    )


@register(
    "emb_kmeans_cells",
    oracle=_kmeans_oracle_sql(8, 2, 64),
    doc="Distributed Lloyd's k-means (k=8, 2 rounds) cell assignment "
    "over the embedding corpus — the trainer behind a real IVF index. "
    "Deterministic across engines via the rounded-mean policy, so the "
    "oracle replays the iterations as unrolled SQL. Per round: "
    "broadcast k centroids, map-only argmin scan, one (cell, dim) "
    "partial-agg shuffle.",
)
def emb_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.kmeans_fit_predict(emb, k=8, iters=2)


@register(
    "sem_dedup_kmeans",
    oracle=_kmeans_oracle_sql(8, 2, 64).replace(
        "\nSELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a1",
        """,
cells AS (SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a1),
sigs AS (
  SELECT c.vec_id, c.cell, """
        + _SQL_UNIT.format(a="e.embedding")
        + """ AS un
  FROM cells c JOIN embeddings e USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM sigs a JOIN sigs b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE """
        + _SQL_DOT.format(a="a.un", b="b.un")
        + """ >= 0.40
)
SELECT vec_id AS id, cell,
       vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
FROM sigs""",
    ),
    doc="SemDeDup in the paper's exact form: k-means cells (k=8, 2 "
    "Lloyd's rounds — emb_kmeans_cells) instead of hyperplane cells, "
    "then in-cell cosine with greedy lower-id-wins dropping. The "
    "oracle replays the full pipeline (unrolled k-means + pair scan) "
    "in SQL.",
)
def sem_dedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.semdedup_kmeans(emb, k=8, iters=2, threshold=0.40)


@register(
    "sim_ivf_trained_topk",
    oracle=_kmeans_oracle_sql(8, 2, 64).replace(
        "\nSELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a1",
        """,
cents AS (
  SELECT cell, list(mu ORDER BY dim) AS centroid
  FROM (
    SELECT a.cell, i AS dim, round(sum(e.v[i]), 6) / count(*) AS mu
    FROM a1 a JOIN emb e USING (vec_id), range(1, 65) r(i)
    GROUP BY a.cell, i
  ) GROUP BY cell
),
u AS (SELECT vec_id, """
        + _SQL_UNIT.format(a="embedding")
        + """ AS un FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv, un AS qu
      FROM emb JOIN u USING (vec_id) WHERE vec_id < 8),
probed AS (
  SELECT q_id, cell, qu FROM (
    SELECT q.q_id, c.cell, q.qu,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             list_sum(list_transform(range(1, 65),
               i -> (q.qv[i] - c.centroid[i]) * (q.qv[i] - c.centroid[i]))), c.cell) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn = 1
),
scored AS (
  SELECT p.q_id, a.vec_id AS cand_id,
         """
        + _SQL_DOT.format(a="p.qu", b="e2.un")
        + """ AS cos
  FROM probed p
  JOIN a1 a ON a.cell = p.cell AND a.vec_id <> p.q_id
  JOIN u e2 ON e2.vec_id = a.vec_id
)
SELECT q_id, cand_id FROM (
  SELECT q_id, cand_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
  FROM scored
) WHERE rn <= 5""",
    ),
    doc="Trained-IVF ANN: k-means the corpus (2 Lloyd's rounds), probe "
    "each query's nearest centroid, exact cosine top-5 within the "
    "probed cell — the full production train/assign/probe recipe, "
    "corpus-sublinear per query (k distances + n/k cosines). Oracle "
    "replays train + probe as unrolled SQL.",
)
def sim_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select("vec_id")
    return SIM.ivf_topk_trained(emb, q, k=8, iters=2, topk=5)


def _pq_oracle_sql(
    m: int = 4, ksub: int = 8, iters: int = 2, dim: int = 64, where: str = ""
) -> str:
    """Unrolled product-quantization training (per-subspace Lloyd's) as
    chained CTEs — mirrors ``operators.similarity.pq_train_encode``
    exactly: init = ksub lowest-id subvectors per subspace, means =
    round(sum,6)/count, argmin ties to the lower code, empty codewords
    carry their previous centroid (dense grid). Ends with ``codes`` /
    ``cb{last}`` CTEs for queries to build on. ``where`` restricts
    training to a base subset (incremental-maintenance oracles)."""
    w = dim // m
    assign = """
a{n} AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
             list_sum(list_transform(range(1, {w} + 1),
               i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), c.code) AS rn
    FROM sub s JOIN cb{n} c USING (m)
  ) WHERE rn = 1
)"""
    update = """
cb{n1} AS (
  SELECT c.m, c.code, coalesce(u.cv2, c.cv) AS cv
  FROM cb{n} c LEFT JOIN (
    SELECT m, code, list(mu ORDER BY dim) AS cv2
    FROM (
      SELECT a.m, a.code, i AS dim, round(sum(s.sv[i]), 6) / count(*) AS mu
      FROM a{n} a JOIN sub s USING (vec_id, m), range(1, {w} + 1) r(i)
      GROUP BY a.m, a.code, i
    ) GROUP BY m, code
  ) u ON u.m = c.m AND u.code = c.code
)"""
    ctes = [
        f"emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings{where})",
        f"""sub AS (
  SELECT vec_id, m, v[m * {w} + 1 : (m + 1) * {w}] AS sv
  FROM emb, range(0, {m}) r(m)
)""",
        f"""cb0 AS (
  SELECT m, rn - 1 AS code, sv AS cv FROM (
    SELECT m, sv, row_number() OVER (PARTITION BY m ORDER BY vec_id) AS rn
    FROM sub
  ) WHERE rn <= {ksub}
)""",
    ]
    for n in range(iters):
        ctes.append(assign.format(n=n, w=w).strip())
        if n < iters - 1:
            ctes.append(update.format(n=n, n1=n + 1, w=w).strip())
    ctes.append(
        f"codes AS (\n  SELECT vec_id, list(code ORDER BY m) AS cl FROM a{iters - 1} GROUP BY vec_id\n)"
    )
    return "WITH " + ",\n".join(ctes)


@register(
    "emb_pq_codes",
    oracle=_pq_oracle_sql(4, 8, 2, 64)
    + """
SELECT vec_id,
       array_to_string(list_transform(cl, x -> CAST(x AS VARCHAR)), ',') AS codes
FROM codes""",
    doc="Product-quantization encoding (Jégou et al. 2011): 4 subspaces "
    "× 8 codewords trained in one joint Lloyd's pass, each vector "
    "becomes 4 small ints — the 64x-compressed store an ANN scan reads "
    "instead of raw floats. Oracle unrolls the per-subspace k-means.",
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    codes, _ = SIM.pq_train_encode(emb, m=4, ksub=8, iters=2, dim=64)
    return codes.select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), ",").alias(
            "codes"
        ),
    )


@register(
    "sim_pq_topk",
    oracle=_pq_oracle_sql(4, 8, 2, 64)
    + """,
q AS (SELECT vec_id AS q_id, m, sv AS qsv FROM sub WHERE vec_id < 8),
lut AS (
  SELECT q.q_id, c.m * 8 + c.code AS pos,
         list_sum(list_transform(range(1, 17),
           i -> (q.qsv[i] - c.cv[i]) * (q.qsv[i] - c.cv[i]))) AS d
  FROM q JOIN cb1 c USING (m)
),
lutl AS (SELECT q_id, list(d ORDER BY pos) AS l FROM lut GROUP BY q_id),
scored AS (
  SELECT l.q_id, cd.vec_id AS cand_id,
         list_sum(list_transform(range(0, 4),
           mm -> l.l[mm * 8 + cd.cl[mm + 1] + 1])) AS ad
  FROM codes cd CROSS JOIN lutl l
  WHERE cd.vec_id <> l.q_id
)
SELECT q_id, cand_id FROM (
  SELECT q_id, cand_id,
         row_number() OVER (PARTITION BY q_id ORDER BY ad, cand_id) AS rn
  FROM scored
) WHERE rn <= 5""",
    doc="PQ ANN via asymmetric distance computation: per-query LUT of "
    "exact subvector-to-codeword distances (m·ksub doubles, broadcast), "
    "candidates scored as the subspace-ordered sum of LUT entries "
    "picked by their codes — the scan reads ONLY the compressed code "
    "column. Single shuffle = per-query top-k window. Compose with "
    "k-means cells for IVF-PQ. Oracle replays train + LUT + ADC "
    "with list-ordered sums so the double ranking matches bit-for-bit.",
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select("vec_id")
    return SIM.pq_topk(emb, q, m=4, ksub=8, iters=2, dim=64, topk=5)


@register(
    "sim_pq_rerank",
    oracle=_pq_oracle_sql(4, 8, 2, 64)
    + """,
q AS (SELECT vec_id AS q_id, m, sv AS qsv FROM sub WHERE vec_id < 8),
lut AS (
  SELECT q.q_id, c.m * 8 + c.code AS pos,
         list_sum(list_transform(range(1, 17),
           i -> (q.qsv[i] - c.cv[i]) * (q.qsv[i] - c.cv[i]))) AS d
  FROM q JOIN cb1 c USING (m)
),
lutl AS (SELECT q_id, list(d ORDER BY pos) AS l FROM lut GROUP BY q_id),
short AS (
  SELECT q_id, cand_id FROM (
    SELECT l.q_id, cd.vec_id AS cand_id,
           row_number() OVER (PARTITION BY l.q_id ORDER BY
             list_sum(list_transform(range(0, 4),
               mm -> l.l[mm * 8 + cd.cl[mm + 1] + 1])), cd.vec_id) AS rn
    FROM codes cd CROSS JOIN lutl l
    WHERE cd.vec_id <> l.q_id
  ) WHERE rn <= 50
)
SELECT q_id, cand_id FROM (
  SELECT s.q_id, s.cand_id,
         row_number() OVER (PARTITION BY s.q_id ORDER BY
           list_sum(list_transform(range(1, 65),
             i -> (qe.v[i] - ce.v[i]) * (qe.v[i] - ce.v[i]))), s.cand_id) AS rn
  FROM short s
  JOIN emb qe ON qe.vec_id = s.q_id
  JOIN emb ce ON ce.vec_id = s.cand_id
) WHERE rn <= 5""",
    doc="Production PQ search: ADC over the compressed code column "
    "shortlists 50 candidates per query, exact L2 on raw vectors "
    "reranks just those — corpus scan stays 64x compressed, raw "
    "vectors are probed per-shortlist-row only. Oracle replays "
    "train + ADC shortlist + ordered-sum rerank bit-for-bit.",
)
def sim_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select("vec_id")
    return SIM.pq_topk_rerank(
        emb, q, m=4, ksub=8, iters=2, dim=64, shortlist=50, topk=5
    )


def _ivfpq_oracle_sql(
    k: int = 8,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    probes: int = 2,
    topk: int = 5,
) -> str:
    """IVF-PQ replay: the coarse k-means CTE chain (kc*/ka*, as in
    ``_kmeans_oracle_sql``) and the PQ chain (cb*/a*, as in
    ``_pq_oracle_sql``) side by side, then probe + ADC with
    list-ordered sums. Mirrors ``operators.similarity.ivfpq_topk``."""
    w = dim // m
    k_assign = """
ka{n} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, {dim} + 1),
               i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))), c.cell) AS rn
    FROM emb e CROSS JOIN kc{n} c
  ) WHERE rn = 1
)"""
    k_update = """
kc{n1} AS (
  SELECT cell, list(mu ORDER BY dim) AS cvec
  FROM (
    SELECT a.cell, i AS dim, round(sum(e.v[i]), 6) / count(*) AS mu
    FROM ka{n} a JOIN emb e USING (vec_id), range(1, {dim} + 1) r(i)
    GROUP BY a.cell, i
  ) GROUP BY cell
)"""
    p_assign = """
a{n} AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
             list_sum(list_transform(range(1, {w} + 1),
               i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), c.code) AS rn
    FROM sub s JOIN cb{n} c USING (m)
  ) WHERE rn = 1
)"""
    p_update = """
cb{n1} AS (
  SELECT c.m, c.code, coalesce(u.cv2, c.cv) AS cv
  FROM cb{n} c LEFT JOIN (
    SELECT m, code, list(mu ORDER BY dim) AS cv2
    FROM (
      SELECT a.m, a.code, i AS dim, round(sum(s.sv[i]), 6) / count(*) AS mu
      FROM a{n} a JOIN sub s USING (vec_id, m), range(1, {w} + 1) r(i)
      GROUP BY a.m, a.code, i
    ) GROUP BY m, code
  ) u ON u.m = c.m AND u.code = c.code
)"""
    ctes = [
        "emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"""kc0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT {k})
)""",
        f"""sub AS (
  SELECT vec_id, m, v[m * {w} + 1 : (m + 1) * {w}] AS sv
  FROM emb, range(0, {m}) r(m)
)""",
        f"""cb0 AS (
  SELECT m, rn - 1 AS code, sv AS cv FROM (
    SELECT m, sv, row_number() OVER (PARTITION BY m ORDER BY vec_id) AS rn
    FROM sub
  ) WHERE rn <= {ksub}
)""",
    ]
    for n in range(iters):
        ctes.append(k_assign.format(n=n, dim=dim).strip())
        ctes.append(p_assign.format(n=n, w=w).strip())
        if n < iters - 1:
            ctes.append(k_update.format(n=n, n1=n + 1, dim=dim).strip())
            ctes.append(p_update.format(n=n, n1=n + 1, w=w).strip())
    last = iters - 1
    ctes.append(
        f"codes AS (\n  SELECT vec_id, list(code ORDER BY m) AS cl FROM a{last} GROUP BY vec_id\n)"
    )
    ctes.append(
        f"""cents AS (
  SELECT cell, list(mu ORDER BY dim) AS centroid
  FROM (
    SELECT a.cell, i AS dim, round(sum(e.v[i]), 6) / count(*) AS mu
    FROM ka{last} a JOIN emb e USING (vec_id), range(1, {dim} + 1) r(i)
    GROUP BY a.cell, i
  ) GROUP BY cell
)"""
    )
    ctes.append("q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id < 8)")
    ctes.append(
        f"""probed AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             list_sum(list_transform(range(1, {dim} + 1),
               i -> (q.qv[i] - c.centroid[i]) * (q.qv[i] - c.centroid[i]))), c.cell) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= {probes}
)"""
    )
    ctes.append(
        f"""lutl AS (
  SELECT q_id, list(d ORDER BY pos) AS l FROM (
    SELECT s.vec_id AS q_id, c.m * {ksub} + c.code AS pos,
           list_sum(list_transform(range(1, {w} + 1),
             i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS d
    FROM sub s JOIN cb{last} c USING (m)
    WHERE s.vec_id < 8
  ) GROUP BY q_id
)"""
    )
    ctes.append(
        f"""scored AS (
  SELECT p.q_id, cd.vec_id AS cand_id,
         list_sum(list_transform(range(0, {m}),
           mm -> l.l[mm * {ksub} + cd.cl[mm + 1] + 1])) AS ad
  FROM probed p
  JOIN ka{last} a ON a.cell = p.cell
  JOIN codes cd ON cd.vec_id = a.vec_id AND cd.vec_id <> p.q_id
  JOIN lutl l ON l.q_id = p.q_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT q_id, cand_id FROM (
  SELECT q_id, cand_id,
         row_number() OVER (PARTITION BY q_id ORDER BY ad, cand_id) AS rn
  FROM scored
) WHERE rn <= {topk}"""
    )


@register(
    "sim_ivfpq_topk",
    oracle=_ivfpq_oracle_sql(8, 4, 8, 2, 64, 2, 5),
    doc="IVF-PQ, the canonical billion-scale ANN layout: coarse k-means "
    "inverted lists (probe 2 of 8 cells per query) x product-quantized "
    "codes (ADC over 4x8 codebooks) — candidate scan cost drops "
    "probes/k of the corpus AND 64x per row. The (cell, codes) index "
    "join is materialize-once; per-query work = k centroid distances + "
    "probed-cell ADC sums; the only shuffle is the top-k window. "
    "Oracle replays both trainings and the probe/ADC bit-for-bit.",
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select("vec_id")
    return SIM.ivfpq_topk(
        emb, q, k=8, m=4, ksub=8, iters=2, dim=64, probes=2, topk=5
    )


def _bpe_oracle_sql(merges: int = 8) -> str:
    """Unrolled BPE merge training — mirrors
    ``operators.corpus.bpe_train``: word-frequency dict, per-round pair
    counts (integer, order-independent), top-1 winner with
    lexicographic tie-break, merge applied as plain replace 3x on the
    space-delimited symbol string."""
    ctes = [
        f"""w0 AS (
  SELECT array_to_string(list_transform(range(1, len(w) + 1), i -> w[i:i]), ' ')
           || ' </w>' AS sym,
         CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest({_SQL_TOKENS.format(col='text')}) AS w FROM documents)
  GROUP BY w
)"""
    ]
    for r in range(merges):
        ctes.append(
            f"""c{r + 1} AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(string_split(sym, ' ')), 1),
      i -> string_split(sym, ' ')[i] || ' ' || string_split(sym, ' ')[i + 1])) AS pair,
           wc
    FROM w{r}
  ) GROUP BY pair
)"""
        )
        ctes.append(
            f"""b{r + 1} AS (
  SELECT CAST({r + 1} AS BIGINT) AS rank, pair, cnt,
         replace(pair, ' ', '') AS merged
  FROM c{r + 1} ORDER BY cnt DESC, pair LIMIT 1
)"""
        )
        ctes.append(
            f"""w{r + 1} AS (
  SELECT trim(replace(replace(replace(
           ' ' || w.sym || ' ',
           ' ' || b.pair || ' ', ' ' || b.merged || ' '),
           ' ' || b.pair || ' ', ' ' || b.merged || ' '),
           ' ' || b.pair || ' ', ' ' || b.merged || ' ')) AS sym,
         w.wc
  FROM w{r} w, b{r + 1} b
)"""
        )
    return "WITH " + ",\n".join(ctes)


def _bpe_oracle_union(merges: int = 8) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT rank, pair, cnt FROM b{r + 1}" for r in range(merges)
    )


@register(
    "t_bpe_train_merges",
    oracle=_bpe_oracle_sql(8) + "\n" + _bpe_oracle_union(8),
    doc="Distributed BPE merge training (Sennrich et al. 2016): one "
    "corpus tokenize + groupBy builds the word-frequency dict (the "
    "only corpus-sized shuffle), then each of 8 rounds counts symbol "
    "pairs (integer, order-independent), picks the global winner "
    "(ties lexicographic), and applies the merge via plain replace "
    "through a 1-row broadcast join — no driver collect. Oracle "
    "unrolls all 8 rounds.",
)
def t_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, "doc_id", "text", merges=8)


_BPE_REPLACE3 = (
    "replace(replace(replace(acc,\n"
    "      ' ' || split_part(x, chr(9), 1) || ' ', ' ' || split_part(x, chr(9), 2) || ' '),\n"
    "      ' ' || split_part(x, chr(9), 1) || ' ', ' ' || split_part(x, chr(9), 2) || ' '),\n"
    "      ' ' || split_part(x, chr(9), 1) || ' ', ' ' || split_part(x, chr(9), 2) || ' ')"
)


@register(
    "t_bpe_tokenize_trained",
    oracle=_bpe_oracle_sql(8)
    + f""",
mstr AS (
  SELECT list(pair || chr(9) || merged ORDER BY rank) AS ml FROM (
    {" UNION ALL ".join(f"SELECT rank, pair, merged FROM b{r + 1}" for r in range(8))}
  )
),
occ AS (
  SELECT doc_id, source, unnest({_SQL_TOKENS.format(col='text')}) AS w
  FROM documents
),
dictw AS (SELECT DISTINCT w FROM occ),
applied AS (
  SELECT w,
         len(string_split(trim(list_reduce(list_prepend(
           ' ' || array_to_string(list_transform(range(1, len(w) + 1), i -> w[i:i]), ' ')
               || ' </w> ',
           m.ml),
           (acc, x) -> {_BPE_REPLACE3})), ' ')) AS n_sym
  FROM dictw, mstr m
)
SELECT source, CAST(sum(a.n_sym) AS BIGINT) AS bpe_tokens
FROM occ JOIN applied a USING (w)
GROUP BY source""",
    doc="Tokenize the corpus with the trained BPE merges (train + apply "
    "end-to-end): merges fold over the DISTINCT-word dictionary (|vocab| "
    "rows, Catalyst aggregate over the broadcast rank-ordered merge "
    "list — no Python, no collect), occurrences then join the broadcast "
    "per-word symbol counts. Oracle replays train + fold via "
    "list_reduce with the init prepended.",
)
def t_bpe_tokenize_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import bpe_apply, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "doc_id", "text", merges=8)
    per_doc = bpe_apply(docs, merges, "doc_id", "text")
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id")
        .groupBy("source")
        .agg(F.sum("n_bpe_tokens").cast("long").alias("bpe_tokens"))
    )


@register(
    "t_chunk_documents",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS.format(col='text')} AS t
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, (s - 1) // 48 AS chunk_no,
       len(t[s : least(s + 63, len(t))]) AS n_tokens,
       array_to_string(t[s : least(s + 63, len(t))], ' ') AS chunk_text
FROM (
  SELECT doc_id, t,
         unnest(range(1, greatest(len(t) - 16, 1) + 1, 48)) AS s
  FROM toks WHERE len(t) > 0
)""",
    doc="Sliding-window chunking for retrieval pipelines: 64-token "
    "windows advancing by 48 (16 overlap) — posexplode window starts + "
    "array slice, a pure narrow map (fan-out tokens/stride, zero "
    "shuffle), so chunking parallelizes with the scan at 100 TB.",
)
def t_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import chunk_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=16)


@register(
    "t_temperature_resample",
    oracle="""
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(floor(sqrt(CAST(n_docs * 1000000 AS DOUBLE))) AS BIGINT) AS w
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS z FROM counts)
SELECT source, n_docs,
       (10000 * w) // z AS target_n,
       ((10000 * w) // z + n_docs - 1) // n_docs AS rep_factor
FROM counts, tot""",
    doc="Temperature-based source rebalancing (multilingual-sampling "
    "recipe, α=0.5): target share ∝ √(corpus share) — upweights small "
    "sources, damps dominant ones. Fully integer: weights are scaled "
    "integer square roots floor(sqrt(n·10^6)) (exact on every engine "
    "for n ≪ 2^40), summed as BIGINTs (order-independent, unlike "
    "float √-sums), shares integer-scaled. One tiny aggregate — no "
    "corpus pass.",
)
def t_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import temperature_resample

    docs = load_table(spark, sf_dir, "documents")
    return temperature_resample(docs, "source", "doc_id", target_total=10_000)


def _ivfadc_ctes(
    k: int = 8,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    probes: int = 2,
) -> list:
    """IVFADC replay (residual-PQ): the coarse k-means chain as in
    ``_ivfpq_oracle_sql``, then PQ trained on CELL-RESIDUALS
    ``r = v − centroid(cell(v))`` and a per-(query, probed-cell)
    residual lookup table. Mirrors ``operators.similarity.ivfadc_topk``
    bit-for-bit (round(sum,6)/count centroid rule on both engines)."""
    w = dim // m
    k_assign = """
ka{n} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, {dim} + 1),
               i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))), c.cell) AS rn
    FROM emb e CROSS JOIN kc{n} c
  ) WHERE rn = 1
)"""
    k_update = """
kc{n1} AS (
  SELECT cell, list(mu ORDER BY dim) AS cvec
  FROM (
    SELECT a.cell, i AS dim, round(sum(e.v[i]), 6) / count(*) AS mu
    FROM ka{n} a JOIN emb e USING (vec_id), range(1, {dim} + 1) r(i)
    GROUP BY a.cell, i
  ) GROUP BY cell
)"""
    p_assign = """
a{n} AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
             list_sum(list_transform(range(1, {w} + 1),
               i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), c.code) AS rn
    FROM sub s JOIN cb{n} c USING (m)
  ) WHERE rn = 1
)"""
    p_update = """
cb{n1} AS (
  SELECT c.m, c.code, coalesce(u.cv2, c.cv) AS cv
  FROM cb{n} c LEFT JOIN (
    SELECT m, code, list(mu ORDER BY dim) AS cv2
    FROM (
      SELECT a.m, a.code, i AS dim, round(sum(s.sv[i]), 6) / count(*) AS mu
      FROM a{n} a JOIN sub s USING (vec_id, m), range(1, {w} + 1) r(i)
      GROUP BY a.m, a.code, i
    ) GROUP BY m, code
  ) u ON u.m = c.m AND u.code = c.code
)"""
    ctes = [
        "emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"""kc0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT {k})
)""",
    ]
    # the full coarse chain first: residuals need the FINAL assignment
    for n in range(iters):
        ctes.append(k_assign.format(n=n, dim=dim).strip())
        if n < iters - 1:
            ctes.append(k_update.format(n=n, n1=n + 1, dim=dim).strip())
    last = iters - 1
    ctes.append(
        f"""cents AS (
  SELECT cell, list(mu ORDER BY dim) AS centroid
  FROM (
    SELECT a.cell, i AS dim, round(sum(e.v[i]), 6) / count(*) AS mu
    FROM ka{last} a JOIN emb e USING (vec_id), range(1, {dim} + 1) r(i)
    GROUP BY a.cell, i
  ) GROUP BY cell
)"""
    )
    ctes.append(
        f"""resid AS (
  SELECT e.vec_id,
         list_transform(range(1, {dim} + 1), i -> e.v[i] - c.centroid[i]) AS rv
  FROM ka{last} a JOIN emb e USING (vec_id) JOIN cents c ON c.cell = a.cell
)"""
    )
    ctes.append(
        f"""sub AS (
  SELECT vec_id, m, rv[m * {w} + 1 : (m + 1) * {w}] AS sv
  FROM resid, range(0, {m}) r(m)
)"""
    )
    ctes.append(
        f"""cb0 AS (
  SELECT m, rn - 1 AS code, sv AS cv FROM (
    SELECT m, sv, row_number() OVER (PARTITION BY m ORDER BY vec_id) AS rn
    FROM sub
  ) WHERE rn <= {ksub}
)"""
    )
    for n in range(iters):
        ctes.append(p_assign.format(n=n, w=w).strip())
        if n < iters - 1:
            ctes.append(p_update.format(n=n, n1=n + 1, w=w).strip())
    ctes.append(
        f"codes AS (\n  SELECT vec_id, list(code ORDER BY m) AS cl FROM a{last} GROUP BY vec_id\n)"
    )
    ctes.append("q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id < 8)")
    ctes.append(
        f"""probed AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             list_sum(list_transform(range(1, {dim} + 1),
               i -> (q.qv[i] - c.centroid[i]) * (q.qv[i] - c.centroid[i]))), c.cell) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= {probes}
)"""
    )
    ctes.append(
        f"""qres AS (
  SELECT p.q_id, p.cell,
         list_transform(range(1, {dim} + 1), i -> q.qv[i] - c.centroid[i]) AS qrv
  FROM probed p JOIN q USING (q_id) JOIN cents c USING (cell)
)"""
    )
    ctes.append(
        f"""lutl AS (
  SELECT q_id, cell, list(d ORDER BY pos) AS l FROM (
    SELECT r.q_id, r.cell, c.m * {ksub} + c.code AS pos,
           list_sum(list_transform(range(1, {w} + 1),
             i -> (r.qrv[c.m * {w} + i] - c.cv[i]) * (r.qrv[c.m * {w} + i] - c.cv[i]))) AS d
    FROM qres r CROSS JOIN cb{last} c
  ) GROUP BY q_id, cell
)"""
    )
    ctes.append(
        f"""scored AS (
  SELECT l.q_id, cd.vec_id AS cand_id,
         list_sum(list_transform(range(0, {m}),
           mm -> l.l[mm * {ksub} + cd.cl[mm + 1] + 1])) AS ad
  FROM lutl l
  JOIN ka{last} a ON a.cell = l.cell
  JOIN codes cd ON cd.vec_id = a.vec_id AND cd.vec_id <> l.q_id
)"""
    )
    return ctes


def _ivfadc_oracle_sql(
    k: int = 8,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    probes: int = 2,
    topk: int = 5,
) -> str:
    ctes = _ivfadc_ctes(k, m, ksub, iters, dim, probes)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT q_id, cand_id FROM (
  SELECT q_id, cand_id,
         row_number() OVER (PARTITION BY q_id ORDER BY ad, cand_id) AS rn
  FROM scored
) WHERE rn <= {topk}"""
    )


def _ivfadc_rerank_oracle_sql(
    k: int = 8,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    probes: int = 2,
    shortlist: int = 50,
    topk: int = 5,
) -> str:
    """IVFADC shortlist + exact-L2 rerank replay (Jégou §V): the full
    residual-ADC chain down to ``scored``, top-``shortlist`` per query,
    then exact squared L2 on raw vectors for just those pairs."""
    ctes = _ivfadc_ctes(k, m, ksub, iters, dim, probes)
    ctes.append(
        f"""short AS (
  SELECT q_id, cand_id FROM (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id ORDER BY ad, cand_id) AS rn
    FROM scored
  ) WHERE rn <= {shortlist}
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT q_id, cand_id FROM (
  SELECT s.q_id, s.cand_id,
         row_number() OVER (PARTITION BY s.q_id ORDER BY
           list_sum(list_transform(range(1, {dim} + 1),
             i -> (qe.v[i] - ce.v[i]) * (qe.v[i] - ce.v[i]))), s.cand_id) AS rn
  FROM short s
  JOIN emb qe ON qe.vec_id = s.q_id
  JOIN emb ce ON ce.vec_id = s.cand_id
) WHERE rn <= {topk}"""
    )


@register(
    "sim_ivfpq_residual_topk",
    oracle=_ivfadc_oracle_sql(8, 4, 8, 2, 64, 2, 5),
    doc="Paper-exact IVFADC (Jégou et al. 2011 §IV): PQ trained on "
    "cell-residuals r = x − centroid(cell(x)) instead of raw vectors — "
    "the codebook encodes local displacement, which is where residual "
    "training recovers recall at high compression. Serving builds the "
    "ADC lookup table per (query, probed cell) from the query residual. "
    "Oracle replays coarse training, residual PQ training, and the "
    "per-probe LUT scan bit-for-bit.",
)
def sim_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select("vec_id")
    return SIM.ivfadc_topk(
        emb, q, k=8, m=4, ksub=8, iters=2, dim=64, probes=2, topk=5
    )


@register(
    "t_global_shuffle",
    oracle="""
SELECT doc_id,
       (((doc_id + 1) % 2147483648) * 2654435761) % 4294967296 AS shuffle_key,
       CAST(row_number() OVER (
         ORDER BY (((doc_id + 1) % 2147483648) * 2654435761) % 4294967296, doc_id
       ) AS BIGINT) AS position
FROM documents
WHERE doc_id < 3000
""",
    doc="Deterministic pseudorandom training order: position = rank of "
    "a portable multiplicative integer hash of (id, seed) — every "
    "epoch sees a reproducible permutation independent of file layout "
    "or cluster size; a new seed gives an uncorrelated new order. The "
    "sort is one range-exchange (sampled range partition, no single "
    "reducer); sharded export writes repartitionByRange(n, position).",
)
def t_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import global_shuffle_order

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 3000)
    return global_shuffle_order(docs, "doc_id", seed=1)


def _side_sql(fp: str) -> str:
    from ..operators.corpus import SIDE_WEIGHTS

    terms = " + ".join(
        f"CAST(ascii(substr({fp}, {i + 1}, 1)) AS BIGINT) * {w}"
        for i, w in enumerate(SIDE_WEIGHTS)
    )
    return f"({terms}) % 100"


@register(
    "t_leakage_safe_split",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, md5(text) AS grp FROM documents
), gmin AS (
  SELECT grp, min(doc_id) AS group_id FROM keyed GROUP BY grp
)
SELECT k.doc_id, g.group_id,
       CASE WHEN {_side_sql('k.grp')} < 90
            THEN 'train' ELSE 'val' END AS split
FROM keyed k JOIN gmin g USING (grp)
""",
    doc="Leakage-safe train/val split: the side is decided per CONTENT "
    "GROUP (exact-dup md5 fingerprint here; plug the connected-"
    "components id in for near-dup safety) via a portable integer "
    "hash of the group FINGERPRINT — duplicated content can never "
    "straddle the boundary, and because the side depends only on "
    "content (not on min id), adding new duplicates can never flip "
    "an existing group's side (frozen eval sets across versions). "
    "One groupBy + one join back, both on the dedup key.",
)
def t_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    return leakage_safe_split(docs, "doc_id", "text", train_pct=90)


@register(
    "mm_image_dhash",
    oracle="""
WITH px AS (
  SELECT doc_id, i, j,
         ascii(substr(text, i * 16 + (j * 16) // 9 + 1, 1)) AS p,
         ascii(substr(text, i * 16 + ((j + 1) * 16) // 9 + 1, 1)) AS pn
  FROM documents, range(0, 8) r1(i), range(0, 8) r2(j)
  WHERE n_chars >= 128
)
SELECT doc_id AS media_id,
       CAST(sum(CASE WHEN i < 4 AND p > pn
                     THEN (CAST(1 AS BIGINT) << (i * 8 + j)) ELSE 0 END)
            AS BIGINT) AS dhash_hi,
       CAST(sum(CASE WHEN i >= 4 AND p > pn
                     THEN (CAST(1 AS BIGINT) << ((i - 4) * 8 + j)) ELSE 0 END)
            AS BIGINT) AS dhash_lo
FROM px GROUP BY doc_id
""",
    doc="REAL perceptual image hash (dHash) through the actual Netpbm "
    "decode path: each doc's first 128 ASCII bytes become a 16x8 P5 "
    "raster, decoded by decode_netpbm, nearest-neighbor resampled to "
    "9x8 with the (k*src)//dst index map, difference-hashed to two "
    "BIGINT halves. Near-dup images = small Hamming distance; band "
    "the halves into 16-bit keys for an LSH bucket join at scale. The "
    "oracle recomputes every pixel from the same bytes (ascii = "
    "grayscale value for a P5 payload), so the whole decode->resample"
    "->hash chain is engine-replayed.",
)
def mm_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_binary, image_dhash

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 128)
    pgm = docs.select(
        "doc_id",
        F.concat(F.lit("P5\n16 8\n255\n"), F.substring("text", 1, 128)).alias(
            "payload"
        ),
    )
    media = attach_binary(pgm, "doc_id", "payload", "image")
    return image_dhash(media, hash_w=8, hash_h=8)


@register(
    "mm_dhash_neardup",
    oracle="""
WITH px AS (
  SELECT doc_id, i, j,
         ascii(substr(text, i * 16 + (j * 16) // 9 + 1, 1)) AS p,
         ascii(substr(text, i * 16 + ((j + 1) * 16) // 9 + 1, 1)) AS pn
  FROM documents, range(0, 8) r1(i), range(0, 8) r2(j)
  WHERE n_chars >= 128
),
h AS (
  SELECT doc_id AS media_id,
         CAST(sum(CASE WHEN i < 4 AND p > pn
                       THEN (CAST(1 AS BIGINT) << (i * 8 + j)) ELSE 0 END)
              AS BIGINT) AS hi,
         CAST(sum(CASE WHEN i >= 4 AND p > pn
                       THEN (CAST(1 AS BIGINT) << ((i - 4) * 8 + j)) ELSE 0 END)
              AS BIGINT) AS lo
  FROM px GROUP BY doc_id
),
bands AS (
  SELECT media_id, hi, lo, b.band,
         CASE WHEN b.band < 2 THEN (hi >> (b.band % 2 * 16)) & 65535
              ELSE (lo >> (b.band % 2 * 16)) & 65535 END AS key
  FROM h, range(0, 4) b(band)
)
SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
            AS BIGINT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
""",
    doc="Image near-duplicate detection end-to-end: dHash (real Netpbm "
    "decode) -> 4x16-bit band keys -> bucket join (candidates only, "
    "never corpus x corpus) -> exact XOR-popcount Hamming verify <= 6. "
    "The MinHash-LSH cost model applied to perceptual hashes; every "
    "stage integer-exact and replayed by the oracle.",
)
def mm_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_binary, dhash_neardup_pairs, image_dhash

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 128)
    pgm = docs.select(
        "doc_id",
        F.concat(F.lit("P5\n16 8\n255\n"), F.substring("text", 1, 128)).alias(
            "payload"
        ),
    )
    hashes = image_dhash(attach_binary(pgm, "doc_id", "payload", "image"))
    return dhash_neardup_pairs(hashes, max_hamming=6).withColumn(
        "hamming", F.col("hamming").cast("long")
    )


def _wav_media(spark: SparkSession, sf_dir: str, n: int = 128) -> DataFrame:
    """documents → (media_id, data) rows whose payload is each doc's
    first ``n`` ASCII bytes as 8-bit PCM mono behind a real WAV header
    — the corpus the audio queries decode for real."""
    header = (
        b"RIFF"
        + (36 + n).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")   # PCM
        + (1).to_bytes(2, "little")   # mono
        + (8000).to_bytes(4, "little")
        + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")   # 8-bit
        + b"data"
        + n.to_bytes(4, "little")
    )
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= n)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.lit(header), F.encode(F.substring("text", 1, n), "UTF-8")
        ).alias("data"),
    )


@register(
    "mm_audio_fingerprint",
    oracle="""
WITH e AS (
  SELECT doc_id, f,
         CAST(sum((ascii(substr(text, f * 4 + t + 1, 1)) - 128)
                  * (ascii(substr(text, f * 4 + t + 1, 1)) - 128))
              AS BIGINT) AS energy
  FROM documents, range(0, 32) fr(f), range(0, 4) st(t)
  WHERE n_chars >= 128
  GROUP BY doc_id, f
)
SELECT e1.doc_id AS media_id,
       CAST(32 AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN e2.energy > e1.energy
                     THEN (CAST(1 AS BIGINT) << e1.f) ELSE 0 END)
            AS BIGINT) AS afp
FROM e e1 JOIN e e2 ON e2.doc_id = e1.doc_id AND e2.f = e1.f + 1
GROUP BY e1.doc_id
""",
    doc="REAL audio fingerprint through the actual RIFF/WAVE decode "
    "path: each doc's first 128 ASCII bytes become 8-bit PCM mono "
    "samples behind a real WAV header, decode_wav parses it, 4-sample "
    "frames yield integer energies, and bit k = [energy(k+1) > "
    "energy(k)] — the sign-of-energy-delta signature (Shazam-style "
    "matching reduced to its integer skeleton). Oracle recomputes "
    "every sample as ascii-128 and replays the energy/delta chain.",
)
def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_fingerprint

    return audio_fingerprint(_wav_media(spark, sf_dir), frame_samples=4, max_bits=62)


_AUDIO_FP_CTE = """
e AS (
  SELECT doc_id, f,
         CAST(sum((ascii(substr(text, f * 4 + t + 1, 1)) - 128)
                  * (ascii(substr(text, f * 4 + t + 1, 1)) - 128))
              AS BIGINT) AS energy
  FROM documents, range(0, 32) fr(f), range(0, 4) st(t)
  WHERE n_chars >= 128
  GROUP BY doc_id, f
),
fp AS (
  SELECT e1.doc_id AS media_id,
         CAST(sum(CASE WHEN e2.energy > e1.energy
                       THEN (CAST(1 AS BIGINT) << e1.f) ELSE 0 END)
              AS BIGINT) AS afp
  FROM e e1 JOIN e e2 ON e2.doc_id = e1.doc_id AND e2.f = e1.f + 1
  GROUP BY e1.doc_id
)"""


@register(
    "mm_audio_neardup",
    oracle=f"""
WITH {_AUDIO_FP_CTE},
banded AS (
  SELECT media_id, afp, b AS band, (afp >> (b * 8)) & 255 AS key
  FROM fp, range(0, 4) r(b)
)
SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
WHERE bit_count(xor(a.afp, b.afp)) <= 4
""",
    doc="Audio near-duplicate pairs at the MinHash-LSH cost model: the "
    "31-bit energy-delta fingerprint (mm_audio_fingerprint, real WAV "
    "decode) bands into 4×8-bit bucket keys, candidates come only "
    "from shared buckets (never corpus²), and an integer XOR popcount "
    "verifies Hamming ≤ 4 exactly — Shazam-style candidate matching "
    "as a bucket join. Oracle replays decode, fingerprint, banding, "
    "and verify in SQL.",
)
def mm_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_fingerprint, audio_neardup_pairs

    fps = audio_fingerprint(_wav_media(spark, sf_dir), frame_samples=4, max_bits=62)
    return audio_neardup_pairs(fps, n_bands=4, band_bits=8, max_hamming=4)


@register(
    "t_per_source_cap",
    oracle="""
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
) WHERE rk <= 25
""",
    doc="Per-source document cap — the curation rule that stops one "
    "crawl domain from dominating a pretraining mix: keep the best 25 "
    "docs per source (longest first, id tiebreak). One window shuffle "
    "on the group key; skewed domains are exactly the rows the cap "
    "discards.",
)
def t_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import per_group_cap

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return per_group_cap(docs, "doc_id", "source", cap=25, quality_col="n_chars")


@register(
    "sim_ivfadc_rerank",
    oracle=_ivfadc_rerank_oracle_sql(8, 4, 8, 2, 64, 2, 50, 5),
    doc="Production IVFADC serving (Jégou et al. §V): residual-ADC "
    "scan over compressed codes shortlists 50 candidates per query, "
    "exact L2 on raw vectors reranks just those — the corpus scan "
    "stays ~m bytes/row and raw vectors are touched per-shortlist-row "
    "only. This is the recipe that recovers the recall residual "
    "quantization alone leaves on uniform corpora (SCALING.md). "
    "Oracle replays training, probe, ADC shortlist, and rerank.",
)
def sim_ivfadc_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select("vec_id")
    return SIM.ivfadc_topk_rerank(
        emb, q, k=8, m=4, ksub=8, iters=2, dim=64, probes=2,
        shortlist=50, topk=5,
    )


@register(
    "mm_scene_cuts",
    oracle="""
WITH e AS (
  SELECT doc_id AS media_id, u.f AS frame_no,
         (SELECT CAST(sum(ascii(substr(text, u.f * 16 + t.t + 1, 1))) AS BIGINT)
          FROM range(0, 16) t(t)) AS energy
  FROM documents,
       UNNEST(range(0, octet_length(encode(text)) // 16)) AS u(f)
)
SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
       CAST(delta AS BIGINT) AS delta
FROM (
  SELECT media_id, frame_no,
         abs(energy - lag(energy) OVER (PARTITION BY media_id ORDER BY frame_no))
           AS delta
  FROM e
)
WHERE delta >= 150
""",
    doc="Scene-cut / keyframe detection over video-shaped payloads: "
    "per-frame integer energies (Arrow mapInPandas, numpy reshape+sum "
    "per payload — payloads never leave executors), then a cut "
    "wherever the energy jumps >= threshold from the previous frame — "
    "the integer skeleton of histogram-difference shot detection, the "
    "keyframe-extraction step of a video training pipeline. One lag "
    "window PARTITIONED PER MEDIA ID; the oracle replays the frame "
    "grid and energies byte-for-byte.",
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_binary, frame_energies, scene_cuts

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text", "video")
    return scene_cuts(frame_energies(media, frame_bytes=16), threshold=150)


@register(
    "t_quality_terciles",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         least(len({_SQL_TOKENS.format(col='text')}) / 50.0, 1.0) AS len_score,
         1.0 - least(coalesce(
             length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))
               * 1.0 / nullif(length(text), 0), 0.0) * 5.0, 1.0) AS punct_score,
         CASE WHEN coalesce(list_sum(list_transform({_SQL_TOKENS.format(col='text')},
                                x -> length(x))) * 1.0
                    / nullif(len({_SQL_TOKENS.format(col='text')}), 0), 0.0)
                   BETWEEN 3.0 AND 8.0
              THEN 1.0 ELSE 0.5 END AS word_score
  FROM documents
),
q AS (
  SELECT doc_id, lang, (len_score + punct_score + word_score) / 3.0 AS quality
  FROM scored
)
SELECT doc_id, lang,
       CASE ntile(3) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM q
""",
    doc="CCNet-style quality buckets: within each language, rank docs by "
    "the composite quality score and split into head/middle/tail "
    "terciles — the bucketing used to bias pretraining sampling toward "
    "higher-quality text. The ntile window is PARTITIONED per language "
    "(regular scale-safe window; only a GLOBAL ntile needs the "
    "two-phase rank in operators/ranks.py).",
)
def t_quality_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", "lang", T.quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    t = F.ntile(3).over(w)
    bucket = (
        F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail")
    )
    return q.select("doc_id", "lang", bucket.alias("bucket"))


@register(
    "t_rare_trigram_ratio",
    oracle="""
WITH grams AS (
  SELECT DISTINCT doc_id, substr(lower(text), u.i, 3) AS g
  FROM documents, UNNEST(range(1, length(text) - 1)) AS u(i)
),
dfreq AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM grams GROUP BY g)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN d.df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       round(sum(CASE WHEN d.df <= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS rare_ratio
FROM grams g JOIN dfreq d USING (g)
GROUP BY g.doc_id
""",
    doc="Rare-trigram novelty ratio: fraction of a document's DISTINCT "
    "character trigrams appearing in ≤2 corpus documents — an "
    "integer-exact stand-in for LM-perplexity quality filtering "
    "(CCNet-style): high ratios flag gibberish/noise, near-zero "
    "ratios flag boilerplate. One explode + two grouped shuffles on "
    "the trigram / doc keys; the trigram df table is the same "
    "artifact t_char_trigrams trains language-ID from.",
)
def t_rare_trigram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    idx = F.when(
        F.length("text") >= 3, F.sequence(F.lit(1), F.length("text") - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = (
        docs.select("doc_id", F.explode(idx).alias("i"), lowered.alias("__t"))
        .select("doc_id", F.substring(F.col("__t"), F.col("i"), F.lit(3)).alias("g"))
        .distinct()
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    rare = F.when(F.col("df") <= 2, 1).otherwise(0)
    return (
        grams.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(rare).cast("long").alias("n_rare"),
            F.round(F.sum(rare) / F.count(F.lit(1)), 6).alias("rare_ratio"),
        )
    )


@register(
    "sim_hybrid_rrf",
    oracle=f"""
WITH kw AS (
  SELECT doc_id,
         CAST(len(list_filter({_SQL_TOKENS.format(col='text')},
              x -> x IN ('spark', 'table', 'window'))) AS BIGINT) AS kscore
  FROM documents
),
krank AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY kscore DESC, doc_id) AS BIGINT) AS kr
  FROM kw
),
u AS (SELECT vec_id, {_SQL_UNIT.format(a='embedding')} AS un FROM embeddings),
qv AS (SELECT un AS qu FROM u WHERE vec_id = 0),
vrank AS (
  SELECT e.vec_id AS doc_id,
         CAST(row_number() OVER (ORDER BY
           {_SQL_DOT.format(a='qv.qu', b='e.un')} DESC, e.vec_id) AS BIGINT) AS vr
  FROM u e, qv
  WHERE e.vec_id <> 0
)
SELECT doc_id, kr, vr,
       round(1.0 / (60 + kr) + 1.0 / (60 + vr), 6) AS rrf
FROM krank JOIN vrank USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT 20
""",
    doc="Hybrid retrieval via reciprocal rank fusion (RRF, k=60): fuse a "
    "keyword ranking (query-token hits per document) with a dense "
    "vector ranking (unit-dot cosine vs a query embedding) as "
    "Σ 1/(60+rank) — the standard hybrid-search combiner, rank-based "
    "so the two scores need no calibration. Both global rankings use "
    "the distributed two-phase row number (operators/ranks.py) — no "
    "single-task window; the final top-20 is a sort-limit (Spark "
    "TakeOrdered, no full sort).",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot, unit
    from ..operators.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    kscore = F.size(
        F.filter(toks, lambda x: x.isin("spark", "table", "window"))
    ).cast("long")
    kw = docs.select("doc_id", kscore.alias("kscore"))
    krank = global_row_number(
        kw, [F.col("kscore").desc(), F.col("doc_id")], "kr"
    ).select("doc_id", "kr")

    un = emb.select("vec_id", unit(F.col("embedding")).alias("un"))
    qv = un.filter(F.col("vec_id") == 0).select(F.col("un").alias("qu"))
    scored = (
        un.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            dot(F.col("qu"), F.col("un")).alias("vscore"),
        )
    )
    vrank = global_row_number(
        scored, [F.col("vscore").desc(), F.col("doc_id")], "vr"
    ).select("doc_id", "vr")

    rrf = F.round(
        F.lit(1.0) / (F.lit(60) + F.col("kr"))
        + F.lit(1.0) / (F.lit(60) + F.col("vr")),
        6,
    )
    return (
        krank.join(vrank, "doc_id")
        .select("doc_id", "kr", "vr", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(20)
    )


def _bm25_ctes(
    terms: tuple[str, ...] = ("spark", "table", "window"),
    where: str = "",
    p: str = "",
) -> str:
    """BM25 CTE block over ``documents`` (optionally filtered), with
    CTE names prefixed by ``p`` so two instances (e.g. base index vs
    merged index) compose in one oracle. ``{p}s`` ends as
    ``(doc_id, bm25)`` for every document in scope. Shared by
    t_bm25_topk and the t_index_* maintenance family — one source of
    truth for the scoring formula (mirrors
    operators/text_index.bm25_score_col)."""
    tk = _SQL_TOKENS.format(col="text")
    tf_cols = ", ".join(
        f"len(list_filter(tk, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms, 1)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(1, len(terms) + 1)
    )
    parts = " + ".join(
        f"((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf{i} AS DOUBLE) * 2.2 / (CAST(tf{i} AS DOUBLE)"
        f" + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))))"
        for i in range(1, len(terms) + 1)
    )
    return f"""{p}m AS (
  SELECT doc_id, len(tk) AS dl, {tf_cols}
  FROM (SELECT doc_id, {tk} AS tk FROM documents{where})
),
{p}g AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sdl, {df_cols}
  FROM {p}m
),
{p}s AS (
  SELECT doc_id, round({parts}, 6) AS bm25
  FROM {p}m, {p}g
)"""


def _bm25_sql(terms: tuple[str, ...] = ("spark", "table", "window")) -> str:
    return f"""
WITH {_bm25_ctes(terms)}
SELECT doc_id, bm25
FROM s
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""


@register(
    "t_bm25_topk",
    oracle=_bm25_sql(),
    doc="BM25 document ranking (k1=1.2, b=0.75) for a fixed 3-term "
    "query, top-10: per-term tf from a token filter (no explode), "
    "document-length normalization against the corpus average, and a "
    "LOG-FREE rational idf (N-df+0.5)/(df+0.5) — rank-equivalent to "
    "the ln form per term and, like t_tfidf_top_terms, keeps every "
    "score a fixed-order rational expression both engines evaluate "
    "bit-identically (libm ln is not bit-portable). Per-term "
    "contributions are explicit columns summed in fixed order — no "
    "float aggregation-order dependence. Corpus stats are ONE "
    "broadcast row; the top-10 is a sort-limit.",
)
def t_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_index as TI

    terms = ("spark", "table", "window")
    docs = load_table(spark, sf_dir, "documents")
    m = TI.doc_term_stats(docs, terms)
    g = TI.index_stats(m, len(terms))
    return (
        TI.bm25_scores(m, g, len(terms))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(10)
    )


def _semdedup_incr_oracle_sql(
    n_planes: int = 5, dim: int = 64, threshold: float = 0.40, new_from: int = 400
) -> str:
    from ..operators.similarity import _planes

    planes = _planes(n_planes, dim)
    bits = []
    for p in planes:
        consts = "[" + ", ".join(repr(v) for v in p) + "]"
        dotp = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({consts})[i]))"
        )
        bits.append(f"(CASE WHEN {dotp} >= 0 THEN '1' ELSE '0' END)")
    sig = " || ".join(bits)
    return f"""
WITH sigs AS (
  SELECT vec_id, (vec_id >= {new_from}) AS is_new,
         {_SQL_UNIT.format(a='embedding')} AS un, {sig} AS cell
  FROM embeddings
),
dropped AS (
  SELECT DISTINCT n.vec_id
  FROM sigs e JOIN sigs n ON e.cell = n.cell AND n.is_new
   AND e.vec_id <> n.vec_id
   AND (NOT e.is_new OR e.vec_id < n.vec_id)
  WHERE {_SQL_DOT.format(a='e.un', b='n.un')} >= {threshold}
)
SELECT vec_id AS id, cell,
       vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
FROM sigs WHERE is_new
"""


@register(
    "sem_dedup_incremental",
    oracle=_semdedup_incr_oracle_sql(5, 64, 0.40, 400),
    doc="Micro-batch SemDeDup: kept/dropped decided for the NEW vectors "
    "only (ids ≥ 400 = the batch) against hyperplane cell-mates — "
    "corpus members at any id plus lower-id batch-mates, never "
    "corpus². The embedding twin of dedup_incremental: per-batch cost "
    "O(batch · cell occupancy), the streaming embedding-ingest shape "
    "(operators/similarity.py semdedup_incremental). Pre-normalized "
    "rows, plain-dot pair verify.",
)
def sem_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "is_new", F.col("vec_id") >= 400
    )
    return SIM.semdedup_incremental(
        emb, "is_new", dim=64, n_planes=5, threshold=0.40
    )


@register(
    "t_winsorize",
    oracle="""
WITH b AS (
  SELECT l_returnflag AS grp,
         quantile_cont(l_extendedprice, 0.01) AS lo,
         quantile_cont(l_extendedprice, 0.99) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, b.grp,
       round(CASE WHEN l.l_extendedprice < b.lo THEN b.lo
                  WHEN l.l_extendedprice > b.hi THEN b.hi
                  ELSE l.l_extendedprice END, 2) AS price_w,
       (l.l_extendedprice < b.lo OR l.l_extendedprice > b.hi) AS clipped
FROM lineitem l JOIN b ON b.grp = l.l_returnflag
""",
    doc="Per-group winsorization: clamp values to the group's exact "
    "[p1, p99] band and flag the clipped rows — the outlier-capping "
    "step of a feature/curation pipeline. Group quantile bounds are a "
    "tiny broadcastable frame joined back to the facts; exact "
    "interpolated percentiles here for the oracle (swap "
    "approx_percentile in at 100 TB, same plan shape).",
)
def t_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.percentile("l_extendedprice", F.lit(0.01)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("hi"),
    )
    j = li.join(
        F.broadcast(b), li["l_returnflag"] == b["grp"]
    )
    p = F.col("l_extendedprice")
    clamped = (
        F.when(p < F.col("lo"), F.col("lo"))
        .when(p > F.col("hi"), F.col("hi"))
        .otherwise(p)
    )
    return j.select(
        "l_orderkey", "l_linenumber", "grp",
        F.round(clamped, 2).alias("price_w"),
        ((p < F.col("lo")) | (p > F.col("hi"))).alias("clipped"),
    )


# ---------------------------------------------------------------- PII

# Deterministic PII augmentation: the synthetic corpus contains no real
# emails/phones, so both engines append identically-constructed PII
# strings (derived from doc_id alone) before detecting/scrubbing —
# the operator is thereby verified against KNOWN-nonzero ground truth:
# every doc gains 1 email, evens a phone, every 3rd an SSN shape,
# every 5th an IPv4.
_PII_AUG_SQL = """
SELECT doc_id, lang,
       text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       || CASE WHEN doc_id % 2 = 0 THEN
            ' call +1-' || CAST(doc_id % 900 + 100 AS VARCHAR)
            || '-' || CAST((doc_id * 7) % 900 + 100 AS VARCHAR)
            || '-' || CAST((doc_id * 13) % 9000 + 1000 AS VARCHAR)
          ELSE '' END
       || CASE WHEN doc_id % 3 = 0 THEN
            ' ssn ' || CAST(doc_id % 900 + 100 AS VARCHAR)
            || '-' || CAST(doc_id % 90 + 10 AS VARCHAR)
            || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
          ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN
            ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
          ELSE '' END AS t
FROM documents
"""


def _pii_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_PII_AUG_SQL`` — byte-identical augmented text."""
    did = F.col("doc_id")

    def s(e):
        return e.cast("string")

    phone = F.concat(
        F.lit(" call +1-"), s(did % 900 + 100),
        F.lit("-"), s((did * 7) % 900 + 100),
        F.lit("-"), s((did * 13) % 9000 + 1000),
    )
    ssn = F.concat(
        F.lit(" ssn "), s(did % 900 + 100),
        F.lit("-"), s(did % 90 + 10),
        F.lit("-"), s(did % 9000 + 1000),
    )
    ip = F.concat(
        F.lit(" ip 10."), s(did % 256),
        F.lit("."), s((did * 3) % 256),
        F.lit("."), s((did * 7) % 256),
    )
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), s(did), F.lit("@example.com"),
        F.when(did % 2 == 0, phone).otherwise(F.lit("")),
        F.when(did % 3 == 0, ssn).otherwise(F.lit("")),
        F.when(did % 5 == 0, ip).otherwise(F.lit("")),
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", aug.alias("t")
    )


def _pii_scrub_oracle() -> str:
    from ..functions import pii as P

    counts = ",\n       ".join(
        f"CAST({P.pii_count_sql('t', k)} AS BIGINT) AS n_{k}"
        for k in P.PII_PATTERNS
    )
    residual = " + ".join(
        P.pii_count_sql(P.pii_scrub_sql("t"), k) for k in P.PII_PATTERNS
    )
    return f"""
WITH aug AS ({_PII_AUG_SQL})
SELECT doc_id,
       {counts},
       CAST({residual} AS BIGINT) AS residual,
       md5({P.pii_scrub_sql('t')}) AS scrub_md5
FROM aug
"""


@register(
    "t_pii_scrub",
    oracle=_pii_scrub_oracle(),
    doc="PII redaction (round-5 verdict item #6): per-document hit "
    "counts for email/phone/SSN-shape/IPv4 patterns plus the md5 of "
    "the scrubbed text, and a residual re-scan of the scrubbed text "
    "(must be 0 — replacement tokens contain no re-matchable bytes). "
    "Pure regexp_extract_all/regexp_replace — the F1-F8 multimatch "
    "kernel applied to curation; whole-stage codegen end to end, "
    "embarrassingly parallel at 100 TB (no shuffle at all).",
)
def t_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import pii as P

    aug = _pii_augmented(spark, sf_dir)
    t = F.col("t")
    scrubbed = P.pii_scrub(t)
    residual = None
    for k in P.PII_PATTERNS:
        c = P.pii_count(scrubbed, k)
        residual = c if residual is None else residual + c
    return aug.select(
        "doc_id",
        *[P.pii_count(t, k).cast("long").alias(f"n_{k}") for k in P.PII_PATTERNS],
        residual.cast("long").alias("residual"),
        F.md5(scrubbed.cast("binary")).alias("scrub_md5"),
    )


def _pii_stats_oracle() -> str:
    from ..functions import pii as P

    arms = "\n  UNION ALL\n".join(
        f"  SELECT lang, '{k}' AS pii_type, "
        f"{P.pii_count_sql('t', k)} AS n FROM aug"
        for k in P.PII_PATTERNS
    )
    return f"""
WITH aug AS ({_PII_AUG_SQL}),
hits AS (
{arms}
)
SELECT lang, pii_type,
       CAST(sum(n) AS BIGINT) AS total_hits,
       CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit
FROM hits
GROUP BY lang, pii_type
"""


@register(
    "t_pii_stats",
    oracle=_pii_stats_oracle(),
    doc="PII audit rollup: per (lang, pattern) total hits and affected "
    "document counts — the curator-facing report of what redaction "
    "removed. One map-explode + one partial-aggregated groupBy.",
)
def t_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import pii as P

    aug = _pii_augmented(spark, sf_dir)
    kv = []
    for k in P.PII_PATTERNS:
        kv += [F.lit(k), P.pii_count(F.col("t"), k)]
    return (
        aug.select("lang", F.explode(F.create_map(*kv)).alias("pii_type", "n"))
        .groupBy("lang", "pii_type")
        .agg(
            F.sum("n").cast("bigint").alias("total_hits"),
            F.sum(F.when(F.col("n") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_hit"),
        )
    )


@register(
    "t_minhash_containment",
    oracle=f"""
WITH {_SQL_SHINGLES_PAD}
SELECT id_a, id_b,
       round(inter * 1.0 / s1.n, 6) AS cont_a,
       round(inter * 1.0 / s2.n, 6) AS cont_b
FROM pairs
JOIN sizes s1 ON s1.doc_id = id_a
JOIN sizes s2 ON s2.doc_id = id_b
WHERE greatest(inter * 1.0 / s1.n, inter * 1.0 / s2.n) >= 0.9
""",
    doc="Asymmetric containment near-dup (|A∩B|/|A| per direction, keep "
    "if either side ≥ 0.9): catches the long-doc-swallows-short-doc "
    "case Jaccard misses — a paragraph pasted into a book is "
    "containment 1.0 from the paragraph's side but near-zero Jaccard. "
    "Sub-k-token docs contribute their whole text as one shingle "
    "(pad_short contract — without it the short side of short-in-long "
    "is invisible). Same shingle inverted-index join as the Jaccard "
    "query (only docs sharing a shingle ever meet); at 100 TB the "
    "MinHash-LSH banding feeds this as its exact-verify stage over "
    "candidates only, with max_shingle_df capping hot-shingle skew.",
)
def t_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.ngram_containment_pairs(docs, "doc_id", "text", k=3, threshold=0.9)


@register(
    "t_robust_scale",
    oracle="""
WITH st AS (
  SELECT lang, median(CAST(n_chars AS DOUBLE)) AS med,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS q3
  FROM documents GROUP BY 1
)
SELECT d.doc_id, d.lang,
       round((CAST(d.n_chars AS DOUBLE) - st.med) / (st.q3 - st.q1), 6) AS scaled
FROM documents d JOIN st USING (lang)
""",
    doc="Per-language robust scaling of document length: "
    "(x − median) / IQR — outlier-immune standardization (mean/stddev "
    "scaling is dragged by the heavy tail this feature has). Exact "
    "interpolated percentiles per group collapse to one tiny frame "
    "broadcast back against the corpus; swap percentile for "
    "approx_percentile at 100 TB for a one-pass sketch with the same "
    "plan shape.",
)
def t_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d2 = docs.select("doc_id", "lang", F.col("n_chars").cast("double").alias("v"))
    st = d2.groupBy("lang").agg(
        F.expr("percentile(v, 0.5)").alias("med"),
        F.expr("percentile(v, 0.25)").alias("q1"),
        F.expr("percentile(v, 0.75)").alias("q3"),
    )
    return d2.join(F.broadcast(st), "lang").select(
        "doc_id",
        "lang",
        F.round(
            (F.col("v") - F.col("med")) / (F.col("q3") - F.col("q1")), 6
        ).alias("scaled"),
    )


@register(
    "t_cross_dup_overlap",
    oracle="""
WITH fp AS (
  SELECT doc_id, source,
         md5(substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 64)) AS fp
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_dup_pairs,
       CAST(count(DISTINCT a.fp) AS BIGINT) AS n_texts
FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2
""",
    doc="Cross-source duplication overlap matrix: how much of source A "
    "also appears in source B, via a prefix-64 normalized-text "
    "fingerprint (the corpus has no full-text exact dups, and shared "
    "boilerplate openings are exactly what cross-source leakage looks "
    "like; the fingerprint column is pluggable — full-text md5 or a "
    "MinHash band key drop in unchanged). Join is keyed on the "
    "fingerprint so only colliding docs meet; the rollup is one "
    "source-pair agg — the standard 'which crawls overlap' audit "
    "before mixing corpora into a training run.",
)
def t_cross_dup_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        "source",
        F.md5(F.substring(T.normalize_text(F.col("text")), 1, 64)).alias("fp"),
    )
    a = fp.select(
        "fp", F.col("source").alias("source_a"), F.col("doc_id").alias("ida")
    )
    b = fp.select(
        "fp", F.col("source").alias("source_b"), F.col("doc_id").alias("idb")
    )
    return (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            F.count_distinct("fp").alias("n_texts"),
        )
    )


@register(
    "t_doc_prefix_clusters",
    oracle="""
SELECT md5(prefix) AS prefix_fp, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS rep_id
FROM (SELECT doc_id,
             substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 64) AS prefix
      FROM documents)
GROUP BY prefix HAVING count(*) >= 2
""",
    doc="Prefix-duplicate clusters: documents sharing the same first 64 "
    "normalized chars (template/boilerplate openings — the cheap "
    "first-pass family grouping before shingle-level near-dup). One "
    "hash-shuffle on the prefix; min-id representative like "
    "exact_dedup.",
)
def t_doc_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pref = docs.select(
        "doc_id",
        F.substring(T.normalize_text(F.col("text")), 1, 64).alias("prefix"),
    )
    return (
        pref.groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("rep_id"))
        .filter(F.col("n_docs") >= 2)
        .select(F.md5("prefix").alias("prefix_fp"), "n_docs", "rep_id")
    )


@register(
    "q_mutual_info_terms",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
nt AS (SELECT tk, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_t FROM tok GROUP BY 1 HAVING count(DISTINCT doc_id) >= 10),
ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY 1),
nts AS (SELECT tk, source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ts FROM tok GROUP BY 1, 2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
SELECT nts.source, nts.tk AS term, nts.n_ts,
       round(CAST(nts.n_ts AS DOUBLE) * CAST(tot.n_total AS DOUBLE)
             / (CAST(nt.n_t AS DOUBLE) * CAST(ns.n_s AS DOUBLE)), 6) AS lift
FROM nts JOIN nt USING (tk) JOIN ns USING (source) CROSS JOIN tot
WHERE CAST(nts.n_ts AS DOUBLE) * CAST(tot.n_total AS DOUBLE)
      / (CAST(nt.n_t AS DOUBLE) * CAST(ns.n_s AS DOUBLE)) >= 1.5
""",
    doc="Source-characteristic terms via pointwise mutual information, "
    "kept log-free as the rational lift p(t,s)/(p(t)p(s)) (monotone in "
    "PMI, bit-portable across engines like the BM25 rational idf): "
    "document-frequency joins on the exploded distinct-token set, "
    "per-source totals broadcast, corpus total ONE broadcast row. "
    "The 'what vocabulary distinguishes this crawl' audit — min "
    "df 10 prunes the hapax tail before the stats joins.",
)
def q_mutual_info_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(T.tokens(T.normalize_text(F.col("text"))))
        ).alias("tk"),
    )
    nt = (
        tok.groupBy("tk")
        .agg(F.count_distinct("doc_id").alias("n_t"))
        .filter(F.col("n_t") >= 10)
    )
    ns = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    nts = tok.groupBy("tk", "source").agg(
        F.count_distinct("doc_id").alias("n_ts")
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n_total"))
    lift = (
        F.col("n_ts").cast("double")
        * F.col("n_total").cast("double")
        / (F.col("n_t").cast("double") * F.col("n_s").cast("double"))
    )
    return (
        nts.join(nt, "tk")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .filter(lift >= 1.5)
        .select(
            "source",
            F.col("tk").alias("term"),
            "n_ts",
            F.round(lift, 6).alias("lift"),
        )
    )


@register(
    "mm_png_decode_dhash",
    oracle="""
WITH px AS (
  SELECT doc_id, i, j,
         ascii(substr(text, i * 16 + (j * 16) // 9 + 1, 1)) AS p,
         ascii(substr(text, i * 16 + ((j + 1) * 16) // 9 + 1, 1)) AS pn
  FROM documents, range(0, 8) r1(i), range(0, 8) r2(j)
  WHERE n_chars >= 128
)
SELECT doc_id AS media_id,
       CAST(sum(CASE WHEN i < 4 AND p > pn
                     THEN (CAST(1 AS BIGINT) << (i * 8 + j)) ELSE 0 END)
            AS BIGINT) AS dhash_hi,
       CAST(sum(CASE WHEN i >= 4 AND p > pn
                     THEN (CAST(1 AS BIGINT) << ((i - 4) * 8 + j)) ELSE 0 END)
            AS BIGINT) AS dhash_lo
FROM px GROUP BY doc_id
""",
    doc="Perceptual hash through the REAL PNG codec, full-value "
    "oracled: each doc's first 128 bytes become an 8x16 gray raster, "
    "encode_png compresses it with the scanline filter cycling "
    "doc_id % 5 (so the corpus exercises ALL FIVE decode filter "
    "branches: None/Sub/Up/Average/Paeth), decode_png (pure "
    "numpy+zlib, no codec library) reconstructs the pixels, and dHash "
    "runs on the decoded raster. Deflate+filter round-trip is "
    "lossless, so the oracle recomputes the hash from the raw bytes — "
    "any filter-reconstruction bug anywhere in the codec flips hash "
    "bits and fails the value match. Arrow-batched mapInPandas both "
    "sides; bytes never leave the executors.",
)
def mm_png_decode_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_png, image_dhash

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 128)
    return image_dhash(attach_png(docs, "doc_id", "text"))


@register(
    "q_jaccard_knn_graph",
    oracle=f"""
WITH {_SQL_SHINGLES},
jp AS (
  SELECT id_a, id_b, inter * 1.0 / (s1.n + s2.n - inter) AS j
  FROM pairs JOIN sizes s1 ON s1.doc_id = id_a JOIN sizes s2 ON s2.doc_id = id_b
  WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.2
),
und AS (
  SELECT id_a AS src, id_b AS dst, j FROM jp
  UNION ALL
  SELECT id_b, id_a, j FROM jp
),
rk AS (
  SELECT src, dst, j,
         row_number() OVER (PARTITION BY src ORDER BY j DESC, dst) AS rank
  FROM und
)
SELECT src, dst, CAST(rank AS BIGINT) AS rank, round(j, 6) AS jaccard
FROM rk WHERE rank <= 3
""",
    doc="Document k-NN graph (k=3) by shingle Jaccard: candidate pairs "
    "from the inverted-index join (docs must share a shingle — never "
    "corpus²), floor 0.2 prunes before ranking, both directions "
    "mirrored so each doc ranks all its candidates, then a "
    "PER-SOURCE-PARTITIONED row_number window (dst tiebreak pins "
    "order). The similarity-graph input to clustering/label-prop; at "
    "100 TB the candidate stage swaps to MinHash-LSH bands with the "
    "same downstream shape.",
)
def q_jaccard_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # max_shingle_df=None here so the oracle replay stays exact; the
    # operator's knob is the production path for skewed corpora
    return DD.jaccard_knn_graph(
        docs, "doc_id", "text", k=3, knn=3, floor=0.2, max_shingle_df=None
    )


@register(
    "t_udf_isolation_score",
    oracle="""
WITH feats AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS f1,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS DOUBLE) AS f2,
         CAST(len(list_distinct(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> ''))) AS DOUBLE)
         / CAST(len(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS DOUBLE) AS f3
  FROM documents
),
med AS (SELECT median(f1) AS m1, median(f2) AS m2, median(f3) AS m3 FROM feats),
dev AS (SELECT f.*, m1, m2, m3, abs(f1-m1) AS d1, abs(f2-m2) AS d2, abs(f3-m3) AS d3 FROM feats f CROSS JOIN med),
mad AS (SELECT median(d1) AS a1, median(d2) AS a2, median(d3) AS a3 FROM dev)
SELECT doc_id,
       round((abs((f1-m1)/(1.4826*a1)) + abs((f2-m2)/(1.4826*a2)) + abs((f3-m3)/(1.4826*a3)))/3.0, 6) AS iso_score
FROM dev CROSS JOIN mad
""",
    doc="Per-document outlier ('isolation') score — mean scaled-MAD "
    "|z| over three features (chars, tokens, distinct-token ratio) — "
    "with the scoring arithmetic in an ARROW-VECTORIZED pandas UDF: "
    "the demonstration that when Python math is unavoidable, the "
    "Arrow batch path (ArrowEvalPython, numpy element-wise doubles) "
    "is bit-identical to the SQL oracle and never row-at-a-time. "
    "Feature extraction and the median/MAD stats stay in Catalyst; "
    "the two 1-row stats frames are broadcast back. Scale knob: the "
    "six exact percentile() aggregates buffer values per group — kept "
    "for bit-exact oracle replay; at 100 TB swap each for "
    "approx_percentile(col, 0.5, 10000), a one-pass fixed-memory "
    "sketch with the same plan shape (SCALING.md, 'Exact vs "
    "approximate percentiles').",
)
def t_udf_isolation_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    docs = load_table(spark, sf_dir, "documents")
    toks_raw = T.tokens(F.col("text"))
    toks_norm = T.tokens(T.normalize_text(F.col("text")))
    feats = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("f1"),
        F.size(toks_raw).cast("double").alias("f2"),
        (
            F.size(F.array_distinct(toks_norm)).cast("double")
            / F.size(toks_norm).cast("double")
        ).alias("f3"),
    )
    stats = feats.agg(
        *[
            F.expr(f"percentile(f{i}, 0.5)").alias(f"med{i}")
            for i in (1, 2, 3)
        ]
    )
    devs = feats.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "f1",
        "f2",
        "f3",
        "med1",
        "med2",
        "med3",
        *[
            F.abs(F.col(f"f{i}") - F.col(f"med{i}")).alias(f"d{i}")
            for i in (1, 2, 3)
        ],
    )
    mads = devs.agg(
        *[F.expr(f"percentile(d{i}, 0.5)").alias(f"mad{i}") for i in (1, 2, 3)]
    )
    joined = devs.crossJoin(F.broadcast(mads))

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's signature inspection rejects — the
    # explicit returnType + functionType carry the contract instead
    def _iso_score(f1, m1, a1, f2, m2, a2, f3, m3, a3):
        import numpy as np

        z1 = np.abs((f1.values - m1.values) / (1.4826 * a1.values))
        z2 = np.abs((f2.values - m2.values) / (1.4826 * a2.values))
        z3 = np.abs((f3.values - m3.values) / (1.4826 * a3.values))
        return pd.Series((z1 + z2 + z3) / 3.0)

    iso_score = pandas_udf(_iso_score, "double")

    return joined.select(
        "doc_id",
        F.round(
            iso_score(
                "f1", "med1", "mad1",
                "f2", "med2", "mad2",
                "f3", "med3", "mad3",
            ),
            6,
        ).alias("iso_score"),
    )


@register(
    "t_type_token_ratio",
    oracle="""
WITH tok AS (
  SELECT doc_id, source,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
per AS (SELECT source, tk, count(*) AS n FROM tok GROUP BY 1, 2)
SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS ttr
FROM per GROUP BY 1
""",
    doc="Per-source vocabulary health: token volume, distinct terms, "
    "hapax count, and type-token ratio — the Heaps-law corpus audit "
    "that catches template spam (low TTR) and OCR noise (hapax "
    "explosion) before a source enters the mix. Two keyed aggs over "
    "the exploded token stream; partial aggregation does the heavy "
    "lifting map-side.",
)
def t_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk"),
    )
    per = tok.groupBy("source", "tk").agg(F.count(F.lit(1)).alias("n"))
    return (
        per.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_terms",
            "n_hapax",
            F.round(
                F.col("n_terms").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("ttr"),
        )
    )


@register(
    "emb_standardize",
    oracle="""
WITH ex AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
),
mom AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n, sum(v) AS sx, sum(v*v) AS sxx
  FROM ex GROUP BY 1
),
st AS (
  SELECT dim, sx / n AS mu, sqrt((sxx - sx * sx / n) / (n - 1)) AS sd FROM mom
)
SELECT ex.vec_id, ex.dim, round((ex.v - st.mu) / st.sd, 6) AS z
FROM ex JOIN st USING (dim)
""",
    doc="Per-dimension embedding standardization (whitening's diagonal "
    "form): posexplode → per-dim moment agg (n, Σv, Σv²; mean and "
    "sample std derived in identical shape on both engines — never "
    "the engines' own stddev, whose stable accumulation orders "
    "differ) → d-row stats broadcast back. The preprocessing step "
    "before cosine/IVF when dimensions have wildly different scales; "
    "one keyed shuffle regardless of corpus size.",
)
def emb_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", F.posexplode("embedding").alias("dim", "v")).select(
        "vec_id", "dim", F.col("v").cast("double").alias("v")
    )
    mom = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sx"),
        F.sum(F.col("v") * F.col("v")).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    st = mom.select("dim", mean.alias("mu"), F.sqrt(var).alias("sd"))
    return ex.join(F.broadcast(st), "dim").select(
        "vec_id",
        "dim",
        F.round((F.col("v") - F.col("mu")) / F.col("sd"), 6).alias("z"),
    )


@register(
    "t_dedup_survivorship",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 64) AS prefix,
         (least(len({_SQL_TOKENS.format(col='text')}) / 50.0, 1.0)
          + 1.0 - least(coalesce(
                length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))
                  * 1.0 / nullif(length(text), 0), 0.0) * 5.0, 1.0)
          + CASE WHEN coalesce(list_sum(list_transform({_SQL_TOKENS.format(col='text')},
                                 x -> length(x))) * 1.0
                      / nullif(len({_SQL_TOKENS.format(col='text')}), 0), 0.0)
                     BETWEEN 3.0 AND 8.0
                 THEN 1.0 ELSE 0.5 END) / 3.0 AS quality
  FROM documents
),
fam AS (
  SELECT prefix, count(*) AS n_members FROM scored GROUP BY 1 HAVING count(*) >= 2
),
rk AS (
  SELECT s.prefix, s.doc_id, s.quality, f.n_members,
         row_number() OVER (PARTITION BY s.prefix ORDER BY s.quality DESC, s.doc_id) AS rk
  FROM scored s JOIN fam f USING (prefix)
)
SELECT md5(prefix) AS cluster_fp, doc_id AS survivor_id,
       CAST(n_members AS BIGINT) AS n_members, round(quality, 6) AS best_quality
FROM rk WHERE rk = 1
""",
    doc="Dedup survivorship policy: within each duplicate family "
    "(prefix-64 clusters here; MinHash/SemDeDup components drop in "
    "unchanged), KEEP THE BEST copy — highest composite quality "
    "score, doc_id tiebreak — not the arbitrary min-id the plain "
    "dedup queries use. The curation decision that turns 'we found "
    "duplicates' into 'this is the copy that enters the training "
    "mix'; one per-family-partitioned ranking window.",
)
def t_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    pref = docs.select(
        "doc_id",
        F.substring(T.normalize_text(F.col("text")), 1, 64).alias("prefix"),
        T.quality_score(F.col("text")).alias("quality"),
    )
    wcnt = Window.partitionBy("prefix")
    wrk = Window.partitionBy("prefix").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        pref.withColumn("n_members", F.count(F.lit(1)).over(wcnt))
        .filter(F.col("n_members") >= 2)
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            F.md5("prefix").alias("cluster_fp"),
            F.col("doc_id").alias("survivor_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.round("quality", 6).alias("best_quality"),
        )
    )


def _power_iteration_sql(iters: int = 3, scale: int = 10000) -> str:
    """Unrolled-CTE DuckDB replay of `power_iteration_top_pc` — same
    generator pattern as `_pagerank_oracle_sql`: every iteration is
    exact int64 arithmetic with truncation-toward-zero division, so
    the replay is bit-identical."""
    s = f"""
WITH exq AS (
  SELECT vec_id, i - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {scale}, 0) AS BIGINT) AS xq
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
),
v0 AS (SELECT DISTINCT dim, CAST({scale} AS BIGINT) AS vq FROM exq)
"""
    prev = "v0"
    for k in range(1, iters + 1):
        s += f""",
xv{k} AS (
  SELECT e.vec_id, sum(e.xq * v.vq) AS s
  FROM exq e JOIN {prev} v USING (dim) GROUP BY 1
),
sp{k} AS (
  SELECT vec_id,
         CAST((abs(s) // {scale}) * (CASE WHEN s < 0 THEN -1 ELSE 1 END) AS BIGINT) AS sp
  FROM xv{k}
),
w{k} AS (
  SELECT e.dim, sum(p.sp * e.xq) AS w
  FROM exq e JOIN sp{k} p USING (vec_id) GROUP BY 1
),
m{k} AS (SELECT max(abs(w)) AS m FROM w{k}),
v{k} AS (
  SELECT dim,
         CAST((abs(w) // greatest(m // {scale}, 1)) * (CASE WHEN w < 0 THEN -1 ELSE 1 END) AS BIGINT) AS vq
  FROM w{k} CROSS JOIN m{k}
)"""
        prev = f"v{k}"
    s += f"\nSELECT dim, vq FROM {prev}"
    return s


def _pc_projection_sql(iters: int = 3, scale: int = 10000, topk: int = 20) -> str:
    """Unrolled replay of the power iteration PLUS the per-vector
    projection onto the final component — all int64, ending in a
    deterministic top-k by |projection| (vec_id tiebreak)."""
    base = _power_iteration_sql(iters, scale)
    base = base[: base.rindex("\nSELECT dim, vq FROM")]
    return base + f""",
proj AS (
  SELECT e.vec_id, sum(e.xq * v.vq) AS proj_fp
  FROM exq e JOIN v{iters} v USING (dim) GROUP BY 1
)
SELECT vec_id, CAST(proj_fp AS BIGINT) AS proj_fp
FROM proj ORDER BY abs(proj_fp) DESC, vec_id LIMIT {topk}"""


@register(
    "emb_top_pc_power",
    oracle=_power_iteration_sql(3, 10000),
    doc="Top principal direction of the embedding matrix by distributed "
    "power iteration — w = Xᵀ(Xv) as two keyed aggregations per round "
    "(projection groupBy id, accumulation groupBy dim; the matrix "
    "never exists anywhere), renormalized each round in FIXED-POINT "
    "INT64 with truncation division, so three full iterations of "
    "iterative linear algebra replay bit-identically in the oracle "
    "(the PageRank micro-unit trick applied to PCA). Input to "
    "spectral hashing / projection pruning; shuffles keyed on id/dim "
    "only, d-row vector broadcast each round.",
)
def emb_top_pc_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.power_iteration_top_pc(
        emb, id_col="vec_id", vec_col="embedding", iters=3, scale=10000
    )


@register(
    "t_oov_rate",
    oracle="""
WITH tok AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
freq AS (SELECT tk, count(*) AS n FROM tok GROUP BY 1),
ranked AS (SELECT tk, row_number() OVER (ORDER BY n DESC, tk) AS rk FROM freq),
vocab AS (SELECT tk FROM ranked WHERE rk <= 40)
SELECT t.source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.tk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(sum(CASE WHEN v.tk IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS oov_rate
FROM tok t LEFT JOIN vocab v USING (tk)
GROUP BY 1
""",
    doc="Tokenizer-coverage audit: per-source out-of-vocabulary rate "
    "against the corpus top-40 vocabulary (the synthetic corpus has a "
    "tiny vocabulary; production uses the tokenizer's real vocab "
    "table). The top-k vocab is orderBy(freq desc, token).limit(k) — "
    "TakeOrderedAndProject: per-partition heaps and a metadata-sized "
    "reduction, no range exchange, no scratch spill; deterministic "
    "given the token tiebreak. Then broadcast against the token "
    "stream: one left join, one keyed agg. At a real 10⁸-term "
    "vocabulary the difference vs a global rank is a full "
    "shuffle+sort vs a heap merge. High OOV flags a source the "
    "tokenizer will shred into bytes — checked before it enters the mix.",
)
def t_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk"),
    )
    freq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        freq.orderBy(F.col("n").desc(), F.col("tk")).limit(40).select("tk")
    )
    return (
        tok.join(F.broadcast(vocab.withColumn("__in", F.lit(1))), "tk", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 additions: corpus-curation audits and sampling ops
# ---------------------------------------------------------------------------


@register(
    "t_score_calibrate",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
         (least(len({_SQL_TOKENS.format(col='text')}) / 50.0, 1.0)
          + (1.0 - least(coalesce(
               length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))
                 * 1.0 / nullif(length(text), 0), 0.0) * 5.0, 1.0))
          + (CASE WHEN coalesce(list_sum(list_transform({_SQL_TOKENS.format(col='text')},
                                 x -> length(x))) * 1.0
                       / nullif(len({_SQL_TOKENS.format(col='text')}), 0), 0.0)
                      BETWEEN 3.0 AND 8.0
               THEN 1.0 ELSE 0.5 END)) / 3.0 AS q
  FROM documents
),
st AS (SELECT source, min(q) AS lo, max(q) AS hi FROM scored GROUP BY 1)
SELECT s.doc_id, s.source,
       round(CASE WHEN st.hi > st.lo THEN (s.q - st.lo) / (st.hi - st.lo)
                  ELSE 0.5 END, 6) AS calibrated
FROM scored s JOIN st USING (source)
""",
    doc="Per-source min-max score calibration: quality scores are only "
    "comparable WITHIN a source (different boilerplate/length profiles "
    "shift the raw distribution), so cross-source sampling weights need "
    "each source mapped onto a common [0,1] scale first. min/max are "
    "ORDER-INDEPENDENT aggregates (unlike sums, no float accumulation "
    "ambiguity), so the per-source stats frame is bit-exact on both "
    "engines; it is tiny (one row per source) and broadcast back. "
    "Degenerate single-valued sources pin to 0.5.",
)
def t_score_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", T.quality_score(F.col("text")).alias("q")
    )
    st = scored.groupBy("source").agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    )
    return scored.join(F.broadcast(st), "source").select(
        "doc_id",
        "source",
        F.round(
            F.when(
                F.col("hi") > F.col("lo"),
                (F.col("q") - F.col("lo")) / (F.col("hi") - F.col("lo")),
            ).otherwise(F.lit(0.5)),
            6,
        ).alias("calibrated"),
    )


@register(
    "t_stratified_sample_hash",
    oracle="""
WITH rated AS (
  SELECT source,
         0.05 + 0.90 * ((CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 1000) / 1000.0) AS rate
  FROM (SELECT DISTINCT source FROM documents)
),
hashed AS (
  SELECT d.doc_id, d.source, r.rate,
         (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' || d.source), 1, 8)) AS BIGINT)
          / 4294967296.0) AS u
  FROM documents d JOIN rated r USING (source)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(any_value(rate), 6) AS rate
FROM hashed
GROUP BY 1
""",
    doc="Deterministic stratified sampling: each source gets a sampling "
    "rate (here derived from a hash of the source name; production "
    "passes a curated rate table) and each doc an md5-uniform u in "
    "[0,1) from its (id, source) key — keep iff u < rate. Hash-based "
    "Bernoulli is reproducible across runs/engines/partitionings "
    "(rand() is none of those) and needs no shuffle at all: the rate "
    "table is a broadcast dim, the decision is a per-row projection. "
    "The audit output is per-source totals; the keep decision itself "
    "is the same predicate inlined in a sampling pipeline.",
)
def t_stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rated = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                F.lit(0.05)
                + F.lit(0.90)
                * ((DD.md5_hash64(F.col("source")) % 1000) / F.lit(1000.0))
            ).alias("rate"),
        )
    )
    hashed = docs.join(F.broadcast(rated), "source").select(
        "source",
        "rate",
        (
            DD.md5_hash64(
                F.concat_ws("|", F.col("doc_id").cast("string"), F.col("source"))
            )
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    return hashed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("u") < F.col("rate"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.round(F.first("rate"), 6).alias("rate"),
    )


@register(
    "t_ngram_novelty",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_SQL_TOKENS.format(col='text')} AS t FROM documents
),
sh AS (
  SELECT DISTINCT source, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
),
spread AS (
  SELECT shingle, count(*) AS n_src FROM sh GROUP BY 1
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN p.n_src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(sum(CASE WHEN p.n_src = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS novelty
FROM sh s JOIN spread p USING (shingle)
GROUP BY 1
""",
    doc="Per-source n-gram novelty: the fraction of a source's distinct "
    "3-word shingles that appear in NO other source — near 0 flags a "
    "source that is a re-crawl/mirror of ones already in the mix "
    "(adding volume, not diversity); near 1 flags genuinely new text. "
    "Shape: distinct (source, shingle) explode, one groupBy on the "
    "shingle (n_src is a partial-aggregated count), one groupBy back "
    "on source — the same inverted-index backbone as the dedup "
    "family, aggregated at source rather than document granularity.",
)
def t_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import spread_small_scan

    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("source", "text")
    )
    toks = docs.select("source", T.tokens(F.col("text")).alias("__toks"))
    sh = toks.select(
        "source",
        F.explode(T.shingles_from_tokens(F.col("__toks"), 3)).alias("shingle"),
    ).distinct()
    spread = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_src"))
    return (
        sh.join(spread, "shingle")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("n_src") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "source",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


@register(
    "t_context_pack",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, len({_SQL_TOKENS.format(col='text')}) AS n_tok
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
  FROM toks
),
packed AS (
  SELECT source, CAST((cum_tok - 1) // 512 AS BIGINT) AS pack_id, n_tok
  FROM cum WHERE n_tok > 0
)
SELECT source, pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM packed GROUP BY 1, 2
""",
    doc="Context-window packing: assign documents (in stable doc_id "
    "order, per source) to fixed token-budget packs of 512 — the "
    "sequence-assembly step of a pretraining pipeline, where docs are "
    "concatenated into training windows without splitting documents. "
    "pack_id = floor((inclusive running token total − 1)/budget): a "
    "pure window cumsum PARTITIONED by source (scale-safe — no global "
    "window; sources are the natural parallel unit and packing order "
    "only needs to be stable within one). Integer arithmetic end to "
    "end. Boundary docs straddle packs by design (greedy first-fit "
    "is a sequential fold — this cumsum shard is the distributed "
    "standard; at 100 TB each source partition packs independently).",
)
def t_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", T.token_count(F.col("text")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_tok", F.sum("n_tok").over(w))
    packed = cum.filter(F.col("n_tok") > 0).select(
        "source",
        # integer div on BOTH engines — float-divide-then-cast differs
        # (DuckDB CAST rounds, Spark cast truncates)
        F.expr("(cum_tok - 1) div 512").cast("long").alias("pack_id"),
        "n_tok",
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )


@register(
    "t_entropy_score",
    oracle="""
WITH chars AS (
  SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
                                       i -> substr(text, i, 1))) AS ch
  FROM documents WHERE length(text) > 0
),
counts AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
terms AS (
  SELECT doc_id,
         CAST(round(c * ln(CAST(c AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS term_fp,
         c
  FROM counts
)
SELECT doc_id,
       round(ln(CAST(sum(c) AS DOUBLE))
             - (CAST(sum(term_fp) AS DOUBLE) / 1000000.0) / CAST(sum(c) AS DOUBLE),
             6) AS entropy
FROM terms GROUP BY 1
""",
    doc="Character-distribution Shannon entropy per document (nats): "
    "low entropy flags repetitive junk (progress bars, base64 walls, "
    "keyboard mash) that length/punct heuristics miss. Identity used: "
    "H = ln(n) − (Σ c·ln c)/n, with the per-char term FIXED-POINT "
    "integerized (round(c·ln c·1e6) as int64) so the Σ across a "
    "document's characters is an EXACT integer sum — float summation "
    "order across engines/partitions can never change the result "
    "(each term is per-row IEEE math, bit-equal on both engines; only "
    "the reduction needed protection). One explode + two keyed "
    "groupBys, all partial-aggregated.",
)
def t_entropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import spread_small_scan

    # The ~240x char explode below amplifies whatever parallelism the
    # scan has; a single-file corpus would run the whole explode +
    # partial agg on one task. Spread the narrow (doc_id, text)
    # projection BEFORE exploding so the round-robin moves documents,
    # not characters.
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
    )
    chars = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text")),
                lambda i: F.col("text").substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    terms = counts.select(
        "doc_id",
        "c",
        F.round(F.col("c") * F.log(F.col("c").cast("double")) * 1e6, 0)
        .cast("long")
        .alias("term_fp"),
    )
    return terms.groupBy("doc_id").agg(
        F.round(
            F.log(F.sum("c").cast("double"))
            - (F.sum("term_fp").cast("double") / F.lit(1e6))
            / F.sum("c").cast("double"),
            6,
        ).alias("entropy")
    )


@register(
    "dedup_overlap_coeff",
    oracle=f"""
WITH {_SQL_SHINGLES}
SELECT id_a, id_b, round(inter * 1.0 / least(s1.n, s2.n), 6) AS overlap
FROM pairs
JOIN sizes s1 ON s1.doc_id = id_a
JOIN sizes s2 ON s2.doc_id = id_b
WHERE inter * 1.0 / least(s1.n, s2.n) >= 0.7
""",
    doc="Overlap-coefficient near-dup pairs |A∩B|/min(|A|,|B|) ≥ 0.7 — "
    "the third Broder-family measure: 1.0 whenever either side's "
    "shingles are a subset of the other's regardless of size ratio "
    "(catches template instantiations Jaccard dilutes), symmetric "
    "unlike directed containment. Shares the inverted-index backbone "
    "and max_shingle_df hot-shingle cap with the Jaccard/containment "
    "siblings (operators/dedup._shingle_pair_stats).",
)
def dedup_overlap_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_overlap_pairs(docs, "doc_id", "text", k=3, threshold=0.7)
    return pairs.select("id_a", "id_b", F.round("overlap", 6).alias("overlap"))


_EST_TERMS = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(16)
)


@register(
    "t_minhash_est_vs_exact",
    oracle=f"""
WITH {_SQL_SHINGLES},
{_minhash_sql(16, 42).strip().lstrip()},
cand AS (SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5),
est AS (
  SELECT c.id_a, c.id_b, c.jaccard,
         ({_EST_TERMS}) / 16.0 AS est_j
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
)
SELECT id_a, id_b,
       round(jaccard, 6) AS exact_j,
       est_j,
       round(abs(est_j - jaccard), 6) AS abs_err
FROM est
""",
    doc="Sketch-accuracy audit: MinHash-estimated Jaccard (fraction of "
    "agreeing components across the 16-permutation signature) against "
    "exact shingle Jaccard for every pair ≥ 0.5 — the measurement "
    "that justifies banding parameters before a 100 TB run (E[est] = "
    "J, σ = sqrt(J(1−J)/k); k=16 ⇒ σ ≈ 0.12 at J=0.8, so bands must "
    "over-generate and the exact verify stage is not optional). "
    "Signatures and exact pairs both derive from one shingle explode; "
    "est is an exact multiple of 1/16 (no float ambiguity).",
)
def t_minhash_est_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    sig = DD.minhash_signatures(docs, "doc_id", "text", k_shingle=3, num_hashes=16)
    sa = sig.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)]
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)]
    )
    matches = None
    for i in range(16):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round("jaccard", 6).alias("exact_j"),
            (matches / F.lit(16.0)).alias("est_j"),
            F.round(F.abs(matches / F.lit(16.0) - F.col("jaccard")), 6).alias(
                "abs_err"
            ),
        )
    )


@register(
    "t_dup_cluster_sizes",
    oracle=f"""
WITH RECURSIVE {_SQL_SHINGLES.strip().rstrip()},
jpairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM jpairs
          UNION ALL SELECT id_b, id_a FROM jpairs),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
),
comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
csizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM csizes GROUP BY 1
""",
    doc="Near-dup cluster size distribution: connected components over "
    "the Jaccard≥0.8 graph, then a histogram of component sizes — the "
    "curator-facing shape report (a heavy tail of giant clusters "
    "means boilerplate/mirroring; mostly pairs means true near-dups). "
    "Spark runs iterative min-label propagation with an O(log n) "
    "large/small-star fallback; the oracle replays it as a recursive-"
    "CTE transitive closure. Dedup volume impact reads directly off "
    "this table: Σ (size−1)·n_clusters docs would be dropped.",
)
def t_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    comp = DD.connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    ).select(F.col("cluster_size").cast("long").alias("cluster_size"), "n_clusters")


@register(
    "emb_pc_outliers",
    oracle=_pc_projection_sql(3, 10000, 20),
    doc="Spectral outliers: each embedding's projection onto the "
    "power-iteration top principal direction (exact int64 dot product "
    "of the fixed-point matrix row with the fixed-point component), "
    "top-20 by |projection| — vectors dominating the top PC are "
    "cluster-collapsing outliers / duplicated boilerplate embeddings "
    "that curation inspects first. The d-row component broadcasts; "
    "the projection is one keyed agg; top-k is TakeOrderedAndProject "
    "(per-partition heaps, no global sort).",
)
def emb_pc_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = SIM.power_iteration_top_pc(
        emb, id_col="vec_id", vec_col="embedding", iters=3, scale=10000
    )
    exq = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        "dim",
        F.round(F.col("x").cast("double") * 10000, 0).cast("long").alias("xq"),
    )
    proj = (
        exq.join(F.broadcast(v), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.col("xq") * F.col("vq")).alias("proj_fp"))
    )
    return (
        proj.orderBy(F.abs(F.col("proj_fp")).desc(), "vec_id")
        .limit(20)
        .select("vec_id", F.col("proj_fp").cast("long").alias("proj_fp"))
    )


@register(
    "t_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
freq AS (SELECT tk, count(*) AS n FROM tok GROUP BY 1),
total AS (SELECT count(*) AS big_n FROM tok),
terms AS (
  SELECT t.doc_id,
         CAST(round(ln(f.n * 1.0 / s.big_n) * 1000000.0, 0) AS BIGINT) AS lp_fp
  FROM tok t JOIN freq f USING (tk) CROSS JOIN total s
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(-(CAST(sum(lp_fp) AS DOUBLE) / 1000000.0) / count(*), 6) AS avg_nll
FROM terms GROUP BY 1
""",
    doc="Unigram language-model scoring: corpus MLE token probabilities, "
    "per-document average negative log-likelihood — the cheapest "
    "perplexity proxy; docs whose own corpus scores them as improbable "
    "are gibberish/OCR junk, docs scoring extremely probable are "
    "boilerplate (both tails get reviewed). Per-token log-prob terms "
    "are FIXED-POINT integerized (round(ln p·1e6) as int64), so the "
    "per-doc Σ is an exact integer reduction — summation order across "
    "partitions cannot move the score. Every doc token is in-vocab by "
    "construction (the LM is the corpus itself) — no smoothing term. "
    "Plan: token explode, one freq groupBy, a 1-row total broadcast, "
    "one join back keyed on token (shuffle join at 100 TB vocab; "
    "Catalyst/AQE broadcasts while the dictionary fits), one doc agg.",
)
def t_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk"),
    )
    freq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("n"))
    total = tok.agg(F.count(F.lit(1)).alias("big_n"))
    terms = (
        tok.join(freq, "tk")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(
                F.log(F.col("n") * F.lit(1.0) / F.col("big_n")) * 1e6, 0
            )
            .cast("long")
            .alias("lp_fp"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            -(F.sum("lp_fp").cast("double") / F.lit(1e6))
            / F.count(F.lit(1)),
            6,
        ).alias("avg_nll"),
    )


@register(
    "emb_dim_fidelity",
    oracle=f"""
WITH u AS (
  SELECT vec_id,
         {_SQL_UNIT.format(a='embedding')} AS un,
         {_SQL_UNIT.format(a='embedding[1:16]')} AS un16
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, un AS qu, un16 AS qu16 FROM u WHERE vec_id < 5),
full_scored AS (
  SELECT q_id, c.vec_id AS cand_id,
         {_SQL_DOT.format(a='qu', b='c.un')} AS cos
  FROM u c, q WHERE c.vec_id <> q_id
),
full_rk AS (
  SELECT q_id, cand_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
  FROM full_scored
),
full_top AS (SELECT q_id, cand_id FROM full_rk WHERE rn <= 10),
tr_scored AS (
  SELECT q_id, c.vec_id AS cand_id,
         {_SQL_DOT.format(a='qu16', b='c.un16')} AS cos
  FROM u c, q WHERE c.vec_id <> q_id
),
tr_rk AS (
  SELECT q_id, cand_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
  FROM tr_scored
),
tr_top AS (SELECT q_id, cand_id FROM tr_rk WHERE rn <= 10)
SELECT f.q_id, CAST(count(t.cand_id) AS BIGINT) AS n_overlap
FROM full_top f LEFT JOIN tr_top t USING (q_id, cand_id)
GROUP BY 1
""",
    doc="Dimension-truncation fidelity (the Matryoshka-embedding "
    "question): for each query, how many of the exact top-10 cosine "
    "neighbors survive when vectors are truncated to their first 16 "
    "dims and renormalized? Answers whether a cheap low-dim prefilter "
    "can front an exact reranker — overlap ≈ 10 means the 4× cheaper "
    "scan loses nothing; low overlap means these embeddings don't "
    "front-load information and IVF/PQ is the right compression "
    "instead. Both rankings share one normalization pass; the overlap "
    "join is on (query, candidate) keys only.",
)
def emb_dim_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    tr = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    full_top = SIM.cosine_topk(emb.filter(F.col("vec_id") < 5), emb, k=10)
    tr_top = SIM.cosine_topk(tr.filter(F.col("vec_id") < 5), tr, k=10)
    return (
        full_top.join(tr_top, ["q_id", "cand_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(full_top.select("q_id").distinct(), "q_id", "right")
        .select(
            "q_id", F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_overlap")
        )
    )


def _band_case_sql(num_hashes: int = 16, bands: int = 4) -> str:
    rows = num_hashes // bands
    whens = "\n           ".join(
        "WHEN {b} THEN concat_ws('_', {b}, {cols})".format(
            b=bi, cols=", ".join(f"mh{bi * rows + r}" for r in range(rows))
        )
        for bi in range(bands)
    )
    return f"CASE u.b\n           {whens}\n         END"


@register(
    "t_lsh_recall_audit",
    oracle=f"""
WITH {_SQL_SHINGLES},
{_minhash_sql(16, 42).strip().lstrip()},
bands AS (
  SELECT doc_id,
         {_band_case_sql(16, 4)} AS band_key
  FROM sig, UNNEST([0, 1, 2, 3]) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
ex AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8)
SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
       CAST((SELECT count(*) FROM ex e JOIN cand c USING (id_a, id_b)) AS BIGINT) AS n_recalled,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates
""",
    doc="LSH banding recall audit: of the exact Jaccard≥0.8 pairs, how "
    "many does the 16-hash/4-band candidate stage actually produce — "
    "and at what candidate volume? The companion to the "
    "estimate-accuracy audit: together they justify (num_hashes, "
    "bands) before a 100 TB run, where a recall miss is silent data "
    "corruption (dups survive) and candidate volume is the job cost. "
    "Band keys are identical to the production _signature_bands "
    "composite (asserted by the shared constants); the three counts "
    "collapse to 1-row aggregates joined scalar-wise.",
)
def t_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = DD.shingle_sets(docs, "doc_id", "text", 3).persist()
    banded = DD._signature_bands(sh, "doc_id", 16, 4, 42)
    a = banded.select(F.col("doc_id").alias("id_a"), "band_key")
    b = banded.select(F.col("doc_id").alias("id_b"), "band_key")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    exact = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8).persist()
    recalled = exact.join(cand, ["id_a", "id_b"], "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(recalled.agg(F.count(F.lit(1)).alias("n_recalled")))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
    )


@register(
    "t_shard_skew_audit",
    oracle="""
WITH sharded AS (
  SELECT (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32) AS shard_id,
         n_chars
  FROM documents
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_bytes
FROM sharded GROUP BY 1
""",
    doc="Export-shard skew audit: hash documents into 32 shards with the "
    "portable md5 hash (the same function a sharded writer uses) and "
    "report per-shard doc and byte volume — run BEFORE a 100 TB "
    "export to confirm the shard key spreads bytes, not just rows "
    "(a few giant docs can skew bytes 10x on uniform row counts, and "
    "the slowest shard is the job's wall clock). One keyed agg; "
    "reading max/mean off 32 rows is the caller's division.",
)
def t_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            (DD.md5_hash64(F.col("doc_id").cast("string")) % 32).alias("shard_id"),
            "n_chars",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
        )
    )


@register(
    "t_zipf_fit",
    oracle="""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
freq AS (SELECT tk, count(*) AS n FROM tok GROUP BY 1),
topk AS (SELECT tk, n FROM freq ORDER BY n DESC, tk LIMIT 1000),
rk AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, tk) AS rank FROM topk
),
fp AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS x,
         CAST(round(ln(CAST(n AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS y
  FROM rk
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM fp
)
SELECT m AS n_terms,
  round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
FROM mom
""",
    doc="Zipf-law fit: OLS slope of ln(freq) vs ln(rank) over the "
    "top-1000 vocabulary — natural text sits near −1; a flat slope "
    "flags templated/synthetic text, a cliff flags deduplication "
    "residue. Ranks come from the distributed global_row_number over "
    "the orderBy+limit top-k (TakeOrderedAndProject — the vocab side "
    "is 1000 rows regardless of corpus size); the log coordinates are "
    "FIXED-POINT integerized (round(ln·1e6) as int64, products "
    "≤ 4e17) so the OLS moments are exact integer sums — the "
    "q_group_regression moment pattern with the float-sum ambiguity "
    "removed entirely. Slope derives from moments in identical double "
    "shape on both engines; the 1e6 scaling cancels in cov/var.",
)
def t_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk")
    )
    freq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("n"))
    topk = freq.orderBy(F.col("n").desc(), F.col("tk")).limit(1000)
    rk = global_row_number(
        topk, [F.col("n").desc(), F.col("tk")], out_col="rank"
    )
    fp = rk.select(
        F.round(F.log(F.col("rank").cast("double")) * 1e6, 0)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("n").cast("double")) * 1e6, 0)
        .cast("long")
        .alias("y"),
    )
    mom = fp.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    md, sxd, syd, sxyd, sxxd = (
        F.col("m").cast("double"),
        F.col("sx").cast("double"),
        F.col("sy").cast("double"),
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
    )
    return mom.select(
        F.col("m").alias("n_terms"),
        F.round(
            (md * sxyd - sxd * syd) / (md * sxxd - sxd * sxd), 6
        ).alias("zipf_slope"),
    )


@register(
    "t_bigram_surprisal",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
  WHERE len(t) >= 2
),
bfreq AS (SELECT w1, w2, count(*) AS nb FROM bg GROUP BY 1, 2),
lfreq AS (SELECT w1, count(*) AS nl FROM bg GROUP BY 1),
terms AS (
  SELECT g.doc_id,
         CAST(round(ln(b.nb * 1.0 / l.nl) * 1000000.0, 0) AS BIGINT) AS lp_fp
  FROM bg g JOIN bfreq b USING (w1, w2) JOIN lfreq l USING (w1)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-(CAST(sum(lp_fp) AS DOUBLE) / 1000000.0) / count(*), 6) AS avg_surprisal
FROM terms GROUP BY 1
""",
    doc="Bigram conditional surprisal: per document, the average "
    "-ln p(w2|w1) under corpus MLE bigram statistics (p = bigram "
    "count / left-context count) — the next step up from the unigram "
    "LM score: repeated boilerplate scores near zero (its bigrams "
    "dominate their contexts), scrambled/OCR text scores high. No "
    "smoothing needed: every doc bigram is in-corpus by construction. "
    "Fixed-point per-bigram terms (round(ln p * 1e6) as int64) make "
    "the per-doc reduction an exact integer sum. Plan: one bigram "
    "explode, two freq groupBys, two keyed joins back (token-keyed "
    "shuffles at 100 TB vocab), one doc agg — all partial-aggregated.",
)
def t_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", T.tokens(T.normalize_text(F.col("text"))).alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bfreq = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nb"))
    lfreq = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("nl"))
    terms = (
        bg.join(bfreq, ["w1", "w2"]).join(lfreq, "w1")
        .select(
            "doc_id",
            F.round(F.log(F.col("nb") * F.lit(1.0) / F.col("nl")) * 1e6, 0)
            .cast("long")
            .alias("lp_fp"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            -(F.sum("lp_fp").cast("double") / F.lit(1e6)) / F.count(F.lit(1)), 6
        ).alias("avg_surprisal"),
    )


@register(
    "t_dataset_card",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source, lang, n_chars,
         (least(len({_SQL_TOKENS.format(col='text')}) / 50.0, 1.0)
          + (1.0 - least(coalesce(
               length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))
                 * 1.0 / nullif(length(text), 0), 0.0) * 5.0, 1.0))
          + (CASE WHEN coalesce(list_sum(list_transform({_SQL_TOKENS.format(col='text')},
                                 x -> length(x))) * 1.0
                       / nullif(len({_SQL_TOKENS.format(col='text')}), 0), 0.0)
                      BETWEEN 3.0 AND 8.0
               THEN 1.0 ELSE 0.5 END)) / 3.0 AS q,
         len({_SQL_TOKENS.format(col='text')}) AS n_tok,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
dups AS (SELECT fp, count(*) AS nfp FROM scored GROUP BY 1)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(s.n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(s.n_chars) AS BIGINT) AS n_chars,
       round(CAST(sum(CAST(round(s.q * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / count(*), 6) AS mean_quality,
       CAST(sum(CASE WHEN s.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       CAST(sum(CASE WHEN d.nfp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup
FROM scored s JOIN dups d USING (fp)
GROUP BY 1
""",
    doc="Dataset-card rollup: the one-table per-source summary a corpus "
    "release ships — doc/token/char volume, mean quality score, "
    "English share, and exact-duplicate involvement. Mean quality "
    "integerizes each per-row score (round(q*1e6) as int64) so the "
    "cross-partition sum is exact — the recurring fixed-point-sum "
    "trick; every other column is integer counting. One fingerprint "
    "groupBy + one source groupBy, both partial-aggregated.",
)
def t_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        "lang",
        "n_chars",
        T.quality_score(F.col("text")).alias("q"),
        T.token_count(F.col("text")).alias("n_tok"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    dups = scored.groupBy("fp").agg(F.count(F.lit(1)).alias("nfp"))
    return (
        scored.join(dups, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.round(
                F.sum(F.round(F.col("q") * 1e6, 0).cast("long")).cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)),
                6,
            ).alias("mean_quality"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("n_en"),
            F.sum(F.when(F.col("nfp") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_exact_dup"),
        )
    )


@register(
    "t_weighted_reservoir",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
             / 4294967297.0) / n_chars AS k
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, round(k, 6) AS sample_key
FROM keyed ORDER BY k, doc_id LIMIT 50
""",
    doc="Weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
    "A-ES): each doc draws key -ln(u)/w with u md5-uniform and "
    "w = n_chars; the 50 smallest keys are an exact weight-"
    "proportional sample — the length-weighted variant of the "
    "hash-stratified sampler, and the standard one-pass distributed "
    "algorithm (no sequential reservoir state: the key is a pure "
    "per-row function, selection is a top-k). Hash-derived u makes "
    "the sample reproducible across runs/engines/partitionings; "
    "top-k is TakeOrderedAndProject (per-partition heaps). The +1 / "
    "2^32+1 shift keeps u strictly inside (0,1).",
)
def t_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (DD.md5_hash64(F.col("doc_id").cast("string")) + F.lit(1.0)) / F.lit(
        4294967297.0
    )
    k = -F.log(u) / F.col("n_chars")
    keyed = docs.select("doc_id", k.alias("k"))
    return (
        keyed.orderBy("k", "doc_id")
        .limit(50)
        .select("doc_id", F.round("k", 6).alias("sample_key"))
    )


@register(
    "t_kn_bigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> [t[i], t[i + 1]])) AS p
  FROM tok WHERE len(t) >= 2
),
bge AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
c2 AS (SELECT w1, w2, count(*) AS c FROM bge GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS ctx, count(*) AS n1f FROM c2 GROUP BY 1),
cb AS (SELECT w2, count(*) AS n1b FROM c2 GROUP BY 1),
bt AS (SELECT count(*) AS bt FROM c2),
kn AS (
  SELECT c.w1, c.w2,
         (4 * c.c - 3) * s.bt + 3 * u.n1f * b.n1b AS nn,
         4 * u.ctx * s.bt AS dd
  FROM c2 c
  JOIN c1 u ON u.w1 = c.w1
  JOIN cb b ON b.w2 = c.w2
  CROSS JOIN bt s
),
lp AS (
  SELECT w1, w2,
         CAST(round(({LN_NN} - {LN_DD}) * 1000000.0, 0) AS BIGINT) AS lp_fp
  FROM kn
),
terms AS (
  SELECT g.doc_id, l.lp_fp
  FROM bge g JOIN lp l ON l.w1 = g.w1 AND l.w2 = g.w2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-(CAST(sum(lp_fp) AS DOUBLE) / 1000000.0) / count(*)
             * 1000000.0, 0) / 1000000.0 AS avg_nll
FROM terms GROUP BY 1
""".format(
        LN_NN=_PM.ln_posint_sql("nn", spark_dialect=False),
        LN_DD=_PM.ln_posint_sql("dd", spark_dialect=False),
    ),
    doc="Interpolated Kneser-Ney bigram language-model scoring "
    "(absolute discount D=0.75): per-document average negative "
    "log-likelihood under P_KN(w2|w1) = (c(w1,w2)-D)/c(w1.) + "
    "D*N1+(w1,.)/c(w1.) * N1+(.,w2)/|bigram types| — the classic "
    "smoothing that scores by CONTINUATION diversity, separating "
    "'frequent because versatile' from 'frequent because one template "
    "repeats it'; a materially better perplexity proxy than the "
    "unigram LM for boilerplate detection. Every bigram is in-corpus "
    "so the discounted term stays positive; P_KN is an exact RATIONAL "
    "((4c-3)*bt + 3*n1f*n1b) / (4*ctx*bt) of int64 terms, its log is "
    "taken with the PORTABLE ln (functions/portable_math: exact "
    "bit-length range reduction + atanh Horner series, bit-identical "
    "on both engines — the engines' own libm ln diverged by an ulp on "
    "one sf0.1 term and flipped the 1e-6 fixed-point rounding, the "
    "round-8 sweep find), and per-token terms are FIXED-POINT "
    "integerized (round(ln p*1e6) as int64) so the per-doc sum is an "
    "exact integer reduction regardless of partitioning. At larger "
    "corpora rescale: 4*ctx*bt must stay under 2^53 (divide both "
    "sides by gcd or bucket bt to kilo-units — same plan). Plan: "
    "bigram explode (transform over the token array, no self-join), "
    "ONE bigram groupBy that derives all three count tables (context "
    "totals and forward continuation counts re-aggregate the "
    "bigram-type table, not the corpus), a 1-row type-total "
    "broadcast, the per-TYPE log-prob computed once on the ~|types| "
    "frame then joined back to occurrences, one doc agg.",
)
def t_kn_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable_math import ln_posint
    from ..operators.ranks import spread_small_scan

    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", T.tokens(T.normalize_text(F.col("text"))).alias("t")
    ).filter(F.size("t") >= 2)
    bge = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    c2 = bge.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c").cast("long").alias("ctx"), F.count(F.lit(1)).alias("n1f")
    )
    cb = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    bt = c2.agg(F.count(F.lit(1)).alias("bt"))
    lp = (
        c2.join(c1, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(bt))
        .withColumn(
            "nn",
            (F.lit(4) * F.col("c") - F.lit(3)) * F.col("bt")
            + F.lit(3) * F.col("n1f") * F.col("n1b"),
        )
        .withColumn("dd", F.lit(4) * F.col("ctx") * F.col("bt"))
        .select(
            "w1",
            "w2",
            F.round((ln_posint("nn") - ln_posint("dd")) * F.lit(1e6), 0)
            .cast("long")
            .alias("lp_fp"),
        )
    )
    terms = bge.join(lp, ["w1", "w2"]).select("doc_id", "lp_fp")
    # final display rounding in the explicit multiply-round-divide
    # shape: Spark's round(x, 6) is exact-BigDecimal HALF_UP on the
    # binary value while DuckDB's scales by 1e6 FIRST (the multiply
    # itself can round onto the .5 boundary) — one sf0.1 doc landed at
    # 3.41638649999999977, which the two spellings round apart. The
    # explicit shape makes both engines run the identical IEEE ops.
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.round(
                -(F.sum("lp_fp").cast("double") / F.lit(1e6))
                / F.count(F.lit(1))
                * F.lit(1e6),
                0,
            )
            / F.lit(1e6)
        ).alias("avg_nll"),
    )


@register(
    "t_dp_count_release",
    oracle="""
WITH g AS (
  SELECT source, count(*) AS n,
         (CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) + 1.0)
           / 4294967297.0 AS u
  FROM documents GROUP BY 1
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       round(CAST(n AS DOUBLE)
             + (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
               * (-ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS dp_count
FROM g
""",
    doc="Laplace-noise MECHANISM DEMO for per-source count release — "
    "explicitly NOT a differential-privacy guarantee (round-7 advice): "
    "the noise here is a deterministic public function of the group "
    "key (md5-uniform through the Laplace inverse CDF), so anyone can "
    "recompute and subtract it; it demonstrates the mechanism's SHAPE "
    "(scale-1 Laplace via inverse-CDF, the eps=1 noise magnitude) in "
    "a form reproducible across runs, engines, and partitionings — "
    "which is exactly what an oracle-checked demo needs and exactly "
    "what a real release must not do. A real eps-DP release keeps the "
    "same plan shape but draws u from a SECRET per-release seed "
    "(e.g. HMAC(secret, source)) and drops the true counts; with a "
    "public seed the mechanism provides zero privacy even if true "
    "counts are withheld. One keyed agg plus pure per-row math — no "
    "extra shuffle, no RNG state, trivially scale-free. The "
    "+1 / 2^32+1 shift keeps u strictly inside (0,1) so ln never "
    "sees 0.",
)
def t_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    u = (DD.md5_hash64(F.col("source")) + F.lit(1.0)) / F.lit(4294967297.0)
    sgn = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    mag = -F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    return g.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.col("n").cast("double") + sgn * mag, 6).alias("dp_count"),
    )


@register(
    "t_curriculum_interleave",
    oracle="""
WITH b AS (
  SELECT doc_id, n_chars,
         CASE WHEN n_chars < 150 THEN 0
              WHEN n_chars < 350 THEN 1
              ELSE 2 END AS bucket
  FROM documents
),
r AS (
  SELECT doc_id, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY n_chars, doc_id) AS rk
  FROM b
)
SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
       CAST(rk AS BIGINT) AS rank_in_bucket
FROM r ORDER BY rk, bucket LIMIT 100
""",
    doc="Deterministic curriculum ordering: docs binned into three "
    "difficulty buckets (by length), ranked within bucket "
    "easiest-first, then interleaved round-robin across buckets — "
    "the standard mixed-difficulty training order that avoids both "
    "all-easy warmup collapse and hard-example front-loading; first "
    "100 positions emitted. The within-bucket rank does NOT use a "
    "3-partition window (3 giant tasks at 100 TB): it is the "
    "distributed global_row_number over (bucket, n_chars, doc_id) "
    "minus a per-bucket offset — one range exchange, a 3-row offset "
    "broadcast join, and the final interleave order is orderBy+limit "
    "(TakeOrderedAndProject). Oracle replays it as the equivalent "
    "partitioned row_number.",
)
def t_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("n_chars") < 150, 0)
        .when(F.col("n_chars") < 350, 1)
        .otherwise(2)
        .cast("int")
        .alias("bucket"),
    )
    pos = global_row_number(
        docs, [F.col("bucket"), F.col("n_chars"), F.col("doc_id")], "__rn"
    )
    offsets = pos.groupBy(F.col("bucket").alias("__b")).agg(
        F.min("__rn").alias("__off")
    )
    return (
        pos.join(F.broadcast(offsets), pos["bucket"] == offsets["__b"])
        .select(
            "doc_id",
            "bucket",
            (F.col("__rn") - F.col("__off") + F.lit(1)).alias("rank_in_bucket"),
        )
        .orderBy("rank_in_bucket", "bucket")
        .limit(100)
    )


@register(
    "sim_mips_norm_trick",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding,
         list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) AS n2
  FROM embeddings
),
m AS (SELECT max(n2) AS m2 FROM n),
c AS (
  SELECT vec_id,
         list_append(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                     sqrt(greatest(m.m2 - n2, 0.0))) AS aug
  FROM n, m
),
cu AS (SELECT vec_id, {_SQL_UNIT.format(a='aug')} AS un FROM c),
q AS (
  SELECT vec_id,
         list_append(list_transform(embedding, x -> CAST(x AS DOUBLE)), 0.0) AS aug
  FROM n WHERE vec_id < 5
),
qu AS (SELECT vec_id AS q_id, {_SQL_UNIT.format(a='aug')} AS qu FROM q),
scored AS (
  SELECT q_id, c.vec_id AS cand_id,
         {_SQL_DOT.format(a='qu', b='c.un')} AS s
  FROM cu c, qu WHERE c.vec_id <> q_id
),
ranked AS (
  SELECT q_id, cand_id,
         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, cand_id) AS rn
  FROM scored
)
SELECT q_id, cand_id FROM ranked WHERE rn <= 10
""",
    doc="Maximum-inner-product search via the norm-augmentation "
    "reduction (Bachrach et al. / Shrivastava-Li asymmetric "
    "transform): corpus vectors gain a tail sqrt(M^2-|x|^2) "
    "(M = corpus max norm), queries gain a 0 tail, and MIPS becomes "
    "cosine top-k over the augmented space — the trick that lets "
    "un-normalized recommender / reward-model scores reuse the whole "
    "cosine ANN stack (LSH buckets, IVF cells) unchanged. M^2 is "
    "computed as max of the squared norms directly (never "
    "sqrt-then-square, which can round the max row's slack negative); "
    "greatest(...,0) guards the argmax row's tail at 0. Plan: one "
    "corpus scan for norms, a 1-row max broadcast, per-ROW unit "
    "normalization (never per-pair), broadcast 5-query scan, "
    "per-query window top-k. Exact at any scale; the ANN reuse is "
    "the point at 100 TB.",
)
def sim_mips_norm_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from ..functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    n2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    base = emb.select("vec_id", "embedding", n2.alias("n2"))
    m2 = base.agg(F.max("n2").alias("m2"))
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    corpus = (
        base.crossJoin(F.broadcast(m2))
        .select(
            "vec_id",
            V.unit(
                F.concat(
                    dbl,
                    F.array(F.sqrt(F.greatest(F.col("m2") - F.col("n2"), F.lit(0.0)))),
                )
            ).alias("un"),
        )
    )
    qs = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        V.unit(F.concat(dbl, F.array(F.lit(0.0)))).alias("qu"),
    )
    scored = corpus.join(
        F.broadcast(qs), corpus["vec_id"] != qs["q_id"]
    ).select("q_id", F.col("vec_id").alias("cand_id"), V.dot(F.col("qu"), F.col("un")).alias("s"))
    w = Window.partitionBy("q_id").orderBy(F.col("s").desc(), "cand_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "cand_id")
    )


@register(
    "t_doc_pair_rouge2",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT DISTINCT doc_id, p[1] AS w1, p[2] AS w2 FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> [t[i], t[i + 1]])) AS p
    FROM tok WHERE len(t) >= 2
  )
),
refcnt AS (SELECT doc_id, count(*) AS nref FROM bg GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 2 = 0
),
inter AS (
  SELECT c.doc_id AS cand_id, count(*) AS novl
  FROM bg c JOIN bg r ON r.doc_id = c.doc_id + 1 AND r.w1 = c.w1 AND r.w2 = c.w2
  WHERE c.doc_id % 2 = 0 GROUP BY 1
)
SELECT p.cand_id, p.ref_id,
       CAST(coalesce(i.novl, 0) AS BIGINT) AS n_overlap,
       round(CAST(coalesce(i.novl, 0) AS DOUBLE) / CAST(rc.nref AS DOUBLE), 6) AS rouge2_recall
FROM pairs p JOIN refcnt rc ON rc.doc_id = p.ref_id
LEFT JOIN inter i ON i.cand_id = p.cand_id
""",
    doc="ROUGE-2 recall over (candidate, reference) document pairs "
    "(each even doc scored against its successor — the stand-in for "
    "a summary/source or draft/gold pairing): |distinct shared "
    "bigrams| / |distinct reference bigrams| — the n-gram-recall eval "
    "metric, run as a distributed op so model-output evaluation "
    "scales like any other corpus join instead of a driver loop. "
    "Plan: bigram explode + per-doc DISTINCT (one keyed shuffle), "
    "intersection as an equi-join on (pair, bigram) — never a "
    "per-pair set UDF — then a left join to keep zero-overlap pairs. "
    "All joins keyed; at 100 TB the bigram join partitions by "
    "(w1, w2) hash like the jaccard family.",
)
def t_doc_pair_rouge2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", T.tokens(T.normalize_text(F.col("text"))).alias("t")
    ).filter(F.size("t") >= 2)
    bg = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .distinct()
    )
    refcnt = bg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nref"))
    d_ids = docs.select("doc_id")
    pairs = (
        d_ids.filter(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id").alias("cand_id"))
        .join(
            d_ids.select((F.col("doc_id") - 1).alias("cand_id"), F.col("doc_id").alias("ref_id")),
            "cand_id",
        )
    )
    c = bg.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("cand_id"), "w1", "w2"
    )
    r = bg.select((F.col("doc_id") - 1).alias("cand_id"), "w1", "w2")
    inter = c.join(r, ["cand_id", "w1", "w2"]).groupBy("cand_id").agg(
        F.count(F.lit(1)).alias("novl")
    )
    return (
        pairs.join(refcnt.withColumnRenamed("doc_id", "ref_id"), "ref_id")
        .join(inter, "cand_id", "left")
        .select(
            "cand_id",
            "ref_id",
            F.coalesce(F.col("novl"), F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce(F.col("novl"), F.lit(0)).cast("double")
                / F.col("nref").cast("double"),
                6,
            ).alias("rouge2_recall"),
        )
    )


@register(
    "t_quality_logistic",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
tf AS (SELECT doc_id, tk, count(*) AS n FROM tok GROUP BY 1, 2),
feat AS (
  SELECT doc_id,
         CAST(sum(n) AS DOUBLE) AS n_tok,
         CAST(count(*) AS DOUBLE) AS n_types,
         CAST(sum(len(tk) * n) AS DOUBLE) AS sum_len
  FROM tf GROUP BY 1
),
z AS (
  SELECT doc_id,
         CAST(-6.0 AS DOUBLE)
           + CAST(0.9 AS DOUBLE) * ln(CAST(1.0 AS DOUBLE) + n_tok)
           + CAST(2.5 AS DOUBLE) * (n_types / n_tok)
           + CAST(0.4 AS DOUBLE) * (sum_len / n_tok) AS z
  FROM feat
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-z)), 6) AS quality_prob,
       (1.0 / (1.0 + exp(-z))) >= 0.5 AS keep
FROM z
""",
    doc="Model-based quality filtering: a fixed-weight logistic "
    "classifier (the fastText-quality-classifier stand-in) over three "
    "cheap per-doc features — log token count, type-token ratio, mean "
    "token length — scored with sigmoid(w.x+b) and thresholded at "
    "0.5. The point is the PLUMBING: classifier inference as pure "
    "Catalyst column math (no UDF, no model server round-trip) — at "
    "100 TB swap the weights for trained ones and the plan is "
    "unchanged. Features come from one (doc, token) count table "
    "re-aggregated per doc — type count and token count in a single "
    "pass with NO distinct-agg Expand (the SCALING.md trap). z and "
    "sigmoid are identical double shapes on both engines.",
)
def t_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
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
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feat.select(
        "doc_id",
        F.round(sig, 6).alias("quality_prob"),
        (sig >= F.lit(0.5)).alias("keep"),
    )


@register(
    "t_boilerplate_ngrams",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '') AS t
  FROM documents
),
ng AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' '))) AS g
    FROM tok WHERE len(t) >= 5
  )
)
SELECT g AS ngram, CAST(count(*) AS BIGINT) AS doc_freq
FROM ng GROUP BY 1
ORDER BY doc_freq DESC, ngram LIMIT 20
""",
    doc="Cross-document boilerplate mining: the 20 token 5-grams "
    "appearing in the most DISTINCT documents — headers, footers, "
    "license blurbs, and template chrome surface here long before "
    "any pairwise dedup fires; the mined list feeds a removal filter "
    "(the C4/RefinedWeb boilerplate step). Within-doc repeats are "
    "collapsed by the per-doc DISTINCT before counting, so a single "
    "spammy doc cannot promote its own n-gram. Plan: shingle "
    "explode, one dedup shuffle on (doc, gram), one doc-frequency "
    "agg (map-side partials), then orderBy+limit — "
    "TakeOrderedAndProject per-partition heaps, never a global sort.",
)
def t_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import spread_small_scan

    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", T.tokens(T.normalize_text(F.col("text"))).alias("t")
    ).filter(F.size("t") >= 5)
    ng = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 4),"
                    " i -> concat_ws(' ', slice(t, i, 5)))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    return (
        ng.groupBy(F.col("g").alias("ngram"))
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "ngram")
        .limit(20)
    )


@register(
    "t_perplexity_buckets",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
freq AS (SELECT tk, count(*) AS n FROM tok GROUP BY 1),
total AS (SELECT count(*) AS big_n FROM tok),
terms AS (
  SELECT t.doc_id,
         CAST(round(ln(f.n * 1.0 / s.big_n) * 1000000.0, 0) AS BIGINT) AS lp_fp
  FROM tok t JOIN freq f USING (tk) CROSS JOIN total s
),
per_doc AS (
  SELECT doc_id,
         -(CAST(sum(lp_fp) AS DOUBLE) / 1000000.0) / count(*) AS avg_nll
  FROM terms GROUP BY 1
),
b AS (
  SELECT d.source, p.doc_id,
         CAST(round(p.avg_nll * 1000000.0, 0) AS BIGINT) AS nll_fp,
         CASE ntile(3) OVER (PARTITION BY d.source ORDER BY p.avg_nll, p.doc_id)
           WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
  FROM per_doc p JOIN documents d USING (doc_id)
)
SELECT source, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round((CAST(sum(nll_fp) AS DOUBLE) / 1000000.0) / count(*), 6) AS mean_nll
FROM b GROUP BY 1, 2
""",
    doc="CCNet-style perplexity bucketing: per source, docs are ranked "
    "by their unigram-LM average negative log-likelihood and split "
    "into head/middle/tail terciles (head = most probable = cleanest) "
    "— the bucketing CCNet used to keep head+middle and drop tail, "
    "and the standard knob for biasing pretraining sampling by "
    "quality. Ranking uses the per-doc nll (exact fixed-point integer "
    "sum divided once — identical across engines), ntile is "
    "PARTITIONED per source, and the per-bucket mean re-integerizes "
    "the per-doc scores so the bucket aggregate is an exact integer "
    "sum too. Plan: the unigram-LM pipeline (explode, freq agg, "
    "1-row total broadcast, token join, doc agg) + one source join + "
    "a partitioned ntile + one 3x|sources|-group agg.",
)
def t_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk"),
    )
    freq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("n"))
    total = tok.agg(F.count(F.lit(1)).alias("big_n"))
    terms = (
        tok.join(freq, "tk")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(F.log(F.col("n") * F.lit(1.0) / F.col("big_n")) * 1e6, 0)
            .cast("long")
            .alias("lp_fp"),
        )
    )
    per_doc = terms.groupBy("doc_id").agg(
        (
            -(F.sum("lp_fp").cast("double") / F.lit(1e6)) / F.count(F.lit(1))
        ).alias("avg_nll")
    )
    w = Window.partitionBy("source").orderBy("avg_nll", "doc_id")
    t = F.ntile(3).over(w)
    b = per_doc.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        F.round(F.col("avg_nll") * 1e6, 0).cast("long").alias("nll_fp"),
        F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail").alias("bucket"),
    )
    return b.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            (F.sum("nll_fp").cast("double") / F.lit(1e6)) / F.count(F.lit(1)), 6
        ).alias("mean_nll"),
    )


@register(
    "t_filter_agreement_kappa",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         (least(len({_SQL_TOKENS.format(col='text')}) / 50.0, 1.0)
          + (1.0 - least(coalesce(
               length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))
                 * 1.0 / nullif(length(text), 0), 0.0) * 5.0, 1.0))
          + CASE WHEN coalesce(list_sum(list_transform({_SQL_TOKENS.format(col='text')},
                                  x -> length(x))) * 1.0
                      / nullif(len({_SQL_TOKENS.format(col='text')}), 0), 0.0)
                     BETWEEN 3.0 AND 8.0
                THEN 1.0 ELSE 0.5 END) / 3.0 AS quality
  FROM documents
),
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
tf AS (SELECT doc_id, tk, count(*) AS n FROM tok GROUP BY 1, 2),
feat AS (
  SELECT doc_id,
         CAST(sum(n) AS DOUBLE) AS n_tok,
         CAST(count(*) AS DOUBLE) AS n_types,
         CAST(sum(len(tk) * n) AS DOUBLE) AS sum_len
  FROM tf GROUP BY 1
),
zt AS (
  SELECT doc_id,
         CAST(-6.0 AS DOUBLE)
           + CAST(0.9 AS DOUBLE) * ln(CAST(1.0 AS DOUBLE) + n_tok)
           + CAST(2.5 AS DOUBLE) * (n_types / n_tok)
           + CAST(0.4 AS DOUBLE) * (sum_len / n_tok) AS z
  FROM feat
),
flags AS (
  SELECT h.quality >= 0.8 AS ka, coalesce(zt.z >= 0.0, false) AS kb
  FROM h LEFT JOIN zt USING (doc_id)
),
c AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS DOUBLE) AS n11,
         CAST(sum(CASE WHEN NOT ka AND NOT kb THEN 1 ELSE 0 END) AS DOUBLE) AS n00,
         CAST(sum(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS DOUBLE) AS n10,
         CAST(sum(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS DOUBLE) AS n01
  FROM flags
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(n11 AS BIGINT) AS n_both_keep,
       CAST(n00 AS BIGINT) AS n_both_drop,
       CAST(n10 AS BIGINT) AS n_only_heuristic,
       CAST(n01 AS BIGINT) AS n_only_logistic,
       round(((n11 + n00) / n
              - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n))
             / (1.0 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)),
             6) AS kappa
FROM c
""",
    doc="Cohen's kappa agreement between two quality filters — the "
    "heuristic composite score (thresholded at 0.8) vs the logistic "
    "classifier (sigmoid>=0.5, i.e. z>=0) — chance-corrected from the "
    "2x2 contingency table. THE audit before swapping or ensembling "
    "filters in a curation pipeline: high kappa means the cheap "
    "heuristic can gate for the model; low kappa means they disagree "
    "on real mass and stacking them changes the corpus. One pass "
    "computes both flags per doc (left join keeps token-less docs as "
    "classifier-drops), then a single 1-row agg — counts are exact "
    "ints, kappa derives from them in identical double shape. "
    "Trivially scale-free: the only shuffle is the per-doc feature "
    "agg the filters already pay.",
)
def t_filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", T.quality_score(F.col("text")).alias("quality")
    )
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
    z = feat.select(
        "doc_id",
        (
            F.lit(-6.0)
            + F.lit(0.9) * F.log(F.lit(1.0) + F.col("n_tok"))
            + F.lit(2.5) * (F.col("n_types") / F.col("n_tok"))
            + F.lit(0.4) * (F.col("sum_len") / F.col("n_tok"))
        ).alias("z"),
    )
    flags = h.join(z, "doc_id", "left").select(
        (F.col("quality") >= F.lit(0.8)).alias("ka"),
        F.coalesce(F.col("z") >= F.lit(0.0), F.lit(False)).alias("kb"),
    )
    c = flags.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("ka") & F.col("kb"), 1).otherwise(0))
        .cast("double")
        .alias("n11"),
        F.sum(F.when(~F.col("ka") & ~F.col("kb"), 1).otherwise(0))
        .cast("double")
        .alias("n00"),
        F.sum(F.when(F.col("ka") & ~F.col("kb"), 1).otherwise(0))
        .cast("double")
        .alias("n10"),
        F.sum(F.when(~F.col("ka") & F.col("kb"), 1).otherwise(0))
        .cast("double")
        .alias("n01"),
    )
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (F.col("n") * F.col("n"))
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    return c.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n11").cast("long").alias("n_both_keep"),
        F.col("n00").cast("long").alias("n_both_drop"),
        F.col("n10").cast("long").alias("n_only_heuristic"),
        F.col("n01").cast("long").alias("n_only_logistic"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


@register(
    "t_dedup_bytes_saved",
    oracle="""
WITH fp AS (
  SELECT doc_id, source, n_chars,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
rep AS (SELECT fp, min(doc_id) AS rep_id FROM fp GROUP BY 1)
SELECT f.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN f.doc_id <> r.rep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(sum(CASE WHEN f.doc_id <> r.rep_id THEN f.n_chars ELSE 0 END) AS BIGINT) AS chars_saved
FROM fp f JOIN rep r USING (fp)
GROUP BY 1
""",
    doc="Dedup ROI report: per source, how many documents are exact "
    "duplicates (non-min-id copies of a normalized-text fingerprint) "
    "and how many characters deleting them saves — the number that "
    "decides whether a source earns the full near-dup pipeline or "
    "just the cheap exact pass, and the before/after line on every "
    "dataset card. Same fingerprint as dedup_exact (md5 of "
    "whitespace-normalized lowercased text), so the report and the "
    "dedup operator can never disagree. Plan: one fingerprint "
    "groupBy for representatives, one join back keyed on the hash, "
    "one per-source agg — the join is the only wide stage and "
    "shares dedup_exact's shuffle key.",
)
def t_dedup_bytes_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(DD.normalize_text(F.col("text"))).alias("fp"),
    )
    rep = fp.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    dup = F.when(F.col("doc_id") != F.col("rep_id"), 1).otherwise(0)
    return (
        fp.join(rep, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dup).cast("long").alias("n_dup_docs"),
            F.sum(
                F.when(F.col("doc_id") != F.col("rep_id"), F.col("n_chars")).otherwise(0)
            )
            .cast("long")
            .alias("chars_saved"),
        )
    )


_SQL_SIGN_PACK = (
    "CAST(list_sum(list_transform(range(1, 33), "
    "i -> CASE WHEN embedding[i + {off}] >= 0 THEN (1::BIGINT << (i - 1)) "
    "ELSE 0::BIGINT END)) AS BIGINT)"
)


@register(
    "emb_sign_hamming_topk",
    oracle=f"""
WITH sig AS (
  SELECT vec_id,
         {_SQL_SIGN_PACK.format(off=0)} AS lo,
         {_SQL_SIGN_PACK.format(off=32)} AS hi
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, lo AS qlo, hi AS qhi FROM sig WHERE vec_id < 5),
scored AS (
  SELECT q_id, c.vec_id AS cand_id,
         bit_count(xor(qlo, c.lo)) + bit_count(xor(qhi, c.hi)) AS hamming
  FROM sig c, q WHERE c.vec_id <> q_id
),
ranked AS (
  SELECT q_id, cand_id, hamming,
         row_number() OVER (PARTITION BY q_id ORDER BY hamming, cand_id) AS rn
  FROM scored
)
SELECT q_id, cand_id, CAST(hamming AS INTEGER) AS hamming
FROM ranked WHERE rn <= 10
""",
    doc="1-bit binary embedding search: each 64-d vector compresses to "
    "its SIGN BITS packed into two int64 words (256x smaller than "
    "float32), candidates rank by Hamming distance — two XORs + two "
    "POPCNTs per comparison, the cheapest possible ANN scan and the "
    "standard first stage before float rerank (sign-of-random-"
    "projection theory says Hamming approximates angular distance; "
    "here the raw dims are the projections). Packing is a per-row "
    "integer fold (exact on both engines — no float accumulation at "
    "all in the scan), distances are pure int ops inside codegen. "
    "Plan: one corpus scan packs signatures, broadcast 5-query scan, "
    "per-query window top-k. At 100 TB the signature table is the "
    "only thing scanned — 16 bytes/vector.",
)
def emb_sign_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")

    def pack(off: int):
        return F.expr(
            "aggregate(sequence(1, 32), 0L, (acc, i) -> acc + "
            f"CASE WHEN element_at(embedding, i + {off}) >= 0 "
            "THEN shiftleft(1L, i - 1) ELSE 0L END)"
        )

    sig = emb.select("vec_id", pack(0).alias("lo"), pack(32).alias("hi"))
    q = sig.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    scored = sig.join(F.broadcast(q), sig["vec_id"] != q["q_id"]).select(
        "q_id",
        F.col("vec_id").alias("cand_id"),
        (
            F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
            + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
        ).alias("hamming"),
    )
    w = Window.partitionBy("q_id").orderBy("hamming", "cand_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "cand_id", F.col("hamming").cast("int").alias("hamming"))
    )


@register(
    "t_vocab_coverage_curve",
    oracle="""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
freq AS (SELECT tk, count(*) AS n FROM tok GROUP BY 1),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_vocab
  FROM freq
),
topk AS (SELECT tk, n FROM freq ORDER BY n DESC, tk LIMIT 20),
rk AS (SELECT n, row_number() OVER (ORDER BY n DESC, tk) AS rank FROM topk),
s AS (
  SELECT CAST(sum(CASE WHEN rank <= 5 THEN n ELSE 0 END) AS BIGINT) AS s5,
         CAST(sum(CASE WHEN rank <= 10 THEN n ELSE 0 END) AS BIGINT) AS s10,
         CAST(sum(n) AS BIGINT) AS s20
  FROM rk
)
SELECT total_tokens, n_vocab,
       round(CAST(s5 AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS cov_top5,
       round(CAST(s10 AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS cov_top10,
       round(CAST(s20 AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS cov_top20
FROM s, tot
""",
    doc="Vocabulary coverage curve: the fraction of all token "
    "OCCURRENCES covered by the top-N vocabulary at three cutoffs — "
    "the design curve for tokenizer vocab size and UNK-rate budgets "
    "(pick N where the curve elbows; cutoffs 5/10/20 here fit the "
    "fixture's 31-word vocab — 100/1k/10k at real scale, same plan). "
    "The top-N side is orderBy+limit (TakeOrderedAndProject, vocab "
    "side is constant-size) ranked by the distributed "
    "global_row_number — no unpartitioned window — and every "
    "coverage numerator is an exact int64 sum; only the three final "
    "ratios are floats. Plan: one freq agg over the exploded stream "
    "(map-side combine), one tiny top-k, a 1-row totals broadcast.",
)
def t_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk")
    )
    freq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(
        F.sum("n").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    topk = freq.orderBy(F.col("n").desc(), F.col("tk")).limit(20)
    rk = global_row_number(topk, [F.col("n").desc(), F.col("tk")], out_col="rank")
    s = rk.agg(
        F.sum(F.when(F.col("rank") <= 5, F.col("n")).otherwise(0))
        .cast("long")
        .alias("s5"),
        F.sum(F.when(F.col("rank") <= 10, F.col("n")).otherwise(0))
        .cast("long")
        .alias("s10"),
        F.sum("n").cast("long").alias("s20"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "total_tokens",
        "n_vocab",
        F.round(F.col("s5").cast("double") / F.col("total_tokens").cast("double"), 6).alias("cov_top5"),
        F.round(F.col("s10").cast("double") / F.col("total_tokens").cast("double"), 6).alias("cov_top10"),
        F.round(F.col("s20").cast("double") / F.col("total_tokens").cast("double"), 6).alias("cov_top20"),
    )


@register(
    "t_spearman_filters",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         (least(len({_SQL_TOKENS.format(col='text')}) / 50.0, 1.0)
          + (1.0 - least(coalesce(
               length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))
                 * 1.0 / nullif(length(text), 0), 0.0) * 5.0, 1.0))
          + CASE WHEN coalesce(list_sum(list_transform({_SQL_TOKENS.format(col='text')},
                                  x -> length(x))) * 1.0
                      / nullif(len({_SQL_TOKENS.format(col='text')}), 0), 0.0)
                     BETWEEN 3.0 AND 8.0
                THEN 1.0 ELSE 0.5 END) / 3.0 AS q1
  FROM documents
),
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
tf AS (SELECT doc_id, tk, count(*) AS n FROM tok GROUP BY 1, 2),
feat AS (
  SELECT doc_id,
         CAST(sum(n) AS DOUBLE) AS n_tok,
         CAST(count(*) AS DOUBLE) AS n_types,
         CAST(sum(len(tk) * n) AS DOUBLE) AS sum_len
  FROM tf GROUP BY 1
),
zt AS (
  SELECT doc_id,
         CAST(-6.0 AS DOUBLE)
           + CAST(0.9 AS DOUBLE) * ln(CAST(1.0 AS DOUBLE) + n_tok)
           + CAST(2.5 AS DOUBLE) * (n_types / n_tok)
           + CAST(0.4 AS DOUBLE) * (sum_len / n_tok) AS q2
  FROM feat
),
j AS (
  SELECT d.source, d.doc_id, h.q1, zt.q2
  FROM documents d JOIN h USING (doc_id) JOIN zt USING (doc_id)
),
r AS (
  SELECT source,
         row_number() OVER (PARTITION BY source ORDER BY q1, doc_id) AS r1,
         row_number() OVER (PARTITION BY source ORDER BY q2, doc_id) AS r2
  FROM j
),
g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sd2
  FROM r GROUP BY 1
)
SELECT source, n_docs,
       round(1.0 - (6.0 * CAST(sd2 AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) * (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) - 1.0)),
             6) AS spearman_rho
FROM g WHERE n_docs > 1
""",
    doc="Per-source Spearman rank correlation between the heuristic "
    "quality score and the logistic classifier score — the "
    "rank-level complement of the kappa agreement audit: kappa asks "
    "'do the filters keep the same docs', Spearman asks 'do they "
    "ORDER docs the same way', which is what matters when the "
    "downstream consumer is quality-weighted sampling rather than a "
    "hard cut. Ranks are per-source PARTITIONED row_numbers with "
    "doc_id tiebreaks (deterministic on both engines), rho = "
    "1 - 6*sum(d^2)/(n(n^2-1)) from an exact int64 rank-difference "
    "sum — float enters only in the final identity. Plan: the two "
    "score pipelines' aggs, two partitioned windows over the same "
    "exchange, one per-source agg.",
)
def t_spearman_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", T.quality_score(F.col("text")).alias("q1"))
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
    z = feat.select(
        "doc_id",
        (
            F.lit(-6.0)
            + F.lit(0.9) * F.log(F.lit(1.0) + F.col("n_tok"))
            + F.lit(2.5) * (F.col("n_types") / F.col("n_tok"))
            + F.lit(0.4) * (F.col("sum_len") / F.col("n_tok"))
        ).alias("q2"),
    )
    j = docs.select("doc_id", "source").join(h, "doc_id").join(z, "doc_id")
    w1 = Window.partitionBy("source").orderBy("q1", "doc_id")
    w2 = Window.partitionBy("source").orderBy("q2", "doc_id")
    r = j.select(
        "source",
        F.row_number().over(w1).alias("r1"),
        F.row_number().over(w2).alias("r2"),
    )
    g = r.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2")))
        .cast("long")
        .alias("sd2"),
    ).filter(F.col("n_docs") > 1)
    nd = F.col("n_docs").cast("double")
    return g.select(
        "source",
        "n_docs",
        F.round(
            F.lit(1.0) - (F.lit(6.0) * F.col("sd2").cast("double")) / (nd * (nd * nd - F.lit(1.0))),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "t_js_divergence",
    oracle="""
WITH tok AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(trim(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '')) AS tk
  FROM documents
),
st AS (SELECT source, tk, CAST(count(*) AS BIGINT) AS nst FROM tok GROUP BY 1, 2),
ns AS (SELECT source, CAST(sum(nst) AS BIGINT) AS n_s FROM st GROUP BY 1),
ct AS (SELECT tk, CAST(sum(nst) AS BIGINT) AS nt FROM st GROUP BY 1),
nn AS (SELECT CAST(sum(nt) AS BIGINT) AS n FROM ct),
terms AS (
  SELECT st.source,
         CAST(round((
           (CAST(nst AS DOUBLE) / CAST(n_s AS DOUBLE))
             * ln(2.0 * (CAST(nst AS DOUBLE) / CAST(n_s AS DOUBLE))
                  / ((CAST(nst AS DOUBLE) / CAST(n_s AS DOUBLE)) + (CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))))
           + (CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(2.0 * (CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))
                  / ((CAST(nst AS DOUBLE) / CAST(n_s AS DOUBLE)) + (CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))))
         ) * 1000000000.0, 0) AS BIGINT) AS u_fp,
         nt
  FROM st JOIN ns USING (source) JOIN ct USING (tk) CROSS JOIN nn
),
g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_shared_terms,
         CAST(sum(u_fp) AS BIGINT) AS sfp,
         CAST(sum(nt) AS BIGINT) AS snt
  FROM terms GROUP BY 1
)
SELECT g.source, n_shared_terms,
       round(0.5 * (CAST(sfp AS DOUBLE) / 1000000000.0)
             + 0.5 * 0.6931471805599453 * (1.0 - CAST(snt AS DOUBLE) / CAST(nn.n AS DOUBLE)),
             6) AS jsd
FROM g CROSS JOIN nn
""",
    doc="Jensen-Shannon divergence between each source's token "
    "distribution and the corpus mix — the bounded, symmetric drift "
    "score (0 = indistinguishable, ln2 = disjoint) used to rank "
    "sources by distinctiveness before setting mixture weights, and "
    "to alarm on a source whose crawl changed character between "
    "snapshots. The out-of-support mass needs NO join against the "
    "full vocabulary: for tokens absent from a source the summand "
    "collapses to q*ln2, so it enters in closed form via the EXACT "
    "integer coverage sum (1 - sum(nt)/N) — only in-source tokens are "
    "scanned. In-support per-token summands are fixed-point "
    "integerized (1e-9 grain) so the per-source reduction is an exact "
    "int sum; ln2 is a hardcoded double literal, never each engine's "
    "own ln(2). Plan: one (source, token) agg feeding both marginal "
    "dicts, keyed joins back, a 1-row total broadcast, one per-source "
    "agg.",
)
def t_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tk"),
    )
    st = tok.groupBy("source", "tk").agg(F.count(F.lit(1)).cast("long").alias("nst"))
    ns = st.groupBy("source").agg(F.sum("nst").cast("long").alias("n_s"))
    ct = st.groupBy("tk").agg(F.sum("nst").cast("long").alias("nt"))
    nn = ct.agg(F.sum("nt").cast("long").alias("n"))
    p = F.col("nst").cast("double") / F.col("n_s").cast("double")
    q = F.col("nt").cast("double") / F.col("n").cast("double")
    u = p * F.log(F.lit(2.0) * p / (p + q)) + q * F.log(F.lit(2.0) * q / (p + q))
    terms = (
        st.join(ns, "source")
        .join(ct, "tk")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            F.round(u * F.lit(1e9), 0).cast("long").alias("u_fp"),
            "nt",
        )
    )
    g = terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
        F.sum("u_fp").cast("long").alias("sfp"),
        F.sum("nt").cast("long").alias("snt"),
    )
    return g.crossJoin(F.broadcast(nn)).select(
        "source",
        "n_shared_terms",
        F.round(
            F.lit(0.5) * (F.col("sfp").cast("double") / F.lit(1e9))
            + F.lit(0.5)
            * F.lit(0.6931471805599453)
            * (F.lit(1.0) - F.col("snt").cast("double") / F.col("n").cast("double")),
            6,
        ).alias("jsd"),
    )


@register(
    "t_ndcg_sign_bits",
    oracle=f"""
WITH u AS (SELECT vec_id, {_SQL_UNIT.format(a='embedding')} AS un FROM embeddings),
q AS (SELECT vec_id AS q_id, un AS qu FROM u WHERE vec_id < 5),
cos_ranked AS (
  SELECT q_id, c.vec_id AS cand_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY {_SQL_DOT.format(a='qu', b='c.un')} DESC,
                                     c.vec_id) AS rn
  FROM u c, q WHERE c.vec_id <> q_id
),
rel AS (SELECT q_id, cand_id FROM cos_ranked WHERE rn <= 10),
sig AS (
  SELECT vec_id,
         {_SQL_SIGN_PACK.format(off=0)} AS lo,
         {_SQL_SIGN_PACK.format(off=32)} AS hi
  FROM embeddings
),
qs AS (SELECT vec_id AS q_id, lo AS qlo, hi AS qhi FROM sig WHERE vec_id < 5),
h_ranked AS (
  SELECT q_id, c.vec_id AS cand_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY bit_count(xor(qlo, c.lo))
                                     + bit_count(xor(qhi, c.hi)),
                                     c.vec_id) AS rn
  FROM sig c, qs WHERE c.vec_id <> q_id
),
hit AS (
  SELECT h.q_id, h.rn
  FROM h_ranked h JOIN rel r ON r.q_id = h.q_id AND r.cand_id = h.cand_id
  WHERE h.rn <= 10
),
dcg AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits,
         CAST(sum(CAST(round(1000000.0 / log2(CAST(rn AS DOUBLE) + 1.0), 0)
                       AS BIGINT)) AS BIGINT) AS dcg_micro
  FROM hit GROUP BY q_id
),
idcg AS (
  SELECT CAST(sum(CAST(round(1000000.0 / log2(CAST(i AS DOUBLE) + 1.0), 0)
                       AS BIGINT)) AS BIGINT) AS idcg_micro
  FROM (SELECT unnest(range(1, 11)) AS i)
),
qq AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id < 5)
SELECT qq.q_id,
       CAST(coalesce(n_hits, 0) AS BIGINT) AS n_relevant_in_top10,
       round(CAST(coalesce(dcg_micro, 0) AS DOUBLE) / CAST(idcg_micro AS DOUBLE), 6)
         AS ndcg_at_10
FROM qq CROSS JOIN idcg LEFT JOIN dcg ON dcg.q_id = qq.q_id
""",
    doc="NDCG@10 of the 1-bit sign-compressed index against exact "
    "cosine ground truth: exact cosine top-10 per query is the binary "
    "relevance set, candidates re-rank by packed-sign Hamming "
    "distance (emb_sign_hamming_topk's index), and the position-"
    "discounted overlap is the quality bill for 256x compression — "
    "THE eval you run before swapping a float ANN stage for a binary "
    "one. Per-position gains 1/log2(rank+1) are integerized to "
    "micro-units per row (the entropy-sum contract) so DCG/IDCG are "
    "exact int64 sums on both engines; only the final ratio is a "
    "float. Plan: two broadcast-query corpus scans (float and 16-"
    "byte signature), two per-query window top-10s, a 10-row hit "
    "join, a 1-row IDCG-constant broadcast.",
)
def t_ndcg_sign_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    rel = SIM.cosine_topk(emb.filter(F.col("vec_id") < 5), emb, k=10)

    def pack(off: int):
        return F.expr(
            "aggregate(sequence(1, 32), 0L, (acc, i) -> acc + "
            f"CASE WHEN element_at(embedding, i + {off}) >= 0 "
            "THEN shiftleft(1L, i - 1) ELSE 0L END)"
        )

    from pyspark.sql.window import Window

    sig = emb.select("vec_id", pack(0).alias("lo"), pack(32).alias("hi"))
    qs = sig.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    scored = sig.join(F.broadcast(qs), sig["vec_id"] != qs["q_id"]).select(
        "q_id",
        F.col("vec_id").alias("cand_id"),
        (
            F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
            + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
        ).alias("hamming"),
    )
    w = Window.partitionBy("q_id").orderBy("hamming", "cand_id")
    top_h = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "cand_id", "rn")
    )
    gain = F.round(
        F.lit(1000000.0) / F.log2(F.col("rn").cast("double") + F.lit(1.0)), 0
    ).cast("long")
    dcg = (
        top_h.join(rel, ["q_id", "cand_id"])
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.sum(gain).cast("long").alias("dcg_micro"),
        )
    )
    idcg = spark.range(1, 11).agg(
        F.sum(
            F.round(
                F.lit(1000000.0) / F.log2(F.col("id").cast("double") + F.lit(1.0)),
                0,
            ).cast("long")
        )
        .cast("long")
        .alias("idcg_micro")
    )
    qq = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"))
    return (
        qq.join(dcg, "q_id", "left")
        .crossJoin(F.broadcast(idcg))
        .select(
            "q_id",
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("long")
            .alias("n_relevant_in_top10"),
            F.round(
                F.coalesce(F.col("dcg_micro"), F.lit(0)).cast("double")
                / F.col("idcg_micro").cast("double"),
                6,
            ).alias("ndcg_at_10"),
        )
    )


@register(
    "emb_jl_projection",
    oracle="""
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
p AS (
  SELECT vec_id, embedding,
         list_transform(range(1, 17), j ->
           list_sum(list_transform(range(1, 65),
             i -> CAST(embedding[i] AS DOUBLE) *
                  (CASE WHEN ((i * 2654435761 + j * 40503) % 2147483647) % 2 = 0
                        THEN 1.0 ELSE -1.0 END))) / 4.0) AS proj
  FROM e
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sqrt(list_sum(list_transform(range(1, 65),
           i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
                * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)))))
           AS d_orig,
         sqrt(list_sum(list_transform(range(1, 17),
           i -> (a.proj[i] - b.proj[i]) * (a.proj[i] - b.proj[i])))) AS d_proj
  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
)
SELECT id_a, id_b,
       round(d_orig, 6) AS dist_orig,
       round(d_proj, 6) AS dist_proj,
       round(d_proj / nullif(d_orig, 0.0), 6) AS distortion
FROM pairs
""",
    doc="Johnson-Lindenstrauss random projection 64d -> 16d with a "
    "DETERMINISTIC Rademacher (+-1) sign matrix derived from a "
    "Knuth-hash formula on (i, j) — pure int64 modular arithmetic, so "
    "both engines build bit-identical projection matrices with no "
    "stored state (the matrix-free trick that makes JL free to ship "
    "to 1000 executors: the 'matrix' is four constants). Projections "
    "fold per row in index order (identical float shape), and the "
    "audit reports per-pair distance distortion d_proj/d_orig on "
    "consecutive-id probe pairs — the empirical check on the JL "
    "guarantee before trusting the compressed space for dedup or "
    "ANN. Plan: one bounded scan, per-row HOF fold (no UDF), one "
    "tiny equi-join; at 100 TB the projection is a map-only pass.",
)
def emb_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.filter(F.col("vec_id") < 20).select("vec_id", "embedding")
    proj = F.expr(
        "transform(sequence(1, 16), j -> "
        "aggregate(sequence(1, 64), cast(0.0 as double), (acc, i) -> acc + "
        "cast(element_at(embedding, i) as double) * "
        "(CASE WHEN pmod(pmod(i * CAST(2654435761 AS BIGINT) "
        "+ j * CAST(40503 AS BIGINT), CAST(2147483647 AS BIGINT)), 2) = 0 "
        "THEN cast(1.0 as double) ELSE cast(-1.0 as double) END)) "
        "/ cast(4.0 as double))"
    )
    p = e.select("vec_id", "embedding", proj.alias("proj"))
    a = p.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        F.col("proj").alias("pa"),
    )
    b = p.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        F.col("proj").alias("pb"),
    )
    d_orig = F.sqrt(
        F.expr(
            "aggregate(sequence(1, 64), cast(0.0 as double), (acc, i) -> acc + "
            "(cast(element_at(ea, i) as double) - cast(element_at(eb, i) as double)) "
            "* (cast(element_at(ea, i) as double) - cast(element_at(eb, i) as double)))"
        )
    )
    d_proj = F.sqrt(
        F.expr(
            "aggregate(sequence(1, 16), cast(0.0 as double), (acc, i) -> acc + "
            "(element_at(pa, i) - element_at(pb, i)) "
            "* (element_at(pa, i) - element_at(pb, i)))"
        )
    )
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            d_orig.alias("d_orig"),
            d_proj.alias("d_proj"),
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("d_orig"), 6).alias("dist_orig"),
            F.round(F.col("d_proj"), 6).alias("dist_proj"),
            F.round(
                F.col("d_proj") / F.nullif(F.col("d_orig"), F.lit(0.0)), 6
            ).alias("distortion"),
        )
    )


@register(
    "t_tokenizer_fertility",
    oracle=f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({_SQL_TOKENS.format(col='text')})) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))
            AS BIGINT) AS bpe_tokens,
       CAST(sum(n_chars) AS BIGINT) AS chars,
       round(CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))
                  AS DOUBLE)
             / CAST(nullif(sum(len({_SQL_TOKENS.format(col='text')})), 0) AS DOUBLE), 6)
         AS fertility,
       round(CAST(sum(n_chars) AS DOUBLE)
             / CAST(nullif(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))), 0)
                    AS DOUBLE), 6) AS chars_per_token
FROM documents GROUP BY lang
""",
    doc="Tokenizer fertility audit per language: BPE-ish subword "
    "tokens per whitespace word (fertility) and characters per "
    "subword token — the per-language cost sheet that decides vocab "
    "allocation and flags languages a tokenizer over-fragments "
    "(fertility spikes are the standard symptom of an under-"
    "represented script). Token counts are exact int64 sums sharing "
    "the corpus-wide tokenization fragments (lockstep with "
    "functions/text.py); the two ratios are the only floats. Plan: "
    "one scan, per-lang map-side combine — a 100 TB single pass.",
)
def t_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.sum(T.token_count(F.col("text"))).cast("long")
    bpe = F.sum(T.bpe_ish_token_count(F.col("text"))).cast("long")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.sum("n_chars").cast("long").alias("chars"),
        F.round(
            bpe.cast("double") / F.nullif(ws, F.lit(0)).cast("double"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("long").cast("double")
            / F.nullif(bpe, F.lit(0)).cast("double"),
            6,
        ).alias("chars_per_token"),
    )


@register(
    "t_hard_negative_mining",
    oracle=f"""
WITH u AS (
  SELECT vec_id, label, {_SQL_UNIT.format(a='embedding')} AS un FROM embeddings
),
q AS (SELECT vec_id AS q_id, label AS q_label, un AS qu FROM u WHERE vec_id < 5),
scored AS (
  SELECT q_id, c.vec_id AS cand_id,
         CASE WHEN c.label = q_label THEN 1 ELSE 0 END AS is_pos,
         {_SQL_DOT.format(a='qu', b='c.un')} AS cos
  FROM u c, q WHERE c.vec_id <> q_id
),
ranked AS (
  SELECT q_id, cand_id, is_pos, cos,
         row_number() OVER (PARTITION BY q_id, is_pos
                            ORDER BY cos DESC, cand_id) AS rn
  FROM scored
)
SELECT q_id,
       CAST(max(CASE WHEN is_pos = 1 THEN cand_id END) AS BIGINT) AS pos_id,
       CAST(max(CASE WHEN is_pos = 0 THEN cand_id END) AS BIGINT) AS neg_id,
       round(max(CASE WHEN is_pos = 1 THEN cos END), 6) AS cos_pos,
       round(max(CASE WHEN is_pos = 0 THEN cos END), 6) AS cos_neg,
       round(max(CASE WHEN is_pos = 1 THEN cos END)
             - max(CASE WHEN is_pos = 0 THEN cos END), 6) AS margin
FROM ranked WHERE rn = 1
GROUP BY q_id
""",
    doc="Contrastive-pair mining for metric-learning training data: per "
    "query vector, the hardest positive (most-similar same-label "
    "candidate) and hardest negative (most-similar OTHER-label "
    "candidate — the one that teaches the model something) plus the "
    "margin between them; negative margins flag label noise. One "
    "broadcast-query corpus scan scores both roles at once (a "
    "same/diff-label flag, not two scans), per-(query, role) window "
    "top-1, conditional-agg pivot to one row per query. Cosines use "
    "the shared unit/dot fragments (identical per-row float shape); "
    "the margin is a 2-term difference of round-stable doubles. At "
    "100 TB: the scan is the cost; swap the exact scan for the IVF "
    "probe (sim_ivf_trained_topk) per role, same downstream shape.",
)
def t_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.vectors import dot, unit

    emb = load_table(spark, sf_dir, "embeddings")
    u = emb.select("vec_id", "label", unit(F.col("embedding")).alias("un"))
    q = u.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("un").alias("qu"),
    )
    scored = u.join(F.broadcast(q), u["vec_id"] != q["q_id"]).select(
        "q_id",
        F.col("vec_id").alias("cand_id"),
        F.when(F.col("label") == F.col("q_label"), 1).otherwise(0).alias("is_pos"),
        dot(F.col("qu"), F.col("un")).alias("cos"),
    )
    w = Window.partitionBy("q_id", "is_pos").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    pos = F.max(F.when(F.col("is_pos") == 1, F.col("cos")))
    neg = F.max(F.when(F.col("is_pos") == 0, F.col("cos")))
    return ranked.groupBy("q_id").agg(
        F.max(F.when(F.col("is_pos") == 1, F.col("cand_id")))
        .cast("long")
        .alias("pos_id"),
        F.max(F.when(F.col("is_pos") == 0, F.col("cand_id")))
        .cast("long")
        .alias("neg_id"),
        F.round(pos, 6).alias("cos_pos"),
        F.round(neg, 6).alias("cos_neg"),
        F.round(pos - neg, 6).alias("margin"),
    )


@register(
    "emb_label_balance",
    oracle="""
WITH n AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000.0, 0)
              AS BIGINT)) AS BIGINT) AS norm_micro
  FROM embeddings GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS k FROM n
)
SELECT label, n,
       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       round(CAST(total AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)), 6)
         AS inv_freq_weight,
       round(CAST(norm_micro AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
         AS mean_norm
FROM n, tot
""",
    doc="Class-balance audit over the embedding labels: per-label "
    "count, share, the inverse-frequency loss weight total/(k*n) a "
    "balanced sampler or weighted loss would use, and the mean "
    "embedding L2 norm per class (systematic norm differences "
    "between classes are the classic symptom of encoder bias / "
    "collapsed classes). Per-row norms integerize to micro-units "
    "before the per-class sum, so the means are exact int64 "
    "reductions divided once — summation order cannot move them. "
    "Plan: one scan, k-group agg, 1-row totals broadcast; a 100 TB "
    "single pass.",
)
def emb_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norm_micro = F.round(
        F.sqrt(
            F.expr(
                "aggregate(embedding, cast(0.0 as double), "
                "(acc, x) -> acc + cast(x as double) * cast(x as double))"
            )
        )
        * 1000000.0,
        0,
    ).cast("long")
    n = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(norm_micro).cast("long").alias("norm_micro"),
    )
    tot = n.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return n.crossJoin(F.broadcast(tot)).select(
        "label",
        "n",
        F.round(F.col("n").cast("double") / F.col("total").cast("double"), 6).alias(
            "share"
        ),
        F.round(
            F.col("total").cast("double")
            / (F.col("k").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("inv_freq_weight"),
        F.round(
            F.col("norm_micro").cast("double") / F.col("n").cast("double") / 1000000.0,
            6,
        ).alias("mean_norm"),
    )


@register(
    "q_wilson_quality_ci",
    oracle=f"""
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN len({_SQL_TOKENS.format(col='text')}) >= 20
                       THEN 1 ELSE 0 END) AS BIGINT) AS passes
  FROM documents GROUP BY 1
)
SELECT source, n, passes,
       round(CAST(passes AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pass_rate,
       round((CAST(passes AS DOUBLE) / CAST(n AS DOUBLE)
              + 1.9599639845400545 * 1.9599639845400545 / (2.0 * CAST(n AS DOUBLE))
              - 1.9599639845400545
                * sqrt((CAST(passes AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(passes AS DOUBLE) / CAST(n AS DOUBLE))
                         / CAST(n AS DOUBLE)
                       + 1.9599639845400545 * 1.9599639845400545
                         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + 1.9599639845400545 * 1.9599639845400545 / CAST(n AS DOUBLE)), 6)
         AS wilson_lo,
       round((CAST(passes AS DOUBLE) / CAST(n AS DOUBLE)
              + 1.9599639845400545 * 1.9599639845400545 / (2.0 * CAST(n AS DOUBLE))
              + 1.9599639845400545
                * sqrt((CAST(passes AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(passes AS DOUBLE) / CAST(n AS DOUBLE))
                         / CAST(n AS DOUBLE)
                       + 1.9599639845400545 * 1.9599639845400545
                         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + 1.9599639845400545 * 1.9599639845400545 / CAST(n AS DOUBLE)), 6)
         AS wilson_hi
FROM s
""",
    doc="Wilson 95% score interval on the per-source quality pass "
    "rate (docs with >= 20 whitespace tokens): the CI that stays "
    "inside [0,1] and behaves at small n / extreme p where the "
    "normal interval lies — the right uncertainty bar for 'is "
    "source X really dirtier than Y' calls on sampled audits. The "
    "z constant is spelled to full double precision IN THE "
    "EXPRESSION on both engines (no engine-specific normal-quantile "
    "function), counts are exact int64, and lo/hi share one "
    "algebraic shape so both engines produce bit-identical doubles "
    "before the round(6) pin. Plan: one scan, per-source agg — a "
    "100 TB single pass.",
)
def q_wilson_quality_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    Z = 1.9599639845400545
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(T.token_count(F.col("text")) >= 20, 1).otherwise(0))
        .cast("long")
        .alias("passes"),
    )
    n = F.col("n").cast("double")
    p = F.col("passes").cast("double") / n
    z = F.lit(Z)
    half = z * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
    denom = F.lit(1.0) + z * z / n
    center = p + z * z / (F.lit(2.0) * n)
    return s.select(
        "source",
        "n",
        "passes",
        F.round(p, 6).alias("pass_rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@register(
    "t_doc_keywords",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKENS.format(col='lower(text)')}) AS tk
  FROM documents
),
tf AS (SELECT doc_id, tk, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT tk, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.tk,
         CAST(t.tf AS BIGINT) * CAST(round(
           ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(d.df AS DOUBLE) + 1.0))
           * 1000000.0, 0) AS BIGINT) AS tfidf_micro
  FROM tf t JOIN df d USING (tk), nd
  WHERE t.doc_id < 10
),
ranked AS (
  SELECT doc_id, tk, tfidf_micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_micro DESC, tk) AS rn
  FROM scored
)
SELECT doc_id, tk AS keyword, tfidf_micro, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 3
""",
    doc="Per-document keyword extraction: top-3 terms by TF-IDF for "
    "the probe docs — the snippet/tag generator over a corpus "
    "(global DF statistics, per-doc ranking). The IDF integerizes "
    "to micro-units per TERM (one ln per dictionary entry, an exact "
    "int64 thereafter), so the per-doc score tf * idf_micro and its "
    "ordering are pure integer math on both engines — no float "
    "tie-break ambiguity in the ranking. Plan: explode -> (doc, "
    "term) agg -> term-keyed DF agg -> probe-doc filter BEFORE the "
    "join back (at 100 TB the DF dictionary is the only corpus-"
    "wide product; the scored frame is |probe docs| x terms).",
)
def t_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("tk")
    )
    tf = tok.groupBy("doc_id", "tk").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df = tf.groupBy("tk").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    idf_micro = F.round(
        F.log(
            (F.col("n_docs").cast("double") + F.lit(1.0))
            / (F.col("df").cast("double") + F.lit(1.0))
        )
        * 1000000.0,
        0,
    ).cast("long")
    scored = (
        tf.filter(F.col("doc_id") < 10)
        .join(df, "tk")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "tk", (F.col("tf") * idf_micro).alias("tfidf_micro")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_micro").desc(), F.col("tk"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            F.col("tk").alias("keyword"),
            "tfidf_micro",
            F.col("rn").cast("long").alias("rank"),
        )
    )


@register(
    "t_psi_drift",
    oracle="""
WITH b AS (
  SELECT least(n_chars // 200, 9) AS bucket, doc_id % 2 AS cohort
  FROM documents
),
g AS (
  SELECT bucket,
         CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM b GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS tot_a, CAST(sum(n_b) AS BIGINT) AS tot_b,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM g
),
p AS (
  SELECT bucket, n_a, n_b,
         (CAST(n_a AS DOUBLE) + 1.0) / (CAST(tot_a AS DOUBLE) + CAST(n_buckets AS DOUBLE)) AS pa,
         (CAST(n_b AS DOUBLE) + 1.0) / (CAST(tot_b AS DOUBLE) + CAST(n_buckets AS DOUBLE)) AS pb
  FROM g, tot
),
t AS (
  SELECT bucket, n_a, n_b, pa, pb,
         CAST(round((pa - pb) * ln(pa / pb) * 1000000.0, 0) AS BIGINT) AS psi_term_micro
  FROM p
),
s AS (SELECT CAST(sum(psi_term_micro) AS BIGINT) AS psi_total_micro FROM t)
SELECT bucket, n_a, n_b,
       round(pa, 6) AS p_a, round(pb, 6) AS p_b,
       psi_term_micro,
       round(CAST(psi_total_micro AS DOUBLE) / 1000000.0, 6) AS psi_total
FROM t, s
""",
    doc="Population Stability Index between two corpus cohorts (doc_id "
    "parity stands in for old-vs-new snapshot) over document-length "
    "buckets: PSI = sum (p_a - p_b) * ln(p_a / p_b), the standard "
    "'did my input distribution drift' gate before retraining or "
    "re-filtering (0.1 = watch, 0.25 = act). Laplace-smoothed shares "
    "(+1 per observed bucket) keep the log finite on empty cells; "
    "each bucket's PSI term integerizes to micro-units so the total "
    "is an exact int64 sum — the per-bucket terms AND the corpus "
    "total ship in one frame. Plan: one scan, bounded-bucket agg, "
    "two 1-row broadcasts; a 100 TB single pass.",
)
def t_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        F.least(F.expr("n_chars div 200"), F.lit(9)).alias("bucket"),
        (F.col("doc_id") % 2).alias("cohort"),
    )
    g = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    tot = g.agg(
        F.sum("n_a").cast("long").alias("tot_a"),
        F.sum("n_b").cast("long").alias("tot_b"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    p = g.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_a",
        "n_b",
        (
            (F.col("n_a").cast("double") + F.lit(1.0))
            / (F.col("tot_a").cast("double") + F.col("n_buckets").cast("double"))
        ).alias("pa"),
        (
            (F.col("n_b").cast("double") + F.lit(1.0))
            / (F.col("tot_b").cast("double") + F.col("n_buckets").cast("double"))
        ).alias("pb"),
    )
    t = p.select(
        "bucket",
        "n_a",
        "n_b",
        "pa",
        "pb",
        F.round(
            (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")) * 1000000.0,
            0,
        )
        .cast("long")
        .alias("psi_term_micro"),
    )
    s = t.agg(F.sum("psi_term_micro").cast("long").alias("psi_total_micro"))
    return t.crossJoin(F.broadcast(s)).select(
        "bucket",
        "n_a",
        "n_b",
        F.round(F.col("pa"), 6).alias("p_a"),
        F.round(F.col("pb"), 6).alias("p_b"),
        "psi_term_micro",
        F.round(F.col("psi_total_micro").cast("double") / 1000000.0, 6).alias(
            "psi_total"
        ),
    )


@register(
    "t_classifier_prf1",
    oracle=f"""
WITH pred AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CASE WHEN len(regexp_extract_all(lower(text), '{_SQL_STOPWORD_PAT}'))
                   >= 0.05 * len({_SQL_TOKENS.format(col='text')})
              AND len({_SQL_TOKENS.format(col='text')}) > 0
              THEN 1 ELSE 0 END AS yhat
  FROM documents
),
c AS (
  SELECT CAST(sum(y * yhat) AS BIGINT) AS tp,
         CAST(sum((1 - y) * yhat) AS BIGINT) AS fp,
         CAST(sum(y * (1 - yhat)) AS BIGINT) AS fn,
         CAST(sum((1 - y) * (1 - yhat)) AS BIGINT) AS tn
  FROM pred
)
SELECT tp, fp, fn, tn,
       round(CAST(tp AS DOUBLE) / CAST(nullif(tp + fp, 0) AS DOUBLE), 6) AS precision,
       round(CAST(tp AS DOUBLE) / CAST(nullif(tp + fn, 0) AS DOUBLE), 6) AS recall,
       round(2.0 * CAST(tp AS DOUBLE) / CAST(nullif(2 * tp + fp + fn, 0) AS DOUBLE), 6)
         AS f1,
       round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 6)
         AS accuracy
FROM c
""",
    doc="Precision / recall / F1 / accuracy of the stopword-density "
    "language classifier against the labeled lang column — the "
    "eval readout that turns t_lang_id's confusion counts into the "
    "numbers a filter-tuning loop thresholds on (the same harness "
    "evaluates ANY boolean doc filter: swap the yhat CASE). "
    "Confusion cells are exact int64 indicator sums computed in ONE "
    "pass (products of 0/1 indicators — no joins, no distinct); F1 "
    "uses the join-free 2tp/(2tp+fp+fn) identity; every denominator "
    "is nullif-guarded identically on both engines. Plan: one scan, "
    "1-row reduce; a 100 TB single pass.",
)
def t_classifier_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.when(T.lang_id(F.col("text")) == "en", 1).otherwise(0).alias("yhat"),
    )
    c = pred.agg(
        F.sum(F.col("y") * F.col("yhat")).cast("long").alias("tp"),
        F.sum((F.lit(1) - F.col("y")) * F.col("yhat")).cast("long").alias("fp"),
        F.sum(F.col("y") * (F.lit(1) - F.col("yhat"))).cast("long").alias("fn"),
        F.sum((F.lit(1) - F.col("y")) * (F.lit(1) - F.col("yhat")))
        .cast("long")
        .alias("tn"),
    )
    tp, fp, fn, tn = [F.col(c0).cast("double") for c0 in ["tp", "fp", "fn", "tn"]]
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            tp / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)).cast("double"), 6
        ).alias("precision"),
        F.round(
            tp / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)).cast("double"), 6
        ).alias("recall"),
        F.round(
            F.lit(2.0)
            * tp
            / F.nullif(
                F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)
            ).cast("double"),
            6,
        ).alias("f1"),
        F.round((tp + tn) / (tp + fp + fn + tn), 6).alias("accuracy"),
    )


@register(
    "t_corpus_stopwords",
    oracle=f"""
WITH dt AS (
  SELECT DISTINCT doc_id, source,
         unnest({_SQL_TOKENS.format(col='lower(text)')}) AS tk
  FROM documents
),
dfreq AS (SELECT tk, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
top AS (SELECT tk, df FROM dfreq ORDER BY df DESC, tk LIMIT 20),
srctot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM documents GROUP BY 1),
bysrc AS (
  SELECT d.tk, d.source, CAST(count(*) AS BIGINT) AS df_src
  FROM dt d JOIN top t USING (tk)
  GROUP BY 1, 2
),
mx AS (
  SELECT b.tk,
         max(round(CAST(b.df_src AS DOUBLE) / CAST(s.n_src AS DOUBLE), 6)) AS max_source_share
  FROM bysrc b JOIN srctot s USING (source)
  GROUP BY 1
)
SELECT t.tk AS term, t.df,
       round(CAST(t.df AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS doc_share,
       m.max_source_share
FROM top t JOIN mx m USING (tk), nd
""",
    doc="Corpus-specific stopword discovery: the 20 terms with the "
    "highest document frequency, with their overall doc share and "
    "the max per-source doc share — terms near 1.0 everywhere are "
    "functional glue (stopword candidates for BM25/TF-IDF lists), "
    "terms high overall but skewed to one source are boilerplate "
    "leaking from that source (a dedup target instead). The top-k "
    "is orderBy+limit (TakeOrderedAndProject with the (df, term) "
    "tiebreak — never a global rank), and the per-source breakdown "
    "joins ONLY the 20 winners back against the doc-term set. "
    "Counts exact int64; shares round(6)-pinned doubles (max of "
    "rounded shares — commutative, order-safe). Plan: distinct "
    "doc-term agg, tiny top-k, semi-join-shaped source breakdown, "
    "1-row corpus-size broadcast.",
)
def t_corpus_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", "source", F.explode(T.tokens(F.lower(F.col("text")))).alias("tk")
    ).distinct()
    dfreq = dt.groupBy("tk").agg(F.count(F.lit(1)).cast("long").alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), F.col("tk")).limit(20)
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    srctot = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_src"))
    bysrc = (
        dt.join(top.select("tk"), "tk")
        .groupBy("tk", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("df_src"))
    )
    mx = (
        bysrc.join(F.broadcast(srctot), "source")
        .groupBy("tk")
        .agg(
            F.max(
                F.round(
                    F.col("df_src").cast("double") / F.col("n_src").cast("double"), 6
                )
            ).alias("max_source_share")
        )
    )
    return (
        top.join(mx, "tk")
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("tk").alias("term"),
            "df",
            F.round(
                F.col("df").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("doc_share"),
            "max_source_share",
        )
    )


@register(
    "emb_pq_reconstruction_mse",
    oracle=_pq_oracle_sql(4, 8, 2, 64)
    + """,
rec AS (
  SELECT a.vec_id, a.m,
         CAST(round(list_sum(list_transform(range(1, 17),
           i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) * 1000000.0, 0)
              AS BIGINT) AS err_micro
  FROM a1 a
  JOIN sub s USING (vec_id, m)
  JOIN cb1 c ON c.m = a.m AND c.code = a.code
)
SELECT m, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(err_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6)
         AS mse,
       round(sqrt(CAST(sum(err_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  / 1000000.0), 6) AS rmse
FROM rec GROUP BY m
""",
    doc="Product-quantization reconstruction error audit: per subspace, "
    "the mean squared distance between each subvector and its "
    "assigned codeword — the distortion bill for the 64x compression "
    "and the number that says which subspace needs more codewords "
    "before you trust ADC rankings (PQ's ADC error is exactly this "
    "quantization noise). Reuses the trained codebook/codes from "
    "emb_pq_codes' deterministic Lloyd's contract; per-row errors "
    "integerize to micro-units so per-subspace sums are exact int64 "
    "reductions (order-independent), divided once into MSE/RMSE. "
    "Plan: codes re-join their codewords via a broadcast m*ksub "
    "codebook — one map-side pass over the encoded corpus plus a "
    "4-group agg; at 100 TB the raw-vector scan happens once, here.",
)
def emb_pq_reconstruction_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    codes, cb = SIM.pq_train_encode(emb, m=4, ksub=8, iters=2, dim=64)
    w = 16
    subs = F.array(
        *[
            F.struct(
                F.lit(mm).alias("m"),
                F.transform(
                    F.slice(F.col("embedding"), mm * w + 1, w),
                    lambda x: x.cast("double"),
                ).alias("sv"),
            )
            for mm in range(4)
        ]
    )
    sub = emb.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv")
    )
    ac = codes.select(
        "vec_id", F.posexplode("codes").alias("m", "code")
    ).select("vec_id", F.col("m").cast("long").alias("m"), "code")
    err = F.round(
        F.aggregate(
            F.zip_with(F.col("sv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * 1000000.0,
        0,
    ).cast("long")
    rec = (
        ac.join(sub, ["vec_id", "m"])
        .join(F.broadcast(cb), ["m", "code"])
        .select("m", err.alias("err_micro"))
    )
    return rec.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(
            F.sum("err_micro").cast("double") / F.count(F.lit(1)).cast("double")
            / 1000000.0,
            6,
        ).alias("mse"),
        F.round(
            F.sqrt(
                F.sum("err_micro").cast("double") / F.count(F.lit(1)).cast("double")
                / 1000000.0
            ),
            6,
        ).alias("rmse"),
    )


def _ivf_recall_oracle_sql() -> str:
    """Derive the recall-audit oracle FROM sim_ivf_trained_topk's
    registered oracle (single source of truth — the trained-IVF CTE
    chain can never diverge between the ANN query and its audit):
    wrap its final top-5 select into an ``ivf`` CTE, rank the exact
    cosine top-5 over the same ``u``/``q`` CTEs, and join."""
    from . import REGISTRY

    base = REGISTRY["sim_ivf_trained_topk"].oracle
    marker = "\nSELECT q_id, cand_id FROM ("
    head, sep, tail = base.rpartition(marker)
    assert sep, "sim_ivf_trained_topk oracle shape changed"
    return (
        head
        + ",\nivf AS (\n  SELECT q_id, cand_id FROM ("
        + tail
        + "\n),\nexact AS (\n  SELECT q_id, cand_id FROM (\n"
        + "    SELECT q.q_id, c.vec_id AS cand_id,\n"
        + "           row_number() OVER (PARTITION BY q.q_id ORDER BY\n"
        + "             "
        + _SQL_DOT.format(a="q.qu", b="c.un")
        + " DESC, c.vec_id) AS rn\n"
        + "    FROM u c, q WHERE c.vec_id <> q.q_id\n"
        + "  ) WHERE rn <= 5\n)"
        + """,
hits AS (
  SELECT e.q_id, CAST(count(i.cand_id) AS BIGINT) AS n_hits
  FROM exact e LEFT JOIN ivf i ON i.q_id = e.q_id AND i.cand_id = e.cand_id
  GROUP BY 1
)
SELECT q_id, n_hits, round(CAST(n_hits AS DOUBLE) / 5.0, 6) AS recall_at_5
FROM hits"""
    )


@register(
    "emb_ivf_recall_audit",
    oracle=_ivf_recall_oracle_sql(),
    doc="Recall@5 of the trained-IVF index against exact brute-force "
    "cosine, per query — the acceptance test every ANN deployment "
    "runs before trading exactness for the k-fold scan reduction "
    "(recall here is what nprobe tuning buys; the t_lsh_recall_audit "
    "sibling audits the MinHash family the same way). The oracle "
    "derives from sim_ivf_trained_topk's registered SQL at import "
    "time — one source of truth for the train/probe chain — and the "
    "Spark side composes the same two operators (ivf_topk_trained, "
    "cosine_topk) it audits. Counts exact int64; recall is the only "
    "float. Plan: both rankings are broadcast-query corpus scans; "
    "the audit join touches 2x5 rows per query.",
)
def emb_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qf = emb.filter(F.col("vec_id") < 8)
    ivf = SIM.ivf_topk_trained(emb, qf.select("vec_id"), k=8, iters=2, topk=5).select(
        "q_id", "cand_id", F.lit(1).alias("hit")
    )
    exact = SIM.cosine_topk(qf, emb, k=5)
    hits = (
        exact.join(ivf, ["q_id", "cand_id"], "left")
        .groupBy("q_id")
        .agg(F.count("hit").cast("long").alias("n_hits"))
    )
    return hits.select(
        "q_id",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / F.lit(5.0), 6).alias("recall_at_5"),
    )


@register(
    "t_heaps_law_fit",
    oracle=f"""
WITH dtok AS (
  SELECT doc_id, CAST(len({_SQL_TOKENS.format(col='lower(text)')}) AS BIGINT) AS n_tok
  FROM documents
),
firstd AS (
  SELECT tk, CAST(min(doc_id) AS BIGINT) AS first_doc
  FROM (
    SELECT doc_id, unnest({_SQL_TOKENS.format(col='lower(text)')}) AS tk
    FROM documents
  ) GROUP BY 1
),
mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS md FROM documents),
cuts AS (SELECT (md * k) // 5 AS cutoff FROM mx, (SELECT unnest(range(1, 6)) AS k)),
pts AS (
  SELECT c.cutoff,
         (SELECT CAST(sum(n_tok) AS BIGINT) FROM dtok WHERE doc_id < c.cutoff) AS toks,
         (SELECT CAST(count(*) AS BIGINT) FROM firstd WHERE first_doc < c.cutoff) AS vocab
  FROM cuts c
),
lp AS (
  SELECT cutoff, toks, vocab,
         CAST(round(ln(CAST(toks AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS x,
         CAST(round(ln(CAST(vocab AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS y
  FROM pts WHERE toks > 0 AND vocab > 0
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM lp
),
beta AS (
  SELECT round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 6)
           AS heaps_beta
  FROM mom
)
SELECT cutoff, toks AS tokens_seen, vocab AS vocab_seen, heaps_beta
FROM lp, beta
""",
    doc="Heaps'-law vocabulary growth fit: at five doc-id prefix "
    "checkpoints, tokens seen vs distinct vocabulary seen, plus the "
    "log-log OLS exponent beta (V ~ K*n^beta, typically 0.4-0.6 for "
    "natural text) — the projection that budgets tokenizer vocab and "
    "hash-table sizing BEFORE scaling a corpus 100x (and a drift "
    "alarm: synthetic/boilerplate floods push beta down). Cumulative "
    "vocab needs no running distinct: each term reduces to its FIRST "
    "doc id (keyed min), then a checkpoint 'contains' the term iff "
    "first_doc < cutoff — turning prefix-distinct into 5 conditional "
    "counts. Log points integerize to micro-units; the 5-point OLS "
    "runs on exact int64 moments (q_group_regression contract). "
    "Plan: one explode agg (map-side combined), one per-doc token "
    "count, a broadcast 5-row checkpoint grid, a 1-row slope "
    "broadcast.",
)
def t_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dtok = docs.select(
        "doc_id", T.token_count(F.lower(F.col("text"))).cast("long").alias("n_tok")
    )
    firstd = (
        docs.select("doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("tk"))
        .groupBy("tk")
        .agg(F.min("doc_id").cast("long").alias("first_doc"))
    )
    mx = docs.agg((F.max("doc_id") + 1).cast("long").alias("md"))
    cuts = (
        spark.range(1, 6)
        .crossJoin(F.broadcast(mx))
        .select(F.expr("(md * id) div 5").alias("cutoff"))
    )
    toks = (
        dtok.crossJoin(F.broadcast(cuts))
        .filter(F.col("doc_id") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.sum("n_tok").cast("long").alias("toks"))
    )
    vocab = (
        firstd.crossJoin(F.broadcast(cuts))
        .filter(F.col("first_doc") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    lp = (
        toks.join(vocab, "cutoff")
        .filter((F.col("toks") > 0) & (F.col("vocab") > 0))
        .select(
            "cutoff",
            "toks",
            "vocab",
            F.round(F.log(F.col("toks").cast("double")) * 1000000.0, 0)
            .cast("long")
            .alias("x"),
            F.round(F.log(F.col("vocab").cast("double")) * 1000000.0, 0)
            .cast("long")
            .alias("y"),
        )
    )
    mom = lp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    beta = mom.select(
        F.round(
            (nd * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / F.nullif(
                nd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("heaps_beta")
    )
    return lp.crossJoin(F.broadcast(beta)).select(
        "cutoff",
        F.col("toks").alias("tokens_seen"),
        F.col("vocab").alias("vocab_seen"),
        "heaps_beta",
    )


@register(
    "t_filter_threshold_sweep",
    oracle=f"""
WITH d AS (
  SELECT CAST(len({_SQL_TOKENS.format(col='text')}) AS BIGINT) AS n_tok,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
  FROM documents
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_toks
  FROM d
),
thr AS (SELECT unnest([10, 20, 40, 80, 160]) AS threshold),
sw AS (
  SELECT t.threshold,
         CAST(sum(CASE WHEN d.n_tok >= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
         CAST(sum(CASE WHEN d.n_tok >= t.threshold THEN d.n_tok ELSE 0 END) AS BIGINT)
           AS tokens_kept,
         CAST(sum(CASE WHEN d.n_tok >= t.threshold THEN d.is_en ELSE 0 END) AS BIGINT)
           AS en_kept
  FROM d CROSS JOIN thr t
  GROUP BY 1
)
SELECT CAST(threshold AS BIGINT) AS threshold, n_kept,
       round(CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS doc_share,
       tokens_kept,
       round(CAST(tokens_kept AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS token_share,
       round(CAST(en_kept AS DOUBLE) / CAST(nullif(n_kept, 0) AS DOUBLE), 6)
         AS en_share_kept
FROM sw, tot
""",
    doc="Filter-threshold sweep: for five min-token-length gates, the "
    "docs kept, the token mass retained, and the language mix of "
    "the survivors — the threshold-tuning table you read BEFORE "
    "committing a length filter to a 100 TB run (token share falls "
    "much slower than doc share when the corpus is short-doc-heavy; "
    "the en-share column shows the selection bias the gate "
    "introduces). One scan computes all five gates: the per-doc "
    "frame cross-joins a broadcast 5-row threshold grid and every "
    "measure is a conditional exact int64 sum; shares divide by a "
    "1-row totals broadcast. Plan: scan -> 5x fanout -> 5-group "
    "agg; a single pass at any scale.",
)
def t_filter_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        T.token_count(F.col("text")).cast("long").alias("n_tok"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_toks"),
    )
    thr = spark.createDataFrame(
        [(10,), (20,), (40,), (80,), (160,)], "threshold int"
    )
    keep = F.col("n_tok") >= F.col("threshold")
    sw = (
        d.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(keep, F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
            F.sum(F.when(keep, F.col("is_en")).otherwise(0))
            .cast("long")
            .alias("en_kept"),
        )
    )
    return sw.crossJoin(F.broadcast(tot)).select(
        F.col("threshold").cast("long").alias("threshold"),
        "n_kept",
        F.round(
            F.col("n_kept").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("doc_share"),
        "tokens_kept",
        F.round(
            F.col("tokens_kept").cast("double") / F.col("n_toks").cast("double"), 6
        ).alias("token_share"),
        F.round(
            F.col("en_kept").cast("double")
            / F.nullif(F.col("n_kept"), F.lit(0)).cast("double"),
            6,
        ).alias("en_share_kept"),
    )


@register(
    "t_line_dedup_stats",
    oracle="""
WITH sent AS (
  SELECT doc_id, source, trim(u.s) AS line,
         CAST(u.pos AS BIGINT) AS pos
  FROM (
    SELECT doc_id, source, unnest(string_split(text, '.')) AS s,
           generate_subscripts(string_split(text, '.'), 1) AS pos
    FROM documents
  ) u
  WHERE trim(u.s) <> ''
),
ranked AS (
  SELECT source, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS occ
  FROM sent
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removable,
       CAST(sum(CASE WHEN occ > 1 THEN length(line) ELSE 0 END) AS BIGINT)
         AS chars_removable,
       round(CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS removable_share
FROM ranked GROUP BY 1
""",
    doc="Line-level (sentence) dedup accounting, C4-style: split every "
    "doc on sentence boundaries, rank each distinct line's "
    "occurrences corpus-wide by (doc_id, pos) — a TOTAL order, so "
    "'which copy survives' is deterministic — and report, per "
    "source, how many lines and characters a keep-first line dedup "
    "would strip (C4 removed any line repeated 3+ times; this is "
    "the measurement pass that picks such a threshold, and the "
    "per-source view shows which feed injects the boilerplate). The "
    "per-line window partitions on the line itself — group size = "
    "that line's duplicate count, never corpus-sized. All counts "
    "exact int64. Plan: split explode, one line-keyed window, "
    "per-source agg; the explode is the linear term at 100 TB "
    "(chunk the split per doc, same plan).",
)
def t_line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    sent = (
        docs.select(
            "doc_id",
            "source",
            F.posexplode(F.split(F.col("text"), "\\.")).alias("pos0", "s"),
        )
        .select(
            "doc_id",
            "source",
            F.trim(F.col("s")).alias("line"),
            (F.col("pos0") + 1).cast("long").alias("pos"),
        )
        .filter(F.col("line") != "")
    )
    w = Window.partitionBy("line").orderBy("doc_id", "pos")
    ranked = sent.withColumn("occ", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("occ") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_removable"),
        F.sum(F.when(F.col("occ") > 1, F.length("line")).otherwise(0))
        .cast("long")
        .alias("chars_removable"),
        F.round(
            F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("removable_share"),
    )


def _kmeans_silhouette_oracle_sql() -> str:
    """Derive from emb_kmeans_cells' registered oracle (single source
    of truth for the Lloyd's chain): swap its final assignment select
    for centroid reconstruction + simplified-silhouette CTEs."""
    from . import REGISTRY

    base = REGISTRY["emb_kmeans_cells"].oracle
    marker = "\nSELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a1"
    head, sep, _ = base.rpartition(marker)
    assert sep, "emb_kmeans_cells oracle shape changed"
    return (
        head
        + """,
cents AS (
  SELECT cell, list(mu ORDER BY dim) AS centroid
  FROM (
    SELECT a.cell, i AS dim, round(sum(e.v[i]), 6) / count(*) AS mu
    FROM a1 a JOIN emb e USING (vec_id), range(1, 65) r(i)
    GROUP BY a.cell, i
  ) GROUP BY cell
),
d AS (
  SELECT a.vec_id, a.cell, c.cell AS ocell,
         sqrt(list_sum(list_transform(range(1, 65),
           i -> (e.v[i] - c.centroid[i]) * (e.v[i] - c.centroid[i])))) AS dist
  FROM a1 a JOIN emb e USING (vec_id) CROSS JOIN cents c
),
ab AS (
  SELECT vec_id, cell,
         max(CASE WHEN ocell = cell THEN dist END) AS a,
         min(CASE WHEN ocell <> cell THEN dist END) AS b
  FROM d GROUP BY 1, 2
),
s AS (
  SELECT cell,
         CAST(round(CASE WHEN greatest(a, b) > 0
                         THEN (b - a) / greatest(a, b) ELSE 0.0 END
                    * 1000000.0, 0) AS BIGINT) AS s_micro
  FROM ab
)
SELECT CAST(cell AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(s_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6)
         AS mean_silhouette
FROM s GROUP BY cell"""
    )


@register(
    "emb_kmeans_silhouette",
    oracle=_kmeans_silhouette_oracle_sql(),
    doc="Simplified silhouette score per k-means cell (Hruschka et "
    "al.): a = distance to own centroid, b = nearest OTHER centroid, "
    "s = (b-a)/max(a,b) — the clustering-quality readout that says "
    "which IVF/SemDeDup cells are tight (safe to prune hard) and "
    "which straddle a boundary (raise nprobe / lower the dedup "
    "threshold there). Uses centroid distances only — O(n*k), never "
    "the O(n^2) full silhouette, which is the form that survives "
    "100 TB. The oracle derives from emb_kmeans_cells' registered "
    "SQL (one source of truth for the trainer chain); centroids "
    "reconstruct with the same round(sum,6)/count contract, "
    "distances share one double shape, per-point scores integerize "
    "to micro-units so cell means are exact int64 reductions. Plan: "
    "one scan x broadcast k centroids, per-point conditional agg, "
    "k-group rollup.",
)
def emb_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb0 = load_table(spark, sf_dir, "embeddings")
    assign = SIM.kmeans_fit_predict(emb0, k=8, iters=2)
    emb = emb0.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    means = (
        assign.join(emb, "vec_id")
        .select("cell", F.posexplode("v").alias("dim", "val"))
        .groupBy("cell", "dim")
        .agg((F.round(F.sum("val"), 6) / F.count(F.lit(1))).alias("mu"))
    )
    cents = means.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s["mu"]
        ).alias("centroid")
    ).select(F.col("cell").alias("ocell"), "centroid")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    d = (
        assign.join(emb, "vec_id")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cell", "ocell", dist.alias("dist"))
    )
    ab = d.groupBy("vec_id", "cell").agg(
        F.max(F.when(F.col("ocell") == F.col("cell"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("ocell") != F.col("cell"), F.col("dist"))).alias("b"),
    )
    s_micro = F.round(
        F.when(
            F.greatest(F.col("a"), F.col("b")) > 0,
            (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")),
        ).otherwise(0.0)
        * 1000000.0,
        0,
    ).cast("long")
    return (
        ab.select(F.col("cell").cast("long").alias("cell"), s_micro.alias("s_micro"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.sum("s_micro").cast("double") / F.count(F.lit(1)).cast("double")
                / 1000000.0,
                6,
            ).alias("mean_silhouette"),
        )
    )


@register(
    "t_waterfill_source_caps",
    oracle=f"""
WITH n AS (
  SELECT source, CAST(sum(len({_SQL_TOKENS.format(col='text')})) AS BIGINT) AS n_tok
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_tok) AS BIGINT) AS total,
         CAST(sum(n_tok) AS BIGINT) // 2 AS budget
  FROM n
),
ranked AS (
  SELECT source, n_tok,
         CAST(row_number() OVER (ORDER BY n_tok, source) AS BIGINT) AS i,
         CAST(sum(n_tok) OVER (ORDER BY n_tok, source
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
  FROM n
),
sel AS (
  SELECT CAST(coalesce(max(i), 0) AS BIGINT) AS istar,
         CAST(coalesce(max_by(p, i), 0) AS BIGINT) AS pstar
  FROM ranked, tot
  WHERE n_tok * (k - i + 1) <= budget - (p - n_tok)
),
cap AS (
  SELECT istar, pstar,
         (budget - pstar) // greatest(k - istar, 1) AS t, budget
  FROM sel, tot
)
SELECT r.source, r.n_tok AS n_tokens,
       CAST(CASE WHEN r.i <= c.istar THEN r.n_tok ELSE c.t END AS BIGINT)
         AS allocated_tokens
FROM ranked r, cap c
""",
    doc="Waterfilling token-budget allocator: given a corpus token "
    "budget (50% of the total here), grant every source its full "
    "token count up to a COMMON CAP chosen so the grants exactly "
    "exhaust the budget — max-min fair allocation, the principled "
    "form of 'cap the big sources' that per-source fixed caps "
    "approximate (t_per_source_cap is the fixed-cap sibling; this "
    "one derives the cap from the budget). Closed form, no "
    "iteration: sources sort ascending by tokens, the largest fully-"
    "grantable prefix i* satisfies n_i*(k-i+1) <= B - P_(i-1) (an "
    "EXACT integer cross-multiply test), and the cap is the integer "
    "division of what remains — all int64, identical truncation on "
    "both engines. The ranking and prefix sums run on the per-"
    "source frame via global_prefix_sums (k rows, but the operator "
    "keeps the plan single-task-free — the same query reshapes to "
    "per-domain caps where k is millions). Plan: one scan agg, one "
    "range exchange over k rows, two 1-row broadcasts.",
)
def t_waterfill_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_prefix_sums

    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(T.token_count(F.col("text"))).cast("long").alias("n_tok")
    ).withColumn("one", F.lit(1).cast("long"))
    tot = n.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_tok").cast("long").alias("total"),
        F.expr("CAST(sum(n_tok) AS BIGINT) div 2").cast("long").alias("budget"),
    )
    ranked = global_prefix_sums(
        n, [F.col("n_tok"), F.col("source")], {"n_tok": "p", "one": "i"}
    )
    cond = ranked.crossJoin(F.broadcast(tot)).filter(
        F.col("n_tok") * (F.col("k") - F.col("i") + 1)
        <= F.col("budget") - (F.col("p") - F.col("n_tok"))
    )
    sel = cond.agg(
        F.coalesce(F.max(F.struct("i", "p")), F.struct(F.lit(0).cast("long").alias("i"), F.lit(0).cast("long").alias("p"))).alias("best")
    ).select(
        F.col("best.i").cast("long").alias("istar"),
        F.col("best.p").cast("long").alias("pstar"),
    )
    cap = sel.crossJoin(F.broadcast(tot)).select(
        "istar",
        F.expr("(budget - pstar) div greatest(k - istar, 1)")
        .cast("long")
        .alias("t"),
    )
    return ranked.crossJoin(F.broadcast(cap)).select(
        "source",
        F.col("n_tok").alias("n_tokens"),
        F.when(F.col("i") <= F.col("istar"), F.col("n_tok"))
        .otherwise(F.col("t"))
        .cast("long")
        .alias("allocated_tokens"),
    )


@register(
    "t_hill_tail_index",
    oracle="""
WITH top AS (
  SELECT n_chars, doc_id FROM documents
  ORDER BY n_chars DESC, doc_id LIMIT 101
),
r AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
  FROM top
),
xk AS (SELECT CAST(n_chars AS BIGINT) AS x_k1 FROM r WHERE rn = 101),
s AS (
  SELECT CAST(sum(CAST(round(ln(CAST(r.n_chars AS DOUBLE) / CAST(xk.x_k1 AS DOUBLE))
                             * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS lnsum_micro,
         CAST(count(*) AS BIGINT) AS k
  FROM r, xk WHERE r.rn <= 100
)
SELECT k, x_k1,
       round(CAST(k AS DOUBLE)
             / (CAST(lnsum_micro AS DOUBLE) / 1000000.0), 6) AS hill_alpha
FROM s, xk
""",
    doc="Hill estimator of the document-length tail index over the "
    "top-100 order statistics: alpha = k / sum ln(x_i / x_(k+1)) — "
    "the heavy-tail diagnostic for VALUES (complements "
    "q_powerlaw_degree_alpha, which fits frequency-rank data): "
    "alpha < 2 means giant documents dominate total bytes and "
    "length-capped chunking / per-file size budgets are mandatory "
    "before a 100 TB ingest. The order statistics come from "
    "orderBy+limit (TakeOrderedAndProject — per-partition heaps, "
    "never a global sort) and rank WITHIN the 101 survivors via "
    "the distributed global_row_number; per-item log terms "
    "integerize to micro-units so the sum is an exact int64 "
    "reduction. Plan: one column-pruned scan, a 101-row top-k, a "
    "1-row threshold broadcast.",
)
def t_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents").select("n_chars", "doc_id")
    top = docs.orderBy(F.col("n_chars").desc(), F.col("doc_id")).limit(101)
    r = global_row_number(
        top, [F.col("n_chars").desc(), F.col("doc_id")], out_col="rn"
    )
    xk = r.filter(F.col("rn") == 101).select(
        F.col("n_chars").cast("long").alias("x_k1")
    )
    s = (
        r.filter(F.col("rn") <= 100)
        .crossJoin(F.broadcast(xk))
        .agg(
            F.sum(
                F.round(
                    F.log(
                        F.col("n_chars").cast("double") / F.col("x_k1").cast("double")
                    )
                    * 1000000.0,
                    0,
                ).cast("long")
            )
            .cast("long")
            .alias("lnsum_micro"),
            F.count(F.lit(1)).cast("long").alias("k"),
            F.max("x_k1").cast("long").alias("x_k1"),
        )
    )
    return s.select(
        "k",
        "x_k1",
        F.round(
            F.col("k").cast("double")
            / (F.col("lnsum_micro").cast("double") / F.lit(1000000.0)),
            6,
        ).alias("hill_alpha"),
    )


@register(
    "t_bootstrap_mean_ci",
    oracle="""
WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x FROM documents),
grid AS (
  SELECT d.doc_id, d.x, b.b,
         CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS h
  FROM d, (SELECT unnest(range(0, 32)) AS b) b
),
w AS (
  SELECT b, x,
         CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1
              WHEN h < 920 THEN 2 ELSE 3 END AS m
  FROM grid
),
means AS (
  SELECT b,
         CAST(sum(m * x) AS BIGINT) AS sx,
         CAST(sum(m) AS BIGINT) AS sm
  FROM w GROUP BY b
),
mb AS (
  SELECT round(CAST(sx AS DOUBLE) / CAST(nullif(sm, 0) AS DOUBLE), 6) AS mean_b
  FROM means
),
base AS (SELECT round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_full FROM d)
SELECT mean_full,
       round(quantile_cont(mean_b, 0.025), 6) AS ci_lo,
       round(quantile_cont(mean_b, 0.975), 6) AS ci_hi,
       CAST(count(*) AS BIGINT) AS n_resamples
FROM mb, base
GROUP BY mean_full
""",
    doc="Poissonized bootstrap CI for the mean document length: 32 "
    "resamples where each row's multiplicity in resample b is drawn "
    "from a DETERMINISTIC Poisson(1) approximation (md5(doc_id:b) "
    "mod 1000 against the Poisson pmf ladder 368/736/920 — the "
    "portable-hash contract every MinHash oracle here already "
    "uses), so both engines materialize bit-identical resamples "
    "with NO random state and no shuffle of the data itself — the "
    "distributed bootstrap the 'resample-with-replacement' textbook "
    "form cannot scale to (Poissonization is how bootstrap runs on "
    "streams/map-reduce; Kleiner et al.'s bag-of-little-bootstraps "
    "builds on it). Per-resample sums are exact int64; the 2.5/97.5 "
    "percentile CI runs over 32 rounded means. Plan: one scan x "
    "32-replicate broadcast grid, 32-group agg, 1-row reduce.",
)
def t_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.col("n_chars").cast("long").alias("x"))
    grid = d.crossJoin(F.broadcast(spark.range(0, 32).select(F.col("id").alias("b"))))
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    m = (
        F.when(h < 368, 0)
        .when(h < 736, 1)
        .when(h < 920, 2)
        .otherwise(3)
    )
    means = (
        grid.select("b", "x", m.alias("m"))
        .groupBy("b")
        .agg(
            F.sum(F.col("m") * F.col("x")).cast("long").alias("sx"),
            F.sum("m").cast("long").alias("sm"),
        )
    )
    mb = means.select(
        F.round(
            F.col("sx").cast("double") / F.nullif(F.col("sm"), F.lit(0)).cast("double"),
            6,
        ).alias("mean_b")
    )
    base = d.agg(
        F.round(
            F.sum("x").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_full")
    )
    return mb.crossJoin(F.broadcast(base)).groupBy("mean_full").agg(
        F.round(F.expr("percentile(mean_b, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(mean_b, 0.975)"), 6).alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
    )


@register(
    "t_code_like_docs",
    oracle="""
WITH f AS (
  SELECT source,
         length(regexp_replace(text, '[^{}();=\\[\\]<>]', '', 'g')) AS n_sym,
         length(text) AS n_ch,
         len(regexp_extract_all(text, '[a-z][a-zA-Z]*[A-Z][a-zA-Z]*')) AS n_camel,
         len(regexp_extract_all(text, '\\b(def|return|import|void|function|class|const|var|int)\\b')) AS n_kw
  FROM documents
),
s AS (
  SELECT source,
         CASE WHEN (n_sym * 100 >= n_ch * 3 AND n_ch > 0)
                   OR n_kw >= 2 OR n_camel >= 3
              THEN 1 ELSE 0 END AS code_like
  FROM f
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(code_like) AS BIGINT) AS n_code_like,
       round(CAST(sum(code_like) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS code_share
FROM s GROUP BY 1
""",
    doc="Code-likeness filter per source: a document is code-like when "
    "code-symbol density ({}();=[]<> over chars) reaches 3%, or it "
    "contains 2+ programming keywords, or 3+ camelCase identifiers "
    "— the cheap heuristic gate that routes documents to a code-"
    "specific pipeline (tokenizer, dedup thresholds, quality rules "
    "all differ for code) before any expensive classifier runs. "
    "Patterns use only portable character classes and literal "
    "alternations (no unicode classes — Java regex and RE2 agree "
    "on these); the density test is integer cross-multiplied "
    "(n_sym*100 >= n_ch*3 — no float threshold). Counts exact "
    "int64. Plan: one scan, per-source agg — a 100 TB single pass.",
)
def t_code_like_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_sym = F.length(F.regexp_replace(F.col("text"), "[^{}();=\\[\\]<>]", ""))
    n_ch = F.length(F.col("text"))
    n_camel = F.size(
        F.expr("regexp_extract_all(text, '[a-z][a-zA-Z]*[A-Z][a-zA-Z]*', 0)")
    )
    n_kw = F.size(
        F.expr(
            "regexp_extract_all(text, "
            "'\\\\b(def|return|import|void|function|class|const|var|int)\\\\b', 0)"
        )
    )
    code_like = F.when(
        ((n_sym * 100 >= n_ch * 3) & (n_ch > 0)) | (n_kw >= 2) | (n_camel >= 3), 1
    ).otherwise(0)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(code_like).cast("long").alias("n_code_like"),
        F.round(
            F.sum(code_like).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("code_share"),
    )


def _lsh_band_sweep_oracle_sql() -> str:
    """One signature table, three banding configs — the (bands, rows)
    sweep shares the 16-perm signatures and the exact-Jaccard table,
    so the oracle replays exactly what the Spark side composes."""
    parts = [f"WITH {_SQL_SHINGLES.strip()},\n{_minhash_sql(16, 42).strip()}"]
    rows = []
    for b in (2, 4, 8):
        us = ", ".join(str(i) for i in range(b))
        parts.append(
            f""",
bands{b} AS (
  SELECT doc_id, {_band_case_sql(16, b)} AS band_key
  FROM sig, UNNEST([{us}]) AS u(b)
),
cand{b} AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands{b} a JOIN bands{b} b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""
        )
        rows.append(
            f"""SELECT {b} AS bands, {16 // b} AS rows_per_band,
       (SELECT count(*) FROM cand{b}) AS n_candidates,
       (SELECT count(*) FROM cand{b} c JOIN jac j USING (id_a, id_b)
        WHERE j.jaccard >= 0.5) AS n_verified"""
        )
    union = "\nUNION ALL\n".join(rows)
    return (
        "".join(parts)
        + f""",
sweep AS (
{union}
)
SELECT CAST(bands AS BIGINT) AS bands,
       CAST(rows_per_band AS BIGINT) AS rows_per_band,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_verified AS BIGINT) AS n_verified,
       round(n_verified * 1.0 / nullif(n_candidates, 0), 6) AS precision_at_05
FROM sweep"""
    )


@register(
    "t_lsh_band_sweep",
    oracle=_lsh_band_sweep_oracle_sql(),
    doc="LSH banding parameter sweep: with ONE set of 16-perm MinHash "
    "signatures, compare (b=2, r=8), (b=4, r=4), (b=8, r=2) — "
    "candidate pair volume and the share that verifies at Jaccard "
    ">= 0.5 — the empirical S-curve table that picks the banding "
    "config before a 100 TB dedup run (theory says the threshold "
    "sits near (1/b)^(1/r); this measures it on YOUR corpus, where "
    "boilerplate skew bends the curve). Signatures and the exact-"
    "Jaccard verify table compute once and feed all three configs; "
    "each config costs one band self-join (the same banded bucket "
    "join the production operator runs). Counts exact int64; the "
    "precision ratio is the only float. Plan: shingle explode -> "
    "16-min signature agg (once) -> three bounded band joins.",
)
def t_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _signature_bands

    docs = load_table(spark, sf_dir, "documents")
    sh = DD.shingle_sets(docs, "doc_id", "text", 3).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a_sh = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a_sh.join(b_sh, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter") * F.lit(1.0)
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .persist()
    )
    out = None
    for b in (2, 4, 8):
        exploded = _signature_bands(sh, "doc_id", 16, b, 42)
        ca = exploded.select(F.col("doc_id").alias("id_a"), "band_key")
        cb = exploded.select(F.col("doc_id").alias("id_b"), "band_key")
        cand = (
            ca.join(cb, "band_key")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .persist()
        )
        nc = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        nv = cand.join(jac, ["id_a", "id_b"]).agg(
            F.count(F.lit(1)).cast("long").alias("n_verified")
        )
        row = (
            nc.crossJoin(F.broadcast(nv))
            .select(
                F.lit(b).cast("long").alias("bands"),
                F.lit(16 // b).cast("long").alias("rows_per_band"),
                "n_candidates",
                "n_verified",
                F.round(
                    F.col("n_verified").cast("double")
                    / F.nullif(F.col("n_candidates"), F.lit(0)).cast("double"),
                    6,
                ).alias("precision_at_05"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "t_effective_sources",
    oracle=f"""
WITH n AS (
  SELECT source, CAST(sum(len({_SQL_TOKENS.format(col='text')})) AS BIGINT) AS n_tok
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total FROM n),
sh AS (
  SELECT n_tok // greatest(total // 1000000, 1) AS share_micro
  FROM n, tot
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sources,
         CAST(sum(share_micro * share_micro) AS BIGINT) AS sumsq_micro,
         CAST(max(share_micro) AS BIGINT) AS max_share_micro,
         CAST(sum(CASE WHEN share_micro > 0
                       THEN CAST(round(-(CAST(share_micro AS DOUBLE) / 1000000.0)
                                       * ln(CAST(share_micro AS DOUBLE) / 1000000.0)
                                       * 1000000.0, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS entropy_micro
  FROM sh
)
SELECT n_sources,
       round(1000000000000.0 / CAST(sumsq_micro AS DOUBLE), 6)
         AS effective_sources_simpson,
       round(CAST(max_share_micro AS DOUBLE) / 1000000.0, 6) AS berger_parker,
       round(CAST(entropy_micro AS DOUBLE) / 1000000.0, 6) AS shannon_nats
FROM agg
""",
    doc="Corpus mix diversity in one row: inverse-Simpson effective "
    "source count (1/sum p^2 — 'how many equal-size sources is this "
    "mix worth'), Berger-Parker dominance (largest share), and "
    "Shannon entropy in nats — the three numbers a dataset card "
    "quotes about source balance, each reacting differently to the "
    "tail (Simpson ignores it, Shannon credits it). Token shares "
    "quantize to MICRO-SHARES by divide-before-multiply truncation "
    "(the q_herfindahl_suppliers overflow-proof lane — bounded "
    "squares at any corpus size), per-source entropy terms "
    "integerize to micro-nats, so every reduction is an exact int64 "
    "sum. Plan: one scan, per-source agg, 1-row total broadcast, "
    "1-row reduce.",
)
def t_effective_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(T.token_count(F.col("text"))).cast("long").alias("n_tok")
    )
    tot = n.agg(F.sum("n_tok").cast("long").alias("total"))
    sh = n.crossJoin(F.broadcast(tot)).select(
        F.expr("n_tok div greatest(total div 1000000, 1)").alias("share_micro")
    )
    p = F.col("share_micro").cast("double") / F.lit(1000000.0)
    ent_term = F.when(
        F.col("share_micro") > 0,
        F.round(-p * F.log(p) * 1000000.0, 0).cast("long"),
    ).otherwise(0)
    agg = sh.agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum(F.col("share_micro") * F.col("share_micro"))
        .cast("long")
        .alias("sumsq_micro"),
        F.max("share_micro").cast("long").alias("max_share_micro"),
        F.sum(ent_term).cast("long").alias("entropy_micro"),
    )
    return agg.select(
        "n_sources",
        F.round(F.lit(1.0e12) / F.col("sumsq_micro").cast("double"), 6).alias(
            "effective_sources_simpson"
        ),
        F.round(F.col("max_share_micro").cast("double") / 1000000.0, 6).alias(
            "berger_parker"
        ),
        F.round(F.col("entropy_micro").cast("double") / 1000000.0, 6).alias(
            "shannon_nats"
        ),
    )


def _pca_explained_oracle_sql() -> str:
    """Derive from emb_top_pc_power's registered oracle (one source of
    truth for the fixed-point chain): keep its final vector CTE and
    append the Rayleigh-quotient share — scale factors cancel in the
    ratio, so the fixed-point scales never enter the result."""
    from . import REGISTRY

    base = REGISTRY["emb_top_pc_power"].oracle
    marker = "\nSELECT dim, vq FROM v3"
    head, sep, _ = base.rpartition(marker)
    assert sep, "emb_top_pc_power oracle shape changed"
    return (
        head
        + """,
xv4 AS (
  SELECT e.vec_id, sum(e.xq * v.vq) AS s
  FROM exq e JOIN v3 v USING (dim) GROUP BY 1
),
num AS (SELECT sum(CAST(s AS DECIMAL(18,0)) * CAST(s AS DECIMAL(18,0))) AS ss FROM xv4),
den1 AS (SELECT CAST(sum(vq * vq) AS BIGINT) AS vv FROM v3),
den2 AS (SELECT sum(CAST(xq AS DECIMAL(18,0)) * CAST(xq AS DECIMAL(18,0))) AS xx FROM exq),
nv AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs FROM exq)
SELECT n_vecs,
       round((CAST(ss AS DOUBLE) / CAST(vv AS DOUBLE)) / CAST(xx AS DOUBLE), 6)
         AS explained_share
FROM num, den1, den2, nv"""
    )


@register(
    "emb_pca_explained_variance",
    oracle=_pca_explained_oracle_sql(),
    doc="Explained-variance share of the top principal direction: the "
    "Rayleigh quotient ||Xv||^2 / (||v||^2 * ||X||_F^2) evaluated on "
    "the fixed-point power-iteration vector — the number that says "
    "whether the embedding space has one dominant axis (share near "
    "1 = anisotropic/collapsed embeddings, the known failure mode "
    "post-hoc whitening fixes; cf. emb_standardize) or spreads "
    "energy across dims. The oracle derives from emb_top_pc_power's "
    "registered SQL, so the iteration chain has one source of "
    "truth; both fixed-point scales cancel in the ratio, squares "
    "ride DECIMAL(18)xDECIMAL(18) (s^2 ~ 4e19 wraps int64), and "
    "the three reductions are exact. Plan: the pinned exploded "
    "matrix feeds one more keyed agg + two 1-row reduces past the "
    "iteration itself.",
)
def emb_pca_explained_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import pin_frame
    from ..operators.similarity import power_iteration_top_pc

    scale = 10000
    emb = load_table(spark, sf_dir, "embeddings")
    v = power_iteration_top_pc(emb, iters=3, scale=scale)
    exq = pin_frame(
        emb.select("vec_id", F.posexplode("embedding").alias("dim", "x")).select(
            "vec_id",
            "dim",
            F.round(F.col("x").cast("double") * scale, 0).cast("long").alias("xq"),
        )
    )
    xv4 = (
        exq.join(F.broadcast(v), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.col("xq") * F.col("vq")).alias("s"))
    )
    sd = F.col("s").cast("decimal(18,0)")
    num = xv4.agg(F.sum(sd * sd).alias("ss"))
    den1 = v.agg(F.sum(F.col("vq") * F.col("vq")).cast("long").alias("vv"))
    xd = F.col("xq").cast("decimal(18,0)")
    den2 = exq.agg(F.sum(xd * xd).alias("xx"))
    nv = exq.agg(F.countDistinct("vec_id").cast("long").alias("n_vecs"))
    return (
        num.crossJoin(F.broadcast(den1))
        .crossJoin(F.broadcast(den2))
        .crossJoin(F.broadcast(nv))
        .select(
            "n_vecs",
            F.round(
                (F.col("ss").cast("double") / F.col("vv").cast("double"))
                / F.col("xx").cast("double"),
                6,
            ).alias("explained_share"),
        )
    )


@register(
    "t_est_jaccard_histogram",
    oracle=f"""
WITH {_SQL_SHINGLES.strip()},
{_minhash_sql(16, 42).strip()},
bands AS (
  SELECT doc_id, {_band_case_sql(16, 4)} AS band_key
  FROM sig, UNNEST([0, 1, 2, 3]) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.id_a, c.id_b,
         (CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END + CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END
          + CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END + CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END
          + CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END + CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END
          + CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END + CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END
          + CASE WHEN sa.mh8 = sb.mh8 THEN 1 ELSE 0 END + CASE WHEN sa.mh9 = sb.mh9 THEN 1 ELSE 0 END
          + CASE WHEN sa.mh10 = sb.mh10 THEN 1 ELSE 0 END + CASE WHEN sa.mh11 = sb.mh11 THEN 1 ELSE 0 END
          + CASE WHEN sa.mh12 = sb.mh12 THEN 1 ELSE 0 END + CASE WHEN sa.mh13 = sb.mh13 THEN 1 ELSE 0 END
          + CASE WHEN sa.mh14 = sb.mh14 THEN 1 ELSE 0 END + CASE WHEN sa.mh15 = sb.mh15 THEN 1 ELSE 0 END
         ) AS matches
  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a JOIN sig sb ON sb.doc_id = c.id_b
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM est)
SELECT CAST(matches AS BIGINT) AS matching_sigs,
       round(CAST(matches AS DOUBLE) / 16.0, 6) AS est_jaccard,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(count(*) AS DOUBLE) / CAST(max(tot.n_pairs) AS DOUBLE), 6)
         AS pair_share
FROM est, tot GROUP BY matches
""",
    doc="Estimated-Jaccard histogram over the LSH candidate pairs: for "
    "every banding candidate, how many of the 16 MinHash components "
    "agree — the similarity DISTRIBUTION a dedup operator will see, "
    "read before choosing the verify threshold (a bimodal histogram "
    "means a clean threshold exists; mass piled just below it means "
    "the banding config over-generates, cf. t_lsh_band_sweep). The "
    "match count per pair is pure integer signature comparison "
    "(exact on both engines — the estimate IS matches/16, no float "
    "estimation step), binned by its own exact value. Plan: one "
    "signature agg, one banded bucket join, a signature-pair probe "
    "keyed on doc id, 17-bucket rollup.",
)
def t_est_jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _signature_bands

    docs = load_table(spark, sf_dir, "documents")
    sh = DD.shingle_sets(docs, "doc_id", "text", 3).persist()
    sig = DD.minhash_signatures(docs, "doc_id", "text", 3, 16, 42).persist()
    exploded = _signature_bands(sh, "doc_id", 16, 4, 42)
    ca = exploded.select(F.col("doc_id").alias("id_a"), "band_key")
    cb = exploded.select(F.col("doc_id").alias("id_b"), "band_key")
    cand = (
        ca.join(cb, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)],
    )
    matches = None
    for i in range(16):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    est = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(matches.alias("matches"))
    )
    tot = est.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    return (
        est.groupBy("matches")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs_bin"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("matches").cast("long").alias("matching_sigs"),
            F.round(F.col("matches").cast("double") / F.lit(16.0), 6).alias(
                "est_jaccard"
            ),
            F.col("n_pairs_bin").alias("n_pairs"),
            F.round(
                F.col("n_pairs_bin").cast("double") / F.col("n_pairs").cast("double"),
                6,
            ).alias("pair_share"),
        )
    )


@register(
    "t_capture_recapture_vocab",
    oracle=f"""
WITH tk AS (
  SELECT DISTINCT doc_id % 2 AS half,
         unnest({_SQL_TOKENS.format(col='lower(text)')}) AS tk
  FROM documents
),
m AS (SELECT tk, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM tk WHERE half = 0) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM tk WHERE half = 1) AS n2,
         (SELECT CAST(count(*) AS BIGINT) FROM m WHERE c = 2) AS m_overlap,
         (SELECT CAST(count(*) AS BIGINT) FROM m) AS true_vocab
)
SELECT n1, n2, m_overlap, true_vocab,
       CAST((n1 * n2) // nullif(m_overlap, 0) AS BIGINT) AS lincoln_petersen_est,
       round((CAST((n1 * n2) // nullif(m_overlap, 0) AS DOUBLE)
              - CAST(true_vocab AS DOUBLE)) / CAST(true_vocab AS DOUBLE), 6)
         AS relative_error
FROM c
""",
    doc="Capture-recapture (Lincoln-Petersen) estimate of total "
    "vocabulary size from two corpus halves: treat each half's "
    "distinct token set as a 'capture', the shared tokens as "
    "'marked recaptures', and estimate N = n1*n2/m — the ecology "
    "estimator that transfers directly to corpus work ('how many "
    "distinct entities/URLs/tokens exist in the crawl I have NOT "
    "fully scanned'), here validated against the true vocabulary "
    "(the relative-error column makes the estimator's bias visible "
    "— LP under-counts when captures aren't independent, which "
    "Zipfian tokens are not; the companion t_heaps_law_fit "
    "extrapolates the same quantity a different way). All counts "
    "exact int64; the estimate uses truncation division. Plan: one "
    "distinct (half, token) agg, token-keyed overlap agg, 1-row "
    "reduce.",
)
def t_capture_recapture_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(T.tokens(F.lower(F.col("text")))).alias("tk"),
    ).distinct()
    m = tk.groupBy("tk").agg(F.count(F.lit(1)).cast("long").alias("c"))
    c = (
        tk.agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n2"),
        )
        .crossJoin(
            F.broadcast(
                m.agg(
                    F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
                    .cast("long")
                    .alias("m_overlap"),
                    F.count(F.lit(1)).cast("long").alias("true_vocab"),
                )
            )
        )
    )
    est = F.expr("(n1 * n2) div nullif(m_overlap, 0)").cast("long")
    return c.select(
        "n1",
        "n2",
        "m_overlap",
        "true_vocab",
        est.alias("lincoln_petersen_est"),
        F.round(
            (est.cast("double") - F.col("true_vocab").cast("double"))
            / F.col("true_vocab").cast("double"),
            6,
        ).alias("relative_error"),
    )


def _facility_location_oracle_sql(n_cand: int = 50, k: int = 5) -> str:
    """Unrolled greedy facility-location selection: k chained
    (gain-argmax, coverage-update) CTE pairs over a MATERIALIZED
    micro-integer similarity matrix — the kmeans/pagerank fixed-step
    replay contract applied to submodular maximization."""
    head = f"""WITH u AS (
  SELECT vec_id, {{unit}} AS un FROM embeddings WHERE vec_id < {n_cand}
),
sims AS MATERIALIZED (
  SELECT a.vec_id AS i, b.vec_id AS j,
         CAST(round({{dot}} * 1000000.0, 0) AS BIGINT) AS s
  FROM u a, u b
)"""
    head = head.format(
        unit=_SQL_UNIT.format(a="embedding"),
        dot=_SQL_DOT.format(a="a.un", b="b.un"),
    )
    ctes = [head]
    sel_rows = []
    for step in range(1, k + 1):
        prev_best = (
            "greatest(s, 0)" if step == 1 else None
        )
        exclude = " AND ".join(
            f"j <> (SELECT c FROM sel{p})" for p in range(1, step)
        )
        where = f"WHERE {exclude}" if exclude else ""
        if step == 1:
            gain_src = f"""g{step} AS (
  SELECT j, CAST(sum(greatest(s, 0)) AS BIGINT) AS gain
  FROM sims {where} GROUP BY 1
)"""
        else:
            gain_src = f"""g{step} AS (
  SELECT sims.j, CAST(sum(greatest(sims.s - b.best, 0)) AS BIGINT) AS gain
  FROM sims JOIN b{step - 1} b USING (i) {where} GROUP BY 1
)"""
        ctes.append(gain_src)
        ctes.append(
            f"sel{step} AS MATERIALIZED (SELECT j AS c, gain FROM g{step} "
            f"ORDER BY gain DESC, j LIMIT 1)"
        )
        if step < k:
            if step == 1:
                ctes.append(
                    f"""b{step} AS MATERIALIZED (
  SELECT sims.i, greatest(sims.s, 0) AS best
  FROM sims JOIN sel{step} ON sims.j = sel{step}.c
)"""
                )
            else:
                ctes.append(
                    f"""b{step} AS MATERIALIZED (
  SELECT sims.i, greatest(b.best, sims.s) AS best
  FROM sims JOIN sel{step} ON sims.j = sel{step}.c
  JOIN b{step - 1} b USING (i)
)"""
                )
        sel_rows.append(
            f"SELECT {step} AS rank, (SELECT c FROM sel{step}) AS vec_id, "
            f"(SELECT gain FROM sel{step}) AS coverage_gain_micro"
        )
    union = "\nUNION ALL\n".join(sel_rows)
    return (
        ",\n".join(ctes)
        + f"""
SELECT CAST(rank AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(coverage_gain_micro AS BIGINT) AS coverage_gain_micro
FROM ({union})"""
    )


@register(
    "t_facility_location_select",
    oracle=_facility_location_oracle_sql(50, 5),
    doc="Greedy facility-location data selection: pick 5 of 50 "
    "candidate vectors maximizing total corpus coverage sum_v "
    "max_selected sim(v, c) — THE submodular coreset selector for "
    "'which k examples represent this dataset' (fine-tuning subset "
    "choice, prototype picking, eval-set seeding), with the greedy "
    "(1 - 1/e) guarantee. Similarities integerize to micro-units "
    "once, so every marginal gain, argmax, and coverage update is "
    "exact int64 — both engines walk the identical 5-step greedy "
    "path (ties to the lower id); the oracle unrolls the loop as "
    "materialized CTE pairs. Spark runs the loop with ONE 1-row "
    "argmax collect per step (bounded driver traffic) over the "
    "pinned similarity frame. At 100 TB the candidate set is a "
    "pre-sampled pool (coverage evaluated against the full corpus "
    "via the same joins); the micro-int contract is scale-free.",
)
def t_facility_location_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot, unit
    from ..operators.ranks import pin_frame

    emb = load_table(spark, sf_dir, "embeddings")
    u = emb.filter(F.col("vec_id") < 50).select(
        "vec_id", unit(F.col("embedding")).alias("un")
    )
    a = u.select(F.col("vec_id").alias("i"), F.col("un").alias("ua"))
    b = u.select(F.col("vec_id").alias("j"), F.col("un").alias("ub"))
    sims = pin_frame(
        a.crossJoin(b).select(
            "i",
            "j",
            F.round(dot(F.col("ua"), F.col("ub")) * 1000000.0, 0)
            .cast("long")
            .alias("s"),
        )
    )
    selected: list[tuple[int, int, int]] = []  # (rank, vec_id, gain)
    best = None  # DataFrame (i, best) or None before step 1
    for step in range(1, 6):
        if best is None:
            gains = sims.groupBy("j").agg(
                F.sum(F.greatest(F.col("s"), F.lit(0))).cast("long").alias("gain")
            )
        else:
            gains = (
                sims.join(best, "i")
                .groupBy("j")
                .agg(
                    F.sum(F.greatest(F.col("s") - F.col("best"), F.lit(0)))
                    .cast("long")
                    .alias("gain")
                )
            )
        chosen_ids = [c for _, c, _ in selected]
        if chosen_ids:
            gains = gains.filter(~F.col("j").isin(chosen_ids))
        row = gains.orderBy(F.col("gain").desc(), "j").limit(1).collect()[0]
        selected.append((step, row["j"], row["gain"]))
        if step < 5:
            step_best = sims.filter(F.col("j") == row["j"]).select(
                "i", F.greatest(F.col("s"), F.lit(0)).alias("nb")
            )
            if best is None:
                best = step_best.select("i", F.col("nb").alias("best"))
            else:
                best = (
                    best.join(step_best, "i")
                    .select("i", F.greatest("best", "nb").alias("best"))
                )
    return spark.createDataFrame(
        selected, "rank long, vec_id long, coverage_gain_micro long"
    )


def _mmr_oracle_sql(pool: int = 20, k: int = 5, lam10: int = 7) -> str:
    """Unrolled Maximal-Marginal-Relevance rerank: relevance and
    candidate-candidate similarity integerize to micro-units, the MMR
    score is the integer lam10*rel - (10-lam10)*maxsim (x10 scale),
    and each greedy step is an argmax CTE — fixed-step replay."""
    head = f"""WITH u AS (SELECT vec_id, {{unit}} AS un FROM embeddings),
q AS (SELECT un AS qu FROM u WHERE vec_id = 0),
rel AS MATERIALIZED (
  SELECT vec_id, CAST(round({{dotq}} * 1000000.0, 0) AS BIGINT) AS rel
  FROM u c, q WHERE c.vec_id <> 0
  ORDER BY round({{dotq}} * 1000000.0, 0) DESC, vec_id LIMIT {pool}
),
sims AS MATERIALIZED (
  SELECT a.vec_id AS i, b.vec_id AS j,
         CAST(round({{dotc}} * 1000000.0, 0) AS BIGINT) AS s
  FROM (SELECT r.vec_id, u.un FROM rel r JOIN u USING (vec_id)) a,
       (SELECT r.vec_id, u.un FROM rel r JOIN u USING (vec_id)) b
  WHERE a.vec_id <> b.vec_id
)"""
    head = head.format(
        unit=_SQL_UNIT.format(a="embedding"),
        dotq=_SQL_DOT.format(a="c.un", b="qu"),
        dotc=_SQL_DOT.format(a="a.un", b="b.un"),
    )
    ctes = [head]
    rows = []
    for step in range(1, k + 1):
        exclude = " AND ".join(
            f"vec_id <> (SELECT c FROM sel{p})" for p in range(1, step)
        )
        where = f"WHERE {exclude}" if exclude else ""
        if step == 1:
            ctes.append(
                f"sel1 AS MATERIALIZED (SELECT vec_id AS c, {lam10} * rel AS score "
                f"FROM rel ORDER BY score DESC, vec_id LIMIT 1)"
            )
        else:
            sel_list = ", ".join(f"(SELECT c FROM sel{p})" for p in range(1, step))
            ctes.append(
                f"""sel{step} AS MATERIALIZED (
  SELECT r.vec_id AS c,
         {lam10} * r.rel - {10 - lam10} * coalesce(mx.m, 0) AS score
  FROM rel r LEFT JOIN (
    SELECT i, CAST(max(s) AS BIGINT) AS m FROM sims
    WHERE j IN ({sel_list}) GROUP BY 1
  ) mx ON mx.i = r.vec_id
  {where.replace('vec_id', 'r.vec_id')}
  ORDER BY score DESC, c LIMIT 1
)"""
            )
        rows.append(
            f"SELECT {step} AS rank, (SELECT c FROM sel{step}) AS vec_id, "
            f"(SELECT score FROM sel{step}) AS mmr_score_micro10"
        )
    union = "\nUNION ALL\n".join(rows)
    return (
        ",\n".join(ctes)
        + f"""
SELECT CAST(rank AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(mmr_score_micro10 AS BIGINT) AS mmr_score_micro10
FROM ({union})"""
    )


@register(
    "t_mmr_rerank",
    oracle=_mmr_oracle_sql(20, 5, 7),
    doc="Maximal Marginal Relevance rerank (Carbonell & Goldstein): "
    "from the query's cosine top-20 pool, greedily pick 5 results "
    "maximizing lambda*relevance - (1-lambda)*max-similarity-to-"
    "already-picked (lambda=0.7) — THE diversity reranker RAG "
    "pipelines bolt onto dense retrieval so the context window isn't "
    "five paraphrases of one passage. Relevance and inter-candidate "
    "similarities integerize to micro-units once; the MMR score is "
    "the INTEGER 7*rel - 3*maxsim (x10 lambda scale), so every "
    "greedy argmax replays identically on both engines (ties to the "
    "lower id; the oracle unrolls the 5 steps as materialized CTEs, "
    "the t_facility_location_select contract with a different "
    "objective). Spark runs the loop with one 1-row argmax collect "
    "per step over the pinned pool-sized (20x20) similarity frame. "
    "Plan: one broadcast-query scan + top-k, a bounded pool grid, "
    "k tiny argmax aggregates.",
)
def t_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot, unit
    from ..operators.ranks import pin_frame

    lam10, k, pool = 7, 5, 20
    emb = load_table(spark, sf_dir, "embeddings")
    u = emb.select("vec_id", unit(F.col("embedding")).alias("un"))
    qv = u.filter(F.col("vec_id") == 0).select(F.col("un").alias("qu"))
    rel = pin_frame(
        u.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "un",
            F.round(dot(F.col("un"), F.col("qu")) * 1000000.0, 0)
            .cast("long")
            .alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(pool)
    )
    a = rel.select(F.col("vec_id").alias("i"), F.col("un").alias("ua"))
    b = rel.select(F.col("vec_id").alias("j"), F.col("un").alias("ub"))
    sims = pin_frame(
        a.crossJoin(b)
        .filter(F.col("i") != F.col("j"))
        .select(
            "i",
            "j",
            F.round(dot(F.col("ua"), F.col("ub")) * 1000000.0, 0)
            .cast("long")
            .alias("s"),
        )
    )
    selected: list[tuple[int, int, int]] = []
    for step in range(1, k + 1):
        if not selected:
            scores = rel.select(
                F.col("vec_id").alias("c"),
                (F.lit(lam10) * F.col("rel")).cast("long").alias("score"),
            )
        else:
            chosen = [c for _, c, _ in selected]
            mx = (
                sims.filter(F.col("j").isin(chosen))
                .groupBy("i")
                .agg(F.max("s").cast("long").alias("m"))
            )
            scores = (
                rel.join(mx, rel["vec_id"] == mx["i"], "left")
                .filter(~F.col("vec_id").isin(chosen))
                .select(
                    F.col("vec_id").alias("c"),
                    (
                        F.lit(lam10) * F.col("rel")
                        - F.lit(10 - lam10) * F.coalesce(F.col("m"), F.lit(0))
                    )
                    .cast("long")
                    .alias("score"),
                )
            )
        row = scores.orderBy(F.col("score").desc(), "c").limit(1).collect()[0]
        selected.append((step, row["c"], row["score"]))
    return spark.createDataFrame(
        selected, "rank long, vec_id long, mmr_score_micro10 long"
    )


_RBO_W = {
    1: "0.09999999999999998", 2: "0.08999999999999998", 3: "0.08099999999999999",
    4: "0.07289999999999999", 5: "0.06560999999999999", 6: "0.059049",
    7: "0.05314409999999999", 8: "0.047829689999999994", 9: "0.043046721",
    10: "0.0387420489",
}


def _rbo_weight_case_sql(var: str) -> str:
    whens = " ".join(f"WHEN {d} THEN {w}" for d, w in _RBO_W.items())
    return f"CASE {var} {whens} END"


@register(
    "t_rbo_rankings",
    oracle=f"""
WITH u AS (SELECT vec_id, {_SQL_UNIT.format(a='embedding')} AS un FROM embeddings),
q AS (SELECT vec_id AS q_id, un AS qu FROM u WHERE vec_id < 5),
cosr AS (
  SELECT q_id, cand_id, rn AS ra FROM (
    SELECT q_id, c.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY {_SQL_DOT.format(a='qu', b='c.un')} DESC,
                                       c.vec_id) AS rn
    FROM u c, q WHERE c.vec_id <> q_id
  ) WHERE rn <= 10
),
sig AS (
  SELECT vec_id, {_SQL_SIGN_PACK.format(off=0)} AS lo,
         {_SQL_SIGN_PACK.format(off=32)} AS hi
  FROM embeddings
),
qs AS (SELECT vec_id AS q_id, lo AS qlo, hi AS qhi FROM sig WHERE vec_id < 5),
hamr AS (
  SELECT q_id, cand_id, rn AS rb FROM (
    SELECT q_id, c.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY bit_count(xor(qlo, c.lo))
                                       + bit_count(xor(qhi, c.hi)), c.vec_id) AS rn
    FROM sig c, qs WHERE c.vec_id <> q_id
  ) WHERE rn <= 10
),
common AS (
  SELECT c.q_id, greatest(c.ra, h.rb) AS mx
  FROM cosr c JOIN hamr h ON h.q_id = c.q_id AND h.cand_id = c.cand_id
),
terms AS (
  SELECT qq.q_id, d.d,
         CAST(round({_rbo_weight_case_sql('d.d')}
                    * (SELECT count(*) FROM common cm
                       WHERE cm.q_id = qq.q_id AND cm.mx <= d.d)
                    / d.d * 100000000.0, 0) AS BIGINT) AS term_micro8
  FROM (SELECT DISTINCT q_id FROM cosr) qq,
       (SELECT unnest(range(1, 11)) AS d) d
)
SELECT q_id,
       (SELECT CAST(count(*) AS BIGINT) FROM common cm WHERE cm.q_id = terms.q_id)
         AS n_common,
       round(CAST(sum(term_micro8) AS DOUBLE) / 100000000.0, 6) AS rbo_at_10
FROM terms GROUP BY q_id
""",
    doc="Rank-biased overlap (Webber et al.) between the exact-cosine "
    "and sign-bit-Hamming top-10 rankings, truncated at depth 10 "
    "with persistence p=0.9 — the top-weighted ranking-agreement "
    "measure that, unlike NDCG (t_ndcg_sign_bits judges against a "
    "relevance truth), treats both rankings symmetrically: 'how "
    "interchangeable are these two retrieval stacks'. Per-depth "
    "overlap counts are exact integers (an item contributes at "
    "depth d iff max(rank_a, rank_b) <= d); the geometric weights "
    "are spelled as full-precision double LITERALS (no pow() — the "
    "one libm function the portability contract doesn't trust), and "
    "each weighted term integerizes to 1e-8 units so the depth sum "
    "is exact int64. Plan: two broadcast-query scans (float + "
    "signature), two per-query top-10s, a 10-row depth grid "
    "broadcast, per-query rollup.",
)
def t_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.vectors import dot, unit

    emb = load_table(spark, sf_dir, "embeddings")
    u = emb.select("vec_id", unit(F.col("embedding")).alias("un"))
    q = u.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("un").alias("qu")
    )
    wcos = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    cosr = (
        u.join(F.broadcast(q), u["vec_id"] != q["q_id"])
        .select(
            "q_id",
            F.col("vec_id").alias("cand_id"),
            dot(F.col("qu"), F.col("un")).alias("cos"),
        )
        .withColumn("ra", F.row_number().over(wcos))
        .filter(F.col("ra") <= 10)
        .select("q_id", "cand_id", "ra")
    )

    def pack(off: int):
        return F.expr(
            "aggregate(sequence(1, 32), 0L, (acc, i) -> acc + "
            f"CASE WHEN element_at(embedding, i + {off}) >= 0 "
            "THEN shiftleft(1L, i - 1) ELSE 0L END)"
        )

    sig = emb.select("vec_id", pack(0).alias("lo"), pack(32).alias("hi"))
    qs = sig.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    wham = Window.partitionBy("q_id").orderBy("hamming", "cand_id")
    hamr = (
        sig.join(F.broadcast(qs), sig["vec_id"] != qs["q_id"])
        .select(
            "q_id",
            F.col("vec_id").alias("cand_id"),
            (
                F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
                + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
            ).alias("hamming"),
        )
        .withColumn("rb", F.row_number().over(wham))
        .filter(F.col("rb") <= 10)
        .select("q_id", "cand_id", "rb")
    )
    common = cosr.join(hamr, ["q_id", "cand_id"]).select(
        "q_id", F.greatest(F.col("ra"), F.col("rb")).alias("mx")
    )
    depths = spark.createDataFrame(
        [(d, float(w)) for d, w in _RBO_W.items()], "d int, w double"
    )
    xd = (
        common.crossJoin(F.broadcast(depths))
        .filter(F.col("mx") <= F.col("d"))
        .groupBy("q_id", "d", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("xd"))
    )
    terms = xd.select(
        "q_id",
        F.round(
            F.col("w") * F.col("xd").cast("double") / F.col("d").cast("double")
            * 100000000.0,
            0,
        )
        .cast("long")
        .alias("term_micro8"),
    )
    ncommon = common.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    # anchor on the query set: a query whose two top-10s share NOTHING
    # has no `common` rows, but the oracle's correlated count still
    # emits it with every depth term 0 → rbo 0.0 (seen at sf0.001,
    # where one sign-bit ranking misses the cosine top-10 entirely)
    qids = cosr.select("q_id").distinct()
    rbo = terms.groupBy("q_id").agg(
        F.round(F.sum("term_micro8").cast("double") / 100000000.0, 6).alias(
            "rbo_at_10"
        )
    )
    return (
        qids.join(ncommon, "q_id", "left")
        .join(rbo, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
            F.coalesce(F.col("rbo_at_10"), F.lit(0.0)).alias("rbo_at_10"),
        )
    )


def _phash_ctes() -> str:
    """DCT-pHash oracle CTEs: the px/co/st chain over the same 8x16
    ascii raster as mm_image_dhash, with the fixed-point DCT basis
    embedded as VALUES rows FROM THE SAME Python tables the Spark
    operator compiles in (operators/multimodal.DCT_CY/DCT_CX) — one
    source of truth, no libm on either engine."""
    from ..operators.multimodal import DCT_CX, DCT_CY, PHASH_U, PHASH_V

    cy_rows = ", ".join(
        f"({u}, {y}, {c})" for u, row in enumerate(DCT_CY) for y, c in enumerate(row)
    )
    cx_rows = ", ".join(
        f"({v}, {x}, {c})" for v, row in enumerate(DCT_CX) for x, c in enumerate(row)
    )
    n_bits = PHASH_U * PHASH_V - 1
    return f"""cy(u, y, c) AS (SELECT * FROM (VALUES {cy_rows})),
cx(v, x, c) AS (SELECT * FROM (VALUES {cx_rows})),
px AS (
  SELECT doc_id, y, x,
         CAST(ascii(substr(text, y * 16 + x + 1, 1)) AS BIGINT) AS p
  FROM documents, range(0, 8) yy(y), range(0, 16) xx(x)
  WHERE n_chars >= 128
),
co AS (
  SELECT doc_id, cy.u, cx.v,
         CAST(sum(p * cy.c * cx.c) AS BIGINT) AS f
  FROM px JOIN cy ON cy.y = px.y JOIN cx ON cx.x = px.x
  GROUP BY 1, 2, 3
),
st AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN NOT (u = 0 AND v = 0) THEN f END) AS BIGINT) AS s
  FROM co GROUP BY doc_id
),
ph AS (
  SELECT co.doc_id AS media_id,
         CAST(sum(CASE WHEN NOT (u = 0 AND v = 0) AND {n_bits} * f > s
                       THEN CAST(1 AS BIGINT) << (u * {PHASH_V} + v)
                       ELSE 0 END) AS BIGINT) AS phash
  FROM co JOIN st ON st.doc_id = co.doc_id
  GROUP BY 1
)"""


@register(
    "mm_image_phash",
    oracle="WITH " + _phash_ctes() + "\nSELECT media_id, phash FROM ph",
    doc="REAL DCT perceptual hash (pHash) through the actual Netpbm "
    "decode path: each doc's first 128 ASCII bytes become the same "
    "16x8 P5 raster as mm_image_dhash, decode_netpbm reconstructs the "
    "pixels, and a 2D DCT-II runs in EXACT int64 fixed-point — the "
    "cosine basis is a module-level integer table embedded verbatim "
    "into both engines (no libm at query time anywhere), the retained "
    "4x8 low-frequency block thresholds against the all-integer mean "
    "comparison 31*F(u,v) > sum(non-DC F), and the 31 bits pack into "
    "one BIGINT. pHash captures global low-frequency structure where "
    "dHash sees local gradients — brightness shifts and high-frequency "
    "noise that flip dHash bits leave pHash stable, so corpus dedup "
    "runs both and intersects. The oracle replays decode (ascii = "
    "grayscale for P5), transform, threshold and packing bit-for-bit. "
    "Plan: Arrow-batched mapInPandas, two small integer matrix "
    "products per image; the SQL side is the same transform as a "
    "basis-table join + (doc,u,v) aggregation.",
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_binary, image_phash_dct

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 128)
    pgm = docs.select(
        "doc_id",
        F.concat(F.lit("P5\n16 8\n255\n"), F.substring("text", 1, 128)).alias(
            "payload"
        ),
    )
    media = attach_binary(pgm, "doc_id", "payload", "image")
    return image_phash_dct(media)


@register(
    "mm_phash_neardup",
    oracle="WITH "
    + _phash_ctes()
    + """,
bands AS (
  SELECT media_id, phash, b.band,
         (phash >> (b.band * 8)) & 255 AS key
  FROM ph, range(0, 4) b(band)
)
SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
""",
    doc="Image near-duplicate pairs on the DCT hash end-to-end: pHash "
    "(real Netpbm decode + exact-integer DCT) -> 4x8-bit band keys -> "
    "bucket join (candidates only, never corpus x corpus) -> exact "
    "XOR-popcount Hamming verify <= 3. Pigeonhole makes recall total "
    "at the threshold: 3 flips across 4 bands leave one band intact. "
    "The MinHash-LSH cost model on the second perceptual-hash family; "
    "every stage integer-exact and replayed by the oracle.",
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        attach_binary,
        image_phash_dct,
        phash_neardup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 128)
    pgm = docs.select(
        "doc_id",
        F.concat(F.lit("P5\n16 8\n255\n"), F.substring("text", 1, 128)).alias(
            "payload"
        ),
    )
    media = attach_binary(pgm, "doc_id", "payload", "image")
    return phash_neardup_pairs(image_phash_dct(media), max_hamming=3)


@register(
    "mm_phash_dhash_consensus",
    oracle="WITH "
    + _phash_ctes()
    + """,
pbands AS (
  SELECT media_id, phash, b.band, (phash >> (b.band * 8)) & 255 AS key
  FROM ph, range(0, 4) b(band)
),
ppairs AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS p_hamming
  FROM pbands a JOIN pbands b
    ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 3
),
dpx AS (
  SELECT doc_id, i, j,
         ascii(substr(text, i * 16 + (j * 16) // 9 + 1, 1)) AS p,
         ascii(substr(text, i * 16 + ((j + 1) * 16) // 9 + 1, 1)) AS pn
  FROM documents, range(0, 8) r1(i), range(0, 8) r2(j)
  WHERE n_chars >= 128
),
dh AS (
  SELECT doc_id AS media_id,
         CAST(sum(CASE WHEN i < 4 AND p > pn
                       THEN (CAST(1 AS BIGINT) << (i * 8 + j)) ELSE 0 END)
              AS BIGINT) AS hi,
         CAST(sum(CASE WHEN i >= 4 AND p > pn
                       THEN (CAST(1 AS BIGINT) << ((i - 4) * 8 + j)) ELSE 0 END)
              AS BIGINT) AS lo
  FROM dpx GROUP BY doc_id
),
dbands AS (
  SELECT media_id, hi, lo, b.band,
         CASE WHEN b.band < 2 THEN (hi >> (b.band % 2 * 16)) & 65535
              ELSE (lo >> (b.band % 2 * 16)) & 65535 END AS key
  FROM dh, range(0, 4) b(band)
),
dpairs AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
              AS BIGINT) AS d_hamming
  FROM dbands a JOIN dbands b
    ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
)
SELECT p.id_a, p.id_b, d.d_hamming, p.p_hamming
FROM ppairs p JOIN dpairs d ON d.id_a = p.id_a AND d.id_b = p.id_b
""",
    doc="Consensus image near-dup pairs: the intersection of the dHash "
    "pair set (local gradients, Hamming <= 6) and the pHash pair set "
    "(global DCT structure, Hamming <= 3) — the standard precision "
    "play, since the two families fail on DIFFERENT perturbations "
    "(dHash flips under brightness/noise, pHash under local texture "
    "swaps), so a pair both confirm is near-certain. Both hash builds "
    "share the one decoded-raster pass upstream; the consensus itself "
    "is an equi-join of two already-candidate-sized pair sets — at "
    "100 TB its cost is the two band joins the individual families "
    "already pay, plus epsilon.",
)
def mm_phash_dhash_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        attach_binary,
        dhash_neardup_pairs,
        image_dhash,
        image_phash_dct,
        phash_neardup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 128)
    pgm = docs.select(
        "doc_id",
        F.concat(F.lit("P5\n16 8\n255\n"), F.substring("text", 1, 128)).alias(
            "payload"
        ),
    )
    media = attach_binary(pgm, "doc_id", "payload", "image")
    dp = dhash_neardup_pairs(image_dhash(media), max_hamming=6).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("d_hamming")
    )
    pp = phash_neardup_pairs(image_phash_dct(media), max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").alias("p_hamming")
    )
    return pp.join(dp, ["id_a", "id_b"]).select(
        "id_a", "id_b", "d_hamming", "p_hamming"
    )

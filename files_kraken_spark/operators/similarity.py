"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (per-query candidate
scan); the LSH-bucketed variant is the scale path — random-hyperplane
signatures shrink the candidate set so the pairwise work is per-bucket,
not O(n²). Both are pure Catalyst higher-order-function pipelines (no
UDF, no Python crossing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, hyperplane_sig

# Fixed pseudo-random hyperplanes (LCG, seed=7) for deterministic LSH
# signatures; regenerate with more planes for tighter buckets.
def _planes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    out, x = [], seed
    vals = []
    for _ in range(n_planes * dim):
        x = (1_103_515_245 * x + 12_345) % (2**31)
        vals.append((x / (2**31)) * 2.0 - 1.0)
    for i in range(n_planes):
        out.append(vals[i * dim : (i + 1) * dim])
    return out


def cosine_topk(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the
    candidate corpus, rank per query. The corpus side never shuffles
    until the per-query top-k aggregation — with a broadcast query set
    this is a single scan + partial top-k (window on q_id)."""
    from pyspark.sql.window import Window

    q = queries_df.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates_df.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("cand_id"))
        .select("q_id", "cand_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "cand_id")
    )


def cosine_pairs_above(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup).

    This exact form is O(n²)/cross-join — correct baseline for
    verification. Production path at scale: ``lsh_topk`` buckets below.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("v_a"), F.col("v_b")) >= threshold)
        .select("id_a", "id_b")
    )


def lsh_bucketed_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    threshold: float = 0.45,
) -> DataFrame:
    """Approximate near-dup pairs: random-hyperplane LSH buckets, then
    exact cosine verify within buckets only. The join key is the
    signature → work is per-bucket (expected n²/2^planes)."""
    planes = _planes(n_planes, dim)
    sig = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_sig(F.col(vec_col), planes).alias("sig"),
    )
    a = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "sig")
    b = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "sig")
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("v_a"), F.col("v_b")) >= threshold)
        .select("id_a", "id_b")
    )

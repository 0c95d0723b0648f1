"""Runnable tour of the embedding-side operators: k-means training →
trained-IVF nearest-neighbor search → semantic dedup (SemDeDup), plus
the fitting-free hyperplane variants for comparison.

    python examples/ann_semdedup_example.py [sf_dir]

(defaults to /root/testdata/sf0.001; finishes in ~60s on local[*])
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from files_kraken_spark.operators.similarity import (
    cosine_topk,
    ivf_topk_trained,
    kmeans_fit_predict,
    semdedup,
    semdedup_kmeans,
)
from files_kraken_spark.session import get_session
from files_kraken_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("ann-semdedup-example")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")

    print("== 1. train an IVF coarse quantizer (Lloyd's k-means)")
    cells = kmeans_fit_predict(emb, k=8, iters=2)
    cells.groupBy("cell").count().orderBy("cell").show()

    print("== 2. ANN: trained-IVF probe vs exact top-k (recall check)")
    queries = emb.filter(F.col("vec_id") < 8).select("vec_id")
    approx = ivf_topk_trained(emb, queries, k=8, iters=2, topk=5)
    exact = cosine_topk(emb.join(queries, "vec_id"), emb, k=5)
    hits = approx.intersect(exact.select("q_id", "cand_id")).count()
    total = exact.count()
    print(f"   IVF recall@5: {hits}/{total} = {hits / max(total, 1):.2f}")

    print("== 3. semantic dedup: hyperplane cells vs k-means cells")
    by_planes = semdedup(emb, n_planes=5, threshold=0.40)
    by_kmeans = semdedup_kmeans(emb, k=8, iters=2, threshold=0.40)
    for name, out in [("hyperplane", by_planes), ("kmeans", by_kmeans)]:
        dropped = out.filter(~F.col("kept")).count()
        print(f"   {name:10s}: dropped {dropped} of {out.count()} vectors")


if __name__ == "__main__":
    main()

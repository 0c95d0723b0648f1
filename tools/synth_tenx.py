"""Synthesize the 10x scale-sweep corpus (rounds 10-12 methodology,
persisted in-repo so the recipe stops living in /tmp between rounds).

    python tools/synth_tenx.py [src_sf_dir] [out_dir]

Defaults: /root/testdata/sf0.1 -> /tmp/sf1x10. Writes documents,
lineitem, orders, embeddings, events — every table the registry's
expensive families read.

Recipe (id-offset union of ten copies, all offsets divisible by 10 so
`% 10` train/batch splits survive):

- documents: doc_id += 10M per copy; copies >0 get every 4th token a
  copy-distinct suffix (Jaccard(orig, copy) ~ 0.14 — near-dup density
  stays realistic instead of ten exact clones collapsing dedup).
- lineitem/orders: orderkey += 100M, suppkey/custkey += 1M, AND
  l_partkey += 10M per copy (round-12 fix: without the partkey offset
  the ten copies overlay the SAME parts co-purchase graph, so a
  parts-graph "10x" point measures 10x scan over 1x graph).
- embeddings: vec_id += 10M per copy; copies >0 get a deterministic
  ~1% per-(copy, dim, vec) jitter so k-means cells don't collapse
  onto ten identical codebooks.
- events: event_id += 100M, user_id += 1M per copy; timestamps kept,
  so the stream is 10x denser over the same span with 10x session
  keys (the shape a bigger deployment actually has).

Deterministic end to end — re-running reproduces the corpus bit-wise
(modulo parquet file layout), so sweep numbers are comparable across
rounds.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from files_kraken_spark.session import get_session
from files_kraken_spark.sources.tables import load_table

COPIES = 10


def _union(parts):
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x10"
    shutil.rmtree(out, ignore_errors=True)

    spark = get_session("synth-tenx")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, src, "documents")
    parts = []
    for c in range(COPIES):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * 10_000_000))
        if c > 0:
            toks = F.split(F.trim(F.col("text")), r"\s+")
            perturbed = F.array_join(
                F.transform(
                    toks,
                    lambda t, i: F.when(
                        i % 4 == 0, F.concat(t, F.lit(f"_c{c}"))
                    ).otherwise(t),
                ),
                " ",
            )
            d = d.withColumn("text", perturbed).withColumn(
                "n_chars", F.length("text")
            )
        parts.append(d)
    _union(parts).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    li = load_table(spark, src, "lineitem")
    _union(
        [
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(c * 100_000_000)
            )
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(c * 1_000_000))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(c * 10_000_000))
            for c in range(COPIES)
        ]
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    orders = load_table(spark, src, "orders")
    _union(
        [
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(c * 100_000_000)
            ).withColumn("o_custkey", F.col("o_custkey") + F.lit(c * 1_000_000))
            for c in range(COPIES)
        ]
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    # supplier: suppkey offset matches lineitem's l_suppkey; nationkey
    # KEPT — nations stay 25, so nation-grain views (v_ivm2_*) see 10x
    # facts over the same dimension groups, the realistic dim shape
    supp = load_table(spark, src, "supplier")
    _union(
        [
            supp.withColumn("s_suppkey", F.col("s_suppkey") + F.lit(c * 1_000_000))
            for c in range(COPIES)
        ]
    ).write.mode("overwrite").parquet(f"{out}/supplier.parquet")

    emb = load_table(spark, src, "embeddings")
    parts = []
    for c in range(COPIES):
        d = emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * 10_000_000))
        if c > 0:
            d = d.withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, i) -> CAST(x + 0.01 * "
                    f"(((vec_id + i * 31 + {c * 7}) % 11) - 5) AS FLOAT))"
                ),
            )
        parts.append(d)
    _union(parts).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # events copied at the RAW schema (ts physical type varies by
    # corpus generation; load_table normalizes on read, so the sweep
    # corpus must keep the raw column for load_table to re-normalize)
    ev = spark.read.parquet(f"{src}/events.parquet")
    _union(
        [
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(c * 100_000_000)
            ).withColumn("user_id", F.col("user_id") + F.lit(c * 1_000_000))
            for c in range(COPIES)
        ]
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    for t in ("documents", "lineitem", "orders", "supplier", "embeddings", "events"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()

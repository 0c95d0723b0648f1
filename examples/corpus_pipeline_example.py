"""Runnable tour of the training-data pipeline operators over the
synthetic corpus: quality rules → dedup → contamination check →
temperature resampling → BPE tokenizer training + tokenization →
chunking → weighted sampling → sequence packing → expectations
report.

    python examples/corpus_pipeline_example.py [sf_dir]

(defaults to /root/testdata/sf0.001; finishes in ~30s on local[*])
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from files_kraken_spark.operators import corpus as C
from files_kraken_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from files_kraken_spark.session import get_session
from files_kraken_spark.sources.tables import load_table
from files_kraken_spark.validate import in_range, not_null, run_checks, unique


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("corpus-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    print("== 1. quality rules")
    rules = C.quality_rules(docs, "doc_id", "text")
    rules.groupBy("keep").count().show()
    kept = docs.join(rules.filter(F.col("keep")).select("doc_id"), "doc_id")

    print("== 2. exact + near dedup")
    reps = exact_dedup(kept, "doc_id", "text")
    print(f"   {kept.count()} kept docs → {reps.count()} distinct texts")
    pairs = minhash_lsh_pairs(kept, "doc_id", "text", threshold=0.8)
    print(f"   near-dup pairs ≥0.8: {pairs.count()}")

    print("== 3. contamination check (src0-9 = train, src10+ = eval)")
    src_num = F.substring(F.col("source"), 4, 10).cast("int")
    leaks = C.contamination_pairs(
        kept.filter(src_num < 10), kept.filter(src_num >= 10), "doc_id", "text"
    )
    leaks.orderBy(F.col("n_shared").desc()).show(5)

    print("== 4a. temperature resample (α=0.5 source rebalancing)")
    C.temperature_resample(kept, "source", "doc_id", target_total=5000).orderBy(
        F.col("n_docs").desc()
    ).show(5)

    print("== 4b. BPE: train 8 merges on the corpus, tokenize with them")
    merges = C.bpe_train(kept, "doc_id", "text", merges=8)
    merges.orderBy("rank").show(8, truncate=False)
    per_doc = C.bpe_apply(kept, merges, "doc_id", "text")
    per_doc.agg(
        F.sum("n_bpe_tokens").alias("bpe_tokens_total"),
        F.round(F.avg("n_bpe_tokens"), 1).alias("avg_per_doc"),
    ).show()

    print("== 4c. chunk into 64-token windows (16 overlap)")
    chunks = C.chunk_documents(kept, "doc_id", "text", chunk_tokens=64, overlap=16)
    chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.round(F.avg("n_tokens"), 1).alias("avg_chunk_tokens"),
    ).show()

    print("== 4d. weighted sample (3 per source, weight = n_chars)")
    C.weighted_sample_topk(kept, "doc_id", "n_chars", k=3, stratum_col="source").select(
        "source", "doc_id", "n_chars"
    ).orderBy("source", "doc_id").show(9)

    print("== 5. pack into 256-token bins")
    packed = C.pack_sequences(kept, "doc_id", "text", budget=256, group_col="source")
    packed.groupBy("source").agg(
        F.max("bin").alias("bins"), F.sum("n_tokens").alias("tokens")
    ).orderBy("source").show(5)

    print("== 6. expectations report")
    run_checks(
        docs,
        [not_null("text"), in_range("n_chars", 1, 10_000), unique(["doc_id"])],
    ).show(truncate=False)


if __name__ == "__main__":
    main()

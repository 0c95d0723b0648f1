"""Consistency pins for the round-10 composite curation pipeline:
the fused funnel must agree stage-by-stage with the three
individually-registered queries it composes (dedup_exact,
t_quality_logistic, t_stratified_sample_hash)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_curation_pipeline_agrees_with_stage_queries(spark):
    from files_kraken_spark.queries.curation import (
        t_curation_funnel,
        t_curation_pipeline,
    )
    from files_kraken_spark.queries.llm_ops import (
        dedup_exact,
        t_quality_logistic,
    )

    kept = t_curation_pipeline(spark, SF).collect()
    assert kept  # the funnel keeps a real corpus

    rep_ids = {r["rep_id"] for r in dedup_exact(spark, SF).collect()}
    quality = {
        r["doc_id"]: (r["keep"], r["quality_prob"])
        for r in t_quality_logistic(spark, SF).collect()
    }
    for r in kept:
        # every survivor is a dedup representative...
        assert r["doc_id"] in rep_ids
        # ...passed the same logistic gate with the same rounded prob
        k, prob = quality[r["doc_id"]]
        assert k is True
        assert r["quality_prob"] == prob

    funnel = {r["source"]: r for r in t_curation_funnel(spark, SF).collect()}
    # funnel output == pipeline output, aggregated
    assert sum(f["n_sampled"] for f in funnel.values()) == len(kept)
    # stage monotonicity per source: raw >= unique >= quality >= sampled
    for f in funnel.values():
        assert f["n_raw"] >= f["n_unique"] >= f["n_quality"] >= f["n_sampled"]
    # dedup stage parity: per-source rep counts match dedup_exact's reps
    from files_kraken_spark.sources.tables import load_table

    docs = {r["doc_id"]: r["source"] for r in
            load_table(spark, SF, "documents").select("doc_id", "source").collect()}
    per_src_reps: dict = {}
    for rid in rep_ids:
        per_src_reps[docs[rid]] = per_src_reps.get(docs[rid], 0) + 1
    assert {s: f["n_unique"] for s, f in funnel.items()} == per_src_reps


def test_hist_quantile_sketch_bins_merge_by_addition(spark):
    """The property that makes the histogram sketch the scale path:
    bin vectors of disjoint subsets SUM to the bin vector of the
    union (given shared mn/mx), so partial histograms merge across
    partitions/batches with no re-scan. Rebuilt here from the query's
    own integerization and bin math."""
    from pyspark.sql import functions as F

    from files_kraken_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("c"),
        (F.col("l_orderkey") % 2).alias("half"),
    )
    st = v.groupBy("flag").agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    b = v.join(F.broadcast(st), "flag").select(
        "flag", "half", F.expr("((c - mn) * 64) div (mx - mn + 1)").alias("bin")
    )
    whole = {
        (r["flag"], r["bin"]): r["cnt"]
        for r in b.groupBy("flag", "bin").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    parts = b.groupBy("flag", "half", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    summed: dict = {}
    for r in parts.collect():
        k = (r["flag"], r["bin"])
        summed[k] = summed.get(k, 0) + r["cnt"]
    assert summed == whole and len(whole) > 64  # real multi-bin histograms

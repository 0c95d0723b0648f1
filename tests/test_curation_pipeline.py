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

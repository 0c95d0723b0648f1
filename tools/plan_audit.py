"""Physical-plan audit over the whole query registry.

Greps every query's executed plan for scale red flags:

- parquet scans with NO pushed filters when the query clearly filters
- CartesianProduct / BroadcastNestedLoopJoin (quadratic joins)
- row-at-a-time PythonUDF in the plan (should be ArrowEvalPython)
- full-column ReadSchema (missing column pruning) on wide tables

Usage: python tools/plan_audit.py [sf_dir]
Exit 1 if any hard red flag (cartesian/row-python-udf) appears.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from files_kraken_spark.queries import REGISTRY
from files_kraken_spark.session import get_session

# Queries where a nested-loop/cartesian shape is the declared intent
# (exact all-pairs baselines, tiny dim grids) — documented, not flags.
ALLOWED_NESTED_LOOP = {
    "sim_cosine_topk",  # broadcast query set vs corpus: O(n·q) by design
    "sim_knn_classify",  # same broadcast-query-set scan as cosine_topk
    "q_cross_join_dims",  # 5×3 dim grid
    "dedup_embedding_cosine",  # block-pair grid join (bounded fanout)
    "q_scalar_subquery",  # scalar subquery broadcast compare
    "q_not_in_null_semantics",  # NOT IN decorrelation uses BNLJ by spec
    "q_correlated_min",  # scalar-subquery equality: Catalyst picks BNLJ fallback
    "q22_global_sales_opportunity",  # 1-row avg-balance threshold broadcast
    "q11_important_stock",  # 1-row value threshold broadcast
    "t_tfidf_top_terms",  # 1-row corpus-size broadcast
    "q_mutual_info_terms",  # 1-row corpus-total broadcast vs per-(term,source) stats
    "t_udf_isolation_score",  # two 1-row stats broadcasts (medians, MADs) vs corpus
    "emb_top_pc_power",  # 1-row max-abs renorm scalar broadcast per iteration
    "emb_kmeans_cells",  # k-centroid broadcast × corpus argmin: Lloyd's IS a nested loop
    "sem_dedup_kmeans",  # same trainer underneath
    "sim_ivf_trained_topk",  # k-centroid probe broadcast
    "sim_pq_topk",  # m·ksub ADC LUT broadcast × code scan
    "sim_pq_rerank",  # same ADC stage + per-shortlist probe
    "sim_ivfpq_topk",  # centroid probe + ADC LUT broadcasts
    "sim_ivfpq_residual_topk",  # same probe + per-(q,cell) residual LUT broadcast
    "sim_ivfadc_rerank",  # same residual probe/LUT broadcasts + shortlist rerank
    "t_temperature_resample",  # 1-row weight-total broadcast vs per-source counts
    "t_bpe_tokenize_trained",  # 1-row merge-winner / merge-list broadcasts
    "q_bloom_filter",  # 1-row bitmap broadcast vs probe side
    "q_decay_topk",  # 1-row max-day anchor broadcast vs event stream
    "emb_pc_outliers",  # inherits emb_top_pc_power's 1-row renorm broadcast
    "t_unigram_logprob",  # 1-row corpus-token-total broadcast
    "t_kn_bigram_logprob",  # 1-row bigram-type-total broadcast
    "sim_mips_norm_trick",  # 1-row max-norm broadcast + broadcast query set (cosine_topk shape)
    "t_perplexity_buckets",  # 1-row corpus-token-total broadcast (unigram-LM stage)
    "q_holt_linear",  # 1-row max-hour anchor broadcast (decay_topk shape)
    "emb_sign_hamming_topk",  # broadcast query signatures vs corpus (cosine_topk shape)
    "t_vocab_coverage_curve",  # 1-row totals broadcast vs 1-row coverage sums
    "t_js_divergence",  # 1-row corpus-token-total broadcast (unigram-LM shape)
    "emb_dim_fidelity",  # broadcast query set vs corpus, both rankings (cosine_topk shape)
    "t_lsh_recall_audit",  # three 1-row count aggregates joined scalar-wise
    # round-5 departitioned global windows: the BNLJ sides are a 1-row
    # total count (ntile / percent_rank arithmetic) or a tiny
    # distinct-value / per-day frame (dense_rank grid, 30-day range
    # join) — the trade that REMOVED the single-task WindowExec stage
    "q_ntile_rank_frames",  # 1-row count broadcast for ntile arithmetic
    "q_distribution_windows",  # 1-row count broadcast for pr/cd arithmetic
    "q_range_frame_rolling",  # per-day frame range-joined within 30-day lookback
    "d2_ordered_changes",  # u² distinct-priority grid (u ≈ 5)
    "q_market_basket_lift",  # 1-row basket-total broadcast for the lift denominator
    "sim_hybrid_rrf",  # 1-row query-embedding broadcast vs corpus scan
    "t_bm25_topk",  # 1-row corpus-stats broadcast (N, avgdl, dfs)
    "q_benford_first_digit",  # 1-row total-count broadcast vs 9-digit groups
    "q_rfm_segmentation",  # 1-row anchor-date + 1-row quartile-threshold broadcasts
    "q_abc_analysis",  # 1-row revenue-total broadcast vs ranked parts
    "q_cusum_changepoint",  # 1-row (total, n-hours) broadcast vs hourly series
    "q_clustering_coefficient",  # three 1-row aggregates joined scalar-wise
    "t_ndcg_sign_bits",  # broadcast query set (float + signature scans) + 1-row IDCG constant
    "q_peak_concurrency",  # 1-row session-count broadcast vs sweep frame
    "q_dow_seasonality",  # 1-row total broadcast vs 7-group frame
    "emb_label_balance",  # 1-row totals broadcast vs k-label frame
    "q_xmr_control_limits",  # three 1-row aggregates + limits broadcast vs day frame
    "t_doc_keywords",  # 1-row corpus-size broadcast (tfidf_top_terms shape)
    "t_hard_negative_mining",  # broadcast query set vs corpus (cosine_topk shape)
    "t_psi_drift",  # two 1-row totals broadcasts vs bounded-bucket frame
    "t_corpus_stopwords",  # 1-row corpus-size broadcast vs 20-term frame
    "q_markov_attribution",  # 1-row chain results / totals joined scalar-wise
    "emb_ivf_recall_audit",  # inherits ivf probe + cosine_topk broadcast shapes
    "t_heaps_law_fit",  # broadcast 5-row checkpoint grid + 1-row slope broadcast
    "t_filter_threshold_sweep",  # broadcast 5-row threshold grid + 1-row totals
    "emb_kmeans_silhouette",  # k-centroid broadcast x corpus (kmeans trainer shape)
    "q_churn_hazard_curve",  # 1-row max-month broadcast vs monthly frame
    "t_waterfill_source_caps",  # 1-row totals / cap broadcasts vs k-source frame
    "q_lorenz_deciles",  # 1-row (n, tot) broadcast for ntile arithmetic
    "t_hill_tail_index",  # 1-row x_(k+1) threshold broadcast vs 100-row top-k
    "q_abc_migration",  # 1-row midpoint-month broadcast vs fact scan
    "t_bootstrap_mean_ci",  # 32-replicate broadcast grid + 1-row full-mean broadcast
    "q_theil_index",  # 1-row (n, total) mean broadcast vs customer frame
    "t_lsh_band_sweep",  # three (1-row candidate, 1-row verified) counts joined scalar-wise
    "q_ks_two_sample",  # 1-row (n1, n2) broadcast vs value-group CDF frame
    "q_cramers_v",  # 1-row total / dims broadcasts vs bounded cell frame
    "t_effective_sources",  # 1-row token-total broadcast vs k-source frame
    "emb_pca_explained_variance",  # inherits the power-iteration 1-row renorm broadcasts
    "q_weighted_median_price",  # 1-row total-weight broadcast vs value-group frame
    "q_seasonal_strength",  # 1-row between-group variance broadcast vs totals
    "t_est_jaccard_histogram",  # 1-row pair-total broadcast vs 17-bucket frame
    "q_neyman_allocation",  # 1-row weight-total broadcast vs 5-stratum frame
    "q_theil_sen_trend",  # month-pair inequality join: both sides calendar-bounded (~82 rows)
    "t_capture_recapture_vocab",  # two 1-row capture aggregates joined scalar-wise
    "t_facility_location_select",  # bounded 50x50 candidate-pool similarity grid
    "t_mmr_rerank",  # 1-row query broadcast + bounded 20x20 pool grid
    "q_kneedle_adoption",  # three 1-row endpoint broadcasts vs month frame
    "t_rbo_rankings",  # broadcast query/signature scans + 10-row depth grid
    "q_acf_daily",  # broadcast 7-row lag grid vs daily frame
    "q_null_pattern_profile",  # 1-row total broadcast vs bounded-pattern frame
}

WIDE_TABLES = {"lineitem": 11, "orders": 6, "part": 6}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    hard, soft = [], []
    for name, spec in REGISTRY.items():
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:
            hard.append((name, f"plan failed: {str(e)[:120]}"))
            continue
        if "CartesianProduct" in plan and name not in ALLOWED_NESTED_LOOP:
            hard.append((name, "CartesianProduct join"))
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOWED_NESTED_LOOP:
            hard.append((name, "BroadcastNestedLoopJoin"))
        # row-at-a-time Python UDF: BatchEvalPython (Arrow path shows ArrowEvalPython)
        if "BatchEvalPython" in plan:
            hard.append((name, "row-at-a-time Python UDF (BatchEvalPython)"))
        # column pruning: flag scans of wide tables reading all columns.
        # Pair each scan's Location with ITS ReadSchema (the formatted
        # plan lists them within one scan-node block) — matching any
        # scan's width against any table in the plan false-positives.
        for scan in re.finditer(
            r"Location:[^\n]*/(\w+)\.parquet[^\n]*\n(?:[^\n]*\n)*?"
            r"ReadSchema: struct<([^>]*)>",
            plan,
        ):
            t, ncols = scan.group(1), scan.group(2).count(":")
            if WIDE_TABLES.get(t, 99) <= ncols:
                soft.append((name, f"{t} scan reads all {ncols} columns"))
                break
    for name, msg in hard:
        print(f"HARD {name}: {msg}")
    seen = set()
    for name, msg in soft:
        if name not in seen:
            seen.add(name)
            print(f"soft {name}: {msg}")
    print(f"\n{len(hard)} hard flags, {len(seen)} soft flags over {len(REGISTRY)} queries")
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Whole-registry physical-plan audit (SURVEY.md §5.5) — a ratchet
against scale-killing plan shapes sneaking into ANY registered query.

Three smells are swept across every registered plan at once:

- ``Exchange SinglePartition`` — every row of the input stream meets at
  ONE task. Fine when the input is bounded by construction (a scalar
  aggregate's partials, the 16-row per-partition-count frame of the
  two-phase global rank, a capped candidate limit); fatal when it is
  data-proportional (a partition-less window / global sort over table
  rows — the round-1 `win_ntile` bug, and the vocabulary-rank window
  that ran FOUR single-partition sorts inside `dedup_near_jaccard`
  until round 2).
- ``CartesianProduct`` — O(n·m) row explosion.
- ``BroadcastNestedLoopJoin`` — per-row scan of the broadcast side;
  sane only when the broadcast side is constant-sized.

The whitelist below is exhaustive and commented: a new query (or a
Catalyst/AQE change) that introduces any occurrence outside it fails
this test and must either fix the plan or consciously document the
bound here.
"""

from __future__ import annotations

from splio_etl_aggregations_spark.plans.checks import explain_str
from splio_etl_aggregations_spark.registry import all_queries

from .conftest import SF_SMALL

# name -> (max occurrences, why the exchange input is bounded).
# Counts for queries with cached subtrees vary with session cache state
# (a materialized InMemoryRelation prints its stored plan too) — caps
# are the worst case observed across fresh and warmed sessions.
SINGLE_PARTITION_OK = {
    # final merge of a global (no-group-key) aggregate: input rows are
    # one partial-agg row per upstream partition
    "agg_global": (1, "global agg partials"),
    # r8 second wave: sufficient-statistics / gradient folds — each
    # SinglePartition merge's input is one partial-agg row per upstream
    # partition (the whole point of the one-pass design)
    "ml_ols_multifeature": (1, "10-sum sufficient-stats fold"),
    "ml_logistic_regression_gd": (4, "per-GD-step gradient folds"),
    # corpus N/avgdl scalar fold: input is one partial row per
    # upstream partition of the per-doc length frame
    "text_bm25_search": (1, "scalar N/avgdl fold"),
    # directed-edge-count scalar fold (2m)
    "graph_modularity_communities": (1, "scalar 2m fold"),
    # weight-total scalar fold over the |sources|-row frame
    "corpus_temperature_mix": (1, "scalar weight-total fold"),
    # cross-segment moment fold over the |nations|-row rate frame
    "agg_empirical_bayes_shrinkage": (1, "scalar prior-moment fold"),
    # population-total fold (|strata|-row input) + final audit fold
    "sample_stratified_proportional": (2, "scalar stratum-total folds"),
    # five-co-moment scalar fold over the edge list
    "graph_degree_assortativity": (1, "scalar co-moment fold"),
    # basket-sum scalar fold over the |parts|-row both-years frame
    "agg_price_index_laspeyres": (1, "scalar basket fold"),
    # 2-row segment-fit frame folds
    "ts_interrupted_series": (2, "2-row segment-fit folds"),
    "funnel_conversion": (3, "three scalar step-count aggs"),
    "dq_constraint_report": (6, "six scalar audit counts"),
    "dq_profile": (2, "per-column scalar profile aggs"),
    "dq_freshness_report": (3, "per-table scalar freshness aggs"),
    "scan_csv_malformed_permissive": (1, "scalar good/corrupt counts"),
    "funnel_time_to_convert": (1, "scalar latency-percentile fold"),
    "lake_time_travel_read": (2, "two scalar per-version folds"),
    # r9: the 'none'-baseline ride-along — a partition-less window over
    # the 5-row (one per removal scenario) absorption frame, replacing
    # the build-time localCheckpoint + self cross-join
    "attribution_markov_removal": (1, "5-row scenario baseline window"),
    # the injected runtime bloom filter folds the dim's keys into ONE
    # O(bits) aggregate value — its final merge is a scalar fold by
    # construction (input = one partial bloom per creation-side partition)
    "join_bloom_prune": (1, "bloom_filter_agg scalar merge"),
    # r9 CC contraction: the keeper join's creation side (checkpointed
    # labels, exact small stats) now qualifies for Spark's automatic
    # runtime bloom filter — same scalar partial-bloom merge as above
    "pipeline_clean_corpus": (1, "bloom_filter_agg scalar merge"),
    "text_tfidf": (1, "scalar corpus-size N"),
    "corpus_lm_quality": (1, "scalar corpus-token-total agg"),
    # two-phase global rank: the only partition-less window runs over
    # the n_parts-row per-partition-count frame (≤16 rows)
    "win_ntile": (1, "rank offsets frame (≤16 rows)"),
    "win_percent_cume": (1, "rank offsets frame (≤16 rows)"),
    "win_global_rank_scalable": (1, "rank offsets frame (≤16 rows)"),
    "sample_systematic_every_nth": (1, "rank offsets frame (≤16 rows)"),
    # two-phase rank offsets frame + scalar total-rev agg + 10-row
    # decile cum-share window — all bounded by construction
    "pareto_revenue_deciles": (3, "offsets frame + scalar total + 10-row deciles"),
    "agg_gini_revenue": (3, "offsets frame + scalar total + scalar gini fold"),
    # sweep offsets frame (≤16 rows) + scalar peak agg + scalar counts agg
    "ts_peak_concurrency": (3, "sweep offsets frame + two scalar folds"),
    # |brands|-bounded graph: three scalar aggs (nodes/edges/triangles)
    "graph_triangle_count": (3, "bounded-graph scalar aggs"),
    # three FK audits × (orphan count + row count) scalar aggregates
    "dq_fk_orphans": (6, "per-FK scalar audit counts"),
    # four FD rules × one 1-row summary fold of a per-key distinct agg
    "dq_functional_dependency": (4, "per-FD-rule scalar summary folds"),
    # running sum over the <=|days| daily frame (30 rows)
    "agg_cumulative_unique_users": (1, "daily frame (≤|days| rows)"),
    # rolling corr over the same calendar-bounded daily frame
    "ts_rolling_corr": (1, "daily frame (≤|days| rows)"),
    # centered 7-obs trend window over the one-row-per-day frame —
    # calendar-bounded like every other daily-frame shape
    "ts_stl_decompose": (1, "daily frame (≤|days| rows)"),
    # two-phase exclusive cummax: the only partition-less window runs
    # over the 16-row per-partition-max offsets frame (cumsum skeleton)
    "sort_skyline_pareto": (1, "cummax offsets frame (≤16 rows)"),
    # 1-row event/nonevent totals frame cross-joined back
    "ml_woe_iv": (1, "scalar totals frame"),
    # 1-row base-rate frame cross-joined onto the binned projection
    "ml_calibration_bins": (1, "scalar base-rate frame"),
    # 1-row corpus-token-total folded into the vocabulary-bounded model
    "corpus_bigram_perplexity": (1, "scalar token-total agg"),
    # 1-row global (N, mu) frame cross-joined onto the |segments| report
    "agg_theil_decomposition": (1, "scalar N/mu totals frame"),
    # one 66-column scalar fold (all 32 resamples in one pass), then the
    # 32-row bootstrap-mean frame folds to the 1-row CI
    "ml_bootstrap_ci_hash": (1, "scalar resample fold (32-row frame)"),
    # r8 single-superset verify: one global 6-counter fold replaces the
    # r7 groupBy(config) (3-row) final agg; the fold's input is the
    # per-partition partial aggregates, the SinglePartition stage sees
    # ~32 rows
    "dedup_lsh_band_sweep": (1, "scalar 6-counter fold (explodes to 3 rows)"),
    # -- round-8 additions: every entry is a scalar (1-row) fold or a
    # frame bounded by a fixed grid, never data-proportional --
    "ml_chi2_feature_selection": (1, "scalar N/E corpus-totals fold"),
    "ml_naive_bayes_classifier": (3, "scalar vocab + alldocs folds (re-expanded)"),
    "ml_learning_curve_subsets": (1, "scalar full-corpus 6-counter fold"),
    "join_range_bucketed": (1, "scalar min-ts anchor fold"),
    "etl_bitemporal_snapshot": (2, "scalar anchor + (T1,T2) params folds"),
    "agg_sequential_patterns": (1, "scalar pair-total fold (≤25-row input)"),
    "ml_permutation_importance": (1, "scalar 5-counter accuracy fold"),
    # |sources|-row src_idx window + 1-row n_src fold, both dim-bounded
    "corpus_interleave_sources_round_robin": (2, "|sources|-row index frames"),
    # rank offsets frame (≤16 rows) + final 1-row conditional-share fold
    "agg_whale_curve_topshares": (2, "offsets frame + scalar share fold"),
    # 1-row p99-norm percentile frame cross-joined back onto norms
    "vec_norm_quantile_clip": (1, "scalar p99 percentile frame"),
    # grand-total window over the |nations|-row contribution grid
    "agg_percent_of_total_multi_level": (1, "|nations|-row grid total"),
    # variance-share/rank windows over the d-row (64) dimension frame
    "vec_subspace_variance": (1, "d-row dimension frame"),
    # 1-row (corpus total, sqrt normalizer) frame onto |sources| rows
    "corpus_epoch_repeat_schedule": (1, "scalar budget/normalizer frame"),
    # 1-row brand-catalog-size frame onto the incidence grid
    "agg_assortment_penetration": (1, "scalar catalog-size frame"),
    # cumsum offsets frame + 1-row (n1, n2) totals fold (AUC shape)
    "agg_mann_whitney_u": (2, "offsets frame + scalar totals fold"),
    # two cumsum offsets frames (rank maps) + final 1-row corr fold
    # r4: 50-row quantity-domain rank window + price offsets frame +
    # scalar corr fold
    "agg_spearman_corr": (3, "bounded q-rank window + offsets + corr fold"),
    # 16-row per-partition-max boundary frame + final 1-row audit fold
    "dq_monotonic_id_gap_check": (2, "boundary frame + scalar audit fold"),
    # Catalyst re-expands the shared rank subtree once per use
    "dedup_near_jaccard": (4, "rank offsets frame ×4 re-expansions"),
    # same two-phase-rank subtree since the r6 rewrite routed the
    # bigram op through _ranked_sets; the single-partition frame is the
    # shingle-VOCABULARY-sized boundary-offsets table, never doc rows
    "dedup_ngram_jaccard": (4, "rank offsets frame ×4 re-expansions"),
    # r8 optimization round: the mask-verify vocab rank is a
    # single-partition row_number over the ≤4096-row (by the
    # _MASK_VOCAB_MAX guard) gram vocabulary, re-expanded once per
    # broadcast verify side — bounded by construction, never doc rows
    "dedup_near_minhash": (2, "≤4096-row vocab rank ×2 verify sides"),
    # intermediate GlobalLimit of the probe cut; budget is capped at
    # an absolute 100k rows (vectors.py) regardless of corpus size
    "sim_ann_lsh_knn": (1, "capped probe-budget limit"),
    # the probe-all CORRECTNESS variant deliberately sets budget = n so
    # the budget cut reduces to exact brute force — an oracle-pinning
    # shape run at fixture scale only, never the production path (the
    # budgeted op above is the scale path, cap 100k absolute)
    "sim_ann_lsh_knn_probeall": (1, "probe-all correctness variant"),
    # 1-row reference-timestamp scalar aggregate (text_tfidf shape)
    "agg_decay_weighted": (1, "scalar max-ts agg"),
    # TPC-H completion wave: each is the 1-row merge of a scalar
    # aggregate (Q17/Q19 final revenue fold; Q22's uncorrelated AVG
    # threshold; Q11's fraction-of-total SUM subquery) — input is one
    # partial-agg row per upstream partition, never table rows
    "sql_small_quantity_revenue": (1, "scalar revenue fold"),
    "sql_disjunctive_revenue": (1, "scalar revenue fold"),
    "sql_sales_opportunity": (1, "scalar AVG-threshold subquery"),
    # r4: two scalar subqueries (COUNT + SUM over the CTE) — the
    # 2×-mean data-relative threshold
    "sql_important_parts": (2, "scalar count+total subqueries"),
    # two-phase cumulative sum: the only partition-less window runs over
    # the 16-row per-partition-total frame (win_ntile shape)
    "corpus_pack_sequences": (1, "pack offsets frame (≤16 rows)"),
    "corpus_subsample_tokens": (1, "budget offsets frame (≤16 rows)"),
    # scalar MIN over the |lang|-row counts frame; Catalyst re-expands
    # the shared rates subtree once per use (rates ∪ kept branches)
    "corpus_mix_rebalance": (2, "|lang|-row min-target agg ×2 re-expansions"),
    "pipeline_training_set": (1, "|lang|-row min-target agg"),
    "basket_brand_affinity": (1, "scalar n_orders agg"),
    # 10-row bucket grid folded to the 1-row totals frame
    "dq_psi_drift": (1, "10-row grid totals agg"),
    # 1-row global-prior (mean target) aggregate
    "ml_target_encoding": (1, "scalar prior agg"),
    # three global sketch folds, each over ≤256 register rows
    "agg_hll_set_algebra": (3, "≤256-row register folds ×3"),
    # one global fold of the per-doc flag matrix to a 1-row sum frame
    "corpus_quality_ablation": (1, "scalar flag-sum fold"),
    # cumsum offsets frame (≤16 rows) + scalar totals/max/argmax folds,
    # all downstream of the checkpointed |values| frame
    "dq_ks_drift": (4, "offsets frame + three scalar folds"),
    # scalar folds over the checkpointed 25-row contingency table
    "dq_chi2_independence": (4, "contingency-table scalar folds"),
    # rank offsets frame (≤16 rows) + the final scalar REGR fold
    "text_zipf_fit": (2, "offsets frame + scalar regression fold"),
    # scalar aggregate merges (Q6 / Q14 shapes: 1-row answers)
    "sql_forecast_revenue": (1, "scalar revenue fold"),
    "sql_promo_revenue": (1, "scalar ratio fold"),
    # the scalar MAX(total_rev) subquery's 1-row fold (Q15 shape)
    "sql_top_supplier": (1, "scalar max-revenue subquery fold"),
    # rank offsets frame (≤16 rows) inside the cached token-set subtree;
    # the count depends on whether the inner pid cache is already
    # materialized when explained (1 fresh session, 2 after a prior run)
    "dedup_containment": (2, "offsets frame in cached rank subtree"),
    # |brands|-bounded: the scalar node-count fold appears once per
    # iteration lineage (fixed 5 iterations + init)
    "graph_pagerank": (6, "scalar |nodes| fold ×(iters+1)"),
    # ≤9-row digit frame folded to the 1-row total
    "dq_benford_test": (1, "scalar digit-total fold"),
    # the |τ|-count conditional aggregate's 1-row merge
    "sim_threshold_sweep": (1, "scalar sweep-count fold"),
    # cumsum offsets frame (≤16 rows) + the 1-row totals fold
    "ml_auc_eval": (2, "offsets frame + scalar totals fold"),
    # one scalar audit fold per table (4 tables)
    "etl_gdpr_erasure": (4, "per-table scalar audit folds"),
    # the |τ|×4 conditional-count aggregate's 1-row merge
    "ml_confusion_matrix": (1, "scalar confusion-count fold"),
    # 1-row grand-mean fold over the |days| daily frame
    "ts_seasonality_index": (1, "scalar grand-mean fold"),
    # cumsum offsets frame (≤16 rows) + scalar mean/argmax folds over
    # the cached |days| daily frame
    "ts_cusum_changepoint": (5, "offsets frame + scalar daily folds"),
    # 1-row corr fold over the date-bounded lag-pair frame
    "ts_autocorrelation": (1, "scalar correlation fold"),
    # |brands|-row ranked frame (fact pre-aggregated before the window)
    "agg_topk_with_others": (1, "|brands|-row ranked frame"),
    # 1-row clicker-cohort fold
    "agg_conversion_wilson": (1, "scalar conversion fold"),
    # scalar horizon/total folds + KM windows over the calendar-bounded
    # duration grid (≤ observation-window days)
    "agg_survival_km": (4, "scalar folds + day-grid KM windows"),
    # rank offsets frame + scalar totals fold + 10-row gains window
    "ml_lift_deciles": (4, "offsets frame + decile-frame folds"),
    # 1-row buyer-cohort fold
    "agg_repeat_purchase": (1, "scalar buyer-cohort fold"),
    # three ntile rank passes share the cached base's offsets frames
    # (≤16 rows each; explain shows ≤2 depending on cache state)
    "rfm_score_segments": (4, "rank offsets frames ×3 ntile passes"),
    # cumsum offsets frame + scalar total-cents fold
    "agg_abc_xyz_classes": (3, "offsets frame + scalar total fold"),
    # two scalar error folds over the cached date-aligned pair frame
    "ts_forecast_backtest": (2, "scalar MAE/MAPE folds ×2 models"),
    # 1-row doc-count fold over the cached token projection
    "text_pmi_collocations": (1, "scalar doc-count fold"),
    # scalar n_lines fold over the cached 2×2 cell frame
    "agg_did_discount_effect": (2, "scalar cell-count fold"),
    # 1-row cycle-summary fold
    "ts_purchase_cycle": (1, "scalar cycle-summary fold"),
    # r4 WAP audit trail: the before/after rows are each a scalar fold
    # (1-row merge of per-partition partials) unioned with the 1-row
    # local rejected-violations frame
    "lake_wap_publish": (2, "scalar before/after table folds"),
    # r4 BFS: the 1-row root-node MIN fold; the cached frontier frames
    # can re-expand its subtree in their stored plans (≤ hop budget)
    "graph_bfs_shortest_path": (3, "scalar root fold + cached re-expansions"),
    # r4 clone: one scalar (rows, cents) fold per table side
    "lake_clone_zero_copy": (2, "scalar source/clone table folds"),
    # r4 binary-quantize: the non-terminal hamming top-50 cut is a
    # GlobalLimit whose exchange input is each partition's local
    # limit-50 — ≤ 50×partitions rows by construction (the
    # sim_ann_lsh_knn capped-limit class)
    "vec_binary_quantize_hamming": (1, "capped top-50 shortlist limit"),
    # r7 CUPED: the pooled θ fit is a 1-row scalar fold by definition
    "agg_cuped_adjusted": (1, "scalar pooled-theta fold"),
    # r7 Bloom audit: four scalar count folds (build/bits/probes/fp),
    # each a 1-row aggregate by definition
    "agg_bloom_filter_membership": (4, "scalar sketch-audit count folds"),
    # r7 Data Vault: one 1-row stats fold per artifact (hub/hub/link/sat)
    "etl_data_vault_load": (4, "per-artifact scalar stats folds"),
    # r7 rules engine: the compiled rule sums are ONE global aggregate
    # whose output is a single |rules|-column row by definition
    "dq_rules_engine": (1, "scalar compiled-rule-sums fold"),
}

BNLJ_OK = {
    "join_cross": (2, "the required 5×25-row Cartesian demo"),
    "join_theta_range": (2, "4-row band table broadcast"),
    "text_tfidf": (2, "1-row scalar-N crossJoin"),
    "corpus_lm_quality": (2, "1-row token-total crossJoin"),
    "agg_decay_weighted": (2, "1-row ref-timestamp crossJoin"),
    # 1-row target-count crossJoin, re-expanded into both consumers
    "corpus_mix_rebalance": (4, "1-row min-target crossJoin ×2 re-expansions"),
    "pipeline_training_set": (2, "1-row min-target crossJoin"),
    "basket_brand_affinity": (2, "1-row n_orders crossJoin"),
    "pareto_revenue_deciles": (2, "1-row total-rev crossJoin"),
    "agg_gini_revenue": (2, "1-row total-rev crossJoin"),
    "ts_peak_concurrency": (2, "1-row counts crossJoin"),
    "graph_triangle_count": (4, "1-row edges/triangles crossJoins"),
    "dq_fk_orphans": (6, "1-row n_rows crossJoin per FK"),
    # |sources|×|vocab| grid densification (20×31 rows), re-expanded
    # into both aliases of the pair self-join
    "text_js_divergence": (4, "sources×vocab grid crossJoin ×2 re-expansions"),
    "dq_psi_drift": (2, "1-row totals crossJoin"),
    "ml_woe_iv": (2, "1-row event/nonevent-totals crossJoin"),
    "ml_calibration_bins": (2, "1-row base-rate crossJoin"),
    "corpus_bigram_perplexity": (2, "1-row token-total crossJoin"),
    "agg_theil_decomposition": (2, "1-row N/mu-totals crossJoin"),
    "corpus_interleave_sources_round_robin": (2, "1-row n_src crossJoin"),
    "vec_norm_quantile_clip": (2, "1-row p99 crossJoin"),
    "corpus_epoch_repeat_schedule": (2, "1-row budget-frame crossJoin"),
    # 10-row threshold-grid crossJoin amplified INSIDE the partial agg
    "ml_threshold_tuning_table": (2, "10-row threshold-grid crossJoin"),
    "agg_assortment_penetration": (2, "1-row catalog-size crossJoin"),
    "agg_mann_whitney_u": (2, "1-row n1/n2-totals crossJoin"),
    "ml_target_encoding": (2, "1-row prior crossJoin"),
    "agg_hll_set_algebra": (4, "1-row estimate crossJoins ×2"),
    # r4: single 1-row totals crossJoin (the max/argmax fold now carries
    # the totals as first() aggregates instead of a second crossJoin)
    "dq_ks_drift": (2, "1-row totals crossJoin"),
    "dq_chi2_independence": (6, "1-row total/dim-count crossJoins ×2"),
    # 1-row |nodes| crossJoin per fixed iteration (×2 explain sections)
    "graph_pagerank": (12, "1-row node-count crossJoins ×(iters+1)"),
    # 1-row digit-total crossJoin (×2 explain sections)
    "dq_benford_test": (2, "1-row digit-total crossJoin"),
    # 1-row pos/neg-totals crossJoin (×2 explain sections)
    "ml_auc_eval": (2, "1-row totals crossJoin"),
    # 1-row group-B stats crossJoin (×2 explain sections)
    "agg_ab_test_welch": (2, "1-row B-stats crossJoin"),
    # 1-row grand-mean crossJoin (×2 explain sections)
    "ts_seasonality_index": (2, "1-row grand-mean crossJoin"),
    # 1-row daily-mean crossJoins (dev input + final report sections)
    "ts_cusum_changepoint": (8, "1-row daily-mean crossJoins"),
    # trailing-28-day date-range join over the calendar-bounded
    # distinct (day,user) grid — the non-equi condition plans as BNLJ
    "agg_stickiness_dau_mau": (2, "date-bounded 28-day range join"),
    # -- round-8 additions (each a bounded broadcast attach, counted
    # across both explain sections) --
    "ml_chi2_feature_selection": (2, "1-row N/E-totals crossJoin"),
    # classes(5-row) stream fan-out + unk/model/prior broadcasts: the
    # 5-row unk frame cross-joins the token stream, the vocab (1-row)
    # and alldocs (1-row) frames attach to the model/unk builds
    "ml_naive_bayes_classifier": (8, "1-row vocab/alldocs + 5-row class crossJoins"),
    "ml_learning_curve_subsets": (4, "4-row pct-grid range join + 1-row full-totals crossJoin"),
    "join_range_bucketed": (2, "1-row anchor crossJoin (60-row window build)"),
    "etl_bitemporal_snapshot": (4, "1-row anchor + 1-row (T1,T2)-params crossJoins"),
    "agg_sequential_patterns": (2, "1-row pair-total crossJoin"),
    "attribution_markov_removal": (2, "1-row full-scenario baseline crossJoin"),
    "ml_permutation_importance": (2, "3-row feature-grid crossJoin onto the 1-row counts"),
    "dedup_minhash_error_curve": (0, ""),
    # 1-row horizon/total crossJoins (×2 explain sections + grid)
    "agg_survival_km": (8, "1-row horizon/total crossJoins"),
    # 1-row total-cents crossJoin (×2 explain sections)
    "agg_abc_xyz_classes": (3, "1-row total-cents crossJoin"),
    # 1-row doc-count crossJoin (×2 explain sections)
    "text_pmi_collocations": (2, "1-row doc-count crossJoin"),
    # four 1-row cell crossJoins + n_lines (all over the cached 2×2)
    "agg_did_discount_effect": (8, "1-row 2×2-cell crossJoins"),
    # 1-row totals crossJoin (×2 explain sections)
    "ml_lift_deciles": (2, "1-row totals crossJoin"),
    # r7 CUPED: 1-row pooled-θ crossJoin (×2 explain sections)
    "agg_cuped_adjusted": (2, "1-row pooled-theta crossJoin"),
    # r7 Bloom audit: three 1-row count crossJoins (×2 explain sections)
    "agg_bloom_filter_membership": (6, "1-row audit-count crossJoins"),
    # r8 second wave: every join runs over constant-size frames — the
    # 16-coalition grid, the ≤16-row mask-count frame and the 4-row
    # channel table (bitwise containment conditions plan as BNLJ;
    # bounded by construction, ×2 explain sections)
    "attribution_shapley": (6, "16-coalition × ≤16-mask × 4-channel grid"),
    # PAV minimax lattice: ≤16-row bin frame self-joined on range
    # conditions (≤16³ combinations, ×2 explain sections)
    "ml_isotonic_calibration": (8, "≤16-row bin-frame minimax lattice"),
    # 3 unrolled GD steps + final scoring, each a 1-row weight-frame
    # crossJoin onto the scan (×2 explain sections)
    "ml_logistic_regression_gd": (8, "1-row weight-frame crossJoin ×4 steps"),
    # 5-row type-pair theta self-join + 7-row lag-spine crossJoin, both
    # constant-size spines (×2 explain sections)
    "ts_lead_lag_xcorr": (4, "types² pair spine × 7-row lag spine"),
    # 1-row corpus-stats (N, avgdl) crossJoin (×2 explain sections)
    "text_bm25_search": (2, "1-row N/avgdl crossJoin"),
    # 1-row 2m-count crossJoin (×2 explain sections)
    "graph_modularity_communities": (2, "1-row 2m crossJoin"),
    # 1-row weight-total crossJoin (×2 explain sections)
    "corpus_temperature_mix": (2, "1-row weight-total crossJoin"),
    # 1-row group-B stats crossJoin onto the 1-row group-A frame
    "agg_delta_method_ratio": (2, "1-row B-stats crossJoin"),
    # 1-row alpha/beta prior crossJoin (×2 explain sections)
    "agg_empirical_bayes_shrinkage": (2, "1-row prior crossJoin"),
    # 1-row population-total crossJoin, re-expanded into the rank side
    "sample_stratified_proportional": (4, "1-row total crossJoin ×2 re-expansions"),
    # 1-row post-segment fit crossJoin (×2 explain sections)
    "ts_interrupted_series": (2, "1-row post-fit crossJoin"),
}

CARTESIAN_OK: dict[str, tuple[int, str]] = {}


def test_no_unbounded_plan_smells(spark):
    offenders = []
    for name, q in all_queries().items():
        text = explain_str(q.run(spark, SF_SMALL))
        for smell, allow in (
            ("SinglePartition", SINGLE_PARTITION_OK),
            ("BroadcastNestedLoopJoin", BNLJ_OK),
            ("CartesianProduct", CARTESIAN_OK),
        ):
            n = text.count(smell)
            cap = allow.get(name, (0, ""))[0]
            if n > cap:
                offenders.append(f"{name}: {n}×{smell} (allowed {cap})")
    assert not offenders, "\n".join(offenders)
